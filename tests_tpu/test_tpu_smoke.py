"""Opt-in REAL-TPU smoke tests (not part of the default CPU-mesh suite).

Run manually on a chip:  python -m pytest tests_tpu/ -q
First run pays ~20-40 s Mosaic compiles through the tunnel; the persistent
compile cache makes later runs seconds.  The default suite (tests/) forces a
virtual CPU mesh by design — this module is the on-hardware parity spot
check (VERDICT r1 noted real-TPU pytest coverage was zero by construction).
"""

import numpy as np
import pytest

import jax


def _bounded_backend(timeout_s: float = 120.0) -> str:
    """First backend touch, bounded (shared probe in runtime.jaxcfg): a
    wedged tunnel/PJRT init would otherwise hang pytest COLLECTION forever
    (observed round 4 with the relay down).  On timeout/failure the module
    skips instead of hanging."""
    from imagestitching_tpu.runtime.jaxcfg import bounded_backend_probe

    backend, _, err = bounded_backend_probe(timeout_s)
    if isinstance(err, TimeoutError):
        return "init-timeout"
    if err is not None:
        return f"init-failed({type(err).__name__})"
    return backend


_BACKEND = _bounded_backend()
pytestmark = pytest.mark.skipif(
    _BACKEND != "tpu",
    reason=f"needs a real TPU backend, got {_BACKEND!r} "
           "(run outside tests/' CPU conftest)")

from imagestitching_tpu import api  # noqa: E402
from imagestitching_tpu.config import (MemoryBudget, RuntimeConfig,  # noqa: E402
                                       StitchOptions)
from imagestitching_tpu.core import oracle  # noqa: E402
from imagestitching_tpu.core.layout import ImageSpec, solve  # noqa: E402

rng = np.random.default_rng(17)


def _job(shapes, **opt):
    specs = [ImageSpec(w, h, o) for (w, h, o) in shapes]
    imgs = [rng.integers(0, 256, (h, w, 3), np.uint8) for (w, h, _) in shapes]
    options = StitchOptions(supersample=False, **opt)
    plan = solve(specs, options)
    return specs, imgs, options, plan


def test_tpu_pallas_resample_parity():
    specs, imgs, options, plan = _job(
        [(300, 200, 1), (257, 311, 6)], gap=3)
    out = api.stitch_arrays(imgs, specs, options,
                            RuntimeConfig(engine="pallas"))
    want = oracle.stitch(plan, imgs)
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_tpu_banded_kernel_parity():
    specs, imgs, options, plan = _job([(300, 200, 1), (260, 240, 1)], gap=2)
    tight = MemoryBudget(hbm_bytes=400_000)     # forces banded
    out, m = api.stitch_arrays(imgs, specs, options,
                               RuntimeConfig(budget=tight),
                               return_metrics=True)
    assert m.strategy == "banded"
    want = oracle.stitch(plan, imgs)
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_tpu_device_preview_parity():
    img = rng.integers(0, 256, (400, 300, 3), np.uint8)
    dev = api.make_preview(img, 120, device=True)
    host = api.make_preview(img, 120, device=False)
    assert np.abs(dev.astype(int) - host.astype(int)).max() <= 1


def test_tpu_strategy_matrix_parity():
    """Every budget strategy on real hardware against the oracle."""
    from imagestitching_tpu.runtime import pipeline

    from imagestitching_tpu.runtime import tiler

    specs, imgs, options, plan = _job(
        [(260, 200, 1), (220, 260, 3)], gap=2)
    want = oracle.stitch(plan, imgs)
    resident_peak = tiler.resident_peak_bytes(plan, 3)
    streamed_peak = 3 * plan.canvas_w * plan.canvas_h + max(
        tiler._src_bytes(p, 3) + tiler._region_bytes(p, 3)
        for p in plan.placements)
    for budget_bytes, expect in ((resident_peak + 1, "resident"),
                                 (resident_peak - 1, "streamed"),
                                 (streamed_peak - 1, "banded")):
        cfg = RuntimeConfig(budget=MemoryBudget(hbm_bytes=budget_bytes))
        out, m = pipeline.run(plan, imgs, cfg)
        assert m.strategy == expect, (m.strategy, expect, budget_bytes)
        assert np.abs(out.astype(int) - want.astype(int)).max() <= 1, expect


def test_tpu_lanczos3_parity():
    specs, imgs, options, plan = _job([(300, 220, 1)], filter="lanczos3")
    out = api.stitch_arrays(imgs, specs, options,
                            RuntimeConfig(engine="pallas"))
    want = oracle.stitch(plan, imgs)
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_tpu_streaming_export_parity(tmp_path):
    """Device canvas -> concurrent banded readback -> incremental PNG, on
    real hardware; decoded file must match the fully-fetched canvas."""
    from imagestitching_tpu.imgio import codec, native
    if not native.available():
        pytest.skip("native codec unavailable")

    specs, imgs, options, plan = _job(
        [(300, 200, 1), (257, 311, 6), (280, 280, 1)], gap=2)
    p, m = api.stitch_to_file(
        [(a, s.orientation) for a, s in zip(imgs, specs)],
        str(tmp_path / "o.png"), options=options, return_metrics=True)
    assert m.export_s > 0
    got, _ = codec.decode(open(p, "rb").read())
    want = api.stitch_arrays(imgs, specs, options)
    np.testing.assert_array_equal(got, want)


def test_tpu_server_batched_serving_parity():
    """StitchServer on the real chip: concurrent jobs, batched Pallas grid,
    every strip within 1 step of the oracle (the serving-path analog of
    BASELINE config 5, here at smoke scale)."""
    from imagestitching_tpu.serve.server import StitchServer

    options = StitchOptions(gap=2, supersample=False)
    shapes = [(192, 128), (160, 144)]
    specs = [ImageSpec(w, h) for (w, h) in shapes]
    plan = solve(specs, options)
    jobs = [[rng.integers(0, 256, (h, w, 3), np.uint8)
             for (w, h) in shapes] for _ in range(8)]
    with StitchServer(max_batch=8, max_wait_s=0.05) as server:
        futs = [server.submit(imgs, options) for imgs in jobs]
        outs = [f.result(timeout=300) for f in futs]
    for imgs, out in zip(jobs, outs):
        want = oracle.stitch(plan, imgs)
        assert out.shape == want.shape
        assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_tpu_server_warmup_then_serve_parity():
    """warmup() on the real chip: the pre-compiled Mosaic executable is the
    one a real flush looks up, and served results still match the oracle."""
    from imagestitching_tpu.serve.server import StitchServer

    options = StitchOptions(gap=3, supersample=False)
    shapes = [(176, 120), (144, 136)]
    specs = [ImageSpec(w, h) for (w, h) in shapes]
    plan = solve(specs, options)
    imgs = [rng.integers(0, 256, (h, w, 3), np.uint8) for (w, h) in shapes]
    with StitchServer(max_batch=4, max_wait_s=0.02) as server:
        info = server.warmup([(h, w) for (w, h) in shapes], options,
                             batch_sizes=(1,))
        assert info["batches"] == [1] and info["engine"] in ("pallas", "xla")
        assert server.stats()["warmups"] == 1
        out = server.submit(imgs, options).result(timeout=300)
        (_, per_size), = server._compiled.values()
        assert set(per_size) == {(1, 3)}    # flush reused the warmed program
    want = oracle.stitch(plan, imgs)
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_tpu_grid_collage_parity():
    """stitch_grid on the real chip: per-column kernels resolved by
    engine="auto" on real Mosaic, host write-once assembly checked against
    an independent per-column float64 oracle assembly (core/grid.py).

    The assembly twin is DELIBERATELY not imported from benchmarks/soak.py
    (_assemble_grid_oracle): importing that module forces
    JAX_PLATFORMS=cpu at import time whenever --tpu isn't in sys.argv,
    which would silently demote this real-chip test to the CPU backend.
    """
    from imagestitching_tpu.core.grid import plan_grid

    imgs = [rng.integers(0, 256, (int(h), int(w), 3), np.uint8)
            for (w, h) in ((120, 90), (100, 140), (80, 70), (110, 100),
                           (95, 120))]
    options = StitchOptions(gap=3, background=(20, 40, 60),
                            max_images=None)
    got = api.stitch_grid(imgs, cols=2, options=options, valign="center")
    specs = [ImageSpec(a.shape[1], a.shape[0]) for a in imgs]
    gplan = plan_grid(specs, 2, options, None, "balance")
    want = np.empty((gplan.canvas_h, gplan.canvas_w, 3), np.uint8)
    want[:] = np.asarray(gplan.background, np.uint8)
    gap_px = int(np.floor(gplan.gap + 0.5))
    x = 0
    for idx_list, plan in zip(gplan.columns, gplan.col_plans):
        col = oracle.stitch(plan, [imgs[i] for i in idx_list])
        y = (gplan.canvas_h - col.shape[0]) // 2
        want[y:y + col.shape[0], x:x + col.shape[1]] = col
        x += gplan.col_width + gap_px
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_tpu_merge_overlap_scorer_parity():
    """The merge scorer's MXU matmul on the real chip: candidate ORDER can
    differ from the float64 twin only on non-matching near-ties, and the
    exact-verify contract must land the same trims; a full merged stitch
    reconstructs the original capture bit-exactly."""
    from imagestitching_tpu.ops import overlap

    base = rng.integers(0, 256, (900, 160, 3), np.uint8)
    a, b, c = base[:400], base[300:640], base[560:]   # 100- and 80-row dups
    s_dev = overlap._scores(a[400 - 200:], b[:32], device=True)
    s_np = overlap._scores_numpy(a[400 - 200:], b[:32])
    assert int(np.argmin(s_dev)) == int(np.argmin(s_np))
    assert overlap.detect_trims([a, b, c], "vertical") == [0, 100, 80]
    got = api.stitch_arrays([a, b, c],
                            options=StitchOptions(merge_overlap=True))
    np.testing.assert_array_equal(got, base)


def test_tpu_supersampled_fractional_placement_parity():
    """The ss>1 geometry class on real Mosaic (VERDICT r4 weak #4): with
    supersample enabled every placement rect scales by a non-integer factor
    (x0 = dx*ss), so all tap phases are sub-pixel — previously zero chip
    coverage.  Covers both a mid-range ss (cap-bound ratio) and the
    guard-loop deviation-#8 reset edge (ss back to 1, canvas = target)."""
    from imagestitching_tpu.config import CanvasLimits

    specs, imgs, _, _ = _job([(180, 140, 1), (150, 200, 1)], gap=2.4)
    options = StitchOptions(supersample=True, gap=2.4)
    # mid-range: cap ~1.69x the target pixels -> ss = ratio ~ 1.3
    free = solve(specs, StitchOptions(supersample=False, gap=2.4))
    lim = CanvasLimits(max_side=1 << 20,
                       max_pixels=int(free.out_w * free.out_h * 1.69),
                       max_supersample=2.2)
    plan = solve(specs, options, limits=lim)
    assert 1.2 < plan.supersample < 1.4
    out = api.stitch_arrays(imgs, specs, options,
                            RuntimeConfig(engine="pallas"), limits=lim)
    want = oracle.stitch(plan, imgs)
    assert out.shape == want.shape
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1

    # deviation-#8 edge: headroom ratio ~1.02 -> guard resets ss to 1,
    # canvas pinned to the target size (PARITY.md #8)
    lim2 = CanvasLimits(max_side=1 << 20,
                        max_pixels=int(free.out_w * free.out_h * 1.04),
                        max_supersample=2.2)
    plan2 = solve(specs, options, limits=lim2)
    if plan2.supersample == 1.0:          # reset edge reached
        assert (plan2.canvas_w, plan2.canvas_h) == (plan2.out_w,
                                                    plan2.out_h)
    out2 = api.stitch_arrays(imgs, specs, options,
                             RuntimeConfig(engine="auto"), limits=lim2)
    want2 = oracle.stitch(plan2, imgs)
    assert np.abs(out2.astype(int) - want2.astype(int)).max() <= 1
