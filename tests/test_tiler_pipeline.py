"""HBM budget governor + pipeline strategy tests (SURVEY.md §4(4)).

Budget accounting must pick resident/streamed/banded correctly, and every
strategy must produce oracle-parity output.
"""

import numpy as np
import pytest

from imagestitching_tpu.config import MemoryBudget, RuntimeConfig, StitchOptions
from imagestitching_tpu.core import oracle
from imagestitching_tpu.core.layout import ImageSpec, solve
from imagestitching_tpu.runtime import pipeline, tiler

rng = np.random.default_rng(5)


def rand_img(w, h, c=3):
    return rng.integers(0, 256, (h, w, c), np.uint8)


def plan_for(specs, **kw):
    kw.setdefault("supersample", False)
    return solve(specs, StitchOptions(**kw))


def budget(mb):
    return MemoryBudget(hbm_bytes=int(mb * 1e6))


# ----------------------------------------------------------------- tiler

def test_resident_when_plenty():
    plan = plan_for([ImageSpec(100, 100), ImageSpec(100, 100)])
    ex = tiler.plan_execution(plan, budget(1000))
    assert ex.strategy == "resident"
    assert ex.est_peak_bytes <= ex.budget_bytes


def test_streamed_when_sources_dont_fit():
    specs = [ImageSpec(1000, 1000)] * 5
    plan = plan_for(specs)
    canvas = 3 * plan.canvas_w * plan.canvas_h
    # canvas is 15 MB; sources are 5x(3+3.x) MB; give enough for canvas +
    # one source but not all five
    ex = tiler.plan_execution(plan, MemoryBudget(hbm_bytes=2 * canvas + 9_000_000))
    assert ex.strategy == "streamed"


def test_banded_when_canvas_dominates():
    specs = [ImageSpec(2000, 2000)] * 2
    plan = plan_for(specs)
    canvas = 3 * plan.canvas_w * plan.canvas_h      # 24 MB
    ex = tiler.plan_execution(plan, MemoryBudget(hbm_bytes=canvas // 2))
    assert ex.strategy == "banded"
    assert ex.band_rows is not None and ex.band_rows < plan.canvas_h
    assert ex.est_peak_bytes <= ex.budget_bytes


def test_impossible_budget_raises():
    plan = plan_for([ImageSpec(4000, 4000)])
    with pytest.raises(MemoryError):
        tiler.plan_execution(plan, MemoryBudget(hbm_bytes=100_000))


def test_banded_peak_sums_per_image_args():
    # EVERY image's crop + tap buffers are simultaneously-live jit args of
    # one band call (_BandedExecutor.run), so the model must SUM them over
    # images — a max-only model under-counted n-image bands (r4s9 review):
    # n copies of one image must cost strictly more than one, by at least
    # the n-1 extra uint8 crops
    one = plan_for([ImageSpec(1500, 1500)])
    six = plan_for([ImageSpec(1500, 1500)] * 6)
    band = 64
    p1 = tiler._banded_peak(one, band, 3)
    p6 = tiler._banded_peak(six, band, 3)
    # identical per-image geometry: 10*band_canvas differs (canvas_h only
    # affects ranges, canvas_w equal), crops/taps scale with n
    scale = one.placements[0].h / 1500
    support = 1.0 * max(1.0, 1.0 / scale)
    import math
    rows_needed = min(1500, int(math.ceil(band / scale + 2 * support)) + 2)
    crop = 3 * rows_needed * ((1500 + 127) // 128 * 128)
    assert p6 - p1 >= 5 * crop


def test_banded_model_bounds_live_arg_bytes():
    # reality link (allocator stats are unavailable on the tunneled TPU —
    # benchmarks/profile_banded_peak.py): the model's non-canvas terms must
    # bound the ACTUAL bytes of every band call's jit args (all live at
    # once), for multi-image plans and a wide-K filter
    from imagestitching_tpu.core import geometry
    specs = [ImageSpec(700, 500), ImageSpec(600, 800), ImageSpec(640, 640)]
    plan = plan_for(specs, filter="lanczos3")
    band = 64
    ex = pipeline._BandedExecutor(plan, band, 3)
    captured = []
    orig = ex._jitted

    def wrap(crops, ri0, rw, rin, ci0, cw):
        captured.append(sum(int(a.nbytes)
                            for lst in (crops, ri0, rw, rin, ci0, cw)
                            for a in lst))
        return orig(crops, ri0, rw, rin, ci0, cw)

    ex._jitted = wrap
    imgs = [rng.integers(0, 256, (s.raw_h, s.raw_w, 3), np.uint8)
            for s in specs]
    oriented = [geometry.orient_array(a, s.orientation)
                for a, s in zip(imgs, specs)]
    out = ex.run(oriented)
    parity(out, oracle.stitch(plan, oriented))
    assert captured
    model = tiler._banded_peak(plan, band, 3)
    band_canvas = 3 * plan.canvas_w * band
    assert model - 10 * band_canvas >= max(captured)


def test_fence_limit_capped_at_headroom():
    # the fence floor must never exceed the budget headroom above the
    # canvas: a 64 MB unconditional floor let staged sources pile past a
    # tight budget (r4s9 review)
    plan = plan_for([ImageSpec(1000, 1000)] * 3)
    canvas = 3 * plan.canvas_w * plan.canvas_h
    tight = RuntimeConfig(budget=MemoryBudget(hbm_bytes=canvas + (6 << 20)))
    lim = pipeline._fence_limit(plan, 3, tight)
    assert lim <= tight.budget.hbm_bytes - canvas
    # zero headroom: fence after every image (always safe)
    assert pipeline._fence_limit(
        plan, 3, RuntimeConfig(budget=MemoryBudget(hbm_bytes=canvas))) == 0
    # plentiful budget: floor never binds, headroom//2 as before
    big = RuntimeConfig(budget=MemoryBudget(hbm_bytes=canvas + (1 << 30)))
    assert pipeline._fence_limit(plan, 3, big) == (1 << 30) // 2


def test_band_source_rows_cover_taps():
    plan = plan_for([ImageSpec(100, 333), ImageSpec(50, 100)], mode="min")
    p = plan.placements[0]
    win = tiler.band_source_rows(p, 10, 74)
    assert win is not None
    br0, br1, s_lo, s_hi = win
    from imagestitching_tpu.core import geometry
    i0, i1, _ = geometry.bilinear_taps(br0, br1, p.y0, p.h, 333)
    assert s_lo <= i0.min() and s_hi > i1.max()


# ----------------------------------------------------------------- pipeline

def parity(got, want, atol=1):
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= atol


def test_pipeline_resident_matches_oracle():
    specs = [ImageSpec(64, 48), ImageSpec(48, 64, orientation=6)]
    imgs = [rand_img(64, 48), rand_img(48, 64)]
    plan = plan_for(specs, gap=4)
    out, metrics = pipeline.run(plan, imgs, RuntimeConfig(engine="xla"))
    assert metrics.strategy == "resident"
    parity(out, oracle.stitch(plan, imgs))
    assert metrics.total_s > 0 and metrics.mp_per_sec > 0


def test_pipeline_streamed_matches_oracle():
    specs = [ImageSpec(200, 150), ImageSpec(150, 200, orientation=8),
             ImageSpec(180, 120)]
    imgs = [rand_img(200, 150), rand_img(150, 200), rand_img(180, 120)]
    plan = plan_for(specs, mode="min", gap=3)
    # one byte under the resident peak: resident rejected, streamed accepted
    # (budget derived from the model so the pick survives model retuning)
    from imagestitching_tpu.runtime import tiler
    cfg = RuntimeConfig(
        engine="xla",
        budget=MemoryBudget(hbm_bytes=tiler.resident_peak_bytes(plan) - 1))
    out, metrics = pipeline.run(plan, imgs, cfg)
    assert metrics.strategy == "streamed"
    parity(out, oracle.stitch(plan, imgs))


def test_pipeline_streamed_pallas_interpret():
    specs = [ImageSpec(200, 150), ImageSpec(150, 100)]
    imgs = [rand_img(200, 150), rand_img(150, 100)]
    plan = plan_for(specs, mode="min")
    from imagestitching_tpu.runtime import tiler
    cfg = RuntimeConfig(engine="pallas", interpret=True,
                        budget=MemoryBudget(
                            hbm_bytes=tiler.resident_peak_bytes(plan) - 1))
    out, metrics = pipeline.run(plan, imgs, cfg)
    assert metrics.strategy == "streamed"
    parity(out, oracle.stitch(plan, imgs))


def test_pipeline_banded_matches_oracle():
    specs = [ImageSpec(300, 400), ImageSpec(240, 360, orientation=3)]
    imgs = [rand_img(300, 400), rand_img(240, 360)]
    plan = plan_for(specs, mode="min", gap=7)
    canvas = 3 * plan.canvas_w * plan.canvas_h
    cfg = RuntimeConfig(engine="xla",
                        budget=MemoryBudget(hbm_bytes=canvas // 2))
    out, metrics = pipeline.run(plan, imgs, cfg)
    assert metrics.strategy == "banded"
    parity(out, oracle.stitch(plan, imgs))


def test_pipeline_banded_with_upscale_and_orientations():
    specs = [ImageSpec(300, 400, orientation=o) for o in (1, 5, 6, 7)]
    imgs = [rand_img(300, 400) for _ in specs]
    plan = plan_for(specs, mode="max", gap=2)
    canvas = 3 * plan.canvas_w * plan.canvas_h
    cfg = RuntimeConfig(engine="xla",
                        budget=MemoryBudget(hbm_bytes=canvas // 2))
    out, metrics = pipeline.run(plan, imgs, cfg)
    assert metrics.strategy == "banded"
    parity(out, oracle.stitch(plan, imgs))


def test_pipeline_progress_phases():
    specs = [ImageSpec(64, 64)] * 3
    imgs = [rand_img(64, 64) for _ in range(3)]
    plan = plan_for(specs)
    seen = []
    canvas = 3 * plan.canvas_w * plan.canvas_h
    cfg = RuntimeConfig(engine="xla",
                        budget=MemoryBudget(hbm_bytes=canvas + 200_000))
    pipeline.run(plan, imgs, cfg, progress=lambda ph, f: seen.append((ph, f)))
    comp = [f for ph, f in seen if ph == "composite"]
    assert comp and comp == sorted(comp) and comp[-1] == 1.0


def test_banded_pallas_windowed_matches_oracle():
    """VERDICT r1 #5: the fused kernel serves the banded strategy via
    host-cropped row windows (_WindowPlan); parity vs oracle per chunk."""
    from imagestitching_tpu.core import geometry
    from imagestitching_tpu.runtime.pipeline import _run_banded_pallas

    specs = [ImageSpec(90, 70), ImageSpec(60, 120, orientation=6),
             ImageSpec(75, 75)]
    imgs = [rng.integers(0, 256, (s.raw_h, s.raw_w, 3), np.uint8)
            for s in specs]
    for direction in ("vertical", "horizontal"):
        for mode in ("min", "original"):
            plan = solve(specs, StitchOptions(direction=direction, mode=mode,
                                              gap=3, supersample=False))
            oriented = [geometry.orient_array(a, p.orientation)
                        for a, p in zip(imgs, plan.placements)]
            # small band_rows to force several chunks per placement
            got = _run_banded_pallas(plan, oriented, 3, band_rows=16,
                                     progress=lambda *a: None,
                                     interpret=True)
            want = oracle.stitch(plan, imgs)
            assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, \
                (direction, mode)


def test_banded_pallas_copy_blit(tmp_path):
    # equal sizes -> identity taps -> host blit path inside banded
    from imagestitching_tpu.core import geometry
    from imagestitching_tpu.runtime.pipeline import _run_banded_pallas

    specs = [ImageSpec(40, 30)] * 3
    imgs = [rng.integers(0, 256, (30, 40, 3), np.uint8) for _ in specs]
    plan = solve(specs, StitchOptions(gap=2, supersample=False))
    oriented = [geometry.orient_array(a, p.orientation)
                for a, p in zip(imgs, plan.placements)]
    got = _run_banded_pallas(plan, oriented, 3, band_rows=8,
                             progress=lambda *a: None, interpret=True)
    want = oracle.stitch(plan, imgs)
    np.testing.assert_array_equal(got, want)


def test_streamed_kernel_update_matches_oracle():
    """Streamed strategy with the fused kernel (engine auto, interpret)."""
    from imagestitching_tpu.runtime.pipeline import _run_streamed

    specs = [ImageSpec(80, 60), ImageSpec(50, 90, orientation=8)]
    imgs = [rng.integers(0, 256, (s.raw_h, s.raw_w, 3), np.uint8)
            for s in specs]
    plan = solve(specs, StitchOptions(gap=2, supersample=False))
    cfg = RuntimeConfig(engine="auto", interpret=True)
    got = _run_streamed(plan, imgs, 3, cfg, lambda *a: None)
    want = oracle.stitch(plan, imgs)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_profile_trace_released_on_failure(monkeypatch, tmp_path):
    """A failing profiled run must not leak the process-global profiler
    (review finding: 'Profile has already been started')."""
    import os
    monkeypatch.setenv("IMAGESTITCH_TRACE_DIR", str(tmp_path / "t"))
    from imagestitching_tpu.ops import xla_compose
    from imagestitching_tpu.runtime import pipeline

    def broken(plan, images, **kw):
        raise ValueError("boom")

    specs = [ImageSpec(16, 16)]
    imgs = [rng.integers(0, 256, (16, 16, 3), np.uint8)]
    plan = solve(specs, StitchOptions(supersample=False))
    monkeypatch.setattr(xla_compose, "stitch", broken)
    with pytest.raises(ValueError):
        pipeline.run(plan, imgs, RuntimeConfig(engine="xla", profile=True))
    monkeypatch.undo()
    monkeypatch.setenv("IMAGESTITCH_TRACE_DIR", str(tmp_path / "t2"))
    # a second profiled run must work (no leaked active profile)
    out, m = pipeline.run(plan, imgs,
                          RuntimeConfig(engine="xla", profile=True))
    want = oracle.stitch(plan, imgs)
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_banded_xla_wide_filter_band_alignment():
    """Soak-caught bug: the XLA banded executor sized crops over groups
    aligned to each image's span start, but bands are CANVAS-aligned — at
    band boundaries wide-K filters (lanczos3/box) got undercovered crops and
    clamped taps (errors up to 33 uint8 levels)."""
    from imagestitching_tpu.core import geometry
    from imagestitching_tpu.runtime.pipeline import _BandedExecutor

    rng2 = np.random.default_rng(1065)
    for kind in ("lanczos3", "box", "triangle"):
        # spans deliberately NOT aligned to the band size (gap offsets them)
        specs = [ImageSpec(119, 50, 2), ImageSpec(52, 67, 2),
                 ImageSpec(76, 73, 2), ImageSpec(97, 86, 5)]
        imgs = [rng2.integers(0, 256, (s.raw_h, s.raw_w, 3), np.uint8)
                for s in specs]
        plan = solve(specs, StitchOptions(mode="max", gap=3, filter=kind,
                                          supersample=False))
        oriented = [geometry.orient_array(a, p.orientation)
                    for a, p in zip(imgs, plan.placements)]
        got = _BandedExecutor(plan, 128, 3).run(oriented)
        want = oracle.stitch(plan, imgs)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, kind


def test_banded_ladder_short_canvas():
    """Canvases shorter than 8 rows must still get a banded attempt
    (regression: the ladder's band floor produced an empty ladder and a
    bogus 'out of memory on every strategy' MemoryError)."""
    from imagestitching_tpu import api
    from imagestitching_tpu.core import oracle as _oracle
    from imagestitching_tpu.core.layout import solve as _solve

    rng2 = np.random.default_rng(5)
    imgs = [rng2.integers(0, 256, (6, 45, 3), np.uint8),
            rng2.integers(0, 256, (39, 42, 3), np.uint8)]
    specs = [ImageSpec(45, 6, 3), ImageSpec(42, 39, 5)]
    opts = StitchOptions(direction="horizontal", mode="min", gap=2,
                         supersample=False)
    cfg = RuntimeConfig(budget=MemoryBudget(hbm_bytes=300_000),
                        interpret=True)
    out, m = api.stitch_arrays(imgs, specs, opts, cfg, return_metrics=True)
    assert m.strategy == "banded"
    want = _oracle.stitch(_solve(specs, opts), imgs)
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_overlapped_drain_oom_demotes_to_banded(monkeypatch):
    """r4s7 review: on the async transport a streamed update's OOM first
    surfaces at the DRAIN fetch — it must trigger the banded retry (with
    redecode of released sources), not escape to the caller."""
    import jax

    specs = [ImageSpec(120, 90), ImageSpec(100, 80)]
    imgs = [rand_img(120, 90), rand_img(100, 80)]
    plan = plan_for(specs, mode="min", gap=2)
    loaders = [(lambda a=a: a) for a in imgs]

    real_get = jax.device_get
    fired = []

    def oom_once(x):
        # fire only on the drain's (1,1,1) canvas probe, not the transport
        # rtt probe that runs earlier in the same body
        if not fired and getattr(x, "shape", None) == (1, 1, 1):
            fired.append(True)
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory "
                               "allocating canvas (simulated)")
        return real_get(x)

    monkeypatch.setattr(jax, "device_get", oom_once)
    out, m = pipeline.run_overlapped(
        plan, loaders, RuntimeConfig(engine="xla"))
    assert fired                       # the drain really hit the fake OOM
    assert m.strategy == "overlapped/banded"
    parity(out, oracle.stitch(plan, imgs))


def test_sharded_oom_falls_back_to_single_chip(monkeypatch):
    """r4s7 review: a runtime OOM inside the space-sharded compose (the
    byte estimate admitted it) must recover on the single-chip ladder."""
    from imagestitching_tpu.parallel import mesh as pmesh
    from imagestitching_tpu.parallel import sharding as psharding

    class Boom:
        def __init__(self, *a, **k):
            pass

        def __call__(self, images):
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory on "
                               "device shard (simulated)")

    monkeypatch.setattr(psharding, "ShardedStitch", Boom)
    specs = [ImageSpec(100, 80), ImageSpec(90, 70)]
    imgs = [rand_img(100, 80), rand_img(90, 70)]
    plan = plan_for(specs, mode="min", gap=1)
    mesh = pmesh.make_mesh((1, 8))
    out, m = pipeline.run(plan, imgs,
                          RuntimeConfig(engine="xla", mesh=mesh))
    assert m.strategy != "space-sharded"
    parity(out, oracle.stitch(plan, imgs))
