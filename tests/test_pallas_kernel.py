"""Fused Pallas resize-and-place kernel vs oracle (interpret mode on CPU).

Taps are host-exact (float64, identical to the oracle's); the only numeric
difference is f32 matmul accumulation, so parity is within 1 uint8 step.
Real-TPU execution of the same kernel is exercised by bench.py.
"""

import numpy as np
import pytest

from imagestitching_tpu.config import CanvasLimits, StitchOptions
from imagestitching_tpu.core import oracle
from imagestitching_tpu.core.layout import ImageSpec, solve
from imagestitching_tpu.ops import pallas_resize

rng = np.random.default_rng(3)


def rand_img(w, h, c=3):
    return rng.integers(0, 256, (h, w, c), np.uint8)


def assert_parity(plan, images, atol=1):
    want = oracle.stitch(plan, images)
    got = pallas_resize.stitch(plan, images, interpret=True)
    assert got.shape == want.shape
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= atol, (
        f"max diff {diff.max()} at "
        f"{np.unravel_index(diff.argmax(), diff.shape)}")


def plan_for(specs, **kw):
    kw.setdefault("supersample", False)
    limits = kw.pop("limits", None)
    return solve(specs, StitchOptions(**kw), limits)


def test_identity_concat_exact():
    imgs = [rand_img(32, 16), rand_img(32, 24)]
    plan = plan_for([ImageSpec(32, 16), ImageSpec(32, 24)])
    assert_parity(plan, imgs, atol=0)


def test_downscale():
    imgs = [rand_img(200, 160), rand_img(100, 80)]
    plan = plan_for([ImageSpec(200, 160), ImageSpec(100, 80)], mode="min")
    assert_parity(plan, imgs)


def test_upscale():
    imgs = [rand_img(40, 30), rand_img(160, 90)]
    plan = plan_for([ImageSpec(40, 30), ImageSpec(160, 90)], mode="max")
    assert_parity(plan, imgs)


def test_horizontal_gap_fractional():
    # scale_down makes gaps/cursors fractional -> fractional dest rects
    limits = CanvasLimits(max_side=150, max_pixels=10**9, max_supersample=1.0)
    specs = [ImageSpec(200, 180), ImageSpec(160, 200)]
    imgs = [rand_img(200, 180), rand_img(160, 200)]
    plan = plan_for(specs, direction="horizontal", mode="min", gap=9,
                    limits=limits)
    assert plan.scale_down < 1.0
    assert_parity(plan, imgs)


@pytest.mark.parametrize("orientation", [2, 3, 5, 6, 8])
def test_orientations(orientation):
    raw = rand_img(48, 36)
    specs = [ImageSpec(48, 36, orientation=orientation), ImageSpec(36, 48)]
    imgs = [raw, rand_img(36, 48)]
    plan = plan_for(specs, mode="min")
    assert_parity(plan, imgs)


def test_tile_boundaries_multitile():
    # output wider/taller than one tile in both axes (tiny tiles would be
    # nicer but tile sizes are fixed; 600x520 crosses 256/512 boundaries)
    imgs = [rand_img(600, 300), rand_img(520, 320)]
    plan = plan_for([ImageSpec(600, 300), ImageSpec(520, 320)], mode="min")
    assert plan.canvas_h > 256 or plan.canvas_w > 512
    assert_parity(plan, imgs)


def test_original_mode_centered():
    imgs = [rand_img(31, 17), rand_img(64, 23)]
    plan = plan_for([ImageSpec(31, 17), ImageSpec(64, 23)], mode="original",
                    gap=3)
    assert_parity(plan, imgs)


def test_grayscale():
    imgs = [rand_img(40, 20, 1), rand_img(30, 30, 1)]
    plan = plan_for([ImageSpec(40, 20), ImageSpec(30, 30)], mode="min")
    assert_parity(plan, imgs)


@pytest.mark.parametrize("kind", ["triangle", "box"])
def test_aa_filters_downscale(kind):
    # K-tap generalization: AA filters with multi-tap windows on downscale
    imgs = [rand_img(200, 160), rand_img(64, 48)]
    plan = plan_for([ImageSpec(200, 160), ImageSpec(64, 48)], mode="min",
                    filter=kind)
    assert_parity(plan, imgs)


@pytest.mark.parametrize("kind", ["triangle", "box"])
def test_aa_filters_mixed_scales_and_orientations(kind):
    specs = [ImageSpec(120, 90, orientation=6), ImageSpec(90, 120),
             ImageSpec(150, 60, orientation=3)]
    imgs = [rand_img(120, 90), rand_img(90, 120), rand_img(150, 60)]
    plan = plan_for(specs, direction="horizontal", mode="min", gap=3,
                    filter=kind)
    assert_parity(plan, imgs)


def test_extreme_downscale_rejected():
    # K beyond the tap cap falls back (auto engines go to XLA)
    plan = plan_for([ImageSpec(4000, 4000), ImageSpec(20, 20)], mode="min",
                    filter="triangle")
    with pytest.raises(NotImplementedError):
        pallas_resize.stitch(plan, [rand_img(4000, 4000), rand_img(20, 20)],
                             interpret=True)


def test_api_auto_falls_back_for_extreme_downscale():
    from imagestitching_tpu import api
    from imagestitching_tpu.config import RuntimeConfig
    arrs = [rand_img(4000, 4000), rand_img(20, 20)]
    opts = StitchOptions(filter="triangle", mode="min")
    out = api.stitch_arrays(arrs, options=opts,
                            config=RuntimeConfig(engine="auto",
                                                 interpret=True))
    want = api.stitch_arrays(arrs, options=opts,
                             config=RuntimeConfig(engine="oracle"))
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_api_pallas_engine_e2e():
    from imagestitching_tpu import api
    from imagestitching_tpu.config import RuntimeConfig
    arrs = [rand_img(100, 80), rand_img(64, 64), rand_img(80, 100)]
    out = api.stitch_arrays(arrs, options=StitchOptions(gap=4),
                            config=RuntimeConfig(engine="pallas",
                                                 interpret=True))
    want = api.stitch_arrays(arrs, options=StitchOptions(gap=4),
                             config=RuntimeConfig(engine="oracle"))
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_upscale_parity_interpret_exact_f32():
    """Upscale (mode=max) parity in interpret mode.

    Regression: XLA:CPU's default-precision f32 matmul is bf16-grade
    (~0.25% relative error), which pushed the kernel's contraction to +-2
    uint8 levels on upscale jobs where real hardware stays within 1; the
    interpret path now forces Precision.HIGHEST (soak seeds 10001/10003/
    10008 found this)."""
    from imagestitching_tpu import api
    from imagestitching_tpu.config import RuntimeConfig
    rng2 = np.random.default_rng(0)
    w, h = int(rng2.integers(4, 30)), int(rng2.integers(4, 30))
    target = int(rng2.integers(h + 1, 90))
    arrs = [rng2.integers(0, 256, (h, w, 3), np.uint8),
            rng2.integers(0, 256, (target, target, 3), np.uint8)]
    opts = StitchOptions(direction="vertical", mode="max", gap=0,
                         supersample=False)
    out = api.stitch_arrays(arrs, options=opts,
                            config=RuntimeConfig(engine="pallas",
                                                 interpret=True))
    want = api.stitch_arrays(arrs, options=opts,
                             config=RuntimeConfig(engine="oracle"))
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


@pytest.mark.parametrize("filt", ["bilinear", "triangle", "lanczos3"])
def test_column_subtile_fusion_parity(filt):
    """n_sub > 1 fuses multiple column subtiles into one grid step (one
    dispatch overhead, per-subtile band DMAs).  Every fusion factor must
    stay within 1 uint8 step of the float64 oracle — including a grid
    whose column count does not divide by n_sub*tw (padded subtiles carry
    zero weights and clamped band starts)."""
    import jax.numpy as jnp

    from imagestitching_tpu.core import geometry

    specs = [ImageSpec(777, 400), ImageSpec(1521, 999)]
    plan = plan_for(specs, mode="min", filter=filt, max_images=None)
    imgs = [rand_img(s.raw_w, s.raw_h) for s in specs]
    want = oracle.stitch(plan, imgs)
    p = plan.placements[1]                       # the downscaled one
    oriented = geometry.orient_array(imgs[1], p.orientation)
    r0, r1 = p.row_span
    c0, c1 = p.col_span
    want_reg = want[r0:r1, c0:c1].transpose(2, 0, 1)
    for n_sub in (1, 2, 4):
        s = pallas_resize._Schedule(p, filt, batched=True,
                                    n_sub_force=n_sub)
        assert s.n_sub == n_sub
        assert s.static.n_sub == n_sub           # the round-4 static bug
        call = pallas_resize._build_call_static(s.static, 3, True, batch=2)
        src = np.zeros((2, 3, s.m_h_pad, s.m_w_pad), np.uint8)
        src[:, :, :oriented.shape[0], :oriented.shape[1]] = \
            oriented.transpose(2, 0, 1)
        r = np.asarray(call(jnp.asarray(s.ints), jnp.asarray(src),
                            jnp.asarray(s.row_i0), jnp.asarray(s.row_w),
                            jnp.asarray(s.col_i0), jnp.asarray(s.col_w)))
        np.testing.assert_array_equal(r[0], r[1])
        got = r[0, :, :s.n_rows, :s.n_cols]
        d = np.abs(got.astype(np.int16) - want_reg.astype(np.int16)).max()
        assert d <= 1, f"n_sub={n_sub} filt={filt}: {d}"


def test_batched_model_considers_fusion():
    """Whatever n_sub the batched tile search picks must round-trip through
    the schedule into the static key.  (Since the 2026-08-19 chip burn the
    candidate set is (1,) — fusion measured slower on the real chip, see
    _N_SUB_BATCHED — but the invariant must hold for any candidate set.)"""
    specs = [ImageSpec(1024, 600), ImageSpec(1920, 1080)]
    plan = plan_for(specs, mode="min", max_images=None)
    s = pallas_resize._Schedule(plan.placements[1], "bilinear", batched=True)
    assert s.static.n_sub == s.n_sub >= 1
    assert s.cols_pad == s.grid_c * s.n_sub * s.tw
    # single-job schedules never fuse (measured regression, round-3 notes)
    s1 = pallas_resize._Schedule(plan.placements[1], "bilinear",
                                 batched=False)
    assert s1.n_sub == 1


def test_vmem_model_counts_nsub_pipeline_buffers():
    """n_sub>1 residency must include the Pallas pipeline's double buffer
    of the widened OUT grid block and the (k_cols, n_sub*tw) f32 col_w
    input block (r4 review: the first cut under-modeled these; a pick at
    the VMEM cap could then fail Mosaic compile on chip, where
    interpret-mode soaks can't catch it — the round-3 sharded-kernel
    Infeasible class).  The n_sub=1 base formula is chip-validated and
    pinned unchanged."""
    th, tw, bh, bw, k_cols = 256, 512, 64, 256, 24
    base = pallas_resize._vmem_bytes(th, tw, bh, bw, n_sub=1, k_cols=k_cols)
    # k_cols only matters through the widened col_w block: zero at n_sub=1
    assert base == pallas_resize._vmem_bytes(th, tw, bh, bw, n_sub=1)
    fused = pallas_resize._vmem_bytes(th, tw, bh, bw, n_sub=2, k_cols=k_cols)
    inc = fused - base
    assert inc == (bw * tw * 6              # dense col weight hi/lo blocks
                   + 2 * 3 * th * tw        # out block u8, double-buffered
                   + 8 * k_cols * tw)       # col_w f32, double-buffered


def test_fused_kernel_not_shared_across_fractional_offsets():
    """The Pallas engine closes over the WHOLE plan at trace time (weights
    become banded-matmul constants), so plans with identical pixel spans
    but different sub-pixel phases (gap=0.51 vs 0.69) must compile
    separately and each match THEIR OWN oracle (r4s5 signature fix)."""
    specs = [ImageSpec(100, 50), ImageSpec(100, 60)]
    imgs = [rand_img(100, 50), rand_img(100, 60)]
    pa = plan_for(specs, gap=0.51)
    pb = plan_for(specs, gap=0.69)
    assert pa.shape_signature() == pb.shape_signature()
    assert pa.signature() != pb.signature()
    assert_parity(pa, imgs)
    assert_parity(pb, imgs)
