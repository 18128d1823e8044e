"""Batched serving + mesh-sharded execution on the 8-device CPU mesh
(SURVEY.md §4(5): multi-device without a cluster)."""

import numpy as np
import pytest

import jax

from imagestitching_tpu.config import StitchOptions
from imagestitching_tpu.core import oracle
from imagestitching_tpu.core.layout import ImageSpec, solve
from imagestitching_tpu.parallel import batch as pbatch
from imagestitching_tpu.parallel import mesh as pmesh
from imagestitching_tpu.parallel.sharding import ShardedStitch

rng = np.random.default_rng(11)


def rand_stack(b, w, h, c=3):
    return rng.integers(0, 256, (b, h, w, c), np.uint8)


def plan_for(specs, **kw):
    kw.setdefault("supersample", False)
    return solve(specs, StitchOptions(**kw))


def oracle_batch(plan, stacks):
    outs = []
    for b in range(stacks[0].shape[0]):
        outs.append(oracle.stitch(plan, [s[b] for s in stacks]))
    return np.stack(outs)


# ------------------------------------------------------------------- mesh

def test_make_mesh_default():
    m = pmesh.make_mesh()
    assert m.shape["jobs"] == 8 and m.shape["space"] == 1


def test_make_mesh_2d():
    m = pmesh.make_mesh((2, 4))
    assert m.shape["jobs"] == 2 and m.shape["space"] == 4
    with pytest.raises(ValueError):
        pmesh.make_mesh((3, 2))


# ------------------------------------------------------------------- batch

@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_batched_matches_oracle(engine):
    specs = [ImageSpec(48, 32), ImageSpec(32, 40)]
    plan = plan_for(specs, gap=3)
    stacks = [rand_stack(4, 48, 32), rand_stack(4, 32, 40)]
    kw = dict(interpret=True) if engine == "pallas" else {}
    got = pbatch.stitch_batch(plan, stacks, engine=engine, **kw)
    want = oracle_batch(plan, stacks)
    assert got.shape == want.shape == (4, plan.canvas_h, plan.canvas_w, 3)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_batched_with_orientation():
    specs = [ImageSpec(48, 32, orientation=6), ImageSpec(32, 48)]
    plan = plan_for(specs, mode="min")
    stacks = [rand_stack(3, 48, 32), rand_stack(3, 32, 48)]
    got = pbatch.stitch_batch(plan, stacks, engine="pallas", interpret=True)
    want = oracle_batch(plan, stacks)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_batched_sharded_over_jobs_mesh():
    mesh = pmesh.make_mesh()           # 8 devices on jobs axis
    specs = [ImageSpec(40, 24), ImageSpec(24, 24)]
    plan = plan_for(specs)
    stacks = [rand_stack(16, 40, 24), rand_stack(16, 24, 24)]
    got = pbatch.stitch_batch(plan, stacks, engine="xla", mesh=mesh)
    want = oracle_batch(plan, stacks)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_batched_pallas_sharded_over_jobs_mesh():
    """The fused kernel under a mesh: shard_map partitions for real —
    per-device shards, no collectives, oracle parity (VERDICT r2 #2)."""
    import re

    import jax.numpy as jnp

    mesh = pmesh.make_mesh()           # 8 devices on jobs axis
    # mixed sizes -> real resample: the kernel path, not the blit path
    specs = [ImageSpec(48, 32), ImageSpec(32, 40)]
    plan = plan_for(specs, gap=2)
    stacks = [rand_stack(16, 48, 32), rand_stack(16, 32, 40)]
    bs = pbatch.BatchedStitch(plan, 16, engine="pallas", mesh=mesh,
                              interpret=True)
    dev = [jnp.asarray(s) for s in stacks]
    out_dev = bs._jitted(dev)
    # genuinely partitioned: each device holds 16/8 = 2 jobs of the output
    shapes = {tuple(s.data.shape) for s in out_dev.addressable_shards}
    assert shapes == {(2, plan.canvas_h, plan.canvas_w, 3)}, shapes
    # zero collectives: jobs are independent; an all-gather would mean XLA
    # fell back to replicated compute around the opaque pallas_call
    hlo = bs._jitted.lower(dev).compile().as_text()
    assert not re.search(r"all-gather|all-reduce|all-to-all", hlo)
    want = oracle_batch(plan, stacks)
    assert np.abs(np.asarray(out_dev).astype(int)
                  - want.astype(int)).max() <= 1


def test_batched_pallas_mesh_requires_divisible_batch():
    mesh = pmesh.make_mesh()
    plan = plan_for([ImageSpec(48, 32), ImageSpec(32, 40)], gap=2)
    with pytest.raises(ValueError, match="divisible"):
        pbatch.BatchedStitch(plan, 12, engine="pallas", mesh=mesh,
                             interpret=True)


def test_batched_validates_shapes():
    plan = plan_for([ImageSpec(16, 16)])
    b = pbatch.BatchedStitch(plan, batch_size=2, engine="xla")
    with pytest.raises(ValueError):
        b([rand_stack(3, 16, 16)])     # wrong batch
    with pytest.raises(ValueError):
        b([rand_stack(2, 8, 16)])      # wrong dims


# ------------------------------------------------------------------- shard

def test_sharded_rows_match_oracle():
    mesh = pmesh.make_mesh((1, 8))     # all devices on space axis
    specs = [ImageSpec(64, 100), ImageSpec(80, 133)]
    plan = plan_for(specs, mode="min", gap=5)
    imgs = [rng.integers(0, 256, (100, 64, 3), np.uint8),
            rng.integers(0, 256, (133, 80, 3), np.uint8)]
    sh = ShardedStitch(plan, mesh)
    got = sh(imgs)
    want = oracle.stitch(plan, imgs)
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_sharded_band_seams_with_orientations():
    mesh = pmesh.make_mesh((1, 8))
    specs = [ImageSpec(40, 64, orientation=8), ImageSpec(64, 48)]
    plan = plan_for(specs, mode="max", gap=2)
    imgs = [rng.integers(0, 256, (64, 40, 3), np.uint8),
            rng.integers(0, 256, (48, 64, 3), np.uint8)]
    got = ShardedStitch(plan, mesh)(imgs)
    want = oracle.stitch(plan, imgs)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_sharded_uneven_rows():
    # canvas_h not divisible by 8 -> padded bands, output sliced back
    mesh = pmesh.make_mesh((1, 8))
    specs = [ImageSpec(32, 61)]
    plan = plan_for(specs)
    assert plan.canvas_h % 8 != 0
    imgs = [rng.integers(0, 256, (61, 32, 3), np.uint8)]
    got = ShardedStitch(plan, mesh)(imgs)
    want = oracle.stitch(plan, imgs)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_pipeline_space_mesh_integration():
    # RuntimeConfig.mesh with a space axis routes through ShardedStitch
    from imagestitching_tpu import api
    from imagestitching_tpu.config import RuntimeConfig
    mesh = pmesh.make_mesh((1, 8))
    imgs = [rng.integers(0, 256, (100, 64, 3), np.uint8),
            rng.integers(0, 256, (133, 80, 3), np.uint8)]
    out, m = api.stitch_arrays(
        imgs, options=StitchOptions(mode="min", gap=5, supersample=False),
        config=RuntimeConfig(engine="xla", mesh=mesh), return_metrics=True)
    assert m.strategy == "space-sharded"
    plan = plan_for([ImageSpec(64, 100), ImageSpec(80, 133)], mode="min",
                    gap=5)
    want = oracle.stitch(plan, imgs)
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_sharded_triangle_filter():
    # K-tap windows through shard_map: AA filter sharded over space axis
    mesh = pmesh.make_mesh((1, 8))
    specs = [ImageSpec(200, 160), ImageSpec(64, 48)]
    plan = plan_for(specs, mode="min", gap=2, filter="triangle")
    imgs = [rng.integers(0, 256, (160, 200, 3), np.uint8),
            rng.integers(0, 256, (48, 64, 3), np.uint8)]
    got = ShardedStitch(plan, mesh)(imgs)
    want = oracle.stitch(plan, imgs)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_sharded_pallas_engine_matches_oracle():
    """ShardedStitch(engine='pallas'): each shard runs the fused kernel
    over its own canvas band (VERDICT r2 #7) — resample placements through
    the kernel, blits through the gather path, parity vs the oracle."""
    mesh = pmesh.make_mesh((1, 8))
    specs = [ImageSpec(64, 100), ImageSpec(80, 133),
             ImageSpec(48, 64, orientation=6)]
    imgs = [rand_stack(1, 64, 100)[0], rand_stack(1, 80, 133)[0],
            rand_stack(1, 48, 64)[0]]
    plan = plan_for(specs, mode="min", gap=3)
    ss = ShardedStitch(plan, mesh, engine="pallas", interpret=True)
    # the resample placement must actually be on the kernel path
    assert 1 in ss._kern_meta and sorted(ss._xla_idx) == [0, 2]
    got = ss(imgs)
    want = oracle.stitch(plan, imgs)
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_sharded_pallas_kernel_in_middle_bands_only():
    """A kernel placement confined to the middle of a tall canvas: shards
    whose bands miss it must still run the SPMD program (zero-weight taps)
    and compose pure background."""
    mesh = pmesh.make_mesh((1, 8))
    specs = [ImageSpec(96, 40), ImageSpec(64, 48)]
    plan = plan_for(specs, mode="max", gap=200)   # huge gap: empty bands
    imgs = [rand_stack(1, 96, 40)[0], rand_stack(1, 64, 48)[0]]
    ss = ShardedStitch(plan, mesh, engine="pallas", interpret=True)
    assert ss._kern_meta                           # max mode: upscale 64->96
    got = ss(imgs)
    want = oracle.stitch(plan, imgs)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_sharded_pallas_deep_downscale_shrinks_chunks():
    """VMEM pressure at deep downscale shrinks the sharded kernel's chunk
    height instead of raising Infeasible (soak seeds 80014/80029: the
    256-row default chunk needs a crop too large for VMEM at scale ~0.13
    with wide-K filters)."""
    mesh = pmesh.make_mesh((1, 8))
    specs = [ImageSpec(2048, 512), ImageSpec(256, 400)]
    plan = plan_for(specs, mode="min", filter="lanczos3")   # 2048 -> 256
    imgs = [rand_stack(1, 2048, 512)[0], rand_stack(1, 256, 400)[0]]
    ss = ShardedStitch(plan, mesh, engine="pallas", interpret=True)
    meta = ss._kern_meta[0]
    assert meta["th"] < 256                 # the shrink actually engaged
    got = ss(imgs)
    want = oracle.stitch(plan, imgs)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_sharded_pallas_wide_k_filter():
    """lanczos3 deep downscale: wide tap windows across shard-aligned
    chunks (the K-tap banded-matmul shape) still match the oracle."""
    mesh = pmesh.make_mesh((1, 8))
    specs = [ImageSpec(400, 96), ImageSpec(100, 80)]
    plan = plan_for(specs, mode="min", filter="lanczos3")
    imgs = [rand_stack(1, 400, 96)[0], rand_stack(1, 100, 80)[0]]
    ss = ShardedStitch(plan, mesh, engine="pallas", interpret=True)
    got = ss(imgs)
    want = oracle.stitch(plan, imgs)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_pipeline_space_mesh_uses_pallas_engine():
    """Full pipeline with engine='pallas' + a space mesh routes through the
    sharded kernel compose (strategy space-sharded, oracle parity)."""
    from imagestitching_tpu import api
    from imagestitching_tpu.config import RuntimeConfig

    mesh = pmesh.make_mesh((1, 8))
    specs = [ImageSpec(64, 100), ImageSpec(80, 133)]
    imgs = [rand_stack(1, 64, 100)[0], rand_stack(1, 80, 133)[0]]
    opts = StitchOptions(mode="min", gap=2, supersample=False)
    got, m = api.stitch_arrays(
        imgs, specs, opts,
        config=RuntimeConfig(engine="pallas", interpret=True, mesh=mesh),
        return_metrics=True)
    assert m.strategy == "space-sharded"
    plan = solve(specs, opts)
    want = oracle.stitch(plan, imgs)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_space_sharded_kernel_infeasible_falls_back(monkeypatch):
    """engine='auto' on a space mesh demotes to the gather engine when the
    kernel schedule is infeasible at the band geometry; engine='pallas'
    surfaces the error (pipeline._run_body's NotImplementedError branch)."""
    from imagestitching_tpu import api
    from imagestitching_tpu.config import RuntimeConfig
    from imagestitching_tpu.ops import pallas_resize as pr
    from imagestitching_tpu.parallel import sharding

    def infeasible(*a, **k):
        raise pr.Infeasible("synthetic: crop too large")

    monkeypatch.setattr(sharding, "_kernel_band_meta", infeasible)
    mesh = pmesh.make_mesh((1, 8))
    specs = [ImageSpec(64, 100), ImageSpec(80, 133)]
    imgs = [rand_stack(1, 64, 100)[0], rand_stack(1, 80, 133)[0]]
    opts = StitchOptions(mode="min", gap=2, supersample=False)
    got, m = api.stitch_arrays(
        imgs, specs, opts,
        config=RuntimeConfig(engine="auto", interpret=True, mesh=mesh),
        return_metrics=True)
    assert m.strategy == "space-sharded"     # demoted, not abandoned
    want = oracle.stitch(solve(specs, opts), imgs)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    with pytest.raises(NotImplementedError):
        api.stitch_arrays(
            imgs, specs, opts,
            config=RuntimeConfig(engine="pallas", interpret=True,
                                 mesh=mesh))


def test_space_sharded_budget_reject_falls_back():
    """VERDICT r1 weak #6: sharding engages only when the per-device peak
    (replicated sources + f32 band temporaries) fits the budget."""
    from imagestitching_tpu.config import MemoryBudget, RuntimeConfig
    from imagestitching_tpu.runtime import pipeline, tiler
    from imagestitching_tpu.runtime.logger import get_logger

    mesh = pmesh.make_mesh((1, 4), devices=jax.devices()[:4])
    specs = [ImageSpec(60, 40), ImageSpec(40, 60)]
    imgs = [rng.integers(0, 256, (s.raw_h, s.raw_w, 3), np.uint8)
            for s in specs]
    plan = solve(specs, StitchOptions(gap=2, supersample=False))
    peak = tiler.sharded_peak_bytes(plan, 4, 3)
    get_logger().clear()
    cfg = RuntimeConfig(engine="xla", mesh=mesh,
                        budget=MemoryBudget(hbm_bytes=peak - 1))
    out, m = pipeline.run(plan, imgs, cfg)
    assert m.strategy != "space-sharded"
    want = oracle.stitch(plan, imgs)
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1
    tags = [r["tag"] for r in get_logger().ring()]
    assert "pipeline.sharded_budget_reject" in tags

    # with an adequate budget the same job engages sharding
    cfg2 = RuntimeConfig(engine="xla", mesh=mesh,
                         budget=MemoryBudget(hbm_bytes=peak * 4))
    out2, m2 = pipeline.run(plan, imgs, cfg2)
    assert m2.strategy == "space-sharded"
    assert np.abs(out2.astype(int) - want.astype(int)).max() <= 1


def test_batch_on_2d_mesh_jobs_axis():
    """Batched serving on a 2D (jobs, space) mesh: batch shards over jobs,
    replicates over space — a config change, not a redesign (SURVEY §2c)."""
    mesh = pmesh.make_mesh((4, 2))
    specs = [ImageSpec(40, 24), ImageSpec(24, 32)]
    plan = solve(specs, StitchOptions(gap=1, supersample=False))
    b = 8
    stacks = [rng.integers(0, 256, (b, 24, 40, 3), np.uint8),
              rng.integers(0, 256, (b, 32, 24, 3), np.uint8)]
    out = pbatch.stitch_batch(plan, stacks, engine="xla", mesh=mesh)
    want = np.stack([oracle.stitch(plan, [s[i] for s in stacks])
                     for i in range(b)])
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1
    # the fused-kernel engine composes with the 2D mesh too: shard_map
    # shards jobs, replicates over the unmentioned space axis
    out_p = pbatch.stitch_batch(plan, stacks, engine="pallas", mesh=mesh,
                                interpret=True)
    assert np.abs(out_p.astype(int) - want.astype(int)).max() <= 1


def test_batched_pallas_accepts_empty_span_placement():
    """Regression: BatchedStitch's eager feasibility check once rejected
    plans containing a zero-area placement (rounded draw height 0) that
    _batched_pallas itself skips at compute time — check_plan_feasible
    now skips empty spans for every caller."""
    plan = plan_for([ImageSpec(33, 4), ImageSpec(4, 4)], mode="min")
    assert any(p.row_span[0] == p.row_span[1] for p in plan.placements)
    bs = pbatch.BatchedStitch(plan, 2, engine="pallas", interpret=True)
    stacks = [rand_stack(2, 33, 4), rand_stack(2, 4, 4)]
    got = np.asarray(bs(stacks))
    want = oracle_batch(plan, stacks)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
