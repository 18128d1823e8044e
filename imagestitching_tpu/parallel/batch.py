"""Batched multi-job stitching (BASELINE config 5: 64 concurrent 9-image jobs).

The reference processes one job at a time behind a UI mutex
(pages/index/index.js:25,1193).  Here, jobs sharing a layout signature stack
into (B, H_i, W_i, C) arrays per image slot and run as ONE device program:

* ``engine="pallas"`` — the fused kernel with a leading batch grid dimension
  (:func:`..ops.pallas_resize.resize_place_batch`): B x C x tiles in one
  launch, taps shared across the batch.
* ``engine="xla"``    — the 2-tap gather engine under ``jax.vmap``.

With a :class:`jax.sharding.Mesh`, batches are sharded over the ``jobs`` axis
— jobs are independent, so SPMD partitioning introduces **zero collectives**;
N chips give Nx throughput over ICI-free pure data parallelism.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.layout import LayoutPlan
from ..ops import pallas_resize, xla_compose


def _batched_pallas(plan: LayoutPlan, channels: int, interpret: bool,
                    images: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """images[i]: (B, H_i, W_i, C) uint8 -> (B, canvas_h, canvas_w, C) uint8."""
    from ..ops.assemble import assemble_canvas

    batch = images[0].shape[0]
    regions = {}
    for idx, (raw, p) in enumerate(zip(images, plan.placements)):
        if p.row_span[1] <= p.row_span[0] or p.col_span[1] <= p.col_span[0]:
            continue
        copy_off = pallas_resize.placement_is_copy(p, plan.filter)
        if copy_off is not None:
            oriented = _orient_bhwc(raw, p.orientation)
            sr, sc = copy_off
            nr = p.row_span[1] - p.row_span[0]
            nc = p.col_span[1] - p.col_span[0]
            regions[idx] = oriented[:, sr: sr + nr, sc: sc + nc, :]
            continue
        sched = pallas_resize._Schedule(p, plan.filter)
        src = _orient_pad_bchw(raw, p.orientation,
                               sched.m_h_pad, sched.m_w_pad)
        region, (r0, c0, nr, nc) = pallas_resize.resize_place_batch(
            src, p, plan.filter, interpret)
        regions[idx] = jnp.transpose(region[:, :, :nr, :nc], (0, 2, 3, 1))
    return assemble_canvas(plan, channels, regions, batch_shape=(batch,))


def _orient_bhwc(raw_bhwc: jnp.ndarray, orientation: int) -> jnp.ndarray:
    """Orientation swizzle on the HW axes of a BHWC batch."""
    x = raw_bhwc
    if orientation in (0, 1):
        return x
    if orientation == 2:
        return x[:, :, ::-1]
    if orientation == 3:
        return x[:, ::-1, ::-1]
    if orientation == 4:
        return x[:, ::-1, :]
    t = jnp.transpose(x, (0, 2, 1, 3))
    if orientation == 5:
        return t
    if orientation == 6:
        return t[:, :, ::-1]
    if orientation == 7:
        return t[:, ::-1, ::-1]
    if orientation == 8:
        return t[:, ::-1, :]
    raise ValueError(f"invalid orientation {orientation}")


def _orient_pad_bchw(raw_bhwc: jnp.ndarray, orientation: int,
                     h_pad: int, w_pad: int) -> jnp.ndarray:
    """(B, H, W, C) uint8 -> oriented, padded (B, C, H', W') uint8."""
    x = _orient_bhwc(raw_bhwc, orientation)
    bchw = jnp.transpose(x, (0, 3, 1, 2))
    return jnp.pad(bchw, ((0, 0), (0, 0),
                          (0, h_pad - bchw.shape[2]),
                          (0, w_pad - bchw.shape[3])))


def _batched_xla(plan: LayoutPlan, channels: int,
                 images: Sequence[jnp.ndarray]) -> jnp.ndarray:
    params = [xla_compose.placement_params(p, plan.filter)
              for p in plan.placements]

    def one(imgs):
        return xla_compose._stitch_impl(plan, channels, imgs, params)

    return jax.vmap(one)(list(images))


class BatchedStitch:
    """Compiled batched stitch for one layout signature x batch size.

    ``mesh``: optional jobs-axis mesh; inputs/outputs are sharded over it
    (pure DP, no collectives).  Jobs with mismatched shapes must be bucketed
    by ``plan.signature()`` upstream (see serve.server).
    """

    def __init__(self, plan: LayoutPlan, batch_size: int, channels: int = 3,
                 engine: str = "pallas", mesh: Optional[Mesh] = None,
                 interpret: bool = False):
        from ..runtime.jaxcfg import ensure_compile_cache
        ensure_compile_cache()
        if engine not in ("pallas", "xla"):
            raise ValueError(f"unsupported batch engine {engine!r}")
        if engine == "pallas":
            # Shared predicate (skips zero-area placements, which the
            # compute path also skips — an eager per-placement loop here
            # once rejected plans _batched_pallas runs fine).
            pallas_resize.check_plan_feasible(plan)
        self.plan = plan
        self.batch_size = batch_size
        self.channels = channels
        self.engine = engine
        self.mesh = mesh

        if engine == "pallas":
            fn = functools.partial(_batched_pallas, plan, channels, interpret)
        else:
            fn = functools.partial(_batched_xla, plan, channels)

        if mesh is not None and engine == "pallas":
            # XLA's SPMD partitioner cannot partition a pallas_call (an
            # opaque custom call): under plain jit+in_shardings it inserts
            # an all-gather of the full batch and every device computes all
            # B jobs redundantly (verified in the compiled HLO).  shard_map
            # makes the partitioning manual and exact: each device runs the
            # kernel on its local batch shard, zero collectives.
            njobs = mesh.shape["jobs"]
            if batch_size % njobs != 0:
                raise ValueError(
                    f"pallas batch under a mesh needs batch_size "
                    f"({batch_size}) divisible by the jobs axis ({njobs}); "
                    "pad the batch (serve.server rounds to jobs multiples)")
            n_img = len(plan.placements)
            self._jitted = jax.jit(shard_map(
                lambda imgs: fn(list(imgs)), mesh=mesh,
                in_specs=([P("jobs")] * n_img,),
                out_specs=P("jobs"), check_vma=False))
        elif mesh is not None:
            in_shard = NamedSharding(mesh, P("jobs"))
            out_shard = NamedSharding(mesh, P("jobs"))
            n_img = len(plan.placements)
            self._jitted = jax.jit(
                fn,
                in_shardings=([in_shard] * n_img,),
                out_shardings=out_shard)
        else:
            self._jitted = jax.jit(fn)

    def warm(self) -> None:
        """Compile + execute once on zero-filled inputs, fetching O(1) bytes.

        Device-materialized zeros (``jnp.zeros`` inside jit) avoid staging
        B copies of every input through the host->device link, and the
        one-element readback forces completion — ``block_until_ready`` can
        return at enqueue on relayed backends — without a full-canvas D2H
        (~GBs at batch 64, minutes through a slow relay)."""
        dev = [jnp.zeros((self.batch_size, p.raw_h, p.raw_w, self.channels),
                         jnp.uint8) for p in self.plan.placements]
        out = self._jitted(dev)
        np.asarray(out[:1, :1, :1, :1])

    def __call__(self, stacked_images: Sequence[np.ndarray]) -> np.ndarray:
        """stacked_images[i]: (B, H_i, W_i, C) uint8 for image slot i."""
        if len(stacked_images) != len(self.plan.placements):
            raise ValueError("image-slot count does not match plan")
        dev = []
        for arr, p in zip(stacked_images, self.plan.placements):
            arr = np.asarray(arr)
            if arr.ndim != 4 or arr.shape[0] != self.batch_size:
                raise ValueError(
                    f"slot {p.index}: expected (B={self.batch_size}, H, W, C),"
                    f" got {arr.shape}")
            if arr.shape[1:3] != (p.raw_h, p.raw_w):
                raise ValueError(
                    f"slot {p.index}: got {arr.shape[2]}x{arr.shape[1]}, "
                    f"plan says {p.raw_w}x{p.raw_h}")
            if arr.dtype != np.uint8:
                raise ValueError("batched stitch expects uint8")
            dev.append(jnp.asarray(arr))
        return np.asarray(self._jitted(dev))


def stitch_batch(plan: LayoutPlan, stacked_images: Sequence[np.ndarray],
                 engine: str = "pallas", mesh: Optional[Mesh] = None,
                 interpret: bool = False) -> np.ndarray:
    batch = int(np.asarray(stacked_images[0]).shape[0])
    channels = int(np.asarray(stacked_images[0]).shape[3])
    return BatchedStitch(plan, batch, channels, engine, mesh,
                         interpret)(stacked_images)
