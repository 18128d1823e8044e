"""Sharded single-job stitching: spatial row-band parallelism.

The domain's scaling axis is output-canvas pixels (SURVEY.md §5
"long-context"): the reference *refuses* big canvases (scaleDown clamp,
pages/index/index.js:1323-1357).  Here one giant job is split across chips by
canvas **row bands** — each device composites its own band.  Because every
output pixel depends on at most 2x2 source taps, bands are independent:
sources are replicated (small next to a giant canvas) and the compute has
**zero collectives**; only the final gather of disjoint bands touches ICI
(a pure all-gather of independent data).

Implementation: ``shard_map`` over the ``space`` mesh axis.  Each shard
composites its band with its own host-exact (float64) taps, so the sharded
result is bit-identical to the single-device result — band seams cannot
drift because taps are per-output-row constants, not accumulated state.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core import geometry
from ..core.layout import LayoutPlan
from ..ops import xla_compose


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


_ktap = xla_compose.ktap_axis


def _shard_taps(plan: LayoutPlan, n_shards: int, band: int) -> List[dict]:
    """Per-image stacked K-tap arrays, one row per shard.

    For shard k covering canvas rows [k*band, (k+1)*band): row tap windows
    for the intersection with each image's row span (padded to ``band``),
    column windows (shard-invariant, repeated), and the in-span mask.
    """
    out = []
    for p in plan.placements:
        r0, r1 = p.row_span
        c0, c1 = p.col_span
        ncols = max(1, c1 - c0)
        disp_w, disp_h = geometry.display_size(p.raw_w, p.raw_h,
                                               p.orientation)
        if c1 > c0 and r1 > r0:
            ci0, cw = geometry.filter_taps(c0, c1, p.x0, p.w, disp_w,
                                           plan.filter)
            fri0, frw = geometry.filter_taps(r0, r1, p.y0, p.h, disp_h,
                                             plan.filter)
        else:
            ci0, cw = np.zeros(1, np.int32), np.zeros((1, 1))
            fri0, frw = np.zeros(1, np.int32), np.zeros((1, 1))
        k_rows = frw.shape[1]
        rows_i0 = np.zeros((n_shards, band), np.int32)
        rows_w = np.zeros((n_shards, band, k_rows), np.float32)
        rows_in = np.zeros((n_shards, band), np.float32)  # in-span mask
        for k in range(n_shards):
            lo, hi = k * band, (k + 1) * band
            br0, br1 = max(r0, lo), min(r1, hi)
            if br1 <= br0 or c1 <= c0:
                continue
            # taps placed at their band-relative positions — the device never
            # shifts rows, it just masks
            rows_i0[k, br0 - lo: br1 - lo] = fri0[br0 - r0: br1 - r0]
            rows_w[k, br0 - lo: br1 - lo] = frw[br0 - r0: br1 - r0]
            rows_in[k, br0 - lo: br1 - lo] = 1.0
        out.append({
            "rows_i0": rows_i0, "rows_w": rows_w, "rows_in": rows_in,
            "cols_i0": np.broadcast_to(ci0.astype(np.int32),
                                       (n_shards, ncols)).copy(),
            "cols_w": np.broadcast_to(cw.astype(np.float32),
                                      (n_shards,) + cw.shape).copy(),
        })
    return out


def _compose_band(plan: LayoutPlan, channels: int, band: int,
                  images, taps):
    """Runs per shard: images replicated, taps carry this shard's rows
    (already band-positioned host-side; columns land at the static offset
    c0 and out-of-span rows are masked off)."""
    return _compose_band_sub(plan, channels, band, plan.placements,
                             images, taps)


def _kernel_band_meta(plan: LayoutPlan, p, channels: int, band: int,
                      n_shards: int):
    """Per-(shard, chunk) kernel schedule for one resample placement.

    Canvas-band-aligned windows let ONE compiled pallas schedule serve
    every (shard, chunk): shard k's chunk j covers canvas rows
    ``[k*band + j*th, ...)``; its taps sit at their in-chunk offsets
    (zero-weight outside the placement span) and are rebased to a
    per-chunk crop start ``s_lo`` so the device only slices ``crop_pad``
    source rows per call.  Raises ops.pallas_resize.Infeasible when the
    crop cannot fit VMEM (caller falls back to the gather engine).
    """
    from ..ops import pallas_resize as pr

    r0, r1 = p.row_span
    th = min(pr._TILE_ROWS, pr._round_up(band, 8))
    # deep downscales blow the VMEM crop at the default chunk height —
    # shrink th like _WindowPlan's own default-mode fallback does (shorter
    # chunks need proportionally shorter source crops); only a failure at
    # 8-row chunks is genuinely infeasible (callers fall back to gather)
    while True:
        n_chunks = _cdiv(band, th)
        windows = []
        for k in range(n_shards):
            for j in range(n_chunks):
                lo = k * band + j * th
                hi = min(lo + th, (k + 1) * band, plan.canvas_h)
                a0, a1 = max(r0, lo) - r0, min(r1, hi) - r0
                windows.append((a0, a1) if a1 > a0 else (0, 0))
        try:
            wp = pr._WindowPlan(p, plan.filter, channels, chunk_rows=th,
                                windows=windows)
            break
        except pr.Infeasible:
            if th <= 8:
                raise
            th = max(8, pr._round_up(th // 2, 8))
    k_taps = wp.rw.shape[1]
    i0 = np.zeros((n_shards, n_chunks, th, 1), np.int32)
    w = np.zeros((n_shards, n_chunks, th, k_taps), np.float32)
    slo = np.zeros((n_shards, n_chunks), np.int32)
    rows_in = np.zeros((n_shards, band), np.float32)
    h_pad = pr._round_up(wp.disp_h, 8)
    crop_pad = wp.static.m_h_pad
    for k in range(n_shards):
        for j in range(n_chunks):
            g = k * n_chunks + j
            a, valid, s_lo = wp.chunk_window(g)
            if valid <= 0:
                continue
            # keep s_lo + crop_pad inside the padded source so the device
            # dynamic_slice never clamps (a clamped start would shift the
            # data out from under the rebased taps)
            s_lo = min(s_lo, h_pad - crop_pad)
            lo = k * band + j * th
            pos0 = (a + r0) - lo
            i0[k, j, pos0: pos0 + valid, 0] = wp.ri0[a: a + valid] - s_lo
            w[k, j, pos0: pos0 + valid] = wp.rw[a: a + valid]
            slo[k, j] = s_lo
        br0, br1 = max(r0, k * band), min(r1, (k + 1) * band)
        if br1 > br0:
            rows_in[k, br0 - k * band: br1 - k * band] = 1.0
    return {
        "wp": wp, "n_chunks": n_chunks, "th": th,
        "h_pad": h_pad, "crop_pad": crop_pad,
        "taps": {"i0": i0, "w": w, "slo": slo, "rows_in": rows_in},
        # shard-invariant schedules, passed as REPLICATED jit args — baking
        # them in as closure constants would serialize them into the remote
        # compile payload (CLAUDE.md: HTTP 413 at ~300 MB; col_w is
        # (k_cols x cols_pad) f32, several MB at wide-K/wide-canvas)
        "const": {"ints": wp.ints, "col_i0": wp.col_i0, "col_w": wp.col_w},
    }


def _stage_full_chw(arr: np.ndarray, p, channels: int, h_pad: int,
                    w_pad: int) -> np.ndarray:
    """Oriented full source -> zero-padded planar CHW uint8 (kernel
    staging for the sharded compose: each shard slices its own crop)."""
    oriented = geometry.orient_array(np.asarray(arr), p.orientation)
    out = np.zeros((channels, h_pad, w_pad), np.uint8)
    out[:, : oriented.shape[0], : oriented.shape[1]] = \
        np.transpose(oriented, (2, 0, 1))
    return out


def _compose_band_pallas(plan: LayoutPlan, channels: int, band: int,
                         kern_meta: dict, xla_idx, interpret: bool,
                         kern_imgs, xla_imgs, kern_consts, kern_taps,
                         xla_taps):
    """Runs per shard: gather-engine compose for blit placements, then the
    fused kernel's regions masked in on top (placements are disjoint, so
    uint8 select after quantization == f32 composite then quantize)."""
    from ..ops import pallas_resize as pr

    # blit / gather placements first (includes the background fill)
    xla_placements = [plan.placements[i] for i in xla_idx]
    canvas = _compose_band_sub(plan, channels, band, xla_placements,
                               xla_imgs, xla_taps)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, plan.canvas_w), 1)
    for src, (idx, meta) in zip(kern_imgs, sorted(kern_meta.items())):
        p = plan.placements[idx]
        wp = meta["wp"]
        taps = kern_taps[idx]
        consts = kern_consts[idx]
        call = pr._jitted_call_static(wp.static, channels, interpret)
        regions = []
        for j in range(meta["n_chunks"]):
            crop = jax.lax.dynamic_slice(
                src, (0, taps["slo"][0, j], 0),
                (channels, meta["crop_pad"], wp.static.m_w_pad))
            regions.append(call(consts["ints"], crop, taps["i0"][0, j],
                                taps["w"][0, j], consts["col_i0"],
                                consts["col_w"]))
        chw = jnp.concatenate(regions, axis=1) if len(regions) > 1 \
            else regions[0]
        hwc = jnp.transpose(chw[:, :band, :wp.n_cols], (1, 2, 0))
        c0, c1 = p.col_span
        full = jnp.pad(hwc, ((0, 0), (c0, plan.canvas_w - c1), (0, 0)))
        mask = ((taps["rows_in"][0][:, None] > 0)
                & (col_ids[0] >= c0)[None, :] & (col_ids[0] < c1)[None, :])
        canvas = jnp.where(mask[:, :, None], full, canvas)
    return canvas


def _compose_band_sub(plan: LayoutPlan, channels: int, band: int,
                      placements, images, taps):
    """_compose_band generalized to a subset of placements (the pallas
    engine routes resample placements through the kernel instead)."""
    bg = jnp.asarray(plan.background[:channels], jnp.float32)
    canvas = jnp.broadcast_to(bg, (band, plan.canvas_w, channels))
    for raw, p, tp in zip(images, placements, taps):
        c0, c1 = p.col_span
        if c1 <= c0:
            continue
        img = xla_compose.orient_jnp(raw, p.orientation).astype(jnp.float32)
        rows = _ktap(img, tp["rows_i0"][0], tp["rows_w"][0], 0)
        full = _ktap(rows, tp["cols_i0"][0], tp["cols_w"][0], 1)
        region = jax.lax.dynamic_update_slice(
            jnp.zeros((band, plan.canvas_w, channels), jnp.float32),
            full, (0, c0, 0))
        in_rows = tp["rows_in"][0][:, None, None]
        col_ids = jax.lax.broadcasted_iota(jnp.int32,
                                           (1, plan.canvas_w, 1), 1)
        in_cols = (col_ids >= c0) & (col_ids < c1)
        mask = in_rows * in_cols.astype(jnp.float32)
        canvas = canvas * (1.0 - mask) + region * mask
    return xla_compose.to_uint8(canvas)


class ShardedStitch:
    """One job's canvas row-banded across the mesh's ``space`` axis.

    ``engine="xla"`` composes every placement with the 2-tap gather engine;
    ``engine="pallas"`` routes resample placements through the fused kernel
    (each shard runs the banded executor over its own band via shard_map —
    the multi-chip form of the north-star kernel, VERDICT r2 #7) and keeps
    the gather engine only for identity blits, where it IS a gather.
    Raises ops.pallas_resize.Infeasible if the kernel cannot serve a
    placement (callers fall back to ``engine="xla"``).
    """

    def __init__(self, plan: LayoutPlan, mesh: Mesh, channels: int = 3,
                 axis: str = "space", engine: str = "xla",
                 interpret: bool = False):
        from ..runtime.jaxcfg import ensure_compile_cache
        ensure_compile_cache()
        if engine not in ("xla", "pallas"):
            raise ValueError(f"unsupported sharded engine {engine!r}")
        self.plan = plan
        self.mesh = mesh
        self.channels = channels
        self.engine = engine
        n = mesh.shape[axis]
        self.n_shards = n
        self.band = _cdiv(plan.canvas_h, n)
        self.taps = _shard_taps(plan, n, self.band)

        if engine == "pallas":
            self._init_pallas(axis, interpret)
            return
        n_img = len(plan.placements)
        fn = functools.partial(_compose_band, plan, channels, self.band)
        taps_spec = jax.tree_util.tree_map(lambda _: P(axis), self.taps)
        self._jitted = jax.jit(shard_map(
            fn, mesh=mesh,
            in_specs=(tuple([P()] * n_img), taps_spec),
            out_specs=P(axis),
            check_vma=False))

    def _init_pallas(self, axis: str, interpret: bool) -> None:
        from ..ops import pallas_resize as pr

        plan, channels = self.plan, self.channels
        self._kern_meta: dict = {}
        self._xla_idx = []
        for p in plan.placements:
            drawn = (p.row_span[1] > p.row_span[0]
                     and p.col_span[1] > p.col_span[0])
            if not drawn:
                continue
            if pr.placement_is_copy(p, plan.filter) is not None:
                self._xla_idx.append(p.index)
            else:
                self._kern_meta[p.index] = _kernel_band_meta(
                    plan, p, channels, self.band, self.n_shards)
        self._xla_taps = [self.taps[i] for i in self._xla_idx]
        self._kern_taps = {i: m["taps"]
                           for i, m in self._kern_meta.items()}
        self._kern_const = {i: m["const"]
                            for i, m in self._kern_meta.items()}

        fn = functools.partial(_compose_band_pallas, plan, channels,
                               self.band, self._kern_meta,
                               tuple(self._xla_idx), interpret)
        kern_spec = jax.tree_util.tree_map(lambda _: P(axis),
                                           self._kern_taps)
        const_spec = jax.tree_util.tree_map(lambda _: P(),
                                            self._kern_const)
        xla_spec = jax.tree_util.tree_map(lambda _: P(axis),
                                          self._xla_taps)
        self._jitted = jax.jit(shard_map(
            fn, mesh=self.mesh,
            in_specs=(tuple([P()] * len(self._kern_meta)),
                      tuple([P()] * len(self._xla_idx)),
                      const_spec, kern_spec, xla_spec),
            out_specs=P(axis),
            check_vma=False))

    def __call__(self, images: Sequence[np.ndarray]) -> np.ndarray:
        if len(images) != len(self.plan.placements):
            raise ValueError("image count does not match plan")
        arrs = []
        for arr, p in zip(images, self.plan.placements):
            arr = np.asarray(arr)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            if arr.shape[:2] != (p.raw_h, p.raw_w):
                raise ValueError(
                    f"image {p.index}: got {arr.shape[1]}x{arr.shape[0]}, "
                    f"plan says {p.raw_w}x{p.raw_h}")
            arrs.append(arr)
        if self.engine == "pallas":
            kern_imgs = tuple(
                jnp.asarray(_stage_full_chw(
                    arrs[i], self.plan.placements[i], self.channels,
                    m["h_pad"], m["wp"].static.m_w_pad))
                for i, m in sorted(self._kern_meta.items()))
            xla_imgs = tuple(jnp.asarray(arrs[i]) for i in self._xla_idx)
            out = self._jitted(kern_imgs, xla_imgs, self._kern_const,
                               self._kern_taps, self._xla_taps)
        else:
            out = self._jitted(tuple(jnp.asarray(a) for a in arrs),
                               self.taps)
        return np.asarray(out)[: self.plan.canvas_h]
