"""Fused Pallas resize-and-place kernel — the framework's north-star compute.

TPU-native replacement for the reference's per-image native raster call
(``drawWithOrientation`` -> Canvas-2D ``drawImage`` bilinear resample,
utils/canvas.js:153-202, invoked from the hot loop at
pages/index/index.js:1526-1554).  One kernel launch produces one image's
entire dest rect, resampled and quantized, ready to drop into the canvas.

Design (see also core/geometry.py):

* **Separable bilinear as banded MXU matmuls.**  For an output tile
  ``(Th, Tw)`` the kernel computes ``Wr @ band @ Wc`` where ``band`` is the
  just-DMA'd source window ``(Bh, Bw)`` and ``Wr (Th, Bh)`` / ``Wc (Bw, Tw)``
  are the banded bilinear weight blocks.  Each weight row has exactly 2
  nonzeros, but materializing it as a dense *band* keeps the arithmetic on
  the MXU with zero gathers — the band is ~``tile/scale + 3`` wide, so the
  FLOP overhead vs. a true 2-tap gather is ~2x while running on hardware
  ~100x faster than gather paths.
* **Exact taps, built on device.**  Tap windows are computed on the host in
  float64 by :func:`geometry.filter_taps` (row-identical to the oracle's
  dense matrices) and shipped as per-output-pixel ``(i0, w[:K])`` arrays; the
  kernel reconstructs the weight block by iota-comparison:
  ``Wr[r, b] = sum_k (b == i0[r] + k) * w[r, k]``.  Bilinear is K=2; the
  triangle/box antialiasing filters are the same kernel with wider windows
  (K capped at 64 taps; beyond that the XLA engine takes over).  No f32
  coordinate math on device ⇒ no tap drift at tile seams.
* **Sources stay in HBM** (planar CHW uint8); each grid step DMAs only its
  band to VMEM (scalar-prefetched band starts), and writes the output tile
  as uint8 (quantization fused into the store).  HBM traffic ≈ bytes(source
  bands) + bytes(uint8 output) — speed-of-light for this op.
* **Precision**: the MXU's native pass is bf16; contractions run on split
  bf16 (hi, lo) operand pairs — uint8 pixels are exact in bf16 and hi+lo
  carries ~16 weight mantissa bits, keeping error ~255*2^-17 (far below the
  0.5 quantization step) at native MXU speed (2+3 passes vs 12 for fp32).
* **Orientation** is applied as an XLA transpose/flip on the uint8 source
  before the kernel (a single bandwidth-bound pass); the kernel itself always
  samples axis-aligned.

Memory layout: canvas and sources are planar (C, H, W) on device — W rides
the 128-wide lane dimension; HWC<->CHW conversion happens at the host/API
boundary.
"""

from __future__ import annotations

import collections
import functools
import math
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import geometry
from ..core.layout import LayoutPlan, Placement

# Default output tile. Th: f32 sublane-friendly; Tw: one lane group x4.
_TILE_ROWS = 256
_TILE_COLS = 512
# Cap on the per-step VMEM working set (bands + weight blocks + tiles);
# v5e has ~16 MB VMEM/core — leave headroom for Mosaic's own buffers.
_MAX_BAND_BYTES = 10 * 1024 * 1024


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


class Infeasible(NotImplementedError):
    """Raised when a placement can't run under VMEM constraints (fallback: XLA)."""


def check_plan_feasible(plan) -> None:
    """Raise :class:`Infeasible` unless every non-empty placement in ``plan``
    schedules on the fused kernel.

    Zero-area placements (a source whose rounded draw height/width is 0 —
    the reference draws these as no-ops, pages/index/index.js:1526-1554)
    are skipped exactly as the compute paths skip them.  This is THE plan
    feasibility predicate: pipeline._pallas_ok, serve._resolve_engine,
    BatchedStitch.__init__ and the soak all route through it so the four
    call sites can never drift again.
    """
    for p in plan.placements:
        if p.row_span[1] > p.row_span[0] and p.col_span[1] > p.col_span[0]:
            _Schedule(p, plan.filter)


def plan_feasible(plan) -> bool:
    """``check_plan_feasible`` as a predicate."""
    try:
        check_plan_feasible(plan)
        return True
    except NotImplementedError:
        return False


# ---------------------------------------------------------------------------
# Per-placement static schedule
# ---------------------------------------------------------------------------

# Copy/blit detection lives in core.geometry (numpy-only, usable without
# importing this jax-heavy module); re-exported here for the engine callers.
identity_axis = geometry.identity_axis
placement_is_copy = geometry.placement_copy_offsets


_MAX_TAPS = 64       # K cap; heavier downscales fall back to the XLA engine

# Time-model constants for tile selection (v5e-class chip).  The kernel is
# MXU-flop-bound at deep downscales — the dense banded-matmul trades gathers
# for flops, and band width grows as tile/scale — so tile choice matters:
# smaller col tiles shrink the (Bh x Bw) row-pass operand quadratically.
_DMA_SLOTS = 3           # band buffers; issue distance = _DMA_SLOTS - 1
_MXU_EFF_FLOPS = 120e12      # ~197 TF/s bf16 peak x ~0.6 achieved
_VPU_EFF_OPS = 4e12          # elementwise ops/s (casts, splits, quantize)
_HBM_BPS = 6e11              # achievable HBM stream bandwidth
_STEP_OVERHEAD_S = 1.2e-6      # per-grid-step dispatch/DMA-setup cost
# Batched (B, gr, gc) grids measure a HIGHER effective per-step cost than
# single-job grids: at this calibration the config-5 slots flip from
# 128x128 to 128x256 tiles (292 -> 162 steps/job) and the full 64-job
# batch measures 61.2 ms vs 65.0 ms (-6%), while the same picks REGRESS
# single-job configs (config 3: 0.93 -> 1.21 ms) — hence two constants,
# not one (benchmarks/profile_stepfusion.py, round 3).
_STEP_OVERHEAD_BATCHED_S = 2.5e-6
# Column-subtile fusion (n_sub): each grid step runs n_sub independent
# (band DMA + contraction + store) column subtiles, paying ONE dispatch
# overhead.  Built as the structural shot at config 5's modeled ~42%
# per-step overhead (VERDICT r3 #3) — and MEASURED A NEGATIVE on the real
# chip (benchmarks/profile_nsub.py, 2026-08-19, B=64 config-5 batch):
#   n_sub=1  162 steps/job  61.3 ms   <- fastest (= round-3 picks)
#   n_sub=2  146 steps/job  63.8 ms
#   n_sub=4   81 steps/job  62.6-63.0 ms  (the free pick at (1,2,4))
# Halving grid-step dispatches does NOT halve the overhead term, so the
# calibrated 2.5 us is a per-VIRTUAL-step cost (band DMA issue + slot
# semaphore waits, which n_sub still pays per subtile), not a dispatch
# cost n_sub can amortize.  Candidates therefore stay at (1,): the
# machinery + parity tests remain (n_sub_force) for future targets, but
# the free search must not pick a measured regression.  Don't re-enable
# without a chip burn showing a win.
_N_SUB_BATCHED = (1,)


def _vmem_bytes(th: int, tw: int, bh: int, bw: int, channels: int = 3,
                n_sub: int = 1, k_cols: int = 0) -> int:
    # double-buffered uint8 bands + f32/bf16 band copies, hi/lo weight
    # blocks, f32+bf16 intermediates, int32+uint8 output tile — all channels
    # resident per step (channel-fused kernel).  The n_sub=1 base formula is
    # chip-validated as-is (every pre-fusion pick ran under it); do not
    # retune it without a real-TPU burn.
    #
    # n_sub > 1 widens, PER EXTRA SUBTILE (r4 review — the first cut
    # under-modeled this; only interpret-mode validation existed):
    #   * the dense (bw, tw) col weight hi/lo blocks (6 B/px);
    #   * the (channels, th, n_sub*tw) uint8 OUT grid block, which the
    #     Pallas pipeline double-buffers (2 B/px, not 1);
    #   * the (k_cols, n_sub*tw) f32 col_w input grid block, also
    #     double-buffered (8 B/px of tw) — material at deep-downscale
    #     wide-K where k_cols reaches tens of taps.
    # Per-subtile f32 intermediates die before the next subtile's store and
    # stay transient (single allocation Mosaic reuses across the unroll).
    return (channels * bh * bw * 8
            + (th * bh + bw * tw) * 6
            + channels * th * (bw * 8 + tw * 5)
            + (n_sub - 1) * (bw * tw * 6 + 2 * channels * th * tw
                             + 8 * k_cols * tw))


def _model_flops(th: int, tw: int, bh: int, bw: int,
                 channels: int = 3, col_first: bool = False) -> int:
    """Split-bf16 contraction model flops for ONE (th x tw) output tile.

    The single source of truth for the model-flop formula — the tile
    chooser prices candidates with it and benchmarks/run_all.py computes
    the published MFU line from it; changing a pass count or contraction
    order here updates both.
    """
    if col_first:
        return channels * (4 * max(bh, 128) * bw * tw
                           + 6 * max(th, 128) * bh * tw)
    return channels * (4 * max(th, 128) * bh * bw
                       + 6 * max(th, 128) * bw * tw)


def _model_step_time(th: int, tw: int, bh: int, bw: int,
                     channels: int = 3, col_first: bool = False,
                     overhead: Optional[float] = None,
                     n_sub: int = 1) -> float:
    """Split-bf16 contraction cost for one grid step, either order.

    Row-first: 2 passes of (Th x Bh)@(Bh x Bw) then 3 of (Th x Bw)@(Bw x Tw).
    Col-first: 2 passes of (Bh x Bw)@(Bw x Tw) then 3 of (Th x Bh)@(Bh x Tw).
    Contract-first along the axis whose tile dim is larger — the first pass
    runs over the full (Bh x Bw) band, so dividing it by the bigger tile
    side minimizes per-pixel flops.  VPU term covers the uint8->f32 band
    casts and hi/lo splits (elementwise, proportional to band size).

    ``n_sub`` column subtiles share one grid step (and one dispatch
    overhead): work terms scale by n_sub, overhead does not — the whole
    point of the fusion (VERDICT r3 #3).
    """
    flops = _model_flops(th, tw, bh, bw, channels, col_first)
    inter = bh * tw if col_first else th * bw
    vpu = channels * (4 * bh * bw + 4 * inter + 4 * th * tw)
    dma = channels * (bh * bw + th * tw)
    return (n_sub * (flops / _MXU_EFF_FLOPS + vpu / _VPU_EFF_OPS
                     + dma / _HBM_BPS)
            + (_STEP_OVERHEAD_S if overhead is None else overhead))


def _choose_tiles(ri0: np.ndarray, ci0: np.ndarray, k_rows: int, k_cols: int,
                  n_rows: int, n_cols: int, m_h_pad: int, m_w_pad: int,
                  th_fixed: Optional[int] = None,
                  overhead: Optional[float] = None,
                  n_sub_cands: Tuple[int, ...] = (1,),
                  ) -> Tuple[int, int, int, int, bool, int]:
    """Pick (th, tw, bh, bw, col_first, n_sub) minimizing modeled total time
    under the VMEM cap.

    Per tile: split-bf16 contractions cost ``4*M*Bh*Bw + 6*M*Bw*Tw`` flops
    (2-pass row, 3-pass col; M padded to the 128-wide MXU), DMA moves
    ``Bh*Bw`` band bytes plus the output tile, and each grid step pays a
    fixed dispatch overhead.  Edge waste is captured by minimizing the TOTAL
    over the ceil-divided grid, not a per-pixel ratio.  ``n_sub`` column
    subtiles per grid step amortize the dispatch overhead WITHOUT growing
    the band (unlike a wider tw, which grows bw ~ tw/scale) — each subtile
    keeps its own band DMA and contraction.
    """
    th_max = min(_TILE_ROWS, _round_up(n_rows, 8))
    tw_max = min(_TILE_COLS, _round_up(n_cols, 128))
    if th_fixed is not None:
        th_cands = [min(th_fixed, th_max)]
    else:
        th_cands = sorted({min(t, th_max) for t in (32, 64, 128, 256)})
    tw_cands = sorted({min(t, tw_max) for t in (128, 256, 512)})

    best = None
    for th in th_cands:
        bh = _Schedule._band_size(ri0, k_rows, th, m_h_pad, 8)
        for tw in tw_cands:
            bw = _Schedule._band_size(ci0, k_cols, tw, m_w_pad, 128)
            for n_sub in n_sub_cands:
                if n_sub > 1 and n_sub * tw > _round_up(n_cols, 128):
                    continue            # fusion wider than the whole job
                if _vmem_bytes(th, tw, bh, bw, n_sub=n_sub,
                               k_cols=k_cols) > _MAX_BAND_BYTES:
                    continue
                tiles = _cdiv(n_rows, th) * _cdiv(n_cols, n_sub * tw)
                for cf in (False, True):
                    total = tiles * _model_step_time(th, tw, bh, bw,
                                                     col_first=cf,
                                                     overhead=overhead,
                                                     n_sub=n_sub)
                    if best is None or total < best[0]:
                        best = (total, th, tw, bh, bw, cf, n_sub)
    if best is None:
        raise Infeasible(
            "source band too large for VMEM even at 32x128 tiles "
            "(extreme downscale; use the XLA engine)")
    return best[1], best[2], best[3], best[4], best[5], best[6]

# The static geometry one compiled pallas_call is keyed on.  Everything else
# (taps, band starts, the source itself) is a runtime argument, so placements
# (or row-window chunks) sharing this tuple share ONE compile.
_SchedStatic = collections.namedtuple(
    "_SchedStatic",
    "m_h m_w m_h_pad m_w_pad th tw bh bw grid_r grid_c "
    "k_rows k_cols rows_pad cols_pad col_first n_sub",
    defaults=(1,))      # n_sub: column subtiles fused into one grid step


class _Schedule:
    """Static tiling schedule + host-computed K-tap weights for one placement.

    Any separable filter reduces to per-output-pixel windows ``(i0, w[:K])``
    (geometry.filter_taps); bilinear is the K=2 case.
    """

    def __init__(self, p: Placement, filter_kind: str,
                 batched: bool = False,
                 n_sub_force: Optional[int] = None):
        # ``n_sub_force`` pins the column-subtile fusion factor (tests and
        # the step-fusion profiler); None = model-chosen.
        self.p = p
        self.batched = batched
        disp_w, disp_h = geometry.display_size(p.raw_w, p.raw_h, p.orientation)
        self.m_h, self.m_w = disp_h, disp_w
        # Mosaic memref slices must be tiling-aligned: (8, 128) shape/offset
        # alignment for the (sublane, lane) dims.  Sources are zero-padded to
        # these multiples on device (weights never reference the pad).
        self.m_h_pad = _round_up(disp_h, 8)
        self.m_w_pad = _round_up(disp_w, 128)
        r0, r1 = p.row_span
        c0, c1 = p.col_span
        self.r0, self.c0 = r0, c0
        self.n_rows, self.n_cols = r1 - r0, c1 - c0
        if self.n_rows <= 0 or self.n_cols <= 0:
            raise Infeasible("empty dest rect")

        # Host-exact taps (float64 weights, stored f32).
        ri0, rw = geometry.filter_taps(r0, r1, p.y0, p.h, self.m_h,
                                       filter_kind)
        ci0, cw = geometry.filter_taps(c0, c1, p.x0, p.w, self.m_w,
                                       filter_kind)
        self.k_rows = rw.shape[1]
        self.k_cols = cw.shape[1]
        if max(self.k_rows, self.k_cols) > _MAX_TAPS:
            raise Infeasible(
                f"filter window K={max(self.k_rows, self.k_cols)} exceeds "
                f"{_MAX_TAPS} taps (extreme downscale; use the XLA engine)")

        # Pick tile sizes + contraction order by the time model; batched
        # grids carry a higher calibrated per-step overhead, biasing them
        # toward fewer, larger tiles (_STEP_OVERHEAD_BATCHED_S) and making
        # column-subtile fusion (n_sub) worth its VMEM.
        (self.th, self.tw, self.bh, self.bw, self.col_first,
         self.n_sub) = _choose_tiles(
            ri0, ci0, self.k_rows, self.k_cols, self.n_rows, self.n_cols,
            self.m_h_pad, self.m_w_pad,
            overhead=_STEP_OVERHEAD_BATCHED_S if batched else None,
            n_sub_cands=((n_sub_force,) if n_sub_force is not None
                         else _N_SUB_BATCHED if batched else (1,)))
        th, tw, n_sub = self.th, self.tw, self.n_sub
        self.grid_r = _cdiv(self.n_rows, th)
        # grid_c counts GRID STEPS (each covering n_sub subtiles of tw cols)
        self.grid_c = _cdiv(self.n_cols, n_sub * tw)
        n_tiles_c = self.grid_c * n_sub          # col subtiles incl. padding

        # Tap arrays padded to tile multiples.  Rows ride the sublane axis,
        # cols the lane axis — blocks then already have the broadcast shape
        # the kernel needs, with no on-device transposes.
        self.rows_pad = self.grid_r * th
        self.cols_pad = n_tiles_c * tw
        self.row_i0 = _pad_to(ri0, self.rows_pad).reshape(-1, 1)
        self.row_w = _pad_to(rw.astype(np.float32), self.rows_pad)
        self.col_i0 = _pad_to(ci0, self.cols_pad).reshape(1, -1)
        self.col_w = np.ascontiguousarray(
            _pad_to(cw.astype(np.float32), self.cols_pad).T)   # (K, cols_pad)

        # Band starts per (sub)tile: aligned down to the slice alignment and
        # clamped so a full static-size band always fits in the padded source.
        self.row_starts = self._band_starts(ri0, self.k_rows, self.grid_r,
                                            th, self.bh, self.m_h,
                                            self.m_h_pad, 8)
        self.col_starts = self._band_starts(ci0, self.k_cols, n_tiles_c,
                                            tw, self.bw, self.m_w,
                                            self.m_w_pad, 128)

    @staticmethod
    def _band_size(i0: np.ndarray, k: int, tile: int, m_pad: int,
                   align: int) -> int:
        # widest source window any `tile` consecutive dest px can need
        # (data-driven from the actual taps), plus one `align` of slack for
        # aligning the band start down.
        n = len(i0)
        need = 1
        for g in range(_cdiv(n, tile)):
            lo = int(i0[min(g * tile, n - 1)])
            hi = int(i0[min((g + 1) * tile - 1, n - 1)]) + k
            need = max(need, hi - lo)
        return max(align, min(m_pad, _round_up(need + align, align)))

    @staticmethod
    def _band_starts(i0: np.ndarray, k: int, grid: int, tile: int, band: int,
                     m: int, m_pad: int, align: int) -> np.ndarray:
        starts = np.zeros((grid,), np.int32)
        n = len(i0)
        for g in range(grid):
            lo = int(i0[min(g * tile, n - 1)])
            # in-range taps never exceed m (out-of-range taps carry zero
            # weight), so coverage is only ever needed up to m
            hi = min(int(i0[min((g + 1) * tile - 1, n - 1)]) + k, m)
            start = max(0, min((lo // align) * align, m_pad - band))
            if hi - start > band:
                raise Infeasible("band size underestimated")  # defensive
            starts[g] = start
        return starts

    @property
    def ints(self) -> np.ndarray:
        return np.concatenate([self.row_starts, self.col_starts])

    @property
    def static(self) -> _SchedStatic:
        return _SchedStatic(
            self.m_h, self.m_w, self.m_h_pad, self.m_w_pad, self.th, self.tw,
            self.bh, self.bw, self.grid_r, self.grid_c, self.k_rows,
            self.k_cols, self.rows_pad, self.cols_pad, self.col_first,
            self.n_sub)


def _pad_to(arr: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((n,) + arr.shape[1:], arr.dtype)
    out[: len(arr)] = arr
    return out


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _make_kernel(s: _SchedStatic, batched: bool, channels: int, batch: int,
                 exact_f32: bool = False):
    bh, bw = s.bh, s.bw
    grid_r, grid_c = s.grid_r, s.grid_c
    n_sub = s.n_sub
    # DMA pipelining runs over VIRTUAL steps: one per column subtile, n_sub
    # of them per grid step.  With n_sub=1 this is exactly the grid step.
    total_vs = max(1, batch) * grid_r * grid_c * n_sub

    def kernel(ints, src, row_i0, row_w, col_i0, col_w, out, band, sem):
        # grid is (gr, gc) single-job or (B, gr, gc) batched — ALL channels
        # of a tile are processed in one step (one weight build, one band
        # DMA, a 3x-taller fused col matmul).  Grid steps run sequentially
        # (all dims "arbitrary"), so the source band for virtual step k+1 is
        # DMA'd into another buffer slot while step k computes.  n_sub > 1
        # fuses that many column subtiles into one grid step — one dispatch
        # overhead, n_sub independent (DMA + contraction + store) bodies.
        off = 1 if batched else 0
        i = pl.program_id(off)
        j = pl.program_id(off + 1)
        if batched:
            step = (pl.program_id(0) * grid_r + i) * grid_c + j
        else:
            step = i * grid_c + j
        base_vs = step * n_sub

        def dma_for(vs, slot_):
            u_ = jax.lax.rem(vs, n_sub)
            t = jax.lax.div(vs, n_sub)
            j_ = jax.lax.rem(t, grid_c)
            r = jax.lax.div(t, grid_c)
            i_ = jax.lax.rem(r, grid_r)
            # Band starts are host-aligned to the (8, 128) slice tiling; the
            # multiple_of hints let Mosaic prove it for the dynamic slice.
            rs_ = pl.multiple_of(ints[i_], 8)
            cs_ = pl.multiple_of(ints[grid_r + j_ * n_sub + u_], 128)
            if batched:
                b_ = jax.lax.div(r, grid_r)
                sl = src.at[b_, :, pl.ds(rs_, bh), pl.ds(cs_, bw)]
            else:
                sl = src.at[:, pl.ds(rs_, bh), pl.ds(cs_, bw)]
            return pltpu.make_async_copy(sl, band.at[slot_], sem.at[slot_])

        # issue distance = _DMA_SLOTS - 1: band DMAs run that many virtual
        # steps ahead of compute, hiding DMA latency longer than one body
        @pl.when(step == 0)
        def _():
            for d in range(_DMA_SLOTS - 1):
                @pl.when(d < total_vs)
                def _(d=d):
                    dma_for(d, d % _DMA_SLOTS).start()

        rs = pl.multiple_of(ints[i], 8)

        # Row-weight block: source-absolute iota compared against the K-tap
        # windows (host-exact f64 taps, geometry.filter_taps); bilinear is
        # K=2.  Static K -> the loop unrolls into K vectorized selects.
        # Built ONCE per grid step and shared by every channel AND subtile.
        b_rows = jax.lax.broadcasted_iota(jnp.int32, (s.th, bh), 1) + rs
        i0r = row_i0[...]                    # (Th, 1)
        wr = jnp.zeros((s.th, bh), jnp.float32)
        for k in range(s.k_rows):
            wr = wr + jnp.where(b_rows == i0r + k, row_w[:, k][:, None], 0.0)
        if not exact_f32:
            wr_hi = wr.astype(jnp.bfloat16)
            wr_lo = (wr - wr_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        for u in range(n_sub):
            vs = base_vs + u
            slot = jax.lax.rem(vs, _DMA_SLOTS)

            @pl.when(vs + _DMA_SLOTS - 1 < total_vs)
            def _(vs=vs):
                dma_for(vs + _DMA_SLOTS - 1,
                        jax.lax.rem(vs + _DMA_SLOTS - 1, _DMA_SLOTS)).start()

            cs = pl.multiple_of(ints[grid_r + j * n_sub + u], 128)
            b_cols = jax.lax.broadcasted_iota(jnp.int32, (bw, s.tw), 0) + cs
            i0c = col_i0[:, u * s.tw:(u + 1) * s.tw]        # (1, Tw)
            wc = jnp.zeros((bw, s.tw), jnp.float32)
            for k in range(s.k_cols):
                wc = wc + jnp.where(b_cols == i0c + k,
                                    col_w[k, u * s.tw:(u + 1) * s.tw][None, :],
                                    0.0)

            dma_for(vs, slot).wait()
            # Precision: the MXU's native pass is bf16 (~8 mantissa bits),
            # which alone costs +-2 uint8 levels vs the float64 oracle;
            # fp32-HIGHEST contractions fix parity but run ~6 bf16 passes.
            # Instead split each f32 operand into a bf16 (hi, lo) pair:
            # uint8 pixel values are EXACT in bf16, and hi+lo carries ~16
            # mantissa bits of the weights, so the residual error is
            # ~255 * 2^-17 << the 0.5 quantization step — at 2 + 3
            # native-speed passes instead of 12.
            if exact_f32:
                # interpret mode: XLA:CPU's default-precision f32 matmul is
                # bf16-grade (measured 0.25% relative error -> up to +-2
                # uint8 levels where real hardware stays within 1, because
                # the MXU's split-bf16 scheme accumulates in exact f32).
                # HIGHEST forces a true f32 contraction, making interpret a
                # faithful parity proxy for the hardware path.
                hi = jax.lax.Precision.HIGHEST
                outs = []
                for c in range(channels):
                    bandf = band[slot, c].astype(jnp.int32) \
                                         .astype(jnp.float32)
                    if s.col_first:
                        outs.append(jnp.matmul(
                            wr, jnp.matmul(bandf, wc, precision=hi),
                            precision=hi))
                    else:
                        outs.append(jnp.matmul(
                            jnp.matmul(wr, bandf, precision=hi), wc,
                            precision=hi))
                res = (outs[0] if channels == 1
                       else jnp.concatenate(outs, axis=0))
                _store(res, out, u)
                continue
            wc_hi = wc.astype(jnp.bfloat16)
            wc_lo = (wc - wc_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            if s.col_first:
                # contract cols first (2 passes over the band), then rows
                # (3): cheaper when the band is wide relative to the tile
                # (see _model_step_time).
                outs = []
                for c in range(channels):
                    # Mosaic has no direct uint8 casts; route via int32.
                    # Pixels 0-255 are exact in bf16, so skip the f32
                    # intermediate (one fewer VPU pass over the band).
                    band16 = band[slot, c].astype(jnp.int32) \
                                          .astype(jnp.bfloat16)
                    t2 = (jnp.dot(band16, wc_hi,
                                  preferred_element_type=jnp.float32)
                          + jnp.dot(band16, wc_lo,
                                    preferred_element_type=jnp.float32))
                    t2_hi = t2.astype(jnp.bfloat16)
                    t2_lo = (t2 - t2_hi.astype(jnp.float32)) \
                        .astype(jnp.bfloat16)
                    outs.append(
                        jnp.dot(wr_hi, t2_hi,
                                preferred_element_type=jnp.float32)
                        + jnp.dot(wr_hi, t2_lo,
                                  preferred_element_type=jnp.float32)
                        + jnp.dot(wr_lo, t2_hi,
                                  preferred_element_type=jnp.float32))
                res = (outs[0] if channels == 1
                       else jnp.concatenate(outs, axis=0))
            else:
                tmps = []
                for c in range(channels):
                    band16 = band[slot, c].astype(jnp.int32) \
                                          .astype(jnp.bfloat16)
                    tmps.append(
                        jnp.dot(wr_hi, band16,
                                preferred_element_type=jnp.float32)
                        + jnp.dot(wr_lo, band16,
                                  preferred_element_type=jnp.float32))
                # (C*Th, Bw): channels stacked on the sublane axis so the
                # col pass is ONE tall matmul (M = C*Th) instead of C
                # narrow ones.
                tmp = tmps[0] if channels == 1 \
                    else jnp.concatenate(tmps, axis=0)
                tmp_hi = tmp.astype(jnp.bfloat16)
                tmp_lo = (tmp - tmp_hi.astype(jnp.float32)) \
                    .astype(jnp.bfloat16)
                res = (jnp.dot(tmp_hi, wc_hi,
                               preferred_element_type=jnp.float32)
                       + jnp.dot(tmp_hi, wc_lo,
                                 preferred_element_type=jnp.float32)
                       + jnp.dot(tmp_lo, wc_hi,
                                 preferred_element_type=jnp.float32))
            _store(res, out, u)

    def _store(res, out, u):
        # one quantize/store tail for both precision paths: clip/round is
        # the framework-wide uint8 contract (oracle.to_uint8 twin)
        q = jnp.clip(jnp.floor(res + 0.5), 0.0, 255.0).astype(jnp.int32)
        q = q.astype(jnp.uint8).reshape(channels, s.th, s.tw)
        if n_sub == 1:              # byte-identical to the pre-fusion path
            if batched:
                out[0] = q
            else:
                out[...] = q
        elif batched:
            out[0, :, :, u * s.tw:(u + 1) * s.tw] = q
        else:
            out[:, :, u * s.tw:(u + 1) * s.tw] = q

    return kernel


@functools.lru_cache(maxsize=512)
def _sched_cache(key: Tuple) -> "_Schedule":
    p, filter_kind = key[0], key[1]
    batched = key[2] if len(key) > 2 else False
    return _Schedule(p, filter_kind, batched)


def _build_call(key: Tuple, channels: int, interpret: bool, batch: int = 0):
    """Resolve (placement, filter) -> (schedule, compiled call).

    ``batch=0`` -> single-job call on (C, mh, mw) sources; ``batch=B`` -> one
    fused call over a stacked batch (B, C, mh, mw) with a leading batch grid
    dimension (BASELINE config 5 serving mode; its schedule uses the batched
    overhead calibration).  Calls are cached by the schedule's STATIC
    geometry, so e.g. nine equal placements share one call.
    """
    s = _sched_cache(key + (batch > 0,))
    return s, _build_call_static(s.static, channels, interpret, batch)


@functools.lru_cache(maxsize=512)
def _build_call_static(s: _SchedStatic, channels: int, interpret: bool,
                       batch: int = 0):
    """Build the pallas_call for one static schedule geometry (cached)."""
    batched = batch > 0

    # col blocks span the full fused step: n_sub subtiles of tw columns
    step_w = s.n_sub * s.tw
    if batched:
        grid = (batch, s.grid_r, s.grid_c)
        row_map = lambda b, i, j, ints: (i, 0)             # noqa: E731
        col_map = lambda b, i, j, ints: (0, j)             # noqa: E731
        out_spec = pl.BlockSpec((1, channels, s.th, step_w),
                                lambda b, i, j, ints: (b, 0, i, j))
        out_shape = jax.ShapeDtypeStruct(
            (batch, channels, s.rows_pad, s.cols_pad), jnp.uint8)
        # all-sequential grid: the double-buffered DMA pipeline relies on
        # step order
        semantics = ("arbitrary", "arbitrary", "arbitrary")
    else:
        grid = (s.grid_r, s.grid_c)
        row_map = lambda i, j, ints: (i, 0)                # noqa: E731
        col_map = lambda i, j, ints: (0, j)                # noqa: E731
        out_spec = pl.BlockSpec((channels, s.th, step_w),
                                lambda i, j, ints: (0, i, j))
        out_shape = jax.ShapeDtypeStruct(
            (channels, s.rows_pad, s.cols_pad), jnp.uint8)
        semantics = ("arbitrary", "arbitrary")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # src
            pl.BlockSpec((s.th, 1), row_map),              # row_i0
            pl.BlockSpec((s.th, s.k_rows), row_map),       # row_w
            pl.BlockSpec((1, step_w), col_map),            # col_i0
            pl.BlockSpec((s.k_cols, step_w), col_map),     # col_w
        ],
        out_specs=out_spec,
        scratch_shapes=[
            # multi-buffered all-channel bands (issue distance hides DMA
            # latency beyond one step's compute)
            pltpu.VMEM((_DMA_SLOTS, channels, s.bh, s.bw), jnp.uint8),
            pltpu.SemaphoreType.DMA((_DMA_SLOTS,)),
        ],
    )
    nb = max(1, batch)
    call = pl.pallas_call(
        _make_kernel(s, batched, channels, batch, exact_f32=interpret),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * channels * (s.rows_pad * s.bh * s.cols_pad
                                       + s.rows_pad * s.bw * s.cols_pad),
            bytes_accessed=nb * channels * (s.m_h * s.m_w
                                            + s.rows_pad * s.cols_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )
    return call


def resize_place_one(src_chw: jnp.ndarray, placement: Placement,
                     filter_kind: str = "bilinear",
                     interpret: bool = False) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
    """Resample one oriented CHW uint8 source to its dest rect.

    Returns (padded uint8 region (C, rows_pad, cols_pad), (r0, c0) offsets and
    valid (n_rows, n_cols) sizes packed as the second tuple is (r0, c0, ...)).
    Caller slices the valid region and places it into the canvas.
    """
    channels = src_chw.shape[0]
    s, call = _build_call((placement, filter_kind), channels, interpret)
    region = call(jnp.asarray(s.ints),
                  src_chw,
                  jnp.asarray(s.row_i0), jnp.asarray(s.row_w),
                  jnp.asarray(s.col_i0), jnp.asarray(s.col_w))
    return region, (s.r0, s.c0, s.n_rows, s.n_cols)


def resize_place_batch(src_bchw: jnp.ndarray, placement: Placement,
                       filter_kind: str = "bilinear",
                       interpret: bool = False) -> Tuple[jnp.ndarray, Tuple[int, int, int, int]]:
    """Batched twin of :func:`resize_place_one` over stacked (B, C, mh, mw)
    sources: one fused kernel with a leading batch grid dimension."""
    batch, channels = src_bchw.shape[0], src_bchw.shape[1]
    s, call = _build_call((placement, filter_kind), channels, interpret,
                          batch=batch)
    region = call(jnp.asarray(s.ints),
                  src_bchw,
                  jnp.asarray(s.row_i0), jnp.asarray(s.row_w),
                  jnp.asarray(s.col_i0), jnp.asarray(s.col_w))
    return region, (s.r0, s.c0, s.n_rows, s.n_cols)


@functools.lru_cache(maxsize=512)
def _jitted_call_static(s: _SchedStatic, channels: int, interpret: bool,
                        batch: int = 0):
    return jax.jit(_build_call_static(s, channels, interpret, batch))


class _WindowPlan:
    """Chunked row-window schedule for one placement (banded executor).

    The fused kernel under a memory budget (VERDICT r1 #5): the placement's
    dest rows are processed in fixed ``th``-row chunks, each resampled from a
    host-cropped source row window.  Because taps, band starts and the crop
    are all runtime arguments, ONE compiled call (keyed on the static
    geometry) serves every chunk — and the output canvas never exists on
    device at all: each chunk's region streams straight back to the host
    canvas.  Peak device bytes ~= crop + region, independent of canvas size.
    """

    def __init__(self, p: Placement, filter_kind: str, channels: int = 3,
                 chunk_rows: int = _TILE_ROWS,
                 windows: Optional[Sequence[Tuple[int, int]]] = None):
        self.p = p
        self.channels = channels
        disp_w, disp_h = geometry.display_size(p.raw_w, p.raw_h,
                                               p.orientation)
        self.disp_h, self.disp_w = disp_h, disp_w
        r0, r1 = p.row_span
        c0, c1 = p.col_span
        self.r0, self.c0 = r0, c0
        self.n_rows, self.n_cols = r1 - r0, c1 - c0
        if self.n_rows <= 0 or self.n_cols <= 0:
            raise Infeasible("empty dest rect")
        ri0, rw = geometry.filter_taps(r0, r1, p.y0, p.h, disp_h, filter_kind)
        ci0, cw = geometry.filter_taps(c0, c1, p.x0, p.w, disp_w, filter_kind)
        k_rows, k_cols = rw.shape[1], cw.shape[1]
        if max(k_rows, k_cols) > _MAX_TAPS:
            raise Infeasible(f"filter window K={max(k_rows, k_cols)} exceeds "
                             f"{_MAX_TAPS} taps")
        self.ri0 = ri0
        self.rw = rw.astype(np.float32)

        # ``windows``: explicit placement-relative [a0, a1) dest-row windows
        # (may be empty) replacing the default r0-aligned equal chunking —
        # the space-sharded compose uses canvas-band-aligned windows so one
        # compiled schedule serves every (shard, chunk) pair.  Each window
        # must fit the chunk height; empty windows are legal (SPMD shards
        # whose band misses this placement).  A CALLABLE ``windows`` is a
        # builder ``th -> window list``, which lets the VMEM shrink
        # fallback below regenerate windows at each halved chunk height
        # (a static list cannot shrink; it raises Infeasible instead).
        self._windows_builder = windows if callable(windows) else None
        if windows is None:
            th = min(_round_up(max(8, chunk_rows), 8),
                     _round_up(self.n_rows, 8))
            self._explicit_windows = None
            windows = [(a, min(self.n_rows, a + th))
                       for a in range(0, self.n_rows, th)]
        else:
            th = _round_up(max(8, chunk_rows), 8)
            if callable(windows):
                windows = windows(th)
            windows = [(int(a), int(b)) for a, b in windows]
            longest = max((b - a for a, b in windows), default=1)
            if longest > th:
                raise ValueError(
                    f"window of {longest} rows exceeds chunk height {th}")
            self._explicit_windows = windows
        self.windows = windows
        self.chunk = th
        # worst-case source window any chunk needs (data-driven)
        need = k_rows
        for g0, g1 in windows:
            if g1 > g0:
                need = max(need,
                           int(ri0[g1 - 1]) + k_rows - int(ri0[g0]))
        self.crop_rows = min(disp_h, need)
        crop_pad = _round_up(self.crop_rows, 8)
        m_w_pad = _round_up(disp_w, 128)

        bh = crop_pad
        best = None
        for tw in sorted({min(t, _round_up(self.n_cols, 128))
                          for t in (128, 256, 512)}):
            bw = _Schedule._band_size(ci0, k_cols, tw, m_w_pad, 128)
            if _vmem_bytes(th, tw, bh, bw) > _MAX_BAND_BYTES:
                continue
            for cf in (False, True):
                total = (_cdiv(self.n_cols, tw)
                         * _model_step_time(th, tw, bh, bw, col_first=cf))
                if best is None or total < best[0]:
                    best = (total, tw, bw, cf)
        if best is None:
            if th > 8 and (self._explicit_windows is None
                           or self._windows_builder is not None):
                # shrink the chunk: a shorter crop frees VMEM (window
                # builders regenerate their list at the new height)
                self.__init__(p, filter_kind, channels, max(8, th // 2),
                              windows=self._windows_builder)
                return
            raise Infeasible(
                "crop window too large for VMEM even at 8-row chunks "
                "(extreme downscale; use the XLA engine)")
        _, tw, bw, col_first = best
        grid_c = _cdiv(self.n_cols, tw)
        cols_pad = grid_c * tw
        self.static = _SchedStatic(
            self.crop_rows, disp_w, crop_pad, m_w_pad, th, tw, bh, bw,
            1, grid_c, k_rows, k_cols, th, cols_pad, col_first, 1)
        self.col_i0 = _pad_to(ci0, cols_pad).reshape(1, -1)
        self.col_w = np.ascontiguousarray(
            _pad_to(cw.astype(np.float32), cols_pad).T)
        col_starts = _Schedule._band_starts(ci0, k_cols, grid_c, tw, bw,
                                            disp_w, m_w_pad, 128)
        self.ints = np.concatenate([np.zeros((1,), np.int32), col_starts])

    @property
    def n_chunks(self) -> int:
        return len(self.windows)

    def chunk_window(self, g: int) -> Tuple[int, int, int]:
        """(dest_row_offset_in_span, valid_rows, src_crop_start) of chunk g.
        Empty windows report 0 valid rows and a 0 crop start."""
        a, b = self.windows[g]
        valid = b - a
        if valid <= 0:
            return a, 0, 0
        win0 = int(self.ri0[a])
        s_lo = max(0, min(win0, self.disp_h - self.crop_rows))
        return a, valid, s_lo

    def chunk_taps(self, g: int) -> Tuple[np.ndarray, np.ndarray]:
        """Rebased (row_i0 (th,1), row_w (th,K)) for chunk g."""
        a, valid, s_lo = self.chunk_window(g)
        i0 = _pad_to(self.ri0[a: a + valid] - s_lo, self.chunk)
        w = _pad_to(self.rw[a: a + valid], self.chunk)
        return i0.reshape(-1, 1), w

    def stage_crop(self, oriented_hwc: np.ndarray, g: int) -> np.ndarray:
        """Host-crop chunk g's source rows -> padded planar CHW uint8."""
        _, _, s_lo = self.chunk_window(g)
        crop = oriented_hwc[s_lo: s_lo + self.crop_rows]
        s = self.static
        out = np.zeros((self.channels, s.m_h_pad, s.m_w_pad), np.uint8)
        out[:, : crop.shape[0], : crop.shape[1]] = \
            np.transpose(crop, (2, 0, 1))
        return out

    def run_chunk(self, crop_chw, g: int,
                  interpret: bool = False) -> jnp.ndarray:
        """Device resample of chunk g -> (C, th, cols_pad) uint8 region."""
        call = _jitted_call_static(self.static, self.channels, interpret)
        i0, w = self.chunk_taps(g)
        return call(jnp.asarray(self.ints), crop_chw,
                    jnp.asarray(i0), jnp.asarray(w),
                    jnp.asarray(self.col_i0), jnp.asarray(self.col_w))


# ---------------------------------------------------------------------------
# Whole-job engine
# ---------------------------------------------------------------------------

def _orient_chw(img_hwc: jnp.ndarray, orientation: int,
                h_pad: int, w_pad: int) -> jnp.ndarray:
    """HWC uint8 -> oriented planar CHW uint8, zero-padded to tile multiples
    (one fused XLA transpose/flip/pad pass)."""
    from .xla_compose import orient_jnp
    oriented = orient_jnp(img_hwc, orientation)
    chw = jnp.transpose(oriented, (2, 0, 1))
    return jnp.pad(chw, ((0, 0), (0, h_pad - chw.shape[1]),
                         (0, w_pad - chw.shape[2])))


def _stitch_jit(plan: LayoutPlan, channels: int, interpret: bool,
                images: Sequence[jnp.ndarray],
                staged: bool = False) -> jnp.ndarray:
    """Full-job stitch; the canvas lives in HWC (the output format) so that
    pure-copy placements are single blits with no layout shuffles.

    ``staged=True`` means images arrive in the serving pipeline's staging
    format (see :func:`stage_host`): oriented HWC for copy placements,
    oriented tile-padded planar CHW for kernel placements — the device never
    pays an orientation/transpose/pad pass.
    """
    from .assemble import assemble_canvas

    regions = {}
    for idx, (raw, p) in enumerate(zip(images, plan.placements)):
        r1, c1 = p.row_span[1], p.col_span[1]
        if r1 <= p.row_span[0] or c1 <= p.col_span[0]:
            continue
        copy_off = placement_is_copy(p, plan.filter)
        if copy_off is not None:
            # identity taps both axes: the resample IS a slice of the
            # oriented HWC source — no kernel
            from .xla_compose import orient_jnp
            src = raw if staged else orient_jnp(raw, p.orientation)
            sr, sc = copy_off
            nr = r1 - p.row_span[0]
            nc = c1 - p.col_span[0]
            # static slice: XLA elides it entirely when it's the whole source
            regions[idx] = src[sr: sr + nr, sc: sc + nc, :]
            continue
        sched = _Schedule(p, plan.filter)
        if staged:
            src = raw
        else:
            src = _orient_chw(raw, p.orientation, sched.m_h_pad,
                              sched.m_w_pad)
        region, (r0, c0, nr, nc) = resize_place_one(
            src, p, plan.filter, interpret)
        regions[idx] = jnp.transpose(region[:, :nr, :nc], (1, 2, 0))
    # one concatenation tree: every canvas byte written exactly once
    return assemble_canvas(plan, channels, regions)


def stage_host(img_hwc: np.ndarray, placement: Placement,
               filter_kind: str = "bilinear") -> np.ndarray:
    """Host-side staging: raw HWC uint8 -> the layout the device program
    wants for this placement.

    * copy placements (identity taps)  -> oriented HWC, unpadded;
    * kernel placements                -> oriented planar CHW, tile-padded.

    The prepare pool runs this right after decode so the hot device program
    never pays the transpose/pad pass (`_stitch_jit(staged=True)`).
    """
    oriented = geometry.orient_array(np.asarray(img_hwc),
                                     placement.orientation)
    if placement_is_copy(placement, filter_kind) is not None:
        return np.ascontiguousarray(oriented)
    h_pad = _round_up(oriented.shape[0], 8)
    w_pad = _round_up(oriented.shape[1], 128)
    chw = np.transpose(oriented, (2, 0, 1))
    out = np.zeros((chw.shape[0], h_pad, w_pad), np.uint8)
    out[:, : chw.shape[1], : chw.shape[2]] = chw
    return out


class CompiledPallasStitch:
    """Jit-compiled fused-kernel stitch for one layout signature."""

    def __init__(self, plan: LayoutPlan, channels: int = 3,
                 interpret: bool = False):
        from ..runtime.jaxcfg import ensure_compile_cache
        ensure_compile_cache()
        # Validate feasibility eagerly so callers can fall back before jit.
        for p in plan.placements:
            if p.row_span[1] > p.row_span[0] and p.col_span[1] > p.col_span[0]:
                _Schedule(p, plan.filter)
        self.plan = plan
        self.channels = channels
        self._jitted = jax.jit(
            functools.partial(_stitch_jit, plan, channels, interpret))

    def __call__(self, images: Sequence[np.ndarray],
                 device: bool = False) -> np.ndarray:
        """Run the job; ``device=True`` returns the canvas as a jax.Array
        without the final device->host readback (streaming export path)."""
        if len(images) != len(self.plan.placements):
            raise ValueError("image count does not match plan")
        dev = []
        for arr, p in zip(images, self.plan.placements):
            arr = np.asarray(arr)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            if arr.dtype != np.uint8:
                raise ValueError("pallas engine expects uint8 images")
            if arr.shape[:2] != (p.raw_h, p.raw_w):
                raise ValueError(
                    f"image {p.index}: got {arr.shape[1]}x{arr.shape[0]}, "
                    f"plan says {p.raw_w}x{p.raw_h}")
            dev.append(jnp.asarray(arr))
        out = self._jitted(dev)
        return out if device else np.asarray(out)


@functools.lru_cache(maxsize=64)
def _compiled_cache(plan_key, channels: int, interpret: bool):
    return CompiledPallasStitch(plan_key.plan, channels, interpret)


def get_compiled(plan: LayoutPlan, channels: int = 3,
                 interpret: bool = False) -> CompiledPallasStitch:
    from .xla_compose import _PlanKey
    return _compiled_cache(_PlanKey(plan), channels, interpret)


def stitch(plan: LayoutPlan, images: Sequence[np.ndarray],
           interpret: bool = False, device: bool = False) -> np.ndarray:
    """Fused-kernel stitch (raises Infeasible/NotImplementedError -> use XLA)."""
    channels = 3
    if images:
        a0 = np.asarray(images[0])
        channels = a0.shape[2] if a0.ndim == 3 else 1
    return get_compiled(plan, channels, interpret)(images, device=device)
