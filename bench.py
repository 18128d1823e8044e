"""Benchmark: p50 latency of the flagship 9-image 12 MP stitch on one chip.

BASELINE.md north star: stitch 9x 12 MP (4000x3000) photos into one strip in
<50 ms on a single v5e chip at bit-level parity (within rounding) with the
Canvas-2D reference.  ``vs_baseline`` is 50ms / p50 — >1.0 beats the target.

Measures the device program a serving system would run per job: sources
resident on device (the staging double-buffer's steady state), fused Pallas
orient+resize+place into the canvas, uint8 result materialized on device.
Host decode and the sandbox's tunnel transfers are reported to stderr but are
not the headline (they are environment artifacts; see runtime/pipeline for
the overlapped host pipeline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import functools
import json
import statistics
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _slope_time(fn_impl, dev_imgs, k_lo: int = 2, k_hi: int = 52,
                rounds: int = 5):
    """Median per-call device time via scan-chained slope timing."""
    import functools
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=0)
    def run_chain(k, imgs):
        def step(carry, _):
            # bump EVERY input: a single bumped input would let XLA hoist
            # the other placements' work out of the loop (loop-invariant
            # code motion) and the slope would undercount them
            bumped = [im.at[(0,) * im.ndim].add(carry) for im in imgs]
            out = fn_impl(bumped)
            return out.reshape(-1)[0], None
        c, _ = jax.lax.scan(step, jnp.uint8(0), None, length=k)
        return c

    int(run_chain(k_lo, dev_imgs))       # compile + warm
    int(run_chain(k_hi, dev_imgs))
    samples = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        int(run_chain(k_lo, dev_imgs))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(run_chain(k_hi, dev_imgs))
        t_hi = time.perf_counter() - t0
        samples.append((t_hi - t_lo) / (k_hi - k_lo) * 1000.0)
    return statistics.median(samples), [round(s, 2) for s in samples]


def main() -> None:
    import jax
    from imagestitching_tpu.config import StitchOptions
    from imagestitching_tpu.core.layout import ImageSpec, solve
    from imagestitching_tpu.runtime.jaxcfg import ensure_compile_cache

    ensure_compile_cache()
    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    # BASELINE config 4 geometry: 9x 12MP (4000x3000), vertical/min.
    n_images, w, h = 9, 4000, 3000
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (h, w, 3), np.uint8)
            for _ in range(n_images)]
    specs = [ImageSpec(w, h) for _ in imgs]
    plan = solve(specs, StitchOptions(direction="vertical", mode="min",
                                      supersample=False, max_images=None))
    out_mp = plan.canvas_w * plan.canvas_h / 1e6
    log(f"canvas: {plan.canvas_w}x{plan.canvas_h} = {out_mp:.1f} MP")

    if backend == "tpu":
        from imagestitching_tpu.ops import pallas_resize
        fn_impl = functools.partial(
            pallas_resize._stitch_jit, plan, 3, False, staged=True)
        staged = [pallas_resize.stage_host(x, p)
                  for x, p in zip(imgs, plan.placements)]
    else:
        from imagestitching_tpu.ops import xla_compose
        params = [xla_compose.placement_params(p, plan.filter)
                  for p in plan.placements]
        fn_impl = functools.partial(
            xla_compose._stitch_impl, plan, 3, params=params)
        staged = imgs
    fn = jax.jit(fn_impl)

    t0 = time.perf_counter()
    dev_imgs = [jax.device_put(x) for x in staged]
    jax.block_until_ready(dev_imgs)
    log(f"H2D {sum(x.nbytes for x in staged) / 1e6:.0f} MB: "
        f"{time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    out = fn(dev_imgs)
    out.block_until_ready()
    log(f"first call (compile+run): {time.perf_counter() - t0:.1f}s")

    # In this sandbox block_until_ready returns at enqueue, not completion
    # (remote-relay PJRT), so naive per-call timing lies.  Run K stitches in
    # one lax.scan with a device-side data dependency (iteration k's input
    # depends on k-1's output scalar) and fetch ONE scalar — the device must
    # execute all K jobs serially inside a single dispatch.  Per-job time =
    # slope between two chain lengths.  Images must be jit ARGUMENTS (a
    # closure would serialize 324 MB of constants into the remote compile).
    import jax.numpy as jnp

    p50, samples = _slope_time(fn_impl, dev_imgs)
    log(f"per-job device time (slope): {p50:.2f} ms  "
        f"samples={['%.2f' % s for s in samples]}")
    log(f"({out_mp / (p50 / 1000):.0f} MP/s output, "
        f"{n_images * w * h / 1e6 / (p50 / 1000):.0f} MP/s input)")

    # secondary (stderr-only): resize-heavy variant — mixed sizes force the
    # banded-matmul kernel on every image (config-3-like), no copy fast path
    if backend == "tpu":
        from imagestitching_tpu.ops import pallas_resize
        sizes = [(4000, 3000), (3600, 2700), (3200, 2400), (2800, 2100),
                 (4000, 2250), (3000, 3000), (3840, 2160), (2400, 3200),
                 (3500, 2625)]
        imgs2 = [rng.integers(0, 256, (hh, ww, 3), np.uint8)
                 for ww, hh in sizes]
        specs2 = [ImageSpec(ww, hh) for ww, hh in sizes]
        plan2 = solve(specs2, StitchOptions(direction="vertical", mode="min",
                                            supersample=False,
                                            max_images=None))
        fn2_impl = functools.partial(
            pallas_resize._stitch_jit, plan2, 3, False, staged=True)
        staged2 = [pallas_resize.stage_host(x, p)
                   for x, p in zip(imgs2, plan2.placements)]
        dev2 = [jax.device_put(x) for x in staged2]
        jax.block_until_ready(dev2)
        p50_2, s2 = _slope_time(fn2_impl, dev2, rounds=3)
        mp2 = plan2.canvas_w * plan2.canvas_h / 1e6
        log(f"resize-heavy 9-image job ({mp2:.0f} MP out): {p50_2:.2f} ms "
            f"({mp2 / (p50_2 / 1000):.0f} MP/s)  samples={s2}")

    # parity spot check against the float64 oracle — three 256-row bands
    # (band-windowed oracle: the full f64 pass on 108 MP takes ~100 s, and
    # the sandbox's D2H relay is ~11 MB/s, so neither side fetches/computes
    # the whole canvas)
    from imagestitching_tpu.core import oracle
    slice_fn = jax.jit(lambda o, r: jax.lax.dynamic_slice(
        o, (r, 0, 0), (256, plan.canvas_w, 3)))
    diff = 0
    for r in (0, plan.canvas_h // 2 - 128, plan.canvas_h - 256):
        got_band = np.asarray(slice_fn(out, r))
        want_band = oracle.stitch_rows(plan, imgs, r, r + 256)
        diff = max(diff, int(np.abs(got_band.astype(np.int16)
                                    - want_band.astype(np.int16)).max()))
    log(f"parity max|diff| vs oracle (3 sampled bands): {diff}")

    result = {
        "metric": "p50 latency, 9-image 12MP strip (device compute)",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(50.0 / p50, 3),
        "backend": backend,
        "out_megapixels": round(out_mp, 1),
        "mp_per_sec_out": round(out_mp / (p50 / 1000.0), 1),
        "parity_max_diff": diff,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
