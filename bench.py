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
        fn = jax.jit(functools.partial(
            pallas_resize._stitch_jit, plan, 3, False))
    else:
        from imagestitching_tpu.ops import xla_compose
        params = [xla_compose.placement_params(p, plan.filter)
                  for p in plan.placements]
        fn = jax.jit(functools.partial(
            xla_compose._stitch_impl, plan, 3, params=params))

    t0 = time.perf_counter()
    dev_imgs = [jax.device_put(x) for x in imgs]
    jax.block_until_ready(dev_imgs)
    log(f"H2D {sum(x.nbytes for x in imgs) / 1e6:.0f} MB: "
        f"{time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    out = fn(dev_imgs)
    out.block_until_ready()
    log(f"first call (compile+run): {time.perf_counter() - t0:.1f}s")

    # In this sandbox block_until_ready returns at enqueue, not completion
    # (remote-relay PJRT), so naive per-call timing lies.  Chain K stitch
    # calls with a device-side data dependency (iteration k's input depends
    # on iteration k-1's output) and fetch ONE scalar at the end — the device
    # must execute all K jobs serially.  Per-job time = slope between two
    # chain lengths (dispatch/fetch overheads cancel).
    import jax.numpy as jnp

    bump = jax.jit(lambda img, c: img.at[0, 0, 0].add(c))
    pick = jax.jit(lambda o: o[0, 0, 0])

    def chain(k: int) -> float:
        carry = jnp.uint8(0)
        t0 = time.perf_counter()
        for _ in range(k):
            bumped = [bump(dev_imgs[0], carry)] + list(dev_imgs[1:])
            carry = pick(fn(bumped))
        int(carry)                       # one real device->host sync
        return time.perf_counter() - t0

    chain(1)                             # compile bump/pick, warm
    k_lo, k_hi = 2, 12
    samples = []
    for _ in range(3):
        t_lo = chain(k_lo)
        t_hi = chain(k_hi)
        samples.append((t_hi - t_lo) / (k_hi - k_lo) * 1000.0)
    p50 = statistics.median(samples)
    log(f"per-job device time (slope): {p50:.2f} ms  "
        f"samples={['%.2f' % s for s in samples]}")
    log(f"({out_mp / (p50 / 1000):.0f} MP/s output, "
        f"{n_images * w * h / 1e6 / (p50 / 1000):.0f} MP/s input)")

    # parity spot check against the float64 oracle — fetch only three
    # 256-row bands (the sandbox's D2H relay is ~11 MB/s; the full canvas
    # would take minutes)
    from imagestitching_tpu.core import oracle
    want = oracle.stitch(plan, imgs)
    slice_fn = jax.jit(lambda o, r: jax.lax.dynamic_slice(
        o, (r, 0, 0), (256, plan.canvas_w, 3)))
    diff = 0
    for r in (0, plan.canvas_h // 2 - 128, plan.canvas_h - 256):
        got_band = np.asarray(slice_fn(out, r))
        want_band = want[r: r + 256]
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
