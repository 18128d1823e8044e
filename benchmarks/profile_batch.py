"""Profile config-5 batched stitch: where do the 81 ms go?

Variants timed (slope method, data-dependent chains):
  A full    — current _batched_pallas on BHWC stacks (orient+pad on device)
  B staged  — kernel+assemble only, inputs pre-staged BCHW-padded on device
  C planar  — staged inputs AND planar CHW canvas output (no final transpose)
  D xla     — vmapped XLA gather engine on BHWC stacks (baseline)
"""

from __future__ import annotations

import functools
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(call, k_lo=1, k_hi=4, rounds=3):
    def chain(k):
        t0 = time.perf_counter()
        call(k)
        return time.perf_counter() - t0
    chain(1)
    s = [(chain(k_hi) - chain(k_lo)) / (k_hi - k_lo) * 1000
         for _ in range(rounds)]
    return statistics.median(s), [round(x, 1) for x in s]


def main(B=32):
    import jax
    import jax.numpy as jnp
    from imagestitching_tpu.config import StitchOptions
    from imagestitching_tpu.core.layout import ImageSpec, solve
    from imagestitching_tpu.ops import pallas_resize
    from imagestitching_tpu.ops.assemble import assemble_canvas
    from imagestitching_tpu.parallel import batch as pbatch
    from imagestitching_tpu.runtime.jaxcfg import ensure_compile_cache

    ensure_compile_cache()
    rng = np.random.default_rng(0)
    shapes5 = [(1920, 1080)] * 5 + [(1280, 720), (1600, 900), (1920, 1200),
                                    (1024, 768)]
    specs5 = [ImageSpec(w, h) for w, h in shapes5]
    plan5 = solve(specs5, StitchOptions(mode="min", gap=4, supersample=False,
                                        max_images=None))
    mp = plan5.canvas_w * plan5.canvas_h * B / 1e6
    log(f"canvas {plan5.canvas_w}x{plan5.canvas_h}, batch {B}, {mp:.0f} MP out")

    host = [rng.integers(0, 256, (B, h, w, 3), np.uint8) for w, h in shapes5]
    t0 = time.perf_counter()
    stacks = [jax.device_put(x) for x in host]
    jax.block_until_ready(stacks)
    log(f"H2D raw {sum(x.nbytes for x in host)/1e9:.2f} GB: "
        f"{time.perf_counter()-t0:.1f}s")

    # staged: oriented+padded BCHW on host, then H2D
    scheds = [pallas_resize._Schedule(p, plan5.filter)
              for p in plan5.placements]
    staged_host = []
    for x, s in zip(host, scheds):
        out = np.zeros((B, 3, s.m_h_pad, s.m_w_pad), np.uint8)
        out[:, :, : x.shape[1], : x.shape[2]] = np.transpose(x, (0, 3, 1, 2))
        staged_host.append(out)
    t0 = time.perf_counter()
    staged = [jax.device_put(x) for x in staged_host]
    jax.block_until_ready(staged)
    log(f"H2D staged {sum(x.nbytes for x in staged_host)/1e9:.2f} GB: "
        f"{time.perf_counter()-t0:.1f}s")

    def batched_staged(hwc_out, imgs):
        regions = {}
        for idx, (src, p) in enumerate(zip(imgs, plan5.placements)):
            region, (r0, c0, nr, nc) = pallas_resize.resize_place_batch(
                src, p, plan5.filter, False)
            if hwc_out:
                regions[idx] = jnp.transpose(region[:, :, :nr, :nc],
                                             (0, 2, 3, 1))
            else:
                regions[idx] = region[:, :, :nr, :nc, None]
        if hwc_out:
            return assemble_canvas(plan5, 3, regions, batch_shape=(B,))
        # planar: per-channel canvas (B, C, H, W, 1) via batch_shape trick
        return assemble_canvas(plan5, 1, regions, batch_shape=(B, 3))

    fnA = jax.jit(functools.partial(pbatch._batched_pallas, plan5, 3, False))
    fnB = jax.jit(functools.partial(batched_staged, True))
    fnD = jax.jit(functools.partial(pbatch._batched_xla, plan5, 3))

    bump = jax.jit(lambda s, c: s.at[0, 0, 0, 0].add(c))
    pick = jax.jit(lambda o: (o.reshape(-1))[0])

    def mk_chain(fn, ins):
        def call(k):
            c = jnp.uint8(0)
            for _ in range(k):
                c = pick(fn([bump(ins[0], c)] + list(ins[1:])))
            int(c)
        return call

    for name, fn, ins in (("A full(BHWC in, dev orient+pad)", fnA, stacks),
                          ("B staged(BCHW in)", fnB, staged),
                          ("D xla vmap(BHWC in)", fnD, stacks)):
        try:
            fn(ins).block_until_ready()
            p50, s = slope(mk_chain(fn, ins))
            log(f"{name}: {p50:.1f} ms ({mp/(p50/1000):.0f} MP/s) {s}")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")

    # C planar out needs assemble planar support; try only if available
    try:
        fnC = jax.jit(functools.partial(batched_staged, False))
        fnC(staged).block_until_ready()
        p50, s = slope(mk_chain(fnC, staged))
        log(f"C staged+planar out: {p50:.1f} ms ({mp/(p50/1000):.0f} MP/s) {s}")
    except Exception as e:
        log(f"C staged+planar out: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
