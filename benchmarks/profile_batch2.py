"""Isolate the batched-kernel slowdown: one placement (slot 0), no assemble.

Variants:
  G1 batched-grid : ONE pallas_call, grid (B, C, gr, gc)   [current]
  G2 call-per-job : B pallas_calls (3D grid) in one jit
  G3 vmapped      : jax.vmap over the single-job call
Each timed with a data-dependent scan chain (input depends on carry, so
nothing hoists).
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


def main(B=32):
    import jax
    import jax.numpy as jnp
    from imagestitching_tpu.config import StitchOptions
    from imagestitching_tpu.core.layout import ImageSpec, solve
    from imagestitching_tpu.ops import pallas_resize as pr
    from imagestitching_tpu.runtime.jaxcfg import ensure_compile_cache

    ensure_compile_cache()
    rng = np.random.default_rng(0)
    shapes5 = [(1920, 1080)] * 5 + [(1280, 720), (1600, 900), (1920, 1200),
                                    (1024, 768)]
    specs5 = [ImageSpec(w, h) for w, h in shapes5]
    plan5 = solve(specs5, StitchOptions(mode="min", gap=4, supersample=False,
                                        max_images=None))
    p0 = plan5.placements[0]
    s = pr._Schedule(p0, plan5.filter)
    log(f"slot0: src {p0.raw_w}x{p0.raw_h} -> dest {s.n_cols}x{s.n_rows}, "
        f"tiles th={s.th} tw={s.tw} bands bh={s.bh} bw={s.bw} "
        f"grid=({s.grid_r},{s.grid_c})")
    mp = s.n_rows * s.n_cols * B / 1e6

    src = rng.integers(0, 256, (B, 3, s.m_h_pad, s.m_w_pad), np.uint8)
    dev = jax.device_put(src)
    jax.block_until_ready(dev)

    def g1(x):
        r, _ = pr.resize_place_batch(x, p0, plan5.filter, False)
        return r

    def g2(x):
        outs = [pr.resize_place_one(x[b], p0, plan5.filter, False)[0]
                for b in range(B)]
        return jnp.stack(outs)

    def g3(x):
        f = lambda one: pr.resize_place_one(one, p0, plan5.filter, False)[0]
        return jax.vmap(f)(x)

    def slope_time(fn, x, k_lo=1, k_hi=5, rounds=3):
        jit = jax.jit(fn)
        pick = jax.jit(lambda o: o.reshape(-1)[0])
        bump = jax.jit(lambda s_, c: s_.at[0, 0, 0, 0].add(c))

        def chain(k):
            c = jnp.uint8(0)
            t0 = time.perf_counter()
            for _ in range(k):
                c = pick(jit(bump(x, c)))
            int(c)
            return time.perf_counter() - t0
        jit(x).block_until_ready()
        chain(1)
        ss = [(chain(k_hi) - chain(k_lo)) / (k_hi - k_lo) * 1000
              for _ in range(rounds)]
        return statistics.median(ss), [round(v, 1) for v in ss]

    for name, fn in (("G1 batched-grid", g1), ("G3 vmapped", g3),
                     ("G2 call-per-job", g2)):
        try:
            t0 = time.perf_counter()
            p50, ss = slope_time(fn, dev)
            log(f"{name}: {p50:.1f} ms ({mp/(p50/1000):.0f} MP/s) {ss} "
                f"[wall incl compile {time.perf_counter()-t0:.0f}s]")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
