"""Config-5 column-subtile fusion experiment (VERDICT r3 #3).

At the round-3 calibration, ~42% of config 5's 61.3 ms batch is per-grid-
step dispatch overhead (162 steps/job x 64 jobs x 2.5 us).  ``n_sub``
fuses several column subtiles into one grid step — one dispatch overhead,
per-subtile band DMAs, identical WORK (unlike a wider tw, which grows the
band ~ tw/scale and was already on the model's frontier).

Measures the FULL batched program at B=64 with forced n_sub in {1, 2, 4}
plus the model's free pick — config-level aggregates, immune to the
single-slot tunnel variance documented in CLAUDE.md.

Usage: python benchmarks/profile_nsub.py [B]  (repo root; real TPU)
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


def main(B: int = 64) -> None:
    import jax
    import jax.numpy as jnp

    from imagestitching_tpu.config import StitchOptions
    from imagestitching_tpu.core import oracle
    from imagestitching_tpu.core.layout import ImageSpec, solve
    from imagestitching_tpu.ops import pallas_resize as pr
    from imagestitching_tpu.parallel import batch as pbatch
    from imagestitching_tpu.runtime.jaxcfg import ensure_compile_cache

    ensure_compile_cache()
    rng = np.random.default_rng(0)
    shapes5 = [(1920, 1080)] * 5 + [(1280, 720), (1600, 900), (1920, 1200),
                                    (1024, 768)]
    specs5 = [ImageSpec(w, h) for w, h in shapes5]
    plan5 = solve(specs5, StitchOptions(mode="min", gap=4, supersample=False,
                                        max_images=None))
    stacks = [jax.device_put(rng.integers(0, 256, (B, h, w, 3), np.uint8))
              for w, h in shapes5]
    jax.block_until_ready(stacks)
    host3 = [np.asarray(s[3]) for s in stacks]
    want = oracle.stitch(plan5, host3)

    variants = [("model pick", None), ("n_sub=1", (1,)), ("n_sub=2", (2,)),
                ("n_sub=4", (4,))]
    results = []
    base_cands = pr._N_SUB_BATCHED
    for name, cands in variants:
        pr._N_SUB_BATCHED = base_cands if cands is None else cands
        pr._sched_cache.cache_clear()
        steps = 0
        picks = []
        for p in plan5.placements:
            s = pr._Schedule(p, plan5.filter, batched=True)
            steps += s.grid_r * s.grid_c
            picks.append(f"{s.th}x{s.tw}x{s.n_sub}")
        log(f"{name}: steps/job={steps} picks(th x tw x n_sub)={picks}")
        fn5 = jax.jit(functools.partial(pbatch._batched_pallas, plan5, 3,
                                        False))
        bump = jax.jit(lambda ss, c: [s.at[0, 0, 0, 0].add(c) for s in ss])
        pick = jax.jit(lambda o: o[0, 0, 0, 0])
        try:
            out = fn5(stacks)
            out.block_until_ready()
            diff = int(np.abs(np.asarray(out[3]).astype(np.int16)
                              - want.astype(np.int16)).max())
        except Exception as e:  # noqa: BLE001 — a failed variant is a result
            log(f"{name}: FAILED {e!r}")
            results.append((name, steps, None, None))
            continue

        # Deliberately the SAME instrument as run_all.py's config-5 chain5
        # (python-loop chain, data-dependent through the carried bump `c`,
        # dispatches pipeline async) — NOT bench._slope_time's scan-over-xs.
        # Variants are only compared against each other and against
        # run_all's config-5 row, so the instruments must match.
        def chain(k):
            c = jnp.uint8(0)
            t0 = time.perf_counter()
            for _ in range(k):
                c = pick(fn5(bump(stacks, c)))
            int(c)
            return time.perf_counter() - t0

        chain(1)
        samples = [(chain(5) - chain(1)) / 4 * 1000 for _ in range(3)]
        p50 = statistics.median(samples)
        log(f"{name}: {p50:.1f} ms/batch ({p50 / B * 1000:.0f} us/job) "
            f"parity={diff} samples={[round(x, 1) for x in samples]}")
        results.append((name, steps, p50, diff))

    pr._N_SUB_BATCHED = base_cands
    log("\nsummary:")
    for name, steps, p50, diff in results:
        log(f"  {name:12s} steps/job={steps:4d}  "
            f"{'FAIL' if p50 is None else f'{p50:6.1f} ms'}  parity={diff}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
