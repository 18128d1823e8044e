"""Device throughput of the banded (_WindowPlan) kernel vs resident.

The banded executor streams host-cropped chunks through the same fused
kernel; this measures the chunk program's device time with the slope trick
(data-dependent scan over the crop) on a resize-heavy config-4-class
placement, for the 'banded within 2x of resident' check.
"""

import functools
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from imagestitching_tpu.config import StitchOptions
    from imagestitching_tpu.core.layout import ImageSpec, solve
    from imagestitching_tpu.ops import pallas_resize as pr
    from imagestitching_tpu.runtime.jaxcfg import ensure_compile_cache

    ensure_compile_cache()
    rng = np.random.default_rng(0)
    # resize-heavy: mixed 12MP-class sources, min width 2400
    sizes = [(4000, 3000), (3600, 2700), (3200, 2400)]
    specs = [ImageSpec(w, h) for w, h in sizes]
    plan = solve(specs, StitchOptions(mode="min", supersample=False,
                                      max_images=None))
    p0 = plan.placements[0]          # 4000x3000 -> 2400x1800 (scale 0.6)
    wp = pr._WindowPlan(p0, plan.filter, 3, chunk_rows=256)
    log(f"placement: {p0.raw_w}x{p0.raw_h} -> {wp.n_cols}x{wp.n_rows}, "
        f"chunk {wp.chunk} rows, crop {wp.crop_rows} src rows, "
        f"{wp.n_chunks} chunks, tiles tw={wp.static.tw} "
        f"col_first={wp.static.col_first}")

    img = rng.integers(0, 256, (p0.raw_h, p0.raw_w, 3), np.uint8)
    crop = jax.device_put(wp.stage_crop(img, 1))
    jax.block_until_ready(crop)
    i0, w = wp.chunk_taps(1)
    call = pr._build_call_static(wp.static, 3, False)

    args = (jnp.asarray(wp.ints), jnp.asarray(i0), jnp.asarray(w),
            jnp.asarray(wp.col_i0), jnp.asarray(wp.col_w))

    @functools.partial(jax.jit, static_argnums=0)
    def chain(k, crop_, ints, ri0, rw, ci0, cw):
        def step(carry, _):
            bumped = crop_.at[0, 0, 0].add(carry)
            out = call(ints, bumped, ri0, rw, ci0, cw)
            return out.reshape(-1)[0], None
        c, _ = jax.lax.scan(step, jnp.uint8(0), None, length=k)
        return c

    int(chain(2, crop, *args))
    int(chain(1002, crop, *args))
    s = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(chain(2, crop, *args))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(chain(1002, crop, *args))
        t_hi = time.perf_counter() - t0
        s.append((t_hi - t_lo) / 1000 * 1000)
    p50 = statistics.median(s)
    mp = wp.chunk * wp.n_cols / 1e6
    log(f"banded chunk: {p50:.3f} ms for {mp:.2f} MP "
        f"({mp / (p50 / 1000):.0f} MP/s)  samples={[round(x,3) for x in s]}")


if __name__ == "__main__":
    main()


def resident_same_placement():
    import jax
    import jax.numpy as jnp
    from imagestitching_tpu.config import StitchOptions
    from imagestitching_tpu.core.layout import ImageSpec, solve
    from imagestitching_tpu.ops import pallas_resize as pr
    from imagestitching_tpu.runtime.jaxcfg import ensure_compile_cache

    ensure_compile_cache()
    rng = np.random.default_rng(0)
    sizes = [(4000, 3000), (3600, 2700), (3200, 2400)]
    specs = [ImageSpec(w, h) for w, h in sizes]
    plan = solve(specs, StitchOptions(mode="min", supersample=False,
                                      max_images=None))
    p0 = plan.placements[0]
    s = pr._sched_cache((p0, plan.filter))
    log(f"resident sched: tiles th={s.th} tw={s.tw} bh={s.bh} bw={s.bw} "
        f"grid=({s.grid_r},{s.grid_c}) col_first={s.col_first}")
    img = rng.integers(0, 256, (p0.raw_h, p0.raw_w, 3), np.uint8)
    src = jax.device_put(pr.stage_host(img, p0))
    jax.block_until_ready(src)

    def one(x):
        r, _ = pr.resize_place_one(x, p0, plan.filter, False)
        return r

    import functools
    @functools.partial(jax.jit, static_argnums=0)
    def chain(k, x):
        def step(carry, _):
            out = one(x.at[0, 0, 0].add(carry))
            return out.reshape(-1)[0], None
        c, _ = jax.lax.scan(step, jnp.uint8(0), None, length=k)
        return c

    import statistics, time
    int(chain(2, src)); int(chain(42, src))
    ss = []
    for _ in range(3):
        t0 = time.perf_counter(); int(chain(2, src)); tl = time.perf_counter()-t0
        t0 = time.perf_counter(); int(chain(42, src)); th_ = time.perf_counter()-t0
        ss.append((th_ - tl) / 40 * 1000)
    p50 = statistics.median(ss)
    mp = s.n_rows * s.n_cols / 1e6
    log(f"resident placement: {p50:.3f} ms for {mp:.1f} MP "
        f"({mp/(p50/1000):.0f} MP/s) samples={[round(x,3) for x in ss]}")


if __name__ == "__main__":
    resident_same_placement()
