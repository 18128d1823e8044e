"""Measure all 5 BASELINE.md configs on the current backend -> BENCHMARKS.md.

Usage: python benchmarks/run_all.py  (run from the repo root; real TPU)

Timing uses bench._slope_auto (scan-chained, dispatch-independent; chaining
mode picked per job kind — see bench._slope_time) for single-job configs and
chained dispatch timing for the large batched config.
Each config is parity-checked against the float64 oracle.
"""

from __future__ import annotations

import functools
import statistics
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import _slope_auto, _slope_time
    from imagestitching_tpu.config import StitchOptions
    from imagestitching_tpu.core import oracle
    from imagestitching_tpu.core.layout import ImageSpec, solve
    from imagestitching_tpu.ops import pallas_resize
    from imagestitching_tpu.parallel import batch as pbatch
    from imagestitching_tpu.runtime.jaxcfg import ensure_compile_cache

    ensure_compile_cache()
    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    rows = []

    def single_job(name, shapes_orients, options, parity_full=True):
        specs = [ImageSpec(w, h, o) for (w, h, o) in shapes_orients]
        plan = solve(specs, options)
        imgs = [rng.integers(0, 256, (h, w, 3), np.uint8)
                for (w, h, _) in shapes_orients]
        fn_impl = functools.partial(
            pallas_resize._stitch_jit, plan, 3, False, staged=True)
        staged = [pallas_resize.stage_host(x, p)
                  for x, p in zip(imgs, plan.placements)]
        dev = [jax.device_put(x) for x in staged]
        jax.block_until_ready(dev)
        out = jax.jit(fn_impl)(dev)
        out.block_until_ready()
        p50, samples, tmode = _slope_auto(plan, fn_impl, dev,
                                          k_hi=104, rounds=3)
        if tmode == "ceiling":
            # regeneration runs on an idle host by policy — a ceiling here
            # means the run is invalid, not that the number should be kept
            raise RuntimeError(
                "slope timing fell back to the per-call ceiling "
                "(contention-inverted rounds): rerun on an idle host")
        want = oracle.stitch(plan, imgs)
        if parity_full and want.nbytes < 80_000_000:
            got = np.asarray(out)
            diff = int(np.abs(got.astype(np.int16)
                              - want.astype(np.int16)).max())
        else:
            slice_fn = jax.jit(lambda o: jax.lax.dynamic_slice(
                o, (0, 0, 0), (min(256, plan.canvas_h), plan.canvas_w, 3)))
            got = np.asarray(slice_fn(out))
            diff = int(np.abs(got.astype(np.int16)
                              - want[:got.shape[0]].astype(np.int16)).max())
        mp = plan.canvas_w * plan.canvas_h / 1e6
        if p50 < 0.01:
            # below the slope-timing noise floor (~10 us)
            p50_s, thr_s = "<0.01 ms", f">{mp / 0.01 * 1000:.0f} MP/s"
        else:
            p50_s = f"{p50:.3f} ms"
            thr_s = f"{mp / (p50 / 1000):.0f} MP/s"
        rows.append((name, f"{plan.canvas_w}x{plan.canvas_h}",
                     p50_s, thr_s, diff, samples))
        log(f"{name}: {p50_s} ({thr_s}) parity={diff} samples={samples}")

    # ---- config 1: 2-image vertical concat, 512x512 PNG-class
    single_job("1: 2x 512x512 vertical/min",
               [(512, 512, 1), (512, 512, 1)],
               StitchOptions(mode="min", supersample=False))

    # ---- config 2: 9-image vertical strip at 1080p
    single_job("2: 9x 1920x1080 vertical/min",
               [(1920, 1080, 1)] * 9,
               StitchOptions(mode="min", supersample=False, max_images=None))

    # ---- config 3: 9-image horizontal, mixed aspect + EXIF rotations
    shapes3 = [(1920, 1080, 1), (1080, 1920, 6), (1440, 1080, 3),
               (1280, 960, 8), (2000, 1500, 1), (1080, 1080, 5),
               (1600, 1200, 2), (1200, 1600, 7), (1920, 1440, 4)]
    single_job("3: 9 mixed+EXIF horizontal/min", shapes3,
               StitchOptions(direction="horizontal", mode="min", gap=4,
                             supersample=False, max_images=None),
               parity_full=False)

    # ---- config 4: 9x 12MP under 2GB HBM budget
    single_job("4: 9x 4000x3000 vertical/min",
               [(4000, 3000, 1)] * 9,
               StitchOptions(mode="min", supersample=False, max_images=None),
               parity_full=False)

    # ---- config 5: 64 concurrent 9-image jobs, one fused batched program
    B = 64
    shapes5 = [(1920, 1080)] * 5 + [(1280, 720), (1600, 900), (1920, 1200),
                                    (1024, 768)]
    specs5 = [ImageSpec(w, h) for w, h in shapes5]
    plan5 = solve(specs5, StitchOptions(mode="min", gap=4, supersample=False,
                                        max_images=None))
    stacks = [jax.device_put(rng.integers(0, 256, (B, h, w, 3), np.uint8))
              for w, h in shapes5]
    jax.block_until_ready(stacks)
    fn5 = jax.jit(functools.partial(pbatch._batched_pallas, plan5, 3, False))
    # bump EVERY slot so no placement's work is loop-invariant (hoistable)
    bump = jax.jit(lambda ss, c: [s.at[0, 0, 0, 0].add(c) for s in ss])
    pick = jax.jit(lambda o: o[0, 0, 0, 0])
    out5 = fn5(stacks)
    out5.block_until_ready()

    def chain5(k):
        c = jnp.uint8(0)
        t0 = time.perf_counter()
        for _ in range(k):
            c = pick(fn5(bump(stacks, c)))
        int(c)
        return time.perf_counter() - t0

    chain5(1)
    s5 = [
        (chain5(5) - chain5(1)) / 4 * 1000 for _ in range(3)
    ]
    p50_5 = statistics.median(s5)
    host = [np.asarray(s[3]) for s in stacks]
    want5 = oracle.stitch(plan5, host)
    diff5 = int(np.abs(np.asarray(out5[3]).astype(np.int16)
                       - want5.astype(np.int16)).max())
    mp5 = plan5.canvas_w * plan5.canvas_h * B / 1e6

    # MFU vs the measured 138.7 TF/s split-bf16 peak (VERDICT r3 weak #2):
    # model flops per batch from the schedules actually picked this run
    # (copies/empty spans run no kernel)
    from imagestitching_tpu.core import geometry as _geom
    flops5 = 0
    picks5 = []
    for p in plan5.placements:
        if (p.row_span[1] <= p.row_span[0] or p.col_span[1] <= p.col_span[0]
                or _geom.placement_copy_offsets(p, plan5.filter) is not None):
            continue
        s = pallas_resize._Schedule(p, plan5.filter, batched=True)
        f = pallas_resize._model_flops(s.th, s.tw, s.bh, s.bw,
                                       col_first=s.col_first)
        flops5 += f * s.n_sub * s.grid_r * s.grid_c
        picks5.append(f"{s.th}x{s.tw}x{s.n_sub}")
    flops5 *= B
    tf_s5 = flops5 / (p50_5 / 1000) / 1e12
    mfu5 = tf_s5 / 138.7
    log(f"5: model {flops5 / 1e12:.2f} TF/batch -> {tf_s5:.1f} TF/s "
        f"sustained = {mfu5:.1%} MFU (picks {picks5})")

    rows.append(("5: 64x 9-image batch",
                 f"{B}x {plan5.canvas_w}x{plan5.canvas_h}",
                 f"{p50_5:.1f} ms ({p50_5 / B * 1000:.0f} us/job)",
                 f"{mp5 / (p50_5 / 1000):.0f} MP/s, "
                 f"{B / (p50_5 / 1000):.0f} jobs/s",
                 diff5, [round(x, 1) for x in s5]))
    log(f"5: {p50_5:.1f} ms/batch ({B/(p50_5/1000):.0f} jobs/s) "
        f"parity={diff5}")

    # ---- end-to-end row (disk JPEGs -> ... -> PNG on disk, config 4)
    from bench import _bench_end_to_end
    e2e: dict = {}
    _bench_end_to_end(e2e, 9, 4000, 3000, runs=2)

    def _row(prefix: str, label: str) -> str:
        if not e2e.get(prefix + "ms"):
            return (f"| {label} | (failed: {e2e.get(prefix + 'error')}) "
                    "| | | | | |")
        ph = e2e[prefix + "phases"]
        return (f"| {label} ({e2e.get(prefix + 'strategy')}) "
                f"| {e2e[prefix + 'ms'] / 1000:.1f} s "
                f"| {ph['decode_wall_ms'] / 1000:.1f} s "
                f"| {ph['device_drain_ms'] / 1000:.1f} s "
                f"| {ph['export_wall_ms'] / 1000:.1f} s "
                f"| {ph['readback_busy_ms'] / 1000:.1f} s "
                f"| {ph['encode_busy_ms'] / 1000:.1f} s |")

    e2e_row = _row("e2e_", "config 4 (equal sizes)")
    e2e_row2 = _row("e2e_resample_", "mixed sizes (resample)")
    log(f"e2e rows:\n{e2e_row}\n{e2e_row2}")

    # single-core host-speed probe for the footer: the ONE shared
    # instrument (bench._cpu_speed_probe_mbps) so bench.py's per-variant
    # cpu_probe_mbps fields and this footer are directly comparable —
    # two differently-sized probes would carry a systematic offset that
    # reads as a host-speed change (r5 review)
    sys.path.insert(0, ".")     # run_all runs from the repo root (it
    import bench as _bench      # writes BENCHMARKS.md to cwd)
    zlib_mbps = _bench._cpu_speed_probe_mbps()
    from imagestitching_tpu.runtime.jaxcfg import host_cpu_tag
    host_tag = host_cpu_tag()
    log(f"host probe: zlib-L6 {zlib_mbps:.0f} MB/s, tag={host_tag}")

    # ---- write BENCHMARKS.md
    lines = [
        "# BENCHMARKS — measured on one TPU v5e chip",
        "",
        f"Backend: `{backend}`. Device-compute timing: scan-chained slope "
        "with a carry-dependent output probe so XLA cannot dead-code-"
        "eliminate any placement; sources staged on device as the serving "
        "pipeline holds them. Jobs are chained via distinct pre-staged "
        "input sets (scan-over-xs — matches steady-state serving) for "
        "resample-kernel configs, and via in-place input bumps for "
        "all-blit configs where xs slicing itself would ~2x the job "
        "(see bench._slope_time for the measured cross-check of both). "
        "Parity = max |diff| vs the float64 NumPy oracle "
        "(0 = bit-exact, 1 = f32-vs-f64 rounding).",
        "",
        "| BASELINE config | canvas | p50 | throughput | parity |",
        "|---|---|---|---|---|",
    ]
    for name, canvas, p50s, thr, diff, _ in rows:
        lines.append(f"| {name} | {canvas} | {p50s} | {thr} | {diff} |")
    lines += [
        "",
        "North star (BASELINE.md): 9x12MP strip in <50 ms -> config 4 "
        "beats it by the margin shown above.",
        "",
        "## Where config 5's time goes (why it is slower per-MP)",
        "",
        f"MFU this run: model {flops5 / 1e12:.2f} TF/batch at "
        f"{p50_5:.1f} ms = **{tf_s5:.1f} TF/s sustained, "
        f"{mfu5:.0%} of the 138.7 TF/s measured split-bf16 peak** "
        f"(tile picks th x tw x n_sub: {', '.join(picks5)}). The gap is "
        "per-virtual-step cost (band DMA issue + slot semaphore waits) "
        "plus VPU casts — measured NOT amortizable by fusing column "
        "subtiles into fewer dispatches (benchmarks/profile_nsub.py on "
        "chip: n_sub=1 at 162 steps/job 61.3 ms beats n_sub=4 at 81 "
        "steps/job 62.6-63.0 ms, so the fusion is disabled); the "
        "model-flops numerator is itself ~140x an ideal 2-tap gather's "
        "arithmetic, so low MFU here is the price of riding the MXU at "
        "all (the gather engine is 2.4x slower end-to-end).",
        "",
        "Config 5 is the only config whose placements all *deep-downscale* "
        "(mode=min against a 1024-wide slot: scale ~0.53). The fused kernel "
        "computes resampling as dense banded matmuls so the work rides the "
        "MXU; at scale s the band is ~tile/s wide, so effective flops/output"
        " px grow as ~1/s^2 for the first contraction. After contraction-"
        "order + tile-size optimization and channel fusion this is ~2,200 "
        "model-flops/px (vs ~16 for an ideal 2-tap gather — which would run "
        "on the VPU at ~100x lower throughput; the XLA gather engine "
        "measures ~2.4x slower than the kernel on this exact batch). "
        "Round 3 harvested the step-fusion headroom: batched (B, gr, gc) "
        "grids measure a higher effective per-step cost than single-job "
        "grids, so their tile model now carries a separate 2.5 us "
        "calibration (_STEP_OVERHEAD_BATCHED_S) — picks flip from 128x128 "
        "to 128x256 tiles (292 -> 162 steps/job, 18.7k -> 10.4k "
        "steps/batch), measured -6% (65.3 -> 61.3 ms/batch; the same picks "
        "REGRESS single-job configs, hence two constants — "
        "benchmarks/profile_stepfusion.py). int8 passes were tried and "
        "measured SLOWER (direct microbenchmark: Mosaic int8 matmul is "
        "only 1.32x bf16 on this chip — 183.6 vs 138.7 TFLOP/s on a "
        "2048^3 tile — so the 2-pass int8 scheme's ceiling cannot pay for "
        "its VPU prep); a 14 MB VMEM cap was also measured and changes "
        "nothing (same picks).",
        "",
        "## End-to-end (disk to disk)",
        "",
        "`bench.py` `_bench_end_to_end`, via "
        "`api.stitch_to_file(stream=\"auto\")`; also emitted as `e2e_*` / "
        "`e2e_resample_*` keys in its JSON line. Two variants:",
        "",
        "* **config 4 (equal sizes)** is a pure-blit plan, so the export "
        "takes the zero-device-round-trip path: decode pool -> host band "
        "assembly -> content-adaptive native PNG encode (incompressible "
        "photographic bands ship as deflate stored blocks at ~20-30x "
        "match-finder throughput, identical size). The canvas never exists "
        "on either side of the link — the reference's own hot path "
        "degenerates to drawImage blits there too (index.js:1423-1431).",
        "* **mixed sizes (resample)** forces real resampling through the "
        "fused device kernel: decode -> H2D -> composite -> banded D2H "
        "(4 concurrent streams) overlapped with the incremental encode. "
        "The export wall is ~max(readback, encode); this sandbox's "
        "~45 MB/s device->host relay makes readback dominate in ways "
        "production hosts do not (PCIe readback of this canvas is "
        "~30-100 ms). The per-phase split keeps the numbers honest:",
        "",
        "| variant (strategy) | total (p50) | decode wall | device drain "
        "| export wall (overlapped) | readback busy (relay) "
        "| PNG encode busy |",
        "|---|---|---|---|---|---|---|",
        e2e_row,
        e2e_row2,
        "",
        "## Decode (host)",
        "",
        "Native WEBP decode (codec.cpp + libwebp, round 4): a 12 MP "
        "quality-80 webp decodes in **239 ms vs 370 ms Pillow** (1.5x) on "
        "this 1-core host, bit-exact against the Pillow rung on lossless/"
        "lossy/alpha content (alpha composited on white with the shared "
        "round-half-up), and — like the JPEG/PNG paths — GIL-free, so the "
        "prepare pool's webp decodes actually overlap on multi-core hosts. "
        "Animated webp is refused by the native layer and takes the Pillow "
        "first-frame ladder, mirroring GIF.",
        "",
        f"_Generated by benchmarks/run_all.py; samples: "
        f"{[r[5] for r in rows]}_",
        "",
        # host attribution (r4s15): this VM migrates across physical hosts
        # whose single-core speed differs 2-3x (measured: PNG-encode-busy
        # 0.8 s vs 2.6 s on the SAME code, loadavg ~0 both times), so e2e
        # host walls are only comparable across regens at similar zlib MB/s.
        # Device rows are unaffected (the chip is the chip).
        f"_Host for the e2e rows: cpu_tag={host_tag}, "
        f"zlib-L6 {zlib_mbps:.0f} MB/s (single-core speed probe; compare "
        f"across regens before reading e2e deltas as regressions), "
        f"contended={e2e.get('e2e_contended')}/"
        f"{e2e.get('e2e_resample_contended')}, loadavg "
        f"{e2e.get('e2e_load_before')}->{e2e.get('e2e_resample_load_after')}_",
    ]
    with open("BENCHMARKS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    log("wrote BENCHMARKS.md")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
