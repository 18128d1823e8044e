"""Randomized parity soak: hundreds of random jobs through every public
entry point, each checked against the float64 oracle.

Usage:  python benchmarks/soak.py [N] [SEED_BASE]          (default 200, base 10000)
        python benchmarks/soak.py --large [N] [SEED_BASE]  (default 200, base 80000)

``--large`` probes the geometry the small soak cannot reach (VERDICT r2 #4):
sides 256-2048 biased to tile/band boundary crossings (the 128/256/512/
1024/2048 multiples where chunk, band and mesh-shard seams live), n up to
12, wide-K filters over-represented, and a slice of cases routed through
the space-sharded mesh compose.  Band seams, ladder floors and the
interpret-precision bug were all found only when geometry crossed such
boundaries.

Runs on the 8-device virtual CPU mesh (same forcing as tests/conftest.py —
the environment may auto-register a real-TPU plugin that overrides the env
var, so ``jax.config.update`` is applied after import).  Any parity failure
or unexpected crash prints the seed and counts as a failure; tiny budgets
exercising the demotion ladders are part of the space (a designed
MemoryError raise would be a failure here because every generated job fits
banded compositing).

Found in round 2: the interpret-mode kernel precision gap
(XLA:CPU bf16-grade f32 matmul, seeds 10001/10003/10008) and the empty
banded ladder on sub-8-row canvases (seeds 10064/10097).
"""

import os
import sys
import tempfile
import traceback

os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

import imagestitching_tpu as ist  # noqa: E402
from imagestitching_tpu import api  # noqa: E402
from imagestitching_tpu.config import (MemoryBudget, RuntimeConfig,  # noqa: E402
                                       StitchOptions)
from imagestitching_tpu.core import oracle  # noqa: E402
from imagestitching_tpu.core.layout import ImageSpec, solve  # noqa: E402


def run(n_cases: int, base: int = 10_000) -> int:
    fails = 0
    for seed in range(n_cases):
        rng = np.random.default_rng(base + seed)
        try:
            n = int(rng.integers(1, 7))
            equalize = rng.random() < 0.4      # bias toward blit plans
            direction = str(rng.choice(["vertical", "horizontal"]))
            common = int(rng.integers(8, 80))
            specs, imgs = [], []
            for _ in range(n):
                w = (common if (equalize and direction == "vertical")
                     else int(rng.integers(4, 80)))
                h = (common if (equalize and direction == "horizontal")
                     else int(rng.integers(4, 80)))
                o = int(rng.integers(1, 9))
                specs.append(ImageSpec(w, h, o))
                imgs.append(rng.integers(0, 256, (h, w, 3), np.uint8))
            options = StitchOptions(
                direction=direction,
                mode=str(rng.choice(["min", "max", "original"])),
                gap=float(rng.integers(0, 11)),
                filter=str(rng.choice(["bilinear", "bilinear", "triangle",
                                       "box", "lanczos3"])),
                background=tuple(int(x) for x in rng.integers(0, 256, 3)),
                supersample=bool(rng.random() < 0.1))
            plan = solve(specs, options)
            want = oracle.stitch(plan, imgs)
            cfg = RuntimeConfig(
                engine=str(rng.choice(["auto", "xla"])),
                interpret=True,
                overlap=str(rng.choice(["auto", "never", "always"])),
                budget=MemoryBudget(hbm_bytes=int(
                    rng.choice([2_000_000_000, 3_000_000, 300_000]))))
            items = [(a, s.orientation) for a, s in zip(imgs, specs)]
            mode = rng.integers(0, 3)
            if mode == 0:
                out = ist.stitch(items, options=options, config=cfg)
            elif mode == 1:
                with tempfile.TemporaryDirectory() as d:
                    p = os.path.join(d, "o.png")
                    api.stitch_to_file(items, p, options=options,
                                       config=cfg)
                    out = np.asarray(Image.open(p).convert("RGB"))
            else:
                out = api.stitch_arrays(imgs, specs, options, cfg)
            assert out.shape == want.shape, (out.shape, want.shape)
            diff = np.abs(out.astype(int) - want.astype(int)).max()
            assert diff <= 1, f"diff={diff}"
            if seed % 25 == 0:
                print(f"seed {seed}: ok (mode={mode})", flush=True)
        except Exception:
            fails += 1
            print(f"FAIL seed={base + seed}", flush=True)
            traceback.print_exc()
            if fails >= 3:
                break
    ran = seed + 1 if n_cases else 0
    print(f"done: {ran}/{n_cases} cases, {fails} failures", flush=True)
    return fails


def _boundary_biased(rng, lo: int, hi: int) -> int:
    """Half the draws land within +-2 of a tile/band boundary multiple
    (128/256/512/1024/2048) — where chunk, band and shard seams live."""
    if rng.random() < 0.5:
        b = int(rng.choice([128, 256, 512, 1024, 2048]))
        m = int(rng.integers(1, max(1, hi // b) + 1))
        v = m * b + int(rng.integers(-2, 3))
        return int(np.clip(v, lo, hi))
    return int(rng.integers(lo, hi + 1))


def run_large(n_cases: int, base: int = 80_000) -> int:
    from imagestitching_tpu.parallel import mesh as pmesh

    fails = 0
    seed = -1
    for seed in range(n_cases):
        rng = np.random.default_rng(base + seed)
        try:
            n = int(rng.integers(2, 13))
            equalize = rng.random() < 0.3
            direction = str(rng.choice(["vertical", "horizontal"]))
            common = _boundary_biased(rng, 256, 1024)
            specs, imgs = [], []
            for _ in range(n):
                w = (common if (equalize and direction == "vertical")
                     else _boundary_biased(rng, 256, 2048))
                h = (common if (equalize and direction == "horizontal")
                     else _boundary_biased(rng, 256, 2048))
                o = int(rng.integers(1, 9))
                specs.append(ImageSpec(w, h, o))
                imgs.append(rng.integers(0, 256, (h, w, 3), np.uint8))
            options = StitchOptions(
                direction=direction,
                mode=str(rng.choice(["min", "max", "original"])),
                gap=float(rng.integers(0, 33)),
                # wide-K over-represented: the banded-matmul shapes
                filter=str(rng.choice(["bilinear", "triangle", "lanczos3",
                                       "lanczos3", "box"])),
                background=tuple(int(x) for x in rng.integers(0, 256, 3)),
                supersample=False, max_images=None)
            plan = solve(specs, options)
            want = oracle.stitch(plan, imgs)
            mode = int(rng.integers(0, 4))
            if mode == 3:
                # space-sharded mesh compose (xla or fused-kernel engine)
                engine = str(rng.choice(["xla", "pallas"]))
                cfg = RuntimeConfig(engine=engine, interpret=True,
                                    mesh=pmesh.make_mesh((1, 8)))
                try:
                    out = api.stitch_arrays(imgs, specs, options, cfg)
                except NotImplementedError:
                    if engine != "pallas":
                        raise
                    # documented contract: an EXPLICIT kernel engine
                    # surfaces Infeasible at truly extreme downscales
                    # (engine="auto" would have demoted); re-run demoted
                    cfg = RuntimeConfig(engine="auto", interpret=True,
                                        mesh=pmesh.make_mesh((1, 8)))
                    out = api.stitch_arrays(imgs, specs, options, cfg)
            else:
                cfg = RuntimeConfig(
                    engine=str(rng.choice(["auto", "xla"])),
                    interpret=True,
                    overlap=str(rng.choice(["auto", "never", "always"])),
                    budget=MemoryBudget(hbm_bytes=int(
                        rng.choice([2_000_000_000, 2_000_000_000,
                                    64_000_000]))))
                items = [(a, s.orientation) for a, s in zip(imgs, specs)]
                if mode == 0:
                    out = ist.stitch(items, options=options, config=cfg)
                elif mode == 1:
                    with tempfile.TemporaryDirectory() as d:
                        p = os.path.join(d, "o.png")
                        api.stitch_to_file(items, p, options=options,
                                           config=cfg, png_compression=1)
                        out = np.asarray(Image.open(p).convert("RGB"))
                else:
                    out = api.stitch_arrays(imgs, specs, options, cfg)
            assert out.shape == want.shape, (out.shape, want.shape)
            diff = np.abs(out.astype(int) - want.astype(int)).max()
            assert diff <= 1, f"diff={diff}"
            print(f"seed {base + seed}: ok (mode={mode}, n={n}, "
                  f"canvas={plan.canvas_w}x{plan.canvas_h}, "
                  f"{options.filter})", flush=True)
        except Exception:
            fails += 1
            print(f"FAIL seed={base + seed}", flush=True)
            traceback.print_exc()
            if fails >= 3:
                break
    ran = seed + 1 if n_cases else 0
    print(f"done: {ran}/{n_cases} large cases, {fails} failures",
          flush=True)
    return fails


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "--large":
        sys.exit(1 if run_large(
            int(argv[1]) if len(argv) > 1 else 200,
            int(argv[2]) if len(argv) > 2 else 80_000) else 0)
    sys.exit(1 if run(int(argv[0]) if argv else 200,
                      int(argv[1]) if len(argv) > 1 else 10_000)
             else 0)
