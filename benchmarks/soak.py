"""Randomized parity soak: hundreds of random jobs through every public
entry point, each checked against the float64 oracle.

Usage:  python benchmarks/soak.py [N] [SEED_BASE]   (default 200 cases, base 10000)

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


if __name__ == "__main__":
    sys.exit(1 if run(int(sys.argv[1]) if len(sys.argv) > 1 else 200,
                      int(sys.argv[2]) if len(sys.argv) > 2 else 10_000)
             else 0)
