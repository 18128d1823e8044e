"""Empirical check of tiler._banded_peak against the real TPU allocator.

The banded byte model was derived from code reasoning (which jit args are
simultaneously live — r4s7 f32-intermediates fix, r4s9 sum-over-images
fix); this measures the device allocator's actual high-water mark for one
_BandedExecutor band call and compares.  The model must BOUND the measured
peak (else plan_execution admits bands that OOM at runtime); the looser it
is, the more budget it wastes — both directions are reported.

Run on a real chip (the CPU backend has no allocator stats):
    python benchmarks/profile_banded_peak.py

NOTE (r4s9, measured): this sandbox's tunneled TPU returns
``memory_stats() is None`` — the axon PJRT plugin does not expose
allocator stats — so the script aborts cleanly here.  It is kept for
stats-capable hosts (direct PJRT:TPU exposes peak_bytes_in_use).
Deliberately OOM-probing the shared tunneled chip as a fallback
instrument was considered and rejected: a wedged backend would cost the
session far more than the measurement is worth.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

from imagestitching_tpu.config import StitchOptions  # noqa: E402
from imagestitching_tpu.core.layout import ImageSpec, solve  # noqa: E402
from imagestitching_tpu.core import geometry  # noqa: E402
from imagestitching_tpu.runtime import pipeline, tiler  # noqa: E402


def _stats():
    d = jax.devices()[0]
    s = d.memory_stats()
    return s


def measure(specs, band, filt="bilinear", label=""):
    plan = solve(specs, StitchOptions(supersample=False, filter=filt))
    rng = np.random.default_rng(11)
    oriented = [geometry.orient_array(
        rng.integers(0, 256, (s.height, s.width, 3), np.uint8), s.orientation)
        for s in specs]
    model = tiler._banded_peak(plan, band, 3)
    before = _stats()
    ex = pipeline._BandedExecutor(plan, band, 3)
    out = ex.run(oriented)
    after = _stats()
    # peak_bytes_in_use is a LIFETIME high-water mark: if an earlier case in
    # this process peaked higher, it never advances during this run and the
    # delta below would report the stale peak, not this case's — detect and
    # flag instead of printing garbage (r4s10 review)
    if after["peak_bytes_in_use"] <= before["peak_bytes_in_use"]:
        print(f"{label or filt}: peak did not advance past an earlier "
              f"case's high-water ({before['peak_bytes_in_use']/1e6:.2f} "
              f"MB) — run this case alone in a fresh process", flush=True)
        assert out.shape == (plan.canvas_h, plan.canvas_w, 3)
        return model, None
    # high-water delta over the run (fresh buffers only; the baseline holds
    # whatever earlier jobs left resident)
    peak = after["peak_bytes_in_use"] - before["bytes_in_use"]
    print(f"{label or filt}: canvas {plan.canvas_w}x{plan.canvas_h} band "
          f"{band} n={len(specs)}: model {model/1e6:.2f} MB, measured peak "
          f"delta {peak/1e6:.2f} MB, model/measured "
          f"{model/max(1, peak):.2f}x", flush=True)
    assert out.shape == (plan.canvas_h, plan.canvas_w, 3)
    return model, peak


def main():
    dev = jax.devices()[0]
    if dev.platform == "cpu" or not dev.memory_stats():
        print("needs a real TPU with allocator stats; aborting")
        return 1
    print(f"platform: {dev.platform} ({dev.device_kind})", flush=True)
    # multi-image: the r4s9 sum-over-images term dominates here
    measure([ImageSpec(1500, 1500)] * 6, 64, label="6x 1500^2 bilinear")
    # single image, deep downscale, wide filter: tap buffers + wide crops
    measure([ImageSpec(3000, 3000), ImageSpec(600, 600)], 128,
            filt="lanczos3", label="downscale lanczos3")
    # tall band (few, large calls)
    measure([ImageSpec(2000, 2000)] * 3, 512, label="3x 2000^2 band 512")
    return 0


if __name__ == "__main__":
    sys.exit(main())
