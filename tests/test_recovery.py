"""Elastic recovery: OOM-driven strategy demotion (SURVEY.md §5 failure
detection) + CLI parity profiles."""

import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from imagestitching_tpu.config import MemoryBudget, RuntimeConfig, StitchOptions
from imagestitching_tpu.core import oracle
from imagestitching_tpu.core.layout import ImageSpec, solve
from imagestitching_tpu.runtime import pipeline, tiler

rng = np.random.default_rng(9)


def rand_img(w, h):
    return rng.integers(0, 256, (h, w, 3), np.uint8)


def test_strategy_ladder_orders():
    plan = solve([ImageSpec(100, 100)], StitchOptions(supersample=False))
    ex = tiler.ExecutionPlan("resident", 0, 10**9)
    ladder = pipeline._strategy_ladder(ex, plan)
    names = [s for s, _ in ladder]
    assert names[0] == "resident" and "streamed" in names
    assert names.count("banded") >= 1
    bands = [b for s, b in ladder if s == "banded"]
    assert bands == sorted(bands, reverse=True)  # shrinking bands
    ex2 = tiler.ExecutionPlan("banded", 0, 10**9, band_rows=512)
    names2 = [s for s, _ in pipeline._strategy_ladder(ex2, plan)]
    assert "resident" not in names2 and "streamed" not in names2


def test_is_oom_classification():
    import jax

    assert pipeline._is_oom(RuntimeError("RESOURCE_EXHAUSTED: foo"))
    assert pipeline._is_oom(RuntimeError("Allocator ran out of memory"))
    assert not pipeline._is_oom(ValueError("bad shape"))
    # VERDICT r2 weak #3: differently-worded runtime OOMs must still demote
    assert pipeline._is_oom(RuntimeError("allocation failure (4096 bytes)"))
    assert pipeline._is_oom(RuntimeError("Failed to allocate device buffer"))
    assert pipeline._is_oom(RuntimeError(
        "XLA:TPU compile permanent error. Ran out of memory in "
        "memory space hbm."))
    assert pipeline._is_oom(MemoryError())
    assert pipeline._is_oom(
        jax.errors.JaxRuntimeError("RESOURCE_EXHAUSTED: while running"))
    # ...but programming errors never do, whatever their wording
    assert not pipeline._is_oom(ValueError("out of memory"))
    assert not pipeline._is_oom(TypeError("allocation failure"))
    assert not pipeline._is_oom(RuntimeError("ABORTED: TPU backend error"))


def test_oom_worded_allocation_failure_demotes(monkeypatch):
    """The ladder engages for a runtime OOM with no RESOURCE_EXHAUSTED
    marker at all (VERDICT r2 #5's done-criterion)."""
    from imagestitching_tpu.ops import xla_compose
    calls = {"n": 0}

    def flaky(plan, images, **kw):
        calls["n"] += 1
        raise RuntimeError("allocation failure: 123456789 bytes")

    monkeypatch.setattr(xla_compose, "stitch", flaky)
    specs = [ImageSpec(64, 48), ImageSpec(48, 64)]
    imgs = [rand_img(64, 48), rand_img(48, 64)]
    plan = solve(specs, StitchOptions(supersample=False))
    out, m = pipeline.run(plan, imgs, RuntimeConfig(engine="xla"))
    assert calls["n"] == 1
    assert m.strategy in ("streamed", "banded")
    want = oracle.stitch(plan, imgs)
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_oom_demotes_to_streamed(monkeypatch):
    from imagestitching_tpu.ops import xla_compose
    calls = {"n": 0}
    real = xla_compose.stitch

    def flaky(plan, images, **kw):
        calls["n"] += 1
        raise RuntimeError("RESOURCE_EXHAUSTED: synthetic")

    monkeypatch.setattr(xla_compose, "stitch", flaky)
    specs = [ImageSpec(64, 48), ImageSpec(48, 64)]
    imgs = [rand_img(64, 48), rand_img(48, 64)]
    plan = solve(specs, StitchOptions(supersample=False))
    out, m = pipeline.run(plan, imgs, RuntimeConfig(engine="xla"))
    assert calls["n"] == 1                 # resident attempt failed
    assert m.strategy in ("streamed", "banded")
    want = oracle.stitch(plan, imgs)
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1
    monkeypatch.setattr(xla_compose, "stitch", real)


def test_non_oom_errors_propagate(monkeypatch):
    from imagestitching_tpu.ops import xla_compose

    def broken(plan, images, **kw):
        raise ValueError("genuine bug")

    monkeypatch.setattr(xla_compose, "stitch", broken)
    plan = solve([ImageSpec(16, 16)], StitchOptions(supersample=False))
    with pytest.raises(ValueError, match="genuine bug"):
        pipeline.run(plan, [rand_img(16, 16)], RuntimeConfig(engine="xla"))


def run_cli(*argv):
    return subprocess.run(
        [sys.executable, "-m", "imagestitching_tpu.cli", *map(str, argv)],
        capture_output=True, text=True,
        env={"PYTHONPATH": ".", "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/tmp"})


def test_cli_parity_profile_android(tmp_path):
    # big enough to trip the android 4096 side cap
    a = tmp_path / "a.png"
    Image.fromarray(rand_img(600, 300)).save(a)
    out = tmp_path / "o.png"
    r = run_cli(*([a] * 2), "-o", out, "--direction", "horizontal",
                "--parity-profile", "android", "--engine", "oracle", "--json")
    assert r.returncode == 0, r.stderr
    import json
    res = json.loads(r.stdout)
    # 2x600 wide = 1200 < 4096: no clamp, but supersample ceiling applies
    # only when --supersample is passed; without it output is logical size
    assert (res["width"], res["height"]) == (1200, 300)
    r2 = run_cli(*([a] * 8), "-o", out, "--direction", "horizontal",
                 "--parity-profile", "android", "--engine", "oracle",
                 "--json")
    res2 = json.loads(r2.stdout)
    assert res2["width"] <= 4096  # side cap enforced


def test_cli_parity_profile_with_supersample(tmp_path):
    a = tmp_path / "a.png"
    Image.fromarray(rand_img(100, 100)).save(a)
    out = tmp_path / "o.png"
    r = run_cli(a, "-o", out, "--parity-profile", "ios", "--supersample",
                "--engine", "oracle", "--json")
    import json
    res = json.loads(r.stdout)
    assert res["width"] == 220  # 2.2x iOS supersample ceiling


def test_is_oom_accepts_reparented_runtime_error_types():
    """A backend whose XlaRuntimeError stops subclassing RuntimeError must
    still reach the phrase fallback (ADVICE r3): classification accepts the
    known runtime-error type NAMES before rejecting on type."""
    XlaRuntimeError = type("XlaRuntimeError", (Exception,), {})
    assert pipeline._is_oom(XlaRuntimeError("RESOURCE_EXHAUSTED: 12G"))
    assert pipeline._is_oom(XlaRuntimeError("ran out of memory in hbm"))
    assert not pipeline._is_oom(XlaRuntimeError("ABORTED: backend error"))
    # arbitrary exception types still never demote
    Weird = type("WeirdError", (Exception,), {})
    assert not pipeline._is_oom(Weird("out of memory"))
