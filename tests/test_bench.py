"""bench.py resilience: the driver's JSON line must survive device aborts.

Round 2 lost its scoreboard entry to one transient ``ABORTED: TPU backend
error`` mid-slope-timing (BENCH_r02.json rc=1, parsed null).  These tests
drive the retry/fallback plumbing with injected failures and assert the
invariant the driver depends on: **one parseable JSON line, always**.
"""

import json

import pytest

import bench


class _Flaky:
    """Raises ``RuntimeError`` for the first ``n_fail`` calls, then works."""

    def __init__(self, n_fail, value=42):
        self.n_fail = n_fail
        self.calls = 0
        self.resets = 0
        self.value = value

    def __call__(self):
        self.calls += 1
        if self.calls <= self.n_fail:
            raise RuntimeError("ABORTED: TPU backend error (Aborted).")
        return self.value

    def reset(self):
        self.resets += 1


def test_retry_transient_recovers_and_resets():
    f = _Flaky(2)
    got = bench._retry_transient(f, attempts=3, sleep_s=0.0, reset=f.reset)
    assert got == 42
    assert f.calls == 3
    assert f.resets == 2            # reset between attempts, not after


def test_retry_transient_exhausts():
    f = _Flaky(99)
    with pytest.raises(RuntimeError):
        bench._retry_transient(f, attempts=3, sleep_s=0.0)
    assert f.calls == 3


def test_retry_transient_does_not_retry_programming_errors():
    calls = []

    def bad():
        calls.append(1)
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        bench._retry_transient(bad, attempts=3, sleep_s=0.0)
    assert len(calls) == 1


def test_is_transient_classifier():
    import jax

    assert bench._is_transient(RuntimeError("ABORTED"))
    assert bench._is_transient(jax.errors.JaxRuntimeError("UNAVAILABLE"))
    assert not bench._is_transient(ValueError("x"))
    assert not bench._is_transient(TypeError("x"))
    # deterministic failures must NOT be retried: kernel infeasibility
    # (NotImplementedError subclasses RuntimeError) and OOM for a fixed
    # workload would just re-raise identically after wasted sleeps
    assert not bench._is_transient(NotImplementedError("K exceeds taps"))
    assert not bench._is_transient(
        RuntimeError("RESOURCE_EXHAUSTED: 12.00G requested"))


def test_slope_run_discards_retry_poisoned_rounds(monkeypatch):
    """A transient abort INSIDE a timed round must not enter the median
    (the failed attempt + backoff would otherwise poison the sample)."""
    monkeypatch.setattr(bench, "log", lambda *a: None)
    calls = {"n": 0}

    def run_chain(k, imgs):
        calls["n"] += 1
        if calls["n"] == 4:            # first timed call after 2 warmups +1
            raise RuntimeError("ABORTED: TPU backend error")
        return k

    orig_sleep = bench.time.sleep
    monkeypatch.setattr(bench.time, "sleep", lambda s: orig_sleep(0))
    p50, samples = bench._slope_run(run_chain, [], 2, 10, rounds=3)
    assert len(samples) == 3           # the poisoned round was re-run
    # 2 warmups + 3 calls in the discarded round (ok, abort, retry-ok) +
    # 3 clean rounds x 2 calls: the re-run actually happened
    assert calls["n"] == 2 + 3 + 6


def _run_main_json(capsys, monkeypatch, **kw):
    monkeypatch.setattr(bench, "log", lambda *a: None)  # quiet stderr
    bench.main(**kw)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"expected exactly one JSON line, got {out}"
    return json.loads(out[0])


def test_main_emits_json_on_total_device_failure(capsys, monkeypatch):
    """Every slope path aborting still yields a parseable line with the
    error recorded — the round-2 failure mode, fixed."""
    def die(*a, **k):
        raise RuntimeError("ABORTED: TPU backend error (Aborted).")

    monkeypatch.setattr(bench, "_slope_auto", die)
    monkeypatch.setattr(bench, "_slope_time", die)
    monkeypatch.setattr(bench, "_retry_transient",
                        lambda fn, **k: fn())      # no sleeps in tests
    parsed = _run_main_json(capsys, monkeypatch,
                            n_images=2, w=64, h=48, e2e=False)
    assert parsed["value"] is None
    assert parsed["vs_baseline"] is None
    assert "errors" in parsed and "device" in parsed["errors"]
    assert "ABORTED" in parsed["errors"]["device"]
    assert parsed["backend"] == "cpu"


def test_main_falls_back_to_carried_chain(capsys, monkeypatch):
    """slope_auto persistently aborting falls back to the short carried
    chain and still produces a real number."""
    def die(*a, **k):
        raise RuntimeError("ABORTED: TPU backend error (Aborted).")

    monkeypatch.setattr(bench, "_slope_auto", die)
    parsed = _run_main_json(capsys, monkeypatch,
                            n_images=2, w=64, h=48, e2e=False)
    assert parsed["value"] is not None and parsed["value"] > 0
    assert parsed["timing_mode"] == "carried_fallback"
    assert parsed["errors"]["slope_auto"]
    assert parsed["parity_max_diff"] <= 1


def test_main_happy_path_tiny(capsys, monkeypatch):
    parsed = _run_main_json(capsys, monkeypatch,
                            n_images=2, w=64, h=48, e2e=False)
    assert parsed["value"] is not None and parsed["value"] > 0
    assert parsed["timing_mode"] == "slope_auto"
    assert parsed["parity_max_diff"] <= 1
    assert "errors" not in parsed
    # non-headline geometry must NOT emit a scoreboard-shaped result: the
    # 50 ms target is defined for the 9x12MP job only
    assert parsed["smoke"] is True
    assert parsed["vs_baseline"] is None
    assert "SMOKE" in parsed["metric"]


def test_main_survives_transient_mid_slope(capsys, monkeypatch):
    """One abort inside slope timing (the literal round-2 event) recovers
    via retry + input re-staging and reports a clean result."""
    real = bench._slope_auto
    state = {"calls": 0}

    def flaky(*a, **kw):
        state["calls"] += 1
        if state["calls"] == 1:
            raise RuntimeError("ABORTED: TPU backend error (Aborted).")
        return real(*a, **kw)

    monkeypatch.setattr(bench, "_slope_auto", flaky)
    # drop retry sleeps to keep the test fast
    orig = bench._retry_transient
    monkeypatch.setattr(
        bench, "_retry_transient",
        lambda fn, sleep_s=5.0, **k: orig(fn, sleep_s=0.0, **k))
    parsed = _run_main_json(capsys, monkeypatch,
                            n_images=2, w=64, h=48, e2e=False)
    assert state["calls"] == 2
    assert parsed["value"] is not None
    assert parsed["timing_mode"] == "slope_auto"
    assert "errors" not in parsed


def test_e2e_variant_emits_stability_fields(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "log", lambda *a: None)
    out = bench._e2e_variant([(64, 48), (64, 48)], runs=3, budget_s=60.0,
                             prefix="e2e_")
    assert out["e2e_ms"] is not None
    assert out["e2e_ms_min"] <= out["e2e_ms"] <= out["e2e_ms_max"]
    assert out["e2e_runs"] >= 1
