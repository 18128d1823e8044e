"""Process-wide JAX runtime configuration (compile cache, defaults).

The analog of the reference's probed-and-cached device limits
(pages/index/index.js:345-417, results cached in storage at index.js:408-412):
expensive environment discovery done once and persisted.  Here the expensive
thing is XLA/Mosaic compilation — a persistent compilation cache turns the
20-90 s first-compile of each layout signature into a ~1 s reload across
processes.
"""

from __future__ import annotations

import hashlib
import os

_configured = False


def host_cpu_tag() -> str:
    """Short fingerprint of the host CPU's ISA feature set.

    XLA:CPU persists AOT executables compiled for the *building* host's
    features (AMX/avx512...); a cache hit on a host lacking them can SIGILL
    (the exact warning in MULTICHIP_r03's tail).  Keying the cache dir by
    the feature set makes a cross-host hit structurally impossible while
    same-host reuse (the only reuse that ever happens here) is unaffected.

    The tag hashes the MODEL identity (vendor/family/model/stepping/name)
    as well as the flags: XLA also bakes model-derived tuning features
    (``+prefer-no-gather``/``+prefer-no-scatter``) into AOT results, and a
    VM migrated across physical hosts can present identical cpuinfo flags
    with a different model — flags-only keying produced a cross-model hit
    and the machine-feature mismatch warning again (r4 session 5).
    """
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("vendor_id", "cpu family", "model",
                           "model name", "stepping"):
                    parts.append(line.strip())
                elif key == "flags":
                    parts.append(" ".join(sorted(
                        line.split(":", 1)[1].split())))
                elif key == "processor" and parts:
                    break          # first logical CPU block is enough
    except OSError:  # pragma: no cover — non-linux
        pass
    if not parts:
        import platform
        parts = [platform.machine() or "unknown"]
    return hashlib.sha1("\n".join(parts).encode()).hexdigest()[:10]


def _platform_list() -> list[str]:
    """The configured platform priority list, best-effort, WITHOUT
    initializing a backend ([] when auto-selecting among plugins)."""
    p = None
    try:
        import jax
        p = jax.config.jax_platforms      # in-process override wins (the
    except Exception:                     # TPU plugin's sitecustomize
        pass                              # overrides the env var)
    if not p:
        p = os.environ.get("JAX_PLATFORMS") or ""
    return [s.strip().lower() for s in p.split(",") if s.strip()]


def _may_run_cpu() -> bool:
    """True when this process MAY run XLA:CPU, decided WITHOUT backend
    init (init can hang >180 s on a wedged tunnel).

    "May" is the bar, not "will" (r4 review): with a priority list like
    ``"axon,cpu"`` (the axon sitecustomize default) a dead tunnel silently
    falls back to the cpu backend, and under auto-selection ('') a
    discoverable plugin whose init fails does the same — only an explicit
    platform list WITHOUT cpu is guaranteed never to produce XLA:CPU AOT
    executables (there, init failure raises instead of falling back)."""
    p = _platform_list()
    if p:
        return "cpu" in p
    return True   # auto-selection can always fall back to cpu


def ensure_compile_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent, respectful).

    Precedence for the cache ROOT: explicit ``path`` >
    ``JAX_COMPILATION_CACHE_DIR`` env > ``~/.cache/imagestitching_tpu/jax``.
    For processes that MAY run XLA:CPU (cpu anywhere in the platform
    priority list, or auto-selection) a ``cpu-<tag>`` subdirectory keyed
    by :func:`host_cpu_tag` is appended under the root (see its
    docstring).  Only an explicit accelerator-only platform list keeps
    the unkeyed root: there the SIGILL-hazardous XLA:CPU AOT executables
    are structurally impossible, and the tag would merely orphan the TPU
    cache (20-90 s re-compile per layout signature through the tunnel)
    every time a cpuinfo flag name churns across kernel upgrades.
    """
    global _configured
    if _configured:
        return
    _configured = True
    import jax

    if path is None and os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        path = os.environ["JAX_COMPILATION_CACHE_DIR"]
    if path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "imagestitching_tpu", "jax")
    if _may_run_cpu():
        path = os.path.join(path, f"cpu-{host_cpu_tag()}")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never fail a job over it


def bounded_backend_probe(timeout_s: float):
    """First backend touch, bounded: ``jax.default_backend()`` on a daemon
    thread, so a wedged PJRT init (where in-process signal handlers cannot
    fire) costs ``timeout_s``, not the caller's whole budget (observed
    round 4 with the relay down: init hangs >180 s).

    Returns ``(backend, devices_repr, err)``: ``err`` is ``None`` on
    success, the raised exception on init failure, or a ``TimeoutError``
    on timeout.  Never raises — bench.py and tests_tpu map ``err`` onto
    their own policies (abort-with-JSON vs skip-the-module).  The one
    shared implementation of the wedge handling (r4 review: two sibling
    probes had already diverged on timeout defaults).
    """
    import threading

    out: dict = {}
    done = threading.Event()

    def probe():
        try:
            import jax
            out["backend"] = jax.default_backend()
            out["devices"] = repr(jax.devices())
        except BaseException as e:  # noqa: BLE001 — returned to the caller
            out["err"] = e
        finally:
            done.set()

    threading.Thread(target=probe, daemon=True,
                     name="bounded-backend-probe").start()
    if not done.wait(timeout_s):
        return None, None, TimeoutError(
            f"backend init did not complete within {timeout_s:.0f}s")
    if "err" in out:
        return None, None, out["err"]
    return out["backend"], out["devices"], None


def is_device_array(x) -> bool:
    """True for jax arrays (device-resident canvases), False for numpy.

    The one shared implementation — keep_on_device/export/preview behavior
    must agree on what counts as "on device".
    """
    return type(x).__module__.startswith("jax")
