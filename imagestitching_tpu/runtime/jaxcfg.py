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
    """
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:  # pragma: no cover — non-linux
        pass
    if not feats:
        import platform
        feats = platform.machine() or "unknown"
    return hashlib.sha1(feats.encode()).hexdigest()[:10]


def _primary_platform() -> str:
    """The platform this process will resolve to, best-effort, WITHOUT
    initializing a backend ('' when auto-selecting among plugins)."""
    p = None
    try:
        import jax
        p = jax.config.jax_platforms      # in-process override wins (the
    except Exception:                     # TPU plugin's sitecustomize
        pass                              # overrides the env var)
    if not p:
        p = os.environ.get("JAX_PLATFORMS") or ""
    return p.split(",")[0].strip().lower()


def _resolves_to_cpu() -> bool:
    """True when this process will run XLA:CPU, decided WITHOUT backend
    init (init can hang >180 s on a wedged tunnel).  Explicit config wins;
    under auto-selection ('') the process is CPU iff no accelerator plugin
    is discoverable — an unconfigured host with no plugin silently resolves
    to cpu, and its AOT executables must land in the ISA-keyed subdir too
    (the original SIGILL hazard is exactly such a host)."""
    p = _primary_platform()
    if p:
        return p == "cpu"
    try:                                  # PJRT plugins via entry points
        from importlib.metadata import entry_points
        if list(entry_points(group="jax_plugins")):
            return False
    except Exception:  # pragma: no cover — metadata backend quirks
        pass
    try:                                  # plugins via namespace package
        import pkgutil

        import jax_plugins  # type: ignore[import-not-found]
        if any(pkgutil.iter_modules(jax_plugins.__path__)):
            return False
    except Exception:
        pass
    return True


def ensure_compile_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent, respectful).

    Precedence for the cache ROOT: explicit ``path`` >
    ``JAX_COMPILATION_CACHE_DIR`` env > ``~/.cache/imagestitching_tpu/jax``.
    For CPU-platform processes a ``cpu-<tag>`` subdirectory keyed by
    :func:`host_cpu_tag` is appended under the root (see its docstring) —
    the SIGILL hazard is specific to XLA:CPU AOT executables, and keying
    unconditionally would orphan the whole TPU cache (20-90 s re-compile
    per layout signature through the tunnel) every time a cpuinfo flag
    name churns across kernel upgrades.
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
    if _resolves_to_cpu():
        path = os.path.join(path, f"cpu-{host_cpu_tag()}")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never fail a job over it


def is_device_array(x) -> bool:
    """True for jax arrays (device-resident canvases), False for numpy.

    The one shared implementation — keep_on_device/export/preview behavior
    must agree on what counts as "on device".
    """
    return type(x).__module__.startswith("jax")
