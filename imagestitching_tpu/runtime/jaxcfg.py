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
    if _primary_platform() == "cpu":
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
