"""Process-wide JAX runtime configuration (compile cache, defaults).

The analog of the reference's probed-and-cached device limits
(pages/index/index.js:345-417, results cached in storage at index.js:408-412):
expensive environment discovery done once and persisted.  Here the expensive
thing is XLA/Mosaic compilation — a persistent compilation cache turns the
20-90 s first-compile of each layout signature into a ~1 s reload across
processes.
"""

from __future__ import annotations

import os

_configured = False


def ensure_compile_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent, respectful).

    Precedence: explicit ``path`` > ``JAX_COMPILATION_CACHE_DIR`` env (already
    honored by JAX itself) > ``~/.cache/imagestitching_tpu/jax``.
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
