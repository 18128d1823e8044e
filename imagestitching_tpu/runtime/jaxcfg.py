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

_cpuid_blob_cache: list = []     # [] = unprobed; [bytes|None] = result


def _llvm_visible_cpu_blob():
    """Raw CPUID + XGETBV dump — the EXACT inputs LLVM's host detection
    reads (llvm/lib/TargetParser/Host.cpp), or None off-x86/on failure.

    Needed because this Firecracker fleet masks ``/proc/cpuinfo`` to one
    generic model string ("Intel(R) Xeon(R) Processor @ 2.10GHz",
    microcode 0x1) on EVERY physical host, while raw CPUID still exposes
    the real silicon (leaf 1 EAX: family/model/stepping — e.g. 0xC06F2,
    Emerald Rapids).  A cpuinfo-derived tag therefore CANNOT distinguish
    hosts whose LLVM-visible ISA differs; hashing the leaves LLVM actually
    reads makes a cross-ISA AOT hit structurally impossible.

    NOTE (r4 session 6, measured): the recurring cpu_aot_loader
    "machine feature ... not supported on the host machine" warning that
    motivated rounds of tag-strengthening is a SAME-HOST FALSE POSITIVE —
    a fresh cache dir written and re-read seconds later on one boot warns
    identically.  XLA bakes LLVM *tuning* flags (+prefer-no-scatter/
    +prefer-no-gather) into the compile-feature list, but the loader's
    host probe only reports CPUID *ISA* flags, so every cached-entry load
    flags those two.  No cache keying can silence it, and it does not by
    itself indicate SIGILL risk; this keying guards against the real
    hazard (an actual ISA-flag mismatch across migrated hosts).

    Leaf 1 EBX is masked to its low 16 bits (the high half is the initial
    APIC id / logical CPU count — varies per vCPU and boot, not ISA).
    """
    if _cpuid_blob_cache:
        return _cpuid_blob_cache[0]
    blob = None
    try:
        import ctypes
        import mmap
        import platform
        if platform.machine() in ("x86_64", "AMD64"):
            code = bytes([
                0x53,                   # push rbx
                0x89, 0xf0,             # mov eax, esi
                0x89, 0xd1,             # mov ecx, edx
                0x0f, 0xa2,             # cpuid
                0x89, 0x07,             # mov [rdi], eax
                0x89, 0x5f, 0x04,       # mov [rdi+4], ebx
                0x89, 0x4f, 0x08,       # mov [rdi+8], ecx
                0x89, 0x57, 0x0c,       # mov [rdi+12], edx
                0x5b, 0xc3,             # pop rbx; ret
            ])
            xgetbv = bytes([
                0x31, 0xc9,             # xor ecx, ecx
                0x0f, 0x01, 0xd0,       # xgetbv
                0x89, 0x07,             # mov [rdi], eax
                0x89, 0x57, 0x04,       # mov [rdi+4], edx
                0xc3,                   # ret
            ])
            buf = mmap.mmap(-1, mmap.PAGESIZE,
                            prot=(mmap.PROT_READ | mmap.PROT_WRITE
                                  | mmap.PROT_EXEC))
            buf.write(code + xgetbv)
            base = ctypes.addressof(ctypes.c_char.from_buffer(buf))
            cpuid = ctypes.CFUNCTYPE(None, ctypes.c_void_p,
                                     ctypes.c_uint32, ctypes.c_uint32)(base)
            xgb = ctypes.CFUNCTYPE(None, ctypes.c_void_p)(base + len(code))
            out = (ctypes.c_uint32 * 4)()
            rows = []
            for eax, ecx in [(0, 0), (1, 0), (7, 0), (7, 1), (7, 2),
                             (0xD, 0), (0xD, 1), (0x14, 0),
                             (0x80000000, 0), (0x80000001, 0),
                             (0x80000008, 0)]:
                cpuid(ctypes.byref(out), eax, ecx)
                vals = list(out)
                if eax == 1:
                    vals[1] &= 0xFFFF
                rows.append((eax, ecx, vals))
            x = (ctypes.c_uint32 * 2)()
            xgb(ctypes.byref(x))
            rows.append((-1, 0, list(x)))          # XCR0
            blob = repr(rows).encode()
            del cpuid, xgb                         # before buf is released
    except Exception:   # pragma: no cover — W^X policies, exotic hosts
        blob = None
    _cpuid_blob_cache.append(blob)
    return blob


def host_cpu_tag() -> str:
    """Short fingerprint of the host CPU's ISA feature set.

    XLA:CPU persists AOT executables compiled for the *building* host's
    features (AMX/avx512...); a cache hit on a host lacking them can SIGILL
    (the exact warning in MULTICHIP_r03's tail).  Keying the cache dir by
    the feature set makes a cross-host hit structurally impossible while
    same-host reuse (the only reuse that ever happens here) is unaffected.

    The tag hashes raw CPUID + XGETBV (:func:`_llvm_visible_cpu_blob`) —
    the exact inputs LLVM derives host features from — because this
    fleet's hypervisor masks /proc/cpuinfo to ONE generic model string on
    every physical host, so no cpuinfo-derived key can separate hosts
    whose real ISA differs.  (The warning that repeatedly suggested a
    collision is in fact a same-host false positive — see
    :func:`_llvm_visible_cpu_blob`.)  cpuinfo fields remain in the hash
    as the fallback for hosts where the CPUID probe fails (non-x86,
    W^X-restricted mmap).
    """
    parts = []
    blob = _llvm_visible_cpu_blob()
    if blob is not None:
        parts.append(blob.decode("latin-1"))
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
