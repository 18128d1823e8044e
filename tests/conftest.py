"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip hardware is not available in CI; the sharded/pjit paths are
validated on a virtual CPU mesh (SURVEY.md §4(5)).  These env vars must be set
before the first ``import jax`` anywhere, which pytest guarantees by importing
conftest first.
"""

import os

# Force (not setdefault): the session env may point JAX_PLATFORMS at a real
# TPU plugin; unit tests must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
