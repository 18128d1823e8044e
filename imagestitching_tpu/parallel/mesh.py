"""Device-mesh helpers.

The reference has no parallelism of any kind (SURVEY.md §2c) — it serializes
everything behind an ``isStitching`` mutex (pages/index/index.js:25,1193).
Here parallel execution is first-class: stitch jobs are independent, so the
natural mesh axes are

* ``jobs``  — data parallelism over concurrent stitch jobs (serving mode);
* ``space`` — spatial sharding of one job's output rows (the domain's
  sequence-parallel analog; output tiles are independent, SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("jobs", "space"),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh over available devices.

    Default: all devices on the ``jobs`` axis (embarrassingly parallel
    serving), i.e. shape ``(n, 1)`` for axes ("jobs", "space").
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def job_sharding(mesh: Mesh, axis: str = "jobs") -> NamedSharding:
    """Sharding for stacked job batches: leading batch dim split over jobs."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharding(mesh: Mesh, axis: str = "space") -> NamedSharding:
    """Sharding for a single job's HWC canvas: rows split over ``axis``."""
    return NamedSharding(mesh, P(axis))
