"""Device-mesh helpers.

The reference has no distributed layer (SURVEY.md section 2.2): a single
GPU plus OpenMP threads. The TPU build scales through jax.sharding meshes:

- axis "batch": volume-per-device data parallelism (the headline
  volumes/sec scaling mode),
- axis "space": spatial partitioning of one oversized volume with
  halo-exchange blur (sift3d.dist.halo).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    batch: Optional[int] = None,
    space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if batch is None:
        batch = n // space
    assert batch * space == n, f"{batch} x {space} != {n} devices"
    arr = np.asarray(devices).reshape(batch, space)
    return Mesh(arr, ("batch", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, Z, Y, X] volumes sharded over the batch axis."""
    return NamedSharding(mesh, P("batch", None, None, None))


def space_sharding(mesh: Mesh, axis_name: str = "space") -> NamedSharding:
    """[Z, Y, X] volume sharded spatially along Z (leading axis).

    Z is the halo-exchange axis everywhere in dist/ (halo.py, spatial.py).
    """
    return NamedSharding(mesh, P(axis_name, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
