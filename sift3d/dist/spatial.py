"""Spatially-partitioned extraction for volumes too large for one chip.

The reference caps volume size at single-GPU memory (5 full-resolution
volumes resident, MultiScale.cpp:271-282). Here an oversized volume is
sharded along Z over the mesh's "space" axis:

- every blur z-pass halo-exchanges filter-radius planes over ICI
  (sift3d.dist.halo.blur3d_sharded, ppermute);
- DoG is elementwise (no communication);
- the extrema stencil runs under shard_map with a one-plane halo
  exchange per DoG level;
- the ragged feature stage gathers its 11^3 patches through XLA SPMD
  gathers on the sharded Gaussian stack (cross-shard reads become
  collectives automatically — correct first, optimal later).

Equivalence with the single-device pipeline is tested on the simulated
CPU mesh (tests/test_dist.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sift3d.core.config import DEFAULT_CONFIG, SiftConfig
from sift3d.dist.halo import _exchange_halo_z, blur3d_sharded, shard_volume
from sift3d.kernels.extrema import extrema_mask
from sift3d.kernels.resample import subsample_2x


def _extrema_sharded(dogs, mesh: Mesh, axis_name: str = "space"):
    """Strict 80-comparison extrema over a Z-sharded [5, Z, Y, X] stack."""
    spec = P(None, axis_name, None, None)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False)
    def _mask(local):
        # attach one halo plane per side on every level, run the local
        # stencil, then crop; global borders stay zero-masked because the
        # halo at the ends is zero-filled and interior masking below
        idx = jax.lax.axis_index(axis_name)
        n = jax.lax.axis_size(axis_name)
        ext = jnp.stack([_exchange_halo_z(local[l], 1, axis_name) for l in range(local.shape[0])])
        m = extrema_mask(ext)  # [3, tz+2, Y, X], borders already zeroed
        m = m[:, 1:-1]
        # re-validate the z rows adjacent to shard boundaries: extrema_mask
        # zeroed the first/last rows of the *extended* slab, which are the
        # halo rows — rows 0 and tz-1 of the crop carry correct values
        # except at the global ends, where they must be zero
        tz = m.shape[1]
        row = jnp.arange(tz)[None, :, None, None]
        first_global = (idx == 0) & (row == 0)
        last_global = (idx == n - 1) & (row == tz - 1)
        return jnp.where(first_global | last_global, jnp.int8(0), m)

    return _mask(dogs)


class ShardedOctave(NamedTuple):
    gstack: jnp.ndarray  # [6, Z, Y, X] Z-sharded
    dogs: jnp.ndarray  # [5, Z, Y, X] Z-sharded
    mask: jnp.ndarray  # [3, Z, Y, X] Z-sharded int8
    next_base: jnp.ndarray  # [Z/2, Y, X] Z-sharded


def octave_step_spatial(base, cfg: SiftConfig, mesh: Mesh, axis_name: str = "space"):
    """One pyramid octave over a Z-sharded volume."""
    inc = cfg.incremental_sigmas()
    levels = [base]
    for j in range(1, cfg.blurs_total):
        levels.append(
            blur3d_sharded(levels[-1], inc[j - 1], mesh, cfg.blur_precision, axis_name)
        )
    gstack = jnp.stack(levels)
    dogs = gstack[:-1] - gstack[1:]
    mask = _extrema_sharded(dogs, mesh, axis_name)

    spec_in = P(axis_name, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=spec_in, out_specs=spec_in, check_vma=False
    )
    def _sub(local):
        return subsample_2x(local)

    next_base = _sub(levels[cfg.blurs_per_octave])
    return ShardedOctave(gstack, dogs, mask, next_base)


def initial_blur_spatial(vol, cfg: SiftConfig, mesh: Mesh, initial_image_scale: float = 1.0,
                         axis_name: str = "space"):
    import math

    sigma_init = cfg.sigma_init
    if initial_image_scale > 0:
        sigma_init = sigma_init / initial_image_scale
    extra = math.sqrt(max(cfg.sigma_base**2 - sigma_init**2, 0.0))
    return blur3d_sharded(vol, extra, mesh, cfg.blur_precision, axis_name)
