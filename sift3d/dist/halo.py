"""Halo-exchange spatial partitioning for oversized volumes.

The stencil-parallel analogue of ring attention (SURVEY.md section 5): a
volume too large for one chip is sharded along Z over the mesh's "space"
axis; each separable-blur z-pass first exchanges `radius` boundary planes
with both neighbors via jax.lax.ppermute over ICI, then blurs its local
shard with the halo attached. X/Y passes need no communication (those axes
are unsharded). The halo width follows the per-level truncated filter
radius (GaussianMask.cpp:12-57 rule), which is exactly the reference's
kernel support.

Semantics note: zero-padding at the *global* volume border is preserved —
edge shards pad with zeros, interior shards pad with the neighbor's planes,
so a sharded blur equals the single-chip blur bit-for-bit (up to matmul
reduction order).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sift3d.kernels import gauss


def _exchange_halo_z(local: jnp.ndarray, radius: int, axis_name: str) -> jnp.ndarray:
    """Attach `radius` planes from Z-neighbors (zeros past the global ends).

    When the radius exceeds the shard depth (large sigma late in an
    octave), whole shards are relayed over multiple ppermute hops until
    the halo is covered.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    tz = local.shape[0]

    if radius <= tz:
        top = local[-radius:]
        bot = local[:radius]
        from_left = jax.lax.ppermute(top, axis_name, [(i, i + 1) for i in range(n - 1)])
        from_right = jax.lax.ppermute(bot, axis_name, [(i + 1, i) for i in range(n - 1)])
        zeros = jnp.zeros_like(bot)
        lo = jnp.where(idx > 0, from_left, zeros)
        hi = jnp.where(idx < n - 1, from_right, zeros)
        return jnp.concatenate([lo, local, hi], axis=0)

    hops = -(-radius // tz)
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]
    zeros = jnp.zeros_like(local)
    left_blocks = []  # [idx-1, idx-2, ...] full shards
    right_blocks = []
    lblk = rblk = local
    for h in range(1, hops + 1):
        lblk = jax.lax.ppermute(lblk, axis_name, fwd)
        lblk = jnp.where(idx - h >= 0, lblk, zeros)
        left_blocks.append(lblk)
        rblk = jax.lax.ppermute(rblk, axis_name, bwd)
        rblk = jnp.where(idx + h < n, rblk, zeros)
        right_blocks.append(rblk)
    lo = jnp.concatenate(list(reversed(left_blocks)), axis=0)[-radius:]
    hi = jnp.concatenate(right_blocks, axis=0)[:radius]
    return jnp.concatenate([lo, local, hi], axis=0)


def blur3d_sharded(
    vol: jnp.ndarray,
    sigma: float,
    mesh: Mesh,
    min_value: float = 0.01,
    axis_name: str = "space",
    matmul_precision: "str | None" = None,
) -> jnp.ndarray:
    """Separable 3D blur of a Z-sharded [Z, Y, X] volume.

    Equivalent to sift3d.kernels.gauss.blur3d on the gathered volume, but
    each device only ever holds its shard plus a filter-radius halo.
    matmul_precision mirrors gauss.blur3d (the -2+ HIGHEST rule applies
    to sharded chains too).
    """
    if sigma <= 0:
        return vol
    radius = gauss.gaussian_filter_size(sigma, min_value) // 2
    taps = gauss.gaussian_kernel_1d(sigma, min_value)

    n_space = mesh.shape[axis_name]
    spec = P(axis_name, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False
    )
    def _blur(local):
        # x and y passes are local (those axes are unsharded)
        out = gauss.blur_axis(local, 2, sigma, min_value, matmul_precision)
        out = gauss.blur_axis(out, 1, sigma, min_value, matmul_precision)
        if radius == 0:
            return out
        # z pass with halo: exchange radius planes, dense banded matmul on
        # the extended shard, then crop
        ext = _exchange_halo_z(out, radius, axis_name)
        zdim = ext.shape[0]
        b = np.zeros((zdim, zdim), dtype=np.float32)
        t = taps
        for o in range(zdim):
            lo = max(0, o - radius)
            hi = min(zdim, o + radius + 1)
            b[lo:hi, o] = t[lo - o + radius : hi - o + radius]
        blurred = jnp.einsum(
            "zyx,zw->wyx", ext, jnp.asarray(b),
            preferred_element_type=jnp.float32,
            precision=gauss._resolve_precision(matmul_precision),
        )
        return blurred[radius : radius + local.shape[0]]

    return _blur(vol)


def shard_volume(vol, mesh: Mesh, axis_name: str = "space"):
    """Place a [Z, Y, X] volume Z-sharded on the mesh."""
    from sift3d.dist.mesh import space_sharding

    return jax.device_put(vol, space_sharding(mesh, axis_name))
