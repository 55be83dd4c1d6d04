"""Collective keypoint gathering + sharded all-pairs distance matrices.

TPU equivalent of the matcher's OpenMP image-chunk loop
(featMatchMultiple.cpp:108-117): descriptor sets are all_gather-ed over ICI
so every device holds the full database, then each device computes exact
kNN for its shard of the queries (SURVEY.md section 2.2).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_knn(queries, db, k: int, mesh: Mesh, axis_name: str = "batch"):
    """Exact kNN with queries sharded over `axis_name`, db replicated.

    queries: [Q, D] with Q divisible by the axis size (pad with zeros).
    Returns (dists [Q, k], idx [Q, k]).
    """
    qs = jax.device_put(queries, NamedSharding(mesh, P(axis_name, None)))
    dbr = jax.device_put(db, NamedSharding(mesh, P()))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _knn(q_local, db_full):
        qn = (q_local * q_local).sum(-1)
        dn = (db_full * db_full).sum(-1)
        cross = jnp.einsum(
            "qd,nd->qn", q_local, db_full,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        d2 = jnp.maximum(qn[:, None] + dn[None, :] - 2.0 * cross, 0.0)
        neg, idx = jax.lax.top_k(-d2, k)
        # replicate the (tiny, [Q, k]) results so the host can read them
        # from ANY process — required for multi-host meshes, free at [Q, k]
        return (
            jax.lax.all_gather(-neg, axis_name, axis=0, tiled=True),
            jax.lax.all_gather(idx, axis_name, axis=0, tiled=True),
        )

    d, i = _knn(qs, dbr)
    return np.asarray(d), np.asarray(i)


def gather_keypoint_sets(local_desc, mesh: Mesh, axis_name: str = "batch"):
    """all_gather per-device descriptor blocks into the full database.

    local_desc: [B, N, D] sharded over axis_name (B = volumes). Returns the
    replicated concatenation [B * N, D].
    """
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(axis_name, None, None),
        out_specs=P(),
        check_vma=False,
    )
    def _gather(block):
        full = jax.lax.all_gather(block, axis_name, axis=0, tiled=True)
        return full.reshape(-1, full.shape[-1])

    return _gather(local_desc)
