"""Exact k-nearest-neighbor search as tiled MXU distance matrices.

The reference uses FLANN kd-trees (8 trees / 64 checks, approximate;
feat_common/featMatchUtilities.cpp:1449-1456,1559) because pointer-chasing
trees are what CPUs do well. TPUs prefer dense brute force: the squared
L2 distance matrix ||a-b||^2 = ||a||^2 + ||b||^2 - 2ab is one matmul on
the MXU, and top-k over it is exact — strictly better recall than FLANN at
enormous throughput (SURVEY.md section 2.2 mapping).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def knn_search(queries: jnp.ndarray, db: jnp.ndarray, k: int):
    """Exact kNN: returns (dists [Q, k], idx [Q, k]) sorted ascending.

    Distances are squared L2, matching FLANN's default metric so the
    soft-vote weighting math (exp(-(d/dmin)^2) on squared distances) is
    directly comparable.
    """
    qn = (queries * queries).sum(-1)
    dn = (db * db).sum(-1)
    # full f32 precision: rank-ordered descriptors are small integers and
    # bf16 MXU passes would reorder near-ties
    cross = jnp.einsum(
        "qd,nd->qn", queries, db, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = qn[:, None] + dn[None, :] - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx


def knn_search_tiled(queries, db, k: int, tile: int = 4096):
    """Host-tiled kNN for query sets too large for one [Q, N] matrix."""
    import numpy as np

    q = np.asarray(queries, dtype=np.float32)
    outs_d, outs_i = [], []
    for s in range(0, q.shape[0], tile):
        d, i = knn_search(jnp.asarray(q[s : s + tile]), db, k)
        outs_d.append(np.asarray(d))
        outs_i.append(np.asarray(i))
    return np.concatenate(outs_d), np.concatenate(outs_i)
