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


def _pow2_bucket(n: int, lo: int = 256) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def knn_search_tiled(queries, db, k: int, tile: int = 4096):
    """Host-tiled kNN with power-of-2 shape bucketing.

    Feature counts vary per image pair; padding both the query tiles and
    the database to shape buckets bounds the number of compiled programs
    (remote compiles dominate otherwise). Padded database rows carry a
    huge norm so they never reach the top-k (requires k <= real N).
    """
    import numpy as np

    q = np.asarray(queries, dtype=np.float32)
    dbn = np.asarray(db, dtype=np.float32)
    n = dbn.shape[0]
    if q.shape[0] == 0 or n == 0 or k == 0:
        # empty query/database (e.g. featureless images): no matches
        return (
            np.zeros((q.shape[0], k), np.float32),
            np.zeros((q.shape[0], k), np.int64),
        )
    assert k <= n, "k exceeds database size"
    np_pad = _pow2_bucket(n)
    if np_pad != n:
        pad = np.full((np_pad - n, dbn.shape[1]), 1e18, np.float32)
        dbn = np.concatenate([dbn, pad])
    db_d = jnp.asarray(dbn)

    # dispatch every tile asynchronously, then fetch all results in one
    # device_get: per-tile np.asarray would pay a relay round-trip each
    pending = []
    for s in range(0, q.shape[0], tile):
        block = q[s : s + tile]
        qb = _pow2_bucket(block.shape[0], lo=min(tile, 256))
        if qb != block.shape[0]:
            block = np.concatenate([block, np.zeros((qb - block.shape[0], q.shape[1]), np.float32)])
        pending.append(knn_search(jnp.asarray(block), db_d, k))
    host = jax.device_get(pending)
    outs_d = [d[: min(tile, q.shape[0] - s)] for (d, _), s in zip(host, range(0, q.shape[0], tile))]
    outs_i = [i[: min(tile, q.shape[0] - s)] for (_, i), s in zip(host, range(0, q.shape[0], tile))]
    return np.concatenate(outs_d), np.concatenate(outs_i)
