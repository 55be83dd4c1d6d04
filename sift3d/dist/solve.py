"""Distributed similarity-transform solve (group registration).

The reference estimates each pairwise transform from a single Hough-winning
hypothesis (featMatchUtilities.cpp:816-1025). For group-wise registration
at pod scale we add the standard refinement the reference lacks: a weighted
least-squares similarity fit (Umeyama/Procrustes) over all inlier
correspondences, computed from second-order moments that are psum-reduced
over the mesh — the "Schur-complement-style normal-equation reduction over
collectives" called for by BASELINE.json's north star.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _moments(p, q, w):
    """Weighted moments sufficient for the similarity fit."""
    sw = w.sum()
    sp = (w[:, None] * p).sum(0)
    sq = (w[:, None] * q).sum(0)
    spp = (w * (p * p).sum(-1)).sum()
    spq = jnp.einsum("n,ni,nj->ij", w, q, p)  # sum w q p^T
    return sw, sp, sq, spp, spq


def _solve_from_moments(sw, sp, sq, spp, spq):
    """Closed-form weighted Umeyama from psum-able moments.

    Returns (scale, rot [3,3], trans [3]) minimizing sum w |s R p + t - q|^2.
    """
    sw = jnp.maximum(sw, 1e-20)
    pbar = sp / sw
    qbar = sq / sw
    cov = spq / sw - jnp.outer(qbar, pbar)  # E[q p^T] - qbar pbar^T
    varp = spp / sw - (pbar * pbar).sum()
    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    diag = jnp.array([1.0, 1.0, 1.0]).at[2].mul(d)
    rot = (u * diag[None, :]) @ vt
    scale = (s * diag).sum() / jnp.maximum(varp, 1e-20)
    trans = qbar - scale * (rot @ pbar)
    return scale, rot, trans


@jax.jit
def solve_similarity(p: jnp.ndarray, q: jnp.ndarray, w: jnp.ndarray):
    """Single-device weighted similarity fit p -> q."""
    return _solve_from_moments(*_moments(p, q, w))


def solve_similarity_sharded(p, q, w, mesh: Mesh, axis_name: str = "batch"):
    """Same fit with correspondences sharded over the mesh: each device
    reduces its local moments, psum combines them, every device solves the
    tiny 3x3 problem redundantly."""
    sh = NamedSharding(mesh, P(axis_name, None))
    shw = NamedSharding(mesh, P(axis_name))
    p = jax.device_put(jnp.asarray(p, jnp.float32), sh)
    q = jax.device_put(jnp.asarray(q, jnp.float32), sh)
    w = jax.device_put(jnp.asarray(w, jnp.float32), shw)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P(axis_name)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def _solve(pl, ql, wl):
        m = _moments(pl, ql, wl)
        m = tuple(jax.lax.psum(x, axis_name) for x in m)
        return _solve_from_moments(*m)

    s, r, t = _solve(p, q, w)
    return float(np.asarray(s)), np.asarray(r), np.asarray(t)
