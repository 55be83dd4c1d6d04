"""Hough similarity-transform voting, vectorized.

Port of determine_similarity_transform_hough
(feat_common/featMatchUtilities.cpp:816-1025): every putative match is a
transform hypothesis — three virtual points built from (location,
orientation, scale) (feature_to_three_points :776-814), a closed-form
3-point similarity solve (determine_similarity_transform_3point :704-773 via
orthonormal triangle frames, determine_rotation_3point :243-334), and an
inlier count over all matches under the HOUGH_THRES_* compatibility rules
(:918-937). The reference's O(M^2) double loop becomes a batched
hypotheses-x-matches program: rotation frames are built for all hypotheses
at once and scoring is one broadcasted compare, mapped in chunks to bound
memory. Best hypothesis = max summed inlier probability, first winner on
ties (strict '>' update, :941).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from sift3d.core.config import DEFAULT_CONFIG, SiftConfig

_CHUNK = 128


def _normalize(v, axis=-1):
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.where(n > 0, n, 1.0)


def _triangle_frame(ori):
    """Orthonormal frame rows from a feature's triangle of virtual points.

    determine_rotation_3point on points P_k = loc + s * ori_row_k: the
    location and scale cancel, leaving a frame built from the ori rows.
    """
    v12 = _normalize(ori[..., 1, :] - ori[..., 0, :])
    v13 = _normalize(ori[..., 2, :] - ori[..., 0, :])
    n = _normalize(jnp.cross(v12, v13))
    third = _normalize(jnp.cross(n, v12))
    return jnp.stack([v12, third, n], axis=-2)  # rows


def _triangle_perimeter(ori, s):
    """Sum of pairwise distances of the 3 virtual points (scale factor)."""
    d01 = jnp.linalg.norm(ori[..., 0, :] - ori[..., 1, :], axis=-1)
    d02 = jnp.linalg.norm(ori[..., 0, :] - ori[..., 2, :], axis=-1)
    d12 = jnp.linalg.norm(ori[..., 1, :] - ori[..., 2, :], axis=-1)
    return s * (d01 + d02 + d12)


@functools.partial(jax.jit, static_argnames=("thres_scale", "thres_trans", "thres_orien"))
def _hough_scores(pts0, pts1, s0, s1, o0, o1, prob, valid,
                  thres_scale: float, thres_trans: float, thres_orien: float):
    """Scores for every hypothesis, plus per-hypothesis rot/scale."""
    r0 = _triangle_frame(o0)  # [M, 3, 3]
    r1 = _triangle_frame(o1)
    # rot = R1^T @ R0 (determine_similarity_transform_3point :760-770)
    rots = jnp.einsum("mki,mkj->mij", r1, r0)
    scales = _triangle_perimeter(o1, s1) / jnp.maximum(_triangle_perimeter(o0, s0), 1e-20)

    def score_chunk(args):
        rot_c, scale_c, p0_c, p1_c = args  # [H,3,3], [H], [H,3], [H,3]
        # transform every match j under each hypothesis in the chunk
        diff = pts0[None, :, :] - p0_c[:, None, :]  # [H, M, 3]
        proj = jnp.einsum("hij,hmj->hmi", rot_c, diff) * scale_c[:, None, None] + p1_c[:, None, :]
        test_scale = s0[None, :] * scale_c[:, None]
        d = jnp.linalg.norm(pts1[None] - proj, axis=-1)
        ok = jnp.abs(jnp.log(s1[None, :] / jnp.maximum(test_scale, 1e-20))) < thres_scale
        ok &= d < thres_trans * s1[None, :]
        # orientation: min row-cosine between o1_j and rot @ o0_j rows
        ro = jnp.einsum("hij,mkj->hmki", rot_c, o0)  # rotated o0 rows
        mincos = jnp.einsum("hmki,mki->hmk", ro, o1).min(axis=-1)
        ok &= thres_orien < mincos
        ok &= valid[None, :]
        return (ok * prob[None, :]).sum(axis=1)

    m = pts0.shape[0]
    n_chunks = m // _CHUNK
    rot_cs = rots[: n_chunks * _CHUNK].reshape(n_chunks, _CHUNK, 3, 3)
    scale_cs = scales[: n_chunks * _CHUNK].reshape(n_chunks, _CHUNK)
    p0_cs = pts0[: n_chunks * _CHUNK].reshape(n_chunks, _CHUNK, 3)
    p1_cs = pts1[: n_chunks * _CHUNK].reshape(n_chunks, _CHUNK, 3)
    scores = jax.lax.map(score_chunk, (rot_cs, scale_cs, p0_cs, p1_cs)).reshape(-1)
    scores = jnp.where(valid[: scores.shape[0]], scores, -jnp.inf)
    return scores, rots, scales


@functools.partial(jax.jit, static_argnames=("thres_scale", "thres_trans", "thres_orien"))
def _hough_inliers(pts0, pts1, s0, s1, o0, o1, valid, rot, scale, p0, p1,
                   thres_scale: float, thres_trans: float, thres_orien: float):
    diff = pts0 - p0[None, :]
    proj = (diff @ rot.T) * scale + p1[None, :]
    d = jnp.linalg.norm(pts1 - proj, axis=-1)
    ok = jnp.abs(jnp.log(s1 / jnp.maximum(s0 * scale, 1e-20))) < thres_scale
    ok &= d < thres_trans * s1
    ro = jnp.einsum("ij,mkj->mki", rot, o0)
    mincos = jnp.einsum("mki,mki->mk", ro, o1).min(axis=-1)
    ok &= thres_orien < mincos
    return ok & valid


def hough_similarity(pts0, pts1, s0, s1, o0, o1, prob, cfg: SiftConfig = DEFAULT_CONFIG):
    """Returns dict(hypothesis, rot [3,3], scale, inliers [M] bool, score)."""
    m = pts0.shape[0]
    # power-of-2 shape bucket: match counts vary per image pair, and every
    # new padded size is a fresh (expensive) compile otherwise
    mp = _CHUNK
    while mp < m:
        mp *= 2

    def pad(a, fill=0.0):
        out = np.full((mp,) + a.shape[1:], fill, dtype=np.float32)
        out[:m] = a
        return jnp.asarray(out)

    valid = np.zeros(mp, bool)
    valid[:m] = True
    o0p = np.tile(np.eye(3, dtype=np.float32), (mp, 1, 1))
    o0p[:m] = o0
    o1p = np.tile(np.eye(3, dtype=np.float32), (mp, 1, 1))
    o1p[:m] = o1

    args = (
        pad(pts0), pad(pts1), pad(s0, 1.0), pad(s1, 1.0),
        jnp.asarray(o0p), jnp.asarray(o1p), pad(prob), jnp.asarray(valid),
    )
    th = (float(cfg.hough_thres_scale), float(cfg.hough_thres_trans), float(cfg.hough_thres_orien))
    scores, rots, scales = _hough_scores(*args, *th)
    best = int(jnp.argmax(scores))
    rot = rots[best]
    scale = scales[best]
    inliers = _hough_inliers(
        args[0], args[1], args[2], args[3], args[4], args[5], args[7],
        rot, scale, args[0][best], args[1][best], *th,
    )
    return dict(
        hypothesis=best,
        rot=np.asarray(rot, dtype=np.float64),
        scale=float(scale),
        inliers=np.asarray(inliers)[:m],
        score=float(scores[best]),
    )
