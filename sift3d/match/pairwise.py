"""Pairwise matching: NN + ratio test with geometric-compatibility shuffle.

Port of msComputeNearestNeighborDistanceRatioInfo
(feat_common/featMatchUtilities.cpp:336-421) and the match-list assembly of
MatchKeys (:1027-1136). The reference snapshot has the descriptor distance
calls commented out (SURVEY.md section 2.3 quirk 2); we implement the
*intended* behaviour — L2 over the 64 rank-ordered descriptor values
(Feature3DInfo::DistSqrPCs, MultiScale.h:60-73).

The sequential 1st/2nd shuffle collapses under sorted order: the first
neighbor is the global minimum and the effective second neighbor is the
nearest database feature NOT geometrically compatible with the first
(compatible = a better instance of the same structure, so it must not
suppress the ratio). We evaluate that over the top-k exact neighbors.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from sift3d.core.config import DEFAULT_CONFIG, SiftConfig
from sift3d.core.featureset import FeatureSet
from sift3d.match.knn import knn_search_tiled

_SHUFFLE_DEPTH = 16


def compatible_features_arrays(
    xyz_a, scale_a, ori_a, xyz_b, scale_b, ori_b,
    scale_diff_threshold: float,
    shift_threshold: float,
    cosine_threshold: float = -1.0,
):
    """Vectorized compatible_features (featMatchUtilities.cpp:60-158, sphere
    case). Asymmetric: the shift threshold is scaled by feature A's scale."""
    d = np.linalg.norm(np.asarray(xyz_a) - np.asarray(xyz_b), axis=-1)
    sdiff = np.abs(np.log(np.asarray(scale_a) / np.asarray(scale_b)))
    ok = (sdiff < scale_diff_threshold) & (d < shift_threshold * np.asarray(scale_a))
    if cosine_threshold > -1.0:
        mincos = np.einsum("...kd,...kd->...k", ori_a, ori_b).min(axis=-1)
        ok &= cosine_threshold < mincos
    return ok


@dataclasses.dataclass
class RatioMatches:
    query_idx: np.ndarray  # [M] indices into the query (model) set
    db_idx: np.ndarray  # [M] indices into the database (input) set
    ratio: np.ndarray  # [M] d1/d2


def ratio_match(
    queries: FeatureSet,
    db: FeatureSet,
    cfg: SiftConfig = DEFAULT_CONFIG,
    knn: tuple | None = None,
) -> RatioMatches:
    """For each query feature, nearest db feature + distance ratio.

    `knn` optionally supplies precomputed (dists, idx) over this db (at
    least _SHUFFLE_DEPTH deep) so callers matching many query sets
    against one database batch the kNN into a single device sweep."""
    k = min(_SHUFFLE_DEPTH, len(db))
    if len(db) < 2 or len(queries) == 0:
        return RatioMatches(np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.float32))
    if knn is not None:
        dists, idx = knn[0][:, :k], knn[1][:, :k]
    else:
        dists, idx = knn_search_tiled(queries.desc, db.desc, k)

    best_idx = idx[:, 0]
    d1 = dists[:, 0]

    # second neighbor: first (in ascending order) db candidate NOT
    # geometrically compatible with the best one
    b_xyz = db.xyz[best_idx]  # [Q, 3]
    b_scale = db.scale[best_idx]
    compat = compatible_features_arrays(
        db.xyz[idx], db.scale[idx], None,
        b_xyz[:, None, :], b_scale[:, None], None,
        cfg.ratio_compat_log_scale, cfg.ratio_compat_shift,
    )  # [Q, k]: candidate j compatible with best
    cand = ~compat
    cand[:, 0] = False  # the best itself never counts as second
    first_incompat = np.where(cand.any(axis=1), cand.argmax(axis=1), k - 1)
    d2 = dists[np.arange(dists.shape[0]), first_incompat]

    ratio = d1 / np.where(d2 > 0, d2, np.inf)
    return RatioMatches(
        query_idx=np.arange(len(queries), dtype=np.int64),
        db_idx=best_idx.astype(np.int64),
        ratio=ratio.astype(np.float32),
    )


@dataclasses.dataclass
class MatchResult:
    """MatchKeys outputs: inlier correspondences + similarity transform
    mapping query-set coordinates to db-set coordinates."""

    model_idx: np.ndarray  # indices into the query/model set (image 2)
    input_idx: np.ndarray  # indices into the db/input set (image 1)
    inlier: np.ndarray  # bool per match
    num_inliers: int
    transform: "object"  # SimilarityTransform (2 -> 1)


def match_keys(
    feats1: FeatureSet,
    feats2: FeatureSet,
    cfg: SiftConfig = DEFAULT_CONFIG,
    refine: bool = False,
    knn: tuple | None = None,
) -> MatchResult:
    """MatchKeys (featMatchUtilities.cpp:1027-1260): ratio-sorted matches
    capped at max_matches, then Hough similarity voting. feats2 is the
    'model' (queries), feats1 the 'input' (database), and the returned
    transform maps feats2 coordinates into feats1 space."""
    from sift3d.match.hough import hough_similarity
    from sift3d.match.register import SimilarityTransform

    rm = ratio_match(feats2, feats1, cfg, knn=knn)
    order = np.argsort(rm.ratio, kind="stable")
    order = order[: cfg.max_matches]
    model_idx = rm.query_idx[order]
    input_idx = rm.db_idx[order]

    if model_idx.shape[0] <= 3:
        return MatchResult(
            model_idx=model_idx,
            input_idx=input_idx,
            inlier=np.zeros(model_idx.shape[0], bool),
            num_inliers=int(model_idx.shape[0]),
            transform=SimilarityTransform(),
        )

    # model center parameterizes the output transform
    # (getMinMaxDim midpoint, featMatchUtilities.cpp:1150-1160)
    mn = feats2.xyz.min(axis=0)
    mx = feats2.xyz.max(axis=0)
    center0 = 0.5 * (mn + mx)

    prob = np.ones(model_idx.shape[0], np.float32)
    best = hough_similarity(
        pts0=feats2.xyz[model_idx],
        pts1=feats1.xyz[input_idx],
        s0=feats2.scale[model_idx],
        s1=feats1.scale[input_idx],
        o0=feats2.ori[model_idx],
        o1=feats1.ori[input_idx],
        prob=prob,
        cfg=cfg,
    )
    rot = best["rot"]
    scale = best["scale"]
    i = best["hypothesis"]
    # translation: transform the model center (similarity_transform_3point
    # about the winning correspondence pair)
    c0 = feats2.xyz[model_idx[i]]
    c1 = feats1.xyz[input_idx[i]]
    center1 = (rot @ (center0 - c0)) * scale + c1
    # convert rotation-about-point to rotation-about-origin translation
    trans = center1 - scale * (rot @ center0)
    ts = SimilarityTransform(scale=float(scale), rot=rot, trans=trans)

    if refine and best["inliers"].sum() >= 4:
        # weighted least-squares (Umeyama) over the Hough inliers — a
        # refinement step the reference lacks (it keeps the single winning
        # hypothesis); markedly tightens the transform on noisy data
        import jax.numpy as jnp

        from sift3d.dist.solve import solve_similarity

        inl = best["inliers"]
        n_in = int(inl.sum())
        nb = 64
        while nb < n_in:
            nb *= 2  # shape bucket: avoid a compile per inlier count
        p = np.zeros((nb, 3), np.float32)
        q = np.zeros((nb, 3), np.float32)
        w = np.zeros((nb,), np.float32)
        p[:n_in] = feats2.xyz[model_idx[inl]]
        q[:n_in] = feats1.xyz[input_idx[inl]]
        w[:n_in] = 1.0
        s, r, t = solve_similarity(jnp.asarray(p), jnp.asarray(q), jnp.asarray(w))
        ts = SimilarityTransform(
            scale=float(s), rot=np.asarray(r, np.float64), trans=np.asarray(t, np.float64)
        )

    return MatchResult(
        model_idx=model_idx,
        input_idx=input_idx,
        inlier=best["inliers"],
        num_inliers=int(best["inliers"].sum()),
        transform=ts,
    )
