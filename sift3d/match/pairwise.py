"""Pairwise matching: NN + ratio test with geometric-compatibility shuffle.

Port of msComputeNearestNeighborDistanceRatioInfo
(feat_common/featMatchUtilities.cpp:336-421) and the match-list assembly of
MatchKeys (:1027-1136). The reference snapshot has the descriptor distance
calls commented out (SURVEY.md section 2.3 quirk 2); we implement the
*intended* behaviour — L2 over the 64 rank-ordered descriptor values
(Feature3DInfo::DistSqrPCs, MultiScale.h:60-73).

The reference walks the database sequentially per query, maintaining a
(1st, 2nd)-nearest state with geometric-compatibility shuffling. That
state machine has an exact closed form (derivation in ratio_match):

  min1 = global minimum (earliest index on ties);
  min2 = min over the "displacement events" of the scan —
    E0: the non-minimum of the first database pair (set unconditionally);
    E1: at each strict prefix-minimum transition j, the OLD minimum's
        distance, iff j is incompatible with that old minimum;
    E2: every non-record j >= 2 contributes its own distance iff j is
        incompatible with the prefix minimum current at j.

The events are all computable from prefix-minimum indices (vectorized
accumulates), so the whole shuffle runs as dense numpy over the full
Q x D squared-distance matrix — BLAS on 64-d descriptors, no device
round trips. ratio_match is asserted EQUAL to the line-level sequential
oracle (_ratio_match_sequential_oracle) in tests/test_match.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from sift3d.core.config import DEFAULT_CONFIG, SiftConfig
from sift3d.core.featureset import FeatureSet


def dist_sqr_matrix(qdesc: np.ndarray, ddesc: np.ndarray) -> np.ndarray:
    """[Q, D] squared descriptor distances (DistSqrPCs, MultiScale.h:60-73)
    via the matmul identity; clamped at 0 against cancellation."""
    q = np.asarray(qdesc, np.float32)
    d = np.asarray(ddesc, np.float32)
    out = (q * q).sum(1)[:, None] + (d * d).sum(1)[None, :] - 2.0 * (q @ d.T)
    return np.maximum(out, 0.0)


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


def _ratio_match_sequential_oracle(
    queries: FeatureSet, db: FeatureSet, cfg: SiftConfig = DEFAULT_CONFIG
) -> RatioMatches:
    """Line-level python port of msComputeNearestNeighborDistanceRatioInfo
    (featMatchUtilities.cpp:336-421) with the DistSqrPCs calls restored
    (quirk 2). Test oracle for ratio_match — O(Q*D) python, small sets only.
    """
    d = dist_sqr_matrix(queries.desc, db.desc)

    def compat(j, i):  # compatible_features(db[j], db[i]) default args
        dist = float(np.linalg.norm(db.xyz[j] - db.xyz[i]))
        sdiff = abs(float(np.log(db.scale[j] / db.scale[i])))
        return (
            sdiff < cfg.ratio_compat_log_scale
            and dist < cfg.ratio_compat_shift * float(db.scale[j])
        )

    idx_out = np.zeros(len(queries), np.int64)
    ratio_out = np.zeros(len(queries), np.float32)
    for qi in range(len(queries)):
        m1, i1 = float(d[qi, 0]), 0
        m2, i2 = float(d[qi, 1]), 1
        if m2 < m1:
            m1, m2, i1, i2 = m2, m1, 1, 0
        for j in range(2, len(db)):
            dj = float(d[qi, j])
            if dj < m2:
                if dj < m1:
                    if not compat(j, i1):
                        m2, i2 = m1, i1
                    m1, i1 = dj, j
                else:
                    if not compat(j, i1):
                        m2, i2 = dj, j
        idx_out[qi] = i1
        ratio_out[qi] = m1 / m2 if m2 > 0 else 0.0
    return RatioMatches(np.arange(len(queries), dtype=np.int64), idx_out, ratio_out)


def ratio_match(
    queries: FeatureSet,
    db: FeatureSet,
    cfg: SiftConfig = DEFAULT_CONFIG,
    dists: Optional[np.ndarray] = None,
) -> RatioMatches:
    """For each query feature, nearest db feature + squared-distance ratio,
    with the reference's geometric-compatibility shuffle reproduced EXACTLY
    (see module docstring for the closed form; the reference invariant
    min1 <= min2 makes every sequential assignment to min2 a running min,
    and the compatibility partner at step j is always the prefix minimum
    at j — both computable with vectorized accumulates).

    `dists` optionally supplies the precomputed [Q, D] squared-distance
    matrix (callers matching many query sets against one database compute
    it once, stacked)."""
    nq, nd = len(queries), len(db)
    if nd < 2 or nq == 0:
        return RatioMatches(np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.float32))
    d = dist_sqr_matrix(queries.desc, db.desc) if dists is None else dists

    rows = np.arange(nq)
    m1_idx = d.argmin(axis=1)  # earliest index on ties, like the scan
    d1 = d[rows, m1_idx]

    # prefix-minimum records: is_rec[j] iff d[j] < min(d[:j]) (strict, so
    # the init-pair tie keeping index 0 falls out naturally)
    run_min = np.minimum.accumulate(d, axis=1)
    is_rec = np.empty(d.shape, bool)
    is_rec[:, 0] = True
    is_rec[:, 1:] = d[:, 1:] < run_min[:, :-1]
    # rec_pos[j] = index of the prefix minimum over d[:j+1]
    cols = np.broadcast_to(np.arange(nd), d.shape)
    rec_pos = np.maximum.accumulate(np.where(is_rec, cols, 0), axis=1)

    # E0: the non-minimum of the first pair (assigned before any compat test)
    d2 = np.where(d[:, 1] < d[:, 0], d[:, 0], d[:, 1]).astype(d.dtype)

    if nd > 2:
        # events at j >= 2: partner = prefix minimum BEFORE j; value = the
        # displaced old minimum (record j) or j's own distance (non-record)
        partner = rec_pos[:, 1:-1]  # [Q, nd-2]
        j_cols = np.arange(2, nd)
        val = np.where(is_rec[:, 2:], d[rows[:, None], partner], d[:, 2:])
        # incompatible(db[j], db[partner]) activates the event; process in
        # query chunks to bound the [q, nd-2, 3] gather transients
        step = max(1, (1 << 22) // max(nd, 1))
        for q0 in range(0, nq, step):
            sl = slice(q0, min(q0 + step, nq))
            p = partner[sl]
            cmp_ = compatible_features_arrays(
                db.xyz[None, j_cols, :], db.scale[None, j_cols], None,
                db.xyz[p], db.scale[p], None,
                cfg.ratio_compat_log_scale, cfg.ratio_compat_shift,
            )
            ev = np.where(cmp_, np.inf, val[sl])
            d2[sl] = np.minimum(d2[sl], ev.min(axis=1))

    ratio = np.where(d2 > 0, d1 / np.where(d2 > 0, d2, 1.0), 0.0)
    return RatioMatches(
        query_idx=np.arange(nq, dtype=np.int64),
        db_idx=m1_idx.astype(np.int64),
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
    dists: Optional[np.ndarray] = None,
) -> MatchResult:
    """MatchKeys (featMatchUtilities.cpp:1027-1260): ratio-sorted matches
    capped at max_matches, then Hough similarity voting. feats2 is the
    'model' (queries), feats1 the 'input' (database), and the returned
    transform maps feats2 coordinates into feats1 space. `dists` optionally
    supplies the precomputed [len(feats2), len(feats1)] squared-distance
    matrix (star-mode callers compute one stacked matrix for all pairs)."""
    from sift3d.match.hough import hough_similarity
    from sift3d.match.register import SimilarityTransform

    rm = ratio_match(feats2, feats1, cfg, dists=dists)
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
