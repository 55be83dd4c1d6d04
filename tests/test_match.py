"""Matching layer: exact kNN, ratio test, Hough transform, soft votes."""

import numpy as np

import jax.numpy as jnp

from sift3d.core.config import SiftConfig
from sift3d.core.featureset import INFO_FLAG_REORIENT, FeatureSet
from sift3d.match import groupvote, hough, pairwise
from sift3d.match.knn import knn_search
from sift3d.match.register import SimilarityTransform


def _random_feats(n, rng, desc=None):
    f = FeatureSet.empty(n)
    f.xyz = rng.uniform(20, 80, (n, 3)).astype(np.float32)
    f.scale = rng.uniform(2, 6, (n,)).astype(np.float32)
    # random orthonormal orientations
    q = rng.standard_normal((n, 3, 3))
    for i in range(n):
        u, _, vt = np.linalg.svd(q[i])
        r = u @ vt
        if np.linalg.det(r) < 0:
            r[2] = -r[2]
        f.ori[i] = r
    f.eigs = rng.uniform(0.5, 1.5, (n, 3)).astype(np.float32)
    f.info[:] = INFO_FLAG_REORIENT
    f.desc = desc if desc is not None else rng.permuted(np.tile(np.arange(64.0, dtype=np.float32), (n, 1)), axis=1)
    return f


def test_knn_exact(rng):
    db = rng.standard_normal((50, 8)).astype(np.float32)
    q = rng.standard_normal((7, 8)).astype(np.float32)
    d, i = knn_search(jnp.asarray(q), jnp.asarray(db), 5)
    d, i = np.asarray(d), np.asarray(i)
    full = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    want_i = np.argsort(full, axis=1)[:, :5]
    np.testing.assert_array_equal(i, want_i)
    np.testing.assert_allclose(d, np.sort(full, axis=1)[:, :5], rtol=1e-4, atol=1e-4)


def test_ratio_match_identifies_correspondences(rng):
    db = _random_feats(30, rng)
    q = db.select(np.arange(30))  # identical copies
    q.desc = db.desc + rng.normal(0, 0.01, db.desc.shape).astype(np.float32)
    rm = pairwise.ratio_match(q, db)
    np.testing.assert_array_equal(rm.db_idx, np.arange(30))
    assert (rm.ratio < 0.5).all()


def test_hough_recovers_similarity(rng):
    n = 40
    f2 = _random_feats(n, rng)
    # known similarity: scale 1.5, rotation about z by 20 deg, translation
    th = np.deg2rad(20)
    rot = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float64)
    s = 1.5
    t = np.array([4.0, -3.0, 2.0])
    f1 = f2.select(np.arange(n))
    f1.xyz = (s * (f2.xyz @ rot.T) + t).astype(np.float32)
    f1.scale = (f2.scale * s).astype(np.float32)
    f1.ori = np.einsum("ij,njk->nik", rot, f2.ori.transpose(0, 2, 1)).transpose(0, 2, 1).astype(np.float32)

    best = hough.hough_similarity(
        pts0=f2.xyz, pts1=f1.xyz, s0=f2.scale, s1=f1.scale,
        o0=f2.ori, o1=f1.ori, prob=np.ones(n, np.float32), cfg=SiftConfig(),
    )
    assert best["inliers"].sum() >= n - 2
    np.testing.assert_allclose(best["scale"], s, rtol=0.05)
    np.testing.assert_allclose(best["rot"], rot, atol=0.05)


def test_match_keys_end_to_end(rng):
    n = 60
    f2 = _random_feats(n, rng)
    th = np.deg2rad(10)
    rot = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float64)
    s, t = 1.2, np.array([5.0, 1.0, -2.0])
    f1 = f2.select(np.arange(n))
    f1.xyz = (s * (f2.xyz @ rot.T) + t).astype(np.float32)
    f1.scale = (f2.scale * s).astype(np.float32)
    f1.ori = np.einsum("ij,njk->nik", rot, f2.ori.transpose(0, 2, 1)).transpose(0, 2, 1).astype(np.float32)
    # descriptors identical -> perfect correspondences
    res = pairwise.match_keys(f1, f2)
    assert res.num_inliers >= n - 5
    # transform maps feats2 coords to feats1 coords
    mapped = res.transform.apply(f2.xyz)
    err = np.linalg.norm(mapped - f1.xyz, axis=1)
    assert np.median(err) < 1.0


def test_similarity_transform_roundtrip(tmp_path):
    ts = SimilarityTransform(
        scale=1.7,
        rot=np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64),
        trans=np.array([1.0, 2.0, 3.0]),
    )
    path = str(tmp_path / "t.trans.txt")
    ts.write_matrix(path)
    got = SimilarityTransform.read_matrix(path)
    np.testing.assert_allclose(got.scale, ts.scale, rtol=1e-5)
    np.testing.assert_allclose(got.rot, ts.rot, atol=1e-5)
    np.testing.assert_allclose(got.trans, ts.trans, atol=1e-5)
    inv = ts.inverse()
    pts = np.array([[1.0, 2.0, 3.0], [0, 0, 0]])
    np.testing.assert_allclose(inv.apply(ts.apply(pts)), pts, atol=1e-6)
    comp = ts.compose_left(inv)
    np.testing.assert_allclose(comp.as_mat44(), np.eye(4), atol=1e-6)


def test_group_vote_prefers_duplicates(rng):
    # images 0 and 1 share descriptors; image 2 is unrelated
    base = rng.permuted(np.tile(np.arange(64.0, dtype=np.float32), (20, 1)), axis=1)
    f0 = _random_feats(20, rng, desc=base.copy())
    f1 = _random_feats(20, rng, desc=base + rng.normal(0, 0.1, base.shape).astype(np.float32))
    f2 = _random_feats(20, rng)
    gm = groupvote.GroupMatcher([f0, f1, f2])
    res = gm.match_all_to_all()
    assert res.votes.shape == (3, 3)
    # mutual votes between 0 and 1 dominate votes involving 2
    assert res.votes[0, 1] > res.votes[0, 2]
    assert res.votes[1, 0] > res.votes[1, 2]


def test_write_vote_files(tmp_path, rng):
    f0 = _random_feats(10, rng)
    f1 = _random_feats(10, rng)
    gm = groupvote.GroupMatcher([f0, f1])
    res = gm.match_all_to_all()
    vp = str(tmp_path / "matching_votes.txt")
    cp = str(tmp_path / "vote_count.txt")
    groupvote.write_vote_files(res, vp, cp, tag="Peak and Valley")
    lines = open(vp).read().splitlines()
    assert lines[0] == "Peak and Valley"
    assert len(lines[1].split("\t")[:-1]) == 2


def test_group_vote_vectorized_matches_loop_oracle(rng):
    """The vectorized SearchSelf must equal the line-by-line reference port."""
    sets = [_random_feats(15, rng) for _ in range(4)]
    # inject some cross-image descriptor similarity
    sets[1].desc[:5] = sets[0].desc[:5] + rng.normal(0, 0.05, (5, 64)).astype(np.float32)
    sets[2].desc[:3] = sets[0].desc[:3]
    gm = groupvote.GroupMatcher(sets)
    for i in range(4):
        fast = gm.search_image(i)
        slow = gm._search_image_loop(i)
        np.testing.assert_allclose(fast.votes, slow.votes, rtol=1e-10)
        np.testing.assert_array_equal(fast.counts, slow.counts)
        np.testing.assert_allclose(fast.log_likelihood, slow.log_likelihood, rtol=1e-8)


def test_group_vote_batched_all_to_all_matches_loop_oracle(rng):
    """match_all_to_all now runs ONE batched _vote_all pass over every
    image's queries (the study-scale path, VERDICT r4 #5); it must equal
    the per-image line-by-line oracle rows stacked."""
    sets = [_random_feats(12 + i, rng) for i in range(5)]
    sets[3].desc[:4] = sets[0].desc[:4]  # exact duplicates across images
    sets[4].desc[:6] = sets[1].desc[:6] + rng.normal(0, 0.05, (6, 64)).astype(np.float32)
    gm = groupvote.GroupMatcher(sets, labels=[0, 1, 1, 2, 0])
    got = gm.match_all_to_all()
    for i in range(5):
        want = gm._search_image_loop(i)
        np.testing.assert_allclose(got.votes[i], want.votes[0], rtol=1e-10)
        np.testing.assert_array_equal(got.counts[i], want.counts[0])
        np.testing.assert_allclose(got.log_likelihood[i], want.log_likelihood[0], rtol=1e-8)


def test_ratio_match_equals_sequential_oracle(rng):
    """The vectorized closed-form shuffle must EQUAL the line-level port of
    msComputeNearestNeighborDistanceRatioInfo (featMatchUtilities.cpp:
    336-421, DistSqrPCs restored). The fixture plants clusters of
    geometrically-compatible near-duplicates so every branch of the
    sequential state machine (compatible-replace, incompatible-shuffle,
    second-slot displacement, init-pair retention) fires."""
    cfg = SiftConfig()
    db = _random_feats(80, rng)
    # clusters: features 3k+1, 3k+2 are compatible near-copies of 3k
    # (same structure, slightly shifted) with near-identical descriptors
    for k in range(0, 60, 3):
        for o in (1, 2):
            db.xyz[k + o] = db.xyz[k] + rng.normal(0, 0.3, 3)
            db.scale[k + o] = db.scale[k] * np.exp(rng.normal(0, 0.05))
            db.desc[k + o] = db.desc[k] + rng.normal(0, 0.5, 64)
    q = _random_feats(50, rng)
    q.desc[:40] = db.desc[rng.integers(0, 80, 40)] + rng.normal(0, 1.0, (40, 64)).astype(np.float32)

    want = pairwise._ratio_match_sequential_oracle(q, db, cfg)
    got = pairwise.ratio_match(q, db, cfg)
    np.testing.assert_array_equal(got.db_idx, want.db_idx)
    np.testing.assert_allclose(got.ratio, want.ratio, rtol=1e-6, atol=1e-7)


def test_ratio_match_oracle_two_element_db(rng):
    """D == 2: the sequential loop never runs; min2 is the init pair's
    non-minimum regardless of compatibility."""
    cfg = SiftConfig()
    db = _random_feats(2, rng)
    db.xyz[1] = db.xyz[0] + 0.1  # compatible pair
    db.scale[1] = db.scale[0]
    q = _random_feats(5, rng)
    want = pairwise._ratio_match_sequential_oracle(q, db, cfg)
    got = pairwise.ratio_match(q, db, cfg)
    np.testing.assert_array_equal(got.db_idx, want.db_idx)
    np.testing.assert_allclose(got.ratio, want.ratio, rtol=1e-6)


def test_group_matcher_sharded_matches_unsharded(rng):
    """Mesh-sharded kNN sweep must reproduce the single-device vote matrices
    exactly (featMatchMultiple.cpp:108-117's OpenMP chunks, mesh-ified)."""
    from sift3d.dist.mesh import make_mesh

    base = rng.standard_normal((17, 64)).astype(np.float32)
    sets = [
        _random_feats(17, rng, desc=base.copy()),
        _random_feats(19, rng, desc=None),
        _random_feats(13, rng, desc=None),
    ]
    sets[1].desc[:9] = base[:9] + rng.normal(0, 0.05, (9, 64)).astype(np.float32)
    mesh = make_mesh()  # 8 simulated CPU devices; 17+19+13=49 pads to 56
    want = groupvote.GroupMatcher(sets).match_all_to_all()
    got = groupvote.GroupMatcher(sets, mesh=mesh).match_all_to_all()
    np.testing.assert_allclose(got.votes, want.votes, rtol=1e-6, atol=1e-9)
    np.testing.assert_array_equal(got.counts, want.counts)
    np.testing.assert_allclose(got.log_likelihood, want.log_likelihood, rtol=1e-6, atol=1e-9)


def test_group_matcher_empty_sets(rng):
    """Featureless images (e.g. flat volumes) must produce zero votes, not
    crash the kNN tiling."""
    sets = [FeatureSet.empty(0), _random_feats(5, rng), FeatureSet.empty(0)]
    res = groupvote.GroupMatcher(sets).match_all_to_all()
    assert res.votes.shape == (3, 3)
    assert res.counts.sum() == 0
    res2 = groupvote.GroupMatcher([FeatureSet.empty(0), FeatureSet.empty(0)]).match_all_to_all()
    assert res2.votes.sum() == 0
