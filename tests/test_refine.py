"""Least-squares refinement on top of the Hough transform."""

import numpy as np

from sift3d.core.featureset import INFO_FLAG_REORIENT, FeatureSet
from sift3d.match.pairwise import match_keys


def _feats(n, rng):
    f = FeatureSet.empty(n)
    f.xyz = rng.uniform(20, 80, (n, 3)).astype(np.float32)
    f.scale = rng.uniform(2, 6, (n,)).astype(np.float32)
    q = rng.standard_normal((n, 3, 3))
    for i in range(n):
        u, _, vt = np.linalg.svd(q[i])
        r = u @ vt
        if np.linalg.det(r) < 0:
            r[2] = -r[2]
        f.ori[i] = r
    f.info[:] = INFO_FLAG_REORIENT
    f.desc = rng.permuted(np.tile(np.arange(64.0, dtype=np.float32), (n, 1)), axis=1)
    return f


def test_refined_transform_beats_single_hypothesis(rng):
    n = 80
    f2 = _feats(n, rng)
    th = np.deg2rad(15)
    rot = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    s, t = 1.3, np.array([4.0, -2.0, 1.0])
    f1 = f2.select(np.arange(n))
    # noisy correspondence geometry
    f1.xyz = (s * (f2.xyz @ rot.T) + t + rng.normal(0, 0.3, (n, 3))).astype(np.float32)
    f1.scale = (f2.scale * s).astype(np.float32)
    f1.ori = np.einsum("ij,njk->nik", rot, f2.ori.transpose(0, 2, 1)).transpose(0, 2, 1).astype(np.float32)

    plain = match_keys(f1, f2, refine=False)
    refined = match_keys(f1, f2, refine=True)
    truth = s * (f2.xyz @ rot.T) + t
    err_plain = np.linalg.norm(plain.transform.apply(f2.xyz) - truth, axis=1).mean()
    err_ref = np.linalg.norm(refined.transform.apply(f2.xyz) - truth, axis=1).mean()
    assert refined.num_inliers > 0
    assert err_ref <= err_plain + 1e-6
    assert err_ref < 0.5
