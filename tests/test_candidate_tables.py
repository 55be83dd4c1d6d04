"""Device-built candidate tables vs the legacy host decode path.

_phase15_tables_program builds the packed [N, 6] candidate table on
device; the legacy path (kept as the group-overflow fallback) downloads
exact candidates and packs them with numpy. Both must produce the SAME
table — same rows, same (volume, level, valleys-then-peaks, scan) order —
and therefore bit-identical features.
"""

import numpy as np
import pytest

import sift3d.pipeline.extract as ex
from sift3d.core.config import SiftConfig


def _volumes(seed=11, n=3, dims=(52, 44, 48)):
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[0 : dims[0], 0 : dims[1], 0 : dims[2]].astype(np.float32)
    vols = []
    for v in range(n):
        vol = np.zeros(dims, np.float32)
        for _ in range(12 + 2 * v):
            bc = rng.uniform(6, min(dims) - 6, 3)
            s = rng.uniform(2.0, 4.5)
            a = rng.uniform(-220, 260)
            vol += a * np.exp(
                -(((z - bc[0]) ** 2 + (y - bc[1]) ** 2 + (x - bc[2]) ** 2) / (2 * s * s))
            )
        vols.append(vol)
    return vols


@pytest.fixture()
def force_legacy():
    ex._FORCE_LEGACY_CANDIDATES = True
    yield
    ex._FORCE_LEGACY_CANDIDATES = False


def _capture_tables(vols, cfg):
    captured = []
    orig = ex._phase2a_program

    def spy(stacks, cand_all, *a, **k):
        captured.append(np.asarray(cand_all))
        return orig(stacks, cand_all, *a, **k)

    ex._phase2a_program = spy
    try:
        feats = ex.extract_features_many(vols, cfg)
    finally:
        ex._phase2a_program = orig
    return captured[-1], feats


def test_device_tables_match_legacy_decode(force_legacy):
    cfg = SiftConfig(feature_chunk=256)
    vols = _volumes()

    legacy_table, legacy_feats = _capture_tables(vols, cfg)
    ex._FORCE_LEGACY_CANDIDATES = False
    device_table, device_feats = _capture_tables(vols, cfg)

    np.testing.assert_array_equal(device_table, legacy_table)
    assert [len(f) for f in device_feats] == [len(f) for f in legacy_feats]
    for fd, fl in zip(device_feats, legacy_feats):
        np.testing.assert_array_equal(fd.xyz, fl.xyz)
        np.testing.assert_array_equal(fd.scale, fl.scale)
        np.testing.assert_array_equal(fd.ori, fl.ori)
        np.testing.assert_array_equal(fd.desc, fl.desc)
        np.testing.assert_array_equal(fd.info, fl.info)


def test_device_tables_mixed_shapes():
    """Two shape groups + an empty-ish volume exercise the per-group
    octave bookkeeping (cc_dev slicing, per-oi skip)."""
    cfg = SiftConfig(feature_chunk=256)
    vols = _volumes(n=2)
    vols.append(np.zeros((40, 40, 40), np.float32))  # featureless, 2nd group

    feats = ex.extract_features_many(vols, cfg)
    assert len(feats) == 3
    assert len(feats[0]) > 0 and len(feats[1]) > 0
    assert len(feats[2]) == 0
