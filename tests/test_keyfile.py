import numpy as np

from sift3d.core.featureset import INFO_FLAG_MIN0MAX1, INFO_FLAG_REORIENT, FeatureSet
from sift3d.io import keyfile


def _make_feats(n, rng):
    f = FeatureSet.empty(n)
    f.xyz = rng.uniform(0, 100, (n, 3)).astype(np.float32)
    f.scale = rng.uniform(1, 10, (n,)).astype(np.float32)
    f.ori = rng.standard_normal((n, 3, 3)).astype(np.float32)
    f.eigs = rng.uniform(0.5, 2.0, (n, 3)).astype(np.float32)
    f.info = rng.integers(0, 2, (n,)).astype(np.uint32) * INFO_FLAG_MIN0MAX1 + INFO_FLAG_REORIENT
    f.desc = rng.permuted(np.tile(np.arange(64, dtype=np.float32), (n, 1)), axis=1)
    return f


def test_roundtrip_text(tmp_path, rng):
    feats = _make_feats(7, rng)
    path = str(tmp_path / "test.key")
    n = keyfile.write_text(feats, path, eig_threshold=-1, comments=["hello world"])
    assert n == 7
    got, comments = keyfile.read_text(path)
    assert comments[0] == "featExtract 1.1"
    assert "hello world" in comments
    assert len(got) == 7
    # %f printing keeps 6 decimals -> 1e-5 tolerance
    np.testing.assert_allclose(got.xyz, feats.xyz, atol=1e-5)
    np.testing.assert_allclose(got.scale, feats.scale, atol=1e-5)
    np.testing.assert_allclose(got.ori, feats.ori, atol=1e-5)
    np.testing.assert_allclose(got.eigs, feats.eigs, atol=1e-5)
    np.testing.assert_array_equal(got.info, feats.info)
    np.testing.assert_array_equal(got.desc, feats.desc)  # ranks are integers


def test_header_format_exact(tmp_path, rng):
    feats = _make_feats(2, rng)
    path = str(tmp_path / "test.key")
    keyfile.write_text(feats, path, comments=["c1", "c2"])
    lines = open(path).read().splitlines()
    assert lines[0] == "# featExtract 1.1"
    assert lines[1] == "# c1"
    assert lines[2] == "# c2"
    assert lines[3] == "Features: 2"
    assert lines[4].startswith("Scale-space location[x y z scale]")
    # per-feature line: 4+9+3+1+64 = 81 tab-separated fields, trailing tab
    fields = lines[5].rstrip("\n").split("\t")
    assert fields[-1] == ""  # trailing tab like the reference
    assert len(fields) - 1 == 81


def test_eig_threshold_filter(tmp_path, rng):
    feats = _make_feats(5, rng)
    # one spherical (sum^3 < 140 prod), one edge-like
    feats.eigs[0] = (1.0, 1.0, 1.0)  # 27 < 140 -> keep
    feats.eigs[1] = (100.0, 1.0, 0.01)  # (101.01)^3 >> 140 -> drop
    path = str(tmp_path / "test.key")
    keyfile.write_text(feats, path, eig_threshold=140.0)
    got, _ = keyfile.read_text(path)
    assert len(got) < 5
    # every surviving feature satisfies the rule
    s = got.eigs.sum(axis=1)
    p = got.eigs.prod(axis=1)
    assert (s**3 < 140.0 * p).all()


def test_filters(rng):
    feats = _make_feats(10, rng)
    feats.info[:] = 0
    feats.info[3:] |= INFO_FLAG_REORIENT
    feats.info[5:] |= INFO_FLAG_MIN0MAX1
    assert len(feats.remove_non_reoriented()) == 7
    un = feats.remove_reoriented()
    assert len(un) == 3
    np.testing.assert_array_equal(un.ori, np.tile(np.eye(3, dtype=np.float32), (3, 1, 1)))
    assert len(feats.remove_non_peak()) == 5
    assert len(feats.remove_non_valley()) == 5


def test_similarity_transform_identity(rng):
    feats = _make_feats(4, rng)
    out = feats.similarity_transform(np.eye(4))
    np.testing.assert_allclose(out.xyz, feats.xyz, atol=1e-6)
    np.testing.assert_allclose(out.scale, feats.scale, atol=1e-6)
    np.testing.assert_allclose(out.ori, feats.ori, atol=1e-6)


def test_similarity_transform_scale_translate(rng):
    feats = _make_feats(4, rng)
    m = np.diag([2.0, 2.0, 2.0, 1.0])
    m[:3, 3] = [1, 2, 3]
    out = feats.similarity_transform(m)
    np.testing.assert_allclose(out.xyz, feats.xyz * 2 + np.array([1, 2, 3]), rtol=1e-5)
    np.testing.assert_allclose(out.scale, feats.scale * 2, rtol=1e-5)


def test_roundtrip_binary(tmp_path, rng):
    """Binary .key round trip (writer format msFeature3DVectorOutputBin,
    MultiScale.h:228-303; the reference has no binary reader, ours
    completes the pair)."""
    feats = _make_feats(9, rng)
    path = str(tmp_path / "test.bin.key")
    n = keyfile.write_binary(feats, path, eig_threshold=-1)
    assert n == 9
    got = keyfile.read_binary(path)
    assert len(got) == 9
    # floats are written raw -> exact round trip
    np.testing.assert_array_equal(got.xyz, feats.xyz)
    np.testing.assert_array_equal(got.scale, feats.scale)
    np.testing.assert_array_equal(got.ori, feats.ori)
    np.testing.assert_array_equal(got.eigs, feats.eigs)
    np.testing.assert_array_equal(got.info, feats.info)
    np.testing.assert_array_equal(got.desc, feats.desc)


def test_binary_eig_threshold(tmp_path, rng):
    """Eig threshold applied at binary write time (MultiScale.h:247-255)."""
    feats = _make_feats(8, rng)
    feats.eigs[:4] = np.array([1.0, 1.0, 1e-4], np.float32)  # edge-like
    path = str(tmp_path / "thr.bin.key")
    n = keyfile.write_binary(feats, path, eig_threshold=140.0)
    assert n == 4
    got = keyfile.read_binary(path)
    assert len(got) == 4
    np.testing.assert_array_equal(got.xyz, feats.xyz[4:])
