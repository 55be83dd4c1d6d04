"""CLI end-to-end tests on the simulated platform."""

import os

import numpy as np
import pytest

from sift3d.io import keyfile, nifti


def _blob_volume(dims=40, s=3.0, c=(20, 20, 20)):
    z, y, x = np.mgrid[0:dims, 0:dims, 0:dims].astype(np.float32)
    return np.exp(-(((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2) / (2 * s * s))).astype(
        np.float32
    )


def test_featextract_cli_voxel_coords(tmp_path, rng):
    from sift3d.cli import featextract as fe

    vol = _blob_volume() * 200 + rng.normal(0, 1, (40, 40, 40)).astype(np.float32)
    vp = str(tmp_path / "v.nii")
    nifti.write(vp, vol)
    kp = str(tmp_path / "v.key")
    assert fe.main([vp, kp]) == 0
    feats, comments = keyfile.read_text(kp)
    assert len(feats) > 0
    assert any("voxels" in c for c in comments)


def test_featextract_cli_world_coords(tmp_path, rng):
    """-w: isotropic resample + qto_xyz transform of output geometry."""
    from sift3d.cli import featextract as fe

    vol = _blob_volume() * 200
    q = np.diag([1.0, 1.0, 2.0, 1.0])  # anisotropic z
    q[:3, 3] = [-10.0, -20.0, -30.0]
    vp = str(tmp_path / "w.nii")
    nifti.write(vp, vol, voxel_size=(1.0, 1.0, 2.0), qto_xyz=q)
    kp = str(tmp_path / "w.key")
    assert fe.main(["-w", vp, kp]) == 0
    feats, comments = keyfile.read_text(kp)
    assert len(feats) > 0
    assert any("millimeters (qto_xyz)" in c for c in comments)
    # blob center voxel (20,20,20) -> world (10, 0, 10): z doubled by the
    # anisotropic spacing then offset
    un = feats.select(~feats.is_reoriented)
    d = np.linalg.norm(un.xyz - np.array([10.5, 0.5, 11.0]), axis=1)
    assert d.min() < 3.0, f"world-space blob missed: nearest {d.min():.2f} at {un.xyz[d.argmin()]}"


def test_featmatch_cli_outputs(tmp_path, rng, monkeypatch):
    from sift3d.cli import featextract as fe
    from sift3d.cli import featmatch as fm

    v1 = _blob_volume(c=(20, 20, 20)) * 200 + _blob_volume(c=(12, 26, 14), s=2.5) * 150
    v2 = np.roll(v1, 2, axis=2)
    p1, p2 = str(tmp_path / "a.nii"), str(tmp_path / "b.nii")
    nifti.write(p1, v1)
    nifti.write(p2, v2)
    k1, k2 = str(tmp_path / "a.key"), str(tmp_path / "b.key")
    assert fe.main([p1, k1]) == 0
    assert fe.main([p2, k2]) == 0

    monkeypatch.chdir(tmp_path)
    assert fm.main(["--all-to-all", k1, k2]) == 0
    for f in ["_command.txt", "_names.txt", "feature_count.txt", "report.txt",
              "report.all.txt",
              "matching_votes.txt", "vote_count.txt", f"{k2}.trans.txt",
              f"{k2}.trans-inverse.txt", f"{k2}.update.key",
              f"{k2}.matches.img1.txt", f"{k2}.matches.img2.txt",
              f"{k2}.matches.info.txt"]:
        assert os.path.exists(f), f"missing output {f}"
    # .matches.info.txt: one "info1\tinfo2" line per inlier match
    # (featMatchMultiple.cpp:301-302, 319)
    with open(f"{k2}.matches.info.txt") as f:
        info_lines = [ln.split("\t") for ln in f.read().splitlines()]
    with open(f"{k2}.matches.img1.txt") as f:
        n_matches = int(f.readlines()[2].split(":")[1])
    assert len(info_lines) == n_matches > 0
    assert all(len(p) == 2 and p[0].isdigit() and p[1].isdigit() for p in info_lines)
    # recovered transform: translation approx (-2, 0, 0)
    from sift3d.match.register import SimilarityTransform

    ts = SimilarityTransform.read_matrix(f"{k2}.trans.txt")
    np.testing.assert_allclose(ts.trans, [-2, 0, 0], atol=1.0)
    np.testing.assert_allclose(ts.scale, 1.0, rtol=0.05)


def test_featextract_cli_brief_descriptors(tmp_path, rng):
    """-b/-br/-bn switch the descriptor family (the reference documents
    these flags but hardcodes brief=0; we implement the intent,
    SURVEY.md quirk 1). BRIEF must differ from GoH on the same volume."""
    from sift3d.cli import featextract as fe

    vol = _blob_volume() * 200 + rng.normal(0, 1, (40, 40, 40)).astype(np.float32)
    vp = str(tmp_path / "b.nii")
    nifti.write(vp, vol)
    kg = str(tmp_path / "goh.key")
    kb = str(tmp_path / "brief.key")
    kr = str(tmp_path / "rrief.key")
    assert fe.main([vp, kg]) == 0
    assert fe.main(["-b", vp, kb]) == 0
    assert fe.main(["-br", vp, kr]) == 0
    fg, _ = keyfile.read_text(kg)
    fb, _ = keyfile.read_text(kb)
    fr, _ = keyfile.read_text(kr)
    # same keypoint geometry, different descriptor family
    assert len(fg) == len(fb) == len(fr)
    np.testing.assert_allclose(fb.xyz, fg.xyz, atol=1e-4)
    assert not np.allclose(fb.desc, fg.desc)
    assert not np.allclose(fr.desc, fb.desc)


def test_featextract_cli_doubled(tmp_path, rng):
    """-2+ doubles the input (fioDoubleSize semantics) and runs the blur
    chain at HIGHEST matmul precision (the round-4 fix for the
    doubled-volume false-extrema surplus); output geometry returns to
    input voxel coordinates via the 0.5 size factor
    (featExtract.cpp:422-427)."""
    from sift3d.cli import featextract as fe

    vol = _blob_volume(dims=32, c=(16, 16, 16)) * 200 + rng.normal(
        0, 1, (32, 32, 32)
    ).astype(np.float32)
    vp = str(tmp_path / "d2.nii")
    nifti.write(vp, vol)
    kp = str(tmp_path / "d2.key")
    assert fe.main(["-2+", vp, kp]) == 0
    feats, _ = keyfile.read_text(kp)
    assert len(feats) > 0
    # geometry is back in INPUT voxel space: the doubled-volume blob sits
    # at 2x the input center before the 0.5 size factor restores it
    un = feats.select(~feats.is_reoriented)
    d = np.linalg.norm(un.xyz - np.array([16.5, 16.5, 16.5]), axis=1)
    assert d.min() < 3.0, f"blob missed in input coords: {un.xyz[d.argmin()]}"


def test_featextract_cli_debug_pgm(tmp_path, rng, monkeypatch):
    """--debug-pgm writes the input mid-slice (image.pgm, reference name
    MultiScale.cpp:305-313) AND one G1 blur slice per octave
    (image_o{N}.pgm; the reference overwrites a single file at
    MultiScale.cpp:374-384 — we keep every octave)."""
    from sift3d.cli import featextract as fe
    from sift3d.pipeline.pyramid import num_octaves
    from sift3d.core.config import DEFAULT_CONFIG

    vol = _blob_volume() * 200 + rng.normal(0, 1, (40, 40, 40)).astype(np.float32)
    vp = str(tmp_path / "d.nii")
    nifti.write(vp, vol)
    monkeypatch.chdir(tmp_path)
    assert fe.main(["--debug-pgm", vp, str(tmp_path / "d.key")]) == 0
    n_oct = num_octaves((40, 40, 40), DEFAULT_CONFIG)
    assert n_oct >= 3
    for name in ["image.pgm"] + [f"image_o{i}.pgm" for i in range(n_oct)]:
        assert os.path.exists(name), f"missing {name}"
        with open(name, "rb") as f:
            header = f.read(2)
        assert header == b"P5", f"{name} is not a binary PGM"
    # octave slices shrink with the pyramid
    assert os.path.getsize("image_o1.pgm") < os.path.getsize("image_o0.pgm")


def test_featmatch_cli_geometry_weight(tmp_path, rng, monkeypatch):
    """-g W augments group-vote descriptors with W * xyz / scale (the
    67-d database of featMatchUtilities.cpp:1437-1442, 1530-1539 —
    exposed as a real flag, which the reference never parses)."""
    from sift3d.cli import featextract as fe
    from sift3d.cli import featmatch as fm

    v1 = _blob_volume(c=(20, 20, 20)) * 200 + _blob_volume(c=(12, 26, 14), s=2.5) * 150
    v2 = np.roll(v1, 2, axis=2)
    p1, p2 = str(tmp_path / "a.nii"), str(tmp_path / "b.nii")
    nifti.write(p1, v1)
    nifti.write(p2, v2)
    k1, k2 = str(tmp_path / "a.key"), str(tmp_path / "b.key")
    assert fe.main([p1, k1]) == 0
    assert fe.main([p2, k2]) == 0

    monkeypatch.chdir(tmp_path)
    assert fm.main(["--all-to-all", "-g", "0.5", k1, k2]) == 0
    votes = np.loadtxt("matching_votes.txt", skiprows=1, max_rows=2)
    assert votes.shape == (2, 2)
    # cross-image votes present: geometry augmentation must not zero them
    assert votes[0, 1] > 0 and votes[1, 0] > 0


@pytest.mark.slow
def test_featextract_cli_spatial(tmp_path, rng):
    """--spatial: the whole pipeline Z-sharded over the (simulated) mesh
    from the CLI, equal output to the standard path."""
    from sift3d.cli import featextract as fe

    import scipy.ndimage as ndi

    vol = _blob_volume() * 200 + ndi.gaussian_filter(
        rng.normal(0, 1, (40, 40, 40)), 1.5
    ).astype(np.float32) * 60
    vp = str(tmp_path / "s.nii")
    nifti.write(vp, vol)
    k_std, k_sp = str(tmp_path / "std.key"), str(tmp_path / "sp.key")
    assert fe.main([vp, k_std]) == 0
    # force real sharding of the first octave (the auto heuristic would
    # keep a 40^3 volume single-device)
    assert fe.main(["--spatial-octaves=1", vp, k_sp]) == 0
    a, _ = keyfile.read_text(k_std)
    b, _ = keyfile.read_text(k_sp)
    assert len(a) == len(b)
    # sub-voxel agreement: sharded vs single-device refine differ only in
    # fp reduction order (near-flat quadratic vertices amplify last-ulp
    # DoG differences into ~1e-3 voxel)
    np.testing.assert_allclose(b.xyz, a.xyz, rtol=1e-4, atol=5e-3)
    np.testing.assert_array_equal(b.info, a.info)
