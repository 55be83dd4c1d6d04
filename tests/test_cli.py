"""CLI end-to-end tests on the simulated platform."""

import os

import numpy as np

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
              "matching_votes.txt", "vote_count.txt", f"{k2}.trans.txt",
              f"{k2}.trans-inverse.txt", f"{k2}.update.key"]:
        assert os.path.exists(f), f"missing output {f}"
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
