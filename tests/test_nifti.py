import gzip

import numpy as np

from sift3d.io import nifti


def test_roundtrip_nii(tmp_path, rng):
    vol = rng.standard_normal((5, 6, 7)).astype(np.float32)
    path = str(tmp_path / "vol.nii")
    nifti.write(path, vol, voxel_size=(1.0, 1.5, 2.0))
    img = nifti.read(path)
    np.testing.assert_array_equal(np.asarray(img.data), vol)
    assert img.voxel_size == (1.0, 1.5, 2.0)
    assert img.dims_xyz == (7, 6, 5)
    # qform_code 0 -> diag pixdim matrix
    np.testing.assert_allclose(img.qto_xyz, np.diag([1.0, 1.5, 2.0, 1.0]))


def test_roundtrip_nii_gz(tmp_path, rng):
    vol = (rng.uniform(0, 255, (4, 4, 4))).astype(np.int16)
    path = str(tmp_path / "vol.nii.gz")
    nifti.write(path, vol)
    with open(path, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"  # actually gzipped
    img = nifti.read(path)
    np.testing.assert_array_equal(np.asarray(img.data), vol)


def test_qform_roundtrip(tmp_path, rng):
    vol = rng.standard_normal((4, 5, 6)).astype(np.float32)
    # rotation about z by 30 degrees, scaled by voxel sizes, with offset
    th = np.pi / 6
    rot = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    q = np.eye(4)
    q[:3, :3] = rot @ np.diag([1.0, 1.0, 2.0])
    q[:3, 3] = [-10.0, 5.0, 2.5]
    path = str(tmp_path / "vol.nii")
    nifti.write(path, vol, voxel_size=(1.0, 1.0, 2.0), qto_xyz=q)
    img = nifti.read(path)
    assert img.qform_code == 1
    np.testing.assert_allclose(img.qto_xyz, q, atol=1e-5)


def test_sform_roundtrip(tmp_path, rng):
    vol = rng.standard_normal((3, 3, 3)).astype(np.float32)
    s = np.eye(4)
    s[:3, 3] = [7.0, 8.0, 9.0]
    path = str(tmp_path / "vol.nii")
    nifti.write(path, vol, sto_xyz=s)
    img = nifti.read(path)
    assert img.sform_code == 1
    np.testing.assert_allclose(img.sto_xyz, s, atol=1e-6)


def test_datatype_conversion(tmp_path, rng):
    vol = rng.integers(0, 255, (3, 4, 5)).astype(np.uint8)
    path = str(tmp_path / "vol.nii")
    nifti.write(path, vol)
    v = nifti.read_volume(path)
    assert v.data.dtype == np.float32
    np.testing.assert_array_equal(np.asarray(v.data), vol.astype(np.float32))


def test_big_endian(tmp_path, rng):
    """Byteswapped headers must be detected via sizeof_hdr."""
    vol = rng.standard_normal((3, 4, 5)).astype(np.float32)
    path = str(tmp_path / "vol.nii")
    nifti.write(path, vol)
    raw = bytearray(open(path, "rb").read())
    # swap the header int fields we read + data
    import struct

    be = bytearray(raw)
    struct.pack_into(">i", be, 0, 348)
    struct.pack_into(">8h", be, 40, 3, 5, 4, 3, 1, 1, 1, 1)
    struct.pack_into(">2h", be, 70, 16, 32)
    struct.pack_into(">8f", be, 76, 1.0, 1.0, 1.0, 1.0, 0, 0, 0, 0)
    struct.pack_into(">f", be, 108, 352.0)
    struct.pack_into(">2h", be, 252, 0, 0)
    struct.pack_into(">6f", be, 256, 0, 0, 0, 0, 0, 0)
    be[352:] = vol.astype(">f4").tobytes()
    path2 = str(tmp_path / "volbe.nii")
    open(path2, "wb").write(bytes(be))
    img = nifti.read(path2)
    np.testing.assert_array_equal(np.asarray(img.data, dtype=np.float32), vol)


def test_hdr_img_pair(tmp_path, rng):
    """Analyze-style two-file pairs (.hdr + .img)."""
    import struct

    vol = rng.standard_normal((4, 5, 6)).astype(np.float32)
    # build from the single-file writer: header with vox_offset 0 + raw img
    single = str(tmp_path / "v.nii")
    nifti.write(single, vol)
    raw = open(single, "rb").read()
    hdr = bytearray(raw[:348])
    struct.pack_into("<f", hdr, 108, 0.0)  # vox_offset = 0 for pairs
    hdr[344:348] = b"ni1\x00"
    open(str(tmp_path / "v.hdr"), "wb").write(bytes(hdr))
    open(str(tmp_path / "v.img"), "wb").write(raw[352:])
    img = nifti.read(str(tmp_path / "v.hdr"))
    np.testing.assert_array_equal(np.asarray(img.data), vol)
