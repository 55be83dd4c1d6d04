import numpy as np

import jax.numpy as jnp

from sift3d.kernels import resample


def test_subsample_2x_eight_mean(rng):
    vol = rng.standard_normal((8, 10, 12)).astype(np.float32)
    got = np.asarray(resample.subsample_2x(jnp.asarray(vol)))
    assert got.shape == (4, 5, 6)
    want = vol.reshape(4, 2, 5, 2, 6, 2).mean(axis=(1, 3, 5))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_double_size_semantics():
    vol = np.arange(2 * 2 * 2, dtype=np.float32).reshape(2, 2, 2)
    got = np.asarray(resample.double_size(jnp.asarray(vol)))
    assert got.shape == (4, 4, 4)
    # even samples are copies
    np.testing.assert_allclose(got[::2, ::2, ::2], vol)
    # odd in x = average of x neighbors
    np.testing.assert_allclose(got[0, 0, 1], 0.5 * (vol[0, 0, 0] + vol[0, 0, 1]))
    # edge clamp: last odd duplicates
    np.testing.assert_allclose(got[0, 0, 3], vol[0, 0, 1])
    # fully odd voxel = mean of 8 (interior)
    np.testing.assert_allclose(got[1, 1, 1], vol[:2, :2, :2].mean())


def test_trilinear_sample_voxel_centers(rng):
    vol = rng.standard_normal((5, 6, 7)).astype(np.float32)
    # at voxel centers (i + 0.5) the sample equals the voxel value
    x, y, z = 3, 2, 1
    got = resample.trilinear_sample(jnp.asarray(vol), jnp.float32(x + 0.5), jnp.float32(y + 0.5), jnp.float32(z + 0.5))
    np.testing.assert_allclose(float(got), vol[z, y, x], rtol=1e-6)
    # midway between two voxel centers in x: average
    got = resample.trilinear_sample(jnp.asarray(vol), jnp.float32(x + 1.0), jnp.float32(y + 0.5), jnp.float32(z + 0.5))
    np.testing.assert_allclose(float(got), 0.5 * (vol[z, y, x] + vol[z, y, x + 1]), rtol=1e-6)


def test_trilinear_sample_clamps_at_borders(rng):
    vol = rng.standard_normal((4, 4, 4)).astype(np.float32)
    lo = resample.trilinear_sample(jnp.asarray(vol), jnp.float32(0.1), jnp.float32(0.5), jnp.float32(0.5))
    np.testing.assert_allclose(float(lo), vol[0, 0, 0], rtol=1e-6)
    hi = resample.trilinear_sample(jnp.asarray(vol), jnp.float32(3.9), jnp.float32(0.5), jnp.float32(0.5))
    np.testing.assert_allclose(float(hi), vol[0, 0, 3], rtol=1e-6)


def test_splat_weights_sum_to_one(rng):
    x = jnp.asarray(rng.uniform(0.5, 6.5, size=(10,)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0.5, 6.5, size=(10,)).astype(np.float32))
    z = jnp.asarray(rng.uniform(0.5, 6.5, size=(10,)).astype(np.float32))
    iz, iy, ix, w = resample.trilinear_splat_weights(x, y, z, (8, 8, 8))
    np.testing.assert_allclose(np.asarray(w.sum(axis=-1)), 1.0, rtol=1e-5)
    assert int(iz.max()) < 8 and int(iy.max()) < 8 and int(ix.max()) < 8


def test_splat_then_sample_roundtrip(rng):
    """Splatting a delta then sampling at the same point is consistent."""
    dims = (9, 9, 9)
    pt = (4.3, 5.1, 3.7)  # x, y, z
    iz, iy, ix, w = resample.trilinear_splat_weights(
        jnp.float32(pt[0]), jnp.float32(pt[1]), jnp.float32(pt[2]), dims
    )
    grid = jnp.zeros(dims).at[iz, iy, ix].add(w)
    # total mass preserved
    np.testing.assert_allclose(float(grid.sum()), 1.0, rtol=1e-6)


def test_isotropic_resample_identity_for_isotropic(rng):
    vol = rng.standard_normal((6, 6, 6)).astype(np.float32)
    out, dmin = resample.isotropic_resample(jnp.asarray(vol), (1.0, 1.0, 1.0))
    assert dmin == 1.0
    np.testing.assert_allclose(np.asarray(out), vol, rtol=1e-6)


def test_isotropic_resample_upscales_coarse_axis(rng):
    vol = rng.standard_normal((4, 8, 8)).astype(np.float32)
    out, dmin = resample.isotropic_resample(jnp.asarray(vol), (1.0, 1.0, 2.0))
    assert dmin == 1.0
    assert out.shape == (8, 8, 8)


def test_subsample_2x_mxu_matches_reshape_mean(rng):
    """The TPU matmul formulation must agree with the 8-mean to fp32
    reassociation tolerance (it is the octave base on TPU)."""
    vol = jnp.asarray(rng.standard_normal((2, 34, 36, 38)).astype(np.float32) * 90)
    a = np.asarray(resample.subsample_2x(vol, mxu=True))
    b = np.asarray(resample.subsample_2x(vol, mxu=False))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-4)


def _sub_sample_2d_center_pixel_oracle(vol):
    """Line-level numpy port of fioSubSample2DCenterPixel
    (FeatureIO.cpp:1671-1714): out dims = in dims // 2, each output voxel
    the mean of its 2x2x2 children (the reference indexes 2x/2x+1 with no
    bounds check; for out = in//2 every read is in range)."""
    zo, yo, xo = (d // 2 for d in vol.shape)
    out = np.zeros((zo, yo, xo), np.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                out += vol[dz : 2 * zo : 2, dy : 2 * yo : 2, dx : 2 * xo : 2]
    return out / 8.0


def test_subsample_2x_matches_center_pixel_oracle(rng):
    """The -2- CLI path uses subsample_2x; prove it IS the reference's
    fioSubSample2DCenterPixel for 3D volumes, including odd dims (trailing
    odd voxels dropped by the floor-halved output dims in both)."""
    for shape in ((8, 10, 12), (9, 11, 13), (7, 8, 9)):
        vol = rng.standard_normal(shape).astype(np.float32)
        want = _sub_sample_2d_center_pixel_oracle(vol)
        got = np.asarray(resample.subsample_2x(jnp.asarray(vol)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
