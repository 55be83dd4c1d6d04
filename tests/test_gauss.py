"""Blur kernels vs pure-numpy/scipy references.

The oracle strategy follows SURVEY.md section 4: each device kernel is
validated against an independent dense implementation on small random
volumes, with the reference's exact truncation rule and zero borders.
"""

import numpy as np
import pytest
import scipy.ndimage

import jax.numpy as jnp

from sift3d.kernels import gauss


def _np_blur_zero_borders(vol, sigma, min_value):
    """Direct correlation with the reference's truncated kernel, zero-padded."""
    taps = gauss.gaussian_kernel_1d(sigma, min_value)
    r = len(taps) // 2
    out = vol.astype(np.float64)
    for axis in range(3):
        out = scipy.ndimage.correlate1d(out, taps.astype(np.float64), axis=axis, mode="constant", cval=0.0)
    return out


def test_filter_size_rule_known_values():
    # sigma=0 -> delta
    assert gauss.gaussian_filter_size(0.0, 0.01) == 1
    # Sizes must be odd and grow with sigma
    last = 1
    for sigma in [0.5, 0.95, 1.0, 1.6, 2.0, 3.1]:
        size = gauss.gaussian_filter_size(sigma, 0.01)
        assert size % 2 == 1
        assert size >= last
        last = size
    # The truncated tail must hold <= min_value of the mass (rule's intent)
    for sigma in [0.8, 1.6, 2.54]:
        size = gauss.gaussian_filter_size(sigma, 0.01)
        r = size // 2
        i = np.arange(-10 * int(sigma + 1), 10 * int(sigma + 1) + 1)
        mass = np.exp(-(i**2) / (2 * sigma**2))
        tail = mass[np.abs(i) > r].sum() / mass.sum()
        assert tail <= 0.011


def test_kernel_normalized():
    for sigma in [0.5, 1.3, 2.9]:
        taps = gauss.gaussian_kernel_1d(sigma, 0.01)
        np.testing.assert_allclose(taps.sum(), 1.0, rtol=1e-6)
        assert taps.dtype == np.float32


@pytest.mark.parametrize("sigma", [0.6, 1.357, 2.9])
def test_blur3d_matches_dense_reference(rng, sigma):
    vol = rng.standard_normal((12, 17, 23)).astype(np.float32)
    got = np.asarray(gauss.blur3d(jnp.asarray(vol), sigma, 0.01))
    want = _np_blur_zero_borders(vol, sigma, 0.01)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_blur3d_zero_sigma_identity(rng):
    vol = rng.standard_normal((6, 7, 8)).astype(np.float32)
    got = np.asarray(gauss.blur3d(jnp.asarray(vol), 0.0, 0.01))
    np.testing.assert_array_equal(got, vol)


def test_blur_batched_matches_single(rng):
    vols = rng.standard_normal((3, 11, 11, 11)).astype(np.float32)
    got = np.asarray(gauss.blur3d_batched(jnp.asarray(vols), 0.5, 0.01))
    for i in range(3):
        want = np.asarray(gauss.blur3d(jnp.asarray(vols[i]), 0.5, 0.01))
        np.testing.assert_allclose(got[i], want, rtol=1e-6, atol=1e-7)


def test_pallas_blur_matches_banded_interpret(rng):
    """Pallas fused blur (interpret mode) vs the banded-matmul reference."""
    import jax.numpy as jnp

    from sift3d.kernels.gauss_pallas import blur3d_pallas

    vol = rng.standard_normal((9, 14, 21)).astype(np.float32)
    for sigma in (0.8, 2.45):
        want = np.asarray(gauss.blur3d(jnp.asarray(vol), sigma, 0.01))
        got = np.asarray(blur3d_pallas(jnp.asarray(vol), sigma, 0.01, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
