import itertools

import numpy as np

import jax.numpy as jnp

from sift3d.kernels import extrema


def _np_strict_extrema(dogs):
    """Dense python oracle: strict 80-neighbor extrema, interior only."""
    num_levels, z, y, x = dogs.shape
    out = np.zeros((num_levels - 2, z, y, x), dtype=np.int8)
    for c in range(1, num_levels - 1):
        for zz in range(1, z - 1):
            for yy in range(1, y - 1):
                for xx in range(1, x - 1):
                    v = dogs[c, zz, yy, xx]
                    gt = lt = True
                    for dl, dz, dy, dx in itertools.product((-1, 0, 1), repeat=4):
                        if dl == 0 and dz == 0 and dy == 0 and dx == 0:
                            continue
                        n = dogs[c + dl, zz + dz, yy + dy, xx + dx]
                        gt &= v > n
                        lt &= v < n
                    out[c - 1, zz, yy, xx] = 1 if gt else (-1 if lt else 0)
    return out


def test_extrema_mask_matches_dense_oracle(rng):
    dogs = rng.standard_normal((5, 7, 8, 9)).astype(np.float32)
    got = np.asarray(extrema.extrema_mask(jnp.asarray(dogs)))
    want = _np_strict_extrema(dogs)
    np.testing.assert_array_equal(got, want)


def test_extrema_single_peak():
    dogs = np.zeros((3, 5, 5, 5), dtype=np.float32)
    dogs[1, 2, 2, 2] = 1.0
    got = np.asarray(extrema.extrema_mask(jnp.asarray(dogs)))
    assert got[0, 2, 2, 2] == 1
    assert (got == 1).sum() == 1
    dogs[1, 2, 2, 2] = -1.0
    got = np.asarray(extrema.extrema_mask(jnp.asarray(dogs)))
    assert got[0, 2, 2, 2] == -1


def test_extrema_plateau_rejected():
    """Ties must not count as extrema (strict comparisons)."""
    dogs = np.zeros((3, 5, 5, 5), dtype=np.float32)
    dogs[1, 2, 2, 2] = 1.0
    dogs[1, 2, 2, 3] = 1.0
    got = np.asarray(extrema.extrema_mask(jnp.asarray(dogs)))
    assert (got != 0).sum() == 0


def test_quadratic_interp():
    # symmetric parabola peak at 2.0
    x = extrema.quadratic_interp_1d(jnp.float32(1.0), jnp.float32(2.0), jnp.float32(1.0), 1.0, 2.0, 3.0)
    np.testing.assert_allclose(float(x), 2.0, rtol=1e-6)
    # f(x) = -(x-2.25)^2 sampled at 1, 2, 3
    def f(v):
        return -((v - 2.25) ** 2)

    x = extrema.quadratic_interp_1d(jnp.float32(f(1)), jnp.float32(f(2)), jnp.float32(f(3)), 1.0, 2.0, 3.0)
    np.testing.assert_allclose(float(x), 2.25, rtol=1e-5)
    # degenerate (flat) returns center
    x = extrema.quadratic_interp_1d(jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0), 1.0, 2.0, 3.0)
    np.testing.assert_allclose(float(x), 2.0)


def test_pallas_extrema_matches_lax_interpret(rng):
    """Pallas separable max/min kernel (interpret mode) vs the lax stencil."""
    import scipy.ndimage as ndi

    from sift3d.kernels.extrema_pallas import extrema_mask_pallas

    d = rng.standard_normal((5, 12, 20, 36)).astype(np.float32)
    d = np.stack([ndi.gaussian_filter(x, 1.5) for x in d]).astype(np.float32)
    want = np.asarray(extrema.extrema_mask(jnp.asarray(d)))
    got = np.asarray(extrema_mask_pallas(jnp.asarray(d), interpret=True))
    np.testing.assert_array_equal(got, want)
    assert (want != 0).sum() > 0


def test_pallas_dogs_extrema_matches_lax_interpret(rng):
    """Fused Gaussian-slab DoG + extrema kernel (interpret mode) vs the
    XLA subtract + lax stencil, batched, odd Z (padding tail) included."""
    import scipy.ndimage as ndi

    from sift3d.kernels.extrema_pallas import dogs_extrema_pallas

    for shape in ((6, 12, 20, 36), (2, 6, 13, 20, 36), (6, 5, 9, 17)):
        g = rng.standard_normal(shape).astype(np.float32)
        g = np.stack(
            [ndi.gaussian_filter(x, 1.5) for x in g.reshape((-1,) + shape[-3:])]
        ).reshape(shape).astype(np.float32)
        want_dogs = g[..., :-1, :, :, :] - g[..., 1:, :, :, :]
        if g.ndim == 5:
            want_mask = np.stack(
                [np.asarray(extrema.extrema_mask(jnp.asarray(d))) for d in want_dogs]
            )
        else:
            want_mask = np.asarray(extrema.extrema_mask(jnp.asarray(want_dogs)))
        dogs, mask = dogs_extrema_pallas(jnp.asarray(g), interpret=True)
        np.testing.assert_array_equal(np.asarray(dogs), want_dogs)
        np.testing.assert_array_equal(np.asarray(mask), want_mask)


def test_pallas_dogs_extrema_tz1_matches_lax_interpret(rng):
    """tz=1 slab height (picked for plane sizes near the VMEM budget, e.g.
    256^3 volumes) must stay bit-identical to the lax stencil."""
    import scipy.ndimage as ndi

    from sift3d.kernels import extrema_pallas as ep

    assert ep.fused_extrema_tz(256, 256, 256) == 1
    assert ep.fused_extrema_tz(384, 384, 384) is None

    shape = (6, 3, 9, 17)  # z=3 -> fused_extrema_tz picks tz=1
    assert ep.fused_extrema_tz(*shape[1:]) == 1
    g = rng.standard_normal(shape).astype(np.float32)
    g = np.stack(
        [ndi.gaussian_filter(x, 1.5) for x in g]
    ).astype(np.float32)
    want_dogs = g[:-1] - g[1:]
    want_mask = np.asarray(extrema.extrema_mask(jnp.asarray(want_dogs)))
    dogs, mask = ep.dogs_extrema_pallas(jnp.asarray(g), interpret=True)
    np.testing.assert_array_equal(np.asarray(dogs), want_dogs)
    np.testing.assert_array_equal(np.asarray(mask), want_mask)
