"""Distribution layer on the simulated 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sift3d.core.config import SiftConfig
from sift3d.dist import batch as dbatch
from sift3d.dist import gather as dgather
from sift3d.dist import halo as dhalo
from sift3d.dist import mesh as dmesh
from sift3d.dist import solve as dsolve
from sift3d.kernels import gauss


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must simulate 8 CPU devices"
    return dmesh.make_mesh(batch=8, space=1)


@pytest.fixture(scope="module")
def mesh_space():
    return dmesh.make_mesh(batch=1, space=8)


def test_halo_blur_matches_single_device(rng, mesh_space):
    vol = rng.standard_normal((32, 12, 16)).astype(np.float32)
    want = np.asarray(gauss.blur3d(jnp.asarray(vol), 1.6, 0.01))
    sharded = dhalo.shard_volume(jnp.asarray(vol), mesh_space)
    got = np.asarray(dhalo.blur3d_sharded(sharded, 1.6, mesh_space))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_halo_blur_large_radius(rng, mesh_space):
    """Radius > shard depth exercises multi-plane halos."""
    vol = rng.standard_normal((32, 8, 8)).astype(np.float32)
    sigma = 1.2  # radius 4 vs shard depth 4
    want = np.asarray(gauss.blur3d(jnp.asarray(vol), sigma, 0.01))
    sharded = dhalo.shard_volume(jnp.asarray(vol), mesh_space)
    got = np.asarray(dhalo.blur3d_sharded(sharded, sigma, mesh_space))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_batch_octave_step_sharded(rng, mesh8):
    cfg = SiftConfig()
    vols = rng.standard_normal((8, 12, 12, 12)).astype(np.float32)
    from jax.sharding import NamedSharding, PartitionSpec as P

    vb = jax.device_put(jnp.asarray(vols), NamedSharding(mesh8, P("batch", None, None, None)))
    bases = dbatch.initial_blur_batch(vb, cfg)
    res = dbatch.octave_step_batch(bases, cfg)
    assert res.gstack.shape == (8, 6, 12, 12, 12)
    # matches per-volume single-device result
    from sift3d.pipeline.pyramid import initial_blur, octave_step

    want = octave_step(initial_blur(jnp.asarray(vols[3]), cfg), cfg)
    np.testing.assert_allclose(np.asarray(res.dogs[3]), np.asarray(want.dogs), rtol=1e-4, atol=1e-5)


def test_extract_features_batch_matches_single_device(rng, mesh8):
    """END-TO-END multi-chip DP: 8 volumes extracted on 8 devices (one
    volume pinned per device, full pipeline local) must equal the
    single-device extraction of the same volumes."""
    import scipy.ndimage as ndi

    from sift3d.pipeline.extract import extract_features_many

    cfg = SiftConfig(feature_chunk=128)
    vols = []
    for b in range(8):
        v = rng.standard_normal((24, 24, 24)).astype(np.float32)
        vols.append(ndi.gaussian_filter(v, 1.8).astype(np.float32) * 120)

    want = extract_features_many(vols, cfg)
    got = dbatch.extract_features_batch(vols, mesh8, cfg)

    assert sum(len(f) for f in want) > 0, "fixture produced no features"
    for b in range(8):
        assert len(got[b]) == len(want[b]), f"volume {b} feature count"
        np.testing.assert_allclose(got[b].xyz, want[b].xyz, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got[b].scale, want[b].scale, rtol=1e-5)
        np.testing.assert_array_equal(got[b].info, want[b].info)
        np.testing.assert_allclose(got[b].desc, want[b].desc, atol=1.0)
        np.testing.assert_allclose(got[b].ori, want[b].ori, rtol=1e-4, atol=1e-5)


def test_sharded_knn_matches_local(rng, mesh8):
    db = rng.standard_normal((64, 16)).astype(np.float32)
    q = rng.standard_normal((32, 16)).astype(np.float32)  # 32 divisible by 8
    d, i = dgather.sharded_knn(jnp.asarray(q), jnp.asarray(db), 4, mesh8)
    full = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(i, np.argsort(full, axis=1)[:, :4])


def test_gather_keypoint_sets(rng, mesh8):
    desc = rng.standard_normal((8, 5, 16)).astype(np.float32)
    from jax.sharding import NamedSharding, PartitionSpec as P

    local = jax.device_put(jnp.asarray(desc), NamedSharding(mesh8, P("batch", None, None)))
    full = np.asarray(dgather.gather_keypoint_sets(local, mesh8))
    np.testing.assert_allclose(full, desc.reshape(40, 16), rtol=1e-6)


def test_solve_similarity(rng):
    n = 200
    p = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    th = 0.4
    rot = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    s, t = 1.8, np.array([3.0, -1.0, 5.0])
    q = (s * p @ rot.T + t + rng.normal(0, 0.01, (n, 3))).astype(np.float32)
    w = np.ones(n, np.float32)
    gs, gr, gt = dsolve.solve_similarity(jnp.asarray(p), jnp.asarray(q), jnp.asarray(w))
    np.testing.assert_allclose(float(gs), s, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(gr), rot, atol=5e-3)
    np.testing.assert_allclose(np.asarray(gt), t, atol=0.05)


def test_solve_similarity_sharded_matches(rng, mesh8):
    n = 80
    p = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    q = (2.0 * p + np.array([1.0, 2.0, 3.0])).astype(np.float32)
    w = rng.uniform(0.5, 1.5, n).astype(np.float32)
    s, r, t = dsolve.solve_similarity_sharded(p, q, w, mesh8)
    np.testing.assert_allclose(s, 2.0, rtol=1e-4)
    np.testing.assert_allclose(r, np.eye(3), atol=1e-4)
    np.testing.assert_allclose(t, [1, 2, 3], atol=1e-3)


def test_spatial_octave_matches_single_device(rng, mesh_space):
    """Z-sharded pyramid octave (halo blur + sharded extrema) vs local."""
    import scipy.ndimage as ndi

    from sift3d.dist import spatial as dspatial
    from sift3d.pipeline.pyramid import initial_blur, octave_step

    cfg = SiftConfig()
    vol = rng.standard_normal((32, 16, 16)).astype(np.float32)
    vol = ndi.gaussian_filter(vol, 1.5).astype(np.float32) * 50

    want = octave_step(initial_blur(jnp.asarray(vol), cfg), cfg)

    sharded = dhalo.shard_volume(jnp.asarray(vol), mesh_space)
    base = dspatial.initial_blur_spatial(sharded, cfg, mesh_space)
    got = dspatial.octave_step_spatial(base, cfg, mesh_space)

    np.testing.assert_allclose(np.asarray(got.gstack), np.asarray(want.gstack), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.dogs), np.asarray(want.dogs), rtol=2e-3, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(want.mask))
    np.testing.assert_allclose(np.asarray(got.next_base), np.asarray(want.next_base), rtol=2e-4, atol=2e-5)
