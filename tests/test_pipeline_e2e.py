"""End-to-end extraction on synthetic volumes.

Oracle strategy (SURVEY.md section 4): synthetic volumes with known
structure (Gaussian blobs) must yield features at the blob locations with
scales proportional to blob size, and the pipeline must be equivariant
under axis flips/shifts within tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sift3d.core.config import SiftConfig
from sift3d.pipeline.extract import extract_features
from sift3d.pipeline.pyramid import initial_blur, num_octaves, octave_step


def _blob_volume(dims=(48, 48, 48), blobs=(((24, 24, 24), 3.0, 1.0),)):
    """Sum of Gaussian blobs: ((x, y, z), sigma, amplitude)."""
    z, y, x = np.mgrid[0 : dims[0], 0 : dims[1], 0 : dims[2]].astype(np.float32)
    vol = np.zeros(dims, np.float32)
    for (bx, by, bz), s, a in blobs:
        vol += a * np.exp(-(((x - bx) ** 2 + (y - by) ** 2 + (z - bz) ** 2) / (2 * s * s)))
    return vol


@pytest.fixture(scope="module")
def cfg():
    return SiftConfig(feature_chunk=256)


def test_octave_step_shapes(cfg):
    vol = jnp.zeros((16, 20, 24), jnp.float32)
    res = octave_step(initial_blur(vol, cfg), cfg)
    assert res.gstack.shape == (6, 16, 20, 24)
    assert res.dogs.shape == (5, 16, 20, 24)
    assert res.mask.shape == (3, 16, 20, 24)
    assert res.next_base.shape == (8, 10, 12)


def test_num_octaves():
    assert num_octaves((48, 48, 48), SiftConfig()) == 5  # 48,24,12,6,3 (2 stops)
    assert num_octaves((2, 48, 48), SiftConfig()) == 0


def test_extract_single_blob(cfg):
    vol = _blob_volume()
    feats = extract_features(vol, cfg)
    assert len(feats) > 0
    # the strongest (peak) feature should sit at the blob center
    peaks = feats.select(feats.is_peak & ~feats.is_reoriented)
    assert len(peaks) > 0
    d = np.linalg.norm(peaks.xyz - np.array([24.5, 24.5, 24.5]), axis=1)
    assert d.min() < 1.5, f"no peak near blob center, nearest {d.min()}"
    near = peaks.select(d < 1.5)
    # DoG response of a blob of sigma s peaks at feature scale ~ 2s
    # (scale = 2x interpolated sigma); allow a broad band
    assert (near.scale > 3.0).any() and (near.scale < 12.0).all()


def test_extract_multi_blob_counts(cfg):
    # blob sigmas must be >= ~2.5: the scale-space extremum of a sigma-2
    # blob falls below the first detectable DoG center level (sigma 2.02),
    # a blind spot shared with the reference (that is what -2+ is for)
    blobs = (
        ((12, 12, 12), 2.6, 1.0),
        ((34, 30, 14), 3.0, 0.8),
        ((20, 34, 34), 2.5, -0.9),  # dark blob -> valley feature
    )
    vol = _blob_volume((48, 48, 48), blobs)
    feats = extract_features(vol, SiftConfig(feature_chunk=256))
    un = feats.select(~feats.is_reoriented)
    assert len(un) >= 3
    for (bx, by, bz), s, a in blobs:
        d = np.linalg.norm(un.xyz - np.array([bx + 0.5, by + 0.5, bz + 0.5]), axis=1)
        i = d.argmin()
        assert d[i] < 2.0, f"blob at {(bx,by,bz)} missed (nearest {d[i]:.2f})"
        want_peak = a > 0
        assert bool(un.info[i] & 0x10) == want_peak


def test_extract_translation_covariance(cfg):
    """Shifting the volume shifts the features (repeatability harness)."""
    blobs = (((20, 22, 18), 2.5, 1.0),)
    v1 = _blob_volume((44, 44, 44), blobs)
    shift = 4
    blobs2 = (((20 + shift, 22, 18), 2.5, 1.0),)
    v2 = _blob_volume((44, 44, 44), blobs2)
    f1 = extract_features(v1, cfg).select(lambda s: slice(None)) if False else extract_features(v1, cfg)
    f2 = extract_features(v2, cfg)
    u1 = f1.select(~f1.is_reoriented)
    u2 = f2.select(~f2.is_reoriented)
    # strongest feature near each blob should shift by `shift` in x
    d1 = np.linalg.norm(u1.xyz - np.array([20.5, 22.5, 18.5]), axis=1)
    d2 = np.linalg.norm(u2.xyz - np.array([24.5, 22.5, 18.5]), axis=1)
    assert d1.min() < 1.0 and d2.min() < 1.0
    p1 = u1.xyz[d1.argmin()]
    p2 = u2.xyz[d2.argmin()]
    np.testing.assert_allclose(p2 - p1, [shift, 0, 0], atol=0.75)


def test_descriptors_are_ranks(cfg):
    vol = _blob_volume((40, 40, 40), (((20, 20, 20), 2.5, 1.0), ((10, 28, 12), 2.0, 0.7)))
    feats = extract_features(vol, cfg)
    assert len(feats) > 0
    # rank-normalized descriptors are permutations of 0..63
    for i in range(min(5, len(feats))):
        np.testing.assert_array_equal(np.sort(feats.desc[i]), np.arange(64))


@pytest.mark.slow
def test_extract_many_union_matches_single(cfg):
    """A same-shape batch (ONE union program per octave) must produce
    byte-identical features, in the same order, as per-volume extraction;
    mixed shapes must group correctly."""
    from sift3d.pipeline.extract import extract_features_many

    rng = np.random.default_rng(3)
    v1 = _blob_volume(blobs=(((24, 24, 24), 3.0, 1.0), ((12, 34, 20), 2.2, -0.8)))
    v2 = _blob_volume(blobs=(((30, 14, 26), 2.6, 1.2), ((20, 20, 36), 3.4, 0.9)))
    v3 = _blob_volume(dims=(40, 44, 40), blobs=(((20, 22, 20), 3.0, 1.0),))
    v1 += 0.01 * rng.standard_normal(v1.shape).astype(np.float32)
    v2 += 0.01 * rng.standard_normal(v2.shape).astype(np.float32)

    singles = [extract_features(v, cfg) for v in (v1, v2, v3)]
    many = extract_features_many([v1, v2, v3], cfg)
    for got, want in zip(many, singles):
        assert len(got) == len(want)
        np.testing.assert_allclose(got.xyz, want.xyz, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got.scale, want.scale, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(got.info, want.info)
        np.testing.assert_allclose(got.ori, want.ori, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(got.desc, want.desc)


@pytest.mark.slow
def test_extract_stream_matches_many(cfg):
    """The double-buffered thread-pipelined stream must return the same
    features, in input order, as sequential batch extraction."""
    from sift3d.pipeline.extract import extract_features_many, extract_features_stream

    rng = np.random.default_rng(11)
    vols = []
    for i in range(6):
        v = _blob_volume(
            blobs=(((14 + 3 * i, 24, 20), 2.4 + 0.2 * i, 1.0), ((28, 16, 30), 3.0, -0.9))
        )
        vols.append(v + 0.01 * rng.standard_normal(v.shape).astype(np.float32))

    want = extract_features_many(vols, cfg)
    got = extract_features_stream(vols, cfg, batch_size=2, streams=2)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert len(g) == len(w)
        np.testing.assert_allclose(g.xyz, w.xyz, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(g.info, w.info)
        np.testing.assert_array_equal(g.desc, w.desc)


def test_candidate_group_overflow_fallback(rng):
    """A tiny candidate cap forces group-table overflow; the full-mask
    fallback must recover the same features as a roomy cap."""
    import dataclasses

    vol = rng.standard_normal((32, 32, 32)).astype(np.float32) * 120
    cfg_big = SiftConfig()
    cfg_tiny = dataclasses.replace(cfg_big, max_candidates_per_level=1)
    f_big = extract_features(vol, cfg_big)
    f_tiny = extract_features(vol, cfg_tiny)
    assert len(f_big) == len(f_tiny)
    np.testing.assert_allclose(f_tiny.xyz, f_big.xyz, atol=1e-5)
    np.testing.assert_allclose(f_tiny.desc, f_big.desc, atol=1e-5)


@pytest.mark.slow
def test_extract_software_pipelined_streams_match(cfg):
    """streams=N (generator lockstep, one host thread) must return
    byte-identical features, in input order, as streams=1 — including a
    stream whose volumes have mixed shapes."""
    from sift3d.pipeline.extract import extract_features_many

    rng = np.random.default_rng(17)
    vols = []
    for i in range(5):
        v = _blob_volume(
            blobs=(((15 + 2 * i, 22, 21), 2.3 + 0.25 * i, 1.0), ((27, 18, 29), 3.1, -0.8))
        )
        vols.append(v + 0.01 * rng.standard_normal(v.shape).astype(np.float32))
    vols.append(_blob_volume(dims=(40, 44, 40), blobs=(((20, 22, 20), 3.0, 1.0),)))

    want = extract_features_many(vols, cfg)
    for streams in (2, 3):
        got = extract_features_many(vols, cfg, streams=streams)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert len(g) == len(w)
            np.testing.assert_allclose(g.xyz, w.xyz, rtol=1e-5, atol=1e-5)
            np.testing.assert_array_equal(g.info, w.info)
            np.testing.assert_array_equal(g.desc, w.desc)
