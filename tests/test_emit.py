"""Emission-stage semantics: reference push order, caps, flags."""

import numpy as np

import jax.numpy as jnp

from sift3d.core.config import SiftConfig
from sift3d.core.featureset import INFO_FLAG_MIN0MAX1, INFO_FLAG_REORIENT
from sift3d.pipeline import features as fstage


def _run_emit(keep, ori_valid, sign, cfg, cap=64):
    c = keep.shape[0]
    gstack = jnp.zeros((6, 16, 16, 16), jnp.float32)
    lvl = jnp.ones((c,), jnp.int32)
    xyz = jnp.full((c, 3), 8.0, jnp.float32)
    scale = jnp.full((c,), 2.0, jnp.float32)
    eigs = jnp.ones((c, 3), jnp.float32)
    eig_ori = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 2.0, (c, 3, 3))
    k1 = cfg.max_primary_orientations
    k2 = cfg.max_secondary_orientations
    ori = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 3.0, (c, k1, k2, 3, 3))
    count, packed, patches = fstage.emit_stage(
        gstack, lvl, xyz, scale, jnp.asarray(keep), jnp.asarray(sign),
        eigs, eig_ori, ori, jnp.asarray(ori_valid), cfg, cap, True,
    )
    return int(count), np.asarray(packed)


def test_emit_unoriented_first_then_reoriented():
    cfg = SiftConfig()
    k1, k2 = cfg.max_primary_orientations, cfg.max_secondary_orientations
    keep = np.array([True])
    ov = np.zeros((1, k1, k2), bool)
    ov[0, 0, 0] = True
    ov[0, 1, 2] = True
    sign = np.array([1], np.int32)
    count, packed = _run_emit(keep, ov, sign, cfg)
    assert count == 3  # 1 unoriented + 2 reoriented
    info = packed[:count, 16].astype(np.uint32)
    # row 0: unoriented peak; rows 1-2: reoriented
    assert info[0] == INFO_FLAG_MIN0MAX1
    assert info[1] == INFO_FLAG_MIN0MAX1 | INFO_FLAG_REORIENT
    assert info[2] == INFO_FLAG_MIN0MAX1 | INFO_FLAG_REORIENT
    # unoriented row carries the eigenvector ori (scaled by 2 marker),
    # reoriented rows the canonical ori (3 marker)
    assert packed[0, 7] == 2.0
    assert packed[1, 7] == 3.0


def test_emit_caps_orientations():
    cfg = SiftConfig()
    k1, k2 = cfg.max_primary_orientations, cfg.max_secondary_orientations
    keep = np.array([True])
    ov = np.ones((1, k1, k2), bool)  # more than max_orientations valid
    sign = np.array([-1], np.int32)
    count, packed = _run_emit(keep, ov, sign, cfg)
    assert count == 1 + cfg.max_orientations
    info = packed[:count, 16].astype(np.uint32)
    assert (info & INFO_FLAG_MIN0MAX1).sum() == 0  # valley


def test_emit_skips_dropped_candidates():
    cfg = SiftConfig()
    k1, k2 = cfg.max_primary_orientations, cfg.max_secondary_orientations
    keep = np.array([False, True, False])
    ov = np.zeros((3, k1, k2), bool)
    sign = np.array([1, 1, 1], np.int32)
    count, packed = _run_emit(keep, ov, sign, cfg)
    assert count == 1


def test_extract_with_brief_descriptor(rng):
    from sift3d.pipeline.extract import extract_features

    z, y, x = np.mgrid[0:40, 0:40, 0:40].astype(np.float32)
    vol = np.exp(-(((x - 20) ** 2 + (y - 20) ** 2 + (z - 20) ** 2) / (2 * 9.0)))
    vol += 0.7 * np.exp(-(((x - 10) ** 2 + (y - 28) ** 2 + (z - 12) ** 2) / (2 * 6.25)))
    cfg = SiftConfig(feature_chunk=256)
    f_goh = extract_features(vol, cfg, descriptor="goh")
    f_rr = extract_features(vol, cfg, descriptor="rrief")
    assert len(f_goh) == len(f_rr)  # geometry identical across descriptors
    assert len(f_rr) > 0
    # both rank-normalized -> permutations of 0..63
    np.testing.assert_array_equal(np.sort(f_rr.desc[0]), np.arange(64))
    # but the descriptors differ
    assert not np.array_equal(f_goh.desc, f_rr.desc)
