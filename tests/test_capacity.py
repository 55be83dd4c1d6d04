"""Adversarial capacity / boundary tests.

The extraction pipeline's headline optimization is fixed-capacity padded
device programs with exact-count shape buckets; these tests attack the
boundaries that ordinary fixtures never hit: bucket edges, emit caps hit
exactly, the count-prefix contract of the emission compactor, and config
combinations that would overflow a fixed cap.
"""

import numpy as np

import jax.numpy as jnp

from sift3d.core.config import SiftConfig
from sift3d.pipeline import features as fstage
from sift3d.pipeline.extract import _bucket, _compact_mask_one, extract_features


def test_bucket_boundaries():
    assert _bucket(0, 4096) == 64
    assert _bucket(63, 4096) == 64
    assert _bucket(64, 4096) == 64  # exactly at the bucket edge
    assert _bucket(65, 4096) == 128
    assert _bucket(4096, 4096) == 4096
    assert _bucket(4097, 4096) == 4096  # clamped at cap
    assert _bucket(5000, 8192) == 8192


def test_compact_mask_exactly_at_size(rng):
    """Candidate groups EXACTLY filling the compaction size: every entry
    must still decode (off-by-one here silently drops candidates)."""
    mask = np.zeros((1, 4, 8, 64), np.int8)
    # one hit per 64-element group in the first `size` groups
    size = 8
    flat = mask.reshape(-1)
    for g in range(size):
        flat[g * 64 + (g % 64)] = 1 if g % 2 == 0 else -1
    gidx, blocks, gc, cc = _compact_mask_one(jnp.asarray(mask), size)
    assert int(gc) == size  # group count == size: NOT overflow
    assert int(cc) == size
    got = np.asarray(gidx[: int(gc)])
    np.testing.assert_array_equal(got, np.arange(size))
    bl = np.asarray(blocks[: int(gc)])
    assert int((bl != 0).sum()) == size


def test_compact_mask_one_past_size(rng):
    """size+1 nonzero groups: group_count must exceed size so the caller
    can detect overflow and take the full-mask fallback."""
    mask = np.zeros((1, 4, 8, 64), np.int8)
    size = 8
    flat = mask.reshape(-1)
    for g in range(size + 1):
        flat[g * 64] = 1
    gidx, blocks, gc, cc = _compact_mask_one(jnp.asarray(mask), size)
    assert int(gc) == size + 1  # exact count survives the capped nonzero


def _ori_fixture(c, k1, k2, n_valid_per_cand, rng):
    ori = np.tile(np.eye(3, dtype=np.float32), (c, k1, k2, 1, 1))
    ov = np.zeros((c, k1, k2), bool)
    ov.reshape(c, -1)[:, :n_valid_per_cand] = True
    return jnp.asarray(ori), jnp.asarray(ov)


def test_emit_reoriented_at_exact_cap(rng):
    """emit_cap == exact row count: no row lost, count == cap, and the
    valid rows form a prefix (the slab samplers' count contract)."""
    cfg = SiftConfig()
    c, k1, k2 = 8, cfg.max_primary_orientations, cfg.max_secondary_orientations
    gstacks = jnp.asarray(rng.standard_normal((1, 6, 12, 12, 12)).astype(np.float32))
    cand = np.zeros((c, 6), np.int32)
    cand[:, 1] = 1
    cand[:, 2:5] = 6
    cand[:, 5] = 1
    xyz = jnp.full((c, 3), 6.0, jnp.float32)
    scale = jnp.full((c,), 1.0, jnp.float32)
    keep = jnp.ones((c,), bool)
    eigs = jnp.ones((c, 3), jnp.float32)
    per = 3
    ori, ov = _ori_fixture(c, k1, k2, per, rng)
    cap = c * per  # EXACTLY the row count
    count, packed, patches = fstage.emit_reoriented_stage(
        gstacks, jnp.asarray(cand), xyz, scale, keep, eigs, ori, ov, cfg, cap, "all"
    )
    assert int(count) == cap
    packed = np.asarray(packed)
    assert (packed[:, 17] >= 0).all()  # every row live, none truncated
    # order keys strictly increasing -> rows are the compacted prefix
    assert (np.diff(packed[:, 17]) > 0).all()


def test_emit_reoriented_count_prefix_contract(rng):
    """cap > count: rows [0, count) live, rows [count, cap) marked dead —
    the exact prefix shape the slab samplers rely on."""
    cfg = SiftConfig()
    c, k1, k2 = 5, cfg.max_primary_orientations, cfg.max_secondary_orientations
    gstacks = jnp.asarray(rng.standard_normal((1, 6, 12, 12, 12)).astype(np.float32))
    cand = np.zeros((c, 6), np.int32)
    cand[:, 1] = 1
    cand[:, 2:5] = 6
    cand[:, 5] = -1
    keep = jnp.asarray(np.array([1, 0, 1, 1, 0], bool))  # dropped candidates
    per = 2
    ori, ov = _ori_fixture(c, k1, k2, per, rng)
    cap = 16
    count, packed, _ = fstage.emit_reoriented_stage(
        gstacks, jnp.asarray(cand), jnp.full((c, 3), 6.0), jnp.ones((c,)), keep,
        jnp.ones((c, 3)), ori, ov, cfg, cap, "all"
    )
    n = int(count)
    assert n == 3 * per  # only kept candidates emit
    packed = np.asarray(packed)
    assert (packed[:n, 17] >= 0).all()
    assert (packed[n:, 17] < 0).all()


def test_max_orientations_past_sixteen_not_truncated(rng):
    """max_orientations > 16 with a tiny union_chunk: the emit-cap bound
    must follow min(K1*K2, max_orientations), not a fixed 16x chunk (a
    fixed cap silently truncated reoriented rows here)."""
    cfg = SiftConfig(union_chunk=64, max_orientations=24)
    cfg_ref = SiftConfig(union_chunk=4096, max_orientations=24)
    vol = rng.standard_normal((24, 24, 24)).astype(np.float32) * 120
    a = extract_features(vol, cfg)
    b = extract_features(vol, cfg_ref)
    assert len(a) == len(b), "chunked emission dropped reoriented rows"
    np.testing.assert_allclose(a.xyz, b.xyz, atol=1e-5)


def test_union_chunk_boundary_exact(rng):
    """Candidate count forced across a chunk boundary: tiny union_chunk
    (many cap-64 chunks, some exactly full) must equal one big chunk."""
    vol = rng.standard_normal((28, 28, 28)).astype(np.float32) * 120
    a = extract_features(vol, SiftConfig(union_chunk=64))
    b = extract_features(vol, SiftConfig())
    assert len(a) == len(b)
    np.testing.assert_allclose(a.xyz, b.xyz, atol=1e-5)
    np.testing.assert_array_equal(a.desc, b.desc)
    np.testing.assert_array_equal(a.info, b.info)


def test_emit_reoriented_theoretical_max_density(rng):
    """EVERY orientation slot valid with max_orientations >= K1*K2: the
    densest legal emission (the case a fixed 16x cap would truncate)."""
    base = SiftConfig()
    s0 = base.max_primary_orientations * base.max_secondary_orientations
    cfg = SiftConfig(max_orientations=s0)
    c, k1, k2 = 64, cfg.max_primary_orientations, cfg.max_secondary_orientations
    s = k1 * k2
    gstacks = jnp.asarray(rng.standard_normal((1, 6, 12, 12, 12)).astype(np.float32))
    cand = np.zeros((c, 6), np.int32)
    cand[:, 1] = 1
    cand[:, 2:5] = 6
    cand[:, 5] = 1
    ori, ov = _ori_fixture(c, k1, k2, s, rng)  # all 24 slots valid
    n_max = c * s
    # same 256-row-chunk rounding as the production cap_limit (extract.py)
    cap = _bucket(n_max, -(-c * max(1, min(s, cfg.max_orientations)) // 256) * 256)
    assert cap >= n_max
    count, packed, _ = fstage.emit_reoriented_stage(
        gstacks, jnp.asarray(cand), jnp.full((c, 3), 6.0), jnp.ones((c,)),
        jnp.ones((c,), bool), jnp.ones((c, 3)), ori, ov, cfg, cap, "all"
    )
    assert int(count) == n_max
    assert int((np.asarray(packed)[:, 17] >= 0).sum()) == n_max
