"""Feature-stage unit tests: patch sampling, structure tensor, descriptors."""

import numpy as np

import jax.numpy as jnp

from sift3d.core.config import SiftConfig
from sift3d.kernels import descriptor as dk
from sift3d.kernels import patch as pk


def test_invert_3x3_matches_numpy(rng):
    m = rng.standard_normal((5, 3, 3)).astype(np.float32)
    m += 3 * np.eye(3)  # well-conditioned
    got = np.asarray(pk.invert_3x3(jnp.asarray(m)))
    want = np.linalg.inv(m)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sample_patches_identity_center(rng):
    img = rng.standard_normal((24, 24, 24)).astype(np.float32)
    center = np.array([[12.5, 12.5, 12.5]], np.float32)  # voxel 12 center
    # scale 2.5 -> patch step = 2*2.5/5 = 1.0: patch = raw voxels
    ori = np.eye(3, dtype=np.float32)[None]
    patches = np.asarray(
        pk.sample_patches(jnp.asarray(img), jnp.asarray(center), jnp.asarray([2.5], np.float32), jnp.asarray(ori))
    )
    assert patches.shape == (1, 11, 11, 11)
    want = img[12 - 5 : 12 + 6, 12 - 5 : 12 + 6, 12 - 5 : 12 + 6]
    np.testing.assert_allclose(patches[0], want, atol=1e-5)


def test_sample_patches_rotation_90deg(rng):
    img = rng.standard_normal((24, 24, 24)).astype(np.float32)
    center = np.array([[12.5, 12.5, 12.5]], np.float32)
    # rotation by 90 degrees about z: x->y, y->-x (rows are target axes)
    rot = np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], np.float32)[None]
    p_rot = np.asarray(
        pk.sample_patches(jnp.asarray(img), jnp.asarray(center), jnp.asarray([2.5], np.float32), jnp.asarray(rot))
    )
    p_id = np.asarray(
        pk.sample_patches(
            jnp.asarray(img), jnp.asarray(center), jnp.asarray([2.5], np.float32), jnp.asarray(np.eye(3, dtype=np.float32)[None])
        )
    )
    # sampling with ori^-1 applied to patch coords: patch(x, y) = img(rot^-1 @ (x,y))
    # rotating the identity patch by the same rotation should match
    np.testing.assert_allclose(p_rot[0], np.rot90(p_id[0], k=1, axes=(1, 2)), atol=1e-4)


def test_normalize_patches(rng):
    p = rng.standard_normal((3, 11, 11, 11)).astype(np.float32) * 7 + 3
    pn = np.asarray(pk.normalize_patches(jnp.asarray(p)))
    flat = pn.reshape(3, -1)
    np.testing.assert_allclose(flat.mean(axis=1), 0.0, atol=1e-6)
    np.testing.assert_allclose((flat**2).sum(axis=1), 1.0, rtol=1e-5)


def test_structure_tensor_dominant_direction(rng):
    # gradient only along x -> dominant eigenvector ~ x axis
    x = np.arange(11, dtype=np.float32)
    patch = np.tile(x, (11, 11, 1))[None]  # [1, z, y, x] linear in x
    eigs, ori = pk.structure_tensor_eigs(jnp.asarray(patch))
    eigs, ori = np.asarray(eigs), np.asarray(ori)
    assert eigs[0, 0] > 100 * max(eigs[0, 1], 1e-6)
    v = np.abs(ori[0][:, 0])  # first column = dominant eigenvector
    np.testing.assert_allclose(v, [1, 0, 0], atol=1e-4)


def test_sym_eigs_3x3_matches_eigh(rng):
    # random PSD-ish tensors plus hard cases: diagonal, repeated eigs,
    # near-zero, and widely scaled (structure tensors span decades)
    g = rng.standard_normal((64, 3, 3)).astype(np.float32)
    a = np.einsum("cik,cjk->cij", g, g)
    a[0] = np.diag([3.0, 3.0, 1.0])
    a[1] = np.diag([5.0, 5.0, 5.0])
    a[2] = 0.0
    a[3] = np.diag([2.0, 1.0, 1.0])
    a[4] *= 1e6
    a[5] *= 1e-6
    w, v = pk.sym_eigs_3x3(jnp.asarray(a))
    w, v = np.asarray(w), np.asarray(v)
    w_ref = np.linalg.eigvalsh(a)[:, ::-1]
    scale = np.maximum(np.abs(w_ref[:, :1]), 1e-6)
    np.testing.assert_allclose(w / scale, w_ref / scale, atol=2e-3)
    # columns orthonormal and satisfy A v = lambda v (relative to scale)
    vtv = np.einsum("cki,ckj->cij", v, v)
    np.testing.assert_allclose(vtv, np.broadcast_to(np.eye(3), vtv.shape), atol=2e-3)
    av = np.einsum("cij,cjk->cik", a, v)
    lv = w[:, None, :] * v
    np.testing.assert_allclose(av / scale[..., None], lv / scale[..., None], atol=5e-3)


def test_local_peaks_3d():
    vol = np.zeros((2, 7, 7, 7), np.float32)
    vol[0, 3, 3, 3] = 1.0
    vol[1, 4, 4, 4] = 1.0  # interior peak
    vol[1, 0, 0, 0] = 5.0  # border maximum: excluded (not adjacent to 4,4,4)
    got = np.asarray(pk.local_peaks_3d(jnp.asarray(vol)))
    assert got[0, 3, 3, 3] and got[0].sum() == 1
    assert got[1, 4, 4, 4] and not got[1, 0, 0, 0] and got[1].sum() == 1


def test_goh_descriptor_shape_and_layout(rng):
    p = rng.standard_normal((4, 11, 11, 11)).astype(np.float32)
    pn = pk.normalize_patches(jnp.asarray(p))
    d = np.asarray(dk.goh_descriptor(pn))
    assert d.shape == (4, 64)
    assert (d >= 0).all()


def test_goh_gradient_direction_binning():
    # patch increasing along +x only: gradient (+,0,0); max-dot corners are
    # the 4 (+1,*,*) dirs, first win = index 0 -> all mass in ori bin 0
    x = np.arange(11, dtype=np.float32)
    patch = np.tile(x, (11, 11, 1))[None]
    d = np.asarray(dk.goh_descriptor(jnp.asarray(patch)))
    d = d.reshape(2, 2, 2, 8)
    assert d[..., 0].sum() > 0
    assert d[..., 1:].sum() == 0


def test_rank_normalize():
    d = jnp.asarray(np.array([[3.0, 1.0, 2.0, 1.0]]))
    r = np.asarray(dk.rank_normalize(d))
    # ascending with ties by index: 1.0(idx1)->0, 1.0(idx3)->1, 2.0->2, 3.0->3
    np.testing.assert_array_equal(r[0], [3, 0, 2, 1])


def test_normalize_positive():
    d = jnp.asarray(np.array([[1.0, 3.0, 5.0]]))
    out = np.asarray(dk.normalize_positive(d))
    want = np.array([0.0, 2.0, 4.0])
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(out[0], want, rtol=1e-6)


def test_brief_tables_frozen():
    p, q = dk.brief_pair_table(2)
    assert p.shape == (64, 3) and q.shape == (64, 3)
    # spot values from MultiScale.cpp:805-807 (x,y,z triplets)
    np.testing.assert_array_equal(p[0], [5, 4, 4])
    np.testing.assert_array_equal(q[0], [6, 5, 3])
    p3, q3 = dk.brief_pair_table(3)
    assert (p3 == 5).all()


def test_brief_variants(rng):
    patches = rng.standard_normal((2, 11, 11, 11)).astype(np.float32)
    pn = pk.normalize_patches(jnp.asarray(patches))
    rr = np.asarray(dk.brief_descriptor(pn, "rrief"))
    br = np.asarray(dk.brief_descriptor(pn, "brief"))
    nr = np.asarray(dk.brief_descriptor(pn, "nrrief"))
    assert rr.shape == br.shape == nr.shape == (2, 64)
    np.testing.assert_array_equal(br, (rr < 0).astype(np.float32))
    # nrrief = rrief / int-dist, so |nrrief| <= |rrief|
    assert (np.abs(nr) <= np.abs(rr) + 1e-6).all()


def test_orient_stage_returns_valid_orientations(rng):
    from sift3d.pipeline.features import orient_stage

    cfg = SiftConfig()
    patches = rng.standard_normal((8, 11, 11, 11)).astype(np.float32)
    out = orient_stage(jnp.asarray(patches), cfg)
    ori = np.asarray(out["ori"])
    ov = np.asarray(out["ori_valid"])
    assert ov.any(), "random patches should produce at least one orientation"
    # every valid orientation matrix is orthonormal with det +1
    for c in range(8):
        for s1 in range(ov.shape[1]):
            for s2 in range(ov.shape[2]):
                if ov[c, s1, s2]:
                    m = ori[c, s1, s2]
                    np.testing.assert_allclose(m @ m.T, np.eye(3), atol=2e-2)
                    assert np.linalg.det(m) > 0.9


def test_smooth_histogram_matches_splat_plus_blur(rng):
    """The MXU histogram formulation must equal scatter-splat + blur."""
    from sift3d.kernels import gauss
    from sift3d.pipeline.features import _smooth_histogram, _splat_histogram

    coords = jnp.asarray(rng.uniform(0.0, 11.0, (3, 40, 3)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0, 2, (3, 40)).astype(np.float32))
    want = np.asarray(gauss.blur3d_batched(_splat_histogram(coords, w), 0.5, 0.01))
    got = np.asarray(_smooth_histogram(coords, w, 0.5))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_boxed_identity_sampling_matches_gather(rng):
    """Boxed separable sampling == leveled gather sampling (identity ori)."""
    gstack = jnp.asarray(rng.standard_normal((6, 48, 48, 48)).astype(np.float32))
    n = 16
    lvl = jnp.asarray(rng.integers(1, 4, n).astype(np.int32))
    xyz = jnp.asarray(rng.uniform(14, 34, (n, 3)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(2.0, 5.5, n).astype(np.float32))
    ident = jnp.broadcast_to(jnp.eye(3, dtype=np.float32), (n, 3, 3))
    want = np.asarray(pk.sample_patches_leveled(gstack, lvl, xyz, scale, ident))
    got = np.asarray(pk.sample_patches_identity_boxed(gstack, lvl, xyz, scale))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_boxed_rotated_sampling_matches_gather(rng):
    """Boxed MXU rotated sampling == gather-based sampling, incl. borders."""
    gstack = jnp.asarray(rng.standard_normal((6, 48, 48, 48)).astype(np.float32))
    n = 8
    lvl = jnp.asarray(rng.integers(1, 4, n).astype(np.int32))
    # include near-border centers so rotated corners leave the volume
    xyz = np.concatenate([
        rng.uniform(16, 32, (n - 3, 3)), rng.uniform(9, 12, (3, 3))
    ]).astype(np.float32)
    scale = jnp.asarray(rng.uniform(2.0, 4.0, n).astype(np.float32))
    q = rng.standard_normal((n, 3, 3))
    oris = np.zeros((n, 3, 3), np.float32)
    for i in range(n):
        u, _, vt = np.linalg.svd(q[i])
        m = u @ vt
        if np.linalg.det(m) < 0:
            m[2] = -m[2]
        oris[i] = m
    want = np.asarray(pk.sample_patches_leveled(gstack, lvl, jnp.asarray(xyz), scale, jnp.asarray(oris)))
    got = np.asarray(pk.sample_patches_rotated_boxed(gstack, lvl, jnp.asarray(xyz), scale, jnp.asarray(oris)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_rotated_sampler_matches_boxed(rng):
    """Pallas rotated-patch kernel (interpret mode) vs the XLA boxed
    contraction on random rotations; bf16 tap precision bounds the diff."""
    from sift3d.kernels.patch import (
        sample_patches_rotated_boxed,
        sample_patches_rotated_pallas,
    )

    L, Z, Y, X = 3, 48, 56, 48
    gstack = jnp.asarray(
        rng.standard_normal((L, Z, Y, X)).astype(np.float32) * 50 + 150
    )
    R = 64
    lvl = jnp.asarray(rng.integers(0, L, R).astype(np.int32))
    centers = jnp.asarray(
        np.stack(
            [
                rng.uniform(12, X - 12, R),
                rng.uniform(12, Y - 12, R),
                rng.uniform(12, Z - 12, R),
            ],
            axis=1,
        ).astype(np.float32)
    )
    scales = jnp.asarray(rng.uniform(3.2, 5.0, R).astype(np.float32))
    q = rng.standard_normal((R, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, xq, yq, zq = q.T
    oris = jnp.asarray(
        np.stack(
            [
                1 - 2 * (yq * yq + zq * zq), 2 * (xq * yq - w * zq), 2 * (xq * zq + w * yq),
                2 * (xq * yq + w * zq), 1 - 2 * (xq * xq + zq * zq), 2 * (yq * zq - w * xq),
                2 * (xq * zq - w * yq), 2 * (yq * zq + w * xq), 1 - 2 * (xq * xq + yq * yq),
            ],
            axis=1,
        ).reshape(R, 3, 3).astype(np.float32)
    )
    ref = np.asarray(sample_patches_rotated_boxed(gstack, lvl, centers, scales, oris))
    got = np.asarray(
        sample_patches_rotated_pallas(gstack, lvl, centers, scales, oris, interpret=True)
    )
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() < 2e-2 * scale
    # the small-scale 48^3 bucket box must sample identically (all test
    # scales are below rbox_max_scale(48) = 6.50)
    assert float(scales.max()) <= pk.rbox_max_scale(pk._RBOX_SMALL)
    got48 = np.asarray(
        sample_patches_rotated_pallas(
            gstack, lvl, centers, scales, oris, interpret=True, box=pk._RBOX_SMALL
        )
    )
    assert np.abs(ref - got48).max() < 2e-2 * scale
    ref48 = np.asarray(
        sample_patches_rotated_boxed(
            gstack, lvl, centers, scales, oris, box=pk._RBOX_SMALL
        )
    )
    np.testing.assert_allclose(ref48, ref, rtol=1e-4, atol=1e-4)


def test_slab_rotated_sampler_matches_boxed(rng):
    """Slab-DMA rotated sampler (interpret mode) vs the XLA boxed
    contraction, including near-border centers and the count skip."""
    from sift3d.kernels.patch import (
        sample_patches_rotated_boxed,
        sample_patches_rotated_slab,
    )

    L, Z, Y, X = 2, 64, 72, 80  # X forces lane padding (80 -> 128)
    gstack = jnp.asarray(
        rng.standard_normal((L, Z, Y, X)).astype(np.float32) * 50 + 150
    )
    R = 16
    lvl = jnp.asarray(rng.integers(0, L, R).astype(np.int32))
    centers = jnp.asarray(
        np.stack(
            [
                rng.uniform(3, X - 3, R),
                rng.uniform(3, Y - 3, R),
                rng.uniform(3, Z - 3, R),
            ],
            axis=1,
        ).astype(np.float32)
    )
    scales = jnp.asarray(rng.uniform(3.2, 6.4, R).astype(np.float32))
    q = rng.standard_normal((R, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, xq, yq, zq = q.T
    oris = jnp.asarray(
        np.stack(
            [
                1 - 2 * (yq * yq + zq * zq), 2 * (xq * yq - w * zq), 2 * (xq * zq + w * yq),
                2 * (xq * yq + w * zq), 1 - 2 * (xq * xq + zq * zq), 2 * (yq * zq - w * xq),
                2 * (xq * zq - w * yq), 2 * (yq * zq + w * xq), 1 - 2 * (xq * xq + yq * yq),
            ],
            axis=1,
        ).reshape(R, 3, 3).astype(np.float32)
    )
    ref = np.asarray(
        sample_patches_rotated_boxed(gstack, lvl, centers, scales, oris, box=48)
    )
    got = np.asarray(
        sample_patches_rotated_slab(
            gstack, lvl, centers, scales, oris, box=48, interpret=True
        )
    )
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() < 2e-2 * scale
    # rows past the live count are skipped; live rows stay exact
    got8 = np.asarray(
        sample_patches_rotated_slab(
            gstack, lvl, centers, scales, oris, box=48,
            count=jnp.asarray([8], jnp.int32), interpret=True,
        )
    )
    assert np.abs(ref[:8] - got8[:8]).max() < 2e-2 * scale


def test_identity_slab_sampler_matches_boxed(rng):
    """Identity slab-DMA sampler (interpret mode) vs the boxed XLA
    sampler: exact f32 separable interpolation, border saturation, and
    the live-count skip."""
    from sift3d.kernels.patch import (
        sample_patches_identity_boxed,
        sample_patches_identity_slab,
    )

    L, Z, Y, X = 3, 64, 72, 80
    gstack = jnp.asarray(
        rng.standard_normal((L, Z, Y, X)).astype(np.float32) * 50 + 150
    )
    R = 16
    lvl = jnp.asarray(rng.integers(0, L, R).astype(np.int32))
    centers = jnp.asarray(
        np.stack(
            [
                rng.uniform(3, X - 3, R),
                rng.uniform(3, Y - 3, R),
                rng.uniform(3, Z - 3, R),
            ],
            axis=1,
        ).astype(np.float32)
    )
    scales = jnp.asarray(rng.uniform(3.2, 8.0, R).astype(np.float32))
    ref = np.asarray(sample_patches_identity_boxed(gstack, lvl, centers, scales))
    got = np.asarray(
        sample_patches_identity_slab(gstack, lvl, centers, scales, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)
    got8 = np.asarray(
        sample_patches_identity_slab(
            gstack, lvl, centers, scales,
            count=jnp.asarray([8], jnp.int32), interpret=True,
        )
    )
    np.testing.assert_allclose(got8[:8], ref[:8], rtol=1e-4, atol=1e-3)


def test_slab_rotated_sampler_tiny_bucket(rng):
    """Tiny bucket (24^3 box, 32-lane x window, 4 y rows per lane group)
    vs the XLA boxed contraction on in-range scales."""
    from sift3d.kernels.patch import (
        _RBOX_TINY,
        _XWIN_TINY,
        rbox_max_scale,
        sample_patches_rotated_boxed,
        sample_patches_rotated_slab,
    )

    L, Z, Y, X = 2, 48, 56, 80  # X forces lane padding (80 -> 128)
    gstack = jnp.asarray(
        rng.standard_normal((L, Z, Y, X)).astype(np.float32) * 50 + 150
    )
    R = 16
    lvl = jnp.asarray(rng.integers(0, L, R).astype(np.int32))
    centers = jnp.asarray(
        np.stack(
            [rng.uniform(3, X - 3, R), rng.uniform(3, Y - 3, R), rng.uniform(3, Z - 3, R)],
            axis=1,
        ).astype(np.float32)
    )
    scales = jnp.asarray(
        rng.uniform(1.7, rbox_max_scale(_RBOX_TINY), R).astype(np.float32)
    )
    q = rng.standard_normal((R, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, xq, yq, zq = q.T
    oris = jnp.asarray(
        np.stack(
            [
                1 - 2 * (yq * yq + zq * zq), 2 * (xq * yq - w * zq), 2 * (xq * zq + w * yq),
                2 * (xq * yq + w * zq), 1 - 2 * (xq * xq + zq * zq), 2 * (yq * zq - w * xq),
                2 * (xq * zq - w * yq), 2 * (yq * zq + w * xq), 1 - 2 * (xq * xq + yq * yq),
            ],
            axis=1,
        ).reshape(R, 3, 3).astype(np.float32)
    )
    ref = np.asarray(
        sample_patches_rotated_boxed(gstack, lvl, centers, scales, oris, box=_RBOX_TINY)
    )
    got = np.asarray(
        sample_patches_rotated_slab(
            gstack, lvl, centers, scales, oris, box=_RBOX_TINY,
            xwin=_XWIN_TINY, interpret=True,
        )
    )
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() < 2e-2 * scale


def test_slab_samplers_bf16_gstack(rng):
    """bf16 Gaussian-stack storage (SIFT3D_BF16_GSTACK lever): the slab
    samplers take a 16-row y apron (Mosaic bf16 sublane tiling) and
    upcast in VMEM. Identity must match the boxed sampler run on the
    same bf16-rounded values at f32 roundoff; rotated must match its
    own f32-source output exactly (the kernel already rounds its box to
    bf16, so moving the rounding to HBM storage changes nothing)."""
    from sift3d.kernels.patch import (
        sample_patches_identity_boxed,
        sample_patches_identity_slab,
        sample_patches_rotated_slab,
    )

    L, Z, Y, X = 2, 64, 72, 80
    g32 = jnp.asarray(
        rng.standard_normal((L, Z, Y, X)).astype(np.float32) * 50 + 150
    )
    g16 = g32.astype(jnp.bfloat16)
    R = 16
    lvl = jnp.asarray(rng.integers(0, L, R).astype(np.int32))
    centers = jnp.asarray(
        np.stack(
            [
                rng.uniform(3, X - 3, R),
                rng.uniform(3, Y - 3, R),
                rng.uniform(3, Z - 3, R),
            ],
            axis=1,
        ).astype(np.float32)
    )
    scales = jnp.asarray(rng.uniform(3.2, 6.4, R).astype(np.float32))

    ref_id = np.asarray(
        sample_patches_identity_boxed(
            g16.astype(jnp.float32), lvl, centers, scales
        )
    )
    got_id = np.asarray(
        sample_patches_identity_slab(g16, lvl, centers, scales, interpret=True)
    )
    np.testing.assert_allclose(got_id, ref_id, rtol=1e-4, atol=1e-3)

    q = rng.standard_normal((R, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, xq, yq, zq = q.T
    oris = jnp.asarray(
        np.stack(
            [
                1 - 2 * (yq * yq + zq * zq), 2 * (xq * yq - w * zq), 2 * (xq * zq + w * yq),
                2 * (xq * yq + w * zq), 1 - 2 * (xq * xq + zq * zq), 2 * (yq * zq - w * xq),
                2 * (xq * zq - w * yq), 2 * (yq * zq + w * xq), 1 - 2 * (xq * xq + yq * yq),
            ],
            axis=1,
        ).reshape(R, 3, 3).astype(np.float32)
    )
    rot32 = np.asarray(
        sample_patches_rotated_slab(
            g32, lvl, centers, scales, oris, box=48, interpret=True
        )
    )
    rot16 = np.asarray(
        sample_patches_rotated_slab(
            g16, lvl, centers, scales, oris, box=48, interpret=True
        )
    )
    np.testing.assert_array_equal(rot16, rot32)


def test_slab_samplers_prepadded_input_match(rng):
    """pad_gstack_slab + logical_dims must reproduce the internally-padded
    samplers bit-for-bit (identity and rotated, interpret mode)."""
    from sift3d.kernels.patch import (
        pad_gstack_slab,
        sample_patches_identity_slab,
        sample_patches_rotated_slab,
    )

    L, Z, Y, X = 2, 48, 52, 70
    gstack = jnp.asarray(
        rng.standard_normal((L, Z, Y, X)).astype(np.float32) * 50 + 150
    )
    gp = pad_gstack_slab(gstack)
    assert gp.shape == (L, Z, Y + 8, 128)
    R = 8
    lvl = jnp.asarray(rng.integers(0, L, R).astype(np.int32))
    centers = jnp.asarray(
        np.stack(
            [rng.uniform(3, X - 3, R), rng.uniform(3, Y - 3, R), rng.uniform(3, Z - 3, R)],
            axis=1,
        ).astype(np.float32)
    )
    scales = jnp.asarray(rng.uniform(2.0, 4.0, R).astype(np.float32))

    want = np.asarray(sample_patches_identity_slab(gstack, lvl, centers, scales, interpret=True))
    got = np.asarray(
        sample_patches_identity_slab(
            gp, lvl, centers, scales, interpret=True, logical_dims=(Z, Y, X)
        )
    )
    np.testing.assert_array_equal(got, want)

    q = rng.standard_normal((R, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, xq, yq, zq = q.T
    oris = jnp.asarray(
        np.stack(
            [
                1 - 2 * (yq * yq + zq * zq), 2 * (xq * yq - w * zq), 2 * (xq * zq + w * yq),
                2 * (xq * yq + w * zq), 1 - 2 * (xq * xq + zq * zq), 2 * (yq * zq - w * xq),
                2 * (xq * zq - w * yq), 2 * (yq * zq + w * xq), 1 - 2 * (xq * xq + yq * yq),
            ],
            axis=1,
        ).reshape(R, 3, 3).astype(np.float32)
    )
    want_r = np.asarray(
        sample_patches_rotated_slab(gstack, lvl, centers, scales, oris, box=48, interpret=True)
    )
    got_r = np.asarray(
        sample_patches_rotated_slab(
            gp, lvl, centers, scales, oris, box=48, interpret=True,
            logical_dims=(Z, Y, X),
        )
    )
    np.testing.assert_array_equal(got_r, want_r)
