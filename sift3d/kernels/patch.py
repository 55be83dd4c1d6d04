"""Batched rotated 11^3 patch sampling + patch-local helpers.

Reference equivalents:
- sampleImage3D (src_common/MultiScale.cpp:2614-2714): trilinear resampling
  of an 11^3 patch around a feature, rotated by ori^-1 and scaled so the
  patch radius covers 2x the feature scale.
- Feature3D::NormalizeData (MultiScale.cpp:127-205): subtract mean, scale
  to unit L2 norm.
- fioGenerateEdgeImages3D (src_common/FeatureIO.cpp:2284-2326): central
  differences over interior voxels, zero borders.

Boundary behaviour note: the reference zeroes samples whose *x* image
coordinate leaves the volume and clamps y/z via the interpolation-coordinate
saturation (the y/z bound tests are a known typo, SURVEY.md section 2.3
quirk 4 — but the observable behaviour is well-defined: x -> 0, y/z ->
clamp). We reproduce that behaviour for parity with the reference binary.
Candidates are pre-filtered by the iRadMax box test (MultiScale.cpp:2630-2643)
so this only affects rotated patch corners.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sift3d.kernels.resample import trilinear_sample

PATCH_DIM = 11
PATCH_RAD = PATCH_DIM // 2


def invert_3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Batched analytic 3x3 inverse (MultiScale.h:192-222 invert_3x3)."""
    a11, a12, a13 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    a21, a22, a23 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    a31, a32, a33 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    det = (
        a11 * (a33 * a22 - a32 * a23)
        - a21 * (a33 * a12 - a32 * a13)
        + a31 * (a23 * a12 - a22 * a13)
    )
    inv_det = 1.0 / det
    out = jnp.stack(
        [
            (a33 * a22 - a32 * a23),
            -(a33 * a12 - a32 * a13),
            (a23 * a12 - a22 * a13),
            -(a33 * a21 - a31 * a23),
            (a33 * a11 - a31 * a13),
            -(a23 * a11 - a21 * a13),
            (a32 * a21 - a31 * a22),
            -(a32 * a11 - a31 * a12),
            (a22 * a11 - a21 * a12),
        ],
        axis=-1,
    ).reshape(m.shape)
    return out * inv_det[..., None, None]


def _patch_grid() -> np.ndarray:
    """Static [1331, 3] grid of (x, y, z) offsets in [-5, 5], z-major order
    matching data_zyx[z][y][x] layout."""
    r = np.arange(-PATCH_RAD, PATCH_RAD + 1, dtype=np.float32)
    zz, yy, xx = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=-1)  # [V, (x,y,z)]


_GRID = _patch_grid()


def sample_patches(
    img: jnp.ndarray,  # [Z, Y, X]
    centers: jnp.ndarray,  # [C, 3] (x, y, z) continuous coords
    scales: jnp.ndarray,  # [C]
    oris: jnp.ndarray,  # [C, 3, 3] orientation matrices (rows = axes)
) -> jnp.ndarray:
    """Sample rotated patches; returns [C, 11, 11, 11] in data_zyx order."""
    grid = jnp.asarray(_GRID)  # [V, 3]
    ori_inv = invert_3x3(oris)  # [C, 3, 3]
    # rotate: xyz_img = ori_inv @ xyz_feat (MultiScale.cpp:2671)
    rotated = jnp.einsum("cij,vj->cvi", ori_inv, grid)  # [C, V, 3]
    # scale: patch radius covers 2x feature scale (MultiScale.cpp:2674)
    fac = (2.0 * scales / float(PATCH_RAD))[:, None, None]
    coords = rotated * fac + centers[:, None, :]  # [C, V, 3]
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    vals = trilinear_sample(img, x, y, z)
    # x out of volume -> 0 (reference behaviour; see module docstring)
    xd = img.shape[2]
    vals = jnp.where((x < 0) | (x >= xd), 0.0, vals)
    return vals.reshape(-1, PATCH_DIM, PATCH_DIM, PATCH_DIM)


def sample_patches_leveled(
    gstack: jnp.ndarray,  # [L, Z, Y, X] Gaussian levels
    lvl: jnp.ndarray,  # [C] int32 per-candidate level index
    centers: jnp.ndarray,  # [C, 3] (x, y, z)
    scales: jnp.ndarray,  # [C]
    oris: jnp.ndarray,  # [C, 3, 3]
) -> jnp.ndarray:
    """sample_patches with a per-candidate source level.

    One 4D gather instead of sampling every level and selecting — the
    gather count (the TPU bottleneck for this stage) stays at 8 corner
    reads per sample point.
    """
    from sift3d.kernels.resample import _interp_coord

    grid = jnp.asarray(_GRID)
    ori_inv = invert_3x3(oris)
    rotated = jnp.einsum("cij,vj->cvi", ori_inv, grid)
    fac = (2.0 * scales / float(PATCH_RAD))[:, None, None]
    coords = rotated * fac + centers[:, None, :]
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]

    zd, yd, xd = gstack.shape[1:]
    ix, wx = _interp_coord(x, xd)
    iy, wy = _interp_coord(y, yd)
    iz, wz = _interp_coord(z, zd)
    li = lvl[:, None]

    # 8 element gathers (one per trilinear corner): measured faster on TPU
    # than a single lax.gather of (1,2,2,2) blocks, which lowers poorly
    def g(dz, dy, dx):
        return gstack[li, iz + dz, iy + dy, ix + dx]

    c000, c001 = g(0, 0, 0), g(0, 0, 1)
    c010, c011 = g(0, 1, 0), g(0, 1, 1)
    c100, c101 = g(1, 0, 0), g(1, 0, 1)
    c110, c111 = g(1, 1, 0), g(1, 1, 1)
    n00 = wx * c000 + (1.0 - wx) * c001
    n01 = wx * c100 + (1.0 - wx) * c101
    n10 = wx * c010 + (1.0 - wx) * c011
    n11 = wx * c110 + (1.0 - wx) * c111
    nn0 = wy * n00 + (1.0 - wy) * n10
    nn1 = wy * n01 + (1.0 - wy) * n11
    vals = wz * nn0 + (1.0 - wz) * nn1
    vals = jnp.where((x < 0) | (x >= xd), 0.0, vals)
    return vals.reshape(-1, PATCH_DIM, PATCH_DIM, PATCH_DIM)


_BOX = 40  # bounding-box size for boxed sampling (covers max patch extent)


def sample_patches_identity_boxed(
    gstack: jnp.ndarray,  # [L, Z, Y, X]
    lvl: jnp.ndarray,  # [C] int32
    centers: jnp.ndarray,  # [C, 3] (x, y, z)
    scales: jnp.ndarray,  # [C]
) -> jnp.ndarray:
    """Identity-orientation patches via contiguous box slices + separable
    interpolation.

    Axis-aligned patches factor per axis, so instead of 8 random gathers
    per sample point we DMA one bounding box per candidate
    (vmapped dynamic_slice — measured ~12x faster per element than random
    gathers on TPU) and contract it with per-axis 2-tap interpolation
    matrices on the MXU. Exactly equals sample_patches_leveled with an
    identity orientation for candidates whose patch fits the box — which
    the iRadMax bounds test guarantees for every kept candidate.
    """
    nl, zd, yd, xd = gstack.shape
    box = min(_BOX, zd, yd, xd)
    fac = (2.0 * scales / float(PATCH_RAD))  # [C]
    half_ext = 5.0 * fac + 1.5

    def axis(coord, dim):
        origin = jnp.clip(
            jnp.floor(coord - half_ext).astype(jnp.int32), 0, max(dim - box, 0)
        )
        return origin

    ox = axis(centers[:, 0], xd)
    oy = axis(centers[:, 1], yd)
    oz = axis(centers[:, 2], zd)

    def slice_one(l, z0, y0, x0):
        return jax.lax.dynamic_slice(gstack, (l, z0, y0, x0), (1, box, box, box))[0]

    boxes = jax.vmap(slice_one)(lvl, oz, oy, ox)  # [C, box, box, box]

    offs = jnp.arange(PATCH_DIM, dtype=jnp.float32) - PATCH_RAD  # [-5..5]

    def weights(coord, origin, dim):
        # continuous coords of the 11 patch samples along this axis
        u = coord[:, None] + offs[None, :] * fac[:, None]  # [C, 11]
        # reference border saturation happens at the *volume* border; kept
        # candidates are interior, so local interpolation suffices
        ul = u - origin[:, None].astype(jnp.float32)
        i0 = jnp.clip(jnp.floor(ul - 0.5).astype(jnp.int32), 0, box - 2)
        w0 = 1.0 - (ul - 0.5 - i0.astype(jnp.float32))
        w0 = jnp.clip(w0, 0.0, 1.0)
        bins = jnp.arange(box)
        a = w0[..., None] * (bins == i0[..., None])
        a = a + (1.0 - w0)[..., None] * (bins == (i0 + 1)[..., None])
        return a  # [C, 11, box]

    ax = weights(centers[:, 0], ox, xd)
    ay = weights(centers[:, 1], oy, yd)
    az = weights(centers[:, 2], oz, zd)

    # full f32 multiply precision: default bf16 MXU passes shift patch
    # values ~1e-3, enough to flip marginal eig/orientation decisions
    kw = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    t = jnp.einsum("cZYX,czZ->czYX", boxes, az, **kw)
    t = jnp.einsum("czYX,cyY->czyX", t, ay, **kw)
    t = jnp.einsum("czyX,cxX->czyx", t, ax, **kw)
    return t


def _taps_transposed(l, b: int, hi):
    """Transposed 2-tap linear interpolation weights [b, len(l)] with the
    0.5-voxel-center convention, border saturation at integer position
    `hi` (all weight collapses onto hi+1 past the border). Shared by the
    slab-DMA kernels so the tap convention cannot drift between them."""
    i0 = jnp.clip(jnp.floor(l - 0.5), 0.0, hi)
    w0 = jnp.clip(1.0 - (l - 0.5 - i0), 0.0, 1.0)
    i0i = i0.astype(jnp.int32)
    kb = jax.lax.broadcasted_iota(jnp.int32, (b, l.shape[0]), 0)
    return jnp.where(kb == i0i[None, :], w0[None, :], 0.0) + jnp.where(
        kb == i0i[None, :] + 1, 1.0 - w0[None, :], 0.0
    )


def _id_slab_kernel(y_align, offs_ref, cnt_ref, ux_ref, uy_ref, uz_ref,
                    g_ref, out_ref, slab_s, sem):
    """Per-row identity-orientation patch: DMA a full-x slab of the row's
    bounding region (double-buffered), cut the x window with a lane roll,
    and run the exact separable 2-tap contraction in f32.

    Same DMA geometry as _rot_slab_kernel (lane slicing and unaligned y
    offsets are illegal, so [bz, box+8, Xp] at y0a = 8*(y0//8) with the
    caller's +8 y zero-apron). Identity patches factor per axis, so the
    only sizable op is one [bz*(box+8), 64] x [64, 16] f32 matmul per
    row; y and z finish as 11 broadcast-reduces and one tiny matmul.
    Replaces the XLA vmap'd dynamic_slice box gather (gather engine,
    ~42 GB/s) and skips candidate-padding rows via the live count.
    """
    bz, by_dma, xp = slab_s.shape[1], slab_s.shape[2], slab_s.shape[3]
    i = pl.program_id(0)
    n = pl.num_programs(0)
    cnt = cnt_ref[0]

    def copy(row, slot):
        l, z0, ya = offs_ref[0, row], offs_ref[1, row], offs_ref[2, row]
        return pltpu.make_async_copy(
            g_ref.at[l, pl.ds(z0, bz), pl.ds(ya * y_align, by_dma), :],
            slab_s.at[slot],
            sem.at[slot],
        )

    @pl.when((i == 0) & (cnt > 0))
    def _():
        copy(0, 0).start()

    @pl.when((i + 1 < n) & (i + 1 < cnt))
    def _():
        copy(i + 1, (i + 1) % 2).start()

    @pl.when(i < cnt)
    def _():
        copy(i, i % 2).wait()
        x0 = offs_ref[3, i]
        y_hi = offs_ref[4, i].astype(jnp.float32)

        # bf16 slabs upcast in VMEM before the roll (Mosaic's dynamic
        # rotate is 32-bit only); a same-dtype astype is a no-op for f32
        rolled = pltpu.roll(slab_s[i % 2].astype(jnp.float32), -x0, 2)
        win = rolled[..., :_XWIN]  # [bz, by_dma, 64]

        nv = ux_ref.shape[-1]  # 16 (11 taps + lane padding)
        axt = _taps_transposed(ux_ref[0, 0], _XWIN, float(_XWIN - 2))  # [64, 16]
        ayt = _taps_transposed(uy_ref[0, 0], by_dma, y_hi)  # [by_dma, 16]
        aztr = _taps_transposed(uz_ref[0, 0], bz, bz - 2.0)  # [bz, 16]

        t1 = jnp.dot(
            win.reshape(bz * by_dma, _XWIN), axt,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(bz, by_dma, nv)
        # y: 11 broadcast-reduces into a [bz, 11*16] plane, then z as one
        # tiny matmul
        t2 = jnp.concatenate(
            [
                # static lane slice (scalar indexing lowers to a Mosaic
                # gather, which doesn't support this shape)
                (t1 * jax.lax.slice_in_dim(ayt, iy, iy + 1, axis=1)[None]).sum(axis=1)
                for iy in range(PATCH_DIM)
            ],
            axis=-1,
        )  # [bz, 11*16]
        out_ref[0] = jnp.dot(
            aztr.T[:PATCH_DIM], t2, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [11, 11*16]


def sample_patches_identity_slab(
    gstack: jnp.ndarray,  # [L, Z, Y, X]
    lvl: jnp.ndarray,  # [R] int32
    centers: jnp.ndarray,  # [R, 3] (x, y, z)
    scales: jnp.ndarray,  # [R]
    count: jnp.ndarray | None = None,  # live-row PREFIX; rows >= count skipped
    interpret: bool = False,
    logical_dims=None,
) -> jnp.ndarray:
    """TPU identity-patch sampler with in-kernel slab DMA (see
    _id_slab_kernel). Same contract and f32 numerics model as
    sample_patches_identity_boxed. Requires zd >= 40, yd >= 40, xd >= 64
    (gather_stage falls back to the boxed sampler on tiny octaves).

    logical_dims: (zd, yd, xd) when gstack is ALREADY in the slab-DMA
    layout (y padded +8, x to a 128 multiple — pad_gstack_slab); the
    ~35 ms-per-octave-batch pad copy is then skipped. Without it the
    sampler pads internally."""
    gs_p, (zd, yd, xd), padded, apron = _slab_input(gstack, logical_dims)
    box = _BOX
    bz, by_dma = box, box + apron
    xp = gs_p.shape[-1]
    r = centers.shape[0]

    z0 = jnp.clip(jnp.floor(centers[:, 2]).astype(jnp.int32) - bz // 2, 0, zd - bz)
    y0 = jnp.clip(jnp.floor(centers[:, 1]).astype(jnp.int32) - box // 2, 0, yd - box)
    ya = y0 // apron
    x0 = jnp.clip(
        jnp.floor(centers[:, 0]).astype(jnp.int32) - _XWIN // 2, 0, xd - _XWIN
    )
    y_hi = jnp.minimum((yd - 2) - ya * apron, by_dma - 2)
    offs = jnp.stack([lvl, z0, ya, x0, y_hi], axis=0).astype(jnp.int32)
    cnt = (
        jnp.full((1,), r, jnp.int32)
        if count is None
        else jnp.asarray(count, jnp.int32).reshape(1)
    )

    # per-axis continuous sample coords (11 taps padded to 16 lanes),
    # local to the slab origin on y/z and to the roll window on x
    fac = 2.0 * scales / float(PATCH_RAD)
    offs11 = jnp.arange(PATCH_DIM, dtype=jnp.float32) - PATCH_RAD

    def locals16(coord, org):
        u = coord[:, None] + offs11[None, :] * fac[:, None]
        u = u - org[:, None].astype(jnp.float32)
        # [R, 1, 16]: Mosaic requires the last two block dims to equal the
        # array dims (or be 8/128-multiples), so the per-row vector rides
        # in a singleton middle axis
        return jnp.pad(u, ((0, 0), (0, 16 - PATCH_DIM)))[:, None, :]

    ux = locals16(centers[:, 0], x0)
    uy = locals16(centers[:, 1], ya * apron)
    uz = locals16(centers[:, 2], z0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda i, o, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, 16), lambda i, o, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, 16), lambda i, o, c: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # padded gstack stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, PATCH_DIM, PATCH_DIM * 16), lambda i, o, c: (i, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bz, by_dma, xp), gs_p.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vals = pl.pallas_call(
        functools.partial(_id_slab_kernel, apron),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (r, PATCH_DIM, PATCH_DIM * 16), jnp.float32
        ),
        interpret=interpret,
    )(offs, cnt, ux, uy, uz, gs_p)

    return vals.reshape(r, PATCH_DIM, PATCH_DIM, 16)[..., :PATCH_DIM]


def pad_gstack_slab(gstack: jnp.ndarray, apron: int = 8) -> jnp.ndarray:
    """Pad a [..., Z, Y, X] Gaussian stack into the slab-DMA layout the
    identity and rotated samplers require: +apron y rows (the provably
    apron-aligned slab origin can round down up to apron-1 rows), x to
    the 128-lane tile. Producers (extract._phase1_program on TPU) pay
    this copy ONCE; both samplers then take `logical_dims` and skip
    their internal pads (~35 ms per o0 batch-12 program each)."""
    xd = gstack.shape[-1]
    xp = -(-xd // 128) * 128
    pad = [(0, 0)] * (gstack.ndim - 2) + [(0, apron), (0, xp - xd)]
    return jnp.pad(gstack, pad)


def _slab_input(gstack, logical_dims):
    """Resolve (padded stack, logical dims, was_prepadded, y apron) for
    a slab sampler: with logical_dims the input must already be in
    pad_gstack_slab layout; otherwise pad here.

    The y apron doubles as the slab origin alignment, and Mosaic's DMA
    sublane-alignment requirement is dtype-tiled: 8 rows for f32
    (8, 128) tiles, 16 for bf16 (16, 128) tiles (SIFT3D_BF16_GSTACK)."""
    if logical_dims is not None:
        zd, yd, xd = logical_dims
        assert gstack.dtype == jnp.float32, "prepad layout is f32-only"
        assert gstack.shape[-2] == yd + 8 and gstack.shape[-1] % 128 == 0, (
            gstack.shape, logical_dims,
        )
        return gstack, (zd, yd, xd), True, 8
    zd, yd, xd = gstack.shape[-3:]
    apron = 16 if gstack.dtype == jnp.bfloat16 else 8
    return pad_gstack_slab(gstack, apron), (zd, yd, xd), False, apron


def unpad_gstack_slab(gstack, logical_dims):
    """Slice a pad_gstack_slab-layout stack back to its logical extent
    (for the boxed/XLA fallback paths, which index the true volume)."""
    if logical_dims is None:
        return gstack
    zd, yd, xd = logical_dims
    return gstack[..., :zd, :yd, :xd]


def _id_slab_ok(dims) -> bool:
    zd, yd, xd = dims
    return zd >= _BOX and yd >= _BOX and xd >= _XWIN


def sample_patches_identity(gstack, lvl, centers, scales, count=None, logical_dims=None):
    """Identity-patch sampling: slab-DMA Pallas kernel on TPU (boxed XLA
    slices where the slab does not fit or off-TPU).

    `count`, when given, must be the length of a PREFIX of live rows:
    the TPU kernel skips rows >= count entirely and leaves their output
    uninitialized (the extract pipeline pads candidate chunks at the
    tail, so valid rows always form a prefix).

    logical_dims: see sample_patches_identity_slab (pre-padded input)."""
    import os

    # default on TPU: validated bit-exact vs the boxed sampler on real
    # Mosaic (max diff 5e-7 at HIGHEST matmul precision) and measured
    # 2.4x faster in isolation (16 vs 38 ms per 4096-row chunk on v5e) —
    # it became the phase-2a critical path once the row-compaction
    # rewrite removed the mask-nonzero bottleneck. SIFT3D_NO_SLAB_IDENTITY
    # reverts to the boxed XLA path.
    dims = logical_dims if logical_dims is not None else gstack.shape[-3:]
    if (
        jax.default_backend() == "tpu"
        and _id_slab_ok(dims)
        and not os.environ.get("SIFT3D_NO_SLAB_IDENTITY")
    ):
        return sample_patches_identity_slab(
            gstack, lvl, centers, scales, count=count, logical_dims=logical_dims
        )
    return sample_patches_identity_boxed(
        unpad_gstack_slab(gstack, logical_dims), lvl, centers, scales
    )


_RBOX = 64  # rotated-patch box (covers sqrt(3) * max patch extent)
_RBOX_SMALL = 48  # small-scale bucket: 2.4x fewer MXU FLOPs than 64^3, and
# its threshold scale 6.50 covers nearly every emitted row in practice
# (the quadratic scale interpolation rarely pushes octave-grid scale
# past ~6.3); 64^3 remains the correctness fallback for the tail
_RBOX_TINY = 24  # tiny-scale bucket (threshold scale 3.03 — the bulk of
# emitted rows): with _XWIN_TINY it packs 4 y rows per lane group, so the
# slab kernel's K (and its VPU-bound weight build) drops 3.5x vs the
# 48-box, 64-window configuration
_XWIN_TINY = 32


def rbox_max_scale(box: int) -> float:
    """Largest feature scale a box^3 bounding box covers exactly.

    Rotated patch points reach |(5,5,5)| * step = 5*sqrt(3) * (2*scale/5)
    = 2*sqrt(3)*scale from the center (the 11^3 grid corner under the
    worst-case rotation), and the 2-tap interpolation needs floor(l-0.5)
    and +1 in range: 2*sqrt(3)*scale + 1.5 <= box/2. Rows above this
    scale must use a larger box or taps saturate at the box edge.
    """
    return (box / 2.0 - 1.5) / (2.0 * float(np.sqrt(3.0)))


def sample_patches_rotated_boxed(
    gstack: jnp.ndarray,  # [L, Z, Y, X]
    lvl: jnp.ndarray,  # [R] int32
    centers: jnp.ndarray,  # [R, 3] (x, y, z)
    scales: jnp.ndarray,  # [R]
    oris: jnp.ndarray,  # [R, 3, 3]
    box: int = _RBOX,
) -> jnp.ndarray:
    """Rotated patches via per-row box slices + one-hot MXU contractions.

    Trilinear interpolation factors per axis even for rotated sample
    points: value = sum_Z az[Z] sum_Y ay[Y] sum_X ax[X] box[Z,Y,X] with
    2-tap per-axis factors. Materializing the factors per point-chunk and
    contracting on the MXU replaces the random 8-corner gathers (the
    TPU's slowest op class) with matmuls. Box origins clamp to the volume
    so border saturation matches the reference; the reference's
    x-out-of-volume -> 0 rule is applied from global coordinates.
    """
    nl, zd, yd, xd = gstack.shape
    bz, by, bx = min(box, zd), min(box, yd), min(box, xd)
    r = centers.shape[0]

    grid = jnp.asarray(_GRID)  # [V, 3] (x, y, z)
    ori_inv = invert_3x3(oris)
    rotated = jnp.einsum("cij,vj->cvi", ori_inv, grid)
    fac = (2.0 * scales / float(PATCH_RAD))[:, None, None]
    coords = rotated * fac + centers[:, None, :]  # [R, V, 3] global (x, y, z)

    def origin(c, dim, b):
        return jnp.clip(jnp.floor(c).astype(jnp.int32) - b // 2, 0, max(dim - b, 0))

    ox = origin(centers[:, 0], xd, bx)
    oy = origin(centers[:, 1], yd, by)
    oz = origin(centers[:, 2], zd, bz)

    def taps(u_local, b):
        # 2-tap linear weights (0.5-center convention with border clamp)
        i0 = jnp.clip(jnp.floor(u_local - 0.5).astype(jnp.int32), 0, b - 2)
        w0 = jnp.clip(1.0 - (u_local - 0.5 - i0.astype(jnp.float32)), 0.0, 1.0)
        bins = jnp.arange(b)
        a = w0[..., None] * (bins == i0[..., None])
        return a + (1.0 - w0)[..., None] * (bins == (i0 + 1)[..., None])

    # bf16x3 (HIGH) multiply passes: the box contraction is FLOP-bound on
    # the MXU (~180 GFLOP per 256-row chunk at box 64) and true-f32
    # (HIGHEST) runs ~3x slower; ~2^-21 relative error is far below the
    # trilinear model error and these patches feed only descriptors
    kw = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGH)
    v_total = coords.shape[1]
    cv = 121  # 1331 = 11 point-chunks of 121
    n_vc = v_total // cv
    rc = min(256, r)  # row chunk bounds the [rc, cv, by, bx] transient
    n_rc = r // rc

    def row_chunk(args):
        lvl_c, oz_c, oy_c, ox_c, coords_cc = args

        def slice_one(l, z0, y0, x0):
            return jax.lax.dynamic_slice(gstack, (l, z0, y0, x0), (1, bz, by, bx))[0]

        boxes = jax.vmap(slice_one)(lvl_c, oz_c, oy_c, ox_c)  # [rc, bz, by, bx]

        def v_chunk(carry, cc):
            lx = cc[..., 0] - ox_c[:, None].astype(jnp.float32)
            ly = cc[..., 1] - oy_c[:, None].astype(jnp.float32)
            lz = cc[..., 2] - oz_c[:, None].astype(jnp.float32)
            az = taps(lz, bz)  # [rc, cv, bz]
            ay = taps(ly, by)
            ax = taps(lx, bx)
            t1 = jnp.einsum("rZYX,rvZ->rvYX", boxes, az, **kw)
            t2 = (t1 * ay[..., :, None]).sum(axis=-2)  # [rc, cv, bx]
            val = (t2 * ax).sum(axis=-1)  # [rc, cv]
            # reference x-rule: out-of-volume in x reads as zero (quirk 4)
            val = jnp.where((cc[..., 0] < 0) | (cc[..., 0] >= xd), 0.0, val)
            return carry, val

        cc = coords_cc.reshape(rc, n_vc, cv, 3).transpose(1, 0, 2, 3)
        _, vals = jax.lax.scan(v_chunk, None, cc)  # [n_vc, rc, cv]
        return vals.transpose(1, 0, 2).reshape(rc, v_total)

    args = (
        lvl.reshape(n_rc, rc),
        oz.reshape(n_rc, rc),
        oy.reshape(n_rc, rc),
        ox.reshape(n_rc, rc),
        coords.reshape(n_rc, rc, v_total, 3),
    )
    vals = jax.lax.map(row_chunk, args)  # [n_rc, rc, V]
    return vals.reshape(r, PATCH_DIM, PATCH_DIM, PATCH_DIM)


_VPAD = 1536  # 1331 patch points padded to 6 lane-chunks of 256
_VCHUNK = 256


def _rot_kernel(by: int, bx: int, lz_ref, ly_ref, lx_ref, box_ref, out_ref):
    """Per (row, point-chunk) step: trilinear sampling of rotated patch
    points from the row's VMEM-resident bounding box.

    The XLA formulation of the same contraction round-trips its
    [rows, points, by, bx] transients through HBM (~45 bytes of HBM
    traffic per FLOP — measured 454 ms at an 8192-row emission). Here the
    in-plane (y, x) taps combine into one 4-sparse [by*bx, 256] weight
    built from sublane broadcasts, a single MXU matmul contracts it with
    the box, and the z taps finish as a small VPU reduce — one matmul per
    point-chunk, every transient in VMEM.
    """
    bz, byx = box_ref.shape[1], box_ref.shape[2]
    v = pl.program_id(1)

    def taps_t(l, b):
        # transposed 2-tap linear weights [b, nv] (0.5-center convention)
        i0 = jnp.clip(jnp.floor(l - 0.5), 0.0, b - 2.0)
        w0 = jnp.clip(1.0 - (l - 0.5 - i0), 0.0, 1.0)
        i0i = i0.astype(jnp.int32)
        k = jax.lax.broadcasted_iota(jnp.int32, (b, l.shape[0]), 0)
        return jnp.where(k == i0i[None, :], w0[None, :], 0.0) + jnp.where(
            k == i0i[None, :] + 1, 1.0 - w0[None, :], 0.0
        )

    nv = out_ref.shape[2]
    azt = taps_t(lz_ref[0, v, :], bz)  # [bz, nv] f32
    ayt = taps_t(ly_ref[0, v, :], by).astype(jnp.bfloat16)
    axt = taps_t(lx_ref[0, v, :], bx).astype(jnp.bfloat16)
    # build the combined in-plane weight in bf16: the [byx, nv] broadcasts
    # and product are the kernel's VPU bottleneck, and bf16 packs 2/lane
    ay = jnp.broadcast_to(ayt[:, None, :], (by, bx, nv)).reshape(byx, nv)
    ax = jnp.broadcast_to(axt[None, :, :], (by, bx, nv)).reshape(byx, nv)
    wyx = ay * ax  # 4 nonzero sublanes per point
    # [bz, byx] @ [byx, nv]: the only contraction touching box data
    tyx = jnp.dot(box_ref[0], wyx, preferred_element_type=jnp.float32)
    out_ref[0, v, :] = jnp.sum(tyx * azt, axis=0)


def sample_patches_rotated_pallas(
    gstack: jnp.ndarray,  # [L, Z, Y, X]
    lvl: jnp.ndarray,  # [R] int32
    centers: jnp.ndarray,  # [R, 3] (x, y, z)
    scales: jnp.ndarray,  # [R]
    oris: jnp.ndarray,  # [R, 3, 3]
    interpret: bool = False,
    box: int = _RBOX,
) -> jnp.ndarray:
    """Pallas-TPU rotated patch sampler (same contract and numerics model
    as sample_patches_rotated_boxed; bf16 tap/box precision, ~2^-9
    relative — the patches feed only rank-ordered descriptors).

    `box` bounds the per-row slice; callers bucket rows by scale
    (rbox_max_scale) so small-scale rows pay a 48^3 contraction instead
    of 64^3 (2.4x fewer MXU FLOPs)."""

    nl, zd, yd, xd = gstack.shape
    bz, by, bx = min(box, zd), min(box, yd), min(box, xd)
    byx = by * bx
    r = centers.shape[0]

    grid_pts = jnp.asarray(_GRID)  # [V, 3] (x, y, z)
    ori_inv = invert_3x3(oris)
    rotated = jnp.einsum("cij,vj->cvi", ori_inv, grid_pts)
    fac = (2.0 * scales / float(PATCH_RAD))[:, None, None]
    coords = rotated * fac + centers[:, None, :]  # [R, V, 3] global (x, y, z)

    def origin(c, dim, b):
        return jnp.clip(jnp.floor(c).astype(jnp.int32) - b // 2, 0, max(dim - b, 0))

    ox = origin(centers[:, 0], xd, bx)
    oy = origin(centers[:, 1], yd, by)
    oz = origin(centers[:, 2], zd, bz)

    v_total = coords.shape[1]
    rc = min(256, r)
    n_rc = r // rc
    n_vc = _VPAD // _VCHUNK

    def row_chunk(args):
        lvl_c, oz_c, oy_c, ox_c, coords_c = args

        def slice_one(l, z0, y0, x0):
            return jax.lax.dynamic_slice(gstack, (l, z0, y0, x0), (1, bz, by, bx))[0]

        boxes = jax.vmap(slice_one)(lvl_c, oz_c, oy_c, ox_c)  # [rc, bz, by, bx]
        # natural z-major layout: the matmul contracts over flattened (y, x)
        boxes2d = boxes.reshape(rc, bz, byx).astype(jnp.bfloat16)

        def local(axis, org):
            l = coords_c[..., axis] - org[:, None].astype(jnp.float32)  # [rc, V]
            return jnp.pad(l, ((0, 0), (0, _VPAD - v_total))).reshape(rc, n_vc, _VCHUNK)

        lx_l, ly_l, lz_l = local(0, ox_c), local(1, oy_c), local(2, oz_c)

        vals = pl.pallas_call(
            functools.partial(_rot_kernel, by, bx),
            grid=(rc, n_vc),
            in_specs=[
                pl.BlockSpec((1, n_vc, _VCHUNK), lambda i, v: (i, 0, 0)),
                pl.BlockSpec((1, n_vc, _VCHUNK), lambda i, v: (i, 0, 0)),
                pl.BlockSpec((1, n_vc, _VCHUNK), lambda i, v: (i, 0, 0)),
                pl.BlockSpec((1, bz, byx), lambda i, v: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, n_vc, _VCHUNK), lambda i, v: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((rc, n_vc, _VCHUNK), jnp.float32),
            interpret=interpret,
        )(lz_l, ly_l, lx_l, boxes2d)

        vals = vals.reshape(rc, _VPAD)[:, :v_total]
        # reference x-rule: out-of-volume in x reads as zero (quirk 4)
        gx = coords_c[..., 0]
        return jnp.where((gx < 0) | (gx >= xd), 0.0, vals)

    args = (
        lvl.reshape(n_rc, rc),
        oz.reshape(n_rc, rc),
        oy.reshape(n_rc, rc),
        ox.reshape(n_rc, rc),
        coords.reshape(n_rc, rc, v_total, 3),
    )
    vals = jax.lax.map(row_chunk, args)  # [n_rc, rc, V]
    return vals.reshape(r, PATCH_DIM, PATCH_DIM, PATCH_DIM)


_XWIN = 64  # x sampling window (covers 2*sqrt(3)*8.06 + 1.5 < 32 half-width)
_SLAB_VCHUNK = 128  # point chunk inside the slab kernel (VMEM headroom)


def _rot_slab_kernel(xwin, y_align, offs_ref, cnt_ref, lz_ref, ly_ref, lx_ref,
                     g_ref, out_ref, slab_s, sem):
    """Per-row step: DMA a full-x slab of the row's bounding region
    HBM->VMEM (double-buffered across rows), compact the x window with a
    dynamic lane roll, and trilinear-sample all patch points as MXU
    matmuls.

    Replaces the XLA box extraction (vmap'd dynamic_slice -> gather
    engine + HBM round-trip: 85 ms of the sampler's 111 ms at an
    8192-row emission). Mosaic DMA constraints shape the design: the
    lane (x) dim cannot be sliced at sub-128 granularity and the
    second-minor (y) offset must be PROVABLY 8-aligned, so the DMA
    fetches [bz, box+8, Xp] at y0a = 8*(y0//8) (the +8 apron absorbs the
    alignment round-down; the caller zero-pads 8 rows past yd) and the
    xwin-wide x window is cut in-VMEM by pltpu.roll. 128 // xwin y rows
    pack per 128-lane group (an xwin window plus its +1 tap needs only
    xwin - 15 lanes), so the matmul contracts K = (box+8) * xwin instead
    of box * Xp — and the in-kernel [K, nv] weight build, the kernel's
    VPU bottleneck, shrinks by the same factor. Rows past the live count
    (cnt_ref) skip their DMA and compute entirely: emission capacities
    are power-of-2 padded, so sampler cost tracks the real row count.
    """
    bz, by_dma, xp = slab_s.shape[1], slab_s.shape[2], slab_s.shape[3]
    pack = 128 // xwin
    kk = (by_dma // pack) * 128
    i = pl.program_id(0)
    n = pl.num_programs(0)
    cnt = cnt_ref[0]

    def copy(row, slot):
        # offs is [5, R] (SMEM pads the minor dim to 128 lanes, so the
        # row-major [R, 5] layout would cost R*512 bytes of SMEM)
        l, z0, ya = offs_ref[0, row], offs_ref[1, row], offs_ref[2, row]
        return pltpu.make_async_copy(
            g_ref.at[l, pl.ds(z0, bz), pl.ds(ya * y_align, by_dma), :],
            slab_s.at[slot],
            sem.at[slot],
        )

    @pl.when((i == 0) & (cnt > 0))
    def _():
        copy(0, 0).start()

    @pl.when((i + 1 < n) & (i + 1 < cnt))
    def _():
        copy(i + 1, (i + 1) % 2).start()

    @pl.when(i < cnt)
    def _():
        copy(i, i % 2).wait()
        x0 = offs_ref[3, i]
        # y taps saturate at the volume border inside the slab: the 8-row
        # apron past yd is zero pad and must stay at weight zero
        y_hi = offs_ref[4, i].astype(jnp.float32)
        # pack y rows into 128-lane groups: lanes [g*xwin, (g+1)*xwin)
        # carry y-group-member g's window (roll is cyclic per pack*xp row,
        # so every window lands at a static lane offset; the roll must
        # stay f32 - Mosaic's dynamic rotate is 32-bit only)
        # bf16 slabs upcast in VMEM before the roll (Mosaic's dynamic
        # rotate is 32-bit only); a same-dtype astype is a no-op for f32
        slab2 = slab_s[i % 2].astype(jnp.float32).reshape(
            bz, by_dma // pack, pack * xp
        )
        rolled = pltpu.roll(slab2, -x0, 2)
        win = jnp.concatenate(
            [rolled[..., g * xp : g * xp + xwin] for g in range(pack)], axis=-1
        )
        boxv = win.reshape(bz, kk).astype(jnp.bfloat16)

        n_vc, nv = lz_ref.shape[1], lz_ref.shape[2]
        for v in range(n_vc):
            azt = _taps_transposed(lz_ref[0, v, :], bz, bz - 2.0)  # [bz, nv]
            ayt = _taps_transposed(ly_ref[0, v, :], by_dma, y_hi).astype(
                jnp.bfloat16
            )
            axt = _taps_transposed(lx_ref[0, v, :], xwin, float(xwin - 2)).astype(
                jnp.bfloat16
            )
            # the packed K layout is (y-group, y-member, dx), so both weight
            # factors broadcast straight into it: ayt rows group as
            # (by_dma/pack, pack) and repeat over the xwin dx lanes; axt
            # repeats over all by_dma (group, member) rows
            ay = jnp.broadcast_to(
                ayt.reshape(by_dma, 1, nv), (by_dma, xwin, nv)
            ).reshape(kk, nv)
            ax = jnp.broadcast_to(
                axt[None, :, :], (by_dma, xwin, nv)
            ).reshape(kk, nv)
            wyx = ay * ax  # 4 nonzeros per point
            tyx = jnp.dot(boxv, wyx, preferred_element_type=jnp.float32)
            out_ref[0, v, :] = jnp.sum(tyx * azt, axis=0)


def sample_patches_rotated_slab(
    gstack: jnp.ndarray,  # [L, Z, Y, X]
    lvl: jnp.ndarray,  # [R] int32
    centers: jnp.ndarray,  # [R, 3] (x, y, z)
    scales: jnp.ndarray,  # [R]
    oris: jnp.ndarray,  # [R, 3, 3]
    box: int = _RBOX_SMALL,
    count: jnp.ndarray | None = None,  # live-row PREFIX; rows >= count skipped
    interpret: bool = False,
    xwin: int = _XWIN,
    logical_dims=None,
) -> jnp.ndarray:
    """TPU rotated patch sampler with in-kernel slab DMA (see
    _rot_slab_kernel). Same contract and numerics model as
    sample_patches_rotated_boxed. Requires zd >= box, yd >= box,
    xd >= xwin, box <= 48 (VMEM bound; see _slab_ok) — the emit path
    falls back to the boxed-slice kernel otherwise. The 8-aligned y
    origin may reach up to 8 rows past yd, covered by the zero apron
    (padded here, or already present when logical_dims marks the input
    as pad_gstack_slab layout). xwin (64 or 32) bounds the x extent a
    row may reach (rbox_max_scale of min(box, xwin)); 32 packs 4 y rows
    per lane group and roughly halves the kernel's per-row cost vs 64."""
    gs_p, (zd, yd, xd), _, apron = _slab_input(gstack, logical_dims)
    bz, by_dma = box, box + apron
    assert xwin in (32, 64) and by_dma % (128 // xwin) == 0, (box, xwin)
    xp = gs_p.shape[-1]
    r = centers.shape[0]

    grid_pts = jnp.asarray(_GRID)  # [V, 3] (x, y, z)
    ori_inv = invert_3x3(oris)
    rotated = jnp.einsum("cij,vj->cvi", ori_inv, grid_pts)
    fac = (2.0 * scales / float(PATCH_RAD))[:, None, None]
    coords = rotated * fac + centers[:, None, :]  # [R, V, 3] global (x, y, z)

    # gs_p carries the +8 y apron (the 8-aligned slab origin can push the
    # DMA up to 8 rows past yd) and the 128-lane x tile — padded by
    # _slab_input above unless the caller passed pad_gstack_slab layout
    z0 = jnp.clip(jnp.floor(centers[:, 2]).astype(jnp.int32) - bz // 2, 0, zd - bz)
    y0 = jnp.clip(jnp.floor(centers[:, 1]).astype(jnp.int32) - box // 2, 0, yd - box)
    # provably apron-aligned slab origin: rounding down costs <= apron-1
    # rows, the +apron apron keeps [y0, y0+box) covered; reads never
    # pass yd + apron
    ya = y0 // apron
    x0 = jnp.clip(
        jnp.floor(centers[:, 0]).astype(jnp.int32) - xwin // 2, 0, xd - xwin
    )
    y_hi = jnp.minimum((yd - 2) - ya * apron, by_dma - 2)
    offs = jnp.stack([lvl, z0, ya, x0, y_hi], axis=0).astype(jnp.int32)
    cnt = (
        jnp.full((1,), r, jnp.int32)
        if count is None
        else jnp.asarray(count, jnp.int32).reshape(1)
    )

    v_total = coords.shape[1]
    n_vc = _VPAD // _SLAB_VCHUNK

    def local(axis, org):
        l = coords[..., axis] - org[:, None].astype(jnp.float32)  # [R, V]
        return jnp.pad(l, ((0, 0), (0, _VPAD - v_total))).reshape(
            r, n_vc, _SLAB_VCHUNK
        )

    lx_l = local(0, x0)
    ly_l = local(1, ya * apron)
    lz_l = local(2, z0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, n_vc, _SLAB_VCHUNK), lambda i, o, c: (i, 0, 0)),
            pl.BlockSpec((1, n_vc, _SLAB_VCHUNK), lambda i, o, c: (i, 0, 0)),
            pl.BlockSpec((1, n_vc, _SLAB_VCHUNK), lambda i, o, c: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # padded gstack stays in HBM
        ],
        out_specs=pl.BlockSpec((1, n_vc, _SLAB_VCHUNK), lambda i, o, c: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, bz, by_dma, xp), gs_p.dtype),  # two slab buffers
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vals = pl.pallas_call(
        functools.partial(_rot_slab_kernel, xwin, apron),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, n_vc, _SLAB_VCHUNK), jnp.float32),
        interpret=interpret,
    )(offs, cnt, lz_l, ly_l, lx_l, gs_p)

    vals = vals.reshape(r, _VPAD)[:, :v_total]
    # reference x-rule: out-of-volume in x reads as zero (quirk 4)
    gx = coords[..., 0]
    vals = jnp.where((gx < 0) | (gx >= xd), 0.0, vals)
    return vals.reshape(r, PATCH_DIM, PATCH_DIM, PATCH_DIM)


def _slab_ok(dims, box: int, xwin: int = _XWIN) -> bool:
    zd, yd, xd = dims
    return box <= 48 and zd >= box and yd >= box and xd >= xwin


def sample_patches_rotated(
    gstack, lvl, centers, scales, oris, box=_RBOX, count=None, xwin=_XWIN,
    logical_dims=None,
):
    """Rotated-patch sampling: slab-DMA Pallas kernel on TPU (boxed-slice
    Pallas kernel where the slab does not fit), boxed XLA contraction
    elsewhere (or with SIFT3D_NO_PALLAS_ROTATED=1).

    logical_dims: see sample_patches_rotated_slab (pre-padded input)."""
    import os

    dims = logical_dims if logical_dims is not None else gstack.shape[-3:]
    if jax.default_backend() == "tpu" and not os.environ.get(
        "SIFT3D_NO_PALLAS_ROTATED"
    ):
        if _slab_ok(dims, box, xwin) and not os.environ.get("SIFT3D_NO_SLAB_ROTATED"):
            return sample_patches_rotated_slab(
                gstack, lvl, centers, scales, oris, box=box, count=count,
                xwin=xwin, logical_dims=logical_dims,
            )
        return sample_patches_rotated_pallas(
            unpad_gstack_slab(gstack, logical_dims), lvl, centers, scales, oris,
            box=box,
        )
    return sample_patches_rotated_boxed(
        unpad_gstack_slab(gstack, logical_dims), lvl, centers, scales, oris, box=box
    )


def normalize_patches(patches: jnp.ndarray) -> jnp.ndarray:
    """Subtract mean, unit L2 norm (Feature3D::NormalizeData)."""
    n = patches.shape[0]
    flat = patches.reshape(n, -1)
    centered = flat - flat.mean(axis=1, keepdims=True)
    norm = jnp.sqrt((centered * centered).sum(axis=1, keepdims=True))
    return (centered / jnp.where(norm > 0, norm, 1.0)).reshape(patches.shape)


def patch_gradients(patches: jnp.ndarray) -> jnp.ndarray:
    """Central differences, zero borders; returns [C, 3(dx,dy,dz), 11,11,11]."""
    def cd(axis):
        p = patches
        hi = jnp.roll(p, -1, axis=axis)
        lo = jnp.roll(p, 1, axis=axis)
        g = hi - lo
        # zero the borders of every axis (reference computes interior only)
        mask = jnp.ones(patches.shape[1:], dtype=bool)
        for ax in range(3):
            idx = [slice(None)] * 3
            idx[ax] = 0
            mask = mask.at[tuple(idx)].set(False)
            idx[ax] = -1
            mask = mask.at[tuple(idx)].set(False)
        return jnp.where(mask, g, 0.0)

    # patches are [C, z, y, x]: dx is along axis 3, dy axis 2, dz axis 1
    return jnp.stack([cd(3), cd(2), cd(1)], axis=1)


def sphere_mask() -> np.ndarray:
    """Static voxels-within-radius mask: (v-5)^2 sum < 25 (strict),
    matching MultiScale.cpp:2584 with fRadius = 11/2 = 5 (int division)."""
    r = np.arange(PATCH_DIM) - PATCH_RAD
    zz, yy, xx = np.meshgrid(r, r, r, indexing="ij")
    return (zz * zz + yy * yy + xx * xx) < PATCH_RAD * PATCH_RAD


def sym_eigs_3x3(a: jnp.ndarray):
    """Closed-form batched symmetric 3x3 eigendecomposition (descending).

    Trigonometric eigenvalues (the standard stable Cardano form) + Eberly's
    robust eigenvector scheme, replacing XLA's iterative jnp.linalg.eigh
    whose batched lowering costs ~30 ms at C=8k on TPU (vs ~1 ms of actual
    arithmetic here). Returns (eigs [C, 3] descending, vecs [C, 3, 3]
    orthonormal columns, right-handed).

    Eigenvector order of operations (Eberly, "A Robust Eigensolver for 3x3
    Symmetric Matrices"): the sign of the normalized half-determinant says
    which extreme eigenvalue is guaranteed simple (r >= 0 -> e0, else e2);
    that one's eigenvector comes from the largest row cross product of
    (A - lambda I) (rank 2 there, so crosses are well conditioned). The
    middle eigenvector is the null vector of (A - e1 I) projected onto the
    simple vector's orthogonal plane — a 2x2 solve that degrades gracefully
    to "any vector in the plane" when e1 is itself degenerate (valid, same
    freedom eigh has). The third is their cross product.
    """
    f64 = a.astype(jnp.float64) if jax.config.jax_enable_x64 else a
    a00, a11, a22 = f64[..., 0, 0], f64[..., 1, 1], f64[..., 2, 2]
    a01, a02, a12 = f64[..., 0, 1], f64[..., 0, 2], f64[..., 1, 2]

    # scale for numerical range (structure tensors span many decades)
    s = jnp.maximum(
        jnp.max(jnp.abs(jnp.stack([a00, a11, a22, a01, a02, a12], -1)), -1), 1e-30
    )
    b00, b11, b22 = a00 / s, a11 / s, a22 / s
    b01, b02, b12 = a01 / s, a02 / s, a12 / s

    q = (b00 + b11 + b22) / 3.0
    p1 = b01 * b01 + b02 * b02 + b12 * b12
    p2 = (b00 - q) ** 2 + (b11 - q) ** 2 + (b22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-38))
    c00, c11, c22 = (b00 - q) / p, (b11 - q) / p, (b22 - q) / p
    c01, c02, c12 = b01 / p, b02 / p, b12 / p
    detb = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e0 = q + 2.0 * p * jnp.cos(phi)  # largest
    e2 = q + 2.0 * p * jnp.cos(phi + 2.0 * np.pi / 3.0)  # smallest
    e1 = 3.0 * q - e0 - e2
    # exactly diagonal-dominant degenerate case (p2 ~ 0): all eigs = q
    degen = p2 < 1e-30
    e0 = jnp.where(degen, q, e0)
    e1 = jnp.where(degen, q, e1)
    e2 = jnp.where(degen, q, e2)

    b = jnp.stack(
        [
            jnp.stack([b00, b01, b02], -1),
            jnp.stack([b01, b11, b12], -1),
            jnp.stack([b02, b12, b22], -1),
        ],
        -2,
    )  # [..., 3, 3] scaled symmetric

    def null_vec(lam, fallback):
        m = b - lam[..., None, None] * jnp.eye(3, dtype=b.dtype)
        r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
        c01_ = jnp.cross(r0, r1)
        c02_ = jnp.cross(r0, r2)
        c12_ = jnp.cross(r1, r2)
        n01 = (c01_ * c01_).sum(-1)
        n02 = (c02_ * c02_).sum(-1)
        n12 = (c12_ * c12_).sum(-1)
        best = jnp.where(
            (n01 >= n02)[..., None] & (n01 >= n12)[..., None],
            c01_,
            jnp.where((n02 >= n12)[..., None], c02_, c12_),
        )
        nb = jnp.maximum(n01, jnp.maximum(n02, n12))
        ok = nb > 1e-24
        v = best / jnp.sqrt(jnp.where(ok, nb, 1.0))[..., None]
        return jnp.where(ok[..., None], v, fallback)

    def orth_plane(w):
        # unit w -> orthonormal u, v spanning its orthogonal plane
        wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
        use_x = jnp.abs(wx) > jnp.abs(wy)
        inv_xz = 1.0 / jnp.sqrt(jnp.maximum(wx * wx + wz * wz, 1e-38))
        inv_yz = 1.0 / jnp.sqrt(jnp.maximum(wy * wy + wz * wz, 1e-38))
        ux = jnp.where(use_x, -wz * inv_xz, jnp.zeros_like(wx))
        uy = jnp.where(use_x, jnp.zeros_like(wx), wz * inv_yz)
        uz = jnp.where(use_x, wx * inv_xz, -wy * inv_yz)
        u = jnp.stack([ux, uy, uz], -1)
        return u, jnp.cross(w, u)

    def middle_vec(w_simple, lam):
        # null vector of (b - lam I) restricted to the plane orthogonal to
        # the simple eigenvector: 2x2 symmetric null solve, row-pivoted
        u, v = orth_plane(w_simple)
        bu = jnp.einsum("...ij,...j->...i", b, u)
        bv = jnp.einsum("...ij,...j->...i", b, v)
        m00 = (u * bu).sum(-1) - lam
        m01 = (u * bv).sum(-1)
        m11 = (v * bv).sum(-1) - lam
        use_r0 = jnp.abs(m00) >= jnp.abs(m11)
        ca = jnp.where(use_r0, m01, m11)
        cb = jnp.where(use_r0, -m00, -m01)
        n = jnp.sqrt(ca * ca + cb * cb)
        ok = n > 1e-24  # both rows ~0: e1 degenerate, any plane vector works
        ca = jnp.where(ok, ca / jnp.where(ok, n, 1.0), 1.0)
        cb = jnp.where(ok, cb / jnp.where(ok, n, 1.0), 0.0)
        return ca[..., None] * u + cb[..., None] * v

    ex = jnp.zeros_like(b[..., 0, :]).at[..., 0].set(1.0)
    # r >= 0: e1 crowds e2, so e0 is the safely-simple extreme; r < 0: e2 is
    simple_hi = r >= 0
    lam_simple = jnp.where(simple_hi, e0, e2)
    w_simple = null_vec(lam_simple, ex)
    v1 = middle_vec(w_simple, e1)
    w_cross = jnp.cross(w_simple, v1)
    # keep columns (v0, v1, v2) <-> (e0, e1, e2), right-handed v0 x v1 = v2
    v0 = jnp.where(simple_hi[..., None], w_simple, jnp.cross(v1, w_simple))
    v2 = jnp.where(simple_hi[..., None], w_cross, w_simple)

    eigs = jnp.stack([e0, e1, e2], -1) * s[..., None]
    vecs = jnp.stack([v0, v1, v2], -1)  # columns
    # triple-degenerate (p2 ~ 0): eigenspace is everything; use identity
    vecs = jnp.where(
        degen[..., None, None], jnp.eye(3, dtype=vecs.dtype), vecs
    )
    return eigs.astype(a.dtype), vecs.astype(a.dtype)


def structure_tensor_eigs(patches_norm: jnp.ndarray):
    """Gradient outer-product over the inscribed sphere -> sorted eigs/vecs.

    Port of determineOrientation3D (MultiScale.cpp:2541-2607): returns
    (eigs [C,3] descending, ori [C,3,3] with eigenvectors in COLUMNS,
    matching the NR SVD convention stored in Feature3DInfo::ori for
    unoriented features).
    """
    grads = patch_gradients(patches_norm)  # [C, 3, z, y, x]
    m = jnp.asarray(sphere_mask(), dtype=patches_norm.dtype)
    g = grads * m[None, None]
    flat = g.reshape(g.shape[0], 3, -1)
    tensor = jnp.einsum("civ,cjv->cij", flat, flat)  # [C, 3, 3]
    return sym_eigs_3x3(tensor)


def local_peaks_3d(vols: jnp.ndarray) -> jnp.ndarray:
    """Strict 26-neighbor peaks over the last 3 axes, interior only.

    Batched port of regFindFEATUREIOPeaks without callback
    (MultiScale.cpp:1987-2121) as used on orientation histograms.
    """
    z, y, x = vols.shape[-3:]
    lead = vols.shape[:-3]
    pad_width = [(0, 0)] * len(lead) + [(1, 1)] * 3
    pad = jnp.pad(vols, pad_width)
    is_max = jnp.ones(vols.shape, dtype=bool)
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dz == 0 and dy == 0 and dx == 0:
                    continue
                sl = tuple([slice(None)] * len(lead)) + (
                    slice(1 + dz, 1 + dz + z),
                    slice(1 + dy, 1 + dy + y),
                    slice(1 + dx, 1 + dx + x),
                )
                is_max &= vols > pad[sl]
    interior = jnp.zeros((z, y, x), dtype=bool).at[1:-1, 1:-1, 1:-1].set(True)
    return is_max & interior
