"""Batched feature stage: refinement, orientation, canonical orientations.

Reference call stack being re-expressed (SURVEY.md section 3.2):

    generateFeatures3D_efficient       MultiScale.cpp:1326-1424
      interpolate_discrete_3D_point    :1614  (per-axis quadratic refinement)
      interpolate_extremum_quadratic   :1641  (scale interpolation, x2)
      generateFeature3D                :1705
        sampleImage3D                  :2614  (rotated 11^3 trilinear patch)
        NormalizeData                  :127
        determineOrientation3D         :2541  (structure tensor + 3x3 eigen)
        eig threshold reject           :1748-1769
        determineCanonicalOrientation3D:2722  (spherical histogram peaks)

TPU-native design: the reference walks candidates one by one on the host;
here every step is batched over fixed-capacity candidate chunks so the
whole stage is a handful of jitted programs:

- a per-octave-shape *gather stage* (cheap to compile): DoG neighborhood
  gathers, quadratic refinement, bounds test, identity-orientation patch
  sampling;
- a shape-independent *orientation stage* (compiled once per run):
  normalization, structure tensor, eigenvalue test, canonical-orientation
  histograms (splat -> blur -> strict-peak -> top-k -> subvoxel interp);
- a per-octave-shape *resample stage* for the reoriented patches;
- a shape-independent *descriptor stage* (see sift3d.kernels.descriptor).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from sift3d.core.config import SiftConfig
from sift3d.kernels import descriptor as desc_kernels
from sift3d.kernels.extrema import quadratic_interp_1d
from sift3d.kernels.patch import (
    PATCH_DIM,
    PATCH_RAD,
    local_peaks_3d,
    normalize_patches,
    sample_patches_leveled,
    sphere_mask,
    structure_tensor_eigs,
)

_HIST_BINS = PATCH_DIM * PATCH_DIM * PATCH_DIM

# test hook: run the Pallas histogram path (canonical_stage) in interpret
# mode on CPU so the TPU code path is covered by the CPU test suite
_HIST_PALLAS_INTERPRET = False


def scatter_compact(flags: "jnp.ndarray", size: int) -> "jnp.ndarray":
    """Ascending indices of set flags, padded with -1 to `size`.

    Equivalent to jnp.nonzero(flags, size=size, fill_value=-1)[0] when the
    set count fits `size`, but lowered as one cumsum + one scatter —
    measured ~5x faster on TPU, where the nonzero lowering costs tens of
    ms at pipeline scale. Contract: callers must detect count > size
    themselves (the last slot is then garbage); every call site sizes
    from an exact synced count or falls back on overflow.
    """
    g = flags.shape[0]
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    tgt = jnp.where(flags, jnp.minimum(pos, size - 1), size)
    out = jnp.full((size + 1,), -1, jnp.int32)
    out = out.at[tgt].set(jnp.arange(g, dtype=jnp.int32), mode="drop")
    return out[:size]



def _norm_or_x(v: jnp.ndarray) -> jnp.ndarray:
    """Normalize rows; zero vectors become (1, 0, 0) (vec3D_norm_3d,
    MultiScale.cpp:1092-1111)."""
    ss = (v * v).sum(axis=-1, keepdims=True)
    unit = v / jnp.sqrt(jnp.where(ss > 0, ss, 1.0))
    fallback = jnp.zeros_like(v).at[..., 0].set(1.0)
    return jnp.where(ss > 0, unit, fallback)


def _splat_histogram(coords_xyz: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Trilinear scatter-add into per-item 11^3 histograms.

    coords_xyz: [C, V, 3] continuous (x, y, z); weights: [C, V].
    Port of the fioIncPixelTrilinearInterp splat loop
    (MultiScale.cpp:2780-2820) over a batch. Kept as the oracle for
    _smooth_histogram (the MXU formulation used in the pipeline).
    """
    from sift3d.kernels.resample import trilinear_splat_weights

    c, v, _ = coords_xyz.shape
    iz, iy, ix, w = trilinear_splat_weights(
        coords_xyz[..., 0], coords_xyz[..., 1], coords_xyz[..., 2], (PATCH_DIM,) * 3
    )  # each [C, V, 8]
    flat = (iz * PATCH_DIM + iy) * PATCH_DIM + ix  # [C, V, 8]
    batch = jnp.broadcast_to(jnp.arange(c)[:, None, None], flat.shape)
    hist = jnp.zeros((c, _HIST_BINS), dtype=weights.dtype)
    hist = hist.at[batch, flat].add(w * weights[..., None])
    return hist.reshape(c, PATCH_DIM, PATCH_DIM, PATCH_DIM)


def _axis_factors(u: jnp.ndarray, blur_taps: jnp.ndarray) -> jnp.ndarray:
    """Per-axis blurred splat factors A[..., bin] for coordinates u.

    Trilinear splat is separable per axis (two adjacent bins with linear
    weights, reference border saturation), and the subsequent zero-padded
    Gaussian blur is separable too — so (splat + blur) factorizes exactly
    into per-axis [point, 11] matrices contracted on the MXU. This turns
    the orientation histogram, otherwise a TPU-hostile scatter, into
    matmuls.
    """
    from sift3d.kernels.resample import _interp_coord

    i0, w0 = _interp_coord(u, PATCH_DIM)  # bin i0 gets w0, i0+1 gets 1-w0
    bins = jnp.arange(PATCH_DIM)
    shape = u.shape + (PATCH_DIM,)
    a = jnp.zeros(shape, u.dtype)
    a = a + w0[..., None] * (bins == i0[..., None])
    a = a + (1.0 - w0)[..., None] * (bins == (i0 + 1)[..., None])
    # zero-padded 1D blur along the bin axis (banded matrix of taps)
    r = len(blur_taps) // 2
    b = np.zeros((PATCH_DIM, PATCH_DIM), np.float32)
    taps = np.asarray(blur_taps, np.float32)
    for o in range(PATCH_DIM):
        lo, hi = max(0, o - r), min(PATCH_DIM, o + r + 1)
        b[lo:hi, o] = taps[lo - o + r : hi - o + r]
    return a @ jnp.asarray(b)


def _smooth_histogram_axes(cx, cy, cz, weights: jnp.ndarray, blur_sigma: float) -> jnp.ndarray:
    """Blurred 11^3 orientation histogram as separable MXU contractions.

    cx/cy/cz: [C, V] continuous per-axis coordinates. Bit-equivalent (up
    to fp reduction order) to blur3d(_splat_histogram(...), blur_sigma)
    with zero borders.

    On TPU this routes to the Pallas splat kernel, which keeps the
    [C, V, 121] outer-product transient in VMEM (~6.5 ms -> ~1 ms per
    call at C=4096; the XLA contraction below moves ~2.8 GB of HBM).
    """
    import os

    from sift3d.kernels.gauss import gaussian_kernel_1d

    taps = gaussian_kernel_1d(blur_sigma, 0.01)
    if jax.default_backend() == "tpu" and not os.environ.get("SIFT3D_NO_PALLAS_HIST"):
        from sift3d.kernels.hist_pallas import smooth_histogram_pallas

        return smooth_histogram_pallas(cx, cy, cz, weights, taps)
    ax = _axis_factors(cx, taps)  # [C, V, 11]
    ay = _axis_factors(cy, taps)
    az = _axis_factors(cz, taps)
    wz = weights[..., None] * az  # [C, V, 11]
    # contract with a combined [V, 121] in-plane factor in V-chunks: the
    # per-z-slice formulation is a batch=C matmul with M=N=11 (<1% MXU
    # utilization, ~20 ms per histogram at C=4k); N=121 runs ~10x faster,
    # and chunking V bounds the [C, V, 121] outer-product transient
    c, v_total = ax.shape[0], ax.shape[1]
    p2 = PATCH_DIM * PATCH_DIM
    hist = jnp.zeros((c, PATCH_DIM, p2), jnp.float32)
    step = 128
    for v0 in range(0, v_total, step):
        sl = slice(v0, min(v0 + step, v_total))
        t = (ay[:, sl, :, None] * ax[:, sl, None, :]).reshape(c, -1, p2)
        hist = hist + jnp.einsum(
            "cvz,cvp->czp", wz[:, sl, :], t, preferred_element_type=jnp.float32
        )
    return hist.reshape(c, PATCH_DIM, PATCH_DIM, PATCH_DIM)


def _smooth_histogram(coords_xyz: jnp.ndarray, weights: jnp.ndarray, blur_sigma: float) -> jnp.ndarray:
    """_smooth_histogram_axes over stacked [C, V, 3] (x, y, z) coords."""
    return _smooth_histogram_axes(
        coords_xyz[..., 0], coords_xyz[..., 1], coords_xyz[..., 2], weights, blur_sigma
    )


def _interp_hist_peaks(hist: jnp.ndarray, pz, py, px) -> jnp.ndarray:
    """Per-axis quadratic subvoxel interpolation of histogram peaks.

    hist: [C, 11, 11, 11]; pz/py/px: [C] or [C, K] int peak coords
    (interior). Returns [C(, K), 3] continuous (x, y, z). Port of
    interpolate_discrete_3D_point (MultiScale.cpp:1614-1639).

    The 7 needed histogram values are extracted with separable one-hot
    contractions instead of element gathers: TPU element gathers cost
    ~3 ms per call at C=4096 (~17 ms per phase-2b chunk over the K1
    secondary slots), while these tiny einsums fuse into ~0.2 ms of VPU
    work. Each sum has exactly one nonzero term, so the values — and the
    interpolation — are bit-identical to the gather formulation.
    """
    squeeze = pz.ndim == 1
    if squeeze:
        pz, py, px = pz[:, None], py[:, None], px[:, None]
    grid = jnp.arange(PATCH_DIM)
    oz = (pz[..., None] == grid).astype(hist.dtype)  # [C, K, 11]
    oy = (py[..., None] == grid).astype(hist.dtype)
    ox = (px[..., None] == grid).astype(hist.dtype)
    # axis profiles: histogram restricted to the peak's row along each axis
    t = jnp.einsum("czyx,ckz->ckyx", hist, oz)
    prof_x = jnp.einsum("ckyx,cky->ckx", t, oy)
    prof_y = jnp.einsum("ckyx,ckx->cky", t, ox)
    s = jnp.einsum("czyx,cky->ckzx", hist, oy)
    prof_z = jnp.einsum("ckzx,ckx->ckz", s, ox)

    def axis_interp(prof, oh, coord):
        # one-hot shifts select prof[coord -/+ 1] without a gather
        v0 = (prof * oh).sum(-1)
        vm = (prof[..., :-1] * oh[..., 1:]).sum(-1)
        vp = (prof[..., 1:] * oh[..., :-1]).sum(-1)
        cf = coord.astype(jnp.float32)
        return quadratic_interp_1d(vm, v0, vp, cf - 1.0, cf, cf + 1.0)

    out = jnp.stack(
        [
            axis_interp(prof_x, ox, px),
            axis_interp(prof_y, oy, py),
            axis_interp(prof_z, oz, pz),
        ],
        axis=-1,
    )
    return out[:, 0] if squeeze else out


def _top_peaks_pf(pk: jnp.ndarray, k: int):
    """_top_peaks over the Pallas [C, 128(p=z*11+y), 16(x)] peak-masked
    layout (non-peaks are -inf). Tie order matches the [C, 11, 11, 11]
    flat argmax: p*16 + x is lexicographic in (z, y, x) too."""
    c = pk.shape[0]
    vals, idx = jax.lax.top_k(pk.reshape(c, -1), k)
    valid = jnp.isfinite(vals)
    p, px = idx // 16, idx % 16
    pz, py = p // PATCH_DIM, p % PATCH_DIM
    pz = jnp.clip(pz, 1, PATCH_DIM - 2)
    py = jnp.clip(py, 1, PATCH_DIM - 2)
    px = jnp.clip(px, 1, PATCH_DIM - 2)
    return vals, pz, py, px, valid


def _interp_hist_peaks_pf(hb: jnp.ndarray, pz, py, px) -> jnp.ndarray:
    """_interp_hist_peaks over the Pallas [C, 128(p), 16(x)] layout.

    Same separable one-hot trick, but every contraction runs on full
    128/16-lane arrays instead of 11-wide minor dims (the [C, 11, 11, 11]
    layout leaves ~91% of the VPU lanes idle). Values are bit-identical
    to gathers from hb. pz/py/px: [C, K] interior peak coords.
    """
    pp = pz * PATCH_DIM + py
    op = (pp[..., None] == jnp.arange(hb.shape[1])).astype(hb.dtype)  # [C, K, 128]
    ox = (px[..., None] == jnp.arange(hb.shape[2])).astype(hb.dtype)  # [C, K, 16]
    prof_x = jnp.einsum("cpx,ckp->ckx", hb, op)
    prof_p = jnp.einsum("cpx,ckx->ckp", hb, ox)

    def quad(vm, v0, vp_, coord):
        cf = coord.astype(jnp.float32)
        return quadratic_interp_1d(vm, v0, vp_, cf - 1.0, cf, cf + 1.0)

    v0 = (prof_p * op).sum(-1)
    fx = quad(
        (prof_x[..., :-1] * ox[..., 1:]).sum(-1),
        v0,
        (prof_x[..., 1:] * ox[..., :-1]).sum(-1),
        px,
    )
    fy = quad(
        (prof_p[..., :-1] * op[..., 1:]).sum(-1),
        v0,
        (prof_p[..., 1:] * op[..., :-1]).sum(-1),
        py,
    )
    # z +- 1 is p -+ 11 (y fixed; interior peaks never cross a z row)
    fz = quad(
        (prof_p[..., :-PATCH_DIM] * op[..., PATCH_DIM:]).sum(-1),
        v0,
        (prof_p[..., PATCH_DIM:] * op[..., :-PATCH_DIM]).sum(-1),
        pz,
    )
    return jnp.stack([fx, fy, fz], axis=-1)


def _top_peaks(hist: jnp.ndarray, k: int):
    """Strict 26-neighbor peaks, sorted descending, top-k.

    Returns (values [C, k], coords z/y/x each [C, k], valid [C, k]).
    Mirrors regFindFEATUREIOPeaks + lvSortHighLow on orientation
    histograms (MultiScale.cpp:2851-2852).
    """
    peaks = local_peaks_3d(hist)
    flat = jnp.where(peaks, hist, -jnp.inf).reshape(hist.shape[0], -1)
    vals, idx = jax.lax.top_k(flat, k)
    valid = jnp.isfinite(vals)
    pz = idx // (PATCH_DIM * PATCH_DIM)
    py = (idx // PATCH_DIM) % PATCH_DIM
    px = idx % PATCH_DIM
    # clamp so gather of +-1 neighbors stays in range for invalid slots
    pz = jnp.clip(pz, 1, PATCH_DIM - 2)
    py = jnp.clip(py, 1, PATCH_DIM - 2)
    px = jnp.clip(px, 1, PATCH_DIM - 2)
    return vals, pz, py, px, valid


# ---------------------------------------------------------------------------
# Gather stage (per-octave-shape)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("sigmas", "gz_shift"))
def gather_stage_union(gstacks, dogs, vi, lvl, zyx, valid, sigmas: Tuple[float, ...],
                       z_bounds=None, gz_shift: int = 0):
    """Refine candidates and sample identity-orientation patches, over the
    union of a same-shape volume batch's candidates.

    One program serves every volume of the batch — on the tunnel runtime
    per-dispatch host latency dominates this stage, so the union dispatch
    is the throughput lever (PERFORMANCE.md roadmap items 2/5).

    Args:
      gstacks: [B, 6, Z, Y, X] Gaussian levels of the octave per volume.
      dogs:    [B, 5, Z, Y, X] DoG levels per volume.
      vi:      [C] int32 volume index into the batch.
      lvl:     [C] int32 center DoG index (1..3).
      zyx:     [C, 3] int32 voxel coords (z, y, x).
      valid:   [C] bool padding mask.
      sigmas:  static per-level blur sigmas (length 6).
      z_bounds: optional (z_lo, z_hi) traced scalars replacing [0, zd) in
        the iRadMax bounds test — used by the spatially-sharded pipeline,
        whose slabs carry halo planes beyond the owned global rows.
      gz_shift: static z offset added when sampling `gstacks` (the
        sharded pipeline extends the Gaussian slab by a wider halo than
        the DoG slab, so gstack-local z = dogs-local z + gz_shift).

    Returns (xyz [C,3] float (x,y,z, +0.5 shifted) in dogs-local coords,
    scale [C], keep [C], patches [C, 11, 11, 11]).
    """
    b, nl = dogs.shape[0], dogs.shape[1]
    zd, yd, xd = dogs.shape[2:]
    # flatten the batch into the level axis: per-candidate flat level
    # index vi*L + lvl keeps every +-1 level access inside one volume
    # (lvl is 1..3), so the samplers need no batch awareness at all
    dogsf = dogs.reshape(b * nl, zd, yd, xd)
    dl = vi * nl + lvl
    sig = jnp.asarray(sigmas, dtype=jnp.float32)
    z, y, x = zyx[:, 0], zyx[:, 1], zyx[:, 2]

    d_c = dogsf[dl, z, y, x]
    # spatial refinement: per-axis independent quadratic on the center level
    fx = quadratic_interp_1d(
        dogsf[dl, z, y, x - 1], d_c, dogsf[dl, z, y, x + 1],
        (x - 1).astype(jnp.float32), x.astype(jnp.float32), (x + 1).astype(jnp.float32),
    )
    fy = quadratic_interp_1d(
        dogsf[dl, z, y - 1, x], d_c, dogsf[dl, z, y + 1, x],
        (y - 1).astype(jnp.float32), y.astype(jnp.float32), (y + 1).astype(jnp.float32),
    )
    fz = quadratic_interp_1d(
        dogsf[dl, z - 1, y, x], d_c, dogsf[dl, z + 1, y, x],
        (z - 1).astype(jnp.float32), z.astype(jnp.float32), (z + 1).astype(jnp.float32),
    )
    # scale refinement across DoG levels at the integer voxel, x2
    # (generateFeatures3D_efficient, MultiScale.cpp:1376-1381)
    d_lo = dogsf[dl - 1, z, y, x]
    d_hi = dogsf[dl + 1, z, y, x]
    scale = 2.0 * quadratic_interp_1d(d_lo, d_c, d_hi, sig[lvl - 1], sig[lvl], sig[lvl + 1])

    # subpixel center shift (MultiScale.cpp:1384-1386)
    xyz = jnp.stack([fx + 0.5, fy + 0.5, fz + 0.5], axis=-1)

    # bounds test (sampleImage3D, MultiScale.cpp:2630-2643)
    rad_max = jnp.floor(2.0 * scale + 2.0)
    if z_bounds is None:
        z_lo, z_hi = jnp.float32(0.0), jnp.float32(zd)
    else:
        z_lo, z_hi = (jnp.asarray(b, jnp.float32) for b in z_bounds)
    lims_lo = jnp.stack([jnp.float32(0.0), jnp.float32(0.0), z_lo])
    lims_hi = jnp.stack([jnp.float32(xd), jnp.float32(yd), z_hi])
    in_bounds = jnp.all(
        (xyz - rad_max[:, None] >= lims_lo) & (xyz + rad_max[:, None] < lims_hi),
        axis=-1,
    )
    keep = valid & in_bounds

    # identity-orientation patch from the Gaussian level matching the
    # center DoG index (fioG0 at generation time, see SURVEY.md 3.2);
    # slab-DMA separable sampling on TPU (boxed XLA slices elsewhere) —
    # exact f32 for in-bounds (kept) candidates, padding rows skipped
    from sift3d.kernels.patch import sample_patches_identity

    ngl = gstacks.shape[1]
    gstackf = gstacks.reshape((b * ngl,) + gstacks.shape[2:])
    xyz_g = xyz
    if gz_shift:
        xyz_g = xyz + jnp.asarray([0.0, 0.0, float(gz_shift)], jnp.float32)
    # pre-padded slab layout detection: an unpadded gstack shares y/x with
    # dogs (same octave); pad_gstack_slab layout has y == yd + 8 exactly
    g_logical = None
    if gstacks.shape[-2] == yd + 8 and gstacks.shape[-1] % 128 == 0:
        g_logical = (gstacks.shape[-3], yd, xd)
    patches = sample_patches_identity(
        gstackf, vi * ngl + lvl, xyz_g, scale, count=valid.sum(),
        logical_dims=g_logical,
    )

    return xyz, scale, keep, patches


def gather_stage(gstack, dogs, lvl, zyx, valid, sigmas: Tuple[float, ...]):
    """Single-volume gather_stage (tests/profiling); see gather_stage_union."""
    vi = jnp.zeros_like(lvl)
    return gather_stage_union(gstack[None], dogs[None], vi, lvl, zyx, valid, sigmas)


@functools.partial(jax.jit, static_argnames=("sigmas", "cfg", "gz_shift"))
def gather_eig_stage(gstacks, dogs, cand, sigmas: Tuple[float, ...], cfg: SiftConfig,
                     z_bounds=None, gz_shift: int = 0):
    """Fused gather + eig front half, fed by ONE packed candidate upload.

    cand: [C, 6] int32 columns (vi, lvl, z, y, x, sign); valid = sign != 0.
    One host upload and one dispatch replace the former five uploads and
    three dispatches per (group, octave) — each host interaction costs a
    tunnel round trip. z_bounds/gz_shift: see gather_stage_union (the
    spatially-sharded pipeline's slab coordinates). Returns (xyz, scale,
    pn, eigs, eig_ori, keep_rows, kept_count).
    """
    vi, lvl = cand[:, 0], cand[:, 1]
    zyx = cand[:, 2:5]
    valid = cand[:, 5] != 0
    xyz, scale, keep, patches = gather_stage_union(
        gstacks, dogs, vi, lvl, zyx, valid, sigmas, z_bounds=z_bounds,
        gz_shift=gz_shift,
    )
    pn, eigs, eig_ori, eig_keep = eig_stage(patches, cfg)
    keep_rows = keep & eig_keep
    return xyz, scale, pn, eigs, eig_ori, keep_rows, keep_rows.sum()


# ---------------------------------------------------------------------------
# Orientation stage (shape-independent)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def eig_stage(patches, cfg: SiftConfig):
    """Normalize + structure-tensor eigendecomposition + edge rejection.

    The cheap front half of orientation assignment, run for every
    candidate; the expensive histogram half (canonical_stage) runs only on
    survivors. Returns (patches_norm, eigs, eig_ori, eig_keep).
    """
    c = patches.shape[0]
    pn = normalize_patches(patches)
    eigs, eig_ori = structure_tensor_eigs(pn)
    s = eigs.sum(axis=1)
    p = eigs.prod(axis=1)
    # keep iff (sum)^3 < thres * prod (MultiScale.cpp:1763; thres < 0 keeps all)
    if cfg.eig_threshold < 0:
        eig_keep = jnp.ones((c,), dtype=bool)
    else:
        eig_keep = s * s * s < cfg.eig_threshold * p
    return pn, eigs, eig_ori, eig_keep


@functools.partial(jax.jit, static_argnames=("kbucket",))
def compact_stage(keep_rows, kbucket: int):
    """Indices of kept candidates, padded to kbucket (+ validity)."""
    c = keep_rows.shape[0]
    kidx = scatter_compact(keep_rows, kbucket)
    valid = kidx >= 0
    return jnp.clip(kidx, 0, c - 1), valid


@functools.partial(jax.jit, static_argnames=("kbucket",))
def select_stage(keep_rows, cand, pn, eigs, eig_ori, xyz, scale, kbucket: int):
    """Compact all per-candidate arrays down to the survivor set in one
    program (one compile per shape-bucket combination). cand is the packed
    [C, 6] (vi, lvl, z, y, x, sign) candidate table."""
    kidx, kvalid = compact_stage(keep_rows, kbucket)
    return (
        kvalid, cand[kidx], pn[kidx], eigs[kidx], eig_ori[kidx], xyz[kidx],
        scale[kidx],
    )


def _hist_tops_fused(hx, hy, hz, w, taps, k: int, count=None):
    """hist_tops via the fused Pallas top-k kernel (TPU path).

    Returns (vals [C, k], valid [C, k], itp [C, k, 3] continuous (x, y, z))
    bit-identical to the smooth_histogram_peaks + _top_peaks_pf +
    _interp_hist_peaks_pf composition: the kernel extracts the same peak
    set in the same tie order and the same 7 histogram values per peak.
    """
    from sift3d.kernels.hist_pallas import smooth_histogram_topk

    out = smooth_histogram_topk(
        hx, hy, hz, w, taps, k, count=count, interpret=_HIST_PALLAS_INTERPRET
    )
    v = out[..., 0]
    valid = jnp.isfinite(v)
    flat = out[..., 7].astype(jnp.int32)
    px = flat % 16
    pp = flat // 16
    pz, py = pp // PATCH_DIM, pp % PATCH_DIM

    def quad(vm, vp_, coord):
        cf = coord.astype(jnp.float32)
        return quadratic_interp_1d(vm, v, vp_, cf - 1.0, cf, cf + 1.0)

    itp = jnp.stack(
        [
            quad(out[..., 1], out[..., 2], px),
            quad(out[..., 3], out[..., 4], py),
            quad(out[..., 5], out[..., 6], pz),
        ],
        axis=-1,
    )
    return v, valid, itp


@functools.partial(jax.jit, static_argnames=("cfg",))
def canonical_stage(pn, cfg: SiftConfig, kvalid=None):
    """Canonical orientation histograms for (already normalized) patches.

    kvalid: optional [C] survivor mask — secondary histograms run only
    for (candidate, primary) slots with kvalid & valid-primary (the
    emission masks ori_valid with kvalid anyway, so skipping dead rows
    changes no emitted feature).

    Returns dict with ori [C,K1,K2,3,3] (rows = P1/P2/P3) and
    ori_valid [C,K1,K2].
    """
    k1 = cfg.max_primary_orientations
    k2 = cfg.max_secondary_orientations
    c = pn.shape[0]

    # gradients of the normalized patch, restricted to the static in-sphere
    # voxel subset (the only ones the reference splats; ~2.6x fewer scatter
    # points than the full 11^3 grid). Everything per-voxel stays in
    # [C, 3, V] layout — V on the minor (lane) dimension. The transposed
    # [C, V, 3] layout puts 3 elements on 128 lanes, and the perpendicular
    # projections alone then cost ~26 ms at C=4096 (measured on v5e).
    from sift3d.kernels.patch import patch_gradients

    grads = patch_gradients(pn)  # [C, 3(dx,dy,dz), z, y, x]
    sphere_idx = np.nonzero(sphere_mask().ravel())[0]
    g3 = grads.reshape(c, 3, -1)[:, :, sphere_idx]  # [C, 3, Vs]
    mag = jnp.sqrt((g3 * g3).sum(axis=1))  # [C, Vs]
    wgt = jnp.where(mag > 0, mag, 0.0)
    mag_safe = jnp.where(mag > 0, mag, 1.0)[:, None, :]
    e3 = g3 / mag_safe  # unit edges [C, 3, Vs]

    rad = float(PATCH_RAD)

    use_pallas = (
        jax.default_backend() == "tpu"
        and not os.environ.get("SIFT3D_NO_PALLAS_HIST")
    ) or _HIST_PALLAS_INTERPRET

    def hist_tops(hx, hy, hz, k, w=None, count=None):
        """Blurred-histogram peak values + their subvoxel interpolations.

        On TPU the whole chain (splat, blur, strict-peak mask, top-k,
        neighbor extraction) is ONE fused Pallas kernel in the [128(p),
        16(x)] layout (see hist_pallas._hist_topk_kernel) — the
        [C, 11, 11, 11] XLA form leaves ~91% of the VPU idle, and even
        the earlier split Pallas kernel left [C, 128, 16] hb/pk HBM
        round trips plus a lax.top_k that dominated the stage. `count`
        skips rows >= it entirely (live rows must sit below count)."""
        w = wgt if w is None else w
        if use_pallas:
            from sift3d.kernels.gauss import gaussian_kernel_1d

            taps = tuple(
                float(t) for t in gaussian_kernel_1d(cfg.ori_hist_blur_sigma, 0.01)
            )
            return _hist_tops_fused(hx, hy, hz, w, taps, k, count=count)
        hist = _smooth_histogram_axes(hx, hy, hz, w, cfg.ori_hist_blur_sigma)
        v, pz, py, px, pkv = _top_peaks(hist, k)
        itp = _interp_hist_peaks(hist, pz, py, px)
        return v, pkv, itp

    # primary histogram: splat at e*rad + rad (+0.5) (MultiScale.cpp:2805-2816).
    # Runs at full chunk capacity even though only ~45% of rows survive:
    # compacting live rows to a count-gated prefix (like the secondary
    # stage) was measured at only ~5 ms of the 121 ms phase-2b — within
    # relay noise — while the gather re-fusion cost 1-2 ulp of bit
    # stability, so it was reverted (round-3 A/B, PERFORMANCE.md).
    v1, pk1, itp1 = hist_tops(
        e3[:, 0] * rad + rad + 0.5,
        e3[:, 1] * rad + rad + 0.5,
        e3[:, 2] * rad + rad + 0.5,
        k1,
    )
    # threshold: >= 0.8 * strongest (strict < breaks, MultiScale.cpp:2889)
    valid1 = pk1 & (v1 >= cfg.ori_peak_threshold * v1[:, :1]) & (v1 > 0)
    # subvoxel interp, center-shift, normalize -> P1, all slots at once
    p1 = _norm_or_x(itp1 - rad)  # [C, K1, 3]

    # secondary histograms: only (candidate, primary) slots that can emit
    # — valid primary peak, surviving candidate — do real work. The live
    # slots compact to a prefix of the [C*K1] capacity (typically ~15% of
    # it: ~45% of candidates survive eig/bounds and ~2 of K1=6 primary
    # slots are valid), and the fused histogram kernel skips everything
    # past the live count; results scatter back to the [C, K1, K2] layout
    flags2 = valid1 if kvalid is None else (valid1 & kvalid[:, None])
    flags_f = flags2.reshape(c * k1)
    rcnt = flags_f.sum()
    sidx = scatter_compact(flags_f, c * k1)
    svalid = sidx >= 0
    ridx = jnp.clip(sidx, 0)
    ci, ki = ridx // k1, ridx % k1
    e3_r = e3[ci]  # [R, 3, V]
    p1_r = p1[ci, ki]  # [R, 3]
    wgt_r = wgt[ci]
    par = jnp.einsum("rdv,rd->rv", e3_r, p1_r)  # [R, V]
    perp = e3_r - par[:, None, :] * p1_r[..., None]  # [R, 3, V]
    pss = (perp * perp).sum(axis=1, keepdims=True)
    perp = jnp.where(
        pss > 0,
        perp / jnp.sqrt(jnp.where(pss > 0, pss, 1.0)),
        jnp.zeros_like(perp).at[:, 0].set(1.0),
    )  # _norm_or_x in [R, 3, V] layout
    v2, pk2, itp2 = hist_tops(
        perp[:, 0] * rad + rad + 0.5,
        perp[:, 1] * rad + rad + 0.5,
        perp[:, 2] * rad + rad + 0.5,
        k2,
        wgt_r,
        count=rcnt,
    )
    valid2r = pk2 & (v2 >= cfg.ori_2nd_peak_threshold * v2[:, :1]) & (v2 > 0)
    # all K2 slots at once: interp, orthogonalize against P1,
    # renormalize (MultiScale.cpp:3006-3015), third axis = cross
    p2 = _norm_or_x(itp2 - rad)  # [R, K2, 3]
    p1b = p1_r[:, None, :]  # [R, 1, 3]
    p2 = _norm_or_x(p2 - (p2 * p1b).sum(-1, keepdims=True) * p1b)
    p1k = jnp.broadcast_to(p1b, p2.shape)
    p3 = jnp.cross(p1k, p2)
    orir = jnp.stack([p1k, p2, p3], axis=2)  # [R, K2, 3, 3] rows P1, P2, P3
    tgt = jnp.where(svalid, ridx, c * k1)  # dead rows drop in the scatter
    valid2 = (
        jnp.zeros((c * k1, k2), bool).at[tgt].set(valid2r, mode="drop")
    ).reshape(c, k1, k2)
    ori = (
        jnp.zeros((c * k1, k2, 3, 3), jnp.float32)
        .at[tgt]
        .set(orir, mode="drop")
        .reshape(c, k1, k2, 3, 3)
    )
    # flags2 subsumes valid1 (and kvalid, which every consumer of
    # ori_valid re-applies), so the scattered valid2 IS ori_valid
    return dict(ori=ori, ori_valid=valid2)


def orient_stage(patches, cfg: SiftConfig):
    """Full orientation stage (eig + canonical) for every candidate.

    Convenience wrapper used by tests; the pipeline runs eig_stage /
    compact_stage / canonical_stage so the histogram work only touches
    surviving candidates.
    """
    pn, eigs, eig_ori, eig_keep = eig_stage(patches, cfg)
    o = canonical_stage(pn, cfg)
    return dict(
        patches_norm=pn, eigs=eigs, eig_ori=eig_ori, eig_keep=eig_keep,
        ori=o["ori"], ori_valid=o["ori_valid"],
    )


# ---------------------------------------------------------------------------
# Resample stage (per-octave-shape) + descriptor stage (shape-independent)
# ---------------------------------------------------------------------------


@jax.jit
def resample_stage(gstack, xyz, scale, oris, lvl):
    """Sample rotated patches for reoriented features ([C] level indices)."""
    return sample_patches_leveled(gstack, lvl, xyz, scale, oris)


# A/B gate for the 24^3/32-lane sampler bucket (perf measurement).
# Snapshotted ONCE at import: the gate participates in jitted programs
# (emit_count_stage / emit_reoriented_stage), whose compiled caches are
# keyed only by static args — an env var read at trace time could
# desynchronize a cached count program from a freshly traced emission
# program and mis-slice the download buffer (ADVICE r3). A/B runs set
# the env var before launching the process.
_TINY_BUCKET_ENABLED = not os.environ.get("SIFT3D_NO_TINY_BUCKET")


def _tiny_bucket_enabled() -> bool:
    return _TINY_BUCKET_ENABLED


@functools.partial(jax.jit, static_argnames=("cfg", "reoriented"))
def emit_count_stage(keep, ori_valid, scale, cfg: SiftConfig, reoriented: bool = True):
    """[total rows, tiny-box rows, small-box rows, kept candidates] the
    chunk will emit (tiny, read synchronously so the packing stage can
    run at the smallest sufficient capacity, split by rotated-sampler box
    bucket; kept rides along so no separate survivor-count sync is
    needed)."""
    from sift3d.kernels.patch import _RBOX_SMALL, _RBOX_TINY, rbox_max_scale

    c, k1, k2 = ori_valid.shape
    ovf = ori_valid.reshape(c, k1 * k2)
    if not reoriented:
        ovf = jnp.zeros_like(ovf)
    rank = jnp.cumsum(ovf.astype(jnp.int32), axis=1) - 1
    reor = keep[:, None] & ovf & (rank < cfg.max_orientations)
    if _tiny_bucket_enabled():
        tiny = (scale <= rbox_max_scale(_RBOX_TINY))[:, None]
    else:
        tiny = jnp.zeros_like(scale, bool)[:, None]
    small = (~tiny) & (scale <= rbox_max_scale(_RBOX_SMALL))[:, None]
    kept = keep.sum()
    total = kept + reor.sum()
    return jnp.stack([total, (reor & tiny).sum(), (reor & small).sum(), kept])


def _pack_rows(order_key, vi, xyz, scale, eigs, ori, info):
    """[N, 19] packed rows: x y z scale eigs*3 ori*9 info order_key vi."""
    return jnp.concatenate(
        [
            xyz,
            scale[:, None],
            eigs,
            ori.reshape(-1, 9),
            info.astype(jnp.float32)[:, None],
            order_key.astype(jnp.float32)[:, None],
            vi.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def pack_unoriented_stage(kvalid, cand, xyz, scale, eigs, eig_ori, cfg: SiftConfig):
    """Packed rows for the unoriented features (one per kept candidate).

    Their patches are the identity-orientation patches the gather stage
    already sampled — no resampling happens for these rows.
    """
    from sift3d.core.featureset import INFO_FLAG_MIN0MAX1

    vi, sign = cand[:, 0], cand[:, 5]
    c = xyz.shape[0]
    s = cfg.max_primary_orientations * cfg.max_secondary_orientations
    info = jnp.where(sign > 0, INFO_FLAG_MIN0MAX1, 0).astype(jnp.uint32)
    key = jnp.arange(c, dtype=jnp.int32) * (1 + s)
    packed = _pack_rows(key, vi, xyz, scale, eigs, eig_ori, info)
    # invalidate padding rows via the order key (host drops key < 0)
    return jnp.where(kvalid[:, None], packed, -1.0)


def _materialize_reoriented_rows(
    gstacks, cand, xyz, scale, eigs, ori, idx, row_valid, count, cfg,
    box, xwin, gz_shift, g_dims,
):
    """Gather + pack + resample the reoriented rows selected by `idx`
    (compacted ascending flat (candidate, slot) indices, -1 padded).
    `count` is the caller's PRE-compaction matching-slot total (it can
    exceed the capacity on overflow, which spatial.py asserts against).
    Shared by emit_reoriented_stage and emit_reoriented_buckets; the
    reference push-order key cand * (1 + S) + slot + 1 is global, so the
    host merge is independent of how rows were bucketed."""
    from sift3d.core.featureset import INFO_FLAG_MIN0MAX1, INFO_FLAG_REORIENT
    from sift3d.kernels.patch import sample_patches_rotated

    vi, lvl, sign = cand[:, 0], cand[:, 1], cand[:, 5]
    c = xyz.shape[0]
    s = cfg.max_primary_orientations * cfg.max_secondary_orientations
    idxc = jnp.clip(idx, 0)
    cand_i = jnp.clip(idxc // s, 0, c - 1)
    slot = jnp.where(row_valid, idxc % s, 0)

    row_xyz = xyz[cand_i]
    row_scale = scale[cand_i]
    row_eigs = eigs[cand_i]
    row_lvl = lvl[cand_i]
    row_vi = vi[cand_i]
    row_ori = ori.reshape(c, s, 3, 3)[cand_i, slot]
    row_info = jnp.where(sign[cand_i] > 0, INFO_FLAG_MIN0MAX1, 0).astype(jnp.uint32)
    row_info = row_info | jnp.uint32(INFO_FLAG_REORIENT)
    key = jnp.where(row_valid, cand_i * (1 + s) + slot + 1, -1)

    b, ngl = gstacks.shape[0], gstacks.shape[1]
    gstackf = gstacks.reshape((b * ngl,) + gstacks.shape[2:])
    row_xyz_g = row_xyz
    if gz_shift:
        row_xyz_g = row_xyz + jnp.asarray([0.0, 0.0, float(gz_shift)], jnp.float32)
    patches = sample_patches_rotated(
        gstackf, row_vi * ngl + row_lvl, row_xyz_g, row_scale, row_ori, box=box,
        count=count, xwin=xwin, logical_dims=g_dims,
    )
    packed = _pack_rows(key, row_vi, row_xyz, row_scale, row_eigs, row_ori, row_info)
    packed = jnp.where(row_valid[:, None], packed, -1.0)
    return count, packed, patches


@functools.partial(
    jax.jit, static_argnames=("cfg", "caps", "gz_shift", "g_dims")
)
def emit_reoriented_buckets(
    gstacks, cand, xyz, scale, kvalid, eigs, ori, ori_valid,
    cfg: SiftConfig, caps, gz_shift: int = 0, g_dims=None,
):
    """All scale buckets' reoriented rows from ONE shared compaction.

    caps = (cap_all, cap_tiny, cap_small, cap_large); zero disables a
    bucket. The per-bucket formulation (emit_reoriented_stage x3) pays a
    scatter_compact cumsum over the full [cap x S] slot grid (~270k
    elements at chunk 4096, k1*k2 = 66) PER BUCKET; here the slot grid
    is compacted once to cap_all rows and the buckets sub-compact that
    tiny array (~45 ms of batch-12 phase-2c was these replicated
    cumsums). Row sets and orders are identical: filtering an ascending
    compaction by bucket preserves the ascending flat order each
    per-bucket compaction would have produced.

    Returns a list of (count, packed, patches) for each ENABLED bucket
    in (tiny, small, large) order.
    """
    from sift3d.kernels.patch import (
        _RBOX, _RBOX_SMALL, _RBOX_TINY, _XWIN, _XWIN_TINY, rbox_max_scale,
    )

    c, k1, k2 = ori_valid.shape
    s = k1 * k2
    cap_all, cap_t, cap_sm, cap_l = caps
    ovf = ori_valid.reshape(c, s) & kvalid[:, None]
    rank = jnp.cumsum(ovf.astype(jnp.int32), axis=1) - 1
    slots = ovf & (rank < cfg.max_orientations)
    aidx = scatter_compact(slots.ravel(), cap_all)
    avalid = aidx >= 0
    ascale = scale[jnp.clip(jnp.clip(aidx, 0) // s, 0, c - 1)]

    tiny_max = rbox_max_scale(_RBOX_TINY) if _tiny_bucket_enabled() else -1.0
    small_max = rbox_max_scale(_RBOX_SMALL)
    outs = []
    for bucket, cap_b in (("tiny", cap_t), ("small", cap_sm), ("large", cap_l)):
        if cap_b <= 0:
            continue
        if bucket == "tiny":
            bf = avalid & (ascale <= tiny_max)
            box, xwin = _RBOX_TINY, _XWIN_TINY
        elif bucket == "small":
            bf = avalid & (ascale > tiny_max) & (ascale <= small_max)
            box, xwin = _RBOX_SMALL, _XWIN
        else:
            bf = avalid & (ascale > small_max)
            box, xwin = _RBOX, _XWIN
        bidx = scatter_compact(bf, cap_b)
        row_valid = bidx >= 0
        idx = jnp.where(row_valid, aidx[jnp.clip(bidx, 0)], -1)
        outs.append(
            _materialize_reoriented_rows(
                gstacks, cand, xyz, scale, eigs, ori, idx, row_valid,
                bf.sum(), cfg, box, xwin, gz_shift, g_dims,
            )
        )
    return outs


@functools.partial(
    jax.jit, static_argnames=("cfg", "emit_cap", "scale_bucket", "gz_shift", "g_dims")
)
def emit_reoriented_stage(
    gstacks, cand, xyz, scale, kvalid, eigs, ori, ori_valid,
    cfg: SiftConfig, emit_cap: int, scale_bucket: str = "all",
    gz_shift: int = 0, g_dims=None,
):
    """Device-compacted reoriented rows + their freshly resampled patches.

    Only these rows pay the rotated-patch gather cost; the unoriented rows
    reuse the gather-stage patches (pack_unoriented_stage). gstacks is the
    batch [B, 6, Z, Y, X]; cand is the compacted [C, 6] candidate table
    whose vi column indexes into it.

    scale_bucket routes rows to a right-sized sampler box: "tiny" keeps
    rows whose patch fits the 24^3 box / 32-lane x window (~3.5x cheaper
    per row than 48^3/64), "small" the 48^3 box, "large" the rest, "all"
    disables bucketing. Order keys are global, so the host merge
    reassembles reference push order across buckets.

    The union pipeline emits all three buckets per chunk through
    emit_reoriented_buckets (one shared slot-grid compaction); this
    single-bucket entry remains for the spatial pipeline ("all") and
    capacity tests.
    """
    from sift3d.kernels.patch import (
        _RBOX, _RBOX_SMALL, _RBOX_TINY, _XWIN, _XWIN_TINY, rbox_max_scale,
    )

    c, k1, k2 = ori_valid.shape
    s = k1 * k2
    ovf = ori_valid.reshape(c, s) & kvalid[:, None]
    rank = jnp.cumsum(ovf.astype(jnp.int32), axis=1) - 1
    slots = ovf & (rank < cfg.max_orientations)
    box, xwin = _RBOX, _XWIN
    if scale_bucket == "tiny":
        slots = slots & (scale <= rbox_max_scale(_RBOX_TINY))[:, None]
        box, xwin = _RBOX_TINY, _XWIN_TINY
    elif scale_bucket == "small":
        lo = rbox_max_scale(_RBOX_TINY) if _tiny_bucket_enabled() else -1.0
        slots = slots & (
            (scale > lo) & (scale <= rbox_max_scale(_RBOX_SMALL))
        )[:, None]
        box = _RBOX_SMALL
    elif scale_bucket == "large":
        slots = slots & (scale > rbox_max_scale(_RBOX_SMALL))[:, None]
    flat = slots.ravel()
    idx = scatter_compact(flat, emit_cap)
    return _materialize_reoriented_rows(
        gstacks, cand, xyz, scale, eigs, ori, idx, idx >= 0, flat.sum(), cfg,
        box, xwin, gz_shift, g_dims,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "emit_cap", "reoriented"))
def emit_stage(
    gstack, lvl, xyz, scale, keep, sign, eigs, eig_ori, ori, ori_valid,
    cfg: SiftConfig, emit_cap: int, reoriented: bool = True,
):
    """Device-side feature emission: compact (candidate, orientation) rows.

    Replicates the reference's push order (generateFeature3D,
    MultiScale.cpp:1705-1862): for each surviving candidate, first the
    unoriented feature (ori = structure-tensor eigenvectors, REORIENT
    cleared), then its reoriented copies in (primary, secondary) priority
    order capped at cfg.max_orientations, each with a freshly resampled
    rotated patch.

    Everything stays in HBM: the host later downloads only `count` packed
    rows. Returns (count, xyz, scale, eigs, ori, info, lvl, patches) padded
    to emit_cap.
    """
    from sift3d.core.featureset import INFO_FLAG_MIN0MAX1, INFO_FLAG_REORIENT

    c, k1, k2 = ori_valid.shape
    s = k1 * k2
    ovf = ori_valid.reshape(c, s)
    if not reoriented:
        ovf = jnp.zeros_like(ovf)
    rank = jnp.cumsum(ovf.astype(jnp.int32), axis=1) - 1
    slots = jnp.concatenate(
        [keep[:, None], keep[:, None] & ovf & (rank < cfg.max_orientations)], axis=1
    )  # [C, 1+S]
    flat = slots.ravel()
    count = flat.sum()
    idx = scatter_compact(flat, emit_cap)
    row_valid = idx >= 0
    idxc = jnp.clip(idx, 0)
    cand = jnp.clip(idxc // (1 + s), 0, c - 1)
    slot = jnp.where(row_valid, idxc % (1 + s), 0)

    row_xyz = xyz[cand]
    row_scale = scale[cand]
    row_eigs = eigs[cand]
    row_lvl = lvl[cand]
    ori_flat = ori.reshape(c, s, 3, 3)
    slot_ori = ori_flat[cand, jnp.clip(slot - 1, 0)]
    is_un = (slot == 0)[:, None, None]
    row_ori = jnp.where(is_un, eig_ori[cand], slot_ori)
    ident = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), slot_ori.shape)
    sample_ori = jnp.where(is_un, ident, slot_ori)
    row_info = jnp.where(sign[cand] > 0, INFO_FLAG_MIN0MAX1, 0).astype(jnp.uint32)
    row_info = row_info | jnp.where(slot > 0, INFO_FLAG_REORIENT, 0).astype(jnp.uint32)

    patches = sample_patches_leveled(gstack, row_lvl, row_xyz, row_scale, sample_ori)
    # pack the scalar fields into one static-shape buffer so the host can
    # fetch each chunk with a single transfer: columns =
    # [x, y, z, scale, eigs*3, ori*9, info] (info values fit exactly in f32)
    packed = jnp.concatenate(
        [
            row_xyz,
            row_scale[:, None],
            row_eigs,
            row_ori.reshape(-1, 9),
            row_info.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )
    return count, packed, patches


@functools.partial(jax.jit, static_argnames=("variant", "method"))
def descriptor_stage(patches, variant: str = "goh", method: int = 2):
    """NormalizeData + descriptor + rank normalization (featExtract.cpp:477-499)."""
    pn = normalize_patches(patches)
    if variant == "goh":
        d = desc_kernels.goh_descriptor(pn)
        d = desc_kernels.normalize_positive(d)
    else:
        d = desc_kernels.brief_descriptor(pn, variant=variant, method=method)
    return desc_kernels.rank_normalize(d)
