"""Volume resampling: 2x octave subsampling, 2x upsampling, trilinear ops.

Reference equivalents:
- subsample_2x:      fioSubSampleInterpolate (FeatureIO.cpp:1475-1554) /
                     cudaSubSampleInterpolate (SIFT_cuda_Tools.cu:1007-1101):
                     each output voxel is the mean of its 8 children.
- subsample_2x (2D-safe 8-mean): fioSubSample2DCenterPixel
                     (FeatureIO.cpp:1671-1714), used by the CLI's `-2-`.
- double_size:       fioDoubleSize (FeatureIO.cpp:2453-2548): 2x linear
                     upsampling with edge clamping, used by `-2+`.
- trilinear sampling: fioGetPixelTrilinearInterp (FeatureIO.cpp:813-852)
                     with the 0.5-voxel-center convention of
                     _fioDetermineInterpCoord (FeatureIO.cpp:752-781).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def subsample_2x(vol: jnp.ndarray, mxu: bool | None = None) -> jnp.ndarray:
    """Halve each spatial dimension of a [..., Z, Y, X] volume; each output
    voxel = mean of the 2x2x2 block.

    Matches fioSubSampleInterpolate for even dims (odd trailing voxels are
    dropped, as in the reference where out dims are in/2). Leading dims
    (volume batch) ride along.

    mxu=None picks the matmul formulation on TPU (strided pair-means
    lower to lane relayouts there, ~25 ms at batch-8 T1 size; the three
    2-tap banded matmuls at HIGHEST are ~free and agree with the
    reshape-mean to ~1 ulp — different f32 summation order, not
    bit-identical). Pass mxu explicitly to pin a path (tests exercise
    the matmul path on CPU; SIFT3D_NO_MXU_SUBSAMPLE=1 disables it).
    """
    import os

    z, y, x = vol.shape[-3:]
    lead = vol.shape[:-3]
    z2, y2, x2 = z // 2, y // 2, x // 2
    if mxu is None:
        mxu = jax.default_backend() == "tpu" and not os.environ.get(
            "SIFT3D_NO_MXU_SUBSAMPLE"
        )
    if mxu:
        def pool(dim, half):
            m = np.zeros((dim, half), np.float32)
            idx = np.arange(half)
            m[2 * idx, idx] = 0.5
            m[2 * idx + 1, idx] = 0.5
            return jnp.asarray(m)

        kw = dict(
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        v = jnp.einsum("...zyx,zZ->...Zyx", vol, pool(z, z2), **kw)
        v = jnp.einsum("...zyx,yY->...zYx", v, pool(y, y2), **kw)
        return jnp.einsum("...zyx,xX->...zyX", v, pool(x, x2), **kw)
    v = vol[..., : 2 * z2, : 2 * y2, : 2 * x2]
    v = v.reshape(lead + (z2, 2, y2, 2, x2, 2))
    return v.mean(axis=(-5, -3, -1))


def double_size(vol: jnp.ndarray) -> jnp.ndarray:
    """2x linear upsampling matching fioDoubleSize exactly.

    out[2i] = in[i]; out[2i+1] = (in[i] + in[i+1]) / 2 with the last cell
    clamped (the reference copies in[i] when i+1 is out of range, which for
    the +1 offsets reduces to duplicating the edge sample).
    """

    def up_axis(v, axis):
        a = jnp.moveaxis(v, axis, 0)
        nxt = jnp.concatenate([a[1:], a[-1:]], axis=0)
        even = a
        odd = 0.5 * (a + nxt)
        out = jnp.stack([even, odd], axis=1).reshape((2 * a.shape[0],) + a.shape[1:])
        return jnp.moveaxis(out, 0, axis)

    out = vol
    for axis in range(3):
        if vol.shape[axis] > 1:
            out = up_axis(out, axis)
    return out


def _interp_coord(c, dim):
    """Index + weight for 1D linear interpolation, 0.5-center convention.

    Port of _fioDetermineInterpCoord (FeatureIO.cpp:752-781):
      c < 0.5        -> index 0,      weight 1 (clamp low)
      c >= dim - 0.5 -> index dim-2,  weight 0 (clamp high: all on dim-1)
      else           -> index floor(c - 0.5), weight 1 - frac(c - 0.5)
    Returns (i, w) where value = w * v[i] + (1 - w) * v[i + 1].
    """
    ch = c - 0.5
    i = jnp.clip(jnp.floor(ch).astype(jnp.int32), 0, dim - 2)
    w = 1.0 - (ch - i.astype(ch.dtype))
    w = jnp.where(c < 0.5, 1.0, w)
    w = jnp.where(c >= dim - 0.5, 0.0, w)
    return i, w


def trilinear_sample(vol: jnp.ndarray, x, y, z):
    """Trilinear sample at continuous (x, y, z), voxel centers at i + 0.5.

    Coordinates outside the volume clamp to the border (the interpolation
    coordinate logic saturates, exactly like the reference's
    fioGetPixelTrilinearInterp which never indexes out of range).
    x/y/z may be arrays of any (matching) shape.
    """
    zd, yd, xd = vol.shape
    ix, wx = _interp_coord(x, xd)
    iy, wy = _interp_coord(y, yd)
    iz, wz = _interp_coord(z, zd)

    def g(dz, dy, dx):
        return vol[iz + dz, iy + dy, ix + dx]

    c000 = g(0, 0, 0)
    c001 = g(0, 0, 1)
    c010 = g(0, 1, 0)
    c011 = g(0, 1, 1)
    c100 = g(1, 0, 0)
    c101 = g(1, 0, 1)
    c110 = g(1, 1, 0)
    c111 = g(1, 1, 1)

    n00 = wx * c000 + (1.0 - wx) * c001
    n01 = wx * c100 + (1.0 - wx) * c101
    n10 = wx * c010 + (1.0 - wx) * c011
    n11 = wx * c110 + (1.0 - wx) * c111
    nn0 = wy * n00 + (1.0 - wy) * n10
    nn1 = wy * n01 + (1.0 - wy) * n11
    return wz * nn0 + (1.0 - wz) * nn1


def trilinear_splat_weights(x, y, z, dims):
    """Corner indices and weights for a trilinear scatter-add.

    The splat twin of trilinear_sample; port of fioIncPixelTrilinearInterp
    (FeatureIO.cpp:854-895). Returns (iz, iy, ix, w) each of shape
    inputs.shape + (8,), with w summing to 1 per point.
    """
    zd, yd, xd = dims
    ix, wx = _interp_coord(x, xd)
    iy, wy = _interp_coord(y, yd)
    iz, wz = _interp_coord(z, zd)

    offs = jnp.array(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1], [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]],
        dtype=jnp.int32,
    )  # (8, [dz,dy,dx])
    izc = iz[..., None] + offs[:, 0]
    iyc = iy[..., None] + offs[:, 1]
    ixc = ix[..., None] + offs[:, 2]
    wzc = jnp.where(offs[:, 0] == 0, wz[..., None], 1.0 - wz[..., None])
    wyc = jnp.where(offs[:, 1] == 0, wy[..., None], 1.0 - wy[..., None])
    wxc = jnp.where(offs[:, 2] == 0, wx[..., None], 1.0 - wx[..., None])
    return izc, iyc, ixc, wzc * wyc * wxc


def isotropic_resample(vol: jnp.ndarray, voxel_size, out_dims=None):
    """Resample an anisotropic volume to isotropic min-voxel-size grid.

    Port of the `-w` path in fioReadNifti (featExtract.cpp:118-204):
    out dims = n_i * d_i / min(d); sample at (i * min/d_i + 0.5).
    Returns (resampled volume, min voxel size).
    """
    dx, dy, dz = [float(v) for v in voxel_size]
    dmin = min(dx, dy, dz)
    zd, yd, xd = vol.shape
    if out_dims is None:
        ox = int(xd * dx / dmin)
        oy = int(yd * dy / dmin)
        oz = int(zd * dz / dmin)
    else:
        ox, oy, oz = out_dims
    fx = dmin / dx
    fy = dmin / dy
    fz = dmin / dz
    xs = jnp.arange(ox, dtype=jnp.float32) * fx + 0.5
    ys = jnp.arange(oy, dtype=jnp.float32) * fy + 0.5
    zs = jnp.arange(oz, dtype=jnp.float32) * fz + 0.5
    zg, yg, xg = jnp.meshgrid(zs, ys, xs, indexing="ij")
    return trilinear_sample(vol, xg, yg, zg), dmin
