"""Pallas TPU kernel: fused 3-level DoG extrema stencil.

Computes the same strict 80-comparison extrema mask as
sift3d.kernels.extrema.extrema_mask, but as a single Pallas kernel that
streams Z-slabs of the DoG stack through VMEM: each grid step DMAs a
[5, TZ+2, Y, X] halo slab from HBM once and evaluates all comparisons in
vector registers, instead of XLA's materialized shifted-compare chains.

In-plane neighbor shifts use jnp.roll; the wrap-around only corrupts
border voxels, which are masked to zero afterwards (the reference scans
interior voxels only, MultiScale.cpp:2210-2216).

The lax implementation remains the reference semantics and the fallback;
equivalence is tested against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TZ = 2  # z-slab height per grid step (VMEM: slab + plane cache + out)
_VMEM_BUDGET = 15.5 * 2**20  # scoped-vmem limit (16M) with safety margin


def fused_extrema_tz(z: int, y: int, x: int):
    """Largest z-slab height whose kernel fits scoped VMEM, or None.

    Footprint model calibrated on the observed Mosaic allocation (16.69M
    at tz=2, 256x256 planes): the Gaussian slab 6*(tz+2) padded planes,
    double-buffered output blocks (5 f32 + 3 i8 rows per tz), and ~8.5
    f32 working planes per tz of compiler-held intermediates. Volumes
    whose planes are too large even at tz=1 (beyond ~320^2) return None
    and the caller uses the unfused lax stencil — or, for genuinely
    oversized volumes, the Z-sharded spatial pipeline (dist/spatial).
    """
    yq = -(-y // 8) * 8
    xq = -(-x // 128) * 128
    for tz in (_TZ, 1):
        if z < tz + 2:
            continue
        est = 4 * yq * xq * (6 * (tz + 2) + 8.5 * tz) + 2 * tz * y * x * 23
        if est <= _VMEM_BUDGET:
            return tz
    return None


def _extrema_kernel(dogs_hbm, out_ref):
    # dogs_hbm is the batch-flattened [B*5, Zp+2, Yp, Xp] stack; grid is
    # (B, nz) and the out block covers rows [b*3, b*3+3) of [B*3, ...]
    b = pl.program_id(0)
    i = pl.program_id(1)
    tz = out_ref.shape[1]
    y, x = out_ref.shape[2], out_ref.shape[3]

    def body(slab, sem):
        cp = pltpu.make_async_copy(
            dogs_hbm.at[pl.ds(b * 5, 5), pl.ds(i * tz, tz + 2)], slab, sem
        )
        cp.start()
        cp.wait()

        # Separable neighborhood max/min instead of the reference's 80
        # sign comparisons (SIFT_cuda_Tools.cu:1187-1303): a voxel is a
        # strict maximum iff center > max(80 neighbors), and the
        # 3x3(x3-level) window maxes factor into x-rolls then y-rolls —
        # ~4x fewer vector ops than sign-summing every neighbor. The
        # center plane contributes its 8-neighborhood only (x3 of the
        # rows above/below plus the two x neighbors). 2D [Y, X] planes
        # only: >2 non-trivial vector dims fail Mosaic relayout.
        def x3(l, zz):
            p = slab[l, zz]
            pr = jnp.roll(p, 1, axis=1)
            pf = jnp.roll(p, -1, axis=1)
            return (
                jnp.maximum(jnp.maximum(p, pr), pf),
                jnp.minimum(jnp.minimum(p, pr), pf),
            )

        cache = {}

        def yx9(l, zz):
            if (l, zz) not in cache:
                qmax, qmin = x3(l, zz)
                cache[(l, zz)] = (
                    jnp.maximum(
                        jnp.maximum(qmax, jnp.roll(qmax, 1, axis=0)),
                        jnp.roll(qmax, -1, axis=0),
                    ),
                    jnp.minimum(
                        jnp.minimum(qmin, jnp.roll(qmin, 1, axis=0)),
                        jnp.roll(qmin, -1, axis=0),
                    ),
                )
            return cache[(l, zz)]

        for zi in range(tz):
            for c in (1, 2, 3):
                center = slab[c, 1 + zi]
                full = [
                    (c - 1, zi), (c - 1, zi + 1), (c - 1, zi + 2),
                    (c + 1, zi), (c + 1, zi + 1), (c + 1, zi + 2),
                    (c, zi), (c, zi + 2),
                ]
                pairs = [yx9(l, zz) for l, zz in full]
                nmax = functools.reduce(jnp.maximum, [p[0] for p in pairs])
                nmin = functools.reduce(jnp.minimum, [p[1] for p in pairs])
                # center plane: 8-neighborhood excludes the center itself
                qmax, qmin = x3(c, 1 + zi)
                nmax = jnp.maximum(
                    nmax,
                    jnp.maximum(jnp.roll(qmax, 1, axis=0), jnp.roll(qmax, -1, axis=0)),
                )
                nmin = jnp.minimum(
                    nmin,
                    jnp.minimum(jnp.roll(qmin, 1, axis=0), jnp.roll(qmin, -1, axis=0)),
                )
                nmax = jnp.maximum(
                    nmax,
                    jnp.maximum(jnp.roll(center, 1, axis=1), jnp.roll(center, -1, axis=1)),
                )
                nmin = jnp.minimum(
                    nmin,
                    jnp.minimum(jnp.roll(center, 1, axis=1), jnp.roll(center, -1, axis=1)),
                )
                out_ref[c - 1, zi] = jnp.where(center > nmax, 1.0, 0.0) - jnp.where(
                    center < nmin, 1.0, 0.0
                )

    pl.run_scoped(
        body,
        slab=pltpu.VMEM((5, _TZ + 2, y, x), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _dogs_extrema_kernel(zmax_ref, gs_hbm, dogs_ref, mask_ref):
    # gs_hbm: batch-flattened [B*6, Z, Y, X] Gaussian stack; grid (B, nz).
    # dogs block (5, TZ, y, x) f32; mask block (3, TZ, y, x) int8.
    b = pl.program_id(0)
    i = pl.program_id(1)
    tz = dogs_ref.shape[1]
    # compute on the DMA-aligned padded planes, store the real extent
    yd, xd = dogs_ref.shape[2], dogs_ref.shape[3]
    yp, xp = gs_hbm.shape[2], gs_hbm.shape[3]
    zd = zmax_ref[0]

    def body(slab, sem):
        # the caller pads a 1-plane z-halo, so the window start is i*tz
        # and every slab-local index is static (Mosaic rejects slices of
        # tile-unaligned refs, so the DMA must target the WHOLE buffer)
        cp = pltpu.make_async_copy(
            gs_hbm.at[pl.ds(b * 6, 6), pl.ds(i * tz, tz + 2)], slab, sem
        )
        cp.start()
        cp.wait()

        def x3(dog_plane):
            pr = jnp.roll(dog_plane, 1, axis=1)
            pf = jnp.roll(dog_plane, -1, axis=1)
            return (
                jnp.maximum(jnp.maximum(dog_plane, pr), pf),
                jnp.minimum(jnp.minimum(dog_plane, pr), pf),
            )

        dcache = {}

        def dog(l, lz):
            if (l, lz) not in dcache:
                dcache[(l, lz)] = slab[l, lz] - slab[l + 1, lz]
            return dcache[(l, lz)]

        cache = {}

        def yx9(l, lz):
            if (l, lz) not in cache:
                qmax, qmin = x3(dog(l, lz))
                cache[(l, lz)] = (
                    jnp.maximum(
                        jnp.maximum(qmax, jnp.roll(qmax, 1, axis=0)),
                        jnp.roll(qmax, -1, axis=0),
                    ),
                    jnp.minimum(
                        jnp.minimum(qmin, jnp.roll(qmin, 1, axis=0)),
                        jnp.roll(qmin, -1, axis=0),
                    ),
                )
            return cache[(l, lz)]

        yi = jax.lax.broadcasted_iota(jnp.int32, (yd, xd), 0)
        xi = jax.lax.broadcasted_iota(jnp.int32, (yd, xd), 1)
        inner_yx = (
            (yi >= 1) & (yi <= yd - 2) & (xi >= 1) & (xi <= xd - 2)
        ).astype(jnp.float32)
        for zi in range(tz):
            gz = i * tz + zi  # global output row (local plane zi+1)
            lm, lc, lp = zi, zi + 1, zi + 2
            for c in range(5):
                dogs_ref[c, zi] = dog(c, lc)[:yd, :xd]
            for c in (1, 2, 3):
                center = dog(c, lc)
                pairs = [
                    yx9(c - 1, lm), yx9(c - 1, lc), yx9(c - 1, lp),
                    yx9(c + 1, lm), yx9(c + 1, lc), yx9(c + 1, lp),
                    yx9(c, lm), yx9(c, lp),
                ]
                nmax = functools.reduce(jnp.maximum, [p[0] for p in pairs])
                nmin = functools.reduce(jnp.minimum, [p[1] for p in pairs])
                # center plane: 8-neighborhood excludes the center itself
                qmax, qmin = x3(center)
                nmax = jnp.maximum(
                    nmax,
                    jnp.maximum(jnp.roll(qmax, 1, axis=0), jnp.roll(qmax, -1, axis=0)),
                )
                nmin = jnp.minimum(
                    nmin,
                    jnp.minimum(jnp.roll(qmin, 1, axis=0), jnp.roll(qmin, -1, axis=0)),
                )
                nmax = jnp.maximum(
                    nmax,
                    jnp.maximum(jnp.roll(center, 1, axis=1), jnp.roll(center, -1, axis=1)),
                )
                nmin = jnp.minimum(
                    nmin,
                    jnp.minimum(jnp.roll(center, 1, axis=1), jnp.roll(center, -1, axis=1)),
                )
                # all-f32 mask math (scalar-broadcast bools and i1->i8
                # relayouts both trip Mosaic); one f32->i8 pack at the store
                s = (center > nmax).astype(jnp.float32) - (center < nmin).astype(
                    jnp.float32
                )
                zsel = jnp.where((gz >= 1) & (gz <= zd - 2), 1.0, 0.0)
                mask_ref[c - 1, zi] = (s[:yd, :xd] * inner_yx * zsel).astype(
                    jnp.int8
                )

    pl.run_scoped(
        body,
        slab=pltpu.VMEM((6, tz + 2, yp, xp), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def dogs_extrema_pallas(gstack: jnp.ndarray, interpret: bool = False):
    """Fused DoG + 3-level extrema from the Gaussian stack, one kernel.

    gstack: [B, 6, Z, Y, X] (or unbatched) float32. Returns
    (dogs [B, 5, Z, Y, X] f32, mask [B, 3, Z, Y, X] int8 +1 peak/-1 valley).

    Replaces extrema_mask_pallas's standalone flow, which cost ~15 ms per
    6-volume T1 octave against a ~1.5 ms roofline: the halo jnp.pad
    copied the whole DoG stack (X padded 182->256), the sum output was
    written f32 and re-read for the int8 conversion, and XLA separately
    materialized the DoGs. Here the Gaussian slab is DMA'd once, DoGs are
    formed in VMEM (written out for phase 2a's refinement gathers), and
    the mask leaves the kernel already int8 with borders zeroed.

    Requires Z >= 4 (callers fall back to the lax stencil below that).
    """
    batched = gstack.ndim == 5
    if not batched:
        gstack = gstack[None]
    bn, nl, z, y, x = gstack.shape
    tz = fused_extrema_tz(z, y, x)
    assert nl == 6 and tz is not None and z >= tz + 2
    nz = pl.cdiv(z, tz)
    zp = nz * tz
    # 1-plane z-halo + DMA-aligned y/x (a sliced HBM source must have
    # 8/128-aligned trailing dims); outputs stay UNPADDED — the kernel
    # slices the vector values before each store, so the old flow's
    # slice-back copies of the f32 results never happen
    yq = -(-y // 8) * 8
    xq = -(-x // 128) * 128
    gs = jnp.pad(
        gstack, ((0, 0), (0, 0), (1, 1 + zp - z), (0, yq - y), (0, xq - x))
    )
    gs = gs.reshape(bn * 6, zp + 2, yq, xq)

    dogs, mask = pl.pallas_call(
        _dogs_extrema_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bn, nz),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(
                pl.BlockSpec((5, tz, y, x), lambda b, i, *_: (b, i, 0, 0)),
                pl.BlockSpec((3, tz, y, x), lambda b, i, *_: (b, i, 0, 0)),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bn * 5, zp, y, x), jnp.float32),
            jax.ShapeDtypeStruct((bn * 3, zp, y, x), jnp.int8),
        ),
        interpret=interpret,
    )(jnp.asarray([z], jnp.int32), gs)
    dogs = dogs.reshape(bn, 5, zp, y, x)
    mask = mask.reshape(bn, 3, zp, y, x)
    if zp != z:
        dogs, mask = dogs[:, :, :z], mask[:, :, :z]
    return (dogs, mask) if batched else (dogs[0], mask[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def extrema_mask_pallas(dogs: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Pallas version of extrema_mask for [5, Z, Y, X] or [B, 5, Z, Y, X]
    float32 DoGs (the batch dim becomes an extra grid dim).

    Measured 17x faster than the lax shifted-compare implementation on a
    182x218x182 DoG stack (12.7 ms vs 218 ms on one v5e chip).
    """
    batched = dogs.ndim == 5
    if not batched:
        dogs = dogs[None]
    bn, nl, z, y, x = dogs.shape
    assert nl == 5
    nz = pl.cdiv(z, _TZ)
    zp = nz * _TZ
    # Mosaic tiling: sublane dim (y) multiple of 8, lane dim (x) of 128
    yp = -(-y // 8) * 8
    xp = -(-x // 128) * 128
    # left z-halo of 1 plus right padding so every slab DMA is in-bounds
    dogs_p = jnp.pad(dogs, ((0, 0), (0, 0), (1, 1 + zp - z), (0, yp - y), (0, xp - x)))
    dogs_p = dogs_p.reshape(bn * 5, zp + 2, yp, xp)

    s = pl.pallas_call(
        _extrema_kernel,
        out_shape=jax.ShapeDtypeStruct((bn * 3, zp, yp, xp), jnp.float32),
        grid=(bn, nz),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (3, _TZ, yp, xp), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(dogs_p)
    s = s.reshape(bn, 3, zp, yp, xp)[:, :, :z, :y, :x]

    mask = (s > 0).astype(jnp.int8) - (s < 0).astype(jnp.int8)
    interior = jnp.zeros((z, y, x), dtype=bool).at[1:-1, 1:-1, 1:-1].set(True)
    mask = jnp.where(interior, mask, jnp.int8(0))
    return mask if batched else mask[0]
