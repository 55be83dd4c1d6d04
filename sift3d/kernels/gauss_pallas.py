"""Pallas TPU kernel: fused separable 3D Gaussian blur.

One HBM round trip per pyramid level instead of three: each grid step
DMAs a z-slab with a filter-radius halo into VMEM, applies the x and y
FIR passes with lane/sublane rolls, then contracts the z taps into the
output block.

Zero-padding semantics are preserved exactly by padding the input with
>= radius zeros on every axis outside the kernel: rolls wrap values from
the zero pad into the borders, which is precisely what zero-padding
produces. Outputs are cropped back to the true dims.

The banded-matmul implementation in sift3d.kernels.gauss remains the
reference semantics and the non-TPU fallback; equivalence is tested.

Measured on v5e at T1 size (182x218x182), 12 chained blurs in one jit:
3.20 ms per blur vs 2.72 ms for the banded matmuls — the XLA lowering
already sits at the HBM bandwidth bound, so this kernel is NOT the
production default (opt in with SIFT3D_PALLAS_BLUR=1). Kept because the
fusion pattern (slab DMA + in-VMEM multi-axis FIR) is the right shape
for larger radii / fused blur+DoG experiments.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sift3d.kernels.gauss import gaussian_kernel_1d


def _blur_kernel(vol_hbm, out_ref, *, taps, tz):
    r = len(taps) // 2
    i = pl.program_id(0)
    yp, xp = out_ref.shape[1], out_ref.shape[2]

    def body(slab, xy, sem):
        cp = pltpu.make_async_copy(vol_hbm.at[pl.ds(i * tz, tz + 2 * r)], slab, sem)
        cp.start()
        cp.wait()

        # x then y pass over every slab plane (the z halo rows need the
        # in-plane blur too); rolls wrap through the zero padding
        for zi in range(tz + 2 * r):
            plane = slab[zi]
            acc = taps[r] * plane
            for j in range(1, r + 1):
                # pltpu.roll requires non-negative shifts: dim - j == -j
                acc = acc + taps[r - j] * pltpu.roll(plane, j, 1)
                acc = acc + taps[r + j] * pltpu.roll(plane, xp - j, 1)
            acc2 = taps[r] * acc
            for j in range(1, r + 1):
                acc2 = acc2 + taps[r - j] * pltpu.roll(acc, j, 0)
                acc2 = acc2 + taps[r + j] * pltpu.roll(acc, yp - j, 0)
            xy[zi] = acc2

        # z pass: contract the taps into the output rows
        for zi in range(tz):
            acc = taps[0] * xy[zi]
            for j in range(1, 2 * r + 1):
                acc = acc + taps[j] * xy[zi + j]
            out_ref[zi] = acc

    pl.run_scoped(
        body,
        slab=pltpu.VMEM((tz + 2 * r, yp, xp), jnp.float32),
        xy=pltpu.VMEM((tz + 2 * r, yp, xp), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("sigma", "min_value", "interpret"))
def blur3d_pallas(
    vol: jnp.ndarray, sigma: float, min_value: float = 0.01, interpret: bool = False
) -> jnp.ndarray:
    """Fused separable blur of a [Z, Y, X] float32 volume."""
    taps = tuple(float(t) for t in gaussian_kernel_1d(sigma, min_value))
    r = len(taps) // 2
    if r == 0:
        return vol
    z, y, x = vol.shape
    tz = 4
    nz = pl.cdiv(z, tz)
    zp = nz * tz
    # pad: z by (r, r + slab slack); y to 8-mult with >= r slack; x to
    # 128-mult with >= r slack (wrap-through-zeros correctness)
    yp = -(-(y + r) // 8) * 8
    xp = -(-(x + r) // 128) * 128
    volp = jnp.pad(vol, ((r, r + zp - z), (0, yp - y), (0, xp - x)))

    out = pl.pallas_call(
        functools.partial(_blur_kernel, taps=taps, tz=tz),
        out_shape=jax.ShapeDtypeStruct((zp, yp, xp), jnp.float32),
        grid=(nz,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tz, yp, xp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(volp)
    return out[:z, :y, :x]