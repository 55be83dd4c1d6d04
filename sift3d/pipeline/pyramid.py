"""Scale-space pyramid driver.

TPU re-design of msGeneratePyramidDOG3D_efficient (MultiScale.cpp:236-570).
The reference maintains 5 rolling buffers and interleaves detection with
blurring to save memory, re-validating candidates one level later; on TPU
we compute each octave's full 6-level Gaussian stack, 5 DoG levels and the
fused 3-level extrema mask in one jitted program per octave shape — every
intermediate stays in HBM, and the incremental-validation trick collapses
into the fused stencil (SURVEY.md section 2.3 quirk 8).

Sigma schedule (MultiScale.cpp:288-291, 365-369, 526-527):
  sigma_init = 0.5 / initial_image_scale
  level 0 blur: sqrt(sigma_base^2 - sigma_init^2) applied to the input
  level j blur: sigma_{j-1} * sqrt(2^(2/3) - 1), sigma_j = 1.6 * 2^(j/3)
  next octave base: 2x subsample of level 3 (sigma = 3.2 == 2 * 1.6)
"""

from __future__ import annotations

import functools
import math
from typing import List, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from sift3d.core.config import SiftConfig
from sift3d.kernels import gauss
from sift3d.kernels.extrema import extrema_mask
from sift3d.kernels.resample import subsample_2x


class OctaveResult(NamedTuple):
    gstack: jnp.ndarray  # [6, Z, Y, X]  (batched: [B, 6, Z, Y, X])
    dogs: jnp.ndarray  # [5, Z, Y, X]  (batched: [B, 5, Z, Y, X])
    mask: jnp.ndarray  # [3, Z, Y, X] int8 +1 peak / -1 valley ([B, 3, ...])
    next_base: jnp.ndarray  # [Z/2, Y/2, X/2]  ([B, Z/2, Y/2, X/2])


def _blur(vol, sigma, precision, matmul_precision=None):
    """Per-level blur: banded MXU matmuls by default.

    A fused 3-axis Pallas kernel exists (kernels/gauss_pallas.py) but
    measured *slower* in-chain at T1 size (3.2 ms vs 2.7 ms per blur on
    v5e; see PERFORMANCE.md) — XLA's banded-matmul lowering already
    saturates the bandwidth bound. Opt in with SIFT3D_PALLAS_BLUR=1 for
    re-measurement on other hardware (the Pallas path has no matmul-
    precision ladder, so it only serves the default "high" setting).
    """
    import os

    if (
        vol.ndim == 3
        and jax.default_backend() == "tpu"
        and os.environ.get("SIFT3D_PALLAS_BLUR")
        and gauss._resolve_precision(matmul_precision) is jax.lax.Precision.HIGH
    ):
        from sift3d.kernels.gauss_pallas import blur3d_pallas

        return blur3d_pallas(vol, sigma, precision)
    return gauss.blur3d(vol, sigma, precision, matmul_precision)


def octave_core(base: jnp.ndarray, cfg: SiftConfig):
    """One octave: blur chain + DoGs + fused extrema mask + 2x subsample.

    `base` may be a single [Z, Y, X] volume or a batch [B, Z, Y, X]; all
    kernels are batch-general, so a whole batch of volumes advances
    through the octave in ONE compiled program — on the tunnel runtime
    the per-dispatch host latency (~30 ms) dominates octave compute, so
    batching dispatches is the main pyramid-throughput lever.
    """
    inc = cfg.incremental_sigmas()
    levels = [base]
    for j in range(1, cfg.blurs_total):
        levels.append(
            _blur(levels[-1], inc[j - 1], cfg.blur_precision,
                  cfg.blur_matmul_precision)
        )
    gstack = jnp.stack(levels, axis=-4)  # level dim before Z, Y, X
    # fused Pallas DoG + extrema on TPU (one Gaussian-slab pass produces
    # both, ~6x the separate subtract + stencil flow); lax elsewhere
    from sift3d.kernels.extrema_pallas import dogs_extrema_pallas, fused_extrema_tz

    if (
        jax.default_backend() == "tpu"
        and gstack.shape[-4] == 6
        and fused_extrema_tz(*gstack.shape[-3:]) is not None
    ):
        dogs, mask = dogs_extrema_pallas(gstack)
    else:
        dogs = gstack[..., :-1, :, :, :] - gstack[..., 1:, :, :, :]
        if dogs.ndim == 5:
            mask = jax.vmap(extrema_mask)(dogs)
        else:
            mask = extrema_mask(dogs)
    next_base = subsample_2x(levels[cfg.blurs_per_octave])
    return gstack, dogs, mask, next_base


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def octave_step(base: jnp.ndarray, cfg: SiftConfig) -> OctaveResult:
    return OctaveResult(*octave_core(base, cfg))


def initial_blur_core(img: jnp.ndarray, cfg: SiftConfig, initial_image_scale: float = 1.0):
    """Raise the input image to sigma_base (MultiScale.cpp:288-298)."""
    sigma_init = cfg.sigma_init
    if initial_image_scale > 0:
        sigma_init = sigma_init / initial_image_scale
    extra = math.sqrt(max(cfg.sigma_base**2 - sigma_init**2, 0.0))
    return _blur(img, extra, cfg.blur_precision, cfg.blur_matmul_precision)


initial_blur = functools.partial(jax.jit, static_argnames=("cfg", "initial_image_scale"))(
    initial_blur_core
)


def num_octaves(shape_zyx, cfg: SiftConfig) -> int:
    """Octaves until any dimension would be <= 2 (MultiScale.cpp:359-360)."""
    n = 0
    z, y, x = shape_zyx
    while z > 2 and y > 2 and x > 2:
        n += 1
        z, y, x = z // 2, y // 2, x // 2
    return n
