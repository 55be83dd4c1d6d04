"""Separable 3D Gaussian blur as MXU matmuls.

The reference implements the blur as three 1D FIR passes with zero-padded
borders (src_common/GaussBlur3D.cpp:329-479 `blur_3d_simpleborders`, CUDA
twin in cuda_common/SIFT_cuda_Tools.cu:176-441), with the truncated filter
size chosen by a tail-mass rule (src_common/GaussianMask.cpp:12-57) and the
filter L1-normalized after generation (GaussBlur3D.cpp:1190-1201).

TPU-native design: a 1D FIR along an axis of length L is a banded L x L
matrix multiply. The MXU turns each pass into a single dense matmul
(einsum over the blur axis), which both saturates the systolic array and
keeps the whole pyramid resident in HBM — there is no analogue of the
reference's per-op H2D/D2H copies. Zero-padding falls out for free: the
banded matrix simply has no taps outside the volume.

For typical MRI dims (L <= 512) the dense banded matmul is faster on TPU
than gather-based stencils despite the wasted multiplies, because the MXU's
FLOP rate dwarfs the VPU's and the op stays bandwidth-bound.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_filter_size(sigma: float, min_value: float) -> int:
    """Truncated filter length (odd) for a given sigma.

    Exact reimplementation of calculate_gaussian_filter_size
    (src_common/GaussianMask.cpp:12-57): grow the radius until the truncated
    tail holds at most ``min_value`` of the (discretely estimated) total
    mass. Returns 2*radius + 1.
    """
    if sigma == 0:
        return 1
    # Estimate total mass sum_{i=-inf..inf} exp(-i^2 / 2 sigma^2)
    cur_volume = 1.0
    new_volume = 1.0
    i = 0
    while True:
        i += 1
        cur_volume = new_volume
        new_volume = cur_volume + 2.0 * math.exp((i * i) / (-2.0 * sigma * sigma))
        if not (new_volume - cur_volume > 1e-5):
            break
    value = 1.0
    i = 1
    while value <= cur_volume * (1.0 - min_value):
        value += 2.0 * math.exp((i * i) / (-2.0 * sigma * sigma))
        i += 1
    i -= 1
    return 2 * i + 1


def gaussian_kernel_1d(sigma: float, min_value: float) -> np.ndarray:
    """L1-normalized 1D Gaussian FIR taps (float32).

    Matches generate_gaussian_filter1d (GaussianMask.cpp:300-326) followed
    by the explicit normalization in gb3d_blur3d_interleave
    (GaussBlur3D.cpp:1190-1201). sigma == 0 gives the delta filter.
    """
    size = gaussian_filter_size(sigma, min_value)
    if sigma <= 0.0:
        return np.ones((1,), dtype=np.float32)
    center = size // 2
    j = np.arange(size, dtype=np.float32) - np.float32(center)
    scale = np.float32(1.0 / (sigma * math.sqrt(2.0 * math.pi)))
    taps = scale * np.exp((j * j) / np.float32(sigma * sigma) / np.float32(-2.0))
    taps = taps.astype(np.float32)
    taps /= taps.sum(dtype=np.float32)
    return taps.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _banded_matrix(dim: int, sigma: float, min_value: float) -> np.ndarray:
    """Dense banded blur matrix B with zero-padding semantics.

    out[o] = sum_i x[i] * B[i, o],  B[i, o] = taps[i - o + r] for |i-o| <= r.
    Rows/columns outside the volume are simply absent, which is exactly the
    reference's zero-border behaviour.
    """
    taps = gaussian_kernel_1d(sigma, min_value)
    r = len(taps) // 2
    b = np.zeros((dim, dim), dtype=np.float32)
    for o in range(dim):
        lo = max(0, o - r)
        hi = min(dim, o + r + 1)
        b[lo:hi, o] = taps[lo - o + r : hi - o + r]
    return b


# Blur matmuls must not run at the TPU default f32 einsum precision (one
# bf16 MXU pass, ~1e-2 relative error): that perturbs DoG extrema and
# breaks parity with the f32 reference. The default is HIGHEST
# (full-f32-equivalent MXU passes) since round 5: HIGH (bf16x3, ~1e-6
# relative) flips tie-margin extrema — a handful on sparse volumes
# (the -2+/-w probe cells) but ~6% of keypoints in the dense regime
# (PARITY_r05_dense: repeatability 0.938 at HIGH vs 0.9956 at HIGHEST)
# — while HIGHEST measured FREE end-to-end in three paired 12/3 A/Bs
# (24.19/24.18, 23.73/24.30; the blur chain is bandwidth-bound, so the
# extra MXU passes hide). SIFT3D_BLUR_MATMUL_PRECISION=high restores
# the bf16x3 passes for speed experiments.
# Snapshotted at import: the value is baked into jitted programs.
import os as _os

_PRECISIONS = {
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _precision_from_name(name: str, source: str) -> jax.lax.Precision:
    try:
        return _PRECISIONS[name]
    except KeyError:
        raise ValueError(
            f"{source} must be one of {sorted(_PRECISIONS)} (got {name!r})"
        ) from None


_BLUR_PRECISION = _precision_from_name(
    _os.environ.get("SIFT3D_BLUR_MATMUL_PRECISION", "highest"),
    "SIFT3D_BLUR_MATMUL_PRECISION",
)


def _resolve_precision(matmul_precision):
    """None -> the module default (env-overridable); else by name."""
    if matmul_precision is None:
        return _BLUR_PRECISION
    return _precision_from_name(matmul_precision, "matmul_precision")


def blur_axis(vol: jnp.ndarray, axis: int, sigma: float, min_value: float,
              matmul_precision: str | None = None) -> jnp.ndarray:
    """Blur one spatial axis of a [..., Z, Y, X] volume via a banded matmul.

    `axis` indexes the three trailing spatial dims (0=Z, 1=Y, 2=X); any
    leading dims (e.g. a volume batch) ride along as einsum ellipses,
    which XLA lowers to one batched MXU matmul.
    """
    dim = vol.shape[vol.ndim - 3 + axis]
    b = jnp.asarray(_banded_matrix(dim, float(sigma), float(min_value)))
    specs = {0: "...zyx,zw->...wyx", 1: "...zyx,yw->...zwx", 2: "...zyx,xw->...zyw"}
    return jnp.einsum(
        specs[axis], vol, b, preferred_element_type=jnp.float32,
        precision=_resolve_precision(matmul_precision),
    )


def blur3d(vol: jnp.ndarray, sigma: float, min_value: float = 0.01,
           matmul_precision: str | None = None) -> jnp.ndarray:
    """Separable 3D Gaussian blur with zero-padded borders.

    Equivalent of gb3d_blur3d (GaussBlur3D.cpp:1262-1285) on the CPU/GPU
    paths: x pass, then y, then z (pass order does not change the result
    for separable filters; the reference also runs x->y->z).

    matmul_precision: "highest" (default since round 5, full f32) or
    "high" (bf16x3). The f64 probes (scripts/doubled_surplus_probe.py)
    showed bf16x3 flips tie-margin extrema on -2+ doubled and -w
    resampled chains, and the dense full-size parity cell showed the
    same class costs ~6% keypoint repeatability at high feature
    density; HIGHEST removes all of it at measured-zero end-to-end
    cost (PERFORMANCE.md round 5).
    """
    if sigma <= 0.0:
        return vol
    out = blur_axis(vol, 2, sigma, min_value, matmul_precision)
    out = blur_axis(out, 1, sigma, min_value, matmul_precision)
    out = blur_axis(out, 0, sigma, min_value, matmul_precision)
    return out


def blur3d_batched(vols: jnp.ndarray, sigma: float, min_value: float = 0.01) -> jnp.ndarray:
    """Blur a batch of volumes [B, Z, Y, X] (used by patch-histogram blurs).

    The einsum contracts the blur axis only, so batching is free.
    """
    if sigma <= 0.0:
        return vols
    bz = jnp.asarray(_banded_matrix(vols.shape[1], float(sigma), float(min_value)))
    by = jnp.asarray(_banded_matrix(vols.shape[2], float(sigma), float(min_value)))
    bx = jnp.asarray(_banded_matrix(vols.shape[3], float(sigma), float(min_value)))
    kw = dict(preferred_element_type=jnp.float32, precision=_BLUR_PRECISION)
    out = jnp.einsum("bzyx,xw->bzyw", vols, bx, **kw)
    out = jnp.einsum("bzyx,yw->bzwx", out, by, **kw)
    out = jnp.einsum("bzyx,zw->bwyx", out, bz, **kw)
    return out
