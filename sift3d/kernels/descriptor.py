"""Descriptors: GoH-64 (rank-ordered) and the BRIEF/RRIEF/NRRIEF family.

Reference equivalents:
- msResampleFeaturesGradientOrientationHistogram (MultiScale.cpp:583-710):
  8 orientation bins (cube-corner directions) x 2x2x2 spatial bins = 64-d,
  trilinear spatial splatting, positive-shift L2 normalization
  (msNormalizeDataPositive, MultiScale.cpp:1580-1611).
- Feature3DInfo::NormalizeDataRankedPCs (MultiScale.cpp:207-233): values
  replaced by their ascending sort rank (ties broken by index).
- msGenerateBRIEFindex / msResampleFeaturesBRIEF (MultiScale.cpp:719-1049):
  64 frozen pseudo-random voxel pairs, patch pre-blurred with sigma=0.95,
  descriptor = I(p)-I(q) (RRIEF), its sign (BRIEF), or the difference
  divided by the integer-truncated pair distance (NRRIEF).

TPU design: the spatial splat weights depend only on the voxel position, so
the whole GoH descriptor is one einsum over static per-axis weight tables —
no scatter at all.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax.numpy as jnp

from sift3d.kernels import gauss
from sift3d.kernels.patch import PATCH_DIM, patch_gradients

# 8 orientation bin directions: cube corners (MultiScale.cpp:616-626)
_ORI_DIRS = np.array(
    [
        [1, 1, 1],
        [1, 1, -1],
        [1, -1, 1],
        [1, -1, -1],
        [-1, 1, 1],
        [-1, 1, -1],
        [-1, -1, 1],
        [-1, -1, -1],
    ],
    dtype=np.float32,
)


@functools.lru_cache(maxsize=None)
def _spatial_weight_table() -> np.ndarray:
    """[11, 2] per-axis trilinear splat weights onto the 2-bin grid.

    Port of the bin-coordinate computation (MultiScale.cpp:639-671) plus
    the 0.5-center splat (_fioDetermineInterpCoord on a 2-voxel axis):
    positions 0..4 -> bin 0; position 5 -> half/half; 6..10 -> bin 1.
    """
    bin_size = PATCH_DIM / 2.0  # 5.5
    w = np.zeros((PATCH_DIM, 2), dtype=np.float32)
    for v in range(PATCH_DIM):
        coord = int(v / bin_size) + 0.5
        if int(v / bin_size) != int((v + 1) / bin_size):
            coord = (v / bin_size + (v + 1) / bin_size) / 2.0
        # interp onto 2-voxel axis, 0.5-center convention
        if coord < 0.5:
            i, wt = 0, 1.0
        elif coord >= 1.5:
            i, wt = 0, 0.0
        else:
            i = int(math.floor(coord - 0.5))
            wt = 1.0 - (coord - 0.5 - i)
        w[v, i] += wt
        if i + 1 < 2:
            w[v, i + 1] += 1.0 - wt
    return w


def goh_descriptor(patches_norm: jnp.ndarray) -> jnp.ndarray:
    """64-d gradient orientation histogram for normalized patches.

    Returns [C, 64] with reference memory layout: index =
    ((zbin*2 + ybin)*2 + xbin)*8 + oribin (FEATUREIO vector layout of the
    2x2x2x8 histogram, MultiScale.cpp:630-637).
    """
    grads = patch_gradients(patches_norm)  # [C, 3(dx,dy,dz), z, y, x]
    mag = jnp.sqrt((grads * grads).sum(axis=1))  # [C, z, y, x]
    # orientation bin: max dot of the *unit* edge with cube corners; the
    # normalization does not change the argmax, and argmax picks the first
    # max like the reference scan (MultiScale.cpp:687-698).
    dirs = jnp.asarray(_ORI_DIRS)  # [8, 3]
    dots = jnp.einsum("cgzyx,og->cozyx", grads, dirs)
    obin = jnp.argmax(dots, axis=1)  # [C, z, y, x]
    onehot = (obin[:, None] == jnp.arange(8)[None, :, None, None, None]).astype(mag.dtype)
    weighted = onehot * jnp.where(mag > 0, mag, 0.0)[:, None]  # [C, 8, z, y, x]
    wt = jnp.asarray(_spatial_weight_table())  # [11, 2]
    hist = jnp.einsum("cozyx,za,yb,xd->cabdo", weighted, wt, wt, wt)  # [C,2,2,2,8]
    return hist.reshape(hist.shape[0], 64)


def normalize_positive(desc: jnp.ndarray) -> jnp.ndarray:
    """Subtract min, scale to unit L2 (msNormalizeDataPositive)."""
    shifted = desc - desc.min(axis=-1, keepdims=True)
    norm = jnp.sqrt((shifted * shifted).sum(axis=-1, keepdims=True))
    return shifted / jnp.where(norm > 0, norm, 1.0)


def rank_normalize(desc: jnp.ndarray) -> jnp.ndarray:
    """Replace each value by its ascending sort rank, ties by index
    (NormalizeDataRankedPCs + _sortAscendingMVNature)."""
    order = jnp.argsort(desc, axis=-1, stable=True)
    n = desc.shape[-1]
    ranks = jnp.put_along_axis(
        jnp.zeros_like(desc),
        order,
        jnp.broadcast_to(jnp.arange(n, dtype=desc.dtype), desc.shape),
        axis=-1,
        inplace=False,
    )
    return ranks


# ---------------------------------------------------------------------------
# BRIEF / RRIEF / NRRIEF
# ---------------------------------------------------------------------------

# Frozen pseudo-random pair tables (data constants reproduced from
# msGenerateBRIEFindex, MultiScale.cpp:743-956, for bit-parity with the
# reference; the live RNG code there is commented out with seeds 5/8).
# Layout: 64 triplets (x, y, z) per endpoint.
_BRIEF_TABLES = {
    0: (
        [4,6,2,2,2,2,4,3,8,7,3,2,2,6,3,3,5,8,6,7,5,5,7,4,6,6,3,2,6,8,2,7,2,6,6,7,7,8,8,6,3,2,4,5,5,4,7,7,5,7,4,3,7,2,2,3,8,3,2,4,3,5,4,3,4,2,6,6,5,8,2,3,3,4,7,8,3,2,2,7,3,5,4,5,6,5,6,7,6,8,4,8,4,5,8,5,6,3,6,5,3,7,6,3,8,6,8,2,8,2,8,3,2,3,3,5,3,7,8,3,4,4,5,5,3,2,8,7,6,5,3,6,4,2,4,2,7,5,4,6,7,3,5,4,3,5,2,6,3,2,8,4,4,6,5,4,8,7,2,8,6,5,2,7,5,7,4,2,5,7,4,7,7,4,8,8,2,8,3,4,6,7,5,8,2,4,6,3,8,6,5,4],
        [5,2,3,7,5,8,7,5,6,5,6,3,2,7,4,6,2,8,4,6,6,3,5,7,7,4,3,3,4,8,8,5,3,4,2,6,8,3,3,3,7,8,6,2,6,6,2,5,2,7,8,6,2,7,4,3,8,4,7,7,3,3,8,2,5,2,7,2,4,5,8,3,5,6,3,2,8,2,4,6,7,3,2,4,4,7,4,4,8,8,5,8,2,8,8,5,3,3,5,6,7,4,8,4,8,7,4,7,3,4,6,7,5,2,8,7,6,5,8,7,8,7,8,6,8,4,8,4,5,7,4,8,2,3,8,2,5,4,3,2,8,8,7,3,5,7,4,5,4,6,6,7,7,8,6,8,4,2,6,7,5,4,2,8,8,6,5,8,4,4,4,6,6,4,5,3,4,5,4,4,8,4,3,4,6,5,8,7,7,2,2,3],
    ),
    1: (
        [5,4,4,6,5,5,3,8,5,5,6,3,5,6,5,6,3,4,3,4,5,4,5,4,5,5,5,5,6,5,5,5,5,3,5,7,3,5,5,5,6,6,5,3,6,5,5,5,4,5,5,5,3,5,4,4,6,6,4,3,5,3,3,3,6,6,4,4,5,5,5,5,4,4,5,6,5,4,4,4,4,3,4,4,6,3,2,5,4,4,5,4,3,6,7,5,3,5,4,5,5,4,5,6,3,5,6,5,5,6,5,5,7,6,4,4,6,6,4,4,4,5,2,5,4,5,2,5,5,5,2,6,3,3,5,4,7,5,4,5,3,5,4,6,4,4,3,4,5,4,6,3,4,5,5,6,4,3,4,6,4,4,6,5,4,4,5,5,5,5,4,4,3,7,7,3,6,6,5,7,4,6,2,4,2,5,6,3,3,6,5,6],
        [4,4,2,4,4,4,5,6,4,5,5,5,4,6,6,4,4,5,4,5,5,4,6,4,4,2,7,7,5,3,5,4,5,4,5,4,2,3,5,4,5,5,4,5,5,4,6,5,4,4,6,4,5,5,3,6,4,6,4,4,7,4,5,4,4,2,5,4,6,4,3,5,3,4,7,5,2,4,4,6,3,4,6,5,6,4,4,5,5,3,4,5,4,5,5,5,4,5,5,4,5,4,5,3,4,6,4,5,3,6,5,4,4,6,4,7,4,4,3,6,4,3,7,4,5,6,2,3,6,5,5,5,5,4,4,5,3,4,6,4,5,5,4,2,4,4,4,6,4,6,6,3,6,5,5,3,3,5,5,3,5,3,4,2,3,6,2,4,5,4,7,3,4,3,3,5,4,3,5,4,4,4,6,3,5,4,3,5,7,5,4,4],
    ),
    2: (
        [5,4,4,4,4,2,6,5,5,4,4,4,3,8,5,5,6,3,5,5,5,5,6,5,4,6,6,6,3,4,4,4,5,3,4,5,4,5,5,4,2,7,7,5,3,5,4,5,3,5,7,3,5,5,2,3,5,5,6,6,4,6,5,4,4,6,5,3,5,6,4,3,6,4,4,5,3,3,3,6,6,5,2,4,4,6,3,6,3,2,3,5,4,5,3,4,3,6,5,4,3,6,4,5,2,4,3,7,2,3,6,5,2,6,3,3,5,6,3,6,3,5,3,6,5,7,4,2,5,5,5,2,5,7,4,2,5,3,4,3,3,7,4,4,7,6,4,4,2,8,7,6,5,4,7,3,6,6,5,2,4,5,3,2,5,5,1,6,3,6,3,6,2,5,4,4,7,2,6,3,2,2,4,3,3,2,3,4,2,5,6,7],
        [6,5,3,4,5,3,7,4,6,4,3,2,4,7,5,3,5,1,5,4,7,6,8,4,4,5,6,5,2,5,4,6,4,0,4,3,3,4,4,2,1,7,8,6,4,4,1,6,1,3,7,2,3,3,1,3,6,1,6,6,4,7,6,4,3,5,4,2,3,6,4,5,6,3,3,5,1,3,1,6,7,4,1,4,3,5,2,4,2,1,2,5,4,5,2,3,3,3,3,4,2,6,3,4,3,3,3,6,1,2,5,4,2,4,1,4,6,7,3,6,2,4,3,6,5,6,4,0,6,6,5,1,4,7,2,1,5,3,4,2,2,7,3,3,6,4,2,4,1,9,7,7,5,2,7,1,7,5,5,1,5,4,1,3,3,4,0,5,1,6,3,5,3,2,3,3,7,2,5,1,1,0,4,1,3,1,0,3,1,6,5,9],
    ),
    3: (
        None,  # first endpoint is the patch center (5,5,5)
        [6,4,6,3,4,6,5,4,6,4,6,4,6,3,4,4,6,2,5,5,4,5,3,4,6,5,4,4,5,4,4,4,4,5,4,5,3,5,4,3,3,4,6,7,5,6,4,7,4,4,6,5,4,4,4,3,4,5,6,4,5,3,7,5,4,3,2,5,5,3,4,4,4,5,6,5,6,3,4,3,2,4,6,3,3,4,3,4,4,3,5,3,5,4,4,5,1,6,5,4,5,5,5,6,6,5,4,2,5,5,6,5,7,4,3,5,3,4,3,7,3,7,5,3,6,4,6,4,4,6,3,5,6,4,5,5,7,5,2,4,3,7,6,5,7,4,6,6,5,5,4,5,3,4,3,5,5,5,3,5,3,3,4,6,5,6,6,6,6,6,5,4,2,4,6,6,3,3,5,5,7,3,4,4,4,2,4,6,6,5,6,5],
    ),
    4: (
        None,
        [5,5,4,5,5,6,2,8,5,6,2,4,5,6,9,2,5,5,6,5,8,5,4,1,4,5,9,2,5,3,4,4,5,5,3,2,7,5,3,5,7,4,5,5,2,6,6,2,4,5,4,7,7,6,6,1,5,5,7,3,5,5,3,4,5,7,6,4,8,8,8,4,6,4,7,4,7,5,5,6,3,5,7,5,4,3,7,4,7,2,5,4,2,5,6,5,5,5,1,5,4,6,6,5,4,3,5,6,6,5,7,2,4,5,5,4,3,7,3,4,5,5,9,1,5,4,8,5,7,2,5,2,5,5,7,4,5,2,5,7,8,3,3,2,4,6,5,5,3,5,7,6,5,5,4,7,6,3,5,5,5,8,9,4,5,7,5,5,6,7,3,4,5,5,3,5,8,6,5,3,6,1,3,3,4,3,5,6,4,3,4,5],
    ),
}


@functools.lru_cache(maxsize=None)
def brief_pair_table(method: int = 2, count: int = 64, seed=None):
    """Return (p, q) int arrays [64, 3] of (x, y, z) voxel pairs.

    method 0: uniform; 1: iso-Gaussian; 2: Gaussian pair-centered (default);
    3: center-to-Gaussian; 4: polar grid. When ``seed`` is given the table
    is regenerated with a seeded RNG following the commented-out generator
    in the reference (seeded regeneration per SURVEY.md section 7 step 4).
    """
    if seed is not None:
        rng = np.random.default_rng(seed)
        dim = PATCH_DIM
        if method == 0:
            lo, hi = int(np.ceil(dim / 4)), int(np.ceil(3 * dim / 4))
            p = rng.integers(lo, hi + 1, size=(count, 3))
            q = rng.integers(lo, hi + 1, size=(count, 3))
        else:
            std = max(1.0, ((dim // 2) * (dim // 2)) / 25.0)
            p = np.clip(np.round(rng.normal(dim // 2, std, size=(count, 3))), 0, dim - 1)
            q = np.clip(np.round(rng.normal(dim // 2, std, size=(count, 3))), 0, dim - 1)
        return p.astype(np.int32), q.astype(np.int32)
    t0, t1 = _BRIEF_TABLES[method]
    q = np.asarray(t1, dtype=np.int32).reshape(count, 3)
    if t0 is None:
        p = np.full((count, 3), PATCH_DIM // 2, dtype=np.int32)
    else:
        p = np.asarray(t0, dtype=np.int32).reshape(count, 3)
    return p, q


def brief_descriptor(
    patches_norm: jnp.ndarray,
    variant: str = "rrief",
    method: int = 2,
    blur_sigma: float = 0.95,
) -> jnp.ndarray:
    """BRIEF family descriptor on normalized patches; returns [C, 64].

    Port of msResampleFeaturesBRIEF (MultiScale.cpp:989-1049): the patch is
    blurred with sigma=0.95 (truncation 0.01, zero borders), then for each
    frozen pair (p, q): d = I(p) - I(q); BRIEF stores (d < 0), RRIEF the raw
    difference, NRRIEF d / int(|p - q|).
    """
    p, q = brief_pair_table(method)
    blurred = gauss.blur3d_batched(patches_norm, blur_sigma, 0.01)
    # table entries are (x, y, z); patches are [C, z, y, x]
    vp = blurred[:, p[:, 2], p[:, 1], p[:, 0]]
    vq = blurred[:, q[:, 2], q[:, 1], q[:, 0]]
    d = vp - vq
    if variant == "brief":
        return (d < 0).astype(patches_norm.dtype)
    if variant == "rrief":
        return d
    if variant == "nrrief":
        dist = np.sqrt(((p - q) ** 2).sum(axis=1)).astype(np.int32)  # int truncation
        dist = np.maximum(dist, 1)  # guard identical points
        return d / jnp.asarray(dist.astype(np.float32))
    raise ValueError(f"unknown BRIEF variant: {variant}")
