"""Fused 3-level DoG extrema detection.

The reference detects extrema in two stages: a 26+27-neighbor strict
extremum scan against the level below (CPU: MultiScale.cpp:2140-2400
regFindFEATUREIO*, GPU: SIFT_cuda_Tools.cu:1187-1303 sum-of-sign +-53
kernel plus a host scan), then re-validates survivors against the level
above one pyramid step later (MultiScale.cpp:425-453,
validateDifferencePeak3D/Valley3D: strict over 27 voxels including center).
The union is a strict extremum over the full 80-comparison neighborhood:
26 in-level + 27 below + 27 above.

TPU-native design: express the whole thing as one fused stencil over the
DoG stack — 80 shifted elementwise comparisons that XLA fuses into a single
pass, producing a dense int8 sign mask. No host scan, no candidate list on
device; the ragged extraction happens on the tiny mask afterwards.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp


def extrema_mask(dogs: jnp.ndarray) -> jnp.ndarray:
    """Strict 3-level extrema over a DoG stack.

    Args:
      dogs: [L, Z, Y, X] DoG levels of one octave (L >= 3).

    Returns:
      int8 [L-2, Z, Y, X]: +1 where dogs[c+1] is a strict maximum over its
      80-voxel neighborhood (levels c, c+1, c+2), -1 for strict minima,
      0 elsewhere. Borders (any spatial index at 0 or dim-1) are 0, matching
      the reference's interior-only scan (MultiScale.cpp:2210-2216).
    """
    num_levels = dogs.shape[0]
    z, y, x = dogs.shape[1:]
    centers = dogs[1 : num_levels - 1]  # [C, Z, Y, X]

    pad = jnp.pad(dogs, ((0, 0), (1, 1), (1, 1), (1, 1)))

    is_max = jnp.ones(centers.shape, dtype=bool)
    is_min = jnp.ones(centers.shape, dtype=bool)
    for dl in (-1, 0, 1):
        lvl = pad[1 + dl : 1 + dl + num_levels - 2]
        for dz, dy, dx in itertools.product((-1, 0, 1), repeat=3):
            if dl == 0 and dz == 0 and dy == 0 and dx == 0:
                continue
            neigh = lvl[:, 1 + dz : 1 + dz + z, 1 + dy : 1 + dy + y, 1 + dx : 1 + dx + x]
            is_max &= centers > neigh
            is_min &= centers < neigh

    mask = is_max.astype(jnp.int8) - is_min.astype(jnp.int8)

    # Zero the spatial borders (padding made them compare against zeros).
    interior = jnp.zeros((z, y, x), dtype=bool).at[1:-1, 1:-1, 1:-1].set(True)
    return jnp.where(interior, mask, jnp.int8(0))


def quadratic_interp_1d(f_lo, f_c, f_hi, x_lo, x_c, x_hi):
    """Vertex of the parabola through three points; x_c if degenerate.

    Port of interpolate_extremum_quadratic (MultiScale.cpp:1641-1697) for
    uniformly or non-uniformly spaced abscissae, without the assert: when
    the center is not a strict extremum or the fit degenerates we return
    x_c (the reference aborts in debug builds and returns x1 in release —
    we implement the release/intended behaviour; see SURVEY.md section 2.3
    quirk 6).
    """
    a1, b1 = x_lo * x_lo, x_lo
    a2, b2 = x_c * x_c, x_c
    a3, b3 = x_hi * x_hi, x_hi

    def det3(p1, p2, p3, q1, q2, q3, r1, r2, r3):
        return p1 * q2 * r3 - p1 * q3 * r2 - p2 * q1 * r3 + p3 * q1 * r2 + p2 * q3 * r1 - p3 * q2 * r1

    det = det3(a1, a2, a3, b1, b2, b3, 1.0, 1.0, 1.0)
    detx = det3(f_lo, f_c, f_hi, b1, b2, b3, 1.0, 1.0, 1.0)
    dety = det3(a1, a2, a3, f_lo, f_c, f_hi, 1.0, 1.0, 1.0)

    valid = (det != 0) & (detx != 0)
    denom = jnp.where(valid, -2.0 * detx, 1.0)
    return jnp.where(valid, dety / denom, x_c)
