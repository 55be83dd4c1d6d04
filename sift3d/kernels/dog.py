"""Difference-of-Gaussians.

The reference computes DoG as ``fioMultSum(G0, G1, D, -1.0)`` — an AXPY
elementwise op with its own CUDA kernel and H2D/D2H copies
(src_common/FeatureIO.cpp:1950-1987, cuda_common/SIFT_cuda_Tools.cu:1108-1186).
On TPU it is a single fused VPU subtraction that XLA folds into the
surrounding blur matmuls; no dedicated kernel is needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def mult_sum(a: jnp.ndarray, b: jnp.ndarray, c: float) -> jnp.ndarray:
    """out = a + c * b  (FeatureIO.cpp:1950 fioMultSum)."""
    return a + c * b


def dog(g_lo: jnp.ndarray, g_hi: jnp.ndarray) -> jnp.ndarray:
    """DoG level: less-blurred minus more-blurred (MultiScale.cpp:394)."""
    return g_lo - g_hi
