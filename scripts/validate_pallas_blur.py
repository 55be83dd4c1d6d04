"""Validate + time the Pallas fused blur against the banded-matmul path on TPU.

Checks numerical parity at pyramid-realistic shapes/sigmas, then times both
implementations. All comparisons reduce on device (the tunnel's D2H is far
too slow for full-volume downloads); timing forces a scalar D2H per run
(block_until_ready is unreliable on the tunnel runtime).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from sift3d.kernels import gauss
from sift3d.kernels.gauss_pallas import blur3d_pallas
from sift3d.utils.cache import enable_compilation_cache


@jax.jit
def _relerr(a, b):
    return jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9)


def timed(fn, vol, n=5):
    float(jnp.sum(fn(vol)))  # warm + sync
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(fn(vol)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    shapes = [(182, 218, 182), (91, 109, 91)]
    sigmas = [1.2489995, 0.9733, 2.4579]  # initial + incremental pyramid sigmas
    for shape in shapes:
        vol = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 100.0
        for sigma in sigmas:
            r = len(gauss.gaussian_kernel_1d(sigma, 0.01)) // 2
            err = float(_relerr(blur3d_pallas(vol, sigma, 0.01), gauss.blur3d(vol, sigma, 0.01)))
            tb = timed(lambda v, s=sigma: gauss.blur3d(v, s, 0.01), vol)
            tp = timed(lambda v, s=sigma: blur3d_pallas(v, s, 0.01), vol)
            print(
                f"shape={shape} sigma={sigma:.4f} r={r} relerr={err:.2e} "
                f"banded={tb * 1e3:.2f}ms pallas={tp * 1e3:.2f}ms speedup={tb / tp:.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
