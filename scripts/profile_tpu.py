"""Profile the dense pyramid on the real TPU at benchmark size.

Times compile vs steady-state execution of each jitted program the
extraction pipeline uses, at T1 scale (182x218x182). Run on the hardware
platform (no JAX_PLATFORMS override).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sift3d.core.config import DEFAULT_CONFIG
from sift3d.pipeline import features as fstage
from sift3d.pipeline import pyramid
from sift3d.utils.cache import enable_compilation_cache


def timed(label, fn, *args, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    print(f"{label:40s} {1e3 * (t1 - t0):10.1f} ms", flush=True)
    return out


def main():
    enable_compilation_cache()
    cfg = DEFAULT_CONFIG
    dims = tuple(int(v) for v in os.environ.get("PROFILE_DIMS", "182,218,182").split(","))
    print("platform:", jax.devices()[0].platform, jax.devices()[0], flush=True)
    print("dims:", dims, flush=True)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal(dims), jnp.float32)

    base = timed("initial_blur (compile+run)", pyramid.initial_blur, vol, cfg)
    base = timed("initial_blur (steady)", pyramid.initial_blur, vol, cfg)

    res = timed("octave_step (compile+run)", pyramid.octave_step, jnp.array(base), cfg)
    res = timed("octave_step (steady)", pyramid.octave_step, jnp.array(base), cfg)

    from sift3d.pipeline.extract import _extract_candidates

    t0 = time.perf_counter()
    cand = _extract_candidates(res.mask, 65536)
    print(
        f"{'candidate compaction+download':40s} {1e3 * (time.perf_counter() - t0):10.1f} ms"
        f"  ({cand[0].size} candidates)",
        flush=True,
    )

    # feature-stage programs at chunk size
    chunk = cfg.feature_chunk
    lvl = jnp.ones((chunk,), jnp.int32)
    zyx = jnp.full((chunk, 3), 8, jnp.int32)
    valid = jnp.ones((chunk,), bool)
    sigmas = tuple(cfg.level_sigmas())
    out = timed("gather_stage (compile+run)", fstage.gather_stage, res.gstack, res.dogs, lvl, zyx, valid, sigmas)
    out = timed("gather_stage (steady)", fstage.gather_stage, res.gstack, res.dogs, lvl, zyx, valid, sigmas)
    patches = out[3]
    o = timed("orient_stage (compile+run)", fstage.orient_stage, patches, cfg)
    o = timed("orient_stage (steady)", fstage.orient_stage, patches, cfg)
    d = timed("descriptor_stage (compile+run)", fstage.descriptor_stage, patches, "goh")
    d = timed("descriptor_stage (steady)", fstage.descriptor_stage, patches, "goh")

    ident = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (chunk, 3, 3))
    xyzf = jnp.full((chunk, 3), 20.0, jnp.float32)
    scalef = jnp.full((chunk,), 3.0, jnp.float32)
    r = timed("resample_stage (compile+run)", fstage.resample_stage, res.gstack, xyzf, scalef, ident, lvl)
    r = timed("resample_stage (steady)", fstage.resample_stage, res.gstack, xyzf, scalef, ident, lvl)

    # raw transfer bandwidth through the runtime
    for mb in (1, 8):
        arr = np.zeros(mb * 250_000, np.float32)
        t0 = time.perf_counter()
        d = jax.device_put(arr)
        jax.block_until_ready(d)
        t1 = time.perf_counter()
        _ = np.asarray(d)
        t2 = time.perf_counter()
        print(
            f"{'H2D %3d MB' % mb:40s} {1e3*(t1-t0):10.1f} ms   D2H {1e3*(t2-t1):10.1f} ms",
            flush=True,
        )

    # end-to-end extraction, second run = steady state
    from sift3d.pipeline.extract import extract_features
    from sift3d.utils.timing import StageTimer

    vol_small = jnp.asarray(rng.standard_normal((96, 96, 96)), jnp.float32)
    t0 = time.perf_counter()
    f = extract_features(vol_small, DEFAULT_CONFIG)
    print(f"{'extract 96^3 (cold)':40s} {1e3*(time.perf_counter()-t0):10.1f} ms  ({len(f)} feats)", flush=True)
    tm = StageTimer(enabled=True)
    t0 = time.perf_counter()
    f = extract_features(vol_small, DEFAULT_CONFIG, timer=tm)
    print(f"{'extract 96^3 (steady)':40s} {1e3*(time.perf_counter()-t0):10.1f} ms", flush=True)
    print(tm.summary(), flush=True)


if __name__ == "__main__":
    main()
