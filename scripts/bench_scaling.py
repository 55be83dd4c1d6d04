"""Volume-batch data-parallel scaling measurement.

Two sections:
  1. dense pyramid octave step, GSPMD-sharded over the batch axis;
  2. FULL extraction pipeline end-to-end via placement DP
     (sift3d.dist.batch.extract_features_batch), volumes/sec at N devices.

On real pod slices this is the volumes/sec scaling headline; on the
simulated CPU mesh (default here) the numbers validate the sharding and
placement structure rather than absolute speed. Emits a JSON summary line
so PERFORMANCE.md's SCALING section can cite an artifact.

Usage:
    python scripts/bench_scaling.py [--dims 64] [--steps 3] [--tpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, default=64)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--tpu", action="store_true", help="use the default platform instead of the simulated CPU mesh")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sift3d.core.config import SiftConfig
    from sift3d.dist import batch as dbatch
    from sift3d.dist import mesh as dmesh

    cfg = SiftConfig()
    n_dev = len(jax.devices())
    d = args.dims
    rng = np.random.default_rng(0)
    results = {}
    for n in [1, 2, 4, n_dev]:
        if n > n_dev:
            continue
        mesh = dmesh.make_mesh(batch=n, space=1, devices=jax.devices()[:n])
        vols = jnp.asarray(rng.standard_normal((n, d, d, d)), jnp.float32)
        vb = jax.device_put(vols, NamedSharding(mesh, P("batch", None, None, None)))
        bases = dbatch.initial_blur_batch(vb, cfg)
        res = dbatch.octave_step_batch(bases, cfg)  # compile
        jax.block_until_ready(res.dogs)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            res = dbatch.octave_step_batch(bases, cfg)
            jax.block_until_ready(res.dogs)
        dt = (time.perf_counter() - t0) / args.steps
        vps = n / dt
        results[n] = vps
        eff = vps / (results[1] * n) if 1 in results and n > 1 else 1.0
        print(f"devices={n:2d}  batch-octave volumes/sec={vps:8.2f}  scaling-efficiency={eff:6.2f}")

    # ---- full pipeline end-to-end (placement DP) ----
    import json

    import scipy.ndimage as ndi

    print("\nfull extraction pipeline (extract_features_batch):")
    evols = [
        ndi.gaussian_filter(rng.standard_normal((d, d, d)), 1.8).astype(np.float32) * 120
        for _ in range(n_dev)
    ]
    e2e = {}
    cpu_per_vol = {}
    for n in [1, 2, 4, n_dev]:
        if n > n_dev or n in e2e:
            continue
        mesh = dmesh.make_mesh(batch=n, space=1, devices=jax.devices()[:n])
        vols_n = evols[:n]
        dbatch.extract_features_batch(vols_n, mesh, cfg)  # compile
        t0 = time.perf_counter()
        c0 = time.process_time()
        for _ in range(args.steps):
            feats = dbatch.extract_features_batch(vols_n, mesh, cfg)
        dt = (time.perf_counter() - t0) / args.steps
        cdt = (time.process_time() - c0) / args.steps
        e2e[n] = n / dt
        # on the SIMULATED mesh, "device" compute burns these same host
        # cores: process-CPU per volume staying flat while wall efficiency
        # drops means the loss is core oversubscription (a sim artifact,
        # absent on real chips), not a serial host-side bottleneck
        cpu_per_vol[n] = cdt / n
        eff = e2e[n] / (e2e[1] * n) if 1 in e2e and n > 1 else 1.0
        print(
            f"devices={n:2d}  e2e volumes/sec={e2e[n]:8.2f}  "
            f"scaling-efficiency={eff:6.2f}  cpu-seconds/volume={cpu_per_vol[n]:6.2f}  "
            f"cpu-utilization={cdt / dt:5.2f}x  feats={[len(f) for f in feats]}"
        )
    print(
        json.dumps(
            {
                "octave_step_vps": {str(k): round(v, 3) for k, v in results.items()},
                "e2e_vps": {str(k): round(v, 3) for k, v in e2e.items()},
                "e2e_cpu_s_per_volume": {str(k): round(v, 3) for k, v in cpu_per_vol.items()},
                "dims": d,
                "devices": n_dev,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
