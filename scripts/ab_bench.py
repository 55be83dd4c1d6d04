"""Batch/streams A/B throughput probe on the live backend.

The relay TPU's day-to-day throughput swings +-15%, so configuration
comparisons are only meaningful back-to-back in one session. This probe
times extract_features_many for each (batch, streams) pair given on the
command line and prints one line per config plus the winner.

Usage:
    python scripts/ab_bench.py 12/1 12/3 16/4      # batch/streams pairs
    python scripts/ab_bench.py --runs 9 12/3 16/4
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="+", help="batch/streams pairs, e.g. 12/3")
    ap.add_argument("--runs", type=int, default=7)
    args = ap.parse_args()

    from sift3d.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import bench

    from sift3d.core.config import DEFAULT_CONFIG
    import dataclasses, os as _os
    if _os.environ.get("SIFT3D_UNION_CHUNK"):
        # A/B hook: larger union chunks = fewer per-chunk fixed costs,
        # bigger boxed-gather transients (OOM risk past ~8192 at b16)
        DEFAULT_CONFIG = dataclasses.replace(
            DEFAULT_CONFIG, union_chunk=int(_os.environ["SIFT3D_UNION_CHUNK"])
        )
    from sift3d.pipeline.extract import extract_features_many

    results = {}
    max_batch = max(int(c.split("/")[0]) for c in args.configs)
    vols_all = [bench.synthetic_t1(seed=7 + i) for i in range(max_batch)]
    for conf in args.configs:
        batch, streams = (int(x) for x in conf.split("/"))
        vols = vols_all[:batch]
        extract_features_many(vols, DEFAULT_CONFIG, streams=streams)  # warmup
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            extract_features_many(vols, DEFAULT_CONFIG, streams=streams)
            times.append(time.perf_counter() - t0)
        vps = batch / float(np.median(times))
        results[conf] = vps
        print(f"batch={batch:3d} streams={streams}: {vps:6.2f} vol/s "
              f"(median of {args.runs})", flush=True)
    best = max(results, key=results.get)
    print(f"winner: {best} at {results[best]:.2f} vol/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
