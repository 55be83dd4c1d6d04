"""Per-stage wall-clock breakdown of extract_features_many at bench size.

Run on the TPU (no platform override). Prints the StageTimer summary of
the best of N timed runs plus the derived vol/s. Remember: every
dispatch and sync carries a ~30-35 ms tunnel RTT floor on this runtime;
"phaseX" rows are async dispatch costs, the *_counts/download rows are
where device execution is actually awaited.

Usage:
    python scripts/bench_stages.py [batch] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

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
    from sift3d.utils.timing import StageTimer

    vols = [bench.synthetic_t1(seed=7 + i) for i in range(batch)]
    extract_features_many(vols, DEFAULT_CONFIG,
                          reoriented=_os.environ.get("SIFT3D_BENCH_REORIENTED", "1") != "0")  # warmup/compile

    best = None
    for _ in range(repeats):
        timer = StageTimer(enabled=True)
        t0 = time.perf_counter()
        extract_features_many(vols, DEFAULT_CONFIG, timer=timer,
                               reoriented=_os.environ.get("SIFT3D_BENCH_REORIENTED", "1") != "0")
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, timer)
    dt, timer = best
    print(f"total {dt * 1e3:.0f} ms -> {batch / dt:.2f} vol/s (best of {repeats})")
    print(timer.summary())


if __name__ == "__main__":
    main()
