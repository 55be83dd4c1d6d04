"""Host-residual measurement on the REAL chip (VERDICT r3 #5).

The round-3 scaling claim — "placement-DP scales linearly on real chips
because the host residual overlaps device compute" — was inferred from
the 4-core CPU-simulation numbers, never measured on the TPU runtime.
This script measures it directly: batch-12 extraction on the real chip
with SIFT3D_SYNC_PHASES forcing every phase to completion, so the
StageTimer splits wall time into

  device phases   phase1 / candidate_tables / phase2a / phase2b / phase2c
  sync + D2H      candidate_counts / row_counts / download
  PURE HOST       host_layout_cand / host_layout_rows / assembly
                  (python layout loops, numpy decode + FeatureSet build)

The pure-host share of per-volume wall time is the number that bounds
placement-DP scaling: on a pod, device phases parallelize across chips
while the per-volume host work stays on one host process.

Usage (TPU):  SIFT3D_SYNC_PHASES=1 python scripts/host_residual.py
              [--batch 12] [--runs 3] [--json host_residual.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEVICE_STAGES = ("phase1", "candidate_tables", "phase2a", "phase2b", "phase2c")
SYNC_STAGES = ("candidate_counts", "row_counts", "download",
               "candidate_extract", "candidate_download", "cand_upload")
HOST_STAGES = ("host_layout_cand", "host_layout_rows", "assembly")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--streams", type=int, default=1,
                    help="software-pipeline streams (bench uses batch//4); "
                         "run WITHOUT SIFT3D_SYNC_PHASES to measure whether "
                         "streams mode actually overlaps the host work "
                         "(VERDICT r4 #6) — host stages are real host time "
                         "either way, wall is the streams-mode wall")
    ap.add_argument("--json", default="host_residual.json")
    args = ap.parse_args()

    if not os.environ.get("SIFT3D_SYNC_PHASES"):
        print("note: SIFT3D_SYNC_PHASES not set — device-phase times will "
              "read as dispatch latency, not device time", file=sys.stderr)

    import jax

    from bench import synthetic_t1
    from sift3d.core.config import DEFAULT_CONFIG
    from sift3d.pipeline.extract import extract_features_many
    from sift3d.utils.cache import enable_compilation_cache
    from sift3d.utils.timing import StageTimer

    enable_compilation_cache()
    vols = [synthetic_t1(seed=7 + i) for i in range(args.batch)]
    # warmup / compile
    extract_features_many(vols, DEFAULT_CONFIG, streams=args.streams)

    timer = StageTimer(enabled=True)
    walls = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        extract_features_many(vols, DEFAULT_CONFIG, timer=timer, streams=args.streams)
        walls.append(time.perf_counter() - t0)

    n_vol = args.batch * args.runs
    tot = {k: v * 1e3 for k, v in timer.totals.items()}  # ms over all runs
    host_ms = sum(tot.get(s, 0.0) for s in HOST_STAGES)
    device_ms = sum(tot.get(s, 0.0) for s in DEVICE_STAGES)
    sync_ms = sum(tot.get(s, 0.0) for s in SYNC_STAGES)
    wall_ms = sum(walls) * 1e3

    print(timer.summary())
    print(f"\nwall {wall_ms:.0f} ms for {n_vol} volume-extractions "
          f"({wall_ms / n_vol:.1f} ms/volume)")
    print(f"pure host  {host_ms:8.1f} ms  ({host_ms / wall_ms * 100:5.1f}% of wall, "
          f"{host_ms / n_vol:.2f} ms/volume)")
    print(f"device     {device_ms:8.1f} ms  ({device_ms / wall_ms * 100:5.1f}%)")
    print(f"sync+D2H   {sync_ms:8.1f} ms  ({sync_ms / wall_ms * 100:5.1f}%)")

    out = {
        "backend": jax.default_backend(),
        "batch": args.batch,
        "runs": args.runs,
        "streams": args.streams,
        "sync_phases": bool(os.environ.get("SIFT3D_SYNC_PHASES")),
        "wall_ms_per_volume": round(wall_ms / n_vol, 3),
        "host_ms_per_volume": round(host_ms / n_vol, 3),
        "device_ms_per_volume": round(device_ms / n_vol, 3),
        "sync_d2h_ms_per_volume": round(sync_ms / n_vol, 3),
        "host_share_of_wall": round(host_ms / wall_ms, 4),
        "stages_ms": {k: round(v, 2) for k, v in sorted(tot.items())},
    }
    with open(args.json, "wt") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
