"""Parity sweep: dims x flags x seeds matrix vs the reference binary.

Runs scripts/parity_vs_reference.py once per cell (subprocess isolation:
an OOM or a reference-binary failure costs one cell, not the sweep) and
merges the per-cell JSON into one matrix artifact (PARITY_r03.json).

Usage:
    python scripts/parity_sweep.py [--out PARITY_r03.json]
        [--dims 64,96,128] [--seeds 3,11,19] [--budget-s 5400]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

HARNESS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "parity_vs_reference.py")

# flag sets: default, double-size, half-size, world-coords with anisotropic
# voxels (featExtract.cpp:368-388 and :118-204)
FLAG_SETS = [
    ("", "1,1,1"),
    ("-2+", "1,1,1"),
    ("-2-", "1,1,1"),
    ("-w", "1,1,1.5"),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_r03.json")
    ap.add_argument("--dims", default="64,96,128",
                    help="comma list; each entry an int (cube) or ZxYxX "
                         "triple (e.g. 182x218x182 — the full-bench-size "
                         "cells, VERDICT r3 #2)")
    ap.add_argument("--seeds", default="3,11,19")
    ap.add_argument("--flag-sets", default=None,
                    help="restrict flag sets, semicolon-separated (e.g. "
                         "';-w' for default + world); default: all four")
    ap.add_argument("--budget-s", type=float, default=5400.0)
    ap.add_argument("--cell-timeout", type=float, default=1200.0)
    args = ap.parse_args()

    dims = [d if "x" in d else int(d) for d in args.dims.split(",")]
    seeds = [int(s) for s in args.seeds.split(",")]
    flag_sets = FLAG_SETS
    if args.flag_sets is not None:
        wanted = args.flag_sets.split(";")
        flag_sets = [fs for fs in FLAG_SETS if fs[0] in wanted]
    deadline = time.monotonic() + args.budget_s

    cells, failures, degenerate = [], [], []
    for d in dims:
        for flags, voxel in flag_sets:
            for seed in seeds:
                label = f"dims={d} flags='{flags}' seed={seed}"
                remaining = deadline - time.monotonic()
                if remaining < 60:
                    failures.append({"cell": label, "error": "sweep budget exhausted"})
                    continue
                with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
                    cell_json = tf.name
                cmd = [
                    sys.executable, HARNESS, "--dims", str(d), "--seed", str(seed),
                    "--voxel", voxel, "--json", cell_json,
                ]
                if flags:
                    # equals form: argparse would otherwise parse "-2-"
                    # as an option
                    cmd += ["--flags=" + flags]
                print(f"=== {label}", flush=True)
                try:
                    r = subprocess.run(
                        cmd, capture_output=True, text=True,
                        timeout=min(args.cell_timeout, remaining),
                    )
                except subprocess.TimeoutExpired:
                    failures.append({"cell": label, "error": "timeout"})
                    continue
                if r.returncode != 0 or not os.path.getsize(cell_json):
                    failures.append({
                        "cell": label, "error": f"rc={r.returncode}",
                        "tail": (r.stdout + r.stderr)[-1500:],
                    })
                    continue
                with open(cell_json) as f:
                    cell = json.load(f)
                os.unlink(cell_json)
                if cell["ref_feats"] == 0:
                    # degenerate fixture (e.g. 64^3 with -2-: the halved
                    # volume has nothing detectable for EITHER side);
                    # record separately — 0-vs-0 is agreement, but it
                    # carries no ratio information
                    degenerate.append(cell)
                    print(f"    degenerate: ref 0 / ours {cell['our_feats']} feats", flush=True)
                    continue
                cells.append(cell)
                print(
                    f"    ratio {cell['feature_count_ratio']}, repeat "
                    f"{cell['repeatability_ref_to_ours']}/{cell['repeatability_ours_to_ref']}, "
                    f"copies {cell.get('copies_per_kp_ref')}/{cell.get('copies_per_kp_ours')}",
                    flush=True,
                )

    def agg(key):
        vals = [c[key] for c in cells if c.get(key) is not None]
        return round(sum(vals) / len(vals), 4) if vals else None

    summary = {
        "cells_run": len(cells),
        "cells_failed": len(failures),
        "cells_degenerate": len(degenerate),
        "mean_feature_count_ratio": agg("feature_count_ratio"),
        "min_feature_count_ratio": (
            round(min(c["feature_count_ratio"] for c in cells), 4) if cells else None
        ),
        "mean_repeatability_ref_to_ours": agg("repeatability_ref_to_ours"),
        "min_repeatability_ref_to_ours": (
            round(min(c["repeatability_ref_to_ours"] for c in cells), 4) if cells else None
        ),
        "mean_repeatability_ours_to_ref": agg("repeatability_ours_to_ref"),
        "mean_copy_count_agreement": agg("copy_count_agreement"),
    }
    out = {"summary": summary, "cells": cells, "degenerate": degenerate, "failures": failures}
    with open(args.out, "wt") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))
    return 0 if cells and not failures else (0 if cells else 1)


if __name__ == "__main__":
    sys.exit(main())
