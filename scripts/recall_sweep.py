"""Recall sweep: seeds x volume sizes per warp condition, with spread.

Round-3's single-seed RECALL artifact left an 8.6% one-direction recall
gap at strong warp that could not be distinguished from noise (~90
features, one seed). This driver runs scripts/recall_harness.py across
>= 3 seeds x >= 2 volume sizes per warp condition (VERDICT r3 #3), each
cell in a subprocess (isolation: one failed cell costs one cell), and
reports mean +- spread for all four (ours/ref)^2 matcher cells, plus the
cross-vs-control recall gap distribution per direction.

Usage:
    python scripts/recall_sweep.py [--out RECALL_r04.json]
        [--seeds 11,23,47] [--dims 96,128] [--budget-s 7200]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

HARNESS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "recall_harness.py")

# (label, angle_deg, scale, trans) — the round-3 conditions
CONDITIONS = [
    ("strong warp (10 deg, 1.10x, t=3)", 10.0, 1.1, 3.0),
    ("mild warp (5 deg, 1.05x, t=2)", 5.0, 1.05, 2.0),
]
CELLS = ("ours_vs_ours", "ref_vs_ref", "ref1_vs_ours2", "ours1_vs_ref2")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="RECALL_r04.json")
    ap.add_argument("--seeds", default="11,23,47")
    ap.add_argument("--dims", default="96,128")
    ap.add_argument("--budget-s", type=float, default=7200.0)
    ap.add_argument("--cell-timeout", type=float, default=1800.0)
    args = ap.parse_args()

    seeds = [int(s) for s in args.seeds.split(",")]
    dims = [int(d) for d in args.dims.split(",")]
    deadline = time.monotonic() + args.budget_s

    cells, failures = [], []
    for label, angle, scale, trans in CONDITIONS:
        for d in dims:
            for seed in seeds:
                tag = f"{label} dims={d} seed={seed}"
                remaining = deadline - time.monotonic()
                if remaining < 120:
                    failures.append({"cell": tag, "error": "sweep budget exhausted"})
                    continue
                with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
                    cell_json = tf.name
                cmd = [
                    sys.executable, HARNESS, "--dims", str(d), "--seed", str(seed),
                    "--angle", str(angle), "--scale", str(scale), "--trans", str(trans),
                    "--reference", "--json", cell_json,
                ]
                print(f"=== {tag}", flush=True)
                try:
                    r = subprocess.run(
                        cmd, capture_output=True, text=True,
                        timeout=min(args.cell_timeout, remaining - 30),
                    )
                except subprocess.TimeoutExpired:
                    failures.append({"cell": tag, "error": "timeout"})
                    continue
                if r.returncode != 0:
                    failures.append(
                        {"cell": tag, "error": f"rc={r.returncode}",
                         "stderr": r.stderr[-1500:]}
                    )
                    print(r.stderr[-1500:], file=sys.stderr)
                    continue
                with open(cell_json) as f:
                    res = json.load(f)
                os.unlink(cell_json)
                res["condition"] = label
                cells.append(res)
                sys.stdout.write(r.stdout[-1200:])
                sys.stdout.flush()

    # aggregate: mean +- std per (condition, matcher cell) over seeds x dims
    summary = {}
    for label, *_ in CONDITIONS:
        rows = [c for c in cells if c["condition"] == label]
        if not rows:
            continue
        agg = {"n_cells": len(rows)}
        for cell in CELLS:
            rec = np.array([r[cell]["recall"] for r in rows if cell in r])
            prec = np.array([r[cell]["precision"] for r in rows if cell in r])
            rep = np.array([r[cell]["repeatability"] for r in rows if cell in r])
            if rec.size == 0:
                continue
            agg[cell] = {
                "recall_mean": round(float(rec.mean()), 4),
                "recall_std": round(float(rec.std()), 4),
                "recall_values": [round(float(v), 4) for v in rec],
                "precision_mean": round(float(prec.mean()), 4),
                "precision_std": round(float(prec.std()), 4),
                "repeatability_mean": round(float(rep.mean()), 4),
            }
        # per-cell paired gap vs the ref-vs-ref control, both directions
        for direction in ("ref1_vs_ours2", "ours1_vs_ref2"):
            gaps = np.array(
                [
                    r[direction]["recall"] - r["ref_vs_ref"]["recall"]
                    for r in rows
                    if direction in r and "ref_vs_ref" in r
                ]
            )
            if gaps.size:
                agg[f"gap_{direction}"] = {
                    "mean": round(float(gaps.mean()), 4),
                    "std": round(float(gaps.std()), 4),
                    "values": [round(float(v), 4) for v in gaps],
                }
        summary[label] = agg

    out = {
        "seeds": seeds,
        "dims": dims,
        "conditions": [c[0] for c in CONDITIONS],
        "cells": cells,
        "summary": summary,
        "failures": failures,
        "method": (
            "Each cell: scripts/recall_harness.py --reference on a fresh "
            "seeded synthetic volume + its warped copy; four matcher cells "
            "per run (ours/ref crossed over v1/v2 keys; matcher = ratio "
            "test + Hough inliers, featMatchUtilities.cpp:1027-1260 "
            "semantics). gap_* entries are PAIRED per-cell differences "
            "cross-recall minus ref-vs-ref control on the identical "
            "volume pair (VERDICT r3 #3: gap within spread = noise; "
            "consistently negative beyond spread = real fidelity gap)."
        ),
    }
    with open(args.out, "wt") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}: {len(cells)} cells, {len(failures)} failures")
    for label, agg in summary.items():
        for direction in ("ref1_vs_ours2", "ours1_vs_ref2"):
            g = agg.get(f"gap_{direction}")
            if g:
                print(f"  {label} {direction}: gap {g['mean']:+.4f} +- {g['std']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
