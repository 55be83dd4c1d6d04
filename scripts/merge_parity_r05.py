"""Merge the round-5 parity artifacts into one PARITY_r05.json.

Inputs:
  PARITY_r05_standard.json   64/96/128 x 4 flag sets x 3 seeds, full
                             re-sweep on the final round-5 tree
                             (HIGHEST blur default) — scripts/parity_sweep.py
  PARITY_r05_dense.json          dense blob cell, TPU, blur HIGH (pre-flip probe)
  PARITY_r05_dense_highest.json  dense blob cell, TPU, blur HIGHEST (the default)
  PARITY_r05_dense_cpu.json      dense blob cell, CPU control
  PARITY_r05_w_fullsize.json     -w full-size cell (resampled 273x218x182)
  PARITY_r05_w64/96.json         the round-4 residual -w cells, re-run fixed
  world_surplus_probe_{64,96}.json  f64 probe attribution for -w

Output: PARITY_r05.json with combined cell lists, per-section summaries,
and the round-5 notes block.
"""

from __future__ import annotations

import json
import os
import sys


def load(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _agg(cells):
    def mean(key):
        vals = [c[key] for c in cells if c.get(key) is not None]
        return round(sum(vals) / len(vals), 4) if vals else None

    return {
        "cells_run": len(cells),
        "mean_feature_count_ratio": mean("feature_count_ratio"),
        "min_feature_count_ratio": (
            round(min(c["feature_count_ratio"] for c in cells), 4) if cells else None
        ),
        "mean_repeatability_ref_to_ours": mean("repeatability_ref_to_ours"),
        "min_repeatability_ref_to_ours": (
            round(min(c["repeatability_ref_to_ours"] for c in cells), 4)
            if cells else None
        ),
        "mean_repeatability_ours_to_ref": mean("repeatability_ours_to_ref"),
        "mean_copy_count_agreement": mean("copy_count_agreement"),
    }


def main() -> int:
    std = load("PARITY_r05_standard.json")
    assert std, "run scripts/parity_sweep.py --out PARITY_r05_standard.json first"
    dense = []
    for path, blur in (
        ("PARITY_r05_dense_highest.json", "highest (default)"),
        ("PARITY_r05_dense.json", "high (pre-flip probe)"),
        ("PARITY_r05_dense_cpu.json", "cpu control"),
    ):
        c = load(path)
        if c:
            c["blur_config"] = blur
            dense.append(c)
    w_cells = [c for c in (
        load("PARITY_r05_w_fullsize.json"),
        load("PARITY_r05_w64.json"),
        load("PARITY_r05_w96.json"),
    ) if c]
    probes = {
        "world_64": (load("world_surplus_probe_64.json") or {}).get("summary"),
        "world_96": (load("world_surplus_probe_96.json") or {}).get("summary"),
        "doubled": (load("doubled_surplus_probe.json") or {}).get("summary"),
    }

    out = {
        "summary": {
            "standard": _agg(std["cells"]),
            "dense_fullsize_default": _agg(
                [c for c in dense if c["blur_config"] == "highest (default)"]
            ),
            "w_cells": _agg(w_cells),
        },
        "dense_cells": dense,
        "w_cells": w_cells,
        "cells_standard": std["cells"],
        "degenerate": std.get("degenerate", []),
        "failures": std.get("failures", []),
        "f64_probe_summaries": probes,
        "notes": (
            "Round-5 parity matrix vs the reference Linux featExtract binary, "
            "measured on the FINAL round-5 tree with blur matmuls at "
            "Precision.HIGHEST by default (the round-5 flip: bf16x3 blur "
            "flips tie-margin extrema — f64-probe-attributed on -2+ doubled "
            "and -w resampled chains, world_surplus_probe_{64,96}.json — and "
            "costs ~6% keypoint repeatability in the dense regime, while "
            "HIGHEST measured free end-to-end in paired A/Bs). New this "
            "round: (1) the dense full-size cells — the bench's blob texture "
            "at 182x218x182 with 971 reference features, the high-density "
            "regime where capacity paths and compaction actually stress: "
            "HIGHEST 0.9956/0.9956 repeatability at ratio 1.004, CPU control "
            "1.0/1.0, and the pre-flip HIGH cell (0.938/0.943) kept as the "
            "attribution probe; (2) the -w column root-caused and fixed — "
            "64^3 seed-3 EXACT, 96^3 seed-3 1.0/1.0 at ratio 1.029, full-size "
            "-w (273x218x182 resampled) EXACT with descriptor L2 0.0."
        ),
    }
    with open("PARITY_r05.json", "wt") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["summary"], indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
