"""Paired on-chip measurement of the bf16 gstack lever (SIFT3D_BF16_GSTACK).

Alternates subprocesses ABAB (A = f32 gstack, B = bf16) so relay drift
cannot masquerade as a result, then takes one forced-sync stage log per
arm for device-phase attribution. One JSON artifact out.

Usage (TPU, tunnel free):  python scripts/bf16_gstack_ab.py
                           [--pairs 2] [--runs 5] [--json BF16AB_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_ab(runs: int, env_extra: dict) -> float:
    """One ab_bench 12/3 probe in a subprocess; returns vol/s (or -1)."""
    env = dict(os.environ, **env_extra)
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts/ab_bench.py"),
         "--runs", str(runs), "12/3"],
        capture_output=True, text=True, timeout=600, env=env, cwd=ROOT,
    )
    m = re.findall(r"([0-9.]+) vol/s", p.stdout)
    return float(m[-1]) if m else -1.0


def run_sync(env_extra: dict) -> dict | None:
    """Forced-sync stage log in a subprocess; returns the stage dict."""
    tag = "bf16" if env_extra.get("SIFT3D_BF16_GSTACK") else "f32"
    out = os.path.join(ROOT, f"_bf16ab_sync_{tag}.json")
    env = dict(os.environ, SIFT3D_SYNC_PHASES="1", **env_extra)
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts/host_residual.py"),
         "--batch", "12", "--runs", "3", "--json", out],
        capture_output=True, text=True, timeout=600, env=env, cwd=ROOT,
    )
    if p.returncode != 0 or not os.path.exists(out):
        sys.stderr.write(p.stderr[-2000:])
        return None
    with open(out) as f:
        return json.load(f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--json", default="BF16AB_r05.json")
    args = ap.parse_args()

    A = {}  # f32 (control)
    B = {"SIFT3D_BF16_GSTACK": "1"}
    seq = []
    for i in range(args.pairs):
        for arm, env in (("A", A), ("B", B)) if i % 2 == 0 else (("B", B), ("A", A)):
            vps = run_ab(args.runs, env)
            seq.append({"arm": arm, "vol_per_s": vps})
            print(f"{arm}: {vps:.2f} vol/s", flush=True)

    sync_a = run_sync(A)
    sync_b = run_sync(B)

    def stages(s):
        if not s:
            return None
        return {
            "device_ms_per_volume": s["device_ms_per_volume"],
            "stages_ms": s["stages_ms"],
        }

    a_vals = [s["vol_per_s"] for s in seq if s["arm"] == "A" and s["vol_per_s"] > 0]
    b_vals = [s["vol_per_s"] for s in seq if s["arm"] == "B" and s["vol_per_s"] > 0]
    out = {
        "sequence": seq,
        "a_f32_mean": round(sum(a_vals) / len(a_vals), 2) if a_vals else None,
        "b_bf16_mean": round(sum(b_vals) / len(b_vals), 2) if b_vals else None,
        "sync_f32": stages(sync_a),
        "sync_bf16": stages(sync_b),
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("a_f32_mean", "b_bf16_mean")}))
    print("wrote", args.json)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
