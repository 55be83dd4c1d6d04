"""Fast binary descriptors (-b/-br/-bn): throughput rung + backend parity.

BASELINE.json configs[1] names BRIEF / RRIEF / NRRIEF as a benchmark
configuration — the reference's whole reason for BRIEF is speed
(MultiScale.cpp:719-1069, blur-then-pair-difference at :1032-1045).
End-to-end parity vs the reference *binary* is impossible (the snapshot
hardcodes brief=0, featExtract.cpp:474), so this measures what can be
measured (VERDICT r4 missing #1):

  1. throughput: paired ABAB runs of GoH vs RRIEF on the bench's exact
     workload (182x218x182 blob volumes, batch 12 x 3 streams) — paired
     because the relay tunnel swings +-2x for identical code,
  2. backend parity: ours-CPU vs ours-TPU descriptor agreement for each
     of brief/rrief/nrrief on a 96^3 synthetic volume — features paired
     by geometry, rank-descriptor L2 compared (matched ~0 vs random
     ~120+, same criterion as the GoH parity cells).

Usage:
    python scripts/binary_desc_bench.py [--out DESCBENCH_r05.json]
        [--skip-speed] [--skip-parity] [--pairs 2] [--batch 12]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _extract_child(variant: str, dims: int, seed: int, out_path: str):
    """Extract features on the current backend, dump geometry+desc npz."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp

    from parity_vs_reference import synthetic_volume
    from sift3d.core.config import DEFAULT_CONFIG
    from sift3d.pipeline.extract import extract_features

    vol = synthetic_volume(dims, seed=seed)
    feats = extract_features(jnp.asarray(vol), DEFAULT_CONFIG, descriptor=variant)
    np.savez_compressed(
        out_path, xyz=feats.xyz, scale=feats.scale, ori=feats.ori,
        desc=feats.desc, backend=np.asarray(jax.default_backend()),
    )


def desc_parity(variants, dims: int, seed: int):
    """Run each variant on TPU (this process's backend) and CPU (child),
    pair features by geometry, compare rank descriptors."""
    tmp = tempfile.mkdtemp(prefix="sift3d_descpar_")
    me = os.path.abspath(__file__)
    cells = []
    for variant in variants:
        paths = {}
        for side in ("tpu", "cpu"):
            out = os.path.join(tmp, f"{variant}_{side}.npz")
            argv = [me, "--child", variant, "--child-dims", str(dims),
                    "--child-seed", str(seed), "--child-out", out]
            if side == "cpu":
                cmd = [sys.executable, "-c",
                       "import jax; jax.config.update('jax_platforms','cpu');"
                       "import runpy, sys; sys.argv=%r; runpy.run_path(%r, run_name='__main__')"
                       % (argv, me)]
            else:
                cmd = [sys.executable] + argv
            r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
            if r.returncode != 0:
                raise RuntimeError(f"{variant}/{side} failed: {r.stderr[-1500:]}")
            paths[side] = np.load(out)
        a, b = paths["tpu"], paths["cpu"]
        backend_a = str(a["backend"])
        if backend_a == "cpu":
            raise RuntimeError("'tpu' side ran on cpu — no TPU visible")

        # pair by full geometry: position, scale, orientation (reoriented
        # copies at one keypoint differ in ori, so ori disambiguates)
        d = np.linalg.norm(a["xyz"][:, None] - b["xyz"][None, :], axis=-1)
        sr = np.abs(np.log(a["scale"][:, None] / b["scale"][None, :]))
        od = np.abs(a["ori"][:, None] - b["ori"][None, :]).max(axis=(-2, -1))
        ok = (d < 0.5) & (sr < 1e-3) & (od < 1e-2)
        hit = ok.any(axis=1)
        nearest = np.where(ok, d, np.inf).argmin(axis=1)
        m = hit
        da = a["desc"][m].astype(np.float64)
        db = b["desc"][nearest[m]].astype(np.float64)
        l2 = np.linalg.norm(da - db, axis=1)
        rng = np.random.default_rng(0)
        l2_rand = np.linalg.norm(da - db[rng.permutation(len(db))], axis=1)
        cell = {
            "variant": variant,
            "dims": dims,
            "seed": seed,
            "tpu_feats": int(len(a["xyz"])),
            "cpu_feats": int(len(b["xyz"])),
            "matched_pairs": int(m.sum()),
            "matched_fraction": round(float(m.mean()), 4),
            "desc_l2_matched_mean": round(float(l2.mean()), 4),
            "desc_l2_random_mean": round(float(l2_rand.mean()), 2),
            "desc_exact_equal_fraction": round(float((l2 == 0).mean()), 4),
        }
        cells.append(cell)
        print(json.dumps(cell), flush=True)
    return cells


def speed_rung(pairs: int, batch: int, runs: int = 5):
    """Paired ABAB GoH-vs-RRIEF throughput at the bench workload."""
    from bench import synthetic_t1
    from sift3d.core.config import DEFAULT_CONFIG
    from sift3d.pipeline.extract import extract_features_many
    from sift3d.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    streams = max(1, min(4, batch // 4))
    vols = [synthetic_t1(seed=7 + i) for i in range(batch)]

    def measure(variant):
        extract_features_many(vols, DEFAULT_CONFIG, streams=streams,
                              descriptor=variant)  # warmup/compile
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            extract_features_many(vols, DEFAULT_CONFIG, streams=streams,
                                  descriptor=variant)
            times.append(time.perf_counter() - t0)
        return batch / float(np.median(times))

    series = []
    for i in range(pairs):
        goh = measure("goh")
        rrief = measure("rrief")
        series.append({"goh_vps": round(goh, 2), "rrief_vps": round(rrief, 2),
                       "rrief_over_goh": round(rrief / goh, 3)})
        print(json.dumps(series[-1]), flush=True)
    return {
        "batch": batch, "streams": streams, "pairs": series,
        "rrief_vps_best": max(s["rrief_vps"] for s in series),
        "rrief_vps_median": round(float(np.median(
            [s["rrief_vps"] for s in series])), 2),
        "goh_vps_median": round(float(np.median(
            [s["goh_vps"] for s in series])), 2),
        "paired_ratio_median": round(float(np.median(
            [s["rrief_over_goh"] for s in series])), 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="DESCBENCH_r05.json")
    ap.add_argument("--skip-speed", action="store_true")
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--dims", type=int, default=96)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--child", default=None)
    ap.add_argument("--child-dims", type=int, default=96)
    ap.add_argument("--child-seed", type=int, default=3)
    ap.add_argument("--child-out", default=None)
    args = ap.parse_args()

    if args.child:
        from sift3d.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        _extract_child(args.child, args.child_dims, args.child_seed, args.child_out)
        return 0

    report = {}
    if not args.skip_parity:
        report["parity"] = desc_parity(["brief", "rrief", "nrrief"],
                                       args.dims, args.seed)
    if not args.skip_speed:
        report["speed"] = speed_rung(args.pairs, args.batch)
    with open(args.out, "wt") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
