"""Study-scale group-matching benchmark (VERDICT r4 missing #2 / next #5).

featMatchMultiple exists for N-volume group studies — the reference built
a 32-core OpenMP loop for it (featMatchMultiple.cpp:9,108-117). This
measures our replacement at study scale (N=16 / N=32 images x ~1.5k
features):

  - end-to-end `match_all_to_all` wall-clock on the default backend
    (the real TPU when present): one batched kNN sweep + ONE batched
    `_vote_all` pass (round 5; was a per-image Python loop),
  - the vote logic alone: batched `_vote_all` vs the round-4-style
    per-image sweep (calling search_image per image on precomputed kNN),
  - sharded (`GroupMatcher(mesh=...)`, the --shard-match path) vs
    unsharded on a simulated 8-device CPU mesh — structure validation;
    this 4-core host cannot show real multi-chip speedup (PERFORMANCE.md
    SCALING caveat),
  - vote-matrix equality: batched vs the line-by-line loop oracle
    (`_search_image_loop`) on every image.

Usage:
    python scripts/match_bench.py [--n-img 16,32] [--feats 1500]
        [--out MATCHBENCH_r05.json] [--skip-sim]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_sets(n_img: int, n_feats: int, seed: int = 11):
    """N FeatureSets with planted cross-image descriptor structure.

    Images pair up (2i, 2i+1) sharing ~40% of descriptors (with noise) so
    soft votes concentrate on the partner image — the group-study signal
    the matcher exists to find. Descriptors mimic GoH rank vectors
    (permutations of 0..63).
    """
    from sift3d.core.featureset import INFO_FLAG_REORIENT, FeatureSet

    rng = np.random.default_rng(seed)
    sets = []
    for i in range(n_img):
        f = FeatureSet.empty(n_feats)
        f.xyz = rng.uniform(10, 170, (n_feats, 3)).astype(np.float32)
        f.scale = rng.uniform(2, 6, (n_feats,)).astype(np.float32)
        f.eigs = rng.uniform(0.5, 1.5, (n_feats, 3)).astype(np.float32)
        f.info[:] = INFO_FLAG_REORIENT
        f.desc = rng.permuted(
            np.tile(np.arange(64.0, dtype=np.float32), (n_feats, 1)), axis=1
        )
        sets.append(f)
    for i in range(0, n_img - 1, 2):
        share = int(0.4 * n_feats)
        noise = rng.normal(0, 0.5, (share, 64)).astype(np.float32)
        sets[i + 1].desc[:share] = sets[i].desc[:share] + noise
    return sets


def _fetch(x):
    """Force completion through the relay (block_until_ready is
    client-side there; see PERFORMANCE.md measurement traps)."""
    import jax

    jax.device_get(np.asarray(x).ravel()[:1] if hasattr(x, "ravel") else x)


def bench_backend(sets, n_runs: int = 3):
    """End-to-end + vote-logic timings on the current default backend."""
    import jax

    from sift3d.core.config import DEFAULT_CONFIG
    from sift3d.match.groupvote import GroupMatcher
    from sift3d.match.knn import knn_search_tiled

    gm = GroupMatcher(sets)
    k = min(DEFAULT_CONFIG.knn_neighbors, len(gm.feat_img))

    # warmup (compile) then timed end-to-end runs
    res = gm.match_all_to_all()
    e2e = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        res = gm.match_all_to_all()
        e2e.append(time.perf_counter() - t0)

    # kNN alone (the device part), then the two vote-logic formulations
    import jax.numpy as jnp

    t0 = time.perf_counter()
    dists, idx = knn_search_tiled(gm.db, jnp.asarray(gm.db), k)
    t_knn = time.perf_counter() - t0
    dists = np.asarray(dists)[:, :k].astype(np.float64)
    idx = np.asarray(idx)[:, :k]

    t0 = time.perf_counter()
    votes_b, counts_b, ll_b = gm._vote_all(dists, idx, gm.feat_img)
    t_vote_batched = time.perf_counter() - t0

    t0 = time.perf_counter()
    rows = []
    for i in range(gm.n_img):
        lo, hi = gm.img_start[i], gm.img_start[i + 1]
        rows.append(gm.search_image(i, dists[lo:hi], idx[lo:hi]))
    t_vote_per_image = time.perf_counter() - t0

    # equality: batched result vs per-image rows vs the loop oracle
    loop_max_err = 0.0
    for i in range(gm.n_img):
        want = gm._search_image_loop(i, dists[gm.img_start[i]:gm.img_start[i+1]],
                                     idx[gm.img_start[i]:gm.img_start[i+1]])
        np.testing.assert_array_equal(res.counts[i], want.counts[0])
        err = float(np.abs(res.votes[i] - want.votes[0]).max())
        loop_max_err = max(loop_max_err, err)
        np.testing.assert_allclose(res.votes[i], want.votes[0], rtol=1e-10)
        np.testing.assert_allclose(res.log_likelihood[i], want.log_likelihood[0],
                                   rtol=1e-8)
        np.testing.assert_allclose(rows[i].votes[0], want.votes[0], rtol=1e-10)

    return {
        "backend": jax.default_backend(),
        "n_img": len(sets),
        "n_feats_per_img": len(sets[0]),
        "db_rows": int(len(gm.feat_img)),
        "k": int(k),
        "e2e_s_median": round(float(np.median(e2e)), 4),
        "e2e_s_all": [round(t, 4) for t in e2e],
        "knn_s": round(t_knn, 4),
        "vote_batched_s": round(t_vote_batched, 4),
        "vote_per_image_s": round(t_vote_per_image, 4),
        "vote_speedup_batched_vs_per_image": round(
            t_vote_per_image / max(t_vote_batched, 1e-9), 2),
        "oracle_equal": True,
        "oracle_votes_max_abs_err": loop_max_err,
    }


def bench_sim_mesh(n_img: int, n_feats: int):
    """Child-process entry: 8 simulated CPU devices, sharded vs unsharded."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    from sift3d.dist.mesh import make_mesh
    from sift3d.match.groupvote import GroupMatcher

    sets = synthetic_sets(n_img, n_feats)
    mesh = make_mesh()
    gm_plain = GroupMatcher(sets)
    gm_mesh = GroupMatcher(sets, mesh=mesh)

    res_plain = gm_plain.match_all_to_all()  # warmup + reference result
    res_mesh = gm_mesh.match_all_to_all()
    t = {}
    for name, gm in (("unsharded", gm_plain), ("sharded", gm_mesh)):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            gm.match_all_to_all()
            runs.append(time.perf_counter() - t0)
        t[name] = float(np.median(runs))

    np.testing.assert_allclose(res_mesh.votes, res_plain.votes, rtol=1e-6, atol=1e-9)
    np.testing.assert_array_equal(res_mesh.counts, res_plain.counts)
    print(json.dumps({
        "sim_unsharded_s": round(t["unsharded"], 4),
        "sim_sharded_s": round(t["sharded"], 4),
        "sim_sharded_speedup": round(t["unsharded"] / max(t["sharded"], 1e-9), 2),
        "sim_votes_equal": True,
    }), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-img", default="16,32")
    ap.add_argument("--feats", type=int, default=1500)
    ap.add_argument("--out", default="MATCHBENCH_r05.json")
    ap.add_argument("--skip-sim", action="store_true")
    ap.add_argument("--sim-child", default=None, help="internal: n_img for sim run")
    args = ap.parse_args()

    if args.sim_child is not None:
        bench_sim_mesh(int(args.sim_child), args.feats)
        return 0

    report = {"feats_per_img": args.feats, "cells": []}
    for n_img in (int(v) for v in args.n_img.split(",")):
        print(f"=== N={n_img} x {args.feats} features", flush=True)
        cell = bench_backend(synthetic_sets(n_img, args.feats))
        print(json.dumps(cell, indent=1), flush=True)

        if not args.skip_sim:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--sim-child",
                 str(n_img), "--feats", str(args.feats)],
                capture_output=True, text=True, timeout=1800,
            )
            if r.returncode == 0:
                line = next((ln for ln in r.stdout.splitlines()
                             if ln.startswith("{")), None)
                if line:
                    cell.update(json.loads(line))
                    print(line, flush=True)
            else:
                cell["sim_error"] = r.stderr[-800:]
                print(f"sim-mesh child failed: {r.stderr[-400:]}", file=sys.stderr)
        report["cells"].append(cell)

    with open(args.out, "wt") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
