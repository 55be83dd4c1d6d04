"""Benchmark: featExtract throughput on a synthetic 1mm T1-sized volume.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

metric  = end-to-end feature extraction (pyramid + refinement + orientation
          + GoH descriptors) on a 182x218x182 volume (MNI 1mm T1 grid).
value   = volumes/sec on one chip (median of 5 timed runs, post-warmup).
vs_baseline = speedup vs the reference's only in-tree wall-clock number:
          ~55 s for the CPU Gaussian pyramid on a comparable volume
          (src_common/GaussBlur3D.cpp:527 code comment) — i.e.
          value / (1/55). The reference publishes no GPU numbers in-tree
          (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def synthetic_t1(dims=(182, 218, 182), n_blobs=160, seed=7):
    """Brain-ish synthetic volume: smooth background + Gaussian structures.

    Built ON DEVICE (blob parameters are the only host data): the TPU
    tunnel in this environment moves ~1 MB/s, so a 29 MB host-side volume
    upload would dominate the benchmark. Real-volume ingestion cost is a
    property of the IO path, not of the extraction engine being measured.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    centers = (rng.uniform(0.2, 0.8, (n_blobs, 3)) * np.array(dims)).astype(np.float32)
    sigmas = rng.uniform(1.5, 6.0, n_blobs).astype(np.float32)
    amps = rng.uniform(-150, 250, n_blobs).astype(np.float32)

    @jax.jit
    def build(centers, sigmas, amps):
        z = jnp.arange(dims[0], dtype=jnp.float32)[:, None, None]
        y = jnp.arange(dims[1], dtype=jnp.float32)[None, :, None]
        x = jnp.arange(dims[2], dtype=jnp.float32)[None, None, :]
        c = jnp.asarray([d / 2.0 for d in dims], jnp.float32)
        r2 = (
            ((z - c[0]) / (0.45 * dims[0])) ** 2
            + ((y - c[1]) / (0.45 * dims[1])) ** 2
            + ((x - c[2]) / (0.45 * dims[2])) ** 2
        )
        vol = 400.0 * jnp.exp(-2.0 * r2)

        def add_blob(v, args):
            bc, s, a = args
            m2 = (z - bc[0]) ** 2 + (y - bc[1]) ** 2 + (x - bc[2]) ** 2
            return v + a * jnp.exp(-m2 / (2 * s * s)), None

        vol, _ = jax.lax.scan(add_blob, vol, (centers, sigmas, amps))
        return vol

    return build(jnp.asarray(centers), jnp.asarray(sigmas), jnp.asarray(amps))


def _is_oom(exc: BaseException) -> bool:
    s = str(exc)
    return "RESOURCE_EXHAUSTED" in s or "out of memory" in s.lower()


def _run_batch(batch: int):
    """Time extraction at one batch size. Returns (volumes/sec, feat counts)."""
    from sift3d.core.config import DEFAULT_CONFIG
    from sift3d.pipeline.extract import extract_features_many

    vols = [synthetic_t1(seed=7 + i) for i in range(batch)]
    # warmup (compilation)
    feats = extract_features_many(vols, DEFAULT_CONFIG)
    n_feats = [len(f) for f in feats]

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        extract_features_many(vols, DEFAULT_CONFIG)
        times.append(time.perf_counter() - t0)
    return batch / float(np.median(times)), n_feats


def _run_single(batch: int) -> None:
    """Child-process entry: time one batch size, print the JSON line."""
    from sift3d.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    vps, n_feats = _run_batch(batch)
    baseline_cpu_s = 55.0  # GaussBlur3D.cpp:527 (CPU pyramid)
    print(
        json.dumps(
            {
                "metric": "featExtract volumes/sec (182x218x182 T1-sized, "
                f"GoH descriptors, batch of {batch}, {n_feats} features)",
                "value": round(vps, 4),
                "unit": "volumes/sec/chip",
                "vs_baseline": round(vps * baseline_cpu_s, 2),
            }
        )
    )


def main() -> None:
    import os
    import subprocess
    import sys

    # a batch of distinct volumes processed with interleaved scheduling:
    # volumes/sec is the serving metric, and phase interleaving hides the
    # host-sync latency of any one volume. Batch 12 measured best; HBM
    # headroom varies run to run on the shared relay chip, so on failure
    # the batch steps down (12 -> 8 -> 4 -> 2 -> 1) instead of failing the
    # round — the bench must always report a number. Each attempt runs in
    # a SUBPROCESS: a RESOURCE_EXHAUSTED leaves this backend/tunnel
    # unusable for the rest of the process (smaller retries inherit the
    # OOM), so isolation is the only reliable step-down.
    single = os.environ.get("SIFT3D_BENCH_SINGLE")
    if single:
        _run_single(int(single))
        return
    start = int(os.environ.get("SIFT3D_BENCH_BATCH", "12"))
    ladder = sorted({b for b in (start, 8, 4, 2, 1) if b <= start}, reverse=True)
    errors = []
    for batch in ladder:
        for attempt in range(2):
            env = dict(os.environ, SIFT3D_BENCH_SINGLE=str(batch))
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=3000,
            )
            line = next(
                (ln for ln in proc.stdout.splitlines() if ln.startswith('{"metric"')),
                None,
            )
            if proc.returncode == 0 and line:
                print(line)
                return
            sys.stderr.write(proc.stderr[-4000:])
            errors.append(f"batch {batch} rc={proc.returncode}")
            if "RESOURCE_EXHAUSTED" in proc.stderr or "out of memory" in proc.stderr.lower():
                print(f"# batch {batch} exhausted HBM; stepping down", file=sys.stderr)
                break  # smaller batch, no point retrying this one
            # transient backend error: one retry, same batch
    raise SystemExit(f"bench failed at every batch size in {ladder}: {errors}")


if __name__ == "__main__":
    main()
