"""Multi-host (DCN) support: DP over volumes across processes.

The reference is strictly single-machine — one GPU (featExtract.cpp:315-328)
plus OpenMP threads for matching (featMatchMultiple.cpp:9,108-117). The TPU
build scales past one host with the standard JAX multi-process model
(SURVEY.md section 2.2 north star):

- every host calls :func:`initialize` (jax.distributed), after which
  ``jax.devices()`` spans the whole pod and any Mesh built from it rides
  ICI within a host and DCN between hosts;
- volumes are data-parallel across hosts: each process extracts its
  round-robin share on its *local* chips (placement DP, dist/batch.py) —
  volumes are independent, so DCN carries zero bytes during extraction;
- keypoint sets are exchanged host-to-host once, after extraction
  (:func:`gather_featuresets`) — the only DCN traffic in the pipeline —
  after which group matching runs on the global mesh (dist/gather.py's
  all_gather-replicated kNN works unchanged on a process-spanning mesh).

Tested with 2 processes x 4 simulated CPU devices in
tests/test_multihost.py (the cluster substitute SURVEY.md section 4 calls
for); on real pods the same code initializes from the TPU metadata server
(no arguments needed).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

import jax

from sift3d.core.config import DEFAULT_CONFIG, SiftConfig
from sift3d.core.featureset import FeatureSet


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or form) the multi-host cluster.

    On TPU pods all arguments auto-detect from the metadata server; on
    CPU/GPU clusters pass them explicitly or via SIFT3D_COORDINATOR /
    SIFT3D_NUM_PROCESSES / SIFT3D_PROCESS_ID. Idempotent.
    """
    # idempotence guard that does NOT touch the XLA backend (jax.process_count
    # would initialize it, which must happen after distributed init)
    if getattr(jax.distributed, "is_initialized", None) is not None:
        if jax.distributed.is_initialized():
            return
    elif jax._src.distributed.global_state.client is not None:  # jax<0.7 fallback
        return
    coordinator_address = coordinator_address or os.environ.get("SIFT3D_COORDINATOR")
    if num_processes is None and "SIFT3D_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["SIFT3D_NUM_PROCESSES"])
    if process_id is None and "SIFT3D_PROCESS_ID" in os.environ:
        process_id = int(os.environ["SIFT3D_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def global_mesh(batch: Optional[int] = None, space: int = 1):
    """Mesh over ALL devices in the cluster (ICI within, DCN between hosts)."""
    from sift3d.dist.mesh import make_mesh

    return make_mesh(batch=batch, space=space, devices=jax.devices())


def my_volume_ids(n_volumes: int) -> List[int]:
    """Round-robin ownership of a shared volume list for this process."""
    return list(range(jax.process_index(), n_volumes, jax.process_count()))


def extract_features_multihost(
    vols: Sequence,
    cfg: SiftConfig = DEFAULT_CONFIG,
    **kw,
) -> List[Optional[FeatureSet]]:
    """DP-over-hosts extraction: each process runs placement DP
    (dist/batch.extract_features_batch) over its share of `vols` on its
    LOCAL devices. Returns a full-length list with this process's results
    filled in and None elsewhere; follow with :func:`gather_featuresets`
    to replicate everything everywhere.

    `vols` must be the same list on every process (shared filesystem — the
    same premise as featMatchMultiple's key-file list input).
    """
    from sift3d.dist.batch import extract_features_batch
    from sift3d.dist.mesh import make_mesh

    ids = my_volume_ids(len(vols))
    out: List[Optional[FeatureSet]] = [None] * len(vols)
    if not ids:
        return out
    local = make_mesh(batch=len(jax.local_devices()), space=1,
                      devices=jax.local_devices())
    feats = extract_features_batch([vols[i] for i in ids], local, cfg, **kw)
    for i, f in zip(ids, feats):
        out[i] = f
    return out


def gather_featuresets(
    partial_sets: Sequence[Optional[FeatureSet]],
) -> List[FeatureSet]:
    """Replicate per-process FeatureSets to every process (the one DCN
    exchange of the pipeline).

    Each volume's owner serializes its FeatureSet to the flat [N, 84]
    float32 table (xyz 3 + scale 1 + ori 9 + eigs 3 + info 1 + pcs 64 +
    pad 3 = 84); non-owners contribute a zero row-count. process_allgather
    moves the tables over DCN; everyone deserializes.
    """
    from jax.experimental import multihost_utils

    out: List[FeatureSet] = []
    for i, fs in enumerate(partial_sets):
        table = _pack(fs) if fs is not None else np.zeros((0, 84), np.float32)
        # fixed-rank exchange: first agree on (row count, ownership flag),
        # then pad. The owner is the process whose entry is non-None —
        # exactly one per volume under the extract_features_multihost
        # protocol; anything else is a caller bug, detected here rather
        # than silently resolved by row count (which would discard the
        # smaller of two conflicting sets).
        n = np.asarray([table.shape[0], int(fs is not None)], np.int32)
        counts = multihost_utils.process_allgather(n)  # [P, 2]
        owners = np.nonzero(counts[:, 1])[0]
        if owners.size != 1:
            raise ValueError(
                f"volume {i}: expected exactly one owning process, got "
                f"{owners.size} (ownership flags {counts[:, 1].tolist()})"
            )
        owner = int(owners[0])
        n_max = int(counts[:, 0].max())
        padded = np.zeros((n_max, 84), np.float32)
        padded[: table.shape[0]] = table
        gathered = multihost_utils.process_allgather(padded)  # [P, n_max, 84]
        out.append(_unpack(np.asarray(gathered[owner][: counts[owner, 0]])))
    return out


def _pack(fs: FeatureSet) -> np.ndarray:
    t = np.zeros((len(fs), 84), np.float32)
    t[:, 0:3] = fs.xyz
    t[:, 3] = fs.scale
    t[:, 4:13] = fs.ori.reshape(len(fs), 9)
    t[:, 13:16] = fs.eigs
    t[:, 16] = fs.info.astype(np.float32)
    t[:, 17:81] = fs.desc
    return t


def _unpack(t: np.ndarray) -> FeatureSet:
    fs = FeatureSet.empty(t.shape[0])
    fs.xyz = t[:, 0:3].copy()
    fs.scale = t[:, 3].copy()
    fs.ori = t[:, 4:13].reshape(-1, 3, 3).copy()
    fs.eigs = t[:, 13:16].copy()
    fs.info = t[:, 16].astype(fs.info.dtype)
    fs.desc = t[:, 17:81].copy()
    return fs
