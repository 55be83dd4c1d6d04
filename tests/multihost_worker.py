"""2-process multi-host worker (spawned by test_multihost.py).

Each process: 4 simulated CPU devices; the pair forms an 8-device
cluster. Exercises the full multi-host path: DP-over-hosts extraction,
the one DCN keypoint exchange, mesh-sharded group matching on the
process-spanning mesh, and the psum transform solve.
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

import numpy as np  # noqa: E402


def main() -> int:
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    from sift3d.dist import multihost

    multihost.initialize(f"127.0.0.1:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    from sift3d.core.config import SiftConfig
    from sift3d.dist.solve import solve_similarity_sharded
    from sift3d.match.groupvote import GroupMatcher

    cfg = SiftConfig(feature_chunk=128)

    def blobs(seed, d=32):  # SAME volumes on both processes
        z, y, x = np.mgrid[0:d, 0:d, 0:d].astype(np.float32)
        r = np.random.default_rng(seed)
        vol = np.zeros((d, d, d), np.float32)
        for _ in range(8):
            bc = r.uniform(6, d - 6, 3)
            s = r.uniform(1.8, 3.5)
            a = r.uniform(60, 250)
            vol += a * np.exp(
                -(((z - bc[0]) ** 2 + (y - bc[1]) ** 2 + (x - bc[2]) ** 2) / (2 * s * s))
            )
        return vol

    vols = [blobs(s) for s in (1, 2, 3, 4)]  # counts [2, 8, 19, 8]
    rng = np.random.default_rng(42)

    # 1. each process extracts its round-robin share on its local devices
    mine = multihost.my_volume_ids(4)
    assert mine == [pid, pid + 2], mine
    partial = multihost.extract_features_multihost(vols, cfg)
    for i in range(4):
        assert (partial[i] is not None) == (i in mine)

    # 2. one DCN exchange replicates every keypoint set everywhere
    sets = multihost.gather_featuresets(partial)
    assert all(len(s) > 0 for s in sets), [len(s) for s in sets]

    # 3. group matching on the process-spanning mesh == unsharded result
    mesh = multihost.global_mesh()
    want = GroupMatcher(sets).match_all_to_all()
    got = GroupMatcher(sets, mesh=mesh).match_all_to_all()
    np.testing.assert_allclose(got.votes, want.votes, rtol=1e-6, atol=1e-9)
    np.testing.assert_array_equal(got.counts, want.counts)

    # 4. psum'd normal-equation solve over the global mesh
    p = rng.uniform(-10, 10, (80, 3)).astype(np.float32)
    q = (2.0 * p + np.array([1.0, 2.0, 3.0])).astype(np.float32)
    w = np.ones(80, np.float32)
    s, r, t = solve_similarity_sharded(p, q, w, mesh)
    np.testing.assert_allclose(s, 2.0, rtol=1e-4)
    np.testing.assert_allclose(r, np.eye(3), atol=1e-4)
    np.testing.assert_allclose(t, [1, 2, 3], atol=1e-3)

    with open(out_path, "w") as f:
        json.dump(
            {
                "process": pid,
                "feat_counts": [len(s) for s in sets],
                "votes": got.votes.tolist(),
                "xyz0_sum": float(sets[0].xyz.sum()),
            },
            f,
        )
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
