"""Multi-host (DCN) layer: 2 processes x 4 simulated CPU devices.

The cluster substitute SURVEY.md section 4 prescribes: jax.distributed
over two local processes, collectives crossing the process boundary the
same way they cross DCN on a real pod (BASELINE.md N>=2-hosts target).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_cluster(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    outs = [str(tmp_path / f"proc{p}.json") for p in (0, 1)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets device count via jax.config
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(p), str(port), outs[p]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for p in (0, 1)
    ]
    logs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for k in procs:
                k.kill()
            raise
        logs.append(out)
    for p, pr in enumerate(procs):
        assert pr.returncode == 0, f"proc {p} failed:\n{logs[p][-4000:]}"

    r0 = json.load(open(outs[0]))
    r1 = json.load(open(outs[1]))
    # both hosts ended with identical global state
    assert r0["feat_counts"] == r1["feat_counts"]
    np.testing.assert_allclose(r0["votes"], r1["votes"], rtol=1e-12)
    assert r0["xyz0_sum"] == r1["xyz0_sum"]
