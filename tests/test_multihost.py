"""Multi-process (multi-host role) DP: 2 CPU processes, one global mesh.

Covers the reference's multi-node DDP capability (main.py:23,511,521) as
jax.distributed + global-mesh DP (SURVEY §2.7): each process loads its
slice of the global batch, shard_batch assembles global arrays, and the
jitted step's gradient all-reduce rides the (simulated) interconnect.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # a fresh PYTHONPATH: the workers must import jax themselves (the
    # conftest's in-process jax config must not leak); the axon site dir
    # stays importable so the sitecustomize keeps working
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "mh_smoke.py"),
             str(i), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    r0 = json.load(open(tmp_path / "proc0.json"))
    r1 = json.load(open(tmp_path / "proc1.json"))
    assert r0["global_devices"] == r1["global_devices"] == 4

    # the two processes loaded DISJOINT halves of one global batch of 8
    assert len(r0["indices"]) == len(r1["indices"]) == 4
    assert not set(r0["indices"]) & set(r1["indices"])

    # loss/grad/updated params are GLOBAL quantities: both processes agree
    # (the all-reduce actually crossed the process boundary)
    assert np.isclose(r0["loss"], r1["loss"], rtol=1e-6)
    assert np.isclose(r0["grad_norm"], r1["grad_norm"], rtol=1e-6)
    np.testing.assert_allclose(r0["w_after"], r1["w_after"], rtol=1e-6)
    assert r0["grad_norm"] > 0
