"""True multi-process (multi-host analogue) exercise on local CPU.

SURVEY.md §4 test strategy: the reference only ever exercises its
multi-node path on real clusters (/root/reference/train.py:106-108); here
the whole multi-controller stack - jax.distributed.initialize, a global
mesh spanning two OS processes, a real data-parallel train step, scene
sharding, and the pickled-object metric merge - runs as two spawned local
CPU processes (see tests/multiprocess_worker.py for what is asserted).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.heavy  # ~3 min: two controllers each compile the train step
def test_two_process_train_step_and_merge(tmp_path):
    world = 2
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own (2 devices/process)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(r), str(world), str(port),
             str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for r in range(world)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"

    recs = []
    for r in range(world):
        path = tmp_path / f"ok_{r}.json"
        assert path.is_file(), f"rank {r} wrote no success record"
        recs.append(json.loads(path.read_text()))

    # both controllers agree bit-for-bit on the replicated loss, and it
    # matches each one's single-controller reference
    assert recs[0]["loss"] == recs[1]["loss"]
    for rec in recs:
        assert rec["n_global_devices"] == 4
        assert abs(rec["loss"] - rec["ref_loss"]) < 1e-4
    # scene shards are disjoint between the processes
    assert not (set(recs[0]["scenes"]) & set(recs[1]["scenes"]))
