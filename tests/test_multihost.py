"""Multi-host execution: 2 processes x 4 virtual CPU devices running ONE
ring GRank program over a global 8-device mesh.

This is the single-machine test for the capability the reference's
pthread-only parallelism lacks entirely (header-only/grankMulti.h is
shared-memory; SURVEY §2 names ICI + DCN as the TPU-native comm plan): the
mesh spans processes, array staging goes through
``make_array_from_callback`` (parallel/mesh.py put_sharded), and every
cross-shard basket read rides a collective.  Each worker verifies its own
addressable shards against a serial in-process reference
(tests/multihost_worker.py).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_ring_matches_serial():
    # no pytest-timeout in the env: the real guard is communicate(timeout=540)
    port = _free_port()
    env = dict(os.environ)
    # workers set their own JAX_PLATFORMS/XLA_FLAGS before importing jax
    env.pop("XLA_FLAGS", None)
    # the sandbox's sitecustomize registers the TPU PJRT plugin at
    # interpreter start (initialising the backend before
    # jax.distributed.initialize can run); disabling its trigger env var
    # keeps the workers CPU-only
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"proc {i}: OK" in out
