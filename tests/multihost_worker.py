"""Worker process for the 2-process multi-host ring test.

Spawned (never collected) by test_multihost.py: two of these form a
jax.distributed cluster of 2 processes x 4 virtual CPU devices — the
single-machine stand-in for a multi-host TPU slice (the v5e-16 north star
is 4 hosts; SURVEY §2 names ICI within a slice and DCN across).  Each
process runs the SAME SPMD ring program over the 8-device global mesh and
verifies its own addressable output shards against a serial single-process
reference computed locally.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

from approximated_personalized_pagerank_tpu.parallel.mesh import (
    init_distributed,
    make_mesh,
)

init_distributed(f"127.0.0.1:{port}", num_procs, proc_id)
assert jax.process_count() == num_procs, jax.process_count()
assert jax.local_device_count() == 4
assert jax.device_count() == 4 * num_procs

# Establish the Gloo communicator NOW, while both processes are still within
# milliseconds of each other.  The context is otherwise created lazily at the
# first cross-process collective, which sits behind a per-process program
# compile whose duration differs between the processes (one may hit the
# persistent cache the other is still populating); Gloo's 30s connect
# timeout then fires on the faster one.
from jax.experimental import multihost_utils

multihost_utils.sync_global_devices("ppr-multihost-start")

import numpy as np

from approximated_personalized_pagerank_tpu import Graph, grank_baskets
from approximated_personalized_pagerank_tpu.parallel.ring import (
    ring_grank_baskets,
)

# deterministic graph: every process builds the same one (replicated graph
# prep, like grankMulti's shared maps)
rng = np.random.default_rng(3)
n, e = 512, 4096
graph = Graph.from_edges(
    rng.integers(0, n, size=e), rng.integers(0, n, size=e), num_nodes=n
)

K, L, iters, damping, tol = 10, 20, 12, 0.85, 1e-4
mesh = make_mesh()  # ALL global devices: a genuinely multi-host mesh
assert mesh.devices.size == 4 * num_procs

out, info = ring_grank_baskets(
    graph, K, L, iters, damping, tol, mesh=mesh, return_info=True
)

ref = grank_baskets(graph, K, L, iters, damping, tol, engine="sparse")
ref_ids = np.asarray(ref.ids)
ref_scores = np.asarray(ref.scores)


def row_map(ids, scores):
    return {int(i): float(s) for i, s in zip(ids, scores) if i >= 0}


checked = 0
for shard_i, shard_s in zip(
    out.ids.addressable_shards, out.scores.addressable_shards
):
    r0 = shard_i.index[0].start or 0
    ids_l = np.asarray(shard_i.data)
    scores_l = np.asarray(shard_s.data)
    for r in range(ids_l.shape[0]):
        g = r0 + r
        if g >= n:
            continue
        got = row_map(ids_l[r], scores_l[r])
        want = row_map(ref_ids[g], ref_scores[g])
        assert set(got) == set(want), (g, got, want)
        for k in got:
            assert abs(got[k] - want[k]) < 1e-4, (g, k, got[k], want[k])
        checked += 1

assert checked > 0
assert info["iterations_ran"] == iters
print(f"proc {proc_id}: OK ({checked} rows verified)", flush=True)
