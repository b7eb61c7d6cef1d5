#!/usr/bin/env python
"""Multi-chip demo on a virtual device mesh: ring-sharded GRank + sharded
MCCompletePathV2, with the per-device memory analysis that proves the ring
keeps each device's peak at O(N/D * L) instead of the full basket.

This runs anywhere: it forces the CPU backend with 8 virtual devices (the
same harness the test suite and the multi-chip dryrun use — SURVEY.md §4's
answer to testing pod-scale sharding without a pod).  On a real multi-chip
TPU slice, drop the platform override and the same code runs over ICI.

Usage: python examples/run_sharded.py [n_devices] [nodes] [edges]
"""

import os
import sys

n_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 8

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_dev}"
    ).strip()

import jax

# On a real multi-chip slice set PPR_SHARDED_REAL=1 to use the TPU devices;
# by default this demo runs on the virtual CPU mesh (checking jax.devices()
# first would initialize the backend before the override could apply).
if not os.environ.get("PPR_SHARDED_REAL"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import time

import numpy as np

try:  # installed package (pip install -e .)
    import approximated_personalized_pagerank_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from approximated_personalized_pagerank_tpu import Graph
from approximated_personalized_pagerank_tpu.parallel.mesh import make_mesh
from approximated_personalized_pagerank_tpu.parallel.ring import (
    ring_grank_baskets,
)
from approximated_personalized_pagerank_tpu.models.mccompletepathv2 import (
    mccompletepathv2_baskets,
)

K, L, ITERS, DAMPING, TOL = 50, 100, 10, 0.85, 1e-4


def main():
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    e = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    rng = np.random.default_rng(0)
    graph = Graph.from_edges(
        rng.integers(0, n, size=e), rng.integers(0, n, size=e), num_nodes=n
    )
    mesh = make_mesh(n_dev)
    print(f"graph: {graph}; mesh: {n_dev} devices "
          f"({jax.devices()[0].platform})")

    t0 = time.time()
    baskets, info = ring_grank_baskets(
        graph, K, L, ITERS, DAMPING, TOL, mesh=mesh, analyze_memory=True
    )
    ids = np.asarray(baskets.ids)
    dt = time.time() - t0
    mem = info["memory_analysis"]
    full_basket = n * L * 8
    print(f"ring grank: {info['iterations_ran']} half-sweeps in {dt:.1f}s "
          f"(incl compile); {int((ids[:, 0] >= 0).sum())}/{n} non-empty baskets")
    print(f"per-device peak memory: {mem.peak_memory_in_bytes / 1e6:.1f} MB "
          f"vs full basket {full_basket / 1e6:.1f} MB "
          f"({mem.peak_memory_in_bytes / full_basket:.0%})")

    t0 = time.time()
    mc, mc_info = mccompletepathv2_baskets(
        graph, K, L, 200, DAMPING, seed=0, mesh=mesh, return_info=True
    )
    np.asarray(mc.ids)
    print(f"sharded mccompletepathv2: {time.time() - t0:.1f}s "
          f"({mc_info['walk_steps']} walk hops, source-sharded walks + "
          f"exact ring combine)")


if __name__ == "__main__":
    main()
