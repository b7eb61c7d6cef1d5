#!/usr/bin/env python
"""Scalability demo: the sparse engine on a synthetic large graph.

The dense MXU engine covers graphs whose [N, N] score matrix fits HBM
(~24k nodes on one v5e chip); past that the degree-bucketed sparse engine
is the production path.  This driver builds a uniform random directed
graph (defaults: 1M nodes / 10M edges — twice soc-LiveJournal's density
scale per chip), runs GRank half-sweeps and the MC walk phase, and prints
the per-chip throughput counters tracked in BASELINE.md (basket-merge
slot-updates/s and walk-steps/s).

Usage: python examples/run_synthetic.py [nodes] [edges] [iterations]
"""

import os
import sys
import time

try:  # installed package (pip install -e .)
    import approximated_personalized_pagerank_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import numpy as np

from approximated_personalized_pagerank_tpu import Graph, grank_baskets
from approximated_personalized_pagerank_tpu.ops.walk import walk_baskets

K, L, DAMPING, TOL = 50, 100, 0.85, 1e-4


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    e = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    rng = np.random.default_rng(0)
    graph = Graph.from_edges(
        rng.integers(0, n, size=e), rng.integers(0, n, size=e), num_nodes=n
    )
    print(f"graph: {graph} (synthetic uniform)")

    print("compiling grank sweeps...")
    t0 = time.time()
    np.asarray(
        grank_baskets(graph, K, L, 1, DAMPING, TOL, engine="sparse").ids
    )
    print(f"  warm-up (1 half-sweep incl compile): {time.time() - t0:.1f}s")

    t0 = time.time()
    baskets, info = grank_baskets(
        graph, K, L, iters, DAMPING, TOL, engine="sparse", return_info=True
    )
    np.asarray(baskets.ids)
    dt = time.time() - t0
    # measured: each executed half-sweep covers the active partition's edges
    part = graph.partition
    deg = graph.out_degree.astype(np.int64)
    e_p = [int(deg[part == p].sum()) for p in (0, 1)]
    h = info["iterations_ran"]
    merges = ((h + 1) // 2 * e_p[0] + h // 2 * e_p[1]) * L
    print(
        f"grank sparse: {h} half-sweeps in {dt:.1f}s "
        f"-> {merges / dt / 1e6:.0f}M basket-merge slot-updates/s/chip (measured)"
    )

    print("walk phase (trace engine, R=200)...")
    r = 200
    t0 = time.time()
    wb, winfo = walk_baskets(
        graph, L, r, DAMPING, seed=1, engine="trace", return_info=True
    )
    np.asarray(wb.ids)
    dt = time.time() - t0
    print(
        f"walks: {n} sources x {r} walks in {dt:.1f}s "
        f"-> {winfo['walk_steps'] / dt / 1e6:.1f}M walk-steps/s/chip (measured)"
    )


if __name__ == "__main__":
    main()
