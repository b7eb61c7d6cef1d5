#!/usr/bin/env python
"""End-to-end example mirroring the reference driver (src/main.cc:30-76):
import the Eat graph, run grank and mccompletepathv2 with the canonical
parameters, time each, and print the five benchmark statistics for 200
strict-sampled sources.  (grankMulti's analogue, the mesh-sharded grank, is
exercised by tests/test_sharding.py and __graft_entry__.dryrun_multichip —
this sandbox exposes a single TPU chip.)

Usage: python examples/run_eat.py [path/to/edges.csv]
Runs on whatever jax backend the environment provides (TPU under axon).
"""

import os
import sys
import time

try:  # installed package (pip install -e .)
    import approximated_personalized_pagerank_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

from approximated_personalized_pagerank_tpu import (
    benchmark_algorithm,
    grank_baskets,
    load_csv_graph,
    mccompletepathv2_baskets,
)


def report(name, fn, graph):
    t0 = time.time()
    baskets = fn()
    # np.asarray, not block_until_ready: the latter does not synchronize
    # through the remote-TPU tunnel used in this sandbox.
    np.asarray(baskets.ids)
    dt = (time.time() - t0) * 1000
    print(f"{name} run-time = {dt:.0f} ms")
    stats = benchmark_algorithm(baskets, graph, 200, True, seed=0)
    print("-------")
    for k, v in stats.items():
        print(f"{k}     {v:.6g}")
    print("-------")
    return baskets


def main():
    if len(sys.argv) > 1:
        path = sys.argv[1]
    elif os.path.exists("/root/reference/example.txt"):
        path = "/root/reference/example.txt"
    else:
        from approximated_personalized_pagerank_tpu import sample_graph_path

        path = sample_graph_path()
        print(f"Eat graph not found; using bundled sample {path}")
    graph = load_csv_graph(path)
    print(f"nodes: {graph.num_nodes} edges: {graph.num_edges}")

    # warm-up compile on a first invocation so the timings below reflect
    # steady-state execution (the reference's C++ has no compile phase).
    # The warm-up must use the same tolerance mode as the timed run — the
    # convergence diff changes the compiled program.
    print("compiling...")
    np.asarray(grank_baskets(graph, 50, 100, 2, 0.85, 0.0001).ids)
    np.asarray(mccompletepathv2_baskets(graph, 50, 200, 1000, 0.85, seed=1).ids)

    report(
        "grank",
        lambda: grank_baskets(graph, 50, 100, 30, 0.85, 0.0001),
        graph,
    )
    report(
        "mccompletepathv2",
        lambda: mccompletepathv2_baskets(graph, 50, 200, 1000, 0.85, seed=0),
        graph,
    )


if __name__ == "__main__":
    main()
