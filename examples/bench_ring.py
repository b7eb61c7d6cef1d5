#!/usr/bin/env python
"""Ring scaling measurement on a virtual CPU mesh.

Times ring GRank half-sweeps at D in {1, 2, 4, 8} shards on the same graph
(virtual CPU devices — absolute numbers are meaningless, RELATIVE scaling
and the comm-volume model are the point), and reports the measured
per-device peak memory from the compiled program's memory analysis.

Comm model (parallel/ring.py _sweep_local): each half-sweep rotates the old
basket shard D-1 times per round, so a device sends
``rounds * (D-1)/D * n_pad * L * 8`` bytes per half-sweep; total ring
traffic per half-sweep is D times that.

Usage: python examples/bench_ring.py [--nodes 200000] [--edges 2000000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# device count: max of --shards (parsed before jax initialises)
_n_dev = 8
for _i, _a in enumerate(sys.argv):
    if _a == "--shards" and _i + 1 < len(sys.argv):
        _n_dev = max(int(x) for x in sys.argv[_i + 1].split(","))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={_n_dev}"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache here: jax 0.9's XLA-CPU AOT deserializer
# segfaults on entries compiled with different host-CPU features (same
# class of crash tests/conftest.py documents).  Cold compiles only.

import numpy as np

from approximated_personalized_pagerank_tpu.parallel.ring import (
    build_ring_plan,
    ring_grank_baskets,
)
from approximated_personalized_pagerank_tpu.utils.synthetic import powerlaw_graph


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=200_000)
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--half-sweeps", type=int, default=4)
    ap.add_argument("--L", type=int, default=100)
    ap.add_argument("--K", type=int, default=50)
    ap.add_argument(
        "--shards", type=str, default="1,2,4,8",
        help="comma-separated shard counts (max sets the virtual device count)",
    )
    args = ap.parse_args()

    graph = powerlaw_graph(args.nodes, args.edges, seed=11)
    print(f"graph: {graph} max_deg={int(graph.out_degree.max())}", flush=True)
    results = []
    base = None
    for d in [int(x) for x in args.shards.split(",")]:
        # warm-up compiles the D-shard program (excluded from timing)
        ring_grank_baskets(
            graph, args.K, args.L, 1, 0.85, -1.0, n_shards=d
        ).ids.block_until_ready()
        t0 = time.time()
        out, info = ring_grank_baskets(
            graph, args.K, args.L, args.half_sweeps, 0.85, -1.0, n_shards=d,
            analyze_memory=True,
        )
        out.ids.block_until_ready()
        wall = time.time() - t0
        s = -(-graph.num_nodes // d)
        n_pad = s * d
        rounds = len(build_ring_plan(graph, 0, d, args.L).rounds)
        comm = rounds * (d - 1) * s * args.L * 8 * args.half_sweeps
        mem = info["memory_analysis"].peak_memory_in_bytes
        row = {
            "shards": d,
            "wall_s": round(wall, 2),
            "per_half_sweep_s": round(wall / info["iterations_ran"], 3),
            "iterations_ran": info["iterations_ran"],
            "rounds_per_sweep": rounds,
            "ring_bytes_total": comm,
            "per_device_peak_mb": round(mem / 1e6, 1),
            "speedup_vs_1": round(base / wall, 2) if base else 1.0,
        }
        if base is None:
            base = wall
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"ring_scaling": results}))


if __name__ == "__main__":
    main()
