"""Command-line entry point.

The reference ships a hardcoded example binary (src/main.cc); this CLI is
its parameterized equivalent:

    python -m approximated_personalized_pagerank_tpu.cli \
        --graph edges.csv --algorithm grank --K 50 --L 100 \
        --iterations 30 --damping 0.85 --tolerance 1e-4 \
        --test-nodes 200 --save baskets.npz

Prints the run time and the benchmark statistics exactly like the example
driver (src/main.cc:39-44).
"""

from __future__ import annotations

import argparse
import time

from .config import RunConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="approximated_personalized_pagerank_tpu",
        description="TPU-native all-sources personalized PageRank",
    )
    p.add_argument(
        "--graph",
        default=None,
        help="CSV edge list (node1,node2); defaults to the bundled sample graph",
    )
    p.add_argument(
        "--algorithm",
        default="grank",
        choices=["grank", "grank_multi", "mccompletepathv2"],
    )
    p.add_argument("--K", type=int, default=50)
    p.add_argument("--L", type=int, default=100)
    p.add_argument("--iterations", type=int, default=30)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--tolerance", type=float, default=1e-4)
    p.add_argument("--n-shards", type=int, default=1)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--combine-passes", type=int, default=2)
    p.add_argument(
        "--engine", default="auto", choices=["auto", "dense", "sparse"],
        help="dense = MXU matmul engine (graphs that fit HBM); "
        "sparse = degree-bucketed engine (any size)",
    )
    p.add_argument(
        "--merge-algo", default=None, choices=["sort", "bitonic", "pallas"],
        help="sparse-engine merge pipeline (default: pallas on TPU)",
    )
    p.add_argument("--test-nodes", type=int, default=200)
    p.add_argument("--no-strict", action="store_true")
    p.add_argument("--no-eval", action="store_true")
    p.add_argument("--save", default=None, help="save baskets to .npz")
    p.add_argument(
        "--profile", default=None, metavar="DIR",
        help="write a jax.profiler trace of the run to DIR "
        "(view with TensorBoard or ui.perfetto.dev)",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = RunConfig(
        algorithm=args.algorithm,
        K=args.K,
        L=args.L,
        iterations=args.iterations,
        damping=args.damping,
        tolerance=args.tolerance,
        n_shards=args.n_shards,
        seed=args.seed,
        combine_passes=args.combine_passes,
        engine=args.engine,
        merge_algo=args.merge_algo,
        test_nodes=args.test_nodes,
        strict=not args.no_strict,
    )
    cfg.validate()

    from . import (
        benchmark_algorithm,
        grank_baskets,
        grank_multi_baskets,
        load_csv_graph,
        mccompletepathv2_baskets,
    )
    from .utils.checkpoint import save_baskets

    graph_path = args.graph
    if graph_path is None:
        from . import sample_graph_path

        graph_path = sample_graph_path()
        print(f"no --graph given; using bundled sample {graph_path}")
    graph = load_csv_graph(graph_path)
    print(f"nodes: {graph.num_nodes} edges: {graph.num_edges}")

    from .utils.profiling import trace
    from contextlib import ExitStack

    stack = ExitStack()
    stack.enter_context(trace(args.profile))
    t0 = time.time()
    if cfg.algorithm == "grank":
        baskets = grank_baskets(
            graph, cfg.K, cfg.L, cfg.iterations, cfg.damping, cfg.tolerance,
            engine=cfg.engine, merge_algo=cfg.merge_algo,
        )
    elif cfg.algorithm == "grank_multi":
        baskets = grank_multi_baskets(
            graph,
            cfg.K,
            cfg.L,
            cfg.iterations,
            cfg.damping,
            cfg.tolerance,
            cfg.n_shards,
        )
    elif cfg.n_shards > 1:
        from . import mccompletepathv2_multi_baskets

        baskets = mccompletepathv2_multi_baskets(
            graph,
            cfg.K,
            cfg.L,
            cfg.iterations,
            cfg.damping,
            cfg.n_shards,
            seed=cfg.seed,
            combine_passes=cfg.combine_passes,
        )
    else:
        baskets = mccompletepathv2_baskets(
            graph,
            cfg.K,
            cfg.L,
            cfg.iterations,
            cfg.damping,
            seed=cfg.seed,
            combine_passes=cfg.combine_passes,
            engine=cfg.engine,
            merge_algo=cfg.merge_algo,
        )
    import numpy as np

    np.asarray(baskets.ids)  # block_until_ready is a no-op through the
    # remote-TPU tunnel; a host transfer really synchronizes
    stack.close()  # flush the profiler trace, if any
    print(f"{cfg.algorithm} run-time = {(time.time() - t0) * 1000:.0f} ms")
    if args.profile:
        print(f"profiler trace written to {args.profile}")

    if not args.no_eval:
        stats = benchmark_algorithm(
            baskets, graph, cfg.test_nodes, cfg.strict, seed=cfg.seed
        )
        print("-------")
        for k, v in stats.items():
            print(f"{k}     {v:.6g}")
        print("-------")

    if args.save:
        save_baskets(args.save, baskets, graph)
        print(f"saved baskets to {args.save}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
