"""TPU-native all-sources personalized PageRank framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
fruttasecca/approximated_personalized_pagerank: GRank, MCCompletePathV2, the
exact single-source PPR oracle, and the benchmark/recall harness — built on
CSR adjacency in HBM, fixed-width basket arrays, batched sort-merge kernels,
and pjit sharding over the node dimension.
"""

import os as _os

from .graph import Graph, load_csv_graph


def sample_graph_path() -> str:
    """Path of the bundled sample edge-list CSV (2,000 nodes, ~16k edges,
    deterministic heavy-tailed synthetic) — the out-of-the-box demo dataset,
    standing in for the reference's bundled ``example.txt``."""
    return _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "data", "sample_graph.csv"
    )


def eat_graph_path() -> str:
    """Path of the bundled Eat (Edinburgh Associative Thesaurus) dataset —
    the reference's canonical real benchmark graph (example.txt: 312,342 CSV
    lines, 23,132 nodes / 312,310 deduped edges; thesis p.17 dataset table)
    — shipped gzipped so the repo is benchmarkable standalone."""
    return _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "data", "eat.csv.gz"
    )


def load_eat_graph() -> Graph:
    """The bundled Eat graph as a :class:`Graph` (see eat_graph_path)."""
    return load_csv_graph(eat_graph_path())


from .models.benchmark import benchmark_algorithm
from .models.common import baskets_to_dict, device_graph
from .models.grank import grank, grank_baskets, grank_multi, grank_multi_baskets
from .models.mccompletepathv2 import (
    mccompletepathv2,
    mccompletepathv2_baskets,
    mccompletepathv2_multi,
    mccompletepathv2_multi_baskets,
)
from .models.ppr_single_source import ppr_single_source, ppr_single_source_batch
from .ops.basket import Baskets
from .utils.order import execution_order

__version__ = "0.2.0"

__all__ = [
    "Graph",
    "load_csv_graph",
    "sample_graph_path",
    "eat_graph_path",
    "load_eat_graph",
    "grank",
    "grank_baskets",
    "grank_multi",
    "grank_multi_baskets",
    "mccompletepathv2",
    "mccompletepathv2_baskets",
    "mccompletepathv2_multi",
    "mccompletepathv2_multi_baskets",
    "ppr_single_source",
    "ppr_single_source_batch",
    "benchmark_algorithm",
    "baskets_to_dict",
    "device_graph",
    "Baskets",
    "execution_order",
]
