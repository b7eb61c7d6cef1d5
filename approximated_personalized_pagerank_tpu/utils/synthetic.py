"""Synthetic graph generators for scale benchmarks.

The reference ships one real dataset (the Eat graph, /root/reference
example.txt; thesis p.17 lists five more).  For north-star-scale runs
(soc-LiveJournal class: 4.8M nodes / 69M edges) no real asset is available
offline, so this module generates a heavy-tailed directed graph with the
same shape statistics: power-law out- AND in-degree tails with hub degrees
in the tens of thousands, mean degree ~14, and a single giant component.
"""

from __future__ import annotations

import numpy as np

from ..graph import Graph

__all__ = ["powerlaw_graph"]


def powerlaw_graph(
    num_nodes: int,
    num_edges: int,
    seed: int = 7,
    alpha: float = 1.9,
    dedup: bool = False,
) -> Graph:
    """Directed graph with zipf-like out- and in-degree distributions.

    Endpoints are drawn by the inverse-power transform ``floor(n * u**alpha)``
    (density ~ x**(1/alpha - 1), i.e. a power-law rank distribution) and
    decorrelated through independent fixed permutations so hub sources and
    hub sinks are unrelated nodes.  ``alpha=1.9`` puts the maximum degree
    near ``num_edges * (1/n)**(1/alpha)`` — ~20k for the soc-LJ shape —
    matching the "max deg >> mean" regime the merge pipeline's degree
    bucketing exists for (SURVEY §7 hard part 1).

    ``dedup`` drops duplicate (src, dst) pairs like the reference's CSV
    importer (src/main.cc:101-107); off by default since GRank accumulates
    parallel edges (include/grank.h:79-80) and the duplicate rate at this
    sparsity is negligible.
    """
    if num_nodes <= 0:
        raise ValueError("num_nodes must be positive")
    rng = np.random.default_rng(seed)
    src = (num_nodes * rng.random(num_edges) ** alpha).astype(np.int64)
    dst = (num_nodes * rng.random(num_edges) ** alpha).astype(np.int64)
    np.minimum(src, num_nodes - 1, out=src)
    np.minimum(dst, num_nodes - 1, out=dst)
    perm_src = rng.permutation(num_nodes)
    perm_dst = rng.permutation(num_nodes)
    src = perm_src[src]
    dst = perm_dst[dst]
    if dedup:
        pairs = np.stack([src, dst], axis=1)
        view = np.ascontiguousarray(pairs).view(
            [("s", np.int64), ("d", np.int64)]
        ).reshape(-1)
        _, first = np.unique(view, return_index=True)
        first.sort()
        src, dst = src[first], dst[first]
    return Graph.from_edges(src, dst, num_nodes=num_nodes)
