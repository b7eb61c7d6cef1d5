"""Shared device-side graph structures and result conversion."""

from __future__ import annotations

from typing import Dict, Hashable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import Graph
from ..ops.basket import Baskets


class DeviceGraph(NamedTuple):
    """CSR adjacency resident on device (HBM on TPU).

    ``edge_src`` is the expanded row id per edge (CSR "COO row" view) used by
    scatter-push kernels like the exact PPR oracle.
    """

    indptr: jax.Array  # int32[N+1]
    indices: jax.Array  # int32[E]
    edge_src: jax.Array  # int32[E]
    out_degree: jax.Array  # int32[N]

    @property
    def num_nodes(self) -> int:
        return self.indptr.shape[0] - 1

    @property
    def num_edges(self) -> int:
        return self.indices.shape[0]


def device_graph(graph: Graph) -> DeviceGraph:
    """Upload (and cache) a host Graph's CSR onto the default device(s)."""
    cached = getattr(graph, "_device_graph", None)
    if cached is not None:
        return cached
    edge_src = np.repeat(
        np.arange(graph.num_nodes, dtype=np.int32), graph.out_degree
    )
    dg = DeviceGraph(
        indptr=jnp.asarray(graph.indptr, dtype=jnp.int32),
        indices=jnp.asarray(graph.indices, dtype=jnp.int32),
        edge_src=jnp.asarray(edge_src, dtype=jnp.int32),
        out_degree=jnp.asarray(graph.out_degree, dtype=jnp.int32),
    )
    graph._device_graph = dg
    return dg


def baskets_to_dict(
    baskets: Baskets, graph: Graph
) -> Dict[Hashable, Dict[Hashable, float]]:
    """Convert [N, K] basket arrays to the reference's map-of-maps shape
    (unordered_map<Key, unordered_map<Key, double>>, include/grank.h:40-48),
    with external keys."""
    ids = np.asarray(baskets.ids)
    scores = np.asarray(baskets.scores)
    keys = graph.keys
    out: Dict[Hashable, Dict[Hashable, float]] = {}
    for v in range(graph.num_nodes):
        live = ids[v] >= 0
        out[keys[v]] = {
            keys[i]: float(s) for i, s in zip(ids[v][live], scores[v][live])
        }
    return out
