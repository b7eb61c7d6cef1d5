"""Exact personalized PageRank by power iteration — the ground-truth oracle.

Reference: ``pprInternal::pprSingleSource`` (include/internal/pprSingleSource.h:28-75).
Semantics preserved exactly:

* dense power iteration pushing ``score * damping/outdeg`` along edges
  (sparse maps there == dense vectors here: absent key = 0);
* the teleport mass ``1 - damping`` is re-injected at the source each sweep;
* **dangling nodes lose their mass** (no redistribution) — the approximation
  algorithms share this semantic, so the oracle must too;
* per-source L1 (norm-1) tolerance stop; negative tolerance disables the
  early stop (pprSingleSource.h:23-25).

TPU formulation: batched over many sources at once — state is ``[B, N]``, the
push is a gather over ``edge_src`` followed by a batched segment-sum over
``edge_dst``, edge-chunked to bound the ``[B, E]`` intermediate.
"""

from __future__ import annotations

import functools
from typing import Dict, Hashable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import Graph
from ..utils.validation import check_damping, check_iterations
from .common import DeviceGraph, device_graph

# Bound on the [B, edge_chunk] intermediate per push step.
DEFAULT_EDGE_ELEM_BUDGET = 1 << 24


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "num_nodes", "edge_chunk"),
)
def _power_iterate(
    indptr: jax.Array,
    indices: jax.Array,
    edge_src: jax.Array,
    out_degree: jax.Array,
    sources: jax.Array,  # int32[B]
    damping: jax.Array,
    tolerance: jax.Array,
    iterations: int,
    num_nodes: int,
    edge_chunk: int,
) -> jax.Array:
    b = sources.shape[0]
    n = num_nodes
    e = indices.shape[0]

    # damping/outdeg per node; dangling nodes push nothing (mass loss,
    # pprSingleSource.h:57-66 — empty successor loop).
    coef = jnp.where(
        out_degree > 0, damping / jnp.maximum(out_degree, 1).astype(jnp.float32), 0.0
    )

    # Pad edges to a chunk multiple; padded edges route to a dead bin (n).
    n_chunks = max(1, -(-e // edge_chunk))
    pad = n_chunks * edge_chunk - e
    esrc = jnp.pad(edge_src, (0, pad))
    edst = jnp.pad(indices, (0, pad), constant_values=n)
    esrc = esrc.reshape(n_chunks, edge_chunk)
    edst = edst.reshape(n_chunks, edge_chunk)

    x0 = jnp.zeros((b, n), dtype=jnp.float32)
    x0 = x0.at[jnp.arange(b), sources].set(1.0)

    def push(x):
        pushes = x * coef[None, :]

        def body(carry, chunk):
            s, d = chunk
            vals = pushes[:, s]  # [B, ce]
            acc = jax.vmap(
                lambda row: jax.ops.segment_sum(row, d, num_segments=n + 1)
            )(vals)
            return carry + acc[:, :n], None

        nxt, _ = jax.lax.scan(
            body, jnp.zeros((b, n), dtype=jnp.float32), (esrc, edst)
        )
        return nxt.at[jnp.arange(b), sources].add(1.0 - damping)

    def cond(state):
        i, x, active = state
        return (i < iterations) & jnp.any(active)

    def body(state):
        i, x, active = state
        nxt = push(x)
        diff = jnp.sum(jnp.abs(x - nxt), axis=-1)
        new_x = jnp.where(active[:, None], nxt, x)
        new_active = active & (diff >= tolerance)
        return i + 1, new_x, new_active

    _, x, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x0, jnp.ones((b,), dtype=bool))
    )
    return x


def ppr_single_source_batch(
    graph: Graph,
    sources: Sequence[int] | np.ndarray,
    iterations: int,
    damping: float,
    tolerance: float,
    edge_elem_budget: int = DEFAULT_EDGE_ELEM_BUDGET,
    mesh=None,
) -> jax.Array:
    """Dense exact PPR vectors ``float32[B, N]`` for internal-id sources.

    With ``mesh`` the source batch is row-sharded across the mesh (CSR
    replicated) — embarrassingly parallel scale-out for the oracle, e.g.
    evaluating many test sources across a pod slice.
    """
    check_iterations(iterations)
    check_damping(damping)
    dg = device_graph(graph)
    src_np = np.asarray(sources, dtype=np.int32)
    b = int(src_np.shape[0])
    pad = 0
    args = [dg.indptr, dg.indices, dg.edge_src, dg.out_degree]
    if mesh is not None and b > 0:
        from ..parallel.mesh import replicated, row_sharding

        d = mesh.devices.size
        pad = (-b) % d
        src_np = np.pad(src_np, (0, pad))
        rep = replicated(mesh)
        args = [jax.device_put(a, rep) for a in args]
        sources_d = jax.device_put(jnp.asarray(src_np), row_sharding(mesh))
    else:
        sources_d = jnp.asarray(src_np)
    e = max(graph.num_edges, 1)
    edge_chunk = int(min(e, max(1024, edge_elem_budget // max(b + pad, 1))))
    out = _power_iterate(
        args[0],
        args[1],
        args[2],
        args[3],
        sources_d,
        jnp.float32(damping),
        jnp.float32(tolerance),
        iterations,
        graph.num_nodes,
        edge_chunk,
    )
    return out[:b] if pad else out


def ppr_single_source(
    graph: Graph,
    iterations: int,
    damping: float,
    tolerance: float,
    source: Hashable,
) -> Dict[Hashable, float]:
    """Single-source exact PPR as a sparse dict over external keys.

    Matches the reference's map contract: only touched nodes are present
    (untouched = absent = 0), and the source is always present
    (pprSingleSource.h:45-54).
    """
    check_iterations(iterations)
    check_damping(damping)
    if source not in graph:
        raise ValueError("source node not part of the graph")
    sid = graph.key_to_id(source)
    dense = np.asarray(
        ppr_single_source_batch(graph, [sid], iterations, damping, tolerance)
    )[0]
    keys = graph.keys
    out = {keys[i]: float(dense[i]) for i in np.nonzero(dense > 0)[0]}
    out.setdefault(keys[sid], float(dense[sid]))
    return out
