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

TPU formulation: batched over many sources at once — state is ``[B, N]``.
The push ``nxt[b, v] = sum over predecessors u of x[b, u] * damping/outdeg(u)``
is computed as a **gather/reduce over in-degree-bucketed ELL** of the
reverse graph: for each bucket of destinations with similar in-degree,
gather ``pushes[:, pred]`` into a dense ``[B, C, cap]`` block and sum over
``cap`` — no scatters anywhere in the hot loop (an earlier edge-chunked
segment-sum formulation paid one HBM scatter-add per edge per sweep and was
~an order of magnitude slower at the 4.8M-node north-star scale).
"""

from __future__ import annotations

import functools
from typing import Dict, Hashable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import Graph
from ..utils.validation import check_damping, check_iterations

# Bound on the [B, chunk, cap] gather intermediate per push step.
DEFAULT_EDGE_ELEM_BUDGET = 1 << 24


def _reverse_graph(graph: Graph) -> Graph:
    """The predecessor graph (CSC as a Graph), cached on the instance."""
    rev = getattr(graph, "_rev_graph", None)
    if rev is None:
        cindptr, cindices = graph.csc
        rev = Graph(cindptr, cindices)
        graph._rev_graph = rev
    return rev


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "num_nodes", "elem_budget"),
)
def _power_iterate(
    pred_buckets,  # tuple of (rows, pred_flat) in-degree ELL buckets
    out_degree: jax.Array,
    sources: jax.Array,  # int32[B]
    damping: jax.Array,
    tolerance: jax.Array,
    iterations: int,
    num_nodes: int,
    elem_budget: int,
) -> jax.Array:
    b = sources.shape[0]
    n = num_nodes

    # damping/outdeg per node; dangling nodes push nothing (mass loss,
    # pprSingleSource.h:57-66 — empty successor loop).
    coef = jnp.where(
        out_degree > 0, damping / jnp.maximum(out_degree, 1).astype(jnp.float32), 0.0
    )

    # State is [N, B] — node-major, batch on the 128-lane minor axis.  The
    # batch-major [B, N] formulation gathered [B, chunk, cap] blocks along
    # axis 1, a transposed-gather pattern under which the v5e backend
    # SILENTLY CORRUPTS results at some (B, N) shapes and kills the TPU
    # worker at others ([16, 1M] returned PPR rows summing to 1.8;
    # [32, 300k] crashed; [6, 1M] was fine — diagnosed via the row-sum
    # invariant, every true PPR vector sums to <= 1).  Node-major gathers
    # index only the MAJOR axis with whole [B] lanes as the unit, the
    # layout TPU gathers are actually built for; it is also faster.
    x0 = jnp.zeros((n, b), dtype=jnp.float32)
    x0 = x0.at[sources, jnp.arange(b)].set(1.0)

    def push(x):
        pushes = x * coef[:, None]  # [N, B]
        nxt = jnp.zeros((n, b), dtype=jnp.float32)
        for rows, pred_flat in pred_buckets:
            c = rows.shape[0]
            cap = pred_flat.shape[0] // max(c, 1)
            chunk = int(max(1, min(c, elem_budget // max(b * cap, 1))))
            n_chunks = -(-c // chunk)
            pad = n_chunks * chunk - c
            rows_p = jnp.pad(rows, (0, pad), constant_values=n) if pad else rows
            flat_p = (
                jnp.pad(pred_flat, (0, pad * cap), constant_values=-1)
                if pad
                else pred_flat
            )

            def one(start, flat_p=flat_p, chunk=chunk, cap=cap):
                # ``start`` is a ROW offset (k * chunk), so the flat slice
                # begins at start * cap.  (A round-3 bug mapped over chunk
                # indices k while still slicing at k * cap — every chunk
                # after the first read the wrong predecessor rows, which
                # is why oracle results corrupted exactly when b * cap got
                # big enough to make any bucket multi-chunk.)
                pred = jax.lax.dynamic_slice(
                    flat_p, (start * cap,), (chunk * cap,)
                ).reshape(chunk, cap)
                valid = pred >= 0
                safe = jnp.where(valid, pred, 0)
                vals = pushes[safe] * valid[..., None]  # [chunk, cap, B]
                return jnp.sum(vals, axis=1)  # [chunk, B]

            if n_chunks == 1:
                acc = one(jnp.int32(0))
            else:
                acc = jax.lax.map(
                    one, jnp.arange(n_chunks, dtype=jnp.int32) * chunk
                )  # [n_chunks, chunk, B]
                acc = acc.reshape(n_chunks * chunk, b)
            # each destination row lives in exactly one bucket: set; the
            # padded rows carry index n and are dropped
            nxt = nxt.at[rows_p].set(acc, mode="drop")
        return nxt.at[sources, jnp.arange(b)].add(1.0 - damping)

    def cond(state):
        i, x, active = state
        return (i < iterations) & jnp.any(active)

    def body(state):
        i, x, active = state
        nxt = push(x)
        diff = jnp.sum(jnp.abs(x - nxt), axis=0)  # [B]
        new_x = jnp.where(active[None, :], nxt, x)
        new_active = active & (diff >= tolerance)
        return i + 1, new_x, new_active

    _, x, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x0, jnp.ones((b,), dtype=bool))
    )
    return x.T


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
    replicated) — embarrassingly parallel scale-out for the oracle on a
    SINGLE-PROCESS mesh (all shards addressable: the final ``out[:b]`` trim
    and callers' ``np.asarray`` materialize the global array).  Multi-host
    eval instead runs this per process on the process's own source slice —
    the harness samples on every host identically, so slicing is trivial.
    """
    check_iterations(iterations)
    check_damping(damping)
    src_np = np.asarray(sources, dtype=np.int32)
    b = int(src_np.shape[0])
    pad = 0

    rev = _reverse_graph(graph)
    plan = rev.merge_plan(None)  # in-degree buckets of the forward graph
    pred_buckets = getattr(graph, "_pred_buckets", None)
    if pred_buckets is None:
        pred_buckets = tuple(
            (
                jnp.asarray(bk.rows, dtype=jnp.int32),
                jnp.asarray(bk.succ.reshape(-1), dtype=jnp.int32),
            )
            for bk in plan.buckets
        )
        graph._pred_buckets = pred_buckets
    out_degree = jnp.asarray(graph.out_degree, dtype=jnp.int32)

    if mesh is not None and b > 0:
        from ..parallel.mesh import replicated, row_sharding

        d = mesh.devices.size
        pad = (-b) % d
        src_np = np.pad(src_np, (0, pad))
        rep = replicated(mesh)
        pred_buckets = tuple(
            (jax.device_put(r, rep), jax.device_put(f, rep))
            for r, f in pred_buckets
        )
        out_degree = jax.device_put(out_degree, rep)
        sources_d = jax.device_put(jnp.asarray(src_np), row_sharding(mesh))
    else:
        sources_d = jnp.asarray(src_np)
    out = _power_iterate(
        pred_buckets,
        out_degree,
        sources_d,
        jnp.float32(damping),
        jnp.float32(tolerance),
        iterations,
        graph.num_nodes,
        edge_elem_budget,
    )
    out = out[:b] if pad else out
    # Mass-conservation self-check: every true PPR vector sums to <= 1
    # (dangling mass is only LOST, pprSingleSource.h:57-66).  The v5e
    # backend has silently returned corrupt gathers at specific (B, N)
    # shapes (rows summing to 1.8 at [16, 1M]); this 8*B-byte check turns
    # any recurrence of that class of bug into a loud error instead of a
    # poisoned benchmark.
    if b > 0:
        sums = np.asarray(jnp.sum(out, axis=-1))
        if sums.max() > 1.0 + 1e-3 or not np.isfinite(sums).all():
            raise RuntimeError(
                "exact-PPR oracle violated mass conservation "
                f"(max row sum {sums.max():.4f} for batch shape "
                f"[{b}, {graph.num_nodes}]) — backend miscompilation; "
                "retry with a different batch_size / edge_elem_budget"
            )
    return out


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
