"""GRank: all-sources top-K personalized PageRank by iterative basket merging.

Reference: ``ppr::grank`` (include/grank.h:42-150).  Semantics preserved:

* init: ``scores[v] = keepTop_L({v: 1-damping} + {succ: += damping/outdeg})``
  (include/grank.h:64-83);
* the main loop sweeps ONE partition per iteration (``iterations`` counts
  half-sweeps); the untouched partition's baskets carry over, so a node reads
  t-1 data from the other partition and t-2 data from its own
  (include/grank.h:92-140, thesis Fig. 4.2);
* two ``maxDiff`` slots — one per partition — prevent a trivial partition
  from terminating the loop before the other ran (include/grank.h:87-92);
* negative tolerance disables the early stop entirely (include/grank.h:37-39);
* final ``keepTop(K)`` truncation (include/grank.h:143-147).

TPU formulation: baskets are ``[N, L]`` id/score arrays; each half-sweep is a
single jitted program over the active partition's degree buckets (gather →
sort-merge → top-L, see ops/merge.py); convergence is a max-reduce returned
to the host.  The partition-alternating structure is what makes the sweep a
pure gather (reads only the *old* basket tensor) — no intra-sweep hazards.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Hashable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import Graph
from ..ops.basket import Baskets, empty_baskets, keep_top_chunked
from ..ops.merge import DEFAULT_ELEM_BUDGET, DeviceBucket, device_plan, merge_sweep
from ..utils.validation import check_basket_params, check_damping, check_iterations
from .common import baskets_to_dict

# Above this basket size (N * L elements) the main loop steps from the host
# (one dispatch + convergence sync per half-sweep) instead of the device
# while_loop: the fused loop's lax.cond skip branches and loop carries keep
# extra full-basket copies live (measured: 2x 2.29 GB remat copies at the
# 4.8M-node north star, the difference between fitting one v5e and OOM).
# Below it the device loop matters a lot on remote-device links: each
# host-loop dispatch costs a link round-trip (~4 s/sweep measured through
# this sandbox's TPU tunnel — 1M-node 4-sweep run: 8.9 s device loop vs
# 27.7 s host loop).  Round 4 had lowered this to 2^26 to dodge a v5e
# kernel fault; the fault class was giant flat hub-row sorts (multi-
# megabyte single rows), now routed through the hierarchical hub merge
# (ops/merge._hub_merge_chunk) at every size — see docs/PERF.md.
DEVICE_LOOP_MAX_ELEMS = int(
    os.environ.get("PPR_DEVICE_LOOP_MAX_ELEMS", str(1 << 28))
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "num_rows", "compute_diff", "elem_budget", "algo", "hub_sub"
    ),
    donate_argnames=("basket",),
)
def _init_step(
    basket: Baskets,
    buckets: Tuple[DeviceBucket, ...],
    damping: jax.Array,
    L: int,
    num_rows: int,
    elem_budget: int,
    compute_diff: bool = False,
    algo: str | None = None,
    hub_sub: int | None = None,
) -> Baskets:
    out, _ = merge_sweep(
        None,
        buckets,
        damping,
        L,
        num_rows,
        mode="grank",
        compute_diff=False,
        out_basket=basket,
        elem_budget=elem_budget,
        algo=algo,
        hub_sub=hub_sub,
    )
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "num_rows", "compute_diff", "elem_budget", "algo", "hub_sub"
    ),
    donate_argnames=("basket",),
)
def _half_sweep(
    basket: Baskets,
    buckets: Tuple[DeviceBucket, ...],
    damping: jax.Array,
    L: int,
    num_rows: int,
    compute_diff: bool,
    elem_budget: int,
    algo: str | None = None,
    hub_sub: int | None = None,
) -> Tuple[Baskets, jax.Array]:
    return merge_sweep(
        basket,
        buckets,
        damping,
        L,
        num_rows,
        mode="grank",
        compute_diff=compute_diff,
        elem_budget=elem_budget,
        algo=algo,
        hub_sub=hub_sub,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "L", "num_rows", "compute_diff", "elem_budget", "algo", "hub_sub"
    ),
    # the caller never reuses the init basket; donating it saves one full
    # [N, L] ids+scores replica of HBM (3.8 GB at the 4.8M-node north star)
    donate_argnames=("basket",),
)
def _full_run(
    basket: Baskets,
    buckets_a: Tuple[DeviceBucket, ...],
    buckets_b: Tuple[DeviceBucket, ...],
    damping: jax.Array,
    tolerance: jax.Array,
    iterations: jax.Array,
    L: int,
    num_rows: int,
    compute_diff: bool,
    elem_budget: int,
    algo: str | None = None,
    hub_sub: int | None = None,
) -> Tuple[Baskets, jax.Array]:
    """The whole GRank main loop as ONE device program.

    Returns (baskets, half-sweeps actually executed) — the latter feeds
    honest throughput reporting (a tolerance stop can end the loop well
    before ``iterations``).

    A while_loop over half-sweep *pairs* (partition A then B) with the
    reference's per-partition maxDiff bookkeeping (include/grank.h:87-141)
    evaluated on device — no host round-trip per iteration.  Used by the
    production path; the host loop in grank_baskets keeps the same
    semantics step-by-step for debugging.
    """

    def sweep(b, bkts):
        return merge_sweep(
            b, bkts, damping, L, num_rows, mode="grank",
            compute_diff=compute_diff, elem_budget=elem_budget, algo=algo,
            hub_sub=hub_sub,
        )

    def half(state, bkts):
        h, md0, md1, b = state
        run = (h < iterations) & (jnp.maximum(md0, md1) >= tolerance)

        def do(b):
            nb, d = sweep(b, bkts)
            return nb, d

        nb, d = jax.lax.cond(
            run, do, lambda b: (b, jnp.float32(0.0)), b
        )
        # md[0] = d; then swap(md[0], md[1])  (include/grank.h:94,140)
        md0n = jnp.where(run, md1, md0)
        md1n = jnp.where(run, d, md1)
        hn = jnp.where(run, h + 1, h)
        return hn, md0n, md1n, nb

    def body(state):
        state = half(state, buckets_a)
        state = half(state, buckets_b)
        return state

    def cond(state):
        h, md0, md1, _ = state
        return (h < iterations) & (jnp.maximum(md0, md1) >= tolerance)

    init = (jnp.int32(0), tolerance, tolerance, basket)
    h, _, _, out = jax.lax.while_loop(cond, body, init)
    return out, h


def _set_dangling(basket: Baskets, rows: np.ndarray, damping: float) -> Baskets:
    """Dangling nodes' baskets are exactly {v: 1-damping}, forever."""
    if rows.size == 0:
        return basket
    rows_d = jnp.asarray(rows, dtype=jnp.int32)
    ids = basket.ids.at[rows_d, 0].set(rows_d)
    scores = basket.scores.at[rows_d, 0].set(1.0 - float(damping))
    return Baskets(ids, scores)


def grank_baskets(
    graph: Graph,
    K: int,
    L: int,
    iterations: int,
    damping: float,
    tolerance: float,
    elem_budget: int = DEFAULT_ELEM_BUDGET,
    mesh=None,
    host_loop: bool = False,
    merge_algo: str | None = None,
    engine: str = "auto",
    matmul_dtype=None,
    exact_trunc: bool = False,
    return_info: bool = False,
) -> Baskets:
    """GRank returning ``[N, K]`` basket arrays over internal node ids.

    With ``return_info=True`` returns ``(baskets, info)`` where ``info`` is
    a dict with ``iterations_ran`` — the number of half-sweeps the main loop
    actually executed (the honest denominator for throughput reporting; the
    tolerance stop can end the loop before ``iterations``).

    With ``mesh`` the basket arrays are row-sharded over the mesh's node
    axis (see parallel/mesh.py) and XLA partitions every sweep across the
    devices — the data-parallel successor of grankMulti's thread chunking.
    ``host_loop=True`` steps the main loop from the host (one dispatch and
    convergence sync per half-sweep) instead of the single-program
    while_loop — same semantics, useful for debugging/inspection.

    ``engine`` selects the sweep implementation: ``"sparse"`` is the
    gather/sort pipeline over degree buckets (scales to arbitrary graphs,
    shardable over a mesh); ``"dense"`` runs each half-sweep as one MXU
    matmul over an ``[N, N]`` score matrix (see ops/dense.py) — much faster
    whenever the graph fits HBM; ``"auto"`` picks dense for unsharded graphs
    up to ``PPR_DENSE_MAX_NODES`` nodes.  ``matmul_dtype`` overrides the
    dense engine's matmul input dtype (bfloat16 on TPU by default; pass
    ``jnp.float32`` for bitwise-tight comparisons against the sparse path).
    """
    check_basket_params(K, L)
    check_iterations(iterations)
    check_damping(damping)

    n = graph.num_nodes
    if n == 0:
        out = empty_baskets(0, K)
        return (out, {"iterations_ran": 0}) if return_info else out

    from ..ops.dense import dense_grank_run, use_dense_engine

    if host_loop and engine == "auto":
        engine = "sparse"  # host_loop debugs the sparse runner
    if use_dense_engine(n, engine, mesh):
        return dense_grank_run(
            graph, K, L, iterations, damping, tolerance,
            matmul_dtype=matmul_dtype, exact_trunc=exact_trunc,
            return_info=return_info,
        )

    if mesh is not None:
        # Sharded path: explicit owner-centric ring communication via
        # shard_map (parallel/ring.py) — per-device memory is O(N/D * L),
        # unlike the GSPMD fallback that all-gathers the basket tensor.
        from ..parallel.ring import ring_grank_baskets

        return ring_grank_baskets(
            graph, K, L, iterations, damping, tolerance, mesh=mesh,
            merge_algo=merge_algo, return_info=return_info,
        )
    # Width-aligned bucket caps when the merge runs through a sorting
    # network (pallas/bitonic): cap*L+1 lands at a power of two, so the
    # network sorts no pow2 padding (see graph._width_aligned_cap_table);
    # hub rows (deg > the largest aligned cap) get multiple-of-sub caps and
    # the hierarchical hub merge, so no sort row ever exceeds the network
    # width (see ops/merge._hub_merge_chunk).
    from ..ops.merge import net_max_width

    net = net_max_width(merge_algo)
    plan_L = L if net else None
    plans = [
        graph.merge_plan(0, L=plan_L, net_width=net),
        graph.merge_plan(1, L=plan_L, net_width=net),
    ]
    hub_sub = max((net - 1) // L, 1) if net else None
    dev_buckets = [device_plan(p, n) for p in plans]
    all_buckets = dev_buckets[0] + dev_buckets[1]
    damping_d = jnp.float32(damping)

    basket = empty_baskets(n, L)
    basket = _set_dangling(
        basket,
        np.concatenate([plans[0].dangling_rows, plans[1].dangling_rows]),
        damping,
    )
    basket = _init_step(
        basket, all_buckets, damping_d, L, n, elem_budget, algo=merge_algo,
        hub_sub=hub_sub,
    )

    compute_diff = tolerance >= 0
    if not host_loop and n * L >= DEVICE_LOOP_MAX_ELEMS:
        host_loop = True  # see DEVICE_LOOP_MAX_ELEMS
    if not host_loop:
        basket, h = _full_run(
            basket,
            dev_buckets[0],
            dev_buckets[1],
            damping_d,
            jnp.float32(tolerance),
            jnp.int32(iterations),
            L,
            n,
            compute_diff,
            elem_budget,
            algo=merge_algo,
            hub_sub=hub_sub,
        )
        out = keep_top_chunked(basket.ids, basket.scores, K)
        if return_info:
            return out, {"iterations_ran": int(h)}
        return out

    # Host-side loop: same semantics, one dispatch + sync per half-sweep.
    # Per-partition maxDiff slots, initialised to the tolerance so each
    # partition gets at least one sweep (include/grank.h:87-92).
    max_diff = [tolerance, tolerance]
    active = 0
    i = 0
    while i < iterations and max(max_diff) >= tolerance:
        basket, d = _half_sweep(
            basket,
            dev_buckets[active],
            damping_d,
            L,
            n,
            compute_diff,
            elem_budget,
            algo=merge_algo,
            hub_sub=hub_sub,
        )
        max_diff[0] = float(d) if compute_diff else 0.0
        active = 1 - active
        max_diff[0], max_diff[1] = max_diff[1], max_diff[0]
        i += 1

    out = keep_top_chunked(basket.ids, basket.scores, K)
    if return_info:
        return out, {"iterations_ran": i}
    return out


def grank(
    graph: Graph,
    K: int,
    L: int,
    iterations: int,
    damping: float,
    tolerance: float,
    elem_budget: int = DEFAULT_ELEM_BUDGET,
    engine: str = "auto",
    matmul_dtype=None,
    exact_trunc: bool = False,
) -> Dict[Hashable, Dict[Hashable, float]]:
    """GRank with the reference's call signature and map-of-maps result
    (include/grank.h:42-48)."""
    return baskets_to_dict(
        grank_baskets(
            graph, K, L, iterations, damping, tolerance, elem_budget,
            engine=engine, matmul_dtype=matmul_dtype, exact_trunc=exact_trunc,
        ),
        graph,
    )


def grank_multi_baskets(
    graph: Graph,
    K: int,
    L: int,
    iterations: int,
    damping: float,
    tolerance: float,
    n_shards: int,
    elem_budget: int = DEFAULT_ELEM_BUDGET,
) -> Baskets:
    """Sharded GRank over ``n_shards`` devices — the TPU successor of
    ``grankMulti`` (header-only/grankMulti.h:289-296): node ranges owned per
    device, cross-shard basket reads via XLA collectives, convergence via a
    global max-reduce."""
    from ..utils.validation import check_shards
    from ..parallel.mesh import make_mesh

    check_shards(n_shards)
    mesh = make_mesh(n_shards)
    return grank_baskets(
        graph, K, L, iterations, damping, tolerance, elem_budget, mesh=mesh
    )


def grank_multi(
    graph: Graph,
    K: int,
    L: int,
    iterations: int,
    damping: float,
    tolerance: float,
    n_shards: int,
) -> Dict[Hashable, Dict[Hashable, float]]:
    """grankMulti-shaped API (graph, K, L, iterations, damping, tolerance,
    parallelism degree) returning the reference's map-of-maps."""
    return baskets_to_dict(
        grank_multi_baskets(graph, K, L, iterations, damping, tolerance, n_shards),
        graph,
    )
