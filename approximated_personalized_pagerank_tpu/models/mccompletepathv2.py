"""MCCompletePathV2: all-sources top-K PPR from shared Monte-Carlo walks.

Reference: ``ppr::mccompletepathv2`` (include/mccompletepathv2.h:182-258).
The reference walks nodes *lazily* in a heuristic execution order
(``executionOrder``, mccompletepathv2.h:36-113) so that a node's combine step
(``map = {v: 1/factor} + sum of successors' baskets; keepTop(L); *factor``,
mccompletepathv2.h:211-250) can reuse successors' results.  That ordering
exists only to economize *serial* walk time; the TPU-native formulation walks
**all sources in parallel** (ops/walk.py) and then performs the combine as
one batched merge sweep — walk-count parity (R per node) is preserved.

``combine_passes`` re-applies the combine using the previous pass's results
for every successor — the parallel-schedule analogue of the reference's
propagation of final (already-combined) successor results along its
execution order (mccompletepathv2.h:230-234).  The default of 2 passes
dominates the reference's measured quality on the Eat benchmark (jaccard
0.961 vs 0.944) at lower wall time; ``combine_passes=1`` gives the pure
walk + single-combine form.

Deliberate divergences (documented in README):
* uniform random successor choice instead of the serial rotating index
  (thesis p.7: <=5% precision at low walk counts);
* no in-walk L-cap — full counts are kept then truncated, a strict quality
  improvement over dropping visits (mccompletepathv2.h:152-153);
* results are deterministic given ``seed`` (the reference's module-level
  mt19937 is entropy-seeded, mccompletepathv2.h:32-34).
"""

from __future__ import annotations

import functools
from typing import Dict, Hashable

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import Graph
from ..ops.basket import Baskets, empty_baskets, keep_top_chunked
from ..ops.merge import DEFAULT_ELEM_BUDGET, device_plan, merge_sweep
from ..ops.walk import walk_baskets
from ..utils.validation import check_basket_params, check_damping, check_iterations
from .common import baskets_to_dict


@functools.partial(
    jax.jit,
    static_argnames=("L", "num_rows", "elem_budget", "algo", "hub_sub"),
    donate_argnames=("basket",),
)
def _combine_pass(
    basket: Baskets,
    buckets,
    damping: jax.Array,
    L: int,
    num_rows: int,
    elem_budget: int,
    algo: str | None = None,
    hub_sub: int | None = None,
) -> Baskets:
    out, _ = merge_sweep(
        basket,
        buckets,
        damping,
        L,
        num_rows,
        mode="mc_combine",
        compute_diff=False,
        elem_budget=elem_budget,
        algo=algo,
        hub_sub=hub_sub,
    )
    return out


def mccompletepathv2_baskets(
    graph: Graph,
    K: int,
    L: int,
    iterations: int,
    damping: float,
    seed: int | None = None,
    combine_passes: int = 2,
    elem_budget: int = DEFAULT_ELEM_BUDGET,
    merge_algo: str | None = None,
    engine: str = "auto",
    matmul_dtype=None,
    return_info: bool = False,
    mesh=None,
    successor_choice: str = "uniform",
) -> Baskets:
    """MCCompletePathV2 returning ``[N, K]`` baskets over internal ids.

    ``iterations`` is R — the number of Monte-Carlo walks per node in the
    worst case (include/mccompletepathv2.h:186).

    ``successor_choice="stratified"`` recovers the reference's rotating
    successor index effect (include/mccompletepathv2.h:142-151): a source's
    walker cohort takes evenly spaced first edges instead of independent
    uniform draws (see ops/walk._cohort_hop) — worth measuring at low R
    (thesis p.7 credits the rotation up to +5%% precision there).

    ``engine`` selects the combine implementation exactly like GRank's
    (see models/grank.py): ``"dense"`` keeps the walk counts in an [N, N]
    matrix and runs the combine as MXU matmuls (ops/dense.py), ``"sparse"``
    uses the gather/sort merge over degree buckets, ``"auto"`` picks dense
    for graphs up to ``PPR_MC_DENSE_MAX_NODES`` (default 32768) nodes.
    """
    check_basket_params(K, L)
    check_iterations(iterations)
    check_damping(damping)
    if combine_passes < 1:
        raise ValueError("combine_passes must be positive")
    if successor_choice not in ("uniform", "stratified"):
        raise ValueError(
            f"unknown successor_choice {successor_choice!r} "
            "(expected 'uniform' or 'stratified')"
        )
    stratified = successor_choice == "stratified"

    n = graph.num_nodes
    if n == 0:
        out = empty_baskets(0, K)
        return (out, {"walk_steps": 0}) if return_info else out

    if mesh is not None:
        # Sharded MC: walks are source-sharded data parallelism (replicated
        # CSR, bitwise-equal to unsharded); the combine is the exact ring
        # merge (parallel/ring.py) — the successor of grankMulti applied to
        # MCCompletePathV2, which the reference never parallelized.
        from ..parallel.ring import ring_mc_combine

        basket = walk_baskets(
            graph, L, iterations, damping, seed=seed,
            return_info=return_info, mesh=mesh, stratified=stratified,
        )
        info = None
        if return_info:
            basket, info = basket
        out = ring_mc_combine(
            graph, basket, K, L, damping, combine_passes, mesh=mesh,
            elem_budget=elem_budget, merge_algo=merge_algo,
        )
        return (out, info) if return_info else out

    from ..ops.dense import MC_DENSE_MAX_NODES, dense_mc_run, use_dense_engine

    if use_dense_engine(n, engine, None, max_nodes=MC_DENSE_MAX_NODES):
        return dense_mc_run(
            graph, K, L, iterations, damping, seed=seed,
            combine_passes=combine_passes, matmul_dtype=matmul_dtype,
            return_info=return_info, stratified=stratified,
        )

    basket = walk_baskets(
        graph, L, iterations, damping, seed=seed, return_info=return_info,
        stratified=stratified,
    )
    info = None
    if return_info:
        basket, info = basket
    from ..ops.merge import net_max_width

    net = net_max_width(merge_algo)
    plan = graph.merge_plan(None, L=L if net else None, net_width=net)
    hub_sub = max((net - 1) // L, 1) if net else None
    buckets = device_plan(plan, n)
    damping_d = jnp.float32(damping)
    for _ in range(combine_passes):
        basket = _combine_pass(
            basket, buckets, damping_d, L, n, elem_budget, algo=merge_algo,
            hub_sub=hub_sub,
        )
    # dangling nodes keep their walk basket {v: 1.0}
    # (mccompletepathv2.h:213-214: factor = 1.0, no successor contributions).
    out = keep_top_chunked(basket.ids, basket.scores, K)
    if return_info:
        return out, info
    return out


def mccompletepathv2_multi_baskets(
    graph: Graph,
    K: int,
    L: int,
    iterations: int,
    damping: float,
    n_shards: int,
    seed: int | None = None,
    combine_passes: int = 2,
) -> Baskets:
    """Sharded MCCompletePathV2 over ``n_shards`` devices: source-sharded
    walks + the exact ring combine.  The reference's only parallel variant
    is GRank (header-only/grankMulti.h); this extends the same node-range
    data parallelism to the Monte-Carlo algorithm."""
    from ..utils.validation import check_shards
    from ..parallel.mesh import make_mesh

    check_shards(n_shards)
    mesh = make_mesh(n_shards)
    return mccompletepathv2_baskets(
        graph, K, L, iterations, damping, seed=seed,
        combine_passes=combine_passes, mesh=mesh,
    )


def mccompletepathv2_multi(
    graph: Graph,
    K: int,
    L: int,
    iterations: int,
    damping: float,
    n_shards: int,
    seed: int | None = None,
    combine_passes: int = 2,
) -> Dict[Hashable, Dict[Hashable, float]]:
    """grankMulti-shaped sharded MC API returning the reference's
    map-of-maps."""
    return baskets_to_dict(
        mccompletepathv2_multi_baskets(
            graph, K, L, iterations, damping, n_shards, seed=seed,
            combine_passes=combine_passes,
        ),
        graph,
    )


def mccompletepathv2(
    graph: Graph,
    K: int,
    L: int,
    iterations: int,
    damping: float,
    seed: int | None = None,
    combine_passes: int = 2,
    engine: str = "auto",
) -> Dict[Hashable, Dict[Hashable, float]]:
    """MCCompletePathV2 with the reference call signature and map-of-maps
    result (include/mccompletepathv2.h:182-187)."""
    return baskets_to_dict(
        mccompletepathv2_baskets(
            graph, K, L, iterations, damping, seed=seed,
            combine_passes=combine_passes, engine=engine,
        ),
        graph,
    )
