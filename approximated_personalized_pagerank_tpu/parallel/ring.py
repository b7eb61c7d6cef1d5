"""Ring-sharded GRank: explicit owner-centric communication over a 1-D mesh.

The TPU successor of ``grankMulti``'s shared-memory data parallelism
(header-only/grankMulti.h:289-436), designed so that per-device memory is
O(N/D * L) — each device owns a contiguous node range's baskets and buckets —
instead of the full-basket all-gather GSPMD falls back to when a row-sharded
array is gathered with replicated indices.

Communication pattern (`shard_map` + ``ppermute``):

* the basket tensor ``[N_pad, L]`` is row-sharded; device ``p`` owns rows
  ``[p*S, (p+1)*S)``;
* one half-sweep rotates the *old* basket shard around the ring: at ring
  step ``t`` device ``p`` holds the shard owned by ``(p - t) mod D`` and
  copies out the candidate basket rows for exactly those successors that
  live in that shard (every (row, successor-slot) pair is filled at one
  step, so the candidate matrix is complete and the merge is EXACT — no
  intermediate truncation);
* after ``D`` steps each device merges its candidates locally (the same
  sort/segmented-combine/top-L pipeline as the unsharded engine, so the
  1-shard == D-shard oracle holds bit-for-bit up to tie order) and writes
  its own rows;
* convergence is a ``pmax`` over the mesh — the collective analogue of the
  serial maxDiffs reduction (header-only/grankMulti.h:406-407).

Per-device peak memory: 2 basket shards (own old + rotating) + 1 out shard
+ the active round's candidate matrices (bounded by ``elem_budget`` via
bucket *rounds*: buckets are grouped so a round's candidates fit the budget,
at the cost of one extra ring rotation per round).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..graph import SENTINEL, Graph, _assign_caps
from ..ops.basket import Baskets, keep_top, norm1_rows
from ..ops.merge import _merge_rows, resolve_merge_algo
from .mesh import NODE_AXIS, make_mesh, put_sharded


def _trim_rows(ids, scores, n: int) -> Baskets:
    """Drop the shard-padding rows.  Multi-process arrays are not fully
    addressable, so the slice must run as an SPMD program (every process
    executes it) rather than an eager op."""
    if ids.shape[0] == n:
        return Baskets(ids, scores)
    if jax.process_count() == 1:
        return Baskets(ids[:n], scores[:n])
    return Baskets(*jax.jit(lambda a, b: (a[:n], b[:n]))(ids, scores))


def _host_iterations(h) -> int:
    """Read the per-device half-sweep counter (all entries equal — the
    convergence decision is a global pmax) off this process's shards."""
    if jax.process_count() == 1:
        return int(np.asarray(h).max())
    return int(max(int(np.asarray(s.data).max()) for s in h.addressable_shards))

__all__ = ["ring_grank_baskets", "build_ring_plan", "RingPlan"]

# Per-device element budget for one round's candidate matrices (ids+scores).
DEFAULT_RING_ELEM_BUDGET = 1 << 22


@dataclasses.dataclass(frozen=True)
class RingBucket:
    """One degree bucket, stacked per device: rows[D, C] (global node ids,
    padded with N_pad), succ[D, C, cap] (padded with SENTINEL).  Every row
    in ``rows[d]`` is owned by device ``d``."""

    cap: int
    rows: np.ndarray
    succ: np.ndarray


@dataclasses.dataclass(frozen=True)
class RingPlan:
    """Per-partition ring plan: buckets grouped into budget-bounded rounds."""

    rounds: Tuple[Tuple[RingBucket, ...], ...]
    dangling_rows: np.ndarray


def _shard_size(n: int, d: int) -> int:
    return max(1, -(-n // d))


def build_ring_plan(
    graph: Graph,
    partition_id: int | None,
    n_shards: int,
    L: int,
    elem_budget: int = DEFAULT_RING_ELEM_BUDGET,
    algo: str | None = None,
) -> RingPlan:
    """Degree-bucketed ELL plan with device-uniform bucket shapes.

    Like Graph.merge_plan (graph.py) but rows are grouped by owning device
    (owner = node // shard_size) and padded so every device sees the same
    [C, cap] bucket shape — the static-shape requirement of the single SPMD
    program each device runs under shard_map.  ``algo`` (the resolved merge
    pipeline) enables sort-width-aligned caps for the network merges.
    """
    algo = resolve_merge_algo(algo)
    n = graph.num_nodes
    s = _shard_size(n, n_shards)
    n_pad = s * n_shards
    if partition_id is None:  # all nodes (the MC combine sweeps every node)
        nodes = np.arange(n, dtype=np.int64)
    else:
        nodes = np.nonzero(graph.partition == partition_id)[0]
    deg = graph.out_degree[nodes].astype(np.int64)
    dangling = nodes[deg == 0].astype(np.int32)
    nodes = nodes[deg > 0]
    deg = graph.out_degree[nodes].astype(np.int64)
    buckets: List[RingBucket] = []
    if nodes.size:
        caps = _assign_caps(
            deg, L if algo.split(":")[0] in ("pallas", "bitonic") else None
        )
        owner = nodes // s
        for cap in np.unique(caps):
            cap = int(cap)
            sel_mask = caps == cap
            sel = nodes[sel_mask]
            own = owner[sel_mask]
            counts = np.bincount(own, minlength=n_shards)
            c = int(counts.max())
            rows = np.full((n_shards, c), n_pad, dtype=np.int32)
            succ = np.full((n_shards, c, cap), SENTINEL, dtype=np.int32)
            # position of each node within its device's row list
            order = np.argsort(own, kind="stable")
            sel_o = sel[order]
            own_o = own[order]
            offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
            pos = np.arange(sel_o.size) - offs[own_o]
            rows[own_o, pos] = sel_o.astype(np.int32)
            lens = graph.out_degree[sel_o].astype(np.int64)
            starts = graph.indptr[sel_o].astype(np.int64)
            rep_r = np.repeat(own_o, lens)
            rep_p = np.repeat(pos, lens)
            col = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
            )
            succ[rep_r, rep_p, col] = graph.indices[np.repeat(starts, lens) + col]
            buckets.append(RingBucket(cap=cap, rows=rows, succ=succ))
    # group buckets into rounds: one ring rotation each, candidates bounded
    rounds: List[List[RingBucket]] = []
    cur: List[RingBucket] = []
    cur_elems = 0
    for b in sorted(buckets, key=lambda b: b.cap):
        elems = b.rows.shape[1] * b.cap * L
        if cur and cur_elems + elems > elem_budget:
            rounds.append(cur)
            cur, cur_elems = [], 0
        cur.append(b)
        cur_elems += elems
    if cur:
        rounds.append(cur)
    return RingPlan(
        rounds=tuple(tuple(r) for r in rounds), dangling_rows=dangling
    )


def _plan_signature(plan: RingPlan) -> Tuple:
    return tuple(
        tuple((b.cap, b.rows.shape[1]) for b in rnd) for rnd in plan.rounds
    )


def _device_plan_arrays(plan: RingPlan):
    """Pytree of device arrays mirroring plan.rounds (rows, succ per bucket)."""
    return tuple(
        tuple((jnp.asarray(b.rows), jnp.asarray(b.succ)) for b in rnd)
        for rnd in plan.rounds
    )


def _ring_fill(
    held: Baskets,
    succ: jax.Array,  # [C, cap] global successor ids (SENTINEL pad)
    cand: Baskets,  # [C, cap, L] fill-in-progress
    r: jax.Array,  # owner id of the held shard
    s: int,
) -> Baskets:
    owner = succ // s
    mask = (succ >= 0) & (owner == r)
    safe = jnp.where(mask, succ - r * s, 0)
    got_ids = held.ids[safe]  # [C, cap, L]
    got_scores = held.scores[safe]
    sel = mask[..., None] & (got_ids >= 0)
    return Baskets(
        jnp.where(sel, got_ids, cand.ids),
        jnp.where(sel, got_scores, cand.scores),
    )


def _merge_and_scatter(
    rows: jax.Array,  # [C] global node ids (pad = N_pad)
    succ: jax.Array,  # [C, cap]
    cand: Baskets,  # [C, cap, L] candidates (or None for init)
    old: Baskets,  # [S, L] local OLD shard (diff source)
    out: Baskets,  # [S, L] local out shard
    damping: jax.Array,
    my: jax.Array,
    s: int,
    L: int,
    algo: str,
    compute_diff: bool,
    mode: str = "grank",
) -> Tuple[Baskets, jax.Array]:
    """Merge for one bucket, then write the local out rows.

    ``mode="grank"``: candidates scaled by damping/outdeg, self entry
    1-damping (include/grank.h:100-116); L1-diff vs the old local rows.
    ``mode="mc_combine"``: candidates unscaled, self entry ``1/factor``,
    merged result scaled by ``factor = damping/outdeg`` after truncation
    (include/mccompletepathv2.h:213-249).
    """
    c, cap = succ.shape
    deg = jnp.sum(succ >= 0, axis=-1).astype(jnp.float32)
    factor = damping / jnp.maximum(deg, 1.0)
    post_scale = None
    if cand is None:  # init sweep: successors contribute singletons {s: 1}
        cand_ids = jnp.where(succ >= 0, succ, SENTINEL)
        cand_scores = jnp.where(succ >= 0, factor[:, None], 0.0)
    else:
        cand_ids = cand.ids.reshape(c, cap * L)
        cand_scores = cand.scores.reshape(c, cap * L)
        if mode == "grank":
            cand_scores = cand_scores * factor[:, None]
    if mode == "grank":
        self_scores = jnp.broadcast_to(1.0 - damping, (c,)).astype(jnp.float32)
    elif mode == "mc_combine":
        self_scores = (1.0 / factor).astype(jnp.float32)
        post_scale = factor
    else:
        raise ValueError(f"unknown merge mode {mode!r}")
    ids = jnp.concatenate([cand_ids, rows[:, None].astype(jnp.int32)], axis=-1)
    scores = jnp.concatenate([cand_scores, self_scores[:, None]], axis=-1)
    merged = _merge_rows(ids, scores, L, algo)
    if post_scale is not None:
        merged = Baskets(merged.ids, merged.scores * post_scale[:, None])
    local = rows - my * s
    in_range = (local >= 0) & (local < s)
    safe_local = jnp.where(in_range, local, 0)
    if compute_diff:
        old_rows = Baskets(old.ids[safe_local], old.scores[safe_local])
        diff = norm1_rows(merged, old_rows)
        diff = jnp.max(jnp.where(in_range, diff, 0.0), initial=0.0)
    else:
        diff = jnp.float32(0.0)
    out_ids = out.ids.at[local].set(merged.ids, mode="drop")
    out_scores = out.scores.at[local].set(merged.scores, mode="drop")
    return Baskets(out_ids, out_scores), diff


def _sweep_local(
    basket: Baskets,  # [S, L] local OLD shard
    rounds,  # device plan arrays for the active partition
    damping: jax.Array,
    my: jax.Array,
    n_shards: int,
    s: int,
    L: int,
    algo: str,
    compute_diff: bool,
    mode: str = "grank",
) -> Tuple[Baskets, jax.Array]:
    """One ring half-sweep over this device's rows of the active partition."""
    out = basket  # carry-over: rows not in this partition keep old values
    max_diff = jnp.float32(0.0)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    for rnd in rounds:
        # shard_map leaves a size-1 device axis on the plan arrays
        rnd = [(rows[0], succ[0]) for rows, succ in rnd]
        cands = [
            Baskets(
                jnp.full(succ.shape + (L,), SENTINEL, jnp.int32),
                jnp.zeros(succ.shape + (L,), jnp.float32),
            )
            for (_rows, succ) in rnd
        ]
        held = basket
        for t in range(n_shards):
            r = (my - t) % n_shards
            cands = [
                _ring_fill(held, succ, cand, r, s)
                for (_rows, succ), cand in zip(rnd, cands)
            ]
            if t + 1 < n_shards:
                held = Baskets(
                    jax.lax.ppermute(held.ids, NODE_AXIS, perm),
                    jax.lax.ppermute(held.scores, NODE_AXIS, perm),
                )
        for (rows, succ), cand in zip(rnd, cands):
            out, diff = _merge_and_scatter(
                rows, succ, cand, basket, out, damping, my, s, L, algo,
                compute_diff, mode=mode,
            )
            max_diff = jnp.maximum(max_diff, diff)
    return out, jax.lax.pmax(max_diff, NODE_AXIS)


def _init_local(basket, rounds_a, rounds_b, damping, my, s, L, algo):
    """Init sweep (include/grank.h:64-83): no basket reads, no ring."""
    out = basket
    for rounds in (rounds_a, rounds_b):
        for rnd in rounds:
            for rows, succ in rnd:
                out, _ = _merge_and_scatter(
                    rows[0], succ[0], None, basket, out, damping, my, s, L,
                    algo, False,
                )
    return out


_PROGRAM_CACHE: Dict = {}


def _build_program(
    mesh, n_shards, s, L, K, sig_a, sig_b, algo, compute_diff
):
    key = (id(mesh), n_shards, s, L, K, sig_a, sig_b, algo, compute_diff)
    prog = _PROGRAM_CACHE.get(key)
    if prog is not None:
        return prog

    def per_device(ids, scores, plan_a, plan_b, damping, tolerance, iterations):
        my = jax.lax.axis_index(NODE_AXIS)
        basket = Baskets(ids, scores)
        basket = _init_local(basket, plan_a, plan_b, damping, my, s, L, algo)

        def half(state, rounds):
            h, md0, md1, b = state
            run = (h < iterations) & (jnp.maximum(md0, md1) >= tolerance)

            def do(b):
                return _sweep_local(
                    b, rounds, damping, my, n_shards, s, L, algo, compute_diff
                )

            nb, d = jax.lax.cond(run, do, lambda b: (b, jnp.float32(0.0)), b)
            md0n = jnp.where(run, md1, md0)
            md1n = jnp.where(run, d, md1)
            return jnp.where(run, h + 1, h), md0n, md1n, nb

        def body(state):
            state = half(state, plan_a)
            state = half(state, plan_b)
            return state

        def cond(state):
            h, md0, md1, _ = state
            return (h < iterations) & (jnp.maximum(md0, md1) >= tolerance)

        init = (jnp.int32(0), tolerance, tolerance, basket)
        h, _, _, out = jax.lax.while_loop(cond, body, init)
        final = keep_top(out.ids, out.scores, K)
        return final.ids, final.scores, h[None]

    def plan_spec(sig):
        return tuple(
            tuple((P(NODE_AXIS), P(NODE_AXIS)) for _b in rnd) for rnd in sig
        )

    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P(NODE_AXIS),
            P(NODE_AXIS),
            plan_spec(sig_a),
            plan_spec(sig_b),
            P(),
            P(),
            P(),
        ),
        out_specs=(P(NODE_AXIS), P(NODE_AXIS), P(NODE_AXIS)),
        check_vma=False,
    )
    prog = jax.jit(shard_fn)
    _PROGRAM_CACHE[key] = prog
    return prog


def _build_mc_program(mesh, n_shards, s, L, K, sig, algo, passes):
    key = ("mc", id(mesh), n_shards, s, L, K, sig, algo, passes)
    prog = _PROGRAM_CACHE.get(key)
    if prog is not None:
        return prog

    def per_device(ids, scores, plan, damping):
        my = jax.lax.axis_index(NODE_AXIS)
        basket = Baskets(ids, scores)
        for _ in range(passes):
            basket, _ = _sweep_local(
                basket, plan, damping, my, n_shards, s, L, algo, False,
                mode="mc_combine",
            )
        final = keep_top(basket.ids, basket.scores, K)
        return final.ids, final.scores

    def plan_spec(sig):
        return tuple(
            tuple((P(NODE_AXIS), P(NODE_AXIS)) for _b in rnd) for rnd in sig
        )

    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(NODE_AXIS), P(NODE_AXIS), plan_spec(sig), P()),
        out_specs=(P(NODE_AXIS), P(NODE_AXIS)),
        check_vma=False,
    )
    prog = jax.jit(shard_fn)
    _PROGRAM_CACHE[key] = prog
    return prog


def ring_mc_combine(
    graph: Graph,
    walk: Baskets,  # [N, L] walk baskets (ids -1-padded)
    K: int,
    L: int,
    damping: float,
    combine_passes: int,
    mesh=None,
    n_shards: int | None = None,
    elem_budget: int = DEFAULT_RING_ELEM_BUDGET,
    merge_algo: str | None = None,
) -> Baskets:
    """MCCompletePathV2's combine step sharded over the ring: every node
    merges its successors' baskets with the ``{v: 1/factor} ... *factor``
    scaling (include/mccompletepathv2.h:211-250), repeated
    ``combine_passes`` times.  Dangling nodes keep their walk basket
    ({v: 1.0}, mccompletepathv2.h:213-214) — they are simply not in the
    sweep plan.  The exact-merge property of the ring (module docstring)
    makes this bit-for-bit the serial combine, so the 1-shard == D-shard
    oracle holds."""
    if mesh is None:
        mesh = make_mesh(n_shards)
    n_shards = mesh.devices.size
    n = graph.num_nodes
    algo = resolve_merge_algo(merge_algo)
    s = _shard_size(n, n_shards)
    n_pad = s * n_shards

    plan = build_ring_plan(graph, None, n_shards, L, elem_budget, algo=algo)
    ids0 = np.full((n_pad, L), SENTINEL, dtype=np.int32)
    scores0 = np.zeros((n_pad, L), dtype=np.float32)
    ids0[:n] = np.asarray(walk.ids)
    scores0[:n] = np.asarray(walk.scores)

    row_sh = NamedSharding(mesh, P(NODE_AXIS))
    rep = NamedSharding(mesh, P())
    plan_d = tuple(
        tuple(
            (put_sharded(b.rows, row_sh), put_sharded(b.succ, row_sh))
            for b in rnd
        )
        for rnd in plan.rounds
    )
    prog = _build_mc_program(
        mesh, n_shards, s, L, K, _plan_signature(plan), algo, combine_passes
    )
    out_ids, out_scores = prog(
        put_sharded(ids0, row_sh),
        put_sharded(scores0, row_sh),
        plan_d,
        put_sharded(np.float32(damping), rep),
    )
    return _trim_rows(out_ids, out_scores, n)


def ring_grank_baskets(
    graph: Graph,
    K: int,
    L: int,
    iterations: int,
    damping: float,
    tolerance: float,
    n_shards: int | None = None,
    mesh=None,
    elem_budget: int = DEFAULT_RING_ELEM_BUDGET,
    merge_algo: str | None = None,
    return_info: bool = False,
    analyze_memory: bool = False,
) -> Baskets:
    """Sharded GRank over an explicit ring (module docstring).  Semantics
    identical to the serial grank (include/grank.h:42-150): half-sweep
    accounting, per-partition maxDiff, tolerance<0 never stops early,
    final keepTop(K).

    ``analyze_memory=True`` (implies return_info) attaches the compiled
    program's per-device memory analysis to the info dict — the proof that
    a device's peak footprint is O(N/D * L) rather than the full basket.
    """
    if mesh is None:
        mesh = make_mesh(n_shards)
    n_shards = mesh.devices.size
    n = graph.num_nodes
    algo = resolve_merge_algo(merge_algo)
    s = _shard_size(n, n_shards)
    n_pad = s * n_shards

    plan_a = build_ring_plan(graph, 0, n_shards, L, elem_budget, algo=algo)
    plan_b = build_ring_plan(graph, 1, n_shards, L, elem_budget, algo=algo)

    ids0 = np.full((n_pad, L), SENTINEL, dtype=np.int32)
    scores0 = np.zeros((n_pad, L), dtype=np.float32)
    dang = np.concatenate([plan_a.dangling_rows, plan_b.dangling_rows])
    if dang.size:
        ids0[dang, 0] = dang
        scores0[dang, 0] = 1.0 - float(damping)

    row_sh = NamedSharding(mesh, P(NODE_AXIS))
    rep = NamedSharding(mesh, P())
    ids_d = put_sharded(ids0, row_sh)
    scores_d = put_sharded(scores0, row_sh)

    def put_plan(plan):
        return tuple(
            tuple(
                (put_sharded(b.rows, row_sh), put_sharded(b.succ, row_sh))
                for b in rnd
            )
            for rnd in plan.rounds
        )

    plan_a_d = put_plan(plan_a)
    plan_b_d = put_plan(plan_b)

    compute_diff = tolerance >= 0
    prog = _build_program(
        mesh, n_shards, s, L, K,
        _plan_signature(plan_a), _plan_signature(plan_b), algo, compute_diff,
    )
    args = (
        ids_d,
        scores_d,
        plan_a_d,
        plan_b_d,
        put_sharded(np.float32(damping), rep),
        put_sharded(np.float32(tolerance), rep),
        put_sharded(np.int32(iterations), rep),
    )
    mem = None
    if analyze_memory:
        compiled = prog.lower(*args).compile()
        mem = compiled.memory_analysis()
        out_ids, out_scores, h = compiled(*args)
    else:
        out_ids, out_scores, h = prog(*args)
    out = _trim_rows(out_ids, out_scores, n)
    if return_info or analyze_memory:
        info = {"iterations_ran": _host_iterations(h)}
        if mem is not None:
            info["memory_analysis"] = mem
        return out, info
    return out
