"""Vectorized Monte-Carlo random walks: the TPU-native form of ``walkNode``.

Reference: include/mccompletepathv2.h:115-165.  There, each node lazily runs
``R`` serial walks with a shared rotating successor index; here **all sources
walk at once**: a ``[C, W]`` cohort of walkers (C sources x W walker slots)
advances one hop per step, with

* the first edge always taken and the teleport-before-first-edge accounted by
  thinning the cohort to ``floor(R * damping)`` walks up front
  (mccompletepathv2.h:127-132);
* per-step geometric continuation draws (``u <= damping``,
  mccompletepathv2.h:155) from counter-based PRNG (jax.random / threefry,
  batched one call per macro step) instead of the module-level mt19937
  (mccompletepathv2.h:32-34);
* uniform random successor choice instead of the serial rotating index — the
  rotating index is a serial-determinism trick worth <=5% precision at low
  walk counts (thesis p.7); walk-count parity compensates;
* **work-stealing slots**: a source's ``floor(R*damping)`` walks are a
  shared pool; any slot whose walk ends (teleport or stranding at a dangling
  node) immediately claims the next unstarted walk.  This keeps every slot
  busy until the source's whole quota is spent — on dangling-heavy graphs
  (Eat: most walks strand within 2 hops) the per-slot-quota design wasted
  >80% of slot-hops waiting for the straggler slot.

Two accumulation engines share the stepping code (and therefore the PRNG
stream — equal arguments give bitwise-equal visit multisets):

* ``trace`` (the default): record visit ids in an O(steps)-per-source
  buffer and count them with one sort + run-length pass — memory
  independent of N, and measured faster than ``counts`` at EVERY graph
  size (docs/PERF.md round-4 table; the per-macro-step scatter-add is
  what loses);
* ``counts``: scatter-add visits into dense ``[C, N]`` rows — kept as the
  structurally-independent second engine for the bitwise cross-check
  (round-1's dense rows collapse to ~5 sources per dispatch at N=4.8M).

Counts are divided by the original ``R`` (mccompletepathv2.h:158-160);
dangling sources yield ``{v: 1.0}`` (mccompletepathv2.h:162-163).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .basket import SENTINEL, Baskets, keep_top

__all__ = [
    "walk_counts_chunk",
    "walk_trace_chunk",
    "walk_baskets",
    "default_max_steps",
]



def default_max_steps(damping: float, eps: float = 1e-9) -> int:
    """Step cap making the truncated geometric tail < eps of walkers.

    The reference's do-while has no cap (it terminates with probability 1);
    a static cap is required for a compiled while_loop and is statistically
    invisible below eps.
    """
    if damping <= 0:
        return 1
    if damping >= 1:
        return 10_000
    return max(1, min(10_000, int(math.ceil(math.log(eps) / math.log(damping)))))


def _cohort_init(start_deg, sources, total, slots):
    """Initial cohort state for a source chunk.

    Returns (src2, cur0, rem0, alive0): ``rem0[c]`` is the source's count of
    not-yet-started walks (the shared pool), ``alive0[c, s]`` marks slots
    running one of the first ``slots`` walks.  Dangling sources start with
    nothing (their walks die on the first step with no count,
    mccompletepathv2.h:162-163).
    """
    c = sources.shape[0]
    src2 = jnp.broadcast_to(sources[:, None], (c, slots)).astype(jnp.int32)
    has_edges = start_deg[sources, 1] > 0  # [C]
    slot_idx = jnp.arange(slots, dtype=jnp.int32)[None, :]
    alive0 = has_edges[:, None] & (slot_idx < total)
    rem0 = jnp.where(has_edges, jnp.maximum(total - slots, 0), 0).astype(
        jnp.int32
    )
    return src2, src2, rem0, alive0


def _cohort_hop(
    start_deg, indices, src2, cur, rem, alive, u, u2, damping,
    stratified: bool = False,
    first_hop=False,
):
    """One hop of the work-stealing cohort (shared stepping code of both
    engines — the PRNG draws ``u``/``u2`` are supplied by the caller).

    ``stratified`` recovers the quality effect of the reference's rotating
    successor index (include/mccompletepathv2.h:142-151, thesis p.7: up to
    +5% precision at low walk counts): on the FIRST hop — the only hop
    where the whole cohort row is co-located, at its shared source — slots
    take evenly spaced successors instead of independent draws.  One
    uniform draw is shared per source row (``u[..., :1]``) and each slot
    offsets it by its index modulo the local out-degree; marginally each
    choice stays uniform, jointly the cohort covers the source's successor
    set with stratified-sampling variance.  Later hops (and pool walks
    restarted by work stealing mid-loop) use independent draws: slots are
    then at *different* nodes, where a shared base draw would correlate
    unrelated walkers without any coverage benefit.  ``first_hop`` is a
    traced bool (scalar or broadcastable) marking those hops.

    Returns (visit, stepping, cur, rem, alive): ``visit[c, s]`` is the node
    stepped to (undefined where ``stepping`` is False — callers mask it).
    """
    pd = start_deg[cur]
    start, deg = pd[..., 0], pd[..., 1]
    # a slot steps iff its walk is live and not stranded at a dangling node
    stepping = alive & (deg > 0)
    j = jnp.minimum(
        (u * deg.astype(jnp.float32)).astype(jnp.int32),
        jnp.maximum(deg - 1, 0),
    )
    if stratified:
        slots = jnp.arange(u.shape[-1], dtype=jnp.int32)[None, :]
        base = (u[..., :1] * deg.astype(jnp.float32)).astype(jnp.int32)
        j_strat = (base + slots) % jnp.maximum(deg, 1)
        j = jnp.where(first_hop, j_strat, j)
    nxt = indices[jnp.clip(start + j, 0, indices.shape[0] - 1)]
    # geometric continuation: keep walking while u2 <= damping; stranding
    # (deg == 0) also ends the walk (mccompletepathv2.h:142-155)
    walk_ends = alive & (((deg > 0) & (u2 > damping)) | (deg == 0))
    # work stealing: each ending slot claims one unstarted walk from the
    # source's shared pool, in slot order (cumsum = claim rank; its last
    # column is the total ender count — no separate reduce)
    claim_rank = jnp.cumsum(walk_ends.astype(jnp.int32), axis=1)
    restart = walk_ends & (claim_rank <= rem[:, None])
    rem = jnp.maximum(rem - claim_rank[:, -1], 0)
    alive = (alive & ~walk_ends) | restart
    cur = jnp.where(stepping & ~walk_ends, nxt, src2)
    return nxt, stepping, cur, rem, alive


@functools.partial(
    jax.jit, static_argnames=("num_nodes", "slots", "max_steps", "unroll", "stratified")
)
def walk_counts_chunk(
    start_deg: jax.Array,  # int32[n, 2]: (indptr[v], out_degree[v]) packed
    indices: jax.Array,
    sources: jax.Array,  # int32[C]
    key: jax.Array,
    damping: jax.Array,
    r_total: jax.Array,  # original R (for the count normalisation)
    total: jax.Array,  # int32: floor(R * damping) walks per source
    num_nodes: int,
    slots: int,
    max_steps: int,
    unroll: int = 32,
    stratified: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Normalized visit counts ``float32[C, num_nodes]`` for a source chunk,
    plus ``abandoned int32[C]`` — walks cut off by the step horizon (walks
    still running at loop exit + never-started pool remainder).  The
    reference's do-while never truncates (mccompletepathv2.h:142-155); this
    counter makes the sub-percent truncation claim verifiable per run.

    ``unroll`` hops advance per loop body with their visits batched into ONE
    scatter-add: TPU scatters have a large fixed per-dispatch cost, so
    batching ``unroll * C * slots`` updates amortizes it.
    """
    c = sources.shape[0]
    n = num_nodes
    # counts has a dead column at n for masked scatters.
    counts = jnp.zeros((c, n + 1), dtype=jnp.float32)
    # every walk counts its source once, using the *original* walk count
    # (mccompletepathv2.h:124: res[node] = walks, before thinning).
    counts = counts.at[jnp.arange(c), sources].add(r_total.astype(jnp.float32))
    abandoned = jnp.zeros((c,), dtype=jnp.int32)

    # With no edges every walk dies at its (dangling) source immediately;
    # skip the loop (a gather from a 0-length indices array cannot be traced).
    if slots > 0 and indices.shape[0] > 0:
        src2, cur0, rem0, alive0 = _cohort_init(
            start_deg, sources, total, slots
        )
        rows = jnp.broadcast_to(jnp.arange(c)[:, None], (c, slots))
        rows_cat = jnp.tile(rows.reshape(-1), unroll)

        def cond(state):
            step, _, _, alive, _ = state
            return (step < max_steps) & jnp.any(alive)

        def body(state):
            step, cur, rem, alive, acc = state
            # ONE batched threefry per macro step for all unroll hops
            k_macro = jax.random.fold_in(key, step)
            k_choice, k_cont = jax.random.split(k_macro)
            u_all = jax.random.uniform(k_choice, (unroll, c, slots))
            u2_all = jax.random.uniform(k_cont, (unroll, c, slots))
            tgts = []
            vals = []
            for hop in range(unroll):
                first = (step == 0) if hop == 0 else False
                nxt, stepping, cur, rem, alive = _cohort_hop(
                    start_deg, indices, src2, cur, rem, alive,
                    u_all[hop], u2_all[hop], damping, stratified=stratified,
                    first_hop=first,
                )
                # idle slots deposit 0 into the dead column
                tgts.append(jnp.where(stepping, nxt, n).reshape(-1))
                vals.append(stepping.reshape(-1))
            acc = acc.at[rows_cat, jnp.concatenate(tgts)].add(
                jnp.concatenate(vals).astype(jnp.float32)
            )
            return step + 1, cur, rem, alive, acc

        _, _, rem_f, alive_f, counts = jax.lax.while_loop(
            cond, body, (jnp.int32(0), cur0, rem0, alive0, counts)
        )
        # walks abandoned at the horizon: still-running slots + unstarted
        # pool (rem can only be nonzero if the step cap ended the loop).
        abandoned = jnp.sum(alive_f, axis=1).astype(jnp.int32) + rem_f

    counts = counts[:, :n] / jnp.maximum(r_total.astype(jnp.float32), 1.0)
    return counts, abandoned


@functools.partial(
    jax.jit, static_argnames=("slots", "macro_steps", "unroll", "stratified")
)
def walk_trace_chunk(
    start_deg: jax.Array,  # int32[n, 2]: (indptr[v], out_degree[v]) packed
    indices: jax.Array,
    sources: jax.Array,  # int32[C]
    key: jax.Array,
    damping: jax.Array,
    total: jax.Array,  # int32: floor(R * damping) walks per source
    slots: int,
    macro_steps: int,
    unroll: int,
    stratified: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Visit trace ``int32[C, macro_steps*unroll*slots]`` for a source chunk,
    plus ``abandoned int32[C]`` walks cut off by the step horizon (see
    :func:`walk_counts_chunk`).

    The scale-path twin of :func:`walk_counts_chunk`: the stepping logic and
    PRNG stream are IDENTICAL (shared :func:`_cohort_hop` — the two engines
    produce bitwise-equal visit multisets for equal arguments), but instead
    of scatter-adding into an O(N)-per-source count row, each hop's
    destination is *recorded* into a dense trace column.  Counting happens
    in one sort + run-length pass (:func:`_trace_topl`), so per-source
    memory is O(steps), independent of the graph size.

    Idle slots record SENTINEL.  A block of ``unroll`` hops is written with
    one dynamic-slice store per loop body — no scatters anywhere.
    """
    c = sources.shape[0]
    width = macro_steps * unroll * slots
    trace = jnp.full((c, width), SENTINEL, dtype=jnp.int32)
    if slots == 0 or indices.shape[0] == 0:
        return trace, jnp.zeros((c,), dtype=jnp.int32)

    src2, cur0, rem0, alive0 = _cohort_init(start_deg, sources, total, slots)

    def cond(state):
        step, _, _, alive, _ = state
        return (step < macro_steps) & jnp.any(alive)

    def body(state):
        step, cur, rem, alive, trace = state
        k_macro = jax.random.fold_in(key, step)
        k_choice, k_cont = jax.random.split(k_macro)
        u_all = jax.random.uniform(k_choice, (unroll, c, slots))
        u2_all = jax.random.uniform(k_cont, (unroll, c, slots))
        visits = []
        for hop in range(unroll):
            first = (step == 0) if hop == 0 else False
            nxt, stepping, cur, rem, alive = _cohort_hop(
                start_deg, indices, src2, cur, rem, alive,
                u_all[hop], u2_all[hop], damping, stratified=stratified,
                first_hop=first,
            )
            visits.append(jnp.where(stepping, nxt, SENTINEL))
        block = jnp.concatenate(visits, axis=-1)  # [C, unroll*slots]
        trace = jax.lax.dynamic_update_slice(
            trace, block, (0, step * (unroll * slots))
        )
        return step + 1, cur, rem, alive, trace

    _, _, rem_f, alive_f, trace = jax.lax.while_loop(
        cond, body, (jnp.int32(0), cur0, rem0, alive0, trace)
    )
    abandoned = jnp.sum(alive_f, axis=1).astype(jnp.int32) + rem_f
    return trace, abandoned


@functools.partial(jax.jit, static_argnames=("L", "row_chunk", "algo"))
def _trace_topl(
    trace: jax.Array,  # int32[C, W]
    sources: jax.Array,  # int32[C]
    r_total: jax.Array,
    L: int,
    row_chunk: int,
    algo: str | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Normalized top-L count baskets from a visit trace.

    Appends the source seed (count R — every walk counts its source once,
    mccompletepathv2.h:124) as one extra column, then per row: sort by id,
    collapse runs (run length == visit count), top-L, divide by R
    (mccompletepathv2.h:158-160).  Rows are processed in ``row_chunk``
    batches under lax.map to bound sort temporaries.
    """
    from .merge import _merge_rows, resolve_merge_algo

    algo = resolve_merge_algo(algo)  # fused Pallas kernel on TPU
    c, w = trace.shape
    ids = jnp.concatenate([trace, sources[:, None].astype(jnp.int32)], axis=1)
    scores = jnp.concatenate(
        [
            (trace >= 0).astype(jnp.float32),
            jnp.broadcast_to(
                r_total.astype(jnp.float32), (c,)
            )[:, None],
        ],
        axis=1,
    )
    n_chunks = -(-c // row_chunk)
    pad = n_chunks * row_chunk - c
    if pad:
        ids = jnp.pad(ids, ((0, pad), (0, 0)), constant_values=SENTINEL)
        scores = jnp.pad(scores, ((0, pad), (0, 0)))

    def one(args):
        i, s = args
        out = _merge_rows(i, s, L, algo)
        return out.ids, out.scores

    if n_chunks == 1:
        out_ids, out_scores = one((ids, scores))
    else:
        out_ids, out_scores = jax.lax.map(
            one,
            (
                ids.reshape(n_chunks, row_chunk, w + 1),
                scores.reshape(n_chunks, row_chunk, w + 1),
            ),
        )
        out_ids = out_ids.reshape(n_chunks * row_chunk, L)
        out_scores = out_scores.reshape(n_chunks * row_chunk, L)
    if pad:
        out_ids = out_ids[:c]
        out_scores = out_scores[:c]
    return out_ids, out_scores / jnp.maximum(r_total.astype(jnp.float32), 1.0)


def _horizon(total: int, slots: int, damping: float, sigmas: float = 1.5) -> int:
    """Step cap for a cohort: mean + ``sigmas``·std of a slot's share of the
    pool (ceil(total/slots) geometric walks back-to-back).

    With work stealing the slots drain the shared pool in balance, so this
    per-slot bound is conservative; the while_loop usually exits earlier
    (when every walk is finished), and on stranding-heavy graphs much
    earlier.  Walks abandoned at the horizon are a sub-percent worst-case
    fraction, far below the Monte-Carlo noise floor of ~1/sqrt(R) (the
    reference's ``iterations`` is itself only a worst-case walk count,
    include/mccompletepathv2.h:186).
    """
    if damping <= 0:
        return 1
    if damping >= 1:
        return 10_000
    q = -(-total // max(slots, 1))
    mean = q / (1.0 - damping)
    std = math.sqrt(q * damping) / (1.0 - damping)
    return max(4, int(math.ceil(mean + sigmas * std)) + 8)


def _pick_slots(total: int, damping: float, unroll: int) -> int:
    """Slot count minimizing the trace engine's pow2-padded merge width.

    The trace row is ``macro*unroll*slots`` wide plus ONE source column, and
    the merge network pads to the next power of two — at R=200 the naive 16
    slots give 4*32*16+1 = 2049 -> a 4096-wide Mosaic kernel whose compile
    (and per-process load on the remote backend) costs ~4x the 2048 one the
    same horizon fits with 15 slots.  Searched at plan time (host, trivial);
    shared by BOTH engines so trace and counts keep drawing identical PRNG
    streams (the bitwise cross-check in tests/test_walk.py).
    """
    cap = int(min(16, max(total, 1)))
    best, best_key = cap, None
    for slots in range(cap, max(cap - 9, 0), -1):
        steps = _horizon(total, slots, damping)
        macro = -(-steps // max(unroll, 1))
        width = macro * unroll * slots
        padded = 1 << width.bit_length()  # next_pow2(width + 1)
        # prefer the narrowest padded kernel, then the most parallel slots
        # (raw width is padded away anyway; fewer slots only deepens the
        # sequential stepping loop)
        key = (padded, -slots, width)
        if best_key is None or key < best_key:
            best, best_key = slots, key
    return best


def _walk_plan(
    n: int,
    iterations: int,
    damping: float,
    source_chunk: int | None,
    max_steps: int | None,
    slots: int | None,
    unroll: int = 32,
):
    """Host-side cohort sizing for the counts engine: (chunk, slots, total,
    step cap)."""
    total = int(iterations * damping)  # floor(R * damping) thinned walks
    if slots is None:
        # With work stealing more slots only add parallelism (no straggler
        # tax); the picker keeps the sibling trace engine's merge kernel at
        # the narrowest power-of-two width the horizon fits.
        slots = _pick_slots(total, damping, unroll)
    slots = max(1, min(slots, max(total, 1)))
    if max_steps is None:
        max_steps = _horizon(total, slots, damping)
    if source_chunk is None:
        # bound the [C, n+1] count buffer at ~96M elements (~380MB): with
        # work-stealing slots the bigger cohort wins (Eat: 3.78s -> 3.42s at
        # C=4096 vs 1038), and 4096 caps the top-k/scatter row count.
        source_chunk = int(max(8, min(4096, (96 << 20) // max(n, 1))))
    source_chunk = min(source_chunk, max(n, 1))
    return source_chunk, slots, total, max_steps


def _trace_plan(
    iterations: int,
    damping: float,
    source_chunk: int | None,
    slots: int | None,
    unroll: int,
    num_nodes: int | None = None,
):
    """Host-side cohort sizing for the trace engine: (chunk, slots, total,
    macro_steps, trace width).  The trace buffer is capped at ~64M int32
    (~256MB); the chunk adapts to the per-source trace width.

    Small graphs get small chunks: a chunk's while_loop runs until its
    SLOWEST source row exhausts its walk quota, so chunking limits how many
    rows idle behind a straggler hub.  Measured on Eat (23k nodes, R=1000):
    0.97 s at chunk 512 vs 1.30 s at the 32MB-derived 5461.  At 1M nodes
    512 and 8192 tie in device time, so past 64k nodes the cap instead
    MINIMIZES HOST DISPATCHES: each chunk is one execute RPC through the
    (possibly remote) runtime, and at 4.8M nodes the difference between
    586 chunks (cap 8192) and 147 (cap 32768) was the dominant wall-clock
    noise in driver runs over a 3-46 MB/s tunnel.
    """
    total = int(iterations * damping)
    if slots is None:
        slots = _pick_slots(total, damping, unroll)
    slots = max(1, min(slots, max(total, 1)))
    max_steps = _horizon(total, slots, damping)
    macro_steps = -(-max_steps // max(unroll, 1))
    width = macro_steps * unroll * slots
    if source_chunk is None:
        cap = 512 if (num_nodes is not None and num_nodes <= 65536) else 32768
        source_chunk = int(max(8, min(cap, (64 << 20) // max(width, 1))))
    return source_chunk, slots, total, macro_steps, width


def walk_trace_basket_chunks(
    graph,
    L: int,
    iterations: int,
    damping: float,
    seed: int | None = None,
    source_chunk: int | None = None,
    slots: int | None = None,
    unroll: int = 32,
    mesh=None,
    stratified: bool = False,
):
    """Yield ``(start_row, Baskets, visits, abandoned)`` normalized top-L
    walk baskets per source chunk using the O(N)-independent trace engine.
    ``abandoned`` counts walks cut off by the step horizon in this chunk.

    With ``mesh`` the chunk's sources (and therefore the walker cohort, the
    trace buffer, and the counting sort) are row-sharded across the mesh
    while the CSR stays replicated — pure data parallelism over sources,
    the natural scale-out for Monte-Carlo walks (each source's walks are
    independent).  Results are bitwise-identical to the unsharded engine.
    """
    from ..models.common import device_graph

    n = graph.num_nodes
    dg = device_graph(graph)
    start_deg = jnp.stack(
        [dg.indptr[:-1].astype(jnp.int32), dg.out_degree.astype(jnp.int32)],
        axis=-1,
    )
    source_chunk, slots, total, macro_steps, width = _trace_plan(
        iterations, damping, source_chunk, slots, unroll, num_nodes=n
    )
    source_chunk = min(source_chunk, max(n, 1))
    source_sharding = None
    if mesh is not None:
        from ..parallel.mesh import replicated, row_sharding

        d = mesh.devices.size
        source_chunk = -(-source_chunk // d) * d  # divisible by mesh size
        source_sharding = row_sharding(mesh)
        rep = replicated(mesh)
        start_deg = jax.device_put(start_deg, rep)
        indices = jax.device_put(dg.indices, rep)
        # reshape across the sharded row dim breaks GSPMD; one map chunk
        row_chunk = source_chunk
    else:
        indices = dg.indices
        # Clamp at the actual row count (a larger row_chunk would PAD rows
        # up to it — at Eat that minted a 585-row kernel program where the
        # natural 512-row one exists) and keep a multiple of the kernel's
        # 8-row sublane tile so Mosaic never sees a ragged final tile.
        row_chunk = int(
            max(1, min(source_chunk, (1 << 22) // max(width + 1, 1)))
        )
        if row_chunk >= 8:
            row_chunk -= row_chunk % 8
        # _trace_topl maps the merge kernel over ceil(chunk/row_chunk)
        # segments; keep that map within the v5e kernel-fault guard
        # (ops/merge.py MAX_MAP_CHUNKS — mapped Pallas loops >= ~25
        # iterations fault the worker; 16 holds a 1.5x margin).
        from .merge import MAX_MAP_CHUNKS

        source_chunk = min(source_chunk, MAX_MAP_CHUNKS * row_chunk)
    if seed is None:
        seed = int(np.random.SeedSequence().entropy % (2**31))
    root = jax.random.PRNGKey(seed)
    damping_d = jnp.float32(damping)
    r_total = jnp.float32(iterations)
    total_d = jnp.int32(total)
    for s in range(0, n, source_chunk):
        chunk_sources = np.arange(s, min(s + source_chunk, n), dtype=np.int32)
        pad = source_chunk - chunk_sources.size
        padded = np.pad(chunk_sources, (0, pad), constant_values=0)
        padded_d = jnp.asarray(padded)
        if source_sharding is not None:
            padded_d = jax.device_put(padded_d, source_sharding)
        trace, abandoned = walk_trace_chunk(
            start_deg,
            indices,
            padded_d,
            jax.random.fold_in(root, s),
            damping_d,
            total_d,
            slots,
            macro_steps,
            unroll,
            stratified=stratified,
        )
        # pad rows re-walk source 0; exclude them from the counters
        visits = jnp.sum(trace[: chunk_sources.size] >= 0)
        abandoned = jnp.sum(abandoned[: chunk_sources.size])
        ids, scores = _trace_topl(trace, padded_d, r_total, L, row_chunk)
        yield s, Baskets(
            ids[: chunk_sources.size], scores[: chunk_sources.size]
        ), visits, abandoned


def walk_count_chunks(
    graph,
    iterations: int,
    damping: float,
    seed: int | None = None,
    source_chunk: int | None = None,
    max_steps: int | None = None,
    slots: int | None = None,
    unroll: int = 32,
    stratified: bool = False,
):
    """Yield ``(start_row, counts[f32 C, N], abandoned)`` normalized
    visit-count chunks covering all sources (the last chunk may include
    padded rows; the caller slices with the returned start and the graph
    size).  ``abandoned`` counts horizon-truncated walks in this chunk."""
    from ..models.common import device_graph

    n = graph.num_nodes
    dg = device_graph(graph)
    start_deg = jnp.stack(
        [dg.indptr[:-1].astype(jnp.int32), dg.out_degree.astype(jnp.int32)],
        axis=-1,
    )
    source_chunk, slots, total, max_steps = _walk_plan(
        n, iterations, damping, source_chunk, max_steps, slots
    )
    macro_steps = -(-max_steps // max(unroll, 1))
    if seed is None:
        seed = int(np.random.SeedSequence().entropy % (2**31))
    root = jax.random.PRNGKey(seed)
    damping_d = jnp.float32(damping)
    r_total = jnp.float32(iterations)
    total_d = jnp.int32(total)
    for s in range(0, n, source_chunk):
        chunk_sources = np.arange(s, min(s + source_chunk, n), dtype=np.int32)
        # pad to the chunk size so every chunk compiles once
        pad = source_chunk - chunk_sources.size
        padded = np.pad(chunk_sources, (0, pad), constant_values=0)
        counts, abandoned = walk_counts_chunk(
            start_deg,
            dg.indices,
            jnp.asarray(padded),
            jax.random.fold_in(root, s),
            damping_d,
            r_total,
            total_d,
            n,
            slots,
            macro_steps,
            unroll,
            stratified=stratified,
        )
        yield s, counts[: chunk_sources.size], jnp.sum(
            abandoned[: chunk_sources.size]
        )


def walk_baskets(
    graph,
    L: int,
    iterations: int,
    damping: float,
    seed: int | None = None,
    source_chunk: int | None = None,
    max_steps: int | None = None,
    slots: int | None = None,
    return_info: bool = False,
    engine: str = "auto",
    mesh=None,
    stratified: bool = False,
) -> Baskets:
    """Top-L walk baskets ``[N, L]`` for every node of the graph.

    ``iterations`` is R, the worst-case walks per node, matching the meaning
    of the reference's parameter (include/mccompletepathv2.h:186).
    ``return_info=True`` additionally returns ``{"walk_steps": v,
    "abandoned_walks": a, "total_walks": t}`` — hops that deposited a visit
    (measured from the actual visit counts), walks cut off by the step
    horizon, and the total walks launched (``floor(R*damping)`` per
    non-dangling source; the reference's do-while never truncates,
    mccompletepathv2.h:142-155, so ``abandoned/total`` is the divergence).

    ``engine``: ``"trace"`` (the default) records visit ids and counts them
    by sort — memory independent of N; ``"counts"`` scatter-adds into dense
    ``[C, N]`` count rows.  Measured on v5e (round 4, R=1000): trace beats
    counts at EVERY size — 0.20 vs 0.32 s at 2k nodes, 0.76 vs 1.29 s at
    8k, 1.50 vs 2.82 s at 16k, 1.30 vs 2.71 s on Eat (23k) — because the
    per-macro-step scatter-add into the [C, N] buffer costs more than the
    trace's sequential writes + one counting sort.  Both engines draw the
    same PRNG stream and produce identical visit multisets for equal
    (seed, slots, unroll).
    """
    n = graph.num_nodes
    if mesh is not None:
        engine = "trace"  # source-sharded walks use the trace engine
    if engine == "auto":
        engine = "trace"
    if engine not in ("counts", "trace"):
        raise ValueError(f"unknown walk engine {engine!r}")
    ids_parts, score_parts = [], []
    # Per-chunk counters stay ON DEVICE until one stack+transfer at the end:
    # a float()/int() per chunk is a host round-trip each (46 chunks on Eat,
    # 587 at the 4.8M north star), and over a remote-TPU tunnel those
    # blocking syncs also stop the host from queueing the next chunk's
    # dispatch — the dominant wall-clock distortion in the driver artifact.
    visit_parts, abandoned_parts = [], []
    if engine == "trace":
        for s, top, v, a in walk_trace_basket_chunks(
            graph, L, iterations, damping, seed=seed,
            source_chunk=source_chunk, slots=slots, mesh=mesh,
            stratified=stratified,
        ):
            if return_info:
                visit_parts.append(jnp.asarray(v, jnp.float32))
                abandoned_parts.append(a)
            ids_parts.append(top.ids)
            score_parts.append(top.scores)
    else:
        for s, counts, a in walk_count_chunks(
            graph, iterations, damping, seed=seed, source_chunk=source_chunk,
            max_steps=max_steps, slots=slots, stratified=stratified,
        ):
            if return_info:
                visit_parts.append(
                    (jnp.sum(counts) - counts.shape[0]) * iterations
                )
                abandoned_parts.append(a)
            ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), counts.shape)
            ids = jnp.where(counts > 0, ids, -1)
            top = keep_top(ids, counts, min(L, n) if n > 0 else L)
            if top.width < L:
                top = Baskets(
                    jnp.pad(
                        top.ids, ((0, 0), (0, L - top.width)), constant_values=-1
                    ),
                    jnp.pad(top.scores, ((0, 0), (0, L - top.width))),
                )
            ids_parts.append(top.ids)
            score_parts.append(top.scores)

    if not ids_parts:
        from .basket import empty_baskets

        out = empty_baskets(0, L)
        info = {"walk_steps": 0, "abandoned_walks": 0, "total_walks": 0}
        return (out, info) if return_info else out
    baskets = Baskets(
        jnp.concatenate(ids_parts, axis=0),
        jnp.concatenate(score_parts, axis=0),
    )
    # dangling sources: exactly {v: 1.0} (mccompletepathv2.h:162-163) — the
    # count normalisation above already yields that, since their only count
    # is R at the source itself.
    if return_info:
        # ONE host transfer for all per-chunk counters (see note above).
        visits = float(np.sum(np.asarray(jnp.stack(visit_parts), np.float64)))
        abandoned = int(np.asarray(jnp.stack(abandoned_parts)).sum())
        total = int(iterations * damping) * int((graph.out_degree > 0).sum())
        return baskets, {
            "walk_steps": int(round(visits)),
            "abandoned_walks": abandoned,
            "total_walks": total,
        }
    return baskets
