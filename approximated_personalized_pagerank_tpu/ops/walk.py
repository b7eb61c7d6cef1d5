"""Vectorized Monte-Carlo random walks: the TPU-native form of ``walkNode``.

Reference: include/mccompletepathv2.h:115-165.  There, each node lazily runs
``R`` serial walks with a shared rotating successor index; here **all sources
walk at once**: a ``[C, W]`` cohort of walkers (C sources x W walkers each)
advances one hop per step, with

* the first edge always taken and the teleport-before-first-edge accounted by
  thinning the cohort to ``floor(R * damping)`` walkers up front
  (mccompletepathv2.h:127-132);
* per-step geometric continuation draws (``u <= damping``,
  mccompletepathv2.h:155) from counter-based PRNG (jax.random / threefry)
  instead of the module-level mt19937 (mccompletepathv2.h:32-34);
* uniform random successor choice instead of the serial rotating index — the
  rotating index is a serial-determinism trick worth <=5% precision at low
  walk counts (thesis p.7); walk-count parity compensates;
* visit counts accumulated densely per source row, then truncated to the
  top-L — a superset of the reference's in-walk L-cap
  (mccompletepathv2.h:152-153), which is a memory optimisation that *drops*
  visits once a basket is full.

Counts are divided by the original ``R`` (mccompletepathv2.h:158-160);
dangling sources yield ``{v: 1.0}`` (mccompletepathv2.h:162-163).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .basket import Baskets, keep_top

__all__ = ["walk_counts_chunk", "walk_baskets", "default_max_steps"]


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


@functools.partial(
    jax.jit, static_argnames=("num_nodes", "slots", "max_steps", "unroll")
)
def walk_counts_chunk(
    start_deg: jax.Array,  # int32[n, 2]: (indptr[v], out_degree[v]) packed
    indices: jax.Array,
    sources: jax.Array,  # int32[C]
    key: jax.Array,
    damping: jax.Array,
    r_total: jax.Array,  # original R (for the count normalisation)
    quota: jax.Array,  # int32[slots]: walks per slot, sums to floor(R*damping)
    num_nodes: int,
    slots: int,
    max_steps: int,
    unroll: int = 32,
) -> jax.Array:
    """Normalized visit counts ``float32[C, num_nodes]`` for a source chunk.

    Quota-slot cohort: each source gets ``slots`` persistent walker slots;
    a slot runs its ``quota`` walks back-to-back (a finished walk immediately
    restarts at the source), so scatter bandwidth is not wasted on dead
    walkers — the reference's cohort-free serial loop (mccompletepathv2.h:
    142-155) has the same property.  Every walk takes at least one step (the
    teleport before the first edge is pre-accounted by the floor(R*damping)
    total quota, mccompletepathv2.h:127-132); per-step continuation draws
    ``u <= damping`` (mccompletepathv2.h:155).

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

    # With no edges every walk dies at its (dangling) source immediately;
    # skip the loop (a gather from a 0-length indices array cannot be traced).
    if slots > 0 and indices.shape[0] > 0:
        src2 = jnp.broadcast_to(sources[:, None], (c, slots)).astype(jnp.int32)
        cur0 = src2
        rem0 = jnp.broadcast_to(quota[None, :], (c, slots)).astype(jnp.int32)
        # a dangling source's walks all die on their first step without
        # counting anything, exactly like the reference's dangling shortcut
        # (mccompletepathv2.h:162-163); zero the quota up front instead.
        rem0 = jnp.where(start_deg[src2, 1] > 0, rem0, 0)
        rows = jnp.broadcast_to(jnp.arange(c)[:, None], (c, slots))
        rows_cat = jnp.tile(rows.reshape(-1), unroll)

        def cond(state):
            step, _, rem, _ = state
            return (step < max_steps) & jnp.any(rem > 0)

        def body(state):
            step, cur, rem, acc = state
            tgts = []
            vals = []
            for hop in range(unroll):
                k_step = jax.random.fold_in(key, step * unroll + hop)
                k_choice, k_cont = jax.random.split(k_step)
                pd = start_deg[cur]  # one gather for (row start, degree)
                start, deg = pd[..., 0], pd[..., 1]
                # a slot steps iff it still has walks and isn't stranded at
                # a dangling node (stranding ends the walk with no count)
                stepping = (rem > 0) & (deg > 0)
                u = jax.random.uniform(k_choice, (c, slots))
                j = jnp.minimum(
                    (u * deg.astype(jnp.float32)).astype(jnp.int32),
                    jnp.maximum(deg - 1, 0),
                )
                nxt = indices[
                    jnp.clip(start + j, 0, indices.shape[0] - 1)
                ]
                # idle slots deposit 0 into the dead column
                tgts.append(jnp.where(stepping, nxt, n).reshape(-1))
                vals.append(stepping.reshape(-1))
                # geometric continuation: keep walking while u <= damping; a
                # finished (or stranded) walk restarts the slot at its source
                u2 = jax.random.uniform(k_cont, (c, slots))
                walk_ends = (rem > 0) & (
                    ((deg > 0) & (u2 > damping)) | (deg == 0)
                )
                rem = jnp.where(walk_ends, rem - 1, rem)
                cur = jnp.where(stepping & ~walk_ends, nxt, src2)
            acc = acc.at[rows_cat, jnp.concatenate(tgts)].add(
                jnp.concatenate(vals).astype(jnp.float32)
            )
            return step + 1, cur, rem, acc

        _, _, _, counts = jax.lax.while_loop(
            cond, body, (jnp.int32(0), cur0, rem0, counts)
        )

    counts = counts[:, :n] / jnp.maximum(r_total.astype(jnp.float32), 1.0)
    return counts


def _quota(total: int, slots: int) -> np.ndarray:
    base, rem = divmod(total, slots)
    q = np.full(slots, base, dtype=np.int32)
    q[:rem] += 1
    return q


def _horizon(total: int, slots: int, damping: float, sigmas: float = 1.5) -> int:
    """Step cap for a quota-slot cohort: mean + ``sigmas``·std of a slot's
    total step count (sum of quota geometric walk lengths).

    The while_loop exits when every quota is spent; this horizon bounds the
    straggler tail, abandoning a sub-percent fraction of the worst-case
    ``R`` walks (the stragglers' last walks) — far below the Monte-Carlo
    noise floor of ~1/sqrt(R), and the reference's ``iterations`` is itself
    only a worst-case walk count (include/mccompletepathv2.h:186).
    """
    if damping <= 0:
        return 1
    if damping >= 1:
        return 10_000
    q = -(-total // max(slots, 1))
    mean = q / (1.0 - damping)
    std = math.sqrt(q * damping) / (1.0 - damping)
    return max(4, int(math.ceil(mean + sigmas * std)) + 8)


def _walk_plan(
    n: int,
    iterations: int,
    damping: float,
    source_chunk: int | None,
    max_steps: int | None,
    slots: int | None,
):
    """Host-side cohort sizing: (chunk, slots, quota array, step cap)."""
    total = int(iterations * damping)  # floor(R * damping) thinned walks
    if slots is None:
        # Few slots with a high per-slot quota: a slot's total step count
        # concentrates around its mean as quota grows (std/mean ~ 1/sqrt(q)),
        # so the straggler horizon — and with it the scatter traffic of idle
        # slots — shrinks.  16 slots ≈ 80% utilization at R=1000 (measured
        # 1.8x faster than 128 slots on the Eat benchmark).
        slots = int(min(16, max(total, 1)))
    slots = max(1, min(slots, max(total, 1)))
    quota = _quota(total, slots)
    if max_steps is None:
        max_steps = _horizon(total, slots, damping)
    if source_chunk is None:
        # bound the [C, n+1] count buffer at ~24M elements (~96MB): measured
        # optimum for the visit scatter-add — larger buffers slow the random
        # writes, smaller ones under-fill the cohort — and cap the per-step
        # scatter cohort [C, slots] at ~512k updates.
        source_chunk = int(
            max(8, min(4096, (24 << 20) // max(n, 1), (1 << 19) // slots))
        )
    source_chunk = min(source_chunk, max(n, 1))
    return source_chunk, slots, quota, max_steps


def walk_count_chunks(
    graph,
    iterations: int,
    damping: float,
    seed: int | None = None,
    source_chunk: int | None = None,
    max_steps: int | None = None,
    slots: int | None = None,
    unroll: int = 32,
):
    """Yield ``(start_row, counts[f32 C, N])`` normalized visit-count chunks
    covering all sources (the last chunk may include padded rows; the caller
    slices with the returned start and the graph size)."""
    from ..models.common import device_graph

    n = graph.num_nodes
    dg = device_graph(graph)
    start_deg = jnp.stack(
        [dg.indptr[:-1].astype(jnp.int32), dg.out_degree.astype(jnp.int32)],
        axis=-1,
    )
    source_chunk, slots, quota, max_steps = _walk_plan(
        n, iterations, damping, source_chunk, max_steps, slots
    )
    macro_steps = -(-max_steps // max(unroll, 1))
    if seed is None:
        seed = int(np.random.SeedSequence().entropy % (2**31))
    root = jax.random.PRNGKey(seed)
    damping_d = jnp.float32(damping)
    r_total = jnp.float32(iterations)
    quota_d = jnp.asarray(quota)
    for s in range(0, n, source_chunk):
        chunk_sources = np.arange(s, min(s + source_chunk, n), dtype=np.int32)
        # pad to the chunk size so every chunk compiles once
        pad = source_chunk - chunk_sources.size
        padded = np.pad(chunk_sources, (0, pad), constant_values=0)
        counts = walk_counts_chunk(
            start_deg,
            dg.indices,
            jnp.asarray(padded),
            jax.random.fold_in(root, s),
            damping_d,
            r_total,
            quota_d,
            n,
            slots,
            macro_steps,
            unroll,
        )
        yield s, counts[: chunk_sources.size]


def walk_baskets(
    graph,
    L: int,
    iterations: int,
    damping: float,
    seed: int | None = None,
    source_chunk: int | None = None,
    max_steps: int | None = None,
    slots: int | None = None,
) -> Baskets:
    """Top-L walk baskets ``[N, L]`` for every node of the graph.

    ``iterations`` is R, the worst-case walks per node, matching the meaning
    of the reference's parameter (include/mccompletepathv2.h:186).
    """
    n = graph.num_nodes
    ids_parts, score_parts = [], []
    for s, counts in walk_count_chunks(
        graph, iterations, damping, seed=seed, source_chunk=source_chunk,
        max_steps=max_steps, slots=slots,
    ):
        ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), counts.shape)
        ids = jnp.where(counts > 0, ids, -1)
        top = keep_top(ids, counts, min(L, n) if n > 0 else L)
        if top.width < L:
            top = Baskets(
                jnp.pad(top.ids, ((0, 0), (0, L - top.width)), constant_values=-1),
                jnp.pad(top.scores, ((0, 0), (0, L - top.width))),
            )
        ids_parts.append(top.ids)
        score_parts.append(top.scores)

    if not ids_parts:
        from .basket import empty_baskets

        return empty_baskets(0, L)
    baskets = Baskets(
        jnp.concatenate(ids_parts, axis=0),
        jnp.concatenate(score_parts, axis=0),
    )
    # dangling sources: exactly {v: 1.0} (mccompletepathv2.h:162-163) — the
    # count normalisation above already yields that, since their only count
    # is R at the source itself.
    return baskets
