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
    jax.jit, static_argnames=("num_nodes", "walkers", "max_steps")
)
def walk_counts_chunk(
    indptr: jax.Array,
    indices: jax.Array,
    out_degree: jax.Array,
    sources: jax.Array,  # int32[C]
    key: jax.Array,
    damping: jax.Array,
    r_total: jax.Array,  # original R (for the count normalisation)
    num_nodes: int,
    walkers: int,  # floor(R * damping)
    max_steps: int,
) -> jax.Array:
    """Normalized visit counts ``float32[C, num_nodes]`` for a source chunk."""
    c = sources.shape[0]
    n = num_nodes
    # counts has a dead column at n for masked scatters.
    counts = jnp.zeros((c, n + 1), dtype=jnp.float32)
    # every walk counts its source once, using the *original* walk count
    # (mccompletepathv2.h:124: res[node] = walks, before thinning).
    counts = counts.at[jnp.arange(c), sources].add(r_total.astype(jnp.float32))

    # With no edges every walker dies at its (dangling) source immediately;
    # skip the loop (a gather from a 0-length indices array cannot be traced).
    if walkers > 0 and indices.shape[0] > 0:
        cur0 = jnp.broadcast_to(sources[:, None], (c, walkers)).astype(jnp.int32)
        alive0 = jnp.ones((c, walkers), dtype=bool)
        rows = jnp.broadcast_to(jnp.arange(c)[:, None], (c, walkers))

        def cond(state):
            step, _, alive, _ = state
            return (step < max_steps) & jnp.any(alive)

        def body(state):
            step, cur, alive, acc = state
            k_step = jax.random.fold_in(key, step)
            k_choice, k_cont = jax.random.split(k_step)
            deg = out_degree[cur]
            alive = alive & (deg > 0)  # die at dangling nodes before stepping
            u = jax.random.uniform(k_choice, (c, walkers))
            j = jnp.minimum(
                (u * deg.astype(jnp.float32)).astype(jnp.int32),
                jnp.maximum(deg - 1, 0),
            )
            nxt = indices[
                jnp.clip(indptr[cur] + j, 0, indices.shape[0] - 1)
            ]
            nxt = jnp.where(alive, nxt, cur)
            # count the visit (masked scatter into the dead column when dead)
            tgt = jnp.where(alive, nxt, n)
            acc = acc.at[rows, tgt].add(1.0)
            # geometric continuation: keep walking while u <= damping
            u2 = jax.random.uniform(k_cont, (c, walkers))
            alive = alive & (u2 <= damping)
            return step + 1, nxt, alive, acc

        _, _, _, counts = jax.lax.while_loop(
            cond, body, (jnp.int32(0), cur0, alive0, counts)
        )

    counts = counts[:, :n] / jnp.maximum(r_total.astype(jnp.float32), 1.0)
    return counts


def walk_baskets(
    graph,
    L: int,
    iterations: int,
    damping: float,
    seed: int | None = None,
    source_chunk: int | None = None,
    max_steps: int | None = None,
) -> Baskets:
    """Top-L walk baskets ``[N, L]`` for every node of the graph.

    ``iterations`` is R, the worst-case walks per node, matching the meaning
    of the reference's parameter (include/mccompletepathv2.h:186).
    """
    from ..models.common import device_graph

    n = graph.num_nodes
    dg = device_graph(graph)
    if max_steps is None:
        max_steps = default_max_steps(damping)
    walkers = int(iterations * damping)
    if source_chunk is None:
        # ~128MB of count buffer per chunk, never wider than the graph.
        source_chunk = int(max(8, min(4096, (32 << 20) // max(n, 1))))
    source_chunk = min(source_chunk, max(n, 1))
    if seed is None:
        seed = int(np.random.SeedSequence().entropy % (2**31))
    root = jax.random.PRNGKey(seed)

    ids_parts, score_parts = [], []
    damping_d = jnp.float32(damping)
    r_total = jnp.float32(iterations)
    for s in range(0, n, source_chunk):
        chunk_sources = np.arange(s, min(s + source_chunk, n), dtype=np.int32)
        # pad to the chunk size so every chunk compiles once
        pad = source_chunk - chunk_sources.size
        padded = np.pad(chunk_sources, (0, pad), constant_values=0)
        counts = walk_counts_chunk(
            dg.indptr,
            dg.indices,
            dg.out_degree,
            jnp.asarray(padded),
            jax.random.fold_in(root, s),
            damping_d,
            r_total,
            n,
            walkers,
            max_steps,
        )
        ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), counts.shape)
        ids = jnp.where(counts > 0, ids, -1)
        top = keep_top(ids, counts, min(L, n) if n > 0 else L)
        if top.width < L:
            top = Baskets(
                jnp.pad(top.ids, ((0, 0), (0, L - top.width)), constant_values=-1),
                jnp.pad(top.scores, ((0, 0), (0, L - top.width))),
            )
        ids_parts.append(top.ids[: chunk_sources.size])
        score_parts.append(top.scores[: chunk_sources.size])

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
