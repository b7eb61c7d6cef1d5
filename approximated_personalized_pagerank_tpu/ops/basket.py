"""Fixed-width basket arrays: the TPU-native replacement for the reference's
per-node ``unordered_map<Key, double>`` score maps.

A *basket set* over ``R`` rows with width ``W`` is a pair of arrays

* ``ids    : int32[R, W]``  — node ids, ``-1`` marking empty slots
* ``scores : float32[R, W]`` — scores (0 in empty slots)

All reference primitives over hash maps become batched row-wise array ops:

* ``keepTop`` (include/internal/pprInternal.h:110-137)  -> :func:`keep_top`
* duplicate-key merge (the += accumulation inside grank's hot loop,
  include/grank.h:114-115)                              -> :func:`combine_sorted_runs`
* ``norm1``  (include/internal/pprInternal.h:148-165)   -> :func:`norm1_rows`
* ``jaccard``(include/internal/pprInternal.h:174-186)   -> :func:`jaccard_rows`

Everything here is shape-static, jittable, and vmappable; ties in ``keep_top``
are broken arbitrarily exactly like ``std::nth_element`` in the reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

import numpy as np

SENTINEL = -1
# numpy scalar, NOT jnp: a module-level jnp constant would initialise the
# XLA backend at import time, which breaks jax.distributed.initialize
# (multi-host processes must init the cluster before first backend use).
NEG_INF = np.float32(-np.inf)


class Baskets(NamedTuple):
    """A batch of sparse top-score maps in dense-slot form."""

    ids: jax.Array  # int32[..., W]
    scores: jax.Array  # float32[..., W]

    @property
    def width(self) -> int:
        return self.ids.shape[-1]

    def sizes(self) -> jax.Array:
        """Number of live entries per row (== map.size() in the reference)."""
        return jnp.sum(self.ids >= 0, axis=-1)


def empty_baskets(num_rows: int, width: int) -> Baskets:
    return Baskets(
        ids=jnp.full((num_rows, width), SENTINEL, dtype=jnp.int32),
        scores=jnp.zeros((num_rows, width), dtype=jnp.float32),
    )


@jax.jit
def sort_rows_by_id(ids: jax.Array, scores: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Row-wise sort ascending by id, carrying scores (sentinels first)."""
    return jax.lax.sort((ids, scores), dimension=-1, num_keys=1)


@jax.jit
def combine_sorted_runs(
    ids: jax.Array, scores: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Sum duplicate ids within each row of an id-sorted candidate list.

    Input rows must be sorted ascending by id.  Returns (ids', totals) where
    each *run* of equal ids is collapsed onto its last slot: that slot holds
    the run's score sum and keeps its id; all other slots become sentinel
    (-1) with score 0.  Sentinel-id runs stay sentinel.

    This is the batched equivalent of the reference's ``currentMap[k] += ...``
    accumulation (include/grank.h:114-115), done with an O(log W) segmented
    prefix instead of a hash table.
    """
    w = ids.shape[-1]
    csum = jnp.cumsum(scores.astype(jnp.float32), axis=-1)
    prev_ids = jnp.concatenate(
        [jnp.full(ids.shape[:-1] + (1,), -2, dtype=ids.dtype), ids[..., :-1]],
        axis=-1,
    )
    is_start = ids != prev_ids
    pos = jax.lax.broadcasted_iota(jnp.int32, ids.shape, ids.ndim - 1)
    # Index of the run start governing each slot: running max of start marks.
    # Manual log-step doubling (lax.associative_scan compiles pathologically
    # slowly for this pattern; this emits ~log2(W) pad+max ops instead).
    start_idx = jnp.where(is_start, pos, -1)
    shift = 1
    while shift < w:
        pad_cfg = [(0, 0)] * (ids.ndim - 1) + [(shift, 0)]
        shifted = jnp.pad(start_idx, pad_cfg, constant_values=-1)[..., :w]
        start_idx = jnp.maximum(start_idx, shifted)
        shift *= 2
    excl = csum - scores  # exclusive prefix sum
    excl_at_start = jnp.take_along_axis(excl, start_idx, axis=-1)
    run_total = csum - excl_at_start
    next_ids = jnp.concatenate(
        [ids[..., 1:], jnp.full(ids.shape[:-1] + (1,), -2, dtype=ids.dtype)],
        axis=-1,
    )
    is_end = ids != next_ids
    live = is_end & (ids >= 0)
    out_ids = jnp.where(live, ids, SENTINEL)
    out_scores = jnp.where(live, run_total, 0.0)
    return out_ids, out_scores


@functools.partial(jax.jit, static_argnames="k")
def keep_top(ids: jax.Array, scores: jax.Array, k: int) -> Baskets:
    """Row-wise top-k by score over live entries; ties arbitrary.

    Matches ``keepTop`` (include/internal/pprInternal.h:110-137): if a row has
    fewer than ``k`` live entries the extra slots are sentinels.  Output width
    is exactly ``k``; rows are ordered by descending score (callers must not
    rely on tie order, as with ``std::nth_element``).
    """
    w = ids.shape[-1]
    key = jnp.where(ids >= 0, scores, NEG_INF)
    if k < w:
        top_key, top_pos = jax.lax.top_k(key, k)
        out_ids = jnp.take_along_axis(ids, top_pos, axis=-1)
        out_scores = jnp.take_along_axis(scores, top_pos, axis=-1)
        live = top_key > NEG_INF
    else:
        # Width already <= k: sort descending by key and pad.
        order_key, out_ids, out_scores = jax.lax.sort(
            (-key, ids, scores), dimension=-1, num_keys=1
        )
        live = -order_key > NEG_INF
        pad = k - w
        if pad > 0:
            out_ids = jnp.pad(out_ids, [(0, 0)] * (ids.ndim - 1) + [(0, pad)])
            out_scores = jnp.pad(
                out_scores, [(0, 0)] * (ids.ndim - 1) + [(0, pad)]
            )
            live = jnp.pad(live, [(0, 0)] * (ids.ndim - 1) + [(0, pad)])
    out_ids = jnp.where(live, out_ids, SENTINEL)
    out_scores = jnp.where(live, out_scores, 0.0)
    return Baskets(out_ids.astype(jnp.int32), out_scores.astype(jnp.float32))


def keep_top_chunked(
    ids: jax.Array,
    scores: jax.Array,
    k: int,
    elem_budget: int = 1 << 27,
) -> Baskets:
    """:func:`keep_top` over row chunks: bounds the top-k temporaries for
    graph-scale basket sets (at N=4.8M, L=100 a single top_k's gather/key
    temporaries exceed one v5e's HBM alongside the basket itself)."""
    rows, w = ids.shape
    chunk = int(max(1, min(rows, elem_budget // max(w, 1))))
    if chunk >= rows:
        return keep_top(ids, scores, k)
    parts_i, parts_s = [], []
    for s in range(0, rows, chunk):
        e = min(s + chunk, rows)
        out = keep_top(ids[s:e], scores[s:e], k)
        parts_i.append(out.ids)
        parts_s.append(out.scores)
    return Baskets(
        jnp.concatenate(parts_i, axis=0), jnp.concatenate(parts_s, axis=0)
    )


@jax.jit
def norm1_rows(a: Baskets, b: Baskets) -> jax.Array:
    """Row-wise L1 distance treating each row as a sparse vector.

    Mirrors ``norm1`` (include/internal/pprInternal.h:148-165): keys absent
    from one side count with value 0.
    """
    ids = jnp.concatenate([a.ids, b.ids], axis=-1)
    scores = jnp.concatenate([a.scores, -b.scores], axis=-1)
    ids, scores = sort_rows_by_id(ids, scores)
    out_ids, diff = combine_sorted_runs(ids, scores)
    return jnp.sum(jnp.where(out_ids >= 0, jnp.abs(diff), 0.0), axis=-1)


@jax.jit
def jaccard_rows(a_ids: jax.Array, b_ids: jax.Array) -> jax.Array:
    """Row-wise Jaccard index of the live-id sets.

    Empty-vs-empty rows yield 1.0, like the reference
    (include/internal/pprInternal.h:176-177).  Assumes ids within a row are
    distinct (true for any basket).
    """
    a_live = a_ids >= 0
    b_live = b_ids >= 0
    inter = jnp.sum(
        (a_ids[..., :, None] == b_ids[..., None, :])
        & a_live[..., :, None]
        & b_live[..., None, :],
        axis=(-2, -1),
    )
    na = jnp.sum(a_live, axis=-1)
    nb = jnp.sum(b_live, axis=-1)
    union = na + nb - inter
    return jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1)).astype(
        jnp.float32
    )
