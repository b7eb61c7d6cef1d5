"""Batched successor-basket merge: the TPU-native form of GRank's hot loop.

Reference semantics (include/grank.h:96-126): for each node ``v`` of the
active partition build ``currentMap = {v: 1-damping}``, then for every
successor ``s`` add ``damping/outdeg(v) * scores[s][k]`` for each of the up to
``L`` entries ``k`` of ``s``'s basket, truncate to top-L, and record the L1
change.  The same machinery with different scaling implements
MCCompletePathV2's combine step (include/mccompletepathv2.h:211-250) and
GRank's initialisation (include/grank.h:64-83).

TPU formulation: nodes are grouped into degree buckets (static shapes).  For
one bucket of ``C`` nodes with successor matrix ``succ[C, D]``:

1. gather the successors' baskets -> ``[C, D, L]`` candidate (id, score) pairs
2. scale, flatten to ``[C, D*L]``, append the self entry -> ``[C, W]``
3. row-sort by id, collapse duplicate-id runs with a segmented prefix sum
4. ``top_L`` truncate; optionally L1-diff against the old basket rows

Memory is bounded by processing each bucket in row chunks under
``lax.map`` so ``chunk * W`` stays below a fixed element budget.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

import os

from .basket import (
    SENTINEL,
    Baskets,
    combine_sorted_runs,
    keep_top,
    norm1_rows,
    sort_rows_by_id,
)

# Max elements in a candidate matrix chunk (ids+scores+sort temps scale this).
DEFAULT_ELEM_BUDGET = 1 << 22

# Merge pipeline implementation: 'sort' (lax.sort + segmented combine),
# 'bitonic' (XLA bitonic network), 'pallas' (fused TPU kernel).  Overridable
# per call; the env var overrides the backend-aware default.
DEFAULT_MERGE_ALGO = os.environ.get("PPR_MERGE_ALGO")


def resolve_merge_algo(algo: str | None) -> str:
    """None -> PPR_MERGE_ALGO env, else the fused Pallas kernel on TPU
    (measured ~1.4x the XLA sort pipeline per sweep; wide/narrow rows fall
    back to sort inside _merge_rows) and 'sort' elsewhere."""
    if algo is not None:
        return algo
    if DEFAULT_MERGE_ALGO:
        return DEFAULT_MERGE_ALGO
    return "pallas" if jax.default_backend() == "tpu" else "sort"


# Below this candidate width the generic sort path is used regardless (the
# pow2/lane padding of the network paths would dominate).
MIN_NETWORK_WIDTH = 256
# Above this width the fused Pallas kernel stops paying: the O(log^2 W)
# unrolled network makes Mosaic compile time explode (W=16384 exceeded 10
# minutes on v5e; W=8192 compiles in ~70s and runs at >400 Melem/s) and the
# scoped-VMEM stack (measured ~340B per tile element) approaches the 128MB
# VMEM.  Wider buckets fall back to the XLA sort pipeline.
MAX_PALLAS_WIDTH = 8192

# Hub (hierarchical) merge: intermediate per-group top-M keeps M =
# HUB_TOP_M_FACTOR * L candidates.  The factor is the precision headroom of
# the two-stage truncation (see _hub_merge_chunk); 2 is measured safe on
# power-law graphs (quality eval unchanged vs the flat merge to 4 decimals)
# and keeps the reduction fan-in at (net_width // 2L) ~ 40.
HUB_TOP_M_FACTOR = int(os.environ.get("PPR_HUB_TOP_M_FACTOR", "2"))

# Max iterations per lax.map segment of a bucket's chunk loop — the guard
# for a v5e backend fault class (see merge_bucket).  16 sits at a 1.5x
# margin below the empirically mapped >= 25-iteration trigger.
MAX_MAP_CHUNKS = int(os.environ.get("PPR_MAX_MAP_CHUNKS", "16"))


def net_max_width(algo: str | None) -> int | None:
    """Effective sorting-network width cap of the resolved pipeline, or
    None when the pipeline is the plain XLA sort (no width cap)."""
    algo = resolve_merge_algo(algo)
    max_w = MAX_PALLAS_WIDTH
    if ":" in algo:
        algo, cap_s = algo.split(":", 1)
        max_w = min(max_w, int(cap_s))
    return max_w if algo in ("pallas", "bitonic") else None


def _next_pow2(x: int) -> int:
    return 1 << (x - 1).bit_length()


def _merge_rows(ids, scores, L: int, algo: str):
    """Row-wise duplicate-id combine + top-L with the selected pipeline.

    Input: candidate rows [C, W] with SENTINEL (-1) padding.
    Output: Baskets rows [C, L] with SENTINEL padding, sorted desc by score.

    ``algo`` may carry a width cap — ``"pallas:4096"`` routes rows whose
    pow2-padded width exceeds 4096 to the XLA sort pipeline.  Each Mosaic
    network kernel's compile cost grows steeply with width (~70 s at
    W=8192 on v5e); for ONE-SHOT runs at graph scale, trading the widest
    kernels' runtime edge for their compile time is a net win.
    """
    max_pallas = MAX_PALLAS_WIDTH
    if ":" in algo:
        algo, cap_s = algo.split(":", 1)
        max_pallas = min(max_pallas, int(cap_s))
    w = ids.shape[-1]
    if (
        algo == "sort"
        or w < MIN_NETWORK_WIDTH
        or (algo == "pallas" and _next_pow2(w) > max_pallas)
    ):
        ids, scores = sort_rows_by_id(ids, scores)
        ids, scores = combine_sorted_runs(ids, scores)
        return keep_top(ids, scores, L)

    from .bitonic import (
        PAD_ID,
        bitonic_merge_topk,
        bitonic_sort_pairs,
        segmented_sum_sorted,
    )

    l_pad = _next_pow2(max(L, 128))
    w2 = max(_next_pow2(w), l_pad)
    ids = jnp.where(ids < 0, PAD_ID, ids)
    if w2 > w:
        pad_cfg = ((0, 0), (0, w2 - w))
        ids = jnp.pad(ids, pad_cfg, constant_values=PAD_ID)
        scores = jnp.pad(scores, pad_cfg)
    if algo == "pallas":
        from .pallas.merge_kernel import fused_merge_topl

        out_ids, out_scores = fused_merge_topl(ids, scores, l_pad)
    elif algo == "bitonic":
        ids, scores = bitonic_sort_pairs(ids, scores)
        ids, scores = segmented_sum_sorted(ids, scores)
        out_ids, out_scores = bitonic_merge_topk(ids, scores, l_pad)
    else:
        raise ValueError(f"unknown merge algo {algo!r}")
    return Baskets(out_ids[..., :L], out_scores[..., :L])


class DeviceBucket(NamedTuple):
    """Device-resident ELL bucket (see graph.MergePlan).

    ``succ_flat`` is the [C, cap] successor matrix stored FLAT: TPU layouts
    pad the minor dimension to 128 lanes, so a resident [C, cap] i32 array
    with cap < 128 expands up to 128/cap x in HBM (measured 6.4x at cap 20
    — ~2.4 GB of pure padding across the 4.8M-node north star's buckets,
    the difference between fitting one v5e and OOM).  A 1-D array pads to
    128 elements total; the 2-D view is materialized per chunk inside the
    program (``.reshape(C, cap)``), so only chunk-sized temporaries ever
    hold the padded layout.
    """

    rows: jax.Array  # int32[C]     node ids, padded with num_nodes
    succ_flat: jax.Array  # int32[C*cap] successor ids, padded with -1

    @property
    def succ(self) -> jax.Array:
        c = self.rows.shape[0]
        return self.succ_flat.reshape(c, -1)


def device_plan(plan, num_nodes: int) -> Tuple[DeviceBucket, ...]:
    """Upload a host MergePlan's buckets; pad rows with ``num_nodes``."""
    out = []
    for b in plan.buckets:
        out.append(
            DeviceBucket(
                rows=jnp.asarray(b.rows, dtype=jnp.int32),
                succ_flat=jnp.asarray(b.succ.reshape(-1), dtype=jnp.int32),
            )
        )
    return tuple(out)


def _bucket_candidates(
    basket: Baskets | None,
    rows: jax.Array,
    succ: jax.Array,
    damping: jax.Array,
    mode: str,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Build the [C, W] candidate (ids, scores) matrix plus per-row post-scale.

    ``mode``:
      * ``"grank"``      — candidates are successor basket entries scaled by
        damping/outdeg, self entry ``1-damping`` (include/grank.h:100-116).
        ``basket=None`` means *init*: each successor contributes a singleton
        ``{s: 1}`` instead of its basket (include/grank.h:64-83).
      * ``"mc_combine"`` — candidates are successor baskets unscaled, self
        entry ``1/factor`` with ``factor = damping/outdeg``, and the whole
        result is scaled by ``factor`` after truncation
        (include/mccompletepathv2.h:213-249).
    """
    c, d = succ.shape
    deg = jnp.sum(succ >= 0, axis=-1).astype(jnp.float32)  # >=1 in buckets
    factor = damping / jnp.maximum(deg, 1.0)
    valid = succ >= 0
    safe = jnp.where(valid, succ, 0)
    if basket is None:
        cand_ids = jnp.where(valid, succ, SENTINEL)  # [C, D]
        cand_scores = jnp.where(valid, 1.0, 0.0).astype(jnp.float32)
    else:
        cand_ids = basket.ids[safe]  # [C, D, L]
        cand_scores = basket.scores[safe]
        slot_valid = valid[..., None] & (cand_ids >= 0)
        cand_ids = jnp.where(slot_valid, cand_ids, SENTINEL)
        cand_scores = jnp.where(slot_valid, cand_scores, 0.0)
        cand_ids = cand_ids.reshape(c, -1)
        cand_scores = cand_scores.reshape(c, -1)
    if mode == "grank":
        cand_scores = cand_scores * factor[:, None]
        self_scores = jnp.broadcast_to(1.0 - damping, (c,)).astype(jnp.float32)
        post_scale = jnp.ones((c,), dtype=jnp.float32)
    elif mode == "mc_combine":
        self_scores = (1.0 / factor).astype(jnp.float32)
        post_scale = factor.astype(jnp.float32)
    else:
        raise ValueError(f"unknown merge mode {mode!r}")
    ids = jnp.concatenate([cand_ids, rows[:, None].astype(jnp.int32)], axis=-1)
    scores = jnp.concatenate([cand_scores, self_scores[:, None]], axis=-1)
    return ids, scores, post_scale


def _hub_merge_chunk(
    basket: Baskets,
    rows: jax.Array,  # int32[C]
    succ: jax.Array,  # int32[C, cap]
    damping: jax.Array,
    L: int,
    mode: str,
    algo: str,
    sub: int,
) -> Baskets:
    """Hierarchical merge for hub rows (out-degree > ``sub``).

    A flat hub row's candidate list is ``cap * L`` wide — at soc-LJ-class
    degrees that is a multi-megabyte single-row sort, the one program shape
    the TPU backend handles worst (and, at 4.8M nodes, the shape that
    reproducibly kernel-faulted the v5e worker).  Instead the row's
    successors are split into groups of ``sub`` (chosen so a group's
    candidates fill one network-width row), each group merges to an
    intermediate top-M (M = HUB_TOP_M_FACTOR * L), and the per-group
    partial lists are tree-reduced with the same kernel until one final
    merge (with the self entry) yields the top-L — every sort the row ever
    takes is a ``<= net_width`` Pallas/bitonic network row BY CONSTRUCTION.

    Divergence from the flat merge (include/grank.h:96-126 does one exact
    accumulate-then-truncate): an id outside every group's top-M but inside
    the exact top-L can be lost.  With M = 2L the id's total must beat the
    L-th exact score while each group share sits below ~2L deeper partial
    scores — measured on power-law graphs (1M-4.8M nodes) the final
    baskets' eval stats match the flat merge to 4 decimals.  The flat path
    stays available via merge_algo="sort" (no width cap, bit-exact
    reference semantics).
    """
    c, cap = succ.shape
    g = -(-cap // sub)
    if g * sub > cap:
        succ = jnp.pad(
            succ, ((0, 0), (0, g * sub - cap)), constant_values=SENTINEL
        )
    deg = jnp.sum(succ >= 0, axis=-1).astype(jnp.float32)
    factor = damping / jnp.maximum(deg, 1.0)  # [C]
    sg = succ.reshape(c * g, sub)
    valid = sg >= 0
    safe = jnp.where(valid, sg, 0)
    cand_ids = basket.ids[safe]  # [C*g, sub, Lb]
    cand_scores = basket.scores[safe]
    slot_valid = valid[..., None] & (cand_ids >= 0)
    cand_ids = jnp.where(slot_valid, cand_ids, SENTINEL).reshape(c * g, -1)
    cand_scores = jnp.where(slot_valid, cand_scores, 0.0).reshape(c * g, -1)
    if mode == "grank":
        # the per-successor scale commutes with the merge tree; the self
        # entry joins at the final level only
        cand_scores = cand_scores * jnp.repeat(factor, g)[:, None]
        self_scores = jnp.broadcast_to(1.0 - damping, (c,)).astype(jnp.float32)
        post_scale = jnp.ones((c,), dtype=jnp.float32)
    elif mode == "mc_combine":
        self_scores = (1.0 / factor).astype(jnp.float32)
        post_scale = factor.astype(jnp.float32)
    else:
        raise ValueError(f"unknown merge mode {mode!r}")
    m = min(max(HUB_TOP_M_FACTOR, 1) * L, sub * basket.width)
    part = _merge_rows(cand_ids, cand_scores, m, algo)
    pids = part.ids.reshape(c, g * m)
    pscs = part.scores.reshape(c, g * m)
    # tree-reduce partial top-M lists until one final network row fits
    while g * m > sub * L:
        gg = max(2, (sub * L) // m)
        g2 = -(-g // gg)
        pad_cols = g2 * gg * m - g * m
        if pad_cols:
            pids = jnp.pad(
                pids, ((0, 0), (0, pad_cols)), constant_values=SENTINEL
            )
            pscs = jnp.pad(pscs, ((0, 0), (0, pad_cols)))
        part = _merge_rows(
            pids.reshape(c * g2, gg * m), pscs.reshape(c * g2, gg * m), m, algo
        )
        g = g2
        pids = part.ids.reshape(c, g * m)
        pscs = part.scores.reshape(c, g * m)
    ids_f = jnp.concatenate([pids, rows[:, None].astype(jnp.int32)], axis=-1)
    scs_f = jnp.concatenate([pscs, self_scores[:, None]], axis=-1)
    out = _merge_rows(ids_f, scs_f, L, algo)
    return Baskets(out.ids, out.scores * post_scale[:, None])


def merge_bucket(
    basket: Baskets | None,
    rows: jax.Array,
    succ_flat: jax.Array,
    damping: jax.Array,
    L: int,
    mode: str = "grank",
    compute_diff: bool = False,
    elem_budget: int = DEFAULT_ELEM_BUDGET,
    algo: str | None = None,
    hub_sub: int | None = None,
) -> Tuple[Baskets, jax.Array]:
    """Merged top-L baskets for one degree bucket, plus per-row L1 diff.

    ``succ_flat`` is the bucket's [C, cap] successor matrix stored flat
    (see DeviceBucket): each chunk's [chunk, cap] view is sliced out of the
    1-D array inside the loop body, so no bucket-sized array with a
    sub-128 minor dimension is ever resident (TPU lane padding would
    expand it up to 128/cap x).  For the same reason the ``old`` rows for
    the convergence diff (include/grank.h:123) are gathered per chunk, not
    for the whole bucket up front.

    Rows padded with out-of-range ids produce garbage that callers drop via
    scatter ``mode='drop'``; callers mask their diff via ``rows < N``.

    ``hub_sub`` routes buckets with cap > hub_sub through the hierarchical
    hub merge (:func:`_hub_merge_chunk`) — set it to the largest
    width-aligned cap when the plan was built with ``net_width``
    (graph.merge_plan), so no sort row ever exceeds the network width.
    """
    if algo is None:
        algo = resolve_merge_algo(None)
    c = rows.shape[0]
    d = succ_flat.shape[0] // max(c, 1)
    hub = hub_sub is not None and d > hub_sub and basket is not None
    width = 1 + (d if basket is None else d * basket.width)
    chunk = int(max(1, min(c, elem_budget // max(width, 1))))
    n_chunks = -(-c // chunk)
    pad = n_chunks * chunk - c

    if pad:
        rows_p = jnp.pad(rows, (0, pad), constant_values=jnp.iinfo(jnp.int32).max)
        flat_p = jnp.pad(succ_flat, (0, pad * d), constant_values=SENTINEL)
    else:
        rows_p, flat_p = rows, succ_flat

    def one_chunk(start):
        rows_c = jax.lax.dynamic_slice(rows_p, (start,), (chunk,))
        succ_c = jax.lax.dynamic_slice(
            flat_p, (start * d,), (chunk * d,)
        ).reshape(chunk, d)
        if hub:
            new = _hub_merge_chunk(
                basket, rows_c, succ_c, damping, L, mode, algo, hub_sub
            )
        else:
            ids, scores, post = _bucket_candidates(
                basket, rows_c, succ_c, damping, mode
            )
            new = _merge_rows(ids, scores, L, algo)
            new = Baskets(new.ids, new.scores * post[:, None])
        if compute_diff and basket is not None:
            safe_rows = jnp.minimum(rows_c, basket.ids.shape[0] - 1)
            old_c = Baskets(basket.ids[safe_rows], basket.scores[safe_rows])
            diff = norm1_rows(new, old_c)
        else:
            diff = jnp.zeros((chunk,), dtype=jnp.float32)
        return new.ids, new.scores, diff

    if n_chunks == 1:
        out_ids, out_scores, diff = one_chunk(jnp.int32(0))
    else:
        # The chunk loop runs as SEGMENTED lax.maps of at most
        # MAX_MAP_CHUNKS iterations each.  Empirically isolated on v5e
        # (jax 0.9 / libtpu of this sandbox): a single lax.map of >= 25
        # iterations whose body contains the W=512 fused merge kernel
        # produces a compiled program that hard-crashes the TPU worker
        # ("kernel fault") regardless of the data — the same shape sliced
        # from different rows crashes identically, while <= 24 iterations
        # or other widths (W=1024 at 63 iterations) run clean.  Several
        # short maps compile to the same kernels and sidestep the faulting
        # program class by construction; see docs/PERF.md.
        segs_i, segs_s, segs_d = [], [], []
        for s0 in range(0, n_chunks, MAX_MAP_CHUNKS):
            seg = min(MAX_MAP_CHUNKS, n_chunks - s0)
            starts = (s0 + jnp.arange(seg, dtype=jnp.int32)) * chunk
            if seg == 1:
                i_, s_, d_ = one_chunk(starts[0])
                segs_i.append(i_)
                segs_s.append(s_)
                segs_d.append(d_)
            else:
                i_, s_, d_ = jax.lax.map(one_chunk, starts)
                segs_i.append(i_.reshape(seg * chunk, L))
                segs_s.append(s_.reshape(seg * chunk, L))
                segs_d.append(d_.reshape(seg * chunk))
        out_ids = jnp.concatenate(segs_i, axis=0)
        out_scores = jnp.concatenate(segs_s, axis=0)
        diff = jnp.concatenate(segs_d, axis=0)

    if pad:
        out_ids = out_ids[:c]
        out_scores = out_scores[:c]
        diff = diff[:c]
    return Baskets(out_ids, out_scores), diff


def merge_sweep(
    basket: Baskets | None,
    buckets: Sequence[DeviceBucket],
    damping: jax.Array,
    L: int,
    num_rows: int,
    mode: str = "grank",
    compute_diff: bool = False,
    out_basket: Baskets | None = None,
    elem_budget: int = DEFAULT_ELEM_BUDGET,
    algo: str | None = None,
    hub_sub: int | None = None,
) -> Tuple[Baskets, jax.Array]:
    """One full merge sweep over a bucket list (one partition, or all nodes).

    Reads ``basket`` (old values only — updates are applied after every bucket
    is computed, preserving the reference's read-old/write-new semantics) and
    scatters results into ``out_basket`` (defaults to ``basket``).  Returns
    the updated basket set and the max per-row L1 diff (0 if not requested).
    """
    max_diff = jnp.float32(0.0)
    target = out_basket if out_basket is not None else basket
    ids, scores = target.ids, target.scores
    for b in buckets:
        new, diff = merge_bucket(
            basket, b.rows, b.succ_flat, damping, L, mode=mode,
            compute_diff=compute_diff and basket is not None,
            elem_budget=elem_budget, algo=algo, hub_sub=hub_sub,
        )
        # Scatter each bucket's rows as soon as they are computed (reads
        # still come from the unmodified ``basket`` value — bucket row sets
        # are disjoint, so this is the same DAG): holding every bucket's
        # update until the end kept ~partition_size x L extra elements live
        # (2.4 GB at the 4.8M-node north star, the difference between
        # fitting one v5e chip and OOM).
        ids = ids.at[b.rows].set(new.ids, mode="drop")
        scores = scores.at[b.rows].set(new.scores, mode="drop")
        if compute_diff:
            max_diff = jnp.maximum(
                max_diff, jnp.max(diff, initial=0.0, where=b.rows < num_rows)
            )
    return Baskets(ids, scores), max_diff
