"""Bitonic sorting networks over (id, score) pairs.

Fixed-size compare-exchange networks expressed as reshape/flip/select ops.
Written in plain jnp so the same code runs three ways:

* as an XLA program (alternative to ``lax.sort``'s generic comparator sort);
* inside a Pallas TPU kernel on VMEM-resident tiles (ops/pallas/merge.py),
  where all O(log^2 W) stages fuse with zero HBM round-trips;
* under vmap/jit on CPU for tests.

The partner of index ``i`` at distance ``j`` (a power of two) is ``i ^ j``;
an XOR-shuffle at distance j is a flip of the axis of size 2 in a
``[..., W/2j, 2, j]`` reshape — no gather needed, which is what makes this
network Mosaic/VPU-friendly.

Also here: ``segmented_sum_sorted`` — a shift-based segmented scan that
collapses duplicate-id runs of an id-sorted row (the duplicate-key merge of
grank's hot loop) without cumsum+gather.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .basket import SENTINEL

# id used for padding slots so they sort to the END in ascending id order
# (unlike SENTINEL=-1 which sorts first).  Kept as a Python int so kernels
# using it don't capture a traced constant.
PAD_ID = 2**31 - 1


def _xor_shuffle(x: jax.Array, j: int) -> jax.Array:
    """x[..., i ^ j] for power-of-two j.

    For sub-lane distances (j < 128) Mosaic cannot lower the lane-crossing
    reshape, so the partner exchange is two cyclic rolls + select: an index
    with bit j clear reads i+j, one with it set reads i-j (neither wraps).
    For j >= 128 a [..., w/2j, 2, j] reshape with the size-2 axis swapped by
    slice+concat is cheaper (jnp.flip is avoided: Mosaic has no ``rev``).
    """
    w = x.shape[-1]
    lead = x.shape[:-1]
    if j < 128:
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        low = jnp.bitwise_and(idx, j) == 0
        return jnp.where(low, jnp.roll(x, -j, axis=-1), jnp.roll(x, j, axis=-1))
    y = x.reshape(*lead, w // (2 * j), 2, j)
    y = jnp.concatenate([y[..., 1:, :], y[..., :1, :]], axis=-2)
    return y.reshape(*lead, w)


def _stage(
    ids: jax.Array, scores: jax.Array, j: int, up_mask: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """One compare-exchange stage at distance j.

    ``up_mask[i]`` is True where position i keeps the smaller element of the
    (i, i^j) pair in ascending order.  Keys are ids (ascending); scores are
    carried payload.
    """
    p_ids = _xor_shuffle(ids, j)
    p_scores = _xor_shuffle(scores, j)
    i_is_low = (
        jnp.bitwise_and(
            jax.lax.broadcasted_iota(jnp.int32, (1, ids.shape[-1]), 1), j
        )
        == 0
    )
    # For ascending region: low slot takes min, high slot takes max.
    # NB: written with ==/&/| — Mosaic (Pallas TPU) crashes lowering
    # jnp.where over *boolean* operands, and ~bool is equally unsafe.
    take_min = up_mask == i_is_low
    take_max = up_mask != i_is_low
    swap = (take_min & (ids > p_ids)) | (take_max & (ids < p_ids))
    out_ids = jnp.where(swap, p_ids, ids)
    out_scores = jnp.where(swap, p_scores, scores)
    return out_ids, out_scores


def bitonic_sort_pairs(
    ids: jax.Array, scores: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Sort rows ascending by id, carrying scores.  Width must be a power
    of two; pad with PAD_ID first.  Duplicate-id payload order is
    arbitrary (like ``std::nth_element`` ties in the reference)."""
    w = ids.shape[-1]
    assert w & (w - 1) == 0, f"bitonic width must be a power of two, got {w}"
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    k = 2
    while k <= w:
        up_mask = (jnp.bitwise_and(idx, k) == 0)
        j = k // 2
        while j >= 1:
            ids, scores = _stage(ids, scores, j, up_mask)
            j //= 2
        k *= 2
    return ids, scores


def bitonic_sort_desc_by_score(
    ids: jax.Array, scores: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Sort rows descending by score, carrying ids (for top-L selection)."""
    w = ids.shape[-1]
    assert w & (w - 1) == 0
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    k = 2
    while k <= w:
        up_mask = (jnp.bitwise_and(idx, k) == 0)
        j = k // 2
        while j >= 1:
            p_ids = _xor_shuffle(ids, j)
            p_scores = _xor_shuffle(scores, j)
            i_is_low = (jnp.bitwise_and(idx, j) == 0)
            take_max = up_mask == i_is_low  # no bool-where (see _stage)
            take_min = up_mask != i_is_low
            swap = (take_max & (scores < p_scores)) | (
                take_min & (scores > p_scores)
            )
            ids = jnp.where(swap, p_ids, ids)
            scores = jnp.where(swap, p_scores, scores)
            j //= 2
        k *= 2
    return ids, scores


def segmented_sum_sorted(
    ids: jax.Array, scores: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Collapse duplicate-id runs of id-sorted rows onto their LAST slot.

    Log-step Hillis-Steele segmented scan: after log2(W) doubling steps each
    position holds the sum of its run's prefix; run ends keep the total,
    all other slots become (PAD_ID, 0).  Equivalent to
    basket.combine_sorted_runs but gather-free (Pallas/VPU-friendly);
    sentinel/pad runs are dropped.
    """
    w = ids.shape[-1]
    lead_shape = ids.shape[:-1] + (0,)
    acc = scores
    d = 1
    while d < w:
        pad = [(0, 0)] * (ids.ndim - 1) + [(d, 0)]
        shifted_acc = jnp.pad(acc, pad)[..., :w]
        shifted_ids = jnp.pad(ids, pad, constant_values=-2)[..., :w]
        acc = acc + jnp.where(ids == shifted_ids, shifted_acc, 0.0)
        d *= 2
    next_ids = jnp.concatenate(
        [ids[..., 1:], jnp.full(ids.shape[:-1] + (1,), -3, dtype=ids.dtype)],
        axis=-1,
    )
    is_end = ids != next_ids
    live = is_end & (ids >= 0) & (ids != PAD_ID)
    out_ids = jnp.where(live, ids, PAD_ID)
    out_scores = jnp.where(live, acc, 0.0)
    return out_ids, out_scores


def bitonic_merge_topk(
    ids: jax.Array, scores: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Top-k by score of combined rows (ids PAD_ID = dead, score 0).

    Dead slots must never beat live ones: live scores are PPR masses > 0
    except the damping=1 self-entry (score 0) — bias live slots by marking
    dead scores as -inf before the descending sort.
    """
    masked = jnp.where(ids == PAD_ID, -jnp.inf, scores)
    s_ids, s_scores = bitonic_sort_desc_by_score(ids, masked)
    out_ids = s_ids[..., :k]
    out_scores = s_scores[..., :k]
    live = out_scores > -jnp.inf
    return (
        jnp.where(live, out_ids, SENTINEL).astype(jnp.int32),
        jnp.where(live, out_scores, 0.0).astype(jnp.float32),
    )


def _score_stage(
    ids: jax.Array, scores: jax.Array, j: int, asc_mask: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """One compare-exchange stage at distance j keyed on SCORE (ids carried).

    ``asc_mask[i]`` True where position i belongs to an ascending-sorted
    region.  Same Mosaic-safe boolean algebra as :func:`_stage`.
    """
    p_ids = _xor_shuffle(ids, j)
    p_scores = _xor_shuffle(scores, j)
    i_is_low = (
        jnp.bitwise_and(
            jax.lax.broadcasted_iota(jnp.int32, (1, ids.shape[-1]), 1), j
        )
        == 0
    )
    take_min = asc_mask == i_is_low
    take_max = asc_mask != i_is_low
    swap = (take_min & (scores > p_scores)) | (take_max & (scores < p_scores))
    return jnp.where(swap, p_ids, ids), jnp.where(swap, p_scores, scores)


def bitonic_prune_topk(
    ids: jax.Array, scores: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k by score via block sort + prune rounds — the cheap form
    of :func:`bitonic_merge_topk` (same contract: ids PAD_ID = dead, output
    ``[..., k]`` sorted descending, dead slots (SENTINEL, 0)).

    Instead of fully sorting all W elements (O(W log^2 W) compare-exchange
    work), run the bitonic network only until k-blocks are sorted in
    alternating directions (O(W log^2 k)), then repeat log2(W/k) times on a
    halving width: one *half-cleaner* stage at distance k moves each
    2k-pair's k largest into one half (Batcher's bitonic lemma — adjacent
    asc/desc blocks form a bitonic sequence), drop the other half, and
    re-sort the survivor block with a log2(k)-stage bitonic merge.  Total
    O(W log k) element-stages after the block sort; exactness is pinned
    against bitonic_merge_topk in tests/test_bitonic.py.
    """
    w = ids.shape[-1]
    assert w & (w - 1) == 0, f"width must be a power of two, got {w}"
    assert k & (k - 1) == 0 and k <= w
    masked = jnp.where(ids == PAD_ID, -jnp.inf, scores)
    if k == w:
        out_ids, out_scores = bitonic_sort_desc_by_score(ids, masked)
    else:
        # Phase 1: standard ascending bitonic network truncated at outer
        # stage k: block b (k-aligned) ends up ascending iff b is even.
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        kk = 2
        while kk <= k:
            asc_mask = jnp.bitwise_and(idx, kk) == 0
            j = kk // 2
            while j >= 1:
                ids, masked = _score_stage(ids, masked, j, asc_mask)
                j //= 2
            kk *= 2
        # Phase 2: prune rounds.  Each (asc, desc) block pair is bitonic, so
        # the elementwise score-max of its halves is exactly the pair's top-k
        # multiset, itself bitonic; sort survivors alternately (asc/desc by
        # new block parity) for the next round — descending on the last.
        w_cur = w
        while w_cur > k:
            lead = ids.shape[:-1]
            gi = ids.reshape(*lead, w_cur // (2 * k), 2, k)
            gs = masked.reshape(*lead, w_cur // (2 * k), 2, k)
            hi0, hi1 = gi[..., 0, :], gi[..., 1, :]
            hs0, hs1 = gs[..., 0, :], gs[..., 1, :]
            take1 = hs1 > hs0
            ids = jnp.where(take1, hi1, hi0).reshape(*lead, w_cur // 2)
            masked = jnp.where(take1, hs1, hs0).reshape(*lead, w_cur // 2)
            w_cur //= 2
            idx = jax.lax.broadcasted_iota(jnp.int32, (1, w_cur), 1)
            if w_cur == k:
                asc_mask = jnp.zeros((1, w_cur), dtype=bool)  # final: desc
            else:
                asc_mask = jnp.bitwise_and(idx, k) == 0
            j = k // 2
            while j >= 1:
                ids, masked = _score_stage(ids, masked, j, asc_mask)
                j //= 2
        out_ids, out_scores = ids, masked
    live = out_scores > -jnp.inf
    return (
        jnp.where(live, out_ids, SENTINEL).astype(jnp.int32),
        jnp.where(live, out_scores, 0.0).astype(jnp.float32),
    )
