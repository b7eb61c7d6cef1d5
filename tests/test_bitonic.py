"""Bitonic network correctness vs the generic sort path."""

import numpy as np
import jax.numpy as jnp
import pytest

from approximated_personalized_pagerank_tpu.ops.bitonic import (
    PAD_ID,
    bitonic_merge_topk,
    bitonic_sort_desc_by_score,
    bitonic_sort_pairs,
    segmented_sum_sorted,
)


def test_bitonic_sort_matches_lax_sort(rng):
    for w in (8, 64, 256):
        ids = rng.integers(0, 50, size=(5, w)).astype(np.int32)
        scores = rng.random((5, w)).astype(np.float32)
        out_ids, out_scores = bitonic_sort_pairs(
            jnp.asarray(ids), jnp.asarray(scores)
        )
        out_ids = np.asarray(out_ids)
        assert (np.sort(ids, axis=-1) == out_ids).all()
        # payload follows its key: per-row multiset of (id, score) preserved
        for r in range(5):
            got = sorted(zip(out_ids[r].tolist(), np.asarray(out_scores)[r].tolist()))
            exp = sorted(zip(ids[r].tolist(), scores[r].tolist()))
            assert got == exp


def test_bitonic_desc_by_score(rng):
    w = 128
    ids = rng.integers(0, 1000, size=(3, w)).astype(np.int32)
    scores = rng.random((3, w)).astype(np.float32)
    out_ids, out_scores = bitonic_sort_desc_by_score(
        jnp.asarray(ids), jnp.asarray(scores)
    )
    out_scores = np.asarray(out_scores)
    assert (out_scores == -np.sort(-scores, axis=-1)).all()


def test_segmented_sum_matches_combine(rng):
    from approximated_personalized_pagerank_tpu.ops.basket import (
        combine_sorted_runs,
    )

    for _ in range(3):
        w = 64
        ids = np.sort(
            rng.integers(-1, 12, size=(4, w)).astype(np.int32), axis=-1
        )
        scores = rng.random((4, w)).astype(np.float32)
        scores[ids < 0] = 0
        a_ids, a_scores = combine_sorted_runs(
            jnp.asarray(ids), jnp.asarray(scores)
        )
        b_ids, b_scores = segmented_sum_sorted(
            jnp.asarray(ids), jnp.asarray(scores)
        )
        for r in range(4):
            da = {
                int(i): float(s)
                for i, s in zip(np.asarray(a_ids)[r], np.asarray(a_scores)[r])
                if i >= 0
            }
            db = {
                int(i): float(s)
                for i, s in zip(np.asarray(b_ids)[r], np.asarray(b_scores)[r])
                if i >= 0 and i != int(PAD_ID)
            }
            assert set(da) == set(db)
            for k in da:
                assert da[k] == pytest.approx(db[k], abs=1e-5)


def test_merge_topk(rng):
    w = 32
    ids = np.full((2, w), int(PAD_ID), dtype=np.int32)
    scores = np.zeros((2, w), dtype=np.float32)
    ids[0, :5] = [3, 9, 4, 7, 1]
    scores[0, :5] = [0.5, 0.9, 0.1, 0.7, 0.3]
    out_ids, out_scores = bitonic_merge_topk(
        jnp.asarray(ids), jnp.asarray(scores), 3
    )
    assert np.asarray(out_ids)[0].tolist() == [9, 7, 3]
    assert np.asarray(out_ids)[1].tolist() == [-1, -1, -1]


def test_full_pipeline_equals_reference_path(rng):
    """sort -> segmented sum -> topk pipeline == combine_sorted_runs+keep_top."""
    from approximated_personalized_pagerank_tpu.ops.basket import (
        combine_sorted_runs,
        keep_top,
        sort_rows_by_id,
    )

    w = 128
    ids = rng.integers(0, 20, size=(6, w)).astype(np.int32)
    ids[rng.random((6, w)) < 0.3] = -1
    scores = (rng.random((6, w)) + 0.01).astype(np.float32)
    scores[ids < 0] = 0.0
    L = 10

    # reference path
    si, ss = sort_rows_by_id(jnp.asarray(ids), jnp.asarray(scores))
    ci, cs = combine_sorted_runs(si, ss)
    ref = keep_top(ci, cs, L)

    # bitonic path: replace -1 padding with PAD_ID so it sorts last
    bids = np.where(ids < 0, int(PAD_ID), ids).astype(np.int32)
    bi, bs = bitonic_sort_pairs(jnp.asarray(bids), jnp.asarray(scores))
    # sentinel runs: PAD_ID runs combine but are dropped by topk masking
    gi, gs = segmented_sum_sorted(bi, bs)
    got_ids, got_scores = bitonic_merge_topk(gi, gs, L)

    for r in range(6):
        ref_d = {
            int(i): float(s)
            for i, s in zip(np.asarray(ref.ids)[r], np.asarray(ref.scores)[r])
            if i >= 0
        }
        got_d = {
            int(i): float(s)
            for i, s in zip(np.asarray(got_ids)[r], np.asarray(got_scores)[r])
            if i >= 0
        }
        assert set(ref_d) == set(got_d)
        for k in ref_d:
            assert ref_d[k] == pytest.approx(got_d[k], abs=1e-5)


def test_grank_same_result_across_merge_algos(rng):
    """grank with sort / bitonic / pallas merge pipelines must agree."""
    from approximated_personalized_pagerank_tpu import Graph, grank_baskets

    n = 48
    src = rng.integers(0, n, size=700)
    dst = rng.integers(0, n, size=700)
    g = Graph.from_edges(src, dst, num_nodes=n)
    base = grank_baskets(g, 6, 12, 20, 0.85, 1e-4, merge_algo="sort")
    for algo in ("bitonic", "pallas"):
        other = grank_baskets(g, 6, 12, 20, 0.85, 1e-4, merge_algo=algo)
        # same id sets and scores (tie order may differ)
        for r in range(n):
            da = {
                int(i): float(s)
                for i, s in zip(np.asarray(base.ids)[r], np.asarray(base.scores)[r])
                if i >= 0
            }
            db = {
                int(i): float(s)
                for i, s in zip(np.asarray(other.ids)[r], np.asarray(other.scores)[r])
                if i >= 0
            }
            assert set(da) == set(db), (algo, r)
            for k in da:
                assert da[k] == pytest.approx(db[k], abs=1e-5), (algo, r, k)


def test_prune_topk_matches_full_sort_topk(rng):
    """bitonic_prune_topk (block sort + half-cleaner prune rounds) must give
    exactly bitonic_merge_topk's scores for every (w, k, density)."""
    from approximated_personalized_pagerank_tpu.ops.bitonic import (
        bitonic_prune_topk,
    )

    for w, k in ((128, 8), (256, 128), (512, 32), (1024, 128), (512, 512)):
        for density in (0.0, 0.4, 0.97):
            c = 5
            ids = rng.integers(0, 200, size=(c, w)).astype(np.int32)
            dead = rng.random((c, w)) < density
            ids[dead] = PAD_ID
            scores = rng.random((c, w)).astype(np.float32)
            scores[dead] = 0.0
            a_i, a_s = bitonic_merge_topk(jnp.asarray(ids), jnp.asarray(scores), k)
            b_i, b_s = bitonic_prune_topk(jnp.asarray(ids), jnp.asarray(scores), k)
            np.testing.assert_array_equal(np.asarray(a_s), np.asarray(b_s))
            np.testing.assert_array_equal(np.asarray(a_i) < 0, np.asarray(b_i) < 0)
