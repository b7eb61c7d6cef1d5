"""Unit tests for basket primitives, mirroring test/internal/keepTopTest.cc,
norm1Test.cc, jaccardTest.cc and the duplicate-merge semantics of grank's
inner loop."""

import numpy as np
import jax.numpy as jnp
import pytest

from approximated_personalized_pagerank_tpu.ops.basket import (
    Baskets,
    combine_sorted_runs,
    jaccard_rows,
    keep_top,
    norm1_rows,
    sort_rows_by_id,
)


def _basket_from_dict(d, width):
    ids = np.full((1, width), -1, dtype=np.int32)
    scores = np.zeros((1, width), dtype=np.float32)
    for i, (k, v) in enumerate(d.items()):
        ids[0, i] = k
        scores[0, i] = v
    return Baskets(jnp.asarray(ids), jnp.asarray(scores))


def _to_dict(b):
    ids = np.asarray(b.ids)[0]
    scores = np.asarray(b.scores)[0]
    return {int(i): float(s) for i, s in zip(ids, scores) if i >= 0}


# ---------------------------------------------------------------- keep_top
def test_keep_top_exact_sets(rng):
    # For every L, the kept ids must be exactly the top-L scoring set
    # (keepTopTest.cc:42-69, shuffled insertion order).
    n = 20
    scores = rng.permutation(np.arange(1, n + 1)).astype(np.float32)
    d = {i: float(scores[i]) for i in range(n)}
    ranked = sorted(d, key=d.get, reverse=True)
    for L in (1, 2, 3, 10, 19, 20, 21):
        b = _basket_from_dict(d, n)
        out = keep_top(b.ids, b.scores, L)
        got = _to_dict(out)
        assert set(got) == set(ranked[: min(L, n)])
        for k, v in got.items():
            assert v == pytest.approx(d[k])


def test_keep_top_l_larger_than_size():
    b = _basket_from_dict({3: 1.0, 7: 2.0}, 5)
    out = keep_top(b.ids, b.scores, 4)
    assert _to_dict(out) == {3: 1.0, 7: 2.0}
    assert out.ids.shape == (1, 4)


def test_keep_top_empty():
    b = _basket_from_dict({}, 4)
    out = keep_top(b.ids, b.scores, 2)
    assert _to_dict(out) == {}


def test_keep_top_zero_scores_survive():
    # damping=1 edge case: a real entry with score 0 must beat padding.
    b = _basket_from_dict({5: 0.0}, 3)
    out = keep_top(b.ids, b.scores, 2)
    assert _to_dict(out) == {5: 0.0}


# ---------------------------------------------------- combine_sorted_runs
def test_combine_merges_duplicates():
    ids = jnp.asarray([[-1, -1, 2, 2, 2, 5, 9, 9]], dtype=jnp.int32)
    scores = jnp.asarray([[0.0, 0.0, 1.0, 2.0, 3.0, 4.0, 0.5, 0.25]], jnp.float32)
    out_ids, out_scores = combine_sorted_runs(ids, scores)
    got = {
        int(i): float(s)
        for i, s in zip(np.asarray(out_ids)[0], np.asarray(out_scores)[0])
        if i >= 0
    }
    assert got == pytest.approx({2: 6.0, 5: 4.0, 9: 0.75})


def test_combine_random_vs_numpy(rng):
    for _ in range(5):
        w = 64
        ids = np.sort(rng.integers(-1, 10, size=(3, w)).astype(np.int32), axis=-1)
        scores = rng.normal(size=(3, w)).astype(np.float32)
        scores[ids == -1] = 0
        out_ids, out_scores = combine_sorted_runs(
            jnp.asarray(ids), jnp.asarray(scores)
        )
        for r in range(3):
            expect = {}
            for i, s in zip(ids[r], scores[r]):
                if i >= 0:
                    expect[int(i)] = expect.get(int(i), 0.0) + float(s)
            got = {
                int(i): float(s)
                for i, s in zip(np.asarray(out_ids)[r], np.asarray(out_scores)[r])
                if i >= 0
            }
            assert set(got) == set(expect)
            for k in expect:
                assert got[k] == pytest.approx(expect[k], abs=1e-5)


# ------------------------------------------------------------------ norm1
def _norm1(d1, d2, width=8):
    a = _basket_from_dict(d1, width)
    b = _basket_from_dict(d2, width)
    return float(norm1_rows(a, b)[0])


def test_norm1_empty():
    assert _norm1({}, {}) == 0.0


def test_norm1_self():
    assert _norm1({1: 2.0, 3: 4.0}, {1: 2.0, 3: 4.0}) == 0.0


def test_norm1_disjoint():
    assert _norm1({1: 2.0}, {2: 3.0}) == pytest.approx(5.0)


def test_norm1_overlapping():
    # |2-5| + |4-0| + |0-1| = 8 (norm1Test.cc algebra)
    assert _norm1({1: 2.0, 3: 4.0}, {1: 5.0, 7: 1.0}) == pytest.approx(8.0)


def test_norm1_asymmetric_entries():
    assert _norm1({1: 1.0}, {}) == pytest.approx(1.0)
    assert _norm1({}, {1: 1.0}) == pytest.approx(1.0)


# ---------------------------------------------------------------- jaccard
def _jac(s1, s2, width=8):
    a = _basket_from_dict({k: 1.0 for k in s1}, width)
    b = _basket_from_dict({k: 1.0 for k in s2}, width)
    return float(jaccard_rows(a.ids, b.ids)[0])


def test_jaccard_empty_is_one():
    assert _jac(set(), set()) == 1.0


def test_jaccard_disjoint():
    assert _jac({1, 2}, {3, 4}) == 0.0


def test_jaccard_half():
    assert _jac({1, 2}, {2, 3}) == pytest.approx(1 / 3)


def test_jaccard_identical():
    assert _jac({1, 2, 3}, {1, 2, 3}) == 1.0


def test_jaccard_growth_steps():
    # 10%-step growth akin to jaccardTest.cc
    base = set(range(10))
    for k in range(11):
        other = set(range(k)) | {100 + i for i in range(10 - k)}
        expected = k / (20 - k)
        assert _jac(base, other, width=16) == pytest.approx(expected)


def test_sort_rows_by_id_sentinels_first():
    ids = jnp.asarray([[5, -1, 2]], dtype=jnp.int32)
    scores = jnp.asarray([[1.0, 0.0, 2.0]], dtype=jnp.float32)
    out_ids, out_scores = sort_rows_by_id(ids, scores)
    assert np.asarray(out_ids)[0].tolist() == [-1, 2, 5]
    assert np.asarray(out_scores)[0].tolist() == [0.0, 2.0, 1.0]
