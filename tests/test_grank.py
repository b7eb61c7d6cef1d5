"""GRank tests mirroring test/grankTest.cc's three tiers: validation,
topology properties on hand-built graphs, and the untruncated-approximation ≡
exact power iteration equivalence oracle (sameAsPagerank1..4)."""

import numpy as np
import pytest

from approximated_personalized_pagerank_tpu import (
    Graph,
    grank,
    grank_baskets,
    ppr_single_source,
)


# ------------------------------------------------------------- validation
def test_validation_messages():
    g = Graph.from_dict({0: [1], 1: []})
    with pytest.raises(ValueError, match="K must be positive"):
        grank(g, 0, 3, 42, 0.5, 1e-4)
    with pytest.raises(ValueError, match="L must be positive"):
        grank(g, 1, 0, 42, 0.5, 1e-4)
    with pytest.raises(ValueError, match="K must be <= L"):
        grank(g, 5, 3, 42, 0.5, 1e-4)
    with pytest.raises(ValueError, match="iterations must be positive"):
        grank(g, 3, 3, 0, 0.5, 1e-4)
    with pytest.raises(ValueError, match=r"damping must be \[0,1\]"):
        grank(g, 3, 3, 42, -0.5, 1e-4)
    with pytest.raises(ValueError, match=r"damping must be \[0,1\]"):
        grank(g, 3, 3, 42, 1.5, 1e-4)


def test_validation_L_zero():
    # With both K and L zero the K check fires first, like the reference
    # (include/grank.h:51-52).
    g = Graph.from_dict({0: [1], 1: []})
    with pytest.raises(ValueError, match="K must be positive"):
        grank(g, 0, 0, 42, 0.5, 1e-4)


# ------------------------------------------------- topology properties
def test_empty_graph():
    assert grank(Graph.from_dict({}), 3, 5, 10, 0.85, 1e-4) == {}


def test_edgeless_nodes_self_basket():
    # grankTest.cc:38-50: nodes with no edges end with {self: 1-damping}.
    g = Graph.from_dict({i: [] for i in range(4)})
    res = grank(g, 3, 5, 10, 0.85, 1e-4)
    for i in range(4):
        assert res[i] == pytest.approx({i: 0.15})


def test_basket_size_at_most_K(rng):
    # grankTest.cc:52-68 asserts size <= L for all L; final baskets are K.
    g = Graph.from_dict(
        {i: rng.integers(0, 10, size=3).tolist() for i in range(10)}
    )
    for K in (1, 2, 5, 9, 15):
        res = grank(g, K, max(K, 10), 20, 0.85, 1e-4)
        for v, basket in res.items():
            assert len(basket) <= K


def test_cycle_scores_decrease_with_distance():
    # grankTest.cc:107-152: on a directed cycle, score decreases with
    # distance from the source.
    n = 6
    g = Graph.from_dict({i: [(i + 1) % n] for i in range(n)})
    res = grank(g, n, n, 100, 0.85, 1e-6)
    for src in range(n):
        vals = [res[src][(src + d) % n] for d in range(n)]
        assert all(vals[i] > vals[i + 1] for i in range(n - 1))


def test_star_hand_computed():
    # grankTest.cc:154-182: star with center 0: leaves get 0.15 * 0.85 / (n-1)
    # contributions... the published assertion is res[i][0] ≈ 0.15·0.85 for
    # the center's entry in each leaf basket? Leaves are dangling here:
    # their baskets are {self: 0.15} exactly.
    n = 5
    g = Graph.from_dict({0: list(range(1, n)), **{i: [] for i in range(1, n)}})
    res = grank(g, n, n, 50, 0.85, 1e-6)
    # center: self 0.15, each leaf 0.85/4 * 0.15 (leaf baskets are {leaf:.15})
    assert res[0][0] == pytest.approx(0.15, abs=1e-6)
    for leaf in range(1, n):
        assert res[0][leaf] == pytest.approx(0.85 / 4 * 0.15, abs=1e-6)
        assert res[leaf] == pytest.approx({leaf: 0.15})


def test_K_boundaries():
    # grankTest.cc:184-283: K < / = / > |V|.
    n = 5
    g = Graph.from_dict({i: [(i + 1) % n] for i in range(n)})
    small = grank(g, 2, 5, 30, 0.85, 1e-4)
    assert all(len(b) == 2 for b in small.values())
    eq = grank(g, n, n, 30, 0.85, 1e-4)
    assert all(len(b) == n for b in eq.values())
    big = grank(g, 50, 100, 30, 0.85, 1e-4)
    assert all(len(b) == n for b in big.values())


def test_self_loop_and_parallel_edges():
    # += accumulation for repeated successors (include/grank.h:79-80).
    g = Graph.from_dict({0: [0, 1, 1], 1: [0]})
    res = grank(g, 2, 2, 100, 0.85, 1e-8)
    exact0 = ppr_single_source(g, 200, 0.85, -1.0, 0)
    for k, v in res[0].items():
        assert v == pytest.approx(exact0[k], abs=1e-4)


# ------------------------------------------- equivalence oracle tier
def _assert_same_as_pagerank(g, tol=1e-4):
    n = g.num_nodes
    approx = grank(g, n, n, 100, 0.85, -1.0)
    for src in list(g.keys)[: min(n, 12)]:
        exact = ppr_single_source(g, 100, 0.85, -1.0, src)
        for k in set(exact) | set(approx[src]):
            assert approx[src].get(k, 0.0) == pytest.approx(
                exact.get(k, 0.0), abs=tol
            ), f"source {src} node {k}"


def test_same_as_pagerank_cycle():
    n = 8
    g = Graph.from_dict({i: [(i + 1) % n] for i in range(n)})
    _assert_same_as_pagerank(g)


def test_same_as_pagerank_star():
    n = 7
    g = Graph.from_dict(
        {0: list(range(1, n)), **{i: [0] for i in range(1, n)}}
    )
    _assert_same_as_pagerank(g)


def test_same_as_pagerank_random(rng):
    # grankTest.cc sameAsPagerank3: random graph (reference: 100 nodes /
    # 5000 random edges; scaled down to keep CI fast, density preserved).
    n = 40
    src = rng.integers(0, n, size=800)
    dst = rng.integers(0, n, size=800)
    g = Graph.from_edges(src, dst, num_nodes=n)
    _assert_same_as_pagerank(g)


def test_same_as_pagerank_complete():
    n = 10
    g = Graph.from_dict(
        {i: [j for j in range(n) if j != i] for i in range(n)}
    )
    _assert_same_as_pagerank(g)


def test_negative_tolerance_never_stops_early():
    # include/grank.h:37-39: negative tolerance runs all iterations.
    n = 6
    g = Graph.from_dict({i: [(i + 1) % n] for i in range(n)})
    r2 = grank(g, n, n, 2, 0.85, -1.0)
    r100 = grank(g, n, n, 100, 0.85, -1.0)
    assert r2[0] != pytest.approx(r100[0])


def test_tolerance_zero_runs_all_iterations():
    n = 4
    g = Graph.from_dict({i: [(i + 1) % n] for i in range(n)})
    a = grank(g, n, n, 100, 0.85, 0.0)
    b = grank(g, n, n, 100, 0.85, -1.0)
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-7)


def test_device_loop_matches_host_loop(rng):
    # The single-program while_loop runner must reproduce the host-stepped
    # loop exactly (same half-sweep accounting and tolerance semantics).
    from approximated_personalized_pagerank_tpu import grank_baskets

    n = 30
    src = rng.integers(0, n, size=300)
    dst = rng.integers(0, n, size=300)
    g = Graph.from_edges(src, dst, num_nodes=n)
    for tol in (1e-4, -1.0, 0.5):
        dev = grank_baskets(g, 5, 10, 25, 0.85, tol, engine="sparse")
        host = grank_baskets(g, 5, 10, 25, 0.85, tol, host_loop=True)
        assert np.asarray(dev.ids).tolist() == np.asarray(host.ids).tolist()
        assert np.allclose(np.asarray(dev.scores), np.asarray(host.scores))


def test_hub_merge_matches_flat_merge(rng):
    # Hub rows (deg > the largest network-aligned cap) run the hierarchical
    # merge (ops/merge._hub_merge_chunk).  Forcing a tiny network width
    # (bitonic:512, L=40 -> sub=12) routes most rows through it; results
    # must match the flat exact pipeline (merge_algo="sort") except at
    # score-tie boundaries.
    n = 200
    src = np.concatenate(
        [np.zeros(120, np.int64), rng.integers(1, n, 500)]
    )
    dst = rng.integers(0, n, 620)
    g = Graph.from_edges(src, dst, num_nodes=n)
    assert int(g.out_degree.max()) > 100
    flat = grank_baskets(g, 20, 40, 30, 0.85, 1e-6, merge_algo="sort")
    hier = grank_baskets(g, 20, 40, 30, 0.85, 1e-6, merge_algo="bitonic:512")
    fi, fs = np.asarray(flat.ids), np.asarray(flat.scores)
    hi, hs = np.asarray(hier.ids), np.asarray(hier.scores)
    same = sum(
        set(a[a >= 0]) == set(b[b >= 0]) for a, b in zip(fi, hi)
    )
    assert same >= n - 2
    for r in range(n):
        d1 = dict(zip(fi[r].tolist(), fs[r].tolist()))
        d2 = dict(zip(hi[r].tolist(), hs[r].tolist()))
        for k in set(d1) & set(d2):
            if k >= 0:
                assert abs(d1[k] - d2[k]) < 1e-6


def test_hub_merge_untruncated_same_as_pagerank(rng):
    # With L=|V| the hub hierarchy's intermediate top-M holds everything, so
    # the hierarchical merge is EXACT — the sameAsPagerank oracle must hold
    # through the hub path (test/grankTest.cc:285-379 tier).
    n = 60
    src = np.concatenate([np.zeros(80, np.int64), rng.integers(1, n, 200)])
    dst = rng.integers(0, n, 280)
    g = Graph.from_edges(src, dst, num_nodes=n)
    from approximated_personalized_pagerank_tpu.models.ppr_single_source import (
        ppr_single_source_batch,
    )

    full = grank_baskets(g, n, n, 100, 0.85, -1.0, merge_algo="bitonic:512")
    srcs = np.arange(12, dtype=np.int32)
    exact = np.asarray(ppr_single_source_batch(g, srcs, 100, 0.85, 1e-9))
    fi, fs = np.asarray(full.ids[:12]), np.asarray(full.scores[:12])
    for r in range(12):
        vec = np.zeros(n)
        for i, s in zip(fi[r], fs[r]):
            if i >= 0:
                vec[int(i)] = s
        assert np.abs(vec - exact[r]).max() < 1e-4
