"""MCCompletePathV2 tests mirroring test/mccompletepathv2Test.cc: validation,
topology properties with Monte-Carlo-tolerant (GE-style) assertions, and
recall bands vs the exact oracle (the reference's own testing discipline for
stochastic results, mccompletepathv2Test.cc:124,314-315)."""

import numpy as np
import pytest

from approximated_personalized_pagerank_tpu import (
    Graph,
    benchmark_algorithm,
    execution_order,
    mccompletepathv2,
    mccompletepathv2_baskets,
)

SEED = 1234


def test_validation_messages():
    g = Graph.from_dict({0: [1], 1: []})
    with pytest.raises(ValueError, match="K must be positive"):
        mccompletepathv2(g, 0, 3, 42, 0.5)
    with pytest.raises(ValueError, match="L must be positive"):
        mccompletepathv2(g, 1, 0, 42, 0.5)
    with pytest.raises(ValueError, match="K must be <= L"):
        mccompletepathv2(g, 5, 3, 42, 0.5)
    with pytest.raises(ValueError, match="iterations must be positive"):
        mccompletepathv2(g, 3, 3, 0, 0.5)
    with pytest.raises(ValueError, match=r"damping must be \[0,1\]"):
        mccompletepathv2(g, 3, 3, 42, 1.5)


def test_empty_graph():
    assert mccompletepathv2(Graph.from_dict({}), 3, 5, 10, 0.85) == {}


def test_edgeless_nodes_basket_is_one():
    # mccompletepathv2Test.cc:38-50: nodes with no edges end with {self: 1.0}
    # (unnormalized walk counts).
    g = Graph.from_dict({i: [] for i in range(4)})
    res = mccompletepathv2(g, 3, 5, 100, 0.85, seed=SEED)
    for i in range(4):
        assert res[i] == pytest.approx({i: 1.0})


def test_basket_size_at_most_K(rng):
    g = Graph.from_dict(
        {i: rng.integers(0, 10, size=3).tolist() for i in range(10)}
    )
    for K in (1, 3, 8):
        res = mccompletepathv2(g, K, max(K, 10), 200, 0.85, seed=SEED)
        assert all(len(b) <= K for b in res.values())


def test_cycle_scores_decrease_with_distance():
    # GE-style: Monte-Carlo noise tolerated via >= (mccompletepathv2Test.cc:124).
    n = 5
    g = Graph.from_dict({i: [(i + 1) % n] for i in range(n)})
    res = mccompletepathv2(g, n, n, 2000, 0.85, seed=SEED)
    for src in range(n):
        vals = [res[src].get((src + d) % n, 0.0) for d in range(n)]
        assert all(vals[i] >= vals[i + 1] for i in range(n - 1))
        assert vals[0] > vals[-1]


def test_deterministic_given_seed():
    g = Graph.from_dict({0: [1, 2], 1: [2], 2: [0], 3: [0]})
    a = mccompletepathv2(g, 3, 6, 500, 0.85, seed=77)
    b = mccompletepathv2(g, 3, 6, 500, 0.85, seed=77)
    assert a == b


def test_recall_band_vs_exact(rng):
    # Operating-band check (thesis p.18: L = 5-10x K, R = 200-1000 gives
    # good results): jaccard vs exact must be high on a random graph.
    n = 60
    src = rng.integers(0, n, size=600)
    dst = rng.integers(0, n, size=600)
    g = Graph.from_edges(src, dst, num_nodes=n)
    baskets = mccompletepathv2_baskets(g, 10, 60, 1000, 0.85, seed=SEED)
    stats = benchmark_algorithm(baskets, g, 40, True, seed=0)
    assert stats["jaccard average"] >= 0.75
    assert stats["kendall average"] >= 0.6


def test_combine_passes_improve_or_hold(rng):
    n = 40
    src = rng.integers(0, n, size=300)
    dst = rng.integers(0, n, size=300)
    g = Graph.from_edges(src, dst, num_nodes=n)
    b1 = mccompletepathv2_baskets(g, 10, 40, 300, 0.85, seed=SEED)
    b2 = mccompletepathv2_baskets(
        g, 10, 40, 300, 0.85, seed=SEED, combine_passes=3
    )
    s1 = benchmark_algorithm(b1, g, 30, True, seed=0)
    s2 = benchmark_algorithm(b2, g, 30, True, seed=0)
    # extra propagation must not collapse quality (usually improves it)
    assert s2["jaccard average"] >= s1["jaccard average"] - 0.05


def test_execution_order_is_permutation():
    g = Graph.from_dict({0: [1, 2], 1: [2], 2: [3], 3: []})
    order = execution_order(g)
    assert sorted(order) == list(range(4))
    # node 3 (dangling, max indegree path end) must precede its predecessors
    # being *finalizable*; at minimum the order is a valid permutation and
    # the highest-indegree node comes first (mccompletepathv2.h:53-62).
    cind, _ = g.csc
    indeg = np.diff(cind)
    assert indeg[order[0]] == indeg.max()
