"""Benchmark-harness tests mirroring test/benchmarkAlgorithmTest.cc:
validation, -1 sentinels, self-comparison => 1.0 stats, disjoint-top =>
jaccard 0, negated scores => jaccard 1 & kendall -1, constructed overlap."""

import numpy as np
import pytest

from approximated_personalized_pagerank_tpu import Graph, ppr_single_source
from approximated_personalized_pagerank_tpu.models.benchmark import (
    benchmark_algorithm,
)


def _exact_topk_result(g, K):
    """Build the reference-shaped result dict from the exact oracle itself
    (benchmarkAlgorithmTest.cc:66-100 self-comparison setup)."""
    out = {}
    for k in g.keys:
        exact = ppr_single_source(g, 100, 0.85, 1e-4, k)
        top = dict(sorted(exact.items(), key=lambda kv: -kv[1])[:K])
        out[k] = top
    return out


@pytest.fixture
def small_graph():
    return Graph.from_dict(
        {0: [1, 2], 1: [2, 3], 2: [0], 3: [0, 1], 4: [0]}
    )


def test_validation_test_nodes(small_graph):
    with pytest.raises(ValueError, match="testNodes must be positive"):
        benchmark_algorithm({}, small_graph, 0, False)


def test_unknown_node_rejected(small_graph):
    with pytest.raises(ValueError, match="not part of the provided graph"):
        benchmark_algorithm({42: {42: 1.0}}, small_graph, 5, False)


def test_empty_result_sentinels(small_graph):
    stats = benchmark_algorithm({}, small_graph, 5, False)
    assert all(stats[k] == -1.0 for k in stats)


def test_strict_filters_everything():
    g = Graph.from_dict({0: [], 1: []})
    result = {0: {0: 0.15}, 1: {1: 0.15}}
    stats = benchmark_algorithm(result, g, 5, True)
    assert all(stats[k] == -1.0 for k in stats)
    # non-strict evaluates them
    stats2 = benchmark_algorithm(result, g, 5, False, seed=0)
    assert stats2["jaccard average"] == pytest.approx(1.0)


def test_self_comparison_all_ones(small_graph):
    result = _exact_topk_result(small_graph, K=3)
    stats = benchmark_algorithm(result, small_graph, 5, True, seed=0)
    assert stats["jaccard average"] == pytest.approx(1.0)
    assert stats["jaccard min"] == pytest.approx(1.0)
    assert stats["kendall average"] == pytest.approx(1.0, abs=1e-6)
    assert stats["kendall min"] == pytest.approx(1.0, abs=1e-6)
    assert stats["average map size"] == pytest.approx(3.0)
    assert stats["recall average"] == pytest.approx(1.0)


def test_negated_scores_jaccard_one_kendall_minus_one(small_graph):
    # benchmarkAlgorithmTest.cc:117-137: same id set, reversed order.
    result = _exact_topk_result(small_graph, K=3)
    negated = {
        k: {n: -s for n, s in basket.items()} for k, basket in result.items()
    }
    stats = benchmark_algorithm(negated, small_graph, 5, True, seed=0)
    assert stats["jaccard average"] == pytest.approx(1.0)
    assert stats["kendall average"] == pytest.approx(-1.0, abs=1e-6)


def test_disjoint_top_jaccard_zero():
    # A result pointing at nodes the exact top never contains
    # (benchmarkAlgorithmTest.cc:102-115).
    g = Graph.from_dict({0: [1], 1: [0], 2: [], 3: []})
    result = {0: {2: 1.0, 3: 0.5}}
    stats = benchmark_algorithm(result, g, 5, True, seed=0)
    assert stats["jaccard average"] == pytest.approx(0.0)
    assert stats["jaccard min"] == pytest.approx(0.0)


def test_partial_overlap_half():
    # Construct a half-overlap like benchmarkAlgorithmTest.cc:139-160:
    # exact top-2 of source 0 in a 2-cycle is {0, 1}; provide {0, 2}.
    g = Graph.from_dict({0: [1], 1: [0], 2: []})
    result = {0: {0: 1.0, 2: 0.5}}
    stats = benchmark_algorithm(result, g, 5, True, seed=0)
    # |{0,2} ∩ {0,1}| = 1, union 3 -> jaccard 1/3
    assert stats["jaccard average"] == pytest.approx(1 / 3)


def test_test_nodes_caps_sampling(small_graph):
    result = _exact_topk_result(small_graph, K=2)
    stats = benchmark_algorithm(result, small_graph, 2, False, seed=1)
    assert stats["average map size"] == pytest.approx(2.0)
