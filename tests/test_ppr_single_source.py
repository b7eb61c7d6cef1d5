"""Exact-oracle tests mirroring test/internal/pprSingleSourceTest.cc:
validation, fixed topologies with hand-reasoned score orderings, plus an
independent sparse-map re-implementation of the reference sweep
(pprSingleSource.h:45-72) as an exact cross-check on random graphs."""

import numpy as np
import pytest

from approximated_personalized_pagerank_tpu import Graph, ppr_single_source
from approximated_personalized_pagerank_tpu.models.ppr_single_source import (
    ppr_single_source_batch,
)


def reference_ppr(adj, iterations, damping, tolerance, source):
    """Sparse-map power iteration, literal transcription of the semantics of
    pprSingleSource.h:42-74 (dangling mass loss included)."""
    scores = {source: 1.0}
    diff = tolerance
    i = 0
    while i < iterations and diff >= tolerance:
        nxt = {source: 1.0 - damping}
        for father, score in scores.items():
            succs = adj[father]
            if succs:
                f = damping / len(succs)
                for s in succs:
                    nxt[s] = nxt.get(s, 0.0) + score * f
        diff = sum(
            abs(scores.get(k, 0.0) - nxt.get(k, 0.0))
            for k in set(scores) | set(nxt)
        )
        scores = nxt
        i += 1
    return scores


# ------------------------------------------------------------- validation
def test_validation_iterations():
    g = Graph.from_dict({0: []})
    with pytest.raises(ValueError, match="iterations must be positive"):
        ppr_single_source(g, 0, 0.85, 1e-4, 0)


def test_validation_damping():
    g = Graph.from_dict({0: []})
    with pytest.raises(ValueError, match=r"damping must be \[0,1\]"):
        ppr_single_source(g, 10, -0.1, 1e-4, 0)
    with pytest.raises(ValueError, match=r"damping must be \[0,1\]"):
        ppr_single_source(g, 10, 1.1, 1e-4, 0)


def test_validation_source():
    g = Graph.from_dict({0: []})
    with pytest.raises(ValueError, match="source node not part of the graph"):
        ppr_single_source(g, 10, 0.85, 1e-4, 42)


# ------------------------------------------------------------ topologies
def test_single_node():
    # Isolated node converges to {self: 1-damping} (pprSingleSourceTest death
    # oracle: score 0.15 at damping 0.85).
    g = Graph.from_dict({7: []})
    res = ppr_single_source(g, 100, 0.85, 1e-4, 7)
    assert res[7] == pytest.approx(0.15, abs=1e-6)


def test_cycle_scores_decay_with_distance():
    n = 5
    g = Graph.from_dict({i: [(i + 1) % n] for i in range(n)})
    res = ppr_single_source(g, 100, 0.85, 1e-6, 0)
    vals = [res[i] for i in range(n)]
    assert all(vals[i] > vals[i + 1] for i in range(n - 1))


def test_star_from_center():
    g = Graph.from_dict({0: [1, 2, 3], 1: [], 2: [], 3: []})
    res = ppr_single_source(g, 100, 0.85, 1e-6, 0)
    assert res[0] > res[1]
    assert res[1] == pytest.approx(res[2]) == pytest.approx(res[3])
    # Leaves receive exactly 0.85/3 of the source's converged score... and the
    # total never exceeds 1 (dangling leaves lose mass).
    assert sum(res.values()) <= 1.0 + 1e-6


def test_diamond():
    g = Graph.from_dict({0: [1, 2], 1: [3], 2: [3], 3: []})
    res = ppr_single_source(g, 100, 0.85, 1e-6, 0)
    assert res[0] > res[1]
    assert res[1] == pytest.approx(res[2])
    assert res[1] > res[3] or res[3] > res[1]  # both orders conceivable; just present
    assert set(res) == {0, 1, 2, 3}


def test_matches_reference_sweep_random(rng):
    # Exact comparison against the sparse transcription on random graphs.
    for trial in range(3):
        n = 30
        adj = {
            i: rng.integers(0, n, size=rng.integers(0, 6)).tolist()
            for i in range(n)
        }
        g = Graph.from_dict(adj)
        # Graph.from_dict interns keys; adjacency uses the same int keys.
        for src in rng.integers(0, n, size=3):
            src = int(src)
            expect = reference_ppr(adj, 40, 0.85, 1e-5, src)
            got = ppr_single_source(g, 40, 0.85, 1e-5, src)
            for k in set(expect) | set(got):
                assert got.get(k, 0.0) == pytest.approx(
                    expect.get(k, 0.0), abs=1e-5
                ), f"mismatch at node {k} (source {src})"


def test_negative_tolerance_runs_all_iterations():
    # tolerance < 0 must never early-stop (pprSingleSource.h:23-25).
    g = Graph.from_dict({0: [1], 1: [0]})
    r_few = ppr_single_source(g, 2, 0.85, -1.0, 0)
    r_many = ppr_single_source(g, 200, 0.85, -1.0, 0)
    # with more iterations the result keeps refining toward the fixed point
    assert abs(r_many[0] - r_few[0]) > 0


def test_tolerance_stop_close_to_converged():
    g = Graph.from_dict({0: [1], 1: [0]})
    r_tol = ppr_single_source(g, 1000, 0.85, 1e-7, 0)
    r_full = ppr_single_source(g, 1000, 0.85, -1.0, 0)
    assert r_tol[0] == pytest.approx(r_full[0], abs=1e-5)


def test_oracle_chunked_equals_unchunked():
    """Forcing the per-bucket gather into MANY chunks (tiny elem budget)
    must not change the result.  Regression: a round-3 bug mapped the
    chunk loop over chunk indices k while slicing the flat ELL at k*cap
    (instead of k*chunk*cap), so every chunk after the first read wrong
    predecessor rows — silently corrupting the oracle exactly when the
    batch/graph size made any bucket multi-chunk (jaccard 0.14 at the 4.8M
    north star read as 'instance hardness' for half a round)."""
    rng = np.random.default_rng(8)
    n = 300
    g = Graph.from_edges(
        rng.integers(0, n, 4000), rng.integers(0, n, 4000), num_nodes=n
    )
    sources = list(range(24))
    ref = np.asarray(
        ppr_single_source_batch(g, sources, 60, 0.85, 1e-6)
    )
    chunked = np.asarray(
        ppr_single_source_batch(
            g, sources, 60, 0.85, 1e-6, edge_elem_budget=256
        )
    )
    np.testing.assert_allclose(ref, chunked, atol=1e-6)
    # mass conservation: every PPR vector sums to <= 1 (+ float slack)
    assert np.asarray(ref).sum(axis=1).max() <= 1.0 + 1e-4
