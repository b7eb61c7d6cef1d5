"""Dense MXU engine tests: semantics parity with the sparse pipeline and with
the exact power-iteration oracle (the reference's sameAsPagerank discipline,
test/grankTest.cc:285-379), plus dense-specific edge cases (partition-empty
graphs, padding, renumbering round-trip)."""

import numpy as np
import pytest

from approximated_personalized_pagerank_tpu import (
    Graph,
    grank,
    grank_baskets,
    ppr_single_source,
)
from approximated_personalized_pagerank_tpu.ops.dense import use_dense_engine


def _random_graph(rng, n, e):
    return Graph.from_edges(
        rng.integers(0, n, size=e), rng.integers(0, n, size=e), num_nodes=n
    )


def _baskets_to_maps(b):
    ids = np.asarray(b.ids)
    scores = np.asarray(b.scores)
    out = []
    for r in range(ids.shape[0]):
        live = ids[r] >= 0
        out.append(dict(zip(ids[r][live].tolist(), scores[r][live].tolist())))
    return out


def _assert_map_close(a, b, tol=1e-4, msg=""):
    for k in set(a) | set(b):
        assert a.get(k, 0.0) == pytest.approx(b.get(k, 0.0), abs=tol), (
            f"{msg} key {k}"
        )


def _assert_basket_equiv(a, b, tol=1e-4, msg=""):
    """Tie-aware basket equality: score multisets match, and every key whose
    score is clearly above the truncation boundary matches.  Ties at the
    boundary are broken arbitrarily by both engines (and by the reference's
    std::nth_element, include/internal/pprInternal.h:110-137)."""
    va = sorted(a.values(), reverse=True)
    vb = sorted(b.values(), reverse=True)
    assert len(va) == len(vb), f"{msg}: sizes {len(va)} vs {len(vb)}"
    for x, y in zip(va, vb):
        assert x == pytest.approx(y, abs=tol), msg
    if va:
        thr = min(va) + 2 * tol
        ka = {k for k, v in a.items() if v > thr}
        kb = {k for k, v in b.items() if v > thr}
        assert ka == kb, f"{msg}: above-boundary keys differ"
    for k in set(a) & set(b):
        assert a[k] == pytest.approx(b[k], abs=tol), f"{msg} key {k}"


# ------------------------------------------------------------- engine select
def test_engine_resolution():
    assert use_dense_engine(100, "auto", None)
    assert not use_dense_engine(10**7, "auto", None)
    assert not use_dense_engine(100, "sparse", None)
    assert use_dense_engine(10**7, "dense", None)
    assert not use_dense_engine(100, "auto", object())  # mesh => sparse
    with pytest.raises(ValueError, match="unknown engine"):
        use_dense_engine(100, "mxu", None)


# --------------------------------------------------- dense == sparse oracle
@pytest.mark.parametrize(
    "topology",
    ["cycle", "star", "complete", "dangling", "parallel"],
)
def test_dense_matches_sparse(topology, rng):
    """Strict per-entry equivalence on tie-free topologies.

    Truncation ties (every successor of a node scores damping/outdeg at
    init, so any row where the top-L/top-K cut lands inside such a group is
    tied) are broken arbitrarily by both engines — and by the reference's
    std::nth_element — so strict equality is only meaningful where the cut
    never lands inside a tied group; tie-rich graphs are covered by the
    quality-parity test below.
    """
    if topology == "cycle":
        g = Graph.from_dict({i: [(i + 1) % 8] for i in range(8)})
    elif topology == "star":
        g = Graph.from_dict({0: list(range(1, 7)), **{i: [0] for i in range(1, 7)}})
    elif topology == "complete":
        g = Graph.from_dict({i: [j for j in range(9) if j != i] for i in range(9)})
    elif topology == "dangling":
        g = Graph.from_dict({0: [1, 2], 1: [2], 2: [], 3: []})
    else:  # parallel edges + self loop (include/grank.h:79-80 accumulation)
        g = Graph.from_dict({0: [0, 1, 1], 1: [0], 2: [0, 0, 0]})
    configs = [(5, 10, 25, 1e-4)]
    if topology in ("cycle", "dangling", "parallel"):
        configs.append((3, 3, 7, -1.0))
    for K, L, iters, tol in configs:
        sparse = grank_baskets(g, K, L, iters, 0.85, tol, engine="sparse")
        dense = grank_baskets(
            g, K, L, iters, 0.85, tol, engine="dense",
            matmul_dtype=np.float32, exact_trunc=True,
        )
        sm = _baskets_to_maps(sparse)
        dm = _baskets_to_maps(dense)
        for v in range(g.num_nodes):
            _assert_basket_equiv(sm[v], dm[v], tol=1e-4, msg=f"{topology} node {v}")


def test_dense_sparse_quality_parity(rng):
    """On tie-rich random graphs the engines keep different tied entries, so
    per-entry equality is meaningless — but measured against the exact
    oracle (whose boundary ties penalize both engines alike) dense quality
    must be at least sparse quality, and shared keys must score alike."""
    from approximated_personalized_pagerank_tpu import benchmark_algorithm

    # Widely varying out-degrees so contribution values mostly differ (in a
    # uniform-degree graph every candidate ties and jaccard-vs-exact becomes
    # a lottery over tie choices for *any* correct implementation).
    g = Graph.from_dict(
        {
            i: rng.choice(40, size=int(rng.integers(1, 15)), replace=False).tolist()
            for i in range(40)
        }
    )
    sparse = grank_baskets(g, 5, 10, 25, 0.85, 1e-4, engine="sparse")
    dense = grank_baskets(
        g, 5, 10, 25, 0.85, 1e-4, engine="dense", matmul_dtype=np.float32
    )
    js = benchmark_algorithm(sparse, g, 40, False, seed=7)
    jd = benchmark_algorithm(dense, g, 40, False, seed=7)
    assert jd["jaccard average"] >= js["jaccard average"] - 0.05, (js, jd)
    sm = _baskets_to_maps(sparse)
    dm = _baskets_to_maps(dense)
    for v in range(g.num_nodes):
        for k in set(sm[v]) & set(dm[v]):
            assert sm[v][k] == pytest.approx(dm[v][k], abs=5e-3)


def test_dense_same_as_pagerank(rng):
    # Untruncated dense GRank converges to exact PPR (sameAsPagerank tier).
    n = 30
    g = _random_graph(rng, n, 400)
    res = grank(g, n, n, 100, 0.85, -1.0, engine="dense", matmul_dtype=np.float32)
    for src in range(0, n, 5):
        exact = ppr_single_source(g, 100, 0.85, -1.0, src)
        _assert_map_close(res[src], exact, tol=1e-4, msg=f"src {src}")


# ----------------------------------------------------------- edge behaviors
def test_dense_edgeless_graph():
    # All nodes in partition 0; partition 1 is empty (n1 == 0 path).
    g = Graph.from_dict({i: [] for i in range(5)})
    res = grank(g, 3, 5, 10, 0.85, 1e-4, engine="dense")
    for i in range(5):
        assert res[i] == pytest.approx({i: 0.15})


def test_dense_single_node_self_loop():
    g = Graph.from_dict({0: [0]})
    res = grank(g, 1, 1, 100, 0.85, 1e-8, engine="dense", matmul_dtype=np.float32)
    # Self loop: s = 0.15 + 0.85 s  =>  s = 1.
    assert res[0][0] == pytest.approx(1.0, abs=1e-4)


def test_dense_K_boundaries():
    n = 5
    g = Graph.from_dict({i: [(i + 1) % n] for i in range(n)})
    small = grank(g, 2, 5, 30, 0.85, 1e-4, engine="dense")
    assert all(len(b) == 2 for b in small.values())
    big = grank(g, 50, 100, 30, 0.85, 1e-4, engine="dense")
    assert all(len(b) == n for b in big.values())


def test_dense_tolerance_modes(rng):
    g = _random_graph(rng, 20, 200)
    a = grank(g, 20, 20, 100, 0.85, 0.0, engine="dense", matmul_dtype=np.float32)
    b = grank(g, 20, 20, 100, 0.85, -1.0, engine="dense", matmul_dtype=np.float32)
    for v in a:
        _assert_map_close(a[v], b[v], tol=1e-7)
    r2 = grank(g, 20, 20, 2, 0.85, -1.0, engine="dense", matmul_dtype=np.float32)
    assert any(
        r2[v] != pytest.approx(b[v]) for v in r2
    ), "2 iterations must differ from 100"


def test_dense_early_stop_matches_sparse():
    # The per-partition maxDiff accounting must stop on the same half-sweep.
    # Tie-free graph: a cycle with chords (distinct distances => distinct
    # scores, so truncation never cuts inside a tied group).
    n = 25
    g = Graph.from_dict(
        {
            i: [(i + 1) % n] + ([(i + 7) % n] if i % 3 == 0 else [])
            for i in range(n)
        }
    )
    for tol in (0.5, 1e-2, 1e-6):
        sparse = grank(g, 4, 8, 40, 0.85, tol, engine="sparse")
        dense = grank(
            g, 4, 8, 40, 0.85, tol, engine="dense",
            matmul_dtype=np.float32, exact_trunc=True,
        )
        for v in sparse:
            _assert_basket_equiv(sparse[v], dense[v], tol=1e-4, msg=f"tol {tol}")
