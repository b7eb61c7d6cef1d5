"""Walk-engine invariants: quota accounting, mass conservation bands,
determinism, and chunk-boundary consistency (ops/walk.py)."""

import numpy as np
import pytest

from approximated_personalized_pagerank_tpu import Graph
from approximated_personalized_pagerank_tpu.ops.walk import (
    _horizon,
    walk_baskets,
    walk_count_chunks,
)


def test_work_stealing_walk_count_exact():
    """The shared per-source walk pool must run EXACTLY floor(R*damping)
    walks: on a self-loop graph every hop of every walk visits the source,
    so the normalized self-count is 1 + floor(R*d)/R * E[len] and walk
    starts can be audited from the total visit mass."""
    n, r, damping = 8, 400, 0.5
    g = Graph.from_dict({i: [i] for i in range(n)})  # self-loops: deg 1
    total = np.zeros(n)
    for s, c, _a in walk_count_chunks(g, r, damping, seed=3):
        arr = np.asarray(c)
        total[s : s + arr.shape[0]] += arr.sum(axis=1)
    # E[len] = 1/(1-d) = 2; mass = 1 + 200/400 * 2 = 2.0 per source
    expect = 1.0 + int(r * damping) / r / (1.0 - damping)
    assert abs(total.mean() - expect) < 0.15, (total.mean(), expect)


def test_horizon_bounds():
    # enough steps for the mean, not absurdly more
    h = _horizon(850, 128, 0.85)
    q = -(-850 // 128)
    assert h >= q / 0.15
    assert h <= 4 * q / 0.15 + 64


def test_visit_mass_band():
    # On a cycle (no dangling nodes) the normalized visit mass per source is
    # 1 (source seed, = R/R) + floor(R*damping)/R * E[walk length]
    # with E[len] = 1/(1-damping); the step horizon may shave <~1%.
    n, r, damping = 32, 2000, 0.85
    g = Graph.from_dict({i: [(i + 1) % n] for i in range(n)})
    total = np.zeros(n)
    for s, c, _a in walk_count_chunks(g, r, damping, seed=7):
        arr = np.asarray(c)
        total[s : s + arr.shape[0]] += arr.sum(axis=1)
    expect = 1.0 + int(r * damping) / r / (1.0 - damping)
    assert abs(total.mean() - expect) < 0.3, (total.mean(), expect)
    # never OVER the expectation band (the horizon only abandons walks)
    assert total.mean() < expect + 0.2


def test_walks_deterministic_given_seed():
    g = Graph.from_dict({i: [(i + 1) % 6, (i + 2) % 6] for i in range(6)})
    a = walk_baskets(g, 4, 500, 0.85, seed=3)
    b = walk_baskets(g, 4, 500, 0.85, seed=3)
    assert np.array_equal(np.asarray(a.ids), np.asarray(b.ids))
    assert np.array_equal(np.asarray(a.scores), np.asarray(b.scores))
    c = walk_baskets(g, 4, 500, 0.85, seed=4)
    assert not np.array_equal(np.asarray(a.scores), np.asarray(c.scores))


def test_dangling_source_is_unit_self():
    g = Graph.from_dict({0: [1], 1: []})
    b = walk_baskets(g, 3, 100, 0.85, seed=0)
    ids = np.asarray(b.ids)
    scores = np.asarray(b.scores)
    assert ids[1][0] == 1 and scores[1][0] == pytest.approx(1.0)
    assert (ids[1][1:] == -1).all()


def test_trace_engine_equals_counts_engine():
    """The trace engine draws the same PRNG stream as the dense-count engine;
    for equal (seed, source_chunk, slots) the per-source (id, count) basket
    multisets must be identical."""
    rng = np.random.default_rng(5)
    g = Graph.from_edges(
        rng.integers(0, 50, 400), rng.integers(0, 50, 400), num_nodes=50
    )
    kw = dict(seed=11, source_chunk=16, slots=8)
    a, ia = walk_baskets(g, 10, 300, 0.85, engine="counts", return_info=True, **kw)
    b, ib = walk_baskets(g, 10, 300, 0.85, engine="trace", return_info=True, **kw)
    assert ia["walk_steps"] == ib["walk_steps"] > 0

    def rows(bask):
        ids, sc = np.asarray(bask.ids), np.asarray(bask.scores)
        return [
            sorted((int(i), round(float(s), 6)) for i, s in zip(r, q) if i >= 0)
            for r, q in zip(ids, sc)
        ]

    assert rows(a) == rows(b)


def test_trace_engine_dangling_and_empty():
    g = Graph.from_dict({0: [1], 1: []})
    b = walk_baskets(g, 3, 100, 0.85, seed=0, engine="trace")
    ids, scores = np.asarray(b.ids), np.asarray(b.scores)
    assert ids[1][0] == 1 and scores[1][0] == pytest.approx(1.0)
    assert (ids[1][1:] == -1).all()
    # no-edge graph: every basket is exactly {v: 1.0}
    g2 = Graph.from_dict({0: [], 1: []})
    b2 = walk_baskets(g2, 2, 50, 0.85, seed=0, engine="trace")
    assert np.asarray(b2.ids)[:, 0].tolist() == [0, 1]
    np.testing.assert_allclose(np.asarray(b2.scores)[:, 0], 1.0)


def test_mc_end_to_end_with_trace_engine():
    """MCCompletePathV2 through the trace walk engine (the auto default)
    matches the quality of the counts engine on a small cycle-ish graph:
    top-1 must be the source itself for every node."""
    from approximated_personalized_pagerank_tpu import mccompletepathv2_baskets

    n = 20
    g = Graph.from_dict({i: [(i + 1) % n, (i + 3) % n] for i in range(n)})
    b = mccompletepathv2_baskets(g, 5, 10, 500, 0.85, seed=2, engine="sparse")
    ids = np.asarray(b.ids)
    assert (ids[:, 0] == np.arange(n)).all()


def test_abandoned_walks_counted_and_rare():
    """Walks cut off by the step horizon must be measured (return_info) and
    stay under 0.5% of launched walks — the divergence bound vs the
    reference's never-truncating do-while (mccompletepathv2.h:142-155)."""
    n = 64
    # cycle: every walk runs to its geometric end (no stranding) — the
    # worst case for the horizon
    g = Graph.from_dict({i: [(i + 1) % n] for i in range(n)})
    for engine in ("counts", "trace"):
        _, info = walk_baskets(
            g, 10, 1000, 0.85, seed=9, engine=engine, return_info=True
        )
        assert info["total_walks"] == n * int(1000 * 0.85)
        frac = info["abandoned_walks"] / info["total_walks"]
        assert frac < 0.005, (engine, info)


def test_abandoned_zero_with_generous_horizon():
    g = Graph.from_dict({i: [(i + 1) % 8] for i in range(8)})
    _, info = walk_baskets(
        g, 4, 50, 0.85, seed=1, engine="counts", max_steps=5000,
        return_info=True,
    )
    assert info["abandoned_walks"] == 0


def test_chunked_equals_one_chunk_totals():
    # chunking only batches sources; totals per source must be seeded per
    # chunk but the *distribution* invariants hold: compare visit-mass sums.
    n, r = 24, 1000
    g = Graph.from_dict({i: [(i + 1) % n, (i + 5) % n] for i in range(n)})
    sums = []
    for chunk in (6, 24):
        total = np.zeros(n)
        for s, c, _a in walk_count_chunks(g, r, 0.85, seed=11, source_chunk=chunk):
            arr = np.asarray(c)
            total[s : s + arr.shape[0]] += arr.sum(axis=1)
        sums.append(total.mean())
    assert abs(sums[0] - sums[1]) < 0.3, sums


def test_stratified_deterministic_given_seed():
    """successor_choice='stratified' must be exactly reproducible for a
    fixed seed (the TPU replacement for the reference's entropy-seeded
    rotating index, include/mccompletepathv2.h:32-34,142-151)."""
    n = 30
    g = Graph.from_dict({i: [(i + 1) % n, (i + 2) % n, (i + 7) % n] for i in range(n)})
    a = walk_baskets(g, 10, 200, 0.85, seed=5, stratified=True)
    b = walk_baskets(g, 10, 200, 0.85, seed=5, stratified=True)
    assert (np.asarray(a.ids) == np.asarray(b.ids)).all()
    assert (np.asarray(a.scores) == np.asarray(b.scores)).all()


def test_stratified_first_hop_covers_successors():
    """With slots >= out-degree, a source's cohort takes evenly spaced
    FIRST edges: every successor is covered by the first hop (the coverage
    property the reference's rotating index provides serially, thesis p.7)."""
    # star: center 0 -> 8 leaves; leaves are dangling (walks end there)
    g = Graph.from_dict({0: list(range(1, 9)), **{i: [] for i in range(1, 9)}})
    b = walk_baskets(g, 9, 100, 0.85, seed=0, slots=8, stratified=True)
    ids = set(np.asarray(b.ids)[0])
    # every leaf got at least one visit => appears in the top-9 basket
    assert set(range(1, 9)).issubset(ids), ids


def test_stratified_marginal_uniform():
    """Marginally each stratified choice stays uniform: over many seeds the
    per-successor first-hop visit frequencies from a single source must
    approach 1/deg each (the offset is modulo out-degree and the shared
    base draw is itself uniform)."""
    deg = 4
    g = Graph.from_dict({0: list(range(1, deg + 1)), **{i: [] for i in range(1, deg + 1)}})
    counts = np.zeros(deg + 1)
    for seed in range(20):
        for s, c, _a in walk_count_chunks(g, 40, 0.85, seed=seed, stratified=True):
            counts += np.asarray(c)[0] * 40  # denormalize to raw visits
    leaf = counts[1:]
    freq = leaf / leaf.sum()
    assert np.allclose(freq, 1.0 / deg, atol=0.04), freq


def test_stratified_lower_first_hop_variance_than_uniform():
    """The point of stratification: per-successor first-hop counts must be
    closer to the uniform target than independent draws (lower dispersion),
    measured across seeds on a single-source star."""
    deg = 8
    g = Graph.from_dict({0: list(range(1, deg + 1)), **{i: [] for i in range(1, deg + 1)}})

    def dispersion(stratified):
        disp = 0.0
        for seed in range(12):
            for s, c, _a in walk_count_chunks(
                g, 48, 0.85, seed=seed, stratified=stratified
            ):
                raw = np.asarray(c)[0, 1 : deg + 1] * 48
                disp += float(((raw - raw.mean()) ** 2).mean())
        return disp

    assert dispersion(True) < dispersion(False)


def test_stratified_trace_equals_counts_stream():
    """Both engines must draw the SAME stratified stream: identical visit
    multisets for equal (seed, slots, unroll)."""
    n = 16
    g = Graph.from_dict({i: [(i + 1) % n, (i + 3) % n] for i in range(n)})
    a = walk_baskets(g, n, 300, 0.85, seed=4, engine="counts", stratified=True)
    b = walk_baskets(g, n, 300, 0.85, seed=4, engine="trace", stratified=True)

    def rows(bk):
        ids, sc = np.asarray(bk.ids), np.asarray(bk.scores)
        return [
            {int(i): round(float(s), 6) for i, s in zip(ir, sr) if i >= 0}
            for ir, sr in zip(ids, sc)
        ]

    assert rows(a) == rows(b)


def test_pick_slots_minimizes_padded_width():
    """The planner's slot choice must hit the narrowest pow2 merge width
    the horizon fits, then maximize parallel slots (docs/PERF.md round 5:
    network-kernel compile/load cost scales ~W^1.6)."""
    from approximated_personalized_pagerank_tpu.ops.walk import (
        _horizon,
        _pick_slots,
        _trace_plan,
    )

    for r in (50, 100, 200, 300, 1000):
        total = int(r * 0.85)
        slots = _pick_slots(total, 0.85, 32)
        steps = _horizon(total, slots, 0.85)
        macro = -(-steps // 32)
        width = macro * 32 * slots
        padded = 1 << width.bit_length()
        # no slot count in the searched range does strictly better
        for s2 in range(16, 7, -1):
            st2 = _horizon(total, s2, 0.85)
            m2 = -(-st2 // 32)
            w2 = m2 * 32 * s2
            assert (1 << w2.bit_length()) >= padded
        # both engines' plans agree on the choice (bitwise stream parity)
        _, t_slots, _, _, _ = _trace_plan(r, 0.85, None, None, 32)
        assert t_slots == slots


def test_trace_chunk_respects_fault_guard():
    """source_chunk must keep _trace_topl's mapped kernel loop within
    MAX_MAP_CHUNKS segments (the v5e kernel-fault guard)."""
    from approximated_personalized_pagerank_tpu.ops.merge import MAX_MAP_CHUNKS
    from approximated_personalized_pagerank_tpu.ops.walk import (
        walk_trace_basket_chunks,
    )

    n = 600
    g = Graph.from_dict({i: [(i + 1) % n, (i + 7) % n] for i in range(n)})
    seen = 0
    for s, top, v, a in walk_trace_basket_chunks(
        g, 20, 200, 0.85, seed=1, source_chunk=4096
    ):
        rows = np.asarray(top.ids).shape[0]
        assert rows <= 4096
        seen += rows
    assert seen == n
