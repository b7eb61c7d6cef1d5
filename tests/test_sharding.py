"""Shard-count invariance: the TPU analogue of grankMultiThreadTest.cc's
parallel == serial oracle (sameAsGrank1..4 / singleThreadSameAsGrank1..4,
grankMultiThreadTest.cc:384-576).  Runs over virtual CPU devices (see
conftest.py)."""

import jax
import numpy as np
import pytest

from approximated_personalized_pagerank_tpu import (
    Graph,
    grank_baskets,
    grank_multi,
    grank_multi_baskets,
    grank,
)


def _graphs(rng):
    n = 24
    yield "cycle", Graph.from_dict({i: [(i + 1) % n] for i in range(n)})
    yield "star", Graph.from_dict(
        {0: list(range(1, 8)), **{i: [0] for i in range(1, 8)}}
    )
    src = rng.integers(0, n, size=200)
    dst = rng.integers(0, n, size=200)
    yield "random", Graph.from_edges(src, dst, num_nodes=n)
    yield "complete", Graph.from_dict(
        {i: [j for j in range(8) if j != i] for i in range(8)}
    )


def _basket_dicts_close(a, b, tol=1e-4):
    assert set(a) == set(b)
    for k in a:
        assert set(a[k]) == set(b[k]), f"id sets differ for source {k}"
        for n in a[k]:
            assert a[k][n] == pytest.approx(b[k][n], abs=tol)


def test_validation_n_shards():
    g = Graph.from_dict({0: [1], 1: []})
    with pytest.raises(ValueError, match="n_shards must be positive"):
        grank_multi(g, 1, 2, 5, 0.85, 1e-4, 0)


def test_too_many_shards_rejected():
    g = Graph.from_dict({0: [1], 1: []})
    with pytest.raises(ValueError, match="exceeds available devices"):
        grank_multi(g, 1, 2, 5, 0.85, 1e-4, 10_000)


def test_multi_shard_same_as_serial(rng):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    for name, g in _graphs(rng):
        serial = grank(g, 5, 10, 30, 0.85, 1e-4, engine="sparse")
        sharded = grank_multi(g, 5, 10, 30, 0.85, 1e-4, 4)
        _basket_dicts_close(serial, sharded)


def test_single_shard_same_as_serial(rng):
    for name, g in _graphs(rng):
        serial = grank(g, 5, 10, 30, 0.85, 1e-4, engine="sparse")
        one = grank_multi(g, 5, 10, 30, 0.85, 1e-4, 1)
        _basket_dicts_close(serial, one)


def test_sharded_result_is_row_sharded():
    g = Graph.from_dict({i: [(i + 1) % 16] for i in range(16)})
    baskets = grank_multi_baskets(g, 4, 8, 10, 0.85, 1e-4, 4)
    # result must be valid regardless of final layout; check values are live
    assert (np.asarray(baskets.ids) >= 0).sum() == 16 * 4


def test_ring_multi_round_budget_equivalent(rng):
    """A tiny candidate elem_budget forces the ring into several rounds
    (one rotation each); results must be identical to the single-round
    plan (parallel/ring.py build_ring_plan round grouping)."""
    from approximated_personalized_pagerank_tpu.parallel.ring import (
        build_ring_plan,
        ring_grank_baskets,
    )

    n = 48
    g = Graph.from_edges(
        rng.integers(0, n, size=400), rng.integers(0, n, size=400), num_nodes=n
    )
    big = ring_grank_baskets(g, 5, 10, 20, 0.85, 1e-4, n_shards=4)
    small = ring_grank_baskets(
        g, 5, 10, 20, 0.85, 1e-4, n_shards=4, elem_budget=64
    )
    plan = build_ring_plan(g, 0, 4, 10, elem_budget=64)
    assert len(plan.rounds) > 1, "budget did not split the plan into rounds"
    np.testing.assert_array_equal(np.asarray(big.ids), np.asarray(small.ids))
    np.testing.assert_allclose(
        np.asarray(big.scores), np.asarray(small.scores), atol=1e-6
    )


def test_mc_multi_same_as_serial(rng):
    """Sharded MC == serial MC with the same seed: the walks are bitwise
    identical (source-sharded data parallelism of the same program) and the
    ring combine is exact.  The reference has no parallel MC (grankMulti is
    GRank-only); this is a capability extension tested against our own
    serial implementation."""
    from approximated_personalized_pagerank_tpu import (
        mccompletepathv2_baskets,
        mccompletepathv2_multi_baskets,
    )

    n = 24
    g = Graph.from_dict({i: [(i + 1) % n, (i + 5) % n] for i in range(n)})
    # serial path must use the same chunking the mesh path rounds to
    serial = mccompletepathv2_baskets(
        g, 5, 10, 300, 0.85, seed=7, engine="sparse"
    )
    sharded = mccompletepathv2_multi_baskets(g, 5, 10, 300, 0.85, 4, seed=7)

    def rows(b):
        ids, sc = np.asarray(b.ids), np.asarray(b.scores)
        return [
            sorted((int(i), round(float(s), 5)) for i, s in zip(r, q) if i >= 0)
            for r, q in zip(ids, sc)
        ]

    # cross-engine coverage at the walk layer lives in
    # test_walk.test_trace_engine_equals_counts_engine
    assert rows(sharded) == rows(serial)


def test_oracle_sharded_same_as_serial(rng):
    from approximated_personalized_pagerank_tpu import ppr_single_source_batch
    from approximated_personalized_pagerank_tpu.parallel.mesh import make_mesh

    n = 30
    g = Graph.from_edges(
        rng.integers(0, n, size=150), rng.integers(0, n, size=150), num_nodes=n
    )
    sources = [0, 3, 7, 11, 19]  # 5 sources over 4 devices: exercises padding
    a = np.asarray(ppr_single_source_batch(g, sources, 50, 0.85, 1e-6))
    b = np.asarray(
        ppr_single_source_batch(g, sources, 50, 0.85, 1e-6, mesh=make_mesh(4))
    )
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_ring_per_device_memory_is_sharded():
    """The round-1 failure mode was GSPMD all-gathering the [N, L] basket
    per sweep (per-device peak ~ full-graph memory).  The ring program must
    keep a device's peak well under the full basket: ~2 basket shards + the
    bounded candidate round (parallel/ring.py module docstring).

    Runs in a SUBPROCESS: jax 0.9's XLA-CPU runtime segfaults handling this
    AOT-compiled (.compile() + memory_analysis) 8-device executable when
    the process has already loaded ~100 other compiled programs (full-suite
    runs crashed in both the cache-read and the fresh-compile paths at this
    exact call, while a fresh interpreter passes it every time — a
    process-state-dependent runtime bug, not a property of the program)."""
    import subprocess
    import sys

    code = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from approximated_personalized_pagerank_tpu import Graph
from approximated_personalized_pagerank_tpu.parallel.ring import ring_grank_baskets

rng = np.random.default_rng(12345)
n, e, L = 20_000, 200_000, 32
g = Graph.from_edges(rng.integers(0, n, size=e), rng.integers(0, n, size=e), num_nodes=n)
baskets, info = ring_grank_baskets(g, 16, L, 2, 0.85, -1.0, n_shards=8, analyze_memory=True)
assert (np.asarray(baskets.ids)[:, 0] >= 0).all()
mem = info["memory_analysis"]
full_basket_bytes = n * L * 8  # ids i32 + scores f32
assert mem.peak_memory_in_bytes < 0.5 * full_basket_bytes, (
    mem.peak_memory_in_bytes, full_basket_bytes)
print("RING_MEM_OK", mem.peak_memory_in_bytes, full_basket_bytes)
"""
    import os

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the subprocess CPU-only
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=repo,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "RING_MEM_OK" in proc.stdout
