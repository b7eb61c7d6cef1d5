"""Packaging-adjacent coverage: CSV ingest edge cases, checkpoint roundtrip,
execution-order semantics, bundled sample data.

Mirrors reference behaviors: importGraph dedup/auto-registration
(src/main.cc:78-112) for ids of any magnitude (the reference's hash maps are
overflow-free; so must the vectorized dedup be), and executionOrder's
indegree-desc seeding + predecessor cascade (include/mccompletepathv2.h:36-113).
"""

import numpy as np
import pytest

from approximated_personalized_pagerank_tpu import (
    Graph,
    execution_order,
    load_csv_graph,
    sample_graph_path,
)
from approximated_personalized_pagerank_tpu.utils.checkpoint import (
    load_baskets,
    save_baskets,
)


# ------------------------------------------------------------------ CSV ingest
def test_csv_dedup_large_ids(tmp_path):
    """Edge dedup must be exact for external ids up to ~2^62 (the reference
    handles any ids via hash maps, src/main.cc:101-107; a src*(max+1)+dst
    packing would overflow and silently merge distinct edges)."""
    a, b, c = 1 << 40, (1 << 41) + 3, (1 << 62) - 7
    lines = [f"{a},{b}", f"{b},{a}", f"{a},{c}", f"{a},{b}", f"{c},{a}"]
    p = tmp_path / "big_ids.csv"
    p.write_text("\n".join(lines) + "\n")
    g = load_csv_graph(str(p))
    assert g.num_nodes == 3
    assert g.num_edges == 4  # one duplicate removed, nothing merged
    adj = g.to_dict()
    assert sorted(adj[a]) == sorted([b, c])
    assert adj[b] == [a]
    assert adj[c] == [a]


def test_csv_crlf_and_autoregister(tmp_path):
    p = tmp_path / "crlf.csv"
    p.write_text("1,2\r\n2,3\r\n1,2\r\n")
    g = load_csv_graph(str(p))
    assert g.num_nodes == 3  # 3 auto-registered as a dangling node
    assert g.num_edges == 2


def test_bundled_sample_loads():
    g = load_csv_graph(sample_graph_path())
    assert g.num_nodes == 2000
    assert g.num_edges > 10_000
    # external ids are sparse (7k+13) — vocab must round-trip
    assert g.id_to_key(g.key_to_id(13)) == 13


# ------------------------------------------------------------------ checkpoint
def _run_tiny(graph):
    from approximated_personalized_pagerank_tpu import grank_baskets

    return grank_baskets(graph, 3, 5, 10, 0.85, 1e-4)


def test_checkpoint_roundtrip_int_keys(tmp_path):
    g = Graph.from_dict({i: [(i + 1) % 6] for i in range(6)})
    baskets = _run_tiny(g)
    path = str(tmp_path / "b.npz")
    save_baskets(path, baskets, g)
    loaded, keys = load_baskets(path)
    np.testing.assert_array_equal(np.asarray(loaded.ids), np.asarray(baskets.ids))
    np.testing.assert_allclose(
        np.asarray(loaded.scores), np.asarray(baskets.scores)
    )
    np.testing.assert_array_equal(keys, np.arange(6))


def test_checkpoint_roundtrip_string_keys(tmp_path):
    g = Graph.from_dict(
        {"apple": ["pear"], "pear": ["plum"], "plum": ["apple"]}
    )
    baskets = _run_tiny(g)
    path = str(tmp_path / "s.npz")
    save_baskets(path, baskets, g)
    loaded, keys = load_baskets(path)
    assert list(keys) == ["apple", "pear", "plum"]
    np.testing.assert_array_equal(np.asarray(loaded.ids), np.asarray(baskets.ids))


def test_checkpoint_without_graph(tmp_path):
    g = Graph.from_dict({0: [1], 1: []})
    baskets = _run_tiny(g)
    path = str(tmp_path / "nokeys.npz")
    save_baskets(path, baskets)
    loaded, keys = load_baskets(path)
    assert keys is None
    np.testing.assert_array_equal(np.asarray(loaded.ids), np.asarray(baskets.ids))


# ------------------------------------------------------------- execution order
def test_execution_order_chain_is_reverse():
    """Chain 0->1->2->3: the sort seeds at 3 (indeg 1, outdeg 0 beats
    outdeg 1 ties) and the predecessor cascade unwinds the chain — the
    reference's greedy queue pass (mccompletepathv2.h:70-111) yields exactly
    reverse order."""
    g = Graph.from_dict({0: [1], 1: [2], 2: [3], 3: []})
    assert execution_order(g) == [3, 2, 1, 0]


def test_execution_order_indegree_seed_and_cascade():
    """Diamond-ish DAG 0->1, 2->1, 1->3: node 1 has the highest indegree so
    it seeds the order (mccompletepathv2.h:57-62); appending it zeroes its
    predecessors' waitFor so 0 and 2 cascade in immediately
    (mccompletepathv2.h:70-111); 3 comes from the sorted pass afterwards."""
    g = Graph.from_dict({0: [1], 1: [3], 2: [1], 3: []})
    order = execution_order(g)
    assert order[0] == 1
    assert set(order[1:3]) == {0, 2}  # cascade; tie order unspecified
    assert order[3] == 3


def test_execution_order_cycle_terminates_and_covers():
    g = Graph.from_dict({i: [(i + 1) % 5, (i + 2) % 5] for i in range(5)})
    order = execution_order(g)
    assert sorted(order) == list(range(5))


# ------------------------------------------------------------------------- CLI
def test_cli_runs_on_tiny_graph(tmp_path, capsys):
    from approximated_personalized_pagerank_tpu.cli import main

    p = tmp_path / "tiny.csv"
    p.write_text("\n".join(f"{i},{(i + 1) % 8}" for i in range(8)) + "\n")
    out_npz = tmp_path / "out.npz"
    rc = main(
        [
            "--graph", str(p), "--K", "3", "--L", "6", "--iterations", "10",
            "--test-nodes", "4", "--save", str(out_npz),
        ]
    )
    assert rc == 0
    captured = capsys.readouterr().out
    assert "nodes: 8 edges: 8" in captured
    assert "jaccard average" in captured
    loaded, keys = load_baskets(str(out_npz))
    assert np.asarray(loaded.ids).shape == (8, 3)
