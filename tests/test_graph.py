"""Graph ingest, CSR structure, vocab, and partition tests.

Partition cases mirror test/internal/findPartitionsTest.cc: only partition
*sizes* are asserted, accepting either orientation (findPartitionsTest.cc:46-48),
plus the validity invariant (every node colored, colors in {0,1}).
"""

import numpy as np
import pytest

from approximated_personalized_pagerank_tpu import Graph, load_csv_graph


def test_from_dict_basic():
    g = Graph.from_dict({0: [1, 2], 1: [2], 2: []})
    assert g.num_nodes == 3
    assert g.num_edges == 3
    assert list(g.successors(g.key_to_id(0))) == [g.key_to_id(1), g.key_to_id(2)]
    assert g.out_degree[g.key_to_id(2)] == 0


def test_from_dict_auto_registers_targets():
    # Reference requires targets to be keys; we auto-register like the CSV
    # importer (src/main.cc:97-99).
    g = Graph.from_dict({"a": ["b"]})
    assert g.num_nodes == 2
    assert "b" in g


def test_from_dict_arbitrary_keys():
    g = Graph.from_dict({"x": ["y", "z"], "y": ["x"], "z": []})
    assert g.num_nodes == 3
    assert g.key_to_id("x") != g.key_to_id("y")
    rt = g.to_dict()
    assert set(rt["x"]) == {"y", "z"}
    assert rt["z"] == []


def test_parallel_edges_kept():
    g = Graph.from_dict({0: [1, 1, 1], 1: []})
    assert g.num_edges == 3


def test_csc_predecessors():
    g = Graph.from_dict({0: [1, 2], 1: [2], 2: []})
    cindptr, cindices = g.csc
    two = g.key_to_id(2)
    preds = set(cindices[cindptr[two] : cindptr[two + 1]].tolist())
    assert preds == {g.key_to_id(0), g.key_to_id(1)}


def _partition_sizes(g):
    p = g.partition
    assert set(np.unique(p).tolist()) <= {0, 1}
    return sorted([int((p == 0).sum()), int((p == 1).sum())])


def test_partitions_empty_graph():
    g = Graph.from_dict({})
    assert g.num_nodes == 0
    assert _partition_sizes(g) == [0, 0]


def test_partitions_no_edges():
    # All isolated nodes become BFS roots -> all in partition 0
    # (findPartitionsTest.cc "no edges" case).
    g = Graph.from_dict({i: [] for i in range(10)})
    assert _partition_sizes(g) == [0, 10]


def test_partitions_star():
    # Star: center vs n-1 leaves.
    n = 9
    g = Graph.from_dict({0: list(range(1, n)), **{i: [] for i in range(1, n)}})
    assert _partition_sizes(g) == [1, n - 1]


def test_partitions_paired_nodes():
    # n disjoint edges: n vs n split.
    g = Graph.from_dict(
        {**{2 * i: [2 * i + 1] for i in range(5)}, **{2 * i + 1: [] for i in range(5)}}
    )
    assert _partition_sizes(g) == [5, 5]


def test_partitions_complete_bipartite():
    left = list(range(3))
    right = list(range(3, 8))
    g = Graph.from_dict(
        {**{l: right for l in left}, **{r: [] for r in right}}
    )
    assert _partition_sizes(g) == [3, 5]


def test_partitions_even_cycle_proper_coloring():
    n = 6
    g = Graph.from_dict({i: [(i + 1) % n] for i in range(n)})
    p = g.partition
    # Even cycles are 2-colorable: every edge crosses partitions.
    for i in range(n):
        assert p[g.key_to_id(i)] != p[g.key_to_id((i + 1) % n)]


def test_merge_plan_buckets():
    g = Graph.from_dict({0: [1], 1: [2, 3], 2: [0, 1, 3], 3: []})
    plan = g.merge_plan(None)
    total_rows = sum(b.rows.size for b in plan.buckets)
    assert total_rows + plan.dangling_rows.size == g.num_nodes
    for b in plan.buckets:
        deg = (b.succ >= 0).sum(axis=1)
        assert (deg > 0).all()
        assert (deg <= b.cap).all()
        assert (deg > b.cap // 2).all() or b.cap == 1
        # padded slots are -1, real slots valid node ids
        real = b.succ[b.succ >= 0]
        assert (real < g.num_nodes).all()


def test_csv_import(tmp_path):
    # Mirrors importGraph semantics (src/main.cc:78-112): dedup + target
    # auto-registration + \r\n tolerance.
    p = tmp_path / "g.csv"
    p.write_bytes(b"1,2\r\n2,3\n1,2\n3,1\n4,5\n")
    g = load_csv_graph(str(p))
    assert g.num_nodes == 5
    assert g.num_edges == 4  # duplicate 1,2 dropped
    succ_of_1 = {g.id_to_key(s) for s in g.successors(g.key_to_id(1))}
    assert succ_of_1 == {2}
    assert 5 in g  # target-only node registered


def test_csv_import_example_graph_counts():
    # The reference's printout for example.txt is "nodes: 23132 edges: 312310"
    # (validated by running the driver).  Only run when the dataset exists.
    import os

    path = "/root/reference/example.txt"
    if not os.path.exists(path):
        pytest.skip("reference dataset not available")
    g = load_csv_graph(path)
    assert g.num_nodes == 23132
    assert g.num_edges == 312310
