"""Connected-components clustering: transitivity on synthetic graphs
(the testdata's planted dups are isolated pairs, so chains need a
hand-built graph)."""

from __future__ import annotations

import pandas as pd

from rdbms_metadata_manager_spark.llm.clustering import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["doc_a", "doc_b"]))
    return {
        r["node"]: r["label"] for r in connected_components(df).collect()
    }


def test_chain_collapses_to_one_cluster(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_chain_exceeding_one_hop(spark):
    """Diameter > 1 forces multiple fixpoint iterations."""
    chain = [(i, i + 1) for i in range(20, 30)]
    got = _cc(spark, chain)
    assert set(got.values()) == {20}


def test_star_and_cycle(spark):
    got = _cc(spark, [(5, 6), (5, 7), (5, 8), (6, 7), (100, 101), (101, 102), (102, 100)])
    assert {got[5], got[6], got[7], got[8]} == {5}
    assert {got[100], got[101], got[102]} == {100}


def _cc_star(spark, edges):
    from rdbms_metadata_manager_spark.llm.clustering import connected_components_star

    df = spark.createDataFrame(pd.DataFrame(edges, columns=["doc_a", "doc_b"]))
    return {r["node"]: r["label"] for r in connected_components_star(df).collect()}


def _union_find(edges):
    """Independent pure-Python reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize to component minimum
    comp = {}
    for x in parent:
        comp.setdefault(find(x), []).append(x)
    return {x: min(find(x), *members) for r, members in comp.items() for x in members}


def test_star_contraction_matches_fixpoint_on_basics(spark):
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (5, 6), (6, 7), (7, 5)]
    assert _cc_star(spark, edges) == _cc(spark, edges) == _union_find(edges)


def test_star_contraction_handles_diameter_beyond_label_propagation_cap(spark):
    """A 40-hop chain exceeds MAX_ITERATIONS=20 for min-label
    propagation (which raises); star contraction converges in
    O(log n) rounds — the reason the variant exists."""
    chain = [(i, i + 1) for i in range(100, 140)]
    got = _cc_star(spark, chain)
    assert set(got.values()) == {100}
    assert len(got) == 41


def test_star_contraction_random_graphs_match_union_find(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 30
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(25)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _cc_star(spark, edges) == _union_find(edges), f"trial {trial}: {edges}"
