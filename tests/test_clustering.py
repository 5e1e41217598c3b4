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
