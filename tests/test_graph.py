"""Property + plan tests for the graph (PageRank) and PII operators
beyond the registry-wide oracle parity check."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdbms_metadata_manager_spark.llm.pii import pii_redaction
from rdbms_metadata_manager_spark.queries.graph import (
    BASE,
    N_NATIONS,
    _trade_edges,
    pagerank_trade_graph,
)

from test_plans import physical_plan


def test_pagerank_edge_build_is_scale_shaped(spark, sf_dir):
    """The heavy stage must partially aggregate map-side before the
    (src, dst) shuffle and broadcast the supplier dim."""
    plan = physical_plan(_trade_edges(spark, sf_dir))
    assert "partial_count" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_pagerank_mass_and_floor(spark, sf_dir):
    ranks = {r.n_nationkey: r.pagerank for r in pagerank_trade_graph(spark, sf_dir).collect()}
    assert len(ranks) == N_NATIONS
    # damped rank mass is conserved when every node has out-edges
    # (every nation trades at every sf); rounding adds ≤25 × 5e-7
    assert abs(sum(ranks.values()) - 1.0) < 1e-3, sum(ranks.values())
    # every node keeps at least the teleport floor
    assert all(r >= BASE for r in ranks.values()), ranks


def test_pii_redaction_removes_all_pii(spark, sf_dir):
    df = pii_redaction(spark, sf_dir)
    # exactly one email and one phone constructed per note, all gone after redaction
    bad = df.filter(
        (F.col("n_emails") != 1)
        | (F.col("n_phones") != 1)
        | F.col("redacted").contains("@")
        | F.col("redacted").rlike("\\d{3}-\\d{4}")
        | ~F.col("redacted").contains("[EMAIL]")
        | ~F.col("redacted").contains("[PHONE]")
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_kcore_peels_chain_and_subthreshold_clique(spark, tmp_path):
    """Crafted graph, k = ceil(E/N) = ceil(18/11) = 2: the pendant
    chain (degrees 1-2) peels in cascading rounds — removing its tip
    drops the next node below k — while both cliques survive.
    Expected core: K5 + K4 = 9 nodes, 16 edges, max degree 4."""
    d = str(tmp_path)
    rows = []
    # order 1: parts 1-5 → K5 clique
    rows += [(1, p) for p in range(1, 6)]
    # order 2: parts 11-14 → K4 clique (below threshold)
    rows += [(2, p) for p in range(11, 15)]
    # chain: 5-21, 21-22 (pendant path off the clique)
    rows += [(3, 5), (3, 21), (4, 21), (4, 22)]
    spark.createDataFrame(
        [(o, p, 1.0) for o, p in rows],
        "l_orderkey long, l_partkey long, l_quantity double",
    ).write.parquet(f"{d}/lineitem.parquet")
    from rdbms_metadata_manager_spark.queries.mining import kcore_copurchase_parts

    got = kcore_copurchase_parts(spark, d).collect()[0]
    assert (got.n_core_nodes, got.n_core_edges, got.max_core_degree) == (9, 16, 4)


def test_kcore_reaches_fixpoint_within_round_budget(spark, sf_dir, monkeypatch):
    """The 'k-core' label requires the peel to CONVERGE within
    K_CORE_ROUNDS on the testdata (the oracle unrolls exactly that
    many rounds): raising the budget must not change the answer."""
    from rdbms_metadata_manager_spark.queries import mining

    base = [tuple(r) for r in mining.kcore_copurchase_parts(spark, sf_dir).collect()]
    monkeypatch.setattr(mining, "K_CORE_ROUNDS", mining.K_CORE_ROUNDS + 4)
    more = [tuple(r) for r in mining.kcore_copurchase_parts(spark, sf_dir).collect()]
    assert base == more
