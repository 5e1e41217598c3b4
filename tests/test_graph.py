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
