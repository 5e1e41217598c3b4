"""Spatial grid-join invariants + plan shape, and XML parse behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdbms_metadata_manager_spark.queries import spatial


def test_spatial_counts_symmetric_and_ordered(spark, sf_dir):
    rows = spatial.spatial_neighbor_stats(spark, sf_dir).collect()
    totals = [r for r in rows if r["kind"] == "total"]
    top = [r for r in rows if r["kind"] == "top_point"]
    assert len(totals) == 1 and 0 < len(top) <= 10
    ns = [r["n"] for r in top]
    assert ns == sorted(ns, reverse=True)
    # directed pair count is exactly 2x the undirected total
    p = spatial._points(spark, sf_dir)
    a, b = p.alias("a"), p.alias("b")
    directed = (
        a.join(b, F.col("a.pid") != F.col("b.pid"))
        .filter(
            (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x"))
            + (F.col("a.y") - F.col("b.y")) * (F.col("a.y") - F.col("b.y"))
            <= F.lit(spatial.RADIUS * spatial.RADIUS)
        )
        .count()
    )
    assert directed == 2 * totals[0]["n"]


def test_spatial_join_is_equi_join_on_cells(spark, sf_dir):
    df = spatial.spatial_neighbor_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the distance join must run as a hash/merge equi-join on the grid
    # cell, never as a nested-loop distance scan over point pairs
    assert "SortMergeJoin [jx" in plan or "BroadcastHashJoin [jx" in plan or (
        "ShuffledHashJoin [jx" in plan
    ), plan


def test_from_xml_malformed_yields_nulls(spark):
    df = spark.createDataFrame([("<broken",), ("<e id=\"5\"><u>7</u><ty>k</ty></e>",)], "payload: string")
    out = df.select(
        F.from_xml(F.col("payload"), "struct<_id: bigint, u: bigint, ty: string>").alias("p")
    ).collect()
    assert out[0]["p"] is None or out[0]["p"]["_id"] is None
    assert out[1]["p"]["_id"] == 5 and out[1]["p"]["u"] == 7 and out[1]["p"]["ty"] == "k"
