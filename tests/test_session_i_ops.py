"""Round-3 session-I operators: mergeable HLL sketches, SQL TVF
lateral, lateral column aliases (parity lives in
test_oracle_parity.py; these pin the properties parity can't see)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdbms_metadata_manager_spark.queries.base import load
from rdbms_metadata_manager_spark.queries.modern import hll_sketch_partition_union


def test_hll_union_tracks_direct_sketch(spark, sf_dir):
    """Merging per-source sketches must track the directly-built
    global sketch: union is register-wise max, but datasketches
    promotes LIST→SET→HLL along different paths for the two builds,
    so estimates are NOT bit-identical (measured 501 vs 502 at
    sf0.001) — both must land within the lgConfigK=12 error band of
    each other and of the exact count. This is the property that lets
    a pipeline answer global distinct questions from materialized
    per-partition sketches without a rescan."""
    d = load(spark, sf_dir, "documents")
    exact = d.select("text").distinct().count()
    direct = d.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(text, 12))").alias("e")
    ).collect()[0]["e"]
    merged = (
        d.groupBy("source")
        .agg(F.expr("hll_sketch_agg(text, 12)").alias("sk"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk, false))").alias("e"))
        .collect()[0]["e"]
    )
    assert abs(direct - exact) <= 0.05 * exact
    assert abs(merged - exact) <= 0.05 * exact
    assert abs(merged - direct) <= 0.05 * exact


def test_hll_scopes_and_flags(spark, sf_dir):
    rows = hll_sketch_partition_union(spark, sf_dir).collect()
    scopes = [r["scope"] for r in rows]
    assert scopes == sorted(scopes) and scopes[0] == "ALL"
    n_sources = load(spark, sf_dir, "documents").select("source").distinct().count()
    assert len(rows) == n_sources + 1
    assert all(r["approx_ok"] for r in rows)
    # the ALL row counts cross-source dups once: <= sum of per-source
    all_row = next(r for r in rows if r["scope"] == "ALL")
    assert all_row["exact_docs"] <= sum(r["exact_docs"] for r in rows if r["scope"] != "ALL")
