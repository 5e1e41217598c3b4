"""Schema-drift robustness: at 100 TB a dataset is written by many
producers over months — columns get added, and readers must cope
without rewriting history. Pins the mergeSchema contract we rely on
for the training-shard layout (missing columns → typed nulls, never
errors or silent drops)."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F


def test_merge_schema_unions_columns(spark, tmp_path):
    base = str(tmp_path / "docs")
    v1 = pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "c d"]})
    v2 = pd.DataFrame(
        {"doc_id": [3], "text": ["e f"], "lang": ["en"], "quality": [0.9]}
    )
    spark.createDataFrame(v1).write.parquet(os.path.join(base, "batch=1"))
    spark.createDataFrame(v2).write.parquet(os.path.join(base, "batch=2"))

    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert {"doc_id", "text", "lang", "quality", "batch"} <= set(df.columns)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[1]["lang"] is None and rows[1]["quality"] is None
    assert rows[3]["lang"] == "en"
    # Old-schema rows still filterable on the new column (null-safe).
    assert df.where(F.col("lang").isNull()).count() == 2


def test_evolved_scan_still_prunes_columns(spark, tmp_path):
    """Column pruning must survive a merged schema: projecting two
    columns reads two columns, evolution or not."""
    base = str(tmp_path / "docs2")
    spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]})).write.parquet(
        os.path.join(base, "batch=1")
    )
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [2], "text": ["y"], "lang": ["en"]})
    ).write.parquet(os.path.join(base, "batch=2"))
    df = (
        spark.read.option("mergeSchema", "true")
        .parquet(base)
        .select("doc_id", "lang")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read_schema and "lang" in read_schema
    assert "text" not in read_schema
