"""Malformed-input robustness: at 100 TB some records ARE corrupt;
the pipeline must quarantine them, not die."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_corrupt_json_is_quarantined(spark, tmp_path):
    p = tmp_path / "mixed.json"
    p.write_text(
        '{"event_id": 1, "value": 1.5}\n'
        "THIS IS NOT JSON\n"
        '{"event_id": 2, "value": 2.5}\n'
        '{"event_id": "not-a-number", "value": 3.5}\n'
    )
    df = (
        spark.read.schema("event_id bigint, value double, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.cache().collect()  # cache: corrupt-record column needs it post-3.0
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["event_id"] for r in good} == {1, 2}
    assert len(bad) == 2  # the non-JSON line and the type-mismatch line
    df.unpersist()


def test_corrupt_json_dropmalformed(spark, tmp_path):
    p = tmp_path / "mixed2.json"
    p.write_text('{"a": 1}\nnot json\n{"a": 2}\n')
    df = (
        spark.read.schema("a bigint")
        .option("mode", "DROPMALFORMED")
        .json(str(p))
    )
    assert sorted(r["a"] for r in df.collect()) == [1, 2]


def test_csv_malformed_rows_permissive(spark, tmp_path):
    p = tmp_path / "mixed.csv"
    p.write_text("a,b\n1,x\nnot_an_int,y\n3,z\n")
    df = (
        spark.read.option("header", True)
        .schema("a int, b string")
        .option("mode", "PERMISSIVE")
        .csv(str(p))
    )
    rows = sorted(df.collect(), key=lambda r: (r["a"] is None, r["a"] or 0))
    assert [r["a"] for r in rows] == [1, 3, None]  # bad cell → null, row kept
