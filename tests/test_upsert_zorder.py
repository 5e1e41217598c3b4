"""Tests for the streaming upsert sink and the z-order clustered
layout."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from rdbms_metadata_manager_spark.queries.base import load
from rdbms_metadata_manager_spark.sinks.io_formats import write_zorder_clustered_parquet
from rdbms_metadata_manager_spark.streaming.upsert import run_stream_upsert, upsert_batch


def _docs_changes(spark, sf_dir, doc_ids, version, tag):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id").isin(doc_ids))
        .select(
            "doc_id",
            F.concat(F.lit(f"{tag}:"), "text").alias("text"),
            "lang",
            F.lit(version).cast("long").alias("version"),
        )
    )


def test_upsert_batch_merges_last_wins(spark, sf_dir, tmp_path):
    target = str(tmp_path / "target")
    b1 = _docs_changes(spark, sf_dir, list(range(20)), 1, "v1")
    upsert_batch(spark, target, "lang", "doc_id", "version", b1)
    assert spark.read.parquet(target).count() == 20

    # batch 2: 5 updates + 5 inserts, plus an intra-batch duplicate
    # where version 4 must beat version 3 on the same key
    b2 = _docs_changes(spark, sf_dir, list(range(15, 25)), 2, "v2").unionByName(
        _docs_changes(spark, sf_dir, [15], 4, "v4")
    ).unionByName(_docs_changes(spark, sf_dir, [15], 3, "v3"))
    affected = upsert_batch(spark, target, "lang", "doc_id", "version", b2)
    assert affected  # at least one partition rewritten

    result = spark.read.parquet(target)
    assert result.count() == 25  # 20 + 5 inserts
    rows = {r.doc_id: r for r in result.collect()}
    assert rows[15].version == 4 and rows[15].text.startswith("v4:")
    for k in range(16, 25):
        assert rows[k].version == 2 and rows[k].text.startswith("v2:")
    for k in range(0, 15):
        assert rows[k].version == 1 and rows[k].text.startswith("v1:")


def test_upsert_batch_reapply_is_idempotent(spark, sf_dir, tmp_path):
    target = str(tmp_path / "target")
    b1 = _docs_changes(spark, sf_dir, list(range(10)), 1, "v1")
    upsert_batch(spark, target, "lang", "doc_id", "version", b1)
    first = sorted((r.doc_id, r.text, r.version) for r in spark.read.parquet(target).collect())
    upsert_batch(spark, target, "lang", "doc_id", "version", b1)  # at-least-once replay
    second = sorted((r.doc_id, r.text, r.version) for r in spark.read.parquet(target).collect())
    assert first == second


def test_stream_upsert_end_to_end(spark, sf_dir, tmp_path):
    source = str(tmp_path / "source")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, text string, lang string, version bigint"

    _docs_changes(spark, sf_dir, list(range(10)), 1, "v1").write.mode("append").parquet(source)
    stream = spark.readStream.schema(schema).parquet(source)
    run_stream_upsert(stream, target, ckpt, "lang", "doc_id", "version")
    assert spark.read.parquet(target).count() == 10

    _docs_changes(spark, sf_dir, list(range(5, 15)), 2, "v2").write.mode("append").parquet(source)
    stream = spark.readStream.schema(schema).parquet(source)
    run_stream_upsert(stream, target, ckpt, "lang", "doc_id", "version")

    result = spark.read.parquet(target)
    assert result.count() == 15
    versions = {r.doc_id: r.version for r in result.collect()}
    assert all(versions[k] == 2 for k in range(5, 15))
    assert all(versions[k] == 1 for k in range(0, 5))


def _file_spans(path, col):
    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        stats = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
        spans.append((min(s.min for s in stats), max(s.max for s in stats)))
    return spans


def test_zorder_write_prunes_on_both_dimensions(spark, sf_dir, tmp_path):
    """Every file owns a compact rectangle in (custkey, totalprice)
    space: a 10%-wide range predicate on EITHER column must be
    satisfiable from a strict subset of files by footer stats alone —
    the property single-column clustering only gives one dimension."""
    orders = load(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_z")
    write_zorder_clustered_parquet(orders, path, "o_custkey", "o_totalprice", n_files=16)
    assert spark.read.parquet(path).count() == orders.count()

    for col in ["o_custkey", "o_totalprice"]:
        spans = _file_spans(path, col)
        assert len(spans) >= 8
        glo = min(s[0] for s in spans)
        ghi = max(s[1] for s in spans)
        # probe a band inside one quadrant strip (38-44%) — a band
        # straddling the 50% split line legitimately touches half the
        # tiles, which is the curve's geometry, not a layout bug
        lo = glo + (ghi - glo) * 0.38
        hi = glo + (ghi - glo) * 0.44
        overlapping = sum(1 for s in spans if s[0] <= hi and s[1] >= lo)
        assert overlapping <= 0.6 * len(spans), (col, overlapping, len(spans), spans)


def test_upsert_crash_between_renames_recovers(spark, sf_dir, tmp_path):
    """Simulate the worst crash window: the live partition dir was
    renamed aside but the new contents were never renamed in. The
    next upsert_batch must restore the previous rows (not treat the
    partition as empty and keep only the batch's rows)."""
    import os

    target = str(tmp_path / "target")
    b1 = _docs_changes(spark, sf_dir, list(range(20)), 1, "v1")
    upsert_batch(spark, target, "lang", "doc_id", "version", b1)
    before = sorted(
        (r.doc_id, r.text, r.version) for r in spark.read.parquet(target).collect()
    )

    # crash simulation: live dir moved to the backup name, new dir absent
    part = next(d for d in os.listdir(target) if d.startswith("lang="))
    os.rename(f"{target}/{part}", f"{target}/.swap-old-{part}")

    b2 = _docs_changes(spark, sf_dir, [0], 2, "v2")
    upsert_batch(spark, target, "lang", "doc_id", "version", b2)
    rows = {r.doc_id: r for r in spark.read.parquet(target).collect()}
    assert len(rows) == 20  # nothing lost
    assert rows[0].version in (1, 2)
    assert not any(d.startswith(".swap-old-") for d in os.listdir(target))
    assert sorted(
        (i, t, v) for i, (t, v) in ((k, (r.text, r.version)) for k, r in rows.items())
        if i != 0
    ) == [b for b in before if b[0] != 0]


def test_upsert_stale_backup_discarded(spark, sf_dir, tmp_path):
    """Crash after the new dir was committed: the stale backup must be
    discarded, not restored over the newer contents."""
    import os
    import shutil

    target = str(tmp_path / "target")
    b1 = _docs_changes(spark, sf_dir, list(range(10)), 1, "v1")
    upsert_batch(spark, target, "lang", "doc_id", "version", b1)
    part = next(d for d in os.listdir(target) if d.startswith("lang="))
    # stale backup with OLD contents alongside a committed live dir
    shutil.copytree(f"{target}/{part}", f"{target}/.swap-old-{part}")
    b2 = _docs_changes(spark, sf_dir, [3], 2, "v2")
    upsert_batch(spark, target, "lang", "doc_id", "version", b2)
    rows = {r.doc_id: r for r in spark.read.parquet(target).collect()}
    assert rows[3].version == 2
    assert not any(d.startswith(".swap-old-") for d in os.listdir(target))
