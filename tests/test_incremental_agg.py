"""Incremental aggregate maintenance (streaming materialized view):
multi-batch state must equal the one-shot batch aggregate exactly,
and at-least-once redelivery must not double-count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdbms_metadata_manager_spark.queries.base import load
from rdbms_metadata_manager_spark.streaming import stream
from rdbms_metadata_manager_spark.streaming.incremental_agg import (
    apply_increment,
    batch_partials,
    read_state,
    run_incremental_agg,
)


@pytest.fixture(scope="module")
def split_events_source(spark, sf_dir, tmp_path_factory):
    """events split into 4 files so maxFilesPerTrigger=1 yields a
    genuinely multi-batch stream."""
    d = str(tmp_path_factory.mktemp("events_split"))
    load(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def _expected(spark, src):
    return {
        (r.event_type, r.hour): (r.n_events, r.sum_value_ticks)
        for r in batch_partials(spark.read.parquet(src)).collect()
    }


def test_incremental_state_equals_batch_aggregate(spark, split_events_source, tmp_path):
    target = str(tmp_path / "mv")
    events = (
        spark.readStream.schema(spark.read.parquet(split_events_source).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_events_source)
    )
    run_incremental_agg(events, target, str(tmp_path / "ckpt"))

    got = {
        (r.event_type, r.hour): (r.n_events, r.sum_value_ticks)
        for r in read_state(spark, target).collect()
    }
    assert got == _expected(spark, split_events_source)


def test_redelivered_batch_is_skipped_not_double_counted(spark, split_events_source, tmp_path):
    target = str(tmp_path / "mv")
    batch = spark.read.parquet(split_events_source)
    assert apply_increment(spark, target, batch, batch_id=0) is True
    first = _state_snapshot(spark, target)
    # at-least-once redelivery of the same batch id → skipped
    assert apply_increment(spark, target, batch, batch_id=0) is False
    assert _state_snapshot(spark, target) == first
    # a genuinely new batch still applies additively
    assert apply_increment(spark, target, batch.limit(100), batch_id=1) is True
    assert sum(n for n, _ in _state_snapshot(spark, target).values()) == batch.count() + 100


def _state_snapshot(spark, target):
    return {
        (r.event_type, r.hour): (r.n_events, r.sum_value_ticks)
        for r in read_state(spark, target).collect()
    }


def test_restart_with_fresh_checkpoint_does_not_double_count(
    spark, split_events_source, tmp_path
):
    """Simulates redelivery of every batch (new checkpoint, same
    state): markers must suppress all of them."""
    target = str(tmp_path / "mv")
    schema = spark.read.parquet(split_events_source).schema
    for ckpt in ["ckpt1", "ckpt2"]:
        events = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(split_events_source)
        )
        run_incremental_agg(events, target, str(tmp_path / ckpt))
    got = _state_snapshot(spark, target)
    assert got == _expected(spark, split_events_source)


def test_crash_between_swap_renames_recovers_from_backup(spark, split_events_source, tmp_path):
    """Simulate a crash AFTER old-state was renamed aside but BEFORE
    the new state landed: only `.state-old-<id>` exists. The next
    reader/writer must restore the backup — including its replay
    markers — instead of losing the aggregate."""
    import shutil

    target = str(tmp_path / "mv")
    batch = spark.read.parquet(split_events_source)
    assert apply_increment(spark, target, batch, batch_id=0) is True
    committed = _state_snapshot(spark, target)

    shutil.move(f"{target}/state", f"{target}/.state-old-1")  # the "crash"
    assert _state_snapshot(spark, target) == committed  # read path recovers
    # markers survived recovery: batch 0 is still recognized as applied
    assert apply_increment(spark, target, batch, batch_id=0) is False
    assert _state_snapshot(spark, target) == committed


def test_stale_backup_next_to_live_state_is_discarded(spark, split_events_source, tmp_path):
    """Crash AFTER the new state committed but BEFORE the backup was
    deleted: both dirs exist. Recovery keeps the live state and drops
    the stale backup."""
    import os
    import shutil

    target = str(tmp_path / "mv")
    batch = spark.read.parquet(split_events_source)
    assert apply_increment(spark, target, batch, batch_id=0) is True
    committed = _state_snapshot(spark, target)
    shutil.copytree(f"{target}/state", f"{target}/.state-old-0")

    assert _state_snapshot(spark, target) == committed
    assert not os.path.exists(f"{target}/.state-old-0")
