"""Structured Streaming tests: the incremental path must produce the
same results as the batch-mode window queries (which are themselves
oracle-checked against DuckDB in test_oracle_parity)."""

from __future__ import annotations

import shutil

import pytest

from rdbms_metadata_manager_spark.streaming import events_batch, stream


@pytest.fixture(scope="module")
def events_source(spark, sf_dir, tmp_path_factory):
    # File-source streams want a directory of files.
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_tumbling_matches_batch(spark, sf_dir, events_source):
    events = stream.read_events_stream(spark, events_source)
    q = stream.run_to_memory(
        stream.streaming_tumbling_counts(events), "tumbling_test", "complete"
    )
    assert not q.isActive
    got = _rows(spark.table("tumbling_test"))
    expected = _rows(events_batch.events_tumbling_hourly(spark, sf_dir))
    assert got == expected


def test_streaming_sessions_match_batch(spark, sf_dir, events_source):
    events = stream.read_events_stream(spark, events_source)
    stream.run_to_memory(
        stream.streaming_session_counts(events), "sessions_test", "complete"
    )
    got = _rows(spark.table("sessions_test"))
    expected = _rows(
        events_batch.events_session_stats(spark, sf_dir).drop("sum_value")
    )
    assert got == expected


def test_foreach_batch_parquet_sink(spark, events_source, tmp_path):
    out = str(tmp_path / "fb_out")
    events = stream.read_events_stream(spark, events_source)
    q = stream.run_foreach_batch_to_parquet(events, out)
    assert not q.isActive
    written = spark.read.parquet(out)
    n_src = spark.read.parquet(events_source).count()
    assert written.count() == n_src
    assert "batch_id" in written.columns
    # Restart with the same checkpoint: availableNow finds nothing new
    q2 = stream.run_foreach_batch_to_parquet(
        stream.read_events_stream(spark, events_source), out
    )
    assert spark.read.parquet(out).count() == n_src


def test_streaming_dedup_drops_duplicate_ids(spark, events_source):
    events = stream.read_events_stream(spark, events_source)
    n_input = spark.read.parquet(events_source).count()
    stream.run_to_memory(
        stream.streaming_dedup_events(events), "dedup_test", "append"
    )
    deduped = spark.table("dedup_test")
    n_out = deduped.count()
    assert n_out == deduped.select("event_id").distinct().count()
    assert 0 < n_out <= n_input
