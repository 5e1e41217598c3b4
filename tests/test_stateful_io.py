"""Tests: custom stateful streaming operator, stream-static join,
and file-format round-trips incl. bucketed shuffle-free joins."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from rdbms_metadata_manager_spark.queries.base import load
from rdbms_metadata_manager_spark.sinks import io_formats
from rdbms_metadata_manager_spark.streaming import stateful, stream


@pytest.fixture(scope="module")
def events_source(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stateful")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def test_stateful_user_profiles_match_batch(spark, sf_dir, events_source):
    events = stream.read_events_stream(spark, events_source)
    stream.run_to_memory(
        stateful.streaming_user_profiles(events), "profiles_test", "update"
    )
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 4), r["n_types_seen"])
        for r in spark.table("profiles_test").collect()
    }
    batch = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.countDistinct("event_type").alias("t"),
        )
        .collect()
    )
    expected = {r["user_id"]: (r["n"], round(r["s"], 4), r["t"]) for r in batch}
    assert got == expected


def test_transform_with_state_matches_batch(spark, sf_dir, events_source):
    """Spark 4 transformWithStateInPandas (typed ValueState) must
    agree with the batch aggregate.

    The TWS Python runner hard-depends on protobuf (state-server wire
    protocol); skip where it isn't installed — the operator is still
    importable and runs on any cluster with standard pyspark deps.
    """
    pytest.importorskip("google.protobuf")
    pytest.importorskip("pyspark.sql.streaming.stateful_processor")
    from rdbms_metadata_manager_spark.streaming import tws

    events = stream.read_events_stream(spark, events_source)
    stream.run_to_memory(
        tws.streaming_user_tallies_tws(events), "tws_test", "update"
    )
    got = {
        r["user_id"]: (r["n_events"], r["n_purchases"])
        for r in spark.table("tws_test").collect()
    }
    batch = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("p"),
        )
        .collect()
    )
    expected = {r["user_id"]: (r["n"], r["p"]) for r in batch}
    assert got == expected


def test_stream_static_join(spark, sf_dir, events_source):
    """Streaming events enriched with a static dimension table."""
    events = stream.read_events_stream(spark, events_source)
    customers = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = (
        events.join(customers, "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"))
    )
    stream.run_to_memory(enriched, "enriched_test", "complete")
    got = {r["c_mktsegment"]: r["n_events"] for r in spark.table("enriched_test").collect()}
    batch = (
        load(spark, sf_dir, "events")
        .join(customers, "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"))
        .collect()
    )
    expected = {r["c_mktsegment"]: r["n_events"] for r in batch}
    assert got == expected


def test_parquet_partitioned_roundtrip_prunes(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_part")
    io_formats.write_partitioned_parquet(docs, path, ["lang"])
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # partition pruning: the lang filter must reach PartitionFilters
    pruned = back.filter(F.col("lang") == "en")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
    assert pruned.count() == docs.filter(F.col("lang") == "en").count()


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    nat = load(spark, sf_dir, "nation")
    csv_path, json_path = str(tmp_path / "nat_csv"), str(tmp_path / "nat_json")
    io_formats.write_csv(nat, csv_path)
    io_formats.write_json(nat, json_path)
    csv_back = io_formats.read_csv(spark, csv_path, schema=nat.schema)
    json_back = io_formats.read_json(spark, json_path, schema=nat.schema)
    rows = sorted(tuple(r) for r in nat.collect())
    assert sorted(tuple(r) for r in csv_back.collect()) == rows
    assert sorted(tuple(r) for r in json_back.collect()) == rows


def test_orc_roundtrip_pushes_filters(spark, sf_dir, tmp_path):
    orders = load(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    io_formats.write_orc(orders, path)
    back = io_formats.read_orc(spark, path)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    # the columnar ORC reader must receive the predicate, same as parquet
    filtered = back.filter(F.col("o_totalprice") > 100000.0).select("o_orderkey")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_totalprice" in plan, plan
    assert filtered.count() == orders.filter(F.col("o_totalprice") > 100000.0).count()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    orders = load(spark, sf_dir, "orders")
    customers = load(spark, sf_dir, "customer")
    io_formats.write_bucketed_table(orders, "orders_b", "o_custkey", 8)
    io_formats.write_bucketed_table(customers, "cust_b", "c_custkey", 8)
    ob, cb = spark.table("orders_b"), spark.table("cust_b")
    joined = ob.join(cb, ob["o_custkey"] == cb["c_custkey"])
    # At test scale the planner correctly prefers broadcasting the tiny
    # side (which disables bucketed scans); force SMJ to observe the
    # bucketing payoff — on co-bucketed big-big joins there must be NO
    # shuffle Exchange on either side.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == orders.join(
            customers, orders["o_custkey"] == customers["c_custkey"]
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
