"""Plan-quality regression tests: the physical plans must keep the
properties that make these queries scale — pushed filters, pruned
columns, broadcast dims, whole-stage codegen, no stray shuffles.
Catching a regression here is catching a 100×-at-scale slowdown at
test time."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdbms_metadata_manager_spark.queries import advanced, relational
from rdbms_metadata_manager_spark.queries.base import load


def physical_plan(df, execute: bool = False) -> str:
    if execute:
        # collect() (not a separate write, which builds its own
        # QueryExecution) finalizes THIS Dataset's adaptive plan;
        # codegen'd spans then carry the `*(n)` marker.
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02").select(
        "l_orderkey", "l_quantity"
    )
    plan = physical_plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan


def test_column_pruning_reaches_parquet(spark, sf_dir):
    df = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = physical_plan(df)
    # ReadSchema must contain ONLY the projected columns
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema, read_schema


def test_q5_broadcasts_tiny_dims(spark, sf_dir):
    plan = physical_plan(relational.q5_local_supplier_volume(spark, sf_dir))
    # region (5 rows) and nation (25 rows) must be broadcast
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_q1_uses_whole_stage_codegen_and_partial_agg(spark, sf_dir):
    plan = physical_plan(relational.q1_pricing_summary(spark, sf_dir), execute=True)
    assert "isFinalPlan=true" in plan
    assert "*(" in plan, f"no whole-stage-codegen spans:\n{plan}"
    # map-side combine: partial aggregate before the exchange
    assert "partial_sum" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_topk_is_take_ordered_not_full_sort(spark, sf_dir):
    plan = physical_plan(relational.topk_orders(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_anti_join_is_broadcast_left_anti(spark, sf_dir):
    plan = physical_plan(
        relational.anti_join_customers_without_orders(spark, sf_dir)
    )
    assert "LeftAnti" in plan, plan


def test_projection_only_queries_have_no_exchange(spark, sf_dir):
    """Pure per-row queries must not shuffle (except an explicit
    display sort, which TakeOrdered/Sort handles after AQE)."""
    df = load(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n")
    )
    assert "Exchange" not in physical_plan(df)


def test_asof_join_single_shuffle(spark, sf_dir):
    """The as-of join must shuffle exactly once on user_id (the
    repartition), not per window/filter step."""
    plan = physical_plan(advanced.asof_join_last_click(spark, sf_dir))
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles == 1, f"expected 1 hash exchange, got {n_shuffles}:\n{plan}"


# --- tpch_rest plan shapes -------------------------------------------------

def test_q7_broadcasts_both_nation_lookups(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries import tpch_rest

    plan = physical_plan(tpch_rest.q7_volume_shipping(spark, sf_dir))
    # both explicit nation broadcasts survive into the physical plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_q10_limit_is_take_ordered(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries import tpch_rest

    plan = physical_plan(tpch_rest.q10_returned_items(spark, sf_dir))
    # ORDER BY ... LIMIT 20 must be per-partition top-k + merge,
    # never a full global sort
    assert "TakeOrderedAndProject" in plan, plan
    # the returnflag and date filters reach the parquet scans
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan, plan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan


def test_q11_scalar_total_is_broadcast_not_shuffle(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries import tpch_rest

    plan = physical_plan(tpch_rest.q11_part_value_concentration(spark, sf_dir))
    # the 1-row global total joins via broadcast nested loop, and the
    # per-part aggregate keeps map-side partials
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "partial_sum" in plan, plan


def test_q4_and_q20_are_semi_joins(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries import tpch_rest

    assert "LeftSemi" in physical_plan(tpch_rest.q4_priority_late_ship(spark, sf_dir))
    assert "LeftSemi" in physical_plan(tpch_rest.q20_heavy_red_suppliers(spark, sf_dir))
