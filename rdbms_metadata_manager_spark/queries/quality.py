"""Data-quality expectation suite over the warehouse tables.

[beyond-reference] the reference audits *metadata* quality
(`/root/reference/app.py:36-99` — five schema rules); a data engine at
100 TB also needs *data* quality checks, in the Deequ/expectations
style: declarative constraints evaluated in one pass, emitted as a
per-check report row (check name, measured metric, pass flag).

Two operators:

- ``dq_expectations_orders`` — single-pass constraint metrics on one
  table (row count, key uniqueness, null counts, range/set-membership
  violations). ONE full-table aggregate computes every metric
  map-side-partial (all counters are mutable-buffer longs, so the
  whole thing stays in one HashAggregate pair); the 1-row result is
  unpivoted driver-free via ``stack`` into the report shape. At
  100 TB this is the cheapest possible audit: one scan, no shuffle
  beyond a 1-row exchange.

- ``dq_referential_integrity`` — orphan counts for every FK edge of
  the star schema. Each edge is a LEFT ANTI join from child to
  parent, collapsed to a count. Parents that are small at any scale
  (nation, region) are broadcast explicitly; the big edges
  (lineitem→orders/part/supplier, orders→customer) are left to
  AQE, which picks broadcast at small SF and shuffle joins at
  100 TB — correctness does not depend on the strategy. Counts-only
  output keeps the shuffle payload to the join keys.

Everything is integer arithmetic — exact cross-engine hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load

# (check_name, violation-metric SQL over orders, pass condition on the metric)
# shared by the Spark query and the DuckDB oracle: both engines
# evaluate the same conditional counters in one aggregate.
_ORDER_CHECKS: list[tuple[str, str, str]] = [
    ("row_count_positive", "count(*)", "m > 0"),
    ("orderkey_unique", "count(*) - count(DISTINCT o_orderkey)", "m = 0"),
    ("custkey_complete", "count(*) - count(o_custkey)", "m = 0"),
    ("totalprice_positive", "count_if(o_totalprice <= 0)", "m = 0"),
    ("status_in_domain", "count_if(o_orderstatus NOT IN ('O', 'F', 'P'))", "m = 0"),
    (
        "orderdate_in_range",
        "count_if(o_orderdate < DATE '1992-01-01' OR o_orderdate > DATE '2005-12-31')",
        "m = 0",
    ),
    ("priority_complete", "count_if(o_orderpriority IS NULL OR o_orderpriority = '')", "m = 0"),
]


def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    metrics = orders.agg(
        *[F.expr(expr).cast("bigint").alias(f"m{i}") for i, (_, expr, _) in enumerate(_ORDER_CHECKS)]
    )
    # unpivot the 1-row metric vector into report rows; the pass flag
    # re-evaluates each check's condition on its own metric column.
    stack_args = ", ".join(
        f"'{name}', m{i}, {cond.replace('m ', f'm{i} ')}" for i, (name, _, cond) in enumerate(_ORDER_CHECKS)
    )
    return (
        metrics.select(
            F.expr(f"stack({len(_ORDER_CHECKS)}, {stack_args}) AS (check_name, metric, passed)")
        )
        .orderBy("check_name")
    )


_DQ_EXPECT_SQL = (
    "WITH m AS (SELECT "
    + ", ".join(f"CAST({expr} AS BIGINT) AS m{i}" for i, (_, expr, _) in enumerate(_ORDER_CHECKS))
    + " FROM orders) SELECT check_name, metric, passed FROM ("
    + " UNION ALL ".join(
        f"SELECT '{name}' AS check_name, m{i} AS metric, {cond.replace('m ', f'm{i} ')} AS passed FROM m"
        for i, (name, _, cond) in enumerate(_ORDER_CHECKS)
    )
    + ") ORDER BY check_name"
)


# FK edges of the star schema: (edge label, child table, child key,
# parent table, parent key, parent-is-tiny → broadcast explicitly).
_FK_EDGES: list[tuple[str, str, str, str, str, bool]] = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey", False),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", False),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey", False),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey", True),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey", True),
]


def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for label, child, ckey, parent, pkey, tiny in _FK_EDGES:
        c = load(spark, sf_dir, child).select(F.col(ckey).alias("k"))
        p = load(spark, sf_dir, parent).select(F.col(pkey).alias("k"))
        if tiny:
            p = F.broadcast(p)
        # NOT EXISTS semantics: a NULL child key is "no reference",
        # not an orphan — filter it out on both sides of the compare.
        orphans = c.filter(F.col("k").isNotNull()).join(p, "k", "left_anti")
        parts.append(
            orphans.agg(F.count("*").alias("orphan_rows")).select(
                F.lit(label).alias("fk_edge"),
                "orphan_rows",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("intact", F.col("orphan_rows") == 0).orderBy("fk_edge")


_DQ_FK_SQL = (
    "SELECT fk_edge, orphan_rows, orphan_rows = 0 AS intact FROM ("
    + " UNION ALL ".join(
        f"SELECT '{label}' AS fk_edge, "
        f"(SELECT count(*) FROM {child} c WHERE c.{ckey} IS NOT NULL "
        f"AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pkey} = c.{ckey})) AS orphan_rows"
        for label, child, ckey, parent, pkey, _ in _FK_EDGES
    )
    + ") ORDER BY fk_edge"
)


QUERIES = {
    "dq_expectations_orders": dq_expectations_orders,
    "dq_referential_integrity": dq_referential_integrity,
}
ORACLES = {
    "dq_expectations_orders": _DQ_EXPECT_SQL,
    "dq_referential_integrity": _DQ_FK_SQL,
}
