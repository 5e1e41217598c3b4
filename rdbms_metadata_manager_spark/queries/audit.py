"""Operational-audit faces: fraud-style duplicate detection and
optimizer-diagnostics cardinality auditing.

[beyond-reference] per SURVEY.md §2.2 — the reference
(antonylucas/rdbms-metadata-manager) audits SCHEMAS; these audit the
DATA and the PLANS a warehouse team runs on top of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import DAY_SECONDS, load

DUP_WINDOW_DAYS = 7


def duplicate_payment_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential duplicate payments: pairs of orders by the SAME
    customer for the SAME exact amount within a 7-day window — the
    classic accounts-payable fraud/retry screen ([[dedup_exact]]
    finds byte-identical rows; this finds SEMANTIC near-duplicates
    keyed by who+how-much+when). Each unordered pair is emitted once
    (earlier day first; orderkey tiebreak for same-day pairs).

    Scale: a SELF-join keyed on (customer, amount-cents) — the
    equality key does all the pruning, so the band predicate only
    filters within already-tiny key groups (no all-pairs, no range
    explosion); shuffle partitioning is by the composite key, which
    is skew-free by construction (one customer would need millions
    of same-priced orders to skew a partition)."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.expr(f"unix_timestamp(o_orderdate) div {DAY_SECONDS}").alias("day"),
    )
    a, b = o.alias("a"), o.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.cents") == F.col("b.cents")),
        )
        .filter(
            (F.col("b.day") - F.col("a.day") <= DUP_WINDOW_DAYS)
            & (
                (F.col("a.day") < F.col("b.day"))
                | (
                    (F.col("a.day") == F.col("b.day"))
                    & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
                )
            )
        )
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.cents").alias("amount_cents"),
            F.col("a.o_orderkey").alias("orderkey_first"),
            F.col("b.o_orderkey").alias("orderkey_second"),
            (F.col("b.day") - F.col("a.day")).cast("bigint").alias("day_gap"),
        )
        .orderBy("o_custkey", "orderkey_first", "orderkey_second")
    )


_DUP_PAY_SQL = f"""
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(o_orderdate) // 1000000 // {DAY_SECONDS} AS day
  FROM orders
)
SELECT a.o_custkey AS o_custkey, a.cents AS amount_cents,
       a.o_orderkey AS orderkey_first, b.o_orderkey AS orderkey_second,
       (b.day - a.day)::BIGINT AS day_gap
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.cents = b.cents
WHERE b.day - a.day <= {DUP_WINDOW_DAYS}
  AND (a.day < b.day OR (a.day = b.day AND a.o_orderkey < b.o_orderkey))
ORDER BY o_custkey, orderkey_first, orderkey_second
"""


# (join_name, left_table, left_key, right_table, right_key) — the
# star schema's real join edges.  Single source of truth for the
# Spark plan AND the generated oracle SQL.
_JOIN_SPEC: list[tuple[str, str, str, str, str]] = [
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("events_customer", "events", "user_id", "customer", "c_custkey"),
]


def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size audit for the star schema's join edges: the EXACT
    output cardinality |R ⋈ S| = Σₖ c_R(k)·c_S(k) versus the textbook
    optimizer estimate |R|·|S| / max(d_R, d_S) (uniform-containment
    assumption), with the error in per-mille — the diagnostic behind
    every "the optimizer picked the wrong join order" incident
    ([[join_strategy_advisor]] recommends the physical strategy; this
    measures how wrong the cardinality model feeding it would be).

    Scale: the exact count comes from joining the two per-key COUNT
    rollups — the join itself is NEVER materialized, so a 10¹²-row
    join output costs two map-side-combined rollups plus one keyed
    join on the key domain. Products widen to DECIMAL(38,0)
    (c_R·c_S summed across keys reaches the true join size, which is
    the quantity being audited precisely because it can explode)."""
    parts = []
    for jname, lt, lk, rt, rk in _JOIN_SPEC:
        lroll = (
            load(spark, sf_dir, lt)
            .select(F.col(lk).cast("long").alias("k"))
            .filter(F.col("k").isNotNull())
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("ln"))
            .localCheckpoint(eager=False)
        )
        rroll = (
            load(spark, sf_dir, rt)
            .select(F.col(rk).cast("long").alias("k"))
            .filter(F.col("k").isNotNull())
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("rn"))
            .localCheckpoint(eager=False)
        )
        lstat = lroll.agg(
            F.coalesce(F.sum("ln"), F.lit(0)).alias("n_left"),
            F.count(F.lit(1)).alias("d_left"),
        )
        rstat = rroll.agg(
            F.coalesce(F.sum("rn"), F.lit(0)).alias("n_right"),
            F.count(F.lit(1)).alias("d_right"),
        )
        actual = lroll.join(rroll, "k").agg(
            F.coalesce(
                F.sum(F.col("ln").cast("decimal(38,0)") * F.col("rn")), F.lit(0)
            ).alias("actual"),
        )
        parts.append(
            lstat.crossJoin(F.broadcast(rstat))
            .crossJoin(F.broadcast(actual))
            .select(
                F.lit(jname).alias("join_name"),
                F.col("n_left").cast("bigint").alias("n_left"),
                F.col("d_left").cast("bigint").alias("d_left"),
                F.col("n_right").cast("bigint").alias("n_right"),
                F.col("d_right").cast("bigint").alias("d_right"),
                F.expr("CAST(actual AS BIGINT)").alias("actual_rows"),
                F.expr(
                    "CASE WHEN greatest(d_left, d_right) = 0 THEN 0 ELSE"
                    " CAST((CAST(n_left AS DECIMAL(38,0)) * n_right)"
                    " div greatest(d_left, d_right) AS BIGINT) END"
                ).alias("est_rows"),
            )
            .withColumn(
                "est_err_pm",
                F.expr(
                    "CASE WHEN est_rows = 0 THEN NULL ELSE"
                    " CAST((1000 * CAST(actual_rows AS DECIMAL(38,0)))"
                    " div est_rows AS BIGINT) END"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("join_name")


def _join_audit_oracle() -> str:
    selects = []
    for jname, lt, lk, rt, rk in _JOIN_SPEC:
        selects.append(
            f"""
SELECT '{jname}' AS join_name, n_left, d_left, n_right, d_right,
       actual_rows, est_rows,
       CASE WHEN est_rows = 0 THEN NULL ELSE
         CAST((1000 * actual_rows::HUGEINT) // est_rows AS BIGINT) END
         AS est_err_pm
FROM (
  WITH lroll AS (
    SELECT {lk}::BIGINT AS k, count(*)::BIGINT AS ln FROM {lt}
    WHERE {lk} IS NOT NULL GROUP BY 1
  ),
  rroll AS (
    SELECT {rk}::BIGINT AS k, count(*)::BIGINT AS rn FROM {rt}
    WHERE {rk} IS NOT NULL GROUP BY 1
  ),
  lstat AS (
    SELECT coalesce(sum(ln), 0)::BIGINT AS n_left, count(*)::BIGINT AS d_left
    FROM lroll
  ),
  rstat AS (
    SELECT coalesce(sum(rn), 0)::BIGINT AS n_right, count(*)::BIGINT AS d_right
    FROM rroll
  ),
  act AS (
    SELECT coalesce(sum(ln::HUGEINT * rn), 0) AS actual
    FROM lroll JOIN rroll USING (k)
  )
  SELECT n_left, d_left, n_right, d_right,
         CAST(actual AS BIGINT) AS actual_rows,
         CASE WHEN greatest(d_left, d_right) = 0 THEN 0 ELSE
           CAST((n_left::HUGEINT * n_right) // greatest(d_left, d_right)
                AS BIGINT) END AS est_rows
  FROM lstat, rstat, act
)"""
        )
    return " UNION ALL ".join(selects) + "\nORDER BY join_name"


QUERIES = {
    "duplicate_payment_candidates": duplicate_payment_candidates,
    "join_cardinality_audit": join_cardinality_audit,
}

ORACLES = {
    "duplicate_payment_candidates": _DUP_PAY_SQL,
    "join_cardinality_audit": _join_audit_oracle(),
}
