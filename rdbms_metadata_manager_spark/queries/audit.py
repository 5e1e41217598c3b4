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


# approx_percentile rank-error audit: quantile probes in per-mille
# and the sketch accuracy parameter (rank error guarantee = n/ACC).
_PCT_QS = [100, 250, 500, 750, 900, 990]
_PCT_ACC = 10000


def approx_percentile_rank_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audits Spark's approx_percentile against its FORMAL rank-error
    contract: with accuracy A, the returned value's exact rank must
    lie within n/A of the target rank q·n (Greenwald-Khanna style
    guarantee) — a much tighter check than
    [[approx_distinct_stats]]'s 10% value tolerance (here the bound
    is ±0.01% of n). The emitted columns are the exact
    percentile_disc values plus boolean in-bound flags; the oracle
    emits the same exact values with literal TRUE flags, so a sketch
    regression breaks the hash match while the output stays
    deterministic (sketch values themselves never surface).

    Scale: two scans — one combined aggregate computing n, the six
    exact order statistics, and the six sketch probes; one follow-up
    scan counting rows below/at each probe value (conditional sums
    against the broadcast 1-row probe relation). Rank checks are
    exact integer comparisons."""
    li = load(spark, sf_dir, "lineitem").select(
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("tick")
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for q in _PCT_QS:
        aggs.append(
            F.expr(
                f"percentile_disc({q / 1000}) WITHIN GROUP (ORDER BY tick)"
            ).alias(f"x_{q}")
        )
        aggs.append(
            F.expr(f"approx_percentile(tick, {q / 1000}, {_PCT_ACC})").alias(
                f"a_{q}"
            )
        )
    one = li.agg(*aggs)
    counts = li.crossJoin(F.broadcast(one)).agg(
        *[
            F.sum((F.col("tick") < F.col(f"a_{q}")).cast("bigint")).alias(f"lt_{q}")
            for q in _PCT_QS
        ],
        *[
            F.sum((F.col("tick") <= F.col(f"a_{q}")).cast("bigint")).alias(
                f"le_{q}"
            )
            for q in _PCT_QS
        ],
    )
    rows = []
    for q in _PCT_QS:
        rows.append(
            one.crossJoin(F.broadcast(counts)).select(
                F.lit(q).alias("q_permille"),
                F.col("n_rows"),
                F.col(f"x_{q}").alias("exact_tick"),
                F.expr(
                    # the approx value's exact-rank interval
                    # [lt+1, le] must intersect the guaranteed band
                    # q*n ± n/ACC (empty input passes vacuously)
                    f"CASE WHEN n_rows = 0 THEN TRUE ELSE"
                    f" le_{q} >= CAST(floor({q / 1000} * n_rows"
                    f"   - CAST(n_rows AS DOUBLE) / {_PCT_ACC}) AS BIGINT)"
                    f" AND lt_{q} < CAST(ceil({q / 1000} * n_rows"
                    f"   + CAST(n_rows AS DOUBLE) / {_PCT_ACC}) AS BIGINT) + 1 END"
                ).alias("rank_in_bound"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("q_permille")


def _pct_audit_oracle() -> str:
    selects = [
        f"""
SELECT {q} AS q_permille, count(*)::BIGINT AS n_rows,
       percentile_disc({q / 1000}) WITHIN GROUP (ORDER BY tick) AS exact_tick,
       TRUE AS rank_in_bound
FROM (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS tick
      FROM lineitem)"""
        for q in _PCT_QS
    ]
    return " UNION ALL ".join(selects) + "\nORDER BY q_permille"


QUERIES = {
    "duplicate_payment_candidates": duplicate_payment_candidates,
    "join_cardinality_audit": join_cardinality_audit,
    "approx_percentile_rank_audit": approx_percentile_rank_audit,
}

ORACLES = {
    "duplicate_payment_candidates": _DUP_PAY_SQL,
    "join_cardinality_audit": _join_audit_oracle(),
    "approx_percentile_rank_audit": _pct_audit_oracle(),
}
