"""Skew-mitigation pattern: salted join.

AQE's skew-join splitting handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.py); explicit
salting is the manual fallback when one key dominates so badly that
even split partitions overload (the classic null-key / celebrity-user
problem at 100 TB).

Shape: the probe side appends a deterministic salt to the key; the
build side is exploded ×SALT_BUCKETS so every (key, salt) combination
exists. The join result is IDENTICAL to the unsalted join — the
oracle is the plain join — but the shuffle spreads each hot key over
SALT_BUCKETS reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load
from .relational import _money

SALT_BUCKETS = 8


def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.col("l_linenumber"), F.lit(SALT_BUCKETS))
    )
    o = load(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)]))
    )
    return (
        li.join(o, (li["l_orderkey"] == o["o_orderkey"]) & (li["salt"] == o["salt"]))
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(_money("l_extendedprice") * (1 - _money("l_discount"))), 2)
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("o_orderpriority")
    )


# The oracle is the UNSALTED join — salting must not change results.
_SALTED_SQL = """
SELECT o_orderpriority,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

HEAVY_K = 10


def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis: the top-K heaviest join/grouping keys and the
    share of all rows each one carries — the report you run BEFORE
    deciding whether a key needs salting or AQE skew splitting. The
    per-key count is a map-side-combined aggregate; the top-K plans
    as TakeOrderedAndProject (per-partition heaps, K rows merged);
    the grand total is a 1-row broadcast. One double division per
    output row on integer-exact counts."""
    events = load(spark, sf_dir, "events")
    total = events.groupBy().agg(F.count("*").alias("total"))
    counts = events.groupBy("user_id").agg(F.count("*").alias("n_events"))
    return (
        counts.orderBy(F.desc("n_events"), "user_id")
        .limit(HEAVY_K)
        .join(F.broadcast(total))
        .select(
            "user_id",
            "n_events",
            (F.col("n_events").cast("double") / F.col("total").cast("double")).alias(
                "row_share"
            ),
        )
        .orderBy(F.desc("n_events"), "user_id")
    )


_HEAVY_SQL = f"""
WITH counts AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
  ORDER BY n_events DESC, user_id LIMIT {HEAVY_K}
)
SELECT user_id, n_events,
       n_events::DOUBLE / (SELECT count(*) FROM events)::DOUBLE AS row_share
FROM counts
ORDER BY n_events DESC, user_id
"""


QUERIES = {
    "salted_join_revenue": salted_join_revenue,
    "heavy_hitter_users": heavy_hitter_users,
}
ORACLES = {
    "salted_join_revenue": _SALTED_SQL,
    "heavy_hitter_users": _HEAVY_SQL,
}
