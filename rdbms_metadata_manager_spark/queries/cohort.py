"""Cohort / retention analytics over ``events``.

[beyond-reference] classic OLAP surface the reference lacks entirely
(its only output is the per-column issue report, app.py:127-133).
Cohort retention is the canonical "needs two passes over the same
grouping key" query shape: assign each user to the day of their
first event, then count how many of each cohort remain active N
days later.

Day indexing is pure integer math on epoch seconds
(``epoch // 86400``) — no calendar truncation, so Spark and DuckDB
agree exactly (date_trunc('week') is locale/engine-sensitive; integer
day buckets are not).

Scale: both aggregates shuffle on ``user_id`` — Spark plans the
first-event aggregate and the distinct (user, day) activity set over
the SAME exchange (AQE reuse), then the cohort matrix groupBy is over
(cohort_day, offset), a few hundred groups. The cohort-size table is
cohorts-count rows, broadcast back for the rate. At 100 TB the only
big shuffle is the one-pass user_id partitioning you would pre-bucket
the event log by anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load

DAY_SECONDS = 24 * 3600


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention matrix: (cohort_day, day_offset) →
    distinct active users, cohort size, and retention rate. One
    division per output row on integer-exact counts (bit-identical
    cross-engine)."""
    events = load(spark, sf_dir, "events")
    daily = events.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / DAY_SECONDS).alias("day_idx"),
    )
    cohorts = daily.groupBy("user_id").agg(F.min("day_idx").alias("cohort_day"))
    activity = daily.distinct()
    matrix = (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_day", (F.col("day_idx") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
    sizes = cohorts.groupBy("cohort_day").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    return (
        matrix.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "active_users",
            "cohort_size",
            (F.col("active_users").cast("double") / F.col("cohort_size").cast("double")).alias(
                "retention_rate"
            ),
        )
        .orderBy("cohort_day", "day_offset")
    )


_COHORT_SQL = f"""
WITH daily AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 1000000 // {DAY_SECONDS} AS day_idx
  FROM events
),
cohorts AS (
  SELECT user_id, min(day_idx) AS cohort_day FROM daily GROUP BY user_id
),
matrix AS (
  SELECT c.cohort_day, w.day_idx - c.cohort_day AS day_offset,
         count(DISTINCT w.user_id) AS active_users
  FROM daily w JOIN cohorts c USING (user_id)
  GROUP BY 1, 2
),
sizes AS (
  SELECT cohort_day, count(DISTINCT user_id) AS cohort_size
  FROM cohorts GROUP BY cohort_day
)
SELECT m.cohort_day, m.day_offset, m.active_users, s.cohort_size,
       m.active_users::DOUBLE / s.cohort_size::DOUBLE AS retention_rate
FROM matrix m JOIN sizes s USING (cohort_day)
ORDER BY m.cohort_day, m.day_offset
"""


def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining: the 10 most common 3-step
    event-type paths across user histories — the behavior-modeling
    aggregate (session path analysis / next-event training data) that
    MATCH_RECOGNIZE engines special-case; two lead() windows express
    it relationally.

    Scale: one shuffle on user_id for the window pair, then a
    map-side-combined count on a short path string (≤ |event_types|³
    = 125 distinct groups here), and the top-10 compiles to
    TakeOrderedAndProject — no full sort, no second wide shuffle."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "event_type", "e2", "e3").alias("path"))
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_paths"))
        .orderBy(F.desc("n_paths"), "path")
        .limit(10)
    )


_PATHS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || e2 || '>' || e3 AS path,
       count(*) AS n_paths
FROM seq
WHERE e3 IS NOT NULL
GROUP BY 1
ORDER BY n_paths DESC, path
LIMIT 10
"""


QUERIES = {
    "cohort_retention": cohort_retention,
    "event_path_trigrams": event_path_trigrams,
}
ORACLES = {
    "cohort_retention": _COHORT_SQL,
    "event_path_trigrams": _PATHS_SQL,
}
