"""Forecasting baseline + backtest over the ``events`` series.

[beyond-reference] the capacity-planning face of the events surface:
a seasonal-naive forecast (predict day d with the observation from
d-7 — the baseline every real forecasting system must beat) and its
rolling backtest, per event type. All integer day buckets and counts;
the error metric is integer absolute error, so both engines agree
bit-for-bit with no float contract at all.

Shape: one daily rollup, then a self-join of the rollup on
(event_type, day-7). The rollup is tiny (days x types), so the
self-join is broadcast; at 100 TB the heavy work is the single
map-side-combined daily aggregate — the forecasting math never
touches raw events again. A lag(7) window over the rollup would be
equivalent; the join form keeps gaps honest (a missing day-7 row
yields no prediction instead of silently lagging to an older day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import DAY_SECONDS, load

SEASON_DAYS = 7


def forecast_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, day): actual daily count, seasonal-naive
    prediction (count at day-7), absolute error. Only days whose
    day-7 exists are scored — the honest backtest frame."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / DAY_SECONDS).alias("day_idx"),
    ).agg(F.count("*").alias("n_events"))
    pred = daily.select(
        "event_type",
        (F.col("day_idx") + SEASON_DAYS).alias("day_idx"),
        F.col("n_events").alias("predicted"),
    )
    return (
        daily.join(F.broadcast(pred), ["event_type", "day_idx"])
        .select(
            "event_type",
            "day_idx",
            F.col("n_events").alias("actual"),
            "predicted",
            F.abs(F.col("n_events") - F.col("predicted")).alias("abs_error"),
        )
        .orderBy("event_type", "day_idx")
    )


_FORECAST_SQL = f"""
WITH daily AS (
  SELECT event_type,
         epoch_us(ts) // 1000000 // {DAY_SECONDS} AS day_idx,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT a.event_type, a.day_idx,
       a.n_events AS actual,
       p.n_events AS predicted,
       abs(a.n_events - p.n_events) AS abs_error
FROM daily a
JOIN daily p
  ON a.event_type = p.event_type AND a.day_idx = p.day_idx + {SEASON_DAYS}
ORDER BY a.event_type, a.day_idx
"""


def ewma_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of the daily event rate
    per type (α = ½) — the standard capacity-planning smoother, and a
    genuinely SEQUENTIAL fold no window frame expresses (each state
    depends on the previous one non-linearly scaled).

    Execution shape: the sequential part runs AFTER the daily rollup,
    so the per-key series is days-long (tiny) regardless of raw
    volume; collect_list over the rollup costs what the rollup
    shuffle already paid. The fold itself is an ordered in-row
    ``aggregate`` — s₁ = x₁, sₜ = (sₜ₋₁ + xₜ)/2 — mirrored by
    DuckDB's left-to-right ``list_reduce``: identical IEEE op
    sequence on both engines, so the doubles hash-match bit-for-bit
    (α = ½ keeps every step a dyadic halving; no libm, no
    aggregation-order hazard)."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / DAY_SECONDS).alias("day_idx"),
    ).agg(F.count("*").alias("n"))
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day_idx", "n"))),
            lambda s: s["n"].cast("double"),
        ).alias("xs"),
        F.count("*").alias("n_days"),
        F.max("day_idx").alias("last_day_idx"),
    )
    return (
        series.select(
            "event_type",
            "n_days",
            "last_day_idx",
            F.element_at("xs", -1).cast("bigint").alias("last_count"),
            F.aggregate(
                F.expr("slice(xs, 2, size(xs))"),
                F.element_at("xs", 1),
                lambda acc, x: (acc + x) / F.lit(2.0),
            ).alias("ewma"),
        )
        .orderBy("event_type")
    )


_EWMA_SQL = f"""
WITH daily AS (
  SELECT event_type,
         epoch_us(ts) // 1000000 // {DAY_SECONDS} AS day_idx,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT event_type,
         list(n::DOUBLE ORDER BY day_idx) AS xs,
         count(*)::BIGINT AS n_days,
         max(day_idx) AS last_day_idx
  FROM daily GROUP BY event_type
)
SELECT event_type, n_days, last_day_idx,
       xs[-1]::BIGINT AS last_count,
       list_reduce(xs, (acc, x) -> (acc + x) / 2) AS ewma
FROM series
ORDER BY event_type
"""


QUERIES = {
    "forecast_seasonal_naive_backtest": forecast_seasonal_naive_backtest,
    "ewma_daily_events": ewma_daily_events,
}
ORACLES = {
    "forecast_seasonal_naive_backtest": _FORECAST_SQL,
    "ewma_daily_events": _EWMA_SQL,
}
