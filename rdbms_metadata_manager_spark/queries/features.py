"""Feature engineering over ``orders``: scaling and winsorization.

[beyond-reference] the feature-prep surface of a training pipeline
(the reference computes nothing from data values at all —
SURVEY.md §1.2). One exact-statistics pass, then pure per-row
arithmetic:

- min-max scaling to [0, 1];
- robust scaling (subtract median, divide by IQR) — the scaler of
  choice under heavy tails because order statistics ignore outliers;
- winsorization (clip to [p01, p99]) — the standard tail-taming
  transform before a mean-sensitive model sees the column.

Cross-engine exactness: every statistic is an order statistic
(min/max/percentile_disc return ACTUAL data values, no interpolation
— see profiling.py), so the per-row arithmetic is IEEE-double on
identical inputs: bit-identical results, no rounding contract.

Scale: the stats aggregate collapses map-side to one row, broadcast
back over the scan (BroadcastNestedLoopJoin on a 1-row build is
constant work); the projection is whole-stage codegen. Two scans of
orders (stats + project) — at 100 TB you persist the 1-row stats
instead; the shape is otherwise scan-speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load


def feature_scale_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    stats = orders.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias("med"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)").alias("q1"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)").alias("q3"),
        F.expr("percentile_disc(0.01) WITHIN GROUP (ORDER BY o_totalprice)").alias("p01"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice)").alias("p99"),
    )
    x = F.col("o_totalprice")
    return (
        orders.join(F.broadcast(stats))
        .select(
            "o_orderkey",
            x.alias("o_totalprice"),
            ((x - F.col("lo")) / (F.col("hi") - F.col("lo"))).alias("minmax_scaled"),
            ((x - F.col("med")) / (F.col("q3") - F.col("q1"))).alias("robust_scaled"),
            F.least(F.greatest(x, F.col("p01")), F.col("p99")).alias("winsorized"),
        )
        .orderBy("o_orderkey")
    )


_FEATURE_SQL = """
WITH stats AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi,
         quantile_disc(o_totalprice, 0.5) AS med,
         quantile_disc(o_totalprice, 0.25) AS q1,
         quantile_disc(o_totalprice, 0.75) AS q3,
         quantile_disc(o_totalprice, 0.01) AS p01,
         quantile_disc(o_totalprice, 0.99) AS p99
  FROM orders
)
SELECT o_orderkey, o_totalprice,
       (o_totalprice - lo) / (hi - lo) AS minmax_scaled,
       (o_totalprice - med) / (q3 - q1) AS robust_scaled,
       least(greatest(o_totalprice, p01), p99) AS winsorized
FROM orders, stats
ORDER BY o_orderkey
"""


QUERIES = {"feature_scale_orders": feature_scale_orders}
ORACLES = {"feature_scale_orders": _FEATURE_SQL}
