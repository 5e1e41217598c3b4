"""Schema drift detection: diff two catalog snapshots.

A natural extension of the reference's domain (its whole surface is a
single point-in-time scan, app.py:27-29): given yesterday's and
today's ``columns_meta`` snapshots, report what changed — columns
added, columns dropped, and in-place alterations (type, nullability,
length, key-ness). This is the input a schema-governance process
actually consumes: rules say "this schema is bad", drift says "this
schema CHANGED under you".

Shape: one full-outer join on the (database, table, column) key —
the full catalog key the rules engine uses (rules/engine.py::_KEY),
so same-named tables in two databases never cross-match — then pure
Column expressions classify each row. Alterations emit one row per
changed attribute (a small fixed stack of when-clauses — attribute
count is bounded, so this is a constant-width projection, not an
explode of data).

Scale: catalog metadata is small (SCALE.md), but the same plan is
safe at any size — a single co-partitioned full-outer join; at 10^7
columns per snapshot this is one shuffle of slim rows. Deterministic
output order by (table, column, change).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# attribute name → column in columns_meta, compared as strings for a
# uniform before/after report
_TRACKED = ["data_type", "char_max_length", "is_nullable", "is_unique", "is_primary_key"]


def schema_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Diff two ``columns_meta`` snapshots. Returns one row per
    (table, column, change) with change ∈ {column_added,
    column_dropped, <attribute>_changed} and stringified
    before/after values."""
    key = ["database", "table_name", "column_name"]
    o = old.select(key + _TRACKED).alias("o")
    n = new.select(key + _TRACKED).alias("n")
    joined = o.join(n, key, "full_outer").select(
        *[F.coalesce(f"o.{k}", f"n.{k}").alias(k) for k in key],
        F.col("o.data_type").isNotNull().alias("_in_old"),
        F.col("n.data_type").isNotNull().alias("_in_new"),
        *[F.col(f"o.{a}").cast("string").alias(f"old_{a}") for a in _TRACKED],
        *[F.col(f"n.{a}").cast("string").alias(f"new_{a}") for a in _TRACKED],
    )

    added = joined.filter(~F.col("_in_old") & F.col("_in_new")).select(
        "database",
        "table_name",
        "column_name",
        F.lit("column_added").alias("change"),
        F.lit(None).cast("string").alias("before"),
        F.col("new_data_type").alias("after"),
    )
    dropped = joined.filter(F.col("_in_old") & ~F.col("_in_new")).select(
        "database",
        "table_name",
        "column_name",
        F.lit("column_dropped").alias("change"),
        F.col("old_data_type").alias("before"),
        F.lit(None).cast("string").alias("after"),
    )
    both = joined.filter(F.col("_in_old") & F.col("_in_new"))
    altered = [
        both.filter(
            ~(F.col(f"old_{a}").eqNullSafe(F.col(f"new_{a}")))
        ).select(
            "database",
            "table_name",
            "column_name",
            F.lit(f"{a}_changed").alias("change"),
            F.col(f"old_{a}").alias("before"),
            F.col(f"new_{a}").alias("after"),
        )
        for a in _TRACKED
    ]
    return reduce(DataFrame.unionByName, [added, dropped] + altered).orderBy(
        "database", "table_name", "column_name", "change"
    )
