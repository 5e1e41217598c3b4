"""Parquet table loader for the driver testdata star schema.

At 100 TB these reads are partitioned parquet scans; everything the
query layer does must survive that — so loaders return lazy
DataFrames (no caching, no collect) and rely on Catalyst to push
filters/prune columns into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..memo import register_memo

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Shared epoch-day bucketing constant: Spark side is
# floor(unix_timestamp(ts) / DAY_SECONDS), oracle side is
# epoch_us(ts) // 1000000 // DAY_SECONDS — keep the two idioms
# adjacent to this constant when adding a new daily rollup
# (cohort.py, forecast.py). Integer floor semantics agree for the
# post-1970 timestamps in the testdata; negative epochs would need
# the truncation caveat in this module's loader notes.
DAY_SECONDS = 24 * 3600


# Resolved-plan memo: ``spark.read.parquet`` costs ~90-130 ms of
# DRIVER time per call (file listing + footer schema read + analysis
# round-trips), and most queries call ``load`` 1-4 times per build —
# pure per-build constant overhead at any scale. The memo holds the
# LAZY analyzed DataFrame only (no data, no cache): every
# materialization still scans the parquet from disk, so this is plan
# reuse (what a catalog/metastore gives a real deployment — schema
# resolved once per session, not per query), not result caching.
# Keyed by (session, applicationId) so a fresh session re-reads the
# footer — ADVICE r9 #1: applicationId alone is shared by sibling
# sessions from newSession(), whose different confs (e.g. nanosAsLong)
# must not be served another session's analyzed plan. id(spark) is
# disambiguated by the applicationId alongside it; the
# immutable-corpus contract in ``memo.py`` covers in-place rewrites
# (call ``clear_memos`` first).
_LOAD_CACHE: dict[tuple[int, str, str, str], DataFrame] = register_memo({})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), spark.sparkContext.applicationId, sf_dir, name)
    cached = _LOAD_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        # Two on-disk encodings exist across testdata generations:
        # TIMESTAMP(NANOS) — which spark.sql.legacy.parquet.nanosAsLong
        # surfaces as a raw BIGINT — and plain TIMESTAMP(MICROS). Only
        # the former needs conversion; truncate to micros with integer
        # `div`, NOT `/` (epoch-nanos ~1.7e18 exceed the double-exact
        # range, so float division mis-truncates the microsecond).
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # TIMESTAMP(MICROS) without UTC-adjustment surfaces as
            # TIMESTAMP_NTZ; the engine (watermarks, unix_micros paths)
            # standardizes on TIMESTAMP. Session tz is pinned UTC, so
            # the cast is an exact identity on the stored micros.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _LOAD_CACHE[key] = df
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load(spark, sf_dir, n) for n in names]


def load_spread(spark: SparkSession, sf_dir: str, name: str, key: str) -> DataFrame:
    """Load + repartition by key across all cores. The testdata
    parquet files are single row groups (one input split), which
    serializes CPU-bound per-row kernels (shingling, vector math,
    Pandas UDFs); a cheap shuffle of the raw rows unlocks full
    parallelism. On a real multi-file dataset this is a no-op choice —
    the scan already splits."""
    return load(spark, sf_dir, name).repartition(spark.sparkContext.defaultParallelism, key)
