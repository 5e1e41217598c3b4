"""Incremental aggregate maintenance via foreachBatch (streaming MV).

[beyond-reference] the continuously-maintained rollup: a running
per-(event_type, hour) aggregate kept in a parquet state table,
updated additively per micro-batch — the materialized-view
maintenance shape every metrics pipeline runs on top of a stream.

Additive merge differs from the CDC upsert (upsert.py): replaying a
batch would DOUBLE-COUNT, not overwrite, so at-least-once delivery
needs explicit replay protection. The recipe here is the standard
one table formats implement with transaction ids: a per-batch marker
(`_applied/batch-<id>`) committed after the swap; a redelivered
batch sees its marker and is skipped. Marker-after-swap means a
crash between swap and marker can replay a batch into a state that
already includes it — the swap is therefore guarded by writing the
marker into the swapped directory atomically with the state (the
marker IS part of the new state dir), closing that window.

Counted values are floor-tick integers (value * 10000), so merges
are associative/commutative in exact arithmetic — the property that
makes per-batch partials + state merge equal the one-shot batch
aggregate, which the test asserts.

Scale: per batch the work is (batch partials) + (merge against a
state table whose size is the key-cardinality, not the event
volume). State stays tiny relative to the stream; the full-outer
merge broadcasts whichever side is smaller. At 100 TB/day this is
the only shape that avoids re-scanning history every refresh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATE_SUBDIR = "state"
MARKER_SUBDIR = "_applied"


def _fs(spark: SparkSession, path: str):
    hadoop = spark._jvm.org.apache.hadoop.fs.Path
    return hadoop, hadoop(path).getFileSystem(spark._jsc.hadoopConfiguration())


def batch_partials(batch_df: DataFrame) -> DataFrame:
    return (
        batch_df.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy("event_type", "hour")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr("cast(floor(value * 10000 + 0.5) as bigint)")).alias(
                "sum_value_ticks"
            ),
        )
    )


def apply_increment(
    spark: SparkSession, target_dir: str, batch_df: DataFrame, batch_id: int
) -> bool:
    """Merge one micro-batch's partials into the state table.
    Returns False when the batch was already applied (replay)."""
    _recover(spark, target_dir)
    hadoop, fs = _fs(spark, target_dir)
    state_dir = f"{target_dir}/{STATE_SUBDIR}"
    marker = f"{state_dir}/{MARKER_SUBDIR}/batch-{batch_id}"
    if fs.exists(hadoop(marker)):
        return False
    partial = batch_partials(batch_df)
    if fs.exists(hadoop(state_dir)):
        current = spark.read.parquet(state_dir)
        merged = (
            current.alias("s")
            .join(partial.alias("p"), ["event_type", "hour"], "full_outer")
            .select(
                "event_type",
                "hour",
                (
                    F.coalesce(F.col("s.n_events"), F.lit(0))
                    + F.coalesce(F.col("p.n_events"), F.lit(0))
                ).alias("n_events"),
                (
                    F.coalesce(F.col("s.sum_value_ticks"), F.lit(0))
                    + F.coalesce(F.col("p.sum_value_ticks"), F.lit(0))
                ).alias("sum_value_ticks"),
            )
        )
        # carry forward already-applied markers so the swap keeps them
        old_markers = [
            str(s.getPath().getName())
            for s in fs.listStatus(hadoop(f"{state_dir}/{MARKER_SUBDIR}"))
        ] if fs.exists(hadoop(f"{state_dir}/{MARKER_SUBDIR}")) else []
    else:
        merged = partial
        old_markers = []

    tmp_dir = f"{target_dir}/.state-tmp-{batch_id}"
    merged.write.mode("overwrite").parquet(tmp_dir)
    # marker is committed INSIDE the new state dir before the swap:
    # state + applied-set always travel together in one rename.
    for name in old_markers + [f"batch-{batch_id}"]:
        fs.mkdirs(hadoop(f"{tmp_dir}/{MARKER_SUBDIR}/{name}"))
    # Swap without a window where NO committed state exists on disk:
    # old state is renamed ASIDE (never deleted before the new one is
    # in place); a crash at any point leaves either the old state, or
    # the backup that _recover() restores, or the new state + a stale
    # backup that _recover() discards.
    backup_dir = f"{target_dir}/.state-old-{batch_id}"
    if fs.exists(hadoop(state_dir)):
        fs.rename(hadoop(state_dir), hadoop(backup_dir))
    fs.rename(hadoop(tmp_dir), hadoop(state_dir))
    if fs.exists(hadoop(backup_dir)):
        fs.delete(hadoop(backup_dir), True)
    return True


def _recover(spark: SparkSession, target_dir: str) -> None:
    """Crash recovery for the backup-aside swap. Cases:
    - state exists, stale backups exist → new state committed before
      the crash; the backups are garbage → drop them.
    - state missing, backups exist → the crash hit between the two
      renames; the newest backup IS the last committed state+markers
      pair → restore it (replay protection stays intact because the
      markers live inside it).
    """
    hadoop, fs = _fs(spark, target_dir)
    if not fs.exists(hadoop(target_dir)):
        return
    state = hadoop(f"{target_dir}/{STATE_SUBDIR}")
    backups = [
        s.getPath()
        for s in fs.listStatus(hadoop(target_dir))
        if s.getPath().getName().startswith(".state-old-")
    ]
    if not backups:
        return
    if not fs.exists(state):
        newest = max(backups, key=lambda p: int(p.getName().rsplit("-", 1)[1]))
        fs.rename(newest, state)
        backups.remove(newest)
    for stale in backups:
        fs.delete(stale, True)


def run_incremental_agg(stream_df: DataFrame, target_dir: str, checkpoint_dir: str):
    """Maintain the rollup from a stream; availableNow drains and
    stops (test/backfill mode — drop the trigger on a live source)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_increment(batch_df.sparkSession, target_dir, batch_df, batch_id)

    q = (
        stream_df.writeStream.foreachBatch(apply)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination(300)
    return q


def read_state(spark: SparkSession, target_dir: str) -> DataFrame:
    _recover(spark, target_dir)
    return spark.read.parquet(f"{target_dir}/{STATE_SUBDIR}")
