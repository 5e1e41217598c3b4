"""Structured Streaming over the events surface.

The batch queries in events_batch.py use window()/session_window()
expressions; this module wires the SAME expressions to
readStream → withWatermark → writeStream, which is how they run
against a live source (Kafka/files) on a cluster. Tests drive it with
a file source + ``trigger(availableNow=True)`` + memory sink, so the
incremental state path (not the batch fast-path) actually executes.

Watermarking: 30 minutes — late events older than the watermark are
dropped and window state is evicted, bounding state size; that bound
is what makes a 100 TB/day stream feasible. ``dropDuplicatesWithinWatermark``
dedups on event_id with the same bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WATERMARK = "30 minutes"
SESSION_GAP = "15 minutes"

EVENTS_SCHEMA_NANOS = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)
EVENTS_SCHEMA_MICROS = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream with the same ts normalization the batch
    loader applies (see queries/base.py). Streaming sources need an
    explicit schema, so peek at the on-disk encoding with a one-off
    batch schema read (driver-side, metadata only) and pick the
    matching fixed schema."""
    from pyspark.sql.types import LongType

    on_disk = spark.read.parquet(source_dir).schema["ts"].dataType
    if isinstance(on_disk, LongType):
        raw = (
            spark.readStream.schema(EVENTS_SCHEMA_NANOS)
            .format("parquet")
            .option("path", source_dir)
            .load()
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA_MICROS)
        .format("parquet")
        .option("path", source_dir)
        .load()
    )
    # Watermarks require TIMESTAMP (not NTZ); UTC session tz makes
    # this cast an exact identity on the stored micros.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def streaming_variant_counts(events: DataFrame) -> DataFrame:
    """Streaming VARIANT ingestion: parse the JSON payload into the
    shredded binary form once per event, extract typed fields, and
    maintain a watermarked hourly rollup per (event_type, k_decile).
    This is the schema-on-read stream-ingest shape — the payload is
    parsed exactly once at ingest, never re-parsed downstream, and
    the state size is bounded by the watermark as usual."""
    return (
        events.withColumn("v", F.parse_json(F.col("props")))
        .withColumn("k", F.expr("variant_get(v, '$.k', 'int')"))
        .withWatermark("ts", WATERMARK)
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
            F.expr("k div 10").alias("k_decile"),
        )
        .agg(F.count("*").alias("n_events"), F.sum("k").cast("bigint").alias("sum_k"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "k_decile",
            "n_events",
            "sum_k",
        )
    )


def streaming_tumbling_counts(events: DataFrame) -> DataFrame:
    """Watermarked 1-hour tumbling aggregation (append-able state)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_session_counts(events: DataFrame) -> DataFrame:
    """Watermarked session windows (15-minute gap) per user."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup_events(events: DataFrame) -> DataFrame:
    """Exactly-once-style dedup on event_id bounded by the watermark."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(["event_id"])


def run_foreach_batch_to_parquet(stream_df: DataFrame, out_dir: str):
    """foreachBatch sink: per-micro-batch custom writes — the hook
    for upserts/merges/multi-sink fan-out that writeStream formats
    can't express. Batch id + append mode give at-least-once with
    idempotent-by-path semantics."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .start()
    )
    q.awaitTermination(300)
    return q


def run_to_memory(stream_df: DataFrame, query_name: str, output_mode: str = "complete"):
    """Drain the stream with availableNow into an in-memory table;
    returns the finished StreamingQuery (results via
    ``spark.table(query_name)``)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q


ATTRIBUTION_WINDOW_S = 300  # purchases credit clicks within 5 minutes


def streaming_click_purchase_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream interval join: every (click, purchase) pair for
    the same user where the purchase lands within 5 minutes after the
    click — the attribution-join shape. BOTH sides are watermarked
    and the join condition carries the time range, so each side's
    buffered state is evicted once the other side's watermark passes
    the range bound: state is (watermark + window) sized, never
    unbounded. At 100 TB/day this bound is what makes the join
    runnable at all; without the range condition Spark rejects the
    plan outright (unbounded state).

    Inner join; the micro-batch incremental path emits each matched
    pair exactly once (append mode)."""
    c = (
        clicks.withWatermark("ts", WATERMARK)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", WATERMARK)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS")
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
    )


def streaming_click_purchase_left_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """LEFT OUTER variant of [[streaming_click_purchase_join]] — the
    abandonment face of attribution: clicks that convert emit their
    (click, purchase) pairs exactly as the inner join does, and
    clicks that DON'T convert within the window emit one null-padded
    row once the purchase-side watermark passes click_ts + window
    (i.e. once no future purchase can still match). The null row is
    therefore a *watermark-gated* result: it cannot be emitted
    eagerly, because correctness requires proving the absence of a
    match — this is the semantics that distinguishes a streaming
    outer join from a batch one, and why unmatched rows near the
    stream tail stay buffered until the watermark moves past them.
    State bound is identical to the inner join (watermark + window);
    Spark's no-data batches flush the evictions."""
    c = clicks.withWatermark("ts", WATERMARK).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", WATERMARK).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS")
        ),
        "leftOuter",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
    )


def streaming_pit_enrich(facts: DataFrame, dim: DataFrame) -> DataFrame:
    """Streaming face of queries/scd.py::pit_state_at_purchase — the
    ONLINE feature lookup: each micro-batch of purchase facts is
    LEFT-joined to the (static, periodically rebuilt) SCD2 state
    dimension valid at fact time. Stream-static joins keep NO
    streaming state — the dim is re-planned per micro-batch, so the
    usual nightly dimension rebuild is picked up on the next batch
    without restarting the query. Interval disjointness keeps the
    lookup ≤1 row per fact; append mode emits each enriched fact
    exactly once.

    ``dim`` columns: d_user, state_type, valid_from, valid_to
    (renamed by the caller — see tests) to avoid fact-column capture."""
    f = facts.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return f.join(
        dim,
        (f["user_id"] == dim["d_user"])
        & (dim["valid_from"] <= f["ts"])
        & (dim["valid_to"].isNull() | (f["ts"] < dim["valid_to"])),
        "left",
    ).select("event_id", "user_id", "ts", "state_type", F.col("valid_from").alias("state_since"))


def streaming_anomaly_alerts(events: DataFrame, thresholds: DataFrame) -> DataFrame:
    """Streaming face of queries/profiling.py::anomaly_event_hours —
    the standard deploy shape: baseline (median/MAD per type) is
    computed offline over history, then live micro-batches are scored
    against it with a stream-static broadcast join. State is the
    watermarked hourly aggregation only; the thresholds are a static
    dim re-broadcast per micro-batch."""
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    hourly = (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    return (
        hourly.join(F.broadcast(thresholds), "event_type")
        .where(F.abs(F.col("n_events") - F.col("med")) > 3 * F.col("mad"))
        .select(
            F.col("w.start").alias("hour"), "event_type", "n_events", "med", "mad"
        )
    )
