"""Streaming incremental-distinct via mergeable HLL sketch state —
the streaming face of `queries/modern.py::hll_sketch_partition_union`
and the sketch sibling of `streaming/incremental_agg.py` (which
maintains ADDITIVE aggregates; distinct counts are the canonical
NON-additive aggregate, and the mergeable sketch is the production
answer: state per key is a fixed ~2^lgK bytes regardless of how many
ids were seen).

[beyond-reference] SURVEY.md §2.2 streaming surface. The query stages
``documents`` as a 3-file source drained one file per micro-batch
(`maxFilesPerTrigger=1`), and a ``foreachBatch`` sink folds each
batch's per-source `hll_sketch_agg` into a parquet state table with
`hll_union_agg` — the state never stores ids, only sketch binaries,
so a month of stream is the same state size as an hour. The emitted
report joins the final state against the batch-exact distinct counts:
`approx_ok` certifies the streamed union landed within the sketch's
documented band (lgConfigK=12, flag at ~3σ = 5%), and the oracle
emits the same exact counts with literal TRUE — any regression in
the state loop (lost batch, double merge poisoning an estimate,
binary corruption through the parquet round-trip) breaks the flag.

Scale: per batch one map-side-combinable sketch aggregate over the
batch plus a union over (state ∪ batch) keyed by source — state rows
= number of sources, not number of documents. The swap is
write-to-next-then-replace, the same crash posture as the
incremental-agg sink's backup-aside swap (state_v{N} dirs; the
latest complete version wins on restart).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.base import load
from .stream_dedup import _drain

LG_K = 12
HLL_BAND = 0.05  # ~3 sigma at lgConfigK=12 (rsd ~= 1.6%)


def streaming_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tempfile.mkdtemp(prefix="stream_hll_")
    src = os.path.join(d, "src")
    state_root = os.path.join(d, "state")
    ckpt = os.path.join(d, "ckpt")
    os.makedirs(state_root)
    try:
        base = load(spark, sf_dir, "documents")
        base.repartition(3).write.parquet(src)

        def _latest_state() -> DataFrame | None:
            versions = sorted(
                (p for p in os.listdir(state_root) if p.startswith("state_v")),
                key=lambda p: int(p.rsplit("v", 1)[1]),
            )
            if not versions:
                return None
            return spark.read.parquet(os.path.join(state_root, versions[-1]))

        def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
            batch_sk = batch_df.groupBy("source").agg(
                F.expr(f"hll_sketch_agg(text, {LG_K})").alias("sk")
            )
            prev = _latest_state()
            merged = (
                batch_sk
                if prev is None
                else prev.unionByName(batch_sk)
                .groupBy("source")
                .agg(F.expr("hll_union_agg(sk, false)").alias("sk"))
            )
            merged.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(state_root, f"state_v{batch_id}")
            )

        q = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(_merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, "streaming_hll_distinct")

        state = _latest_state()
        assert state is not None, "stream drained without producing state"
        # one state version per micro-batch: the literal 3 in the
        # oracle pins that maxFilesPerTrigger=1 really produced three
        # batches (a single-batch collapse would prove nothing about
        # cross-batch union)
        n_batches = len([p for p in os.listdir(state_root) if p.startswith("state_v")])
        per_source = state.select(
            F.col("source").alias("scope"), F.expr("hll_sketch_estimate(sk)").alias("est")
        )
        all_row = state.agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk, false))").alias("est")
        ).select(F.lit("ALL").alias("scope"), "est")
        exact = (
            base.groupBy(F.col("source").alias("scope"))
            .agg(F.countDistinct("text").alias("exact_docs"))
            .unionByName(
                base.agg(F.countDistinct("text").alias("exact_docs")).select(
                    F.lit("ALL").alias("scope"), "exact_docs"
                )
            )
        )
        result = (
            exact.join(per_source.unionByName(all_row), "scope")
            .select(
                "scope",
                "exact_docs",
                (
                    F.abs(F.col("est") - F.col("exact_docs"))
                    <= HLL_BAND * F.col("exact_docs")
                ).alias("approx_ok"),
                F.lit(n_batches).cast("bigint").alias("n_batches"),
            )
            .orderBy("scope")
            # materialize before the staging dir is deleted
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return result


_STREAM_HLL_SQL = """
SELECT source AS scope, count(DISTINCT text)::BIGINT AS exact_docs, TRUE AS approx_ok,
       3::BIGINT AS n_batches
FROM documents GROUP BY source
UNION ALL
SELECT 'ALL', count(DISTINCT text)::BIGINT, TRUE, 3::BIGINT FROM documents
ORDER BY scope
"""


def streaming_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Count-Min: the frequency-sketch sibling of
    [[streaming_hll_distinct]], built over ``events`` drained one
    file per micro-batch with a ``foreachBatch`` sink folding each
    batch's CMS cells into the state grid by cell-wise ADDITION.

    The contract is STRONGER than the HLL face's tolerance band:
    CMS cells are exactly additive, so the streamed state must equal
    the batch-built sketch BIT-FOR-BIT — the emitted report is the
    same top-K audit as ``queries.skew.countmin_heavy_hitters`` (per
    heavy user: exact count, CMS estimate, collision overestimate)
    plus the batch count, and the oracle recomputes the full sketch
    in SQL. Any lost batch, double merge, or geometry drift between
    the batch and streaming faces shifts a cell and breaks the hash.

    Scale: state is the fixed CMS_ROWS×CMS_WIDTH integer grid
    regardless of stream length; each micro-batch contributes one
    map-side-combined per-user rollup and a grid-sized union-sum.
    Same write-next-then-replace state versioning as the HLL face."""
    from ..queries.skew import cms_bucket_structs, cms_report

    d = tempfile.mkdtemp(prefix="stream_cms_")
    src = os.path.join(d, "src")
    state_root = os.path.join(d, "state")
    ckpt = os.path.join(d, "ckpt")
    os.makedirs(state_root)
    try:
        base = load(spark, sf_dir, "events")
        base.repartition(3).write.parquet(src)

        def _latest_state() -> DataFrame | None:
            versions = sorted(
                (p for p in os.listdir(state_root) if p.startswith("state_v")),
                key=lambda p: int(p.rsplit("v", 1)[1]),
            )
            if not versions:
                return None
            return spark.read.parquet(os.path.join(state_root, versions[-1]))

        def _batch_cells(df: DataFrame) -> DataFrame:
            counts = df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
            return (
                counts.select("n", F.explode(F.array(*cms_bucket_structs())).alias("rb"))
                .select("n", F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
                .groupBy("r", "bucket")
                .agg(F.sum("n").alias("cell"))
            )

        def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
            batch_cells = _batch_cells(batch_df)
            prev = _latest_state()
            merged = (
                batch_cells
                if prev is None
                else prev.unionByName(batch_cells)
                .groupBy("r", "bucket")
                .agg(F.sum("cell").alias("cell"))
            )
            merged.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(state_root, f"state_v{batch_id}")
            )

        q = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(_merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, "streaming_cms_heavy_hitters")

        cells = _latest_state()
        assert cells is not None, "stream drained without producing state"
        n_batches = len([p for p in os.listdir(state_root) if p.startswith("state_v")])
        counts = base.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
        result = (
            cms_report(counts, cells)  # the batch face's report, verbatim
            .withColumn("n_batches", F.lit(n_batches).cast("bigint"))
            .localCheckpoint(eager=True)  # materialize before staging dir dies
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return result


def _stream_cms_sql() -> str:
    from ..queries.skew import _CMS_SQL

    # the streamed state must equal the batch sketch exactly, so the
    # oracle IS the batch oracle plus the pinned 3-batch count
    body = _CMS_SQL.replace(
        "SELECT user_id, n_events, cms_estimate,\n       cms_estimate - n_events AS overestimate",
        "SELECT user_id, n_events, cms_estimate,\n"
        "       cms_estimate - n_events AS overestimate,\n"
        "       3::BIGINT AS n_batches",
    )
    assert "n_batches" in body, "oracle splice failed"
    return body


QUERIES = {
    "streaming_hll_distinct": streaming_hll_distinct,
    "streaming_cms_heavy_hitters": streaming_cms_heavy_hitters,
}
ORACLES = {
    "streaming_hll_distinct": _STREAM_HLL_SQL,
    "streaming_cms_heavy_hitters": _stream_cms_sql(),
}
