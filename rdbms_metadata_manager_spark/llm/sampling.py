"""Deterministic sampling / splitting / packing over ``documents``.

[beyond-reference] training-data-pipeline surface: reproducible
corpus sampling is the first operator any 100 TB pretraining run
needs — `rand()` resamples differently per run and per partitioning,
so every decision here is a pure function of the row key via the
md5-derived `h32` hash (identical in Spark and DuckDB, see
``hashing.py``). That makes splits stable under repartitioning,
retries, and engine swaps — and lets the DuckDB oracle check them
exactly.

Scale: all three operators are embarrassingly parallel projections
or a single window over a partitioned key — no driver collects, no
Python UDFs; at 100 TB they run at scan speed (the packing window
shuffles once on its partition key, which is the intended layout for
writing shards anyway).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries.base import load
from .hashing import h32, h32_sql

# Per-language per-mille keep rates: downsample dominant English,
# keep the tail languages whole — the standard corpus-rebalancing
# move. (Rates are per-mille of the deterministic hash bucket.)
STRAT_RATES = {"en": 400, "de": 1000, "fr": 1000, "es": 1000, "zh": 800}
SEQ_BUDGET = 512  # tokens per packed training sequence


def _split_bucket(key):
    """0..99 bucket from a salted md5 hash of the doc key."""
    return h32(F.concat(F.lit("split:"), key.cast("string"))) % 100


def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment keyed on
    doc_id. The split survives reshuffles and incremental re-runs:
    a document's assignment never depends on what else is in the
    batch (unlike ``df.randomSplit``, which is seed- and
    partitioning-sensitive)."""
    docs = load(spark, sf_dir, "documents")
    bucket = _split_bucket(F.col("doc_id"))
    return (
        docs.select(
            "doc_id",
            "lang",
            bucket.alias("bucket"),
            F.when(bucket < 80, "train")
            .when(bucket < 90, "val")
            .otherwise("test")
            .alias("split"),
        )
        .orderBy("doc_id")
    )


_SPLIT_KEY = "'split:' || doc_id::VARCHAR"
_SPLIT_BUCKET_SQL = f"{h32_sql(_SPLIT_KEY)} % 100"

_SPLIT_SQL = f"""
SELECT doc_id, lang,
       {_SPLIT_BUCKET_SQL} AS bucket,
       CASE WHEN {_SPLIT_BUCKET_SQL} < 80 THEN 'train'
            WHEN {_SPLIT_BUCKET_SQL} < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
ORDER BY doc_id
"""


def sample_stratified_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified Bernoulli sample with per-language keep rates
    (STRAT_RATES, per-mille) — hash-deterministic, so the sampled
    set is reproducible byte-for-byte. The rate table is a broadcast
    lookup join, exactly like the reference's Rule-4 expected-type
    dictionary (app.py:79-84) but applied to the data plane."""
    docs = load(spark, sf_dir, "documents")
    # pandas+Arrow so the 5-row rate table is a LocalTableScan, not a
    # Python-RDD scan (see catalog/fixtures.py::_local_df rationale).
    rates = spark.createDataFrame(
        pd.DataFrame({"lang": list(STRAT_RATES), "keep_rate": list(STRAT_RATES.values())})
    )
    bucket = h32(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))) % 1000
    return (
        docs.join(F.broadcast(rates), "lang")
        .where(bucket < F.col("keep_rate"))
        .select("doc_id", "lang", "source", bucket.alias("strat_bucket"))
        .orderBy("doc_id")
    )


_RATES_VALUES = ", ".join(f"('{k}', {v})" for k, v in STRAT_RATES.items())

_STRAT_SQL = f"""
WITH rates(lang, keep_rate) AS (VALUES {_RATES_VALUES})
SELECT d.doc_id, d.lang, d.source,
       {h32_sql("'strat:' || doc_id::VARCHAR")} % 1000 AS strat_bucket
FROM documents d JOIN rates USING (lang)
WHERE {h32_sql("'strat:' || doc_id::VARCHAR")} % 1000 < keep_rate
ORDER BY doc_id
"""


def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: within each language
    stream (ordered by doc_id), documents are laid end-to-end and
    cut into SEQ_BUDGET-token training sequences; each document is
    tagged with the sequence it *starts* in and its token offset
    there. One exclusive running sum per partition — all integer
    arithmetic, exact in both engines. At 100 TB the window
    partitions by the shard key you write out by, so the shuffle is
    the one you'd do anyway."""
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_cum = docs.select(
        "doc_id", "lang", n_tokens.alias("n_tokens")
    ).withColumn("start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return (
        with_cum.select(
            "doc_id",
            "lang",
            "n_tokens",
            F.floor(F.col("start_offset") / SEQ_BUDGET).alias("seq_id"),
            (F.col("start_offset") % SEQ_BUDGET).alias("offset_in_seq"),
        )
        .orderBy("lang", "doc_id")
    )


_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, lang, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_offset
  FROM t
)
SELECT doc_id, lang, n_tokens,
       start_offset // {SEQ_BUDGET} AS seq_id,
       start_offset % {SEQ_BUDGET} AS offset_in_seq
FROM c
ORDER BY lang, doc_id
"""


RESERVOIR_K = 5


def sample_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-group sample (k docs per source) — a
    derandomized reservoir: rank rows by a salted hash and keep the
    top k per group. Same uniform-without-replacement guarantee as
    reservoir sampling, but deterministic and mergeable: at 100 TB
    each partition pre-ranks locally, and re-running on more data
    only ever *replaces* ranks, never reshuffles past picks."""
    docs = load(spark, sf_dir, "documents")
    pri = h32(F.concat(F.lit("reservoir:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy("pri", "doc_id")
    return (
        docs.select("doc_id", "source", pri.alias("pri"))
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= RESERVOIR_K)
        .select("source", "sample_rank", "doc_id")
        .orderBy("source", "sample_rank")
    )


_RESERVOIR_SQL = f"""
WITH r AS (
  SELECT doc_id, source,
         {h32_sql("'reservoir:' || doc_id::VARCHAR")} AS pri,
         ROW_NUMBER() OVER (
             PARTITION BY source
             ORDER BY {h32_sql("'reservoir:' || doc_id::VARCHAR")}, doc_id
         ) AS sample_rank
  FROM documents
)
SELECT source, sample_rank::INT AS sample_rank, doc_id
FROM r WHERE sample_rank <= {RESERVOIR_K}
ORDER BY source, sample_rank
"""


WEIGHTED_K = 100


def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional sample: k docs with the
    smallest hash/weight priority (weight = n_chars, so longer docs
    are proportionally likelier — the hash plays the role of the
    uniform draw in A-ES weighted reservoir sampling, derandomized).
    Global top-k by (priority, doc_id) plans as TakeOrderedAndProject
    — per-partition heaps, merge k rows, no global sort."""
    docs = load(spark, sf_dir, "documents")
    pri = (
        h32(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string")))
        / F.col("n_chars")
    )
    return (
        docs.select("doc_id", "n_chars", pri.alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(WEIGHTED_K)
    )


_WEIGHTED_SQL = f"""
SELECT doc_id, n_chars,
       {h32_sql("'wsamp:' || doc_id::VARCHAR")} * 1.0 / n_chars AS priority
FROM documents
ORDER BY priority, doc_id
LIMIT {WEIGHTED_K}
"""


QUERIES = {
    "split_train_val_test": split_train_val_test,
    "sample_stratified_lang": sample_stratified_lang,
    "pack_training_sequences": pack_training_sequences,
    "sample_reservoir_per_source": sample_reservoir_per_source,
    "sample_weighted_topk": sample_weighted_topk,
}

ORACLES = {
    "split_train_val_test": _SPLIT_SQL,
    "sample_stratified_lang": _STRAT_SQL,
    "pack_training_sequences": _PACK_SQL,
    "sample_reservoir_per_source": _RESERVOIR_SQL,
    "sample_weighted_topk": _WEIGHTED_SQL,
}
