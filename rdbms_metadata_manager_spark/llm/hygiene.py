"""Corpus hygiene: benchmark decontamination + repetition detection.

[beyond-reference] training-data-pipeline surface. Two checks every
pretraining corpus needs before a token is trained on:

- ``decontaminate_train_test``: which train-split documents share
  4-word shingles with the held-out test split (n-gram overlap is
  the standard benchmark-contamination test). Composes with the
  hash-deterministic split from ``sampling.py`` — the same bucket
  function, so "test set" here is exactly the set
  ``split_train_val_test`` calls test.
- ``text_repetition_stats``: intra-document repeated-shingle ratio
  (the Gopher-style boilerplate/spam signal) — a document whose
  3-gram stream is mostly duplicates is a template, not prose.

Scale: the test/benchmark side of decontamination is tiny relative
to the corpus (here 10%, in production a few MB of benchmarks), so
it broadcasts — the 100 TB train side is never shuffled for the
join; the only shuffle is the per-doc rollup of matches, keyed on a
32-bit shingle hash (small rows). Repetition stats shuffle the
hashed shingle stream once for the per-(doc,shingle) count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.base import load, load_spread
from .hashing import h32, h32_sql, word_shingles, word_shingles_sql
from .sampling import _SPLIT_BUCKET_SQL, _split_bucket

DECONTAM_N = 4  # words per shingle for cross-split overlap
REP_N = 3  # words per shingle for intra-doc repetition


def decontaminate_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-split documents that share ≥1 distinct 4-gram with any
    test-split document, with overlap strength. Test shingles build
    from a separate scan lineage (HOF-lambda projections break plan
    dedup on self-joins — see similarity.py) and broadcast."""
    words = F.split(F.col("text"), " ")
    shingles = word_shingles(words, DECONTAM_N)

    test_sh = (
        load(spark, sf_dir, "documents")
        .where(_split_bucket(F.col("doc_id")) >= 90)
        .select(F.explode(shingles).alias("shingle"))
        .select(h32(F.col("shingle")).alias("s"))
        .distinct()
    )
    train = (
        load_spread(spark, sf_dir, "documents", "doc_id")
        .where(_split_bucket(F.col("doc_id")) < 80)
        .select(
            "doc_id",
            F.size(shingles).alias("n_shingles"),
            F.explode(shingles).alias("shingle"),
        )
        .select("doc_id", "n_shingles", h32(F.col("shingle")).alias("s"))
    )
    return (
        train.join(F.broadcast(test_sh), "s")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count_distinct("s").alias("n_shared_shingles"))
        .select(
            "doc_id",
            "n_shingles",
            "n_shared_shingles",
            (F.col("n_shared_shingles") / F.col("n_shingles")).alias(
                "contamination_ratio"
            ),
        )
        .orderBy("doc_id")
    )


_SHINGLES = word_shingles_sql("string_split(text, ' ')", DECONTAM_N)

_DECONTAM_SQL = f"""
WITH d AS (
  SELECT doc_id, {_SPLIT_BUCKET_SQL} AS bucket, {_SHINGLES} AS shingles
  FROM documents
),
test_sh AS (
  SELECT DISTINCT {h32_sql("s")} AS s
  FROM (SELECT unnest(shingles) AS s FROM d WHERE bucket >= 90)
),
train AS (
  SELECT doc_id, len(shingles) AS n_shingles, {h32_sql("s")} AS s
  FROM (SELECT doc_id, shingles, unnest(shingles) AS s FROM d WHERE bucket < 80)
)
SELECT doc_id, n_shingles,
       count(DISTINCT s)::BIGINT AS n_shared_shingles,
       count(DISTINCT s) * 1.0 / n_shingles AS contamination_ratio
FROM train JOIN test_sh USING (s)
GROUP BY doc_id, n_shingles
ORDER BY doc_id
"""


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-shingle ratio per document. Shingles here are NOT
    deduplicated — repetition is the signal. The hashed shingle
    stream is shuffled once on (doc_id, hash); everything after is
    integer arithmetic."""
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    words = F.split(F.col("text"), " ")
    # distinct=False: repetition is the signal; the helper also
    # carries the short-doc guard (an inline sequence(0, size-n)
    # would crash on a sub-REP_N-word document)
    all_shingles = word_shingles(words, REP_N, distinct=False)
    exploded = docs.select(
        "doc_id",
        F.size(all_shingles).alias("n_shingles"),
        F.explode(all_shingles).alias("shingle"),
    ).select("doc_id", "n_shingles", h32(F.col("shingle")).alias("s"))
    per_shingle = exploded.groupBy("doc_id", "n_shingles", "s").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    dup_ratio = (F.col("n_shingles") - F.col("n_distinct_shingles")) / F.col(
        "n_shingles"
    )
    return (
        per_shingle.groupBy("doc_id", "n_shingles")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_shingles"),
            F.max("cnt").alias("max_shingle_freq"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_distinct_shingles",
            "max_shingle_freq",
            dup_ratio.alias("dup_shingle_ratio"),
            F.when(dup_ratio > 0.2, "repetitive").otherwise("ok").alias("verdict"),
        )
        .orderBy("doc_id")
    )


_REP_SHINGLES = (
    f"list_transform(range(1, len(string_split(text, ' ')) - {REP_N - 2}), "
    f"j -> array_to_string(string_split(text, ' ')[j:j+{REP_N - 1}], ' '))"
)

_REPETITION_SQL = f"""
WITH e AS (
  SELECT doc_id, len(shingles) AS n_shingles, {h32_sql("s")} AS s
  FROM (SELECT doc_id, {_REP_SHINGLES} AS shingles,
               unnest({_REP_SHINGLES}) AS s
        FROM documents)
),
c AS (
  SELECT doc_id, n_shingles, s, count(*) AS cnt
  FROM e GROUP BY doc_id, n_shingles, s
),
m AS (
  SELECT doc_id, n_shingles,
         count(*)::BIGINT AS n_distinct_shingles,
         max(cnt)::BIGINT AS max_shingle_freq
  FROM c GROUP BY doc_id, n_shingles
)
SELECT doc_id, n_shingles, n_distinct_shingles, max_shingle_freq,
       (n_shingles - n_distinct_shingles) * 1.0 / n_shingles AS dup_shingle_ratio,
       CASE WHEN (n_shingles - n_distinct_shingles) * 1.0 / n_shingles > 0.2
            THEN 'repetitive' ELSE 'ok' END AS verdict
FROM m
ORDER BY doc_id
"""


QUERIES = {
    "decontaminate_train_test": decontaminate_train_test,
    "text_repetition_stats": text_repetition_stats,
}

ORACLES = {
    "decontaminate_train_test": _DECONTAM_SQL,
    "text_repetition_stats": _REPETITION_SQL,
}
