"""End-to-end training-data preparation pipeline.

The composition the individual operators exist for: raw documents →
quality filter → exact dedup → MinHash near-dup removal → token
chunking → partitioned parquet. This is what an LLM ingestion job
runs at 100 TB; every stage is one of this engine's oracle-checked
operators, and the driver-checkable query returns the per-stage
survivor counts so the WHOLE pipeline is hash-compared to DuckDB.

Stage order (fixed): quality gate first (cheapest, biggest cut),
then exact dedup (hash groupBy), then near-dup removal using the
corpus-wide MinHash pair list (drop the higher doc_id of each pair),
then chunking (Σ ceil(tokens/32) windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.base import load_spread
from .dedup import _MINHASH_SQL, dedup_minhash_lsh
from .text import STOPWORDS
from .udfs import CHUNK_TOKENS

MIN_TOKENS = 20
MAX_STOPWORD_RATIO = 0.5


def _quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    words = F.split("text", " ")
    n = F.size(words)
    stop = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    return docs.select(
        "doc_id", "text", "lang", n.alias("n_tokens"), stop.alias("n_stop")
    ).filter((n >= MIN_TOKENS) & (stop / n <= MAX_STOPWORD_RATIO))


def pipeline_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final per-document survivor set with chunk counts."""
    quality = _quality_docs(spark, sf_dir)
    keepers = quality.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    exact = quality.join(keepers.select("doc_id"), "doc_id", "left_semi")
    near_dropped = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    return (
        exact.join(near_dropped, "doc_id", "left_anti")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr(f"(n_tokens + {CHUNK_TOKENS - 1}) div {CHUNK_TOKENS}").alias("n_chunks"),
        )
        .orderBy("doc_id")
    )


def pipeline_stage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: document counts after each stage + total chunks.
    The driver hash-compares this against the same pipeline in SQL —
    an end-to-end equivalence check over four composed operators."""
    docs_in = load_spread(spark, sf_dir, "documents", "doc_id").agg(
        F.count("*").alias("docs_in")
    )
    quality = _quality_docs(spark, sf_dir)
    n_quality = quality.agg(F.count("*").alias("after_quality"))
    keepers = quality.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("doc_id"))
    exact = quality.join(keepers.select("doc_id"), "doc_id", "left_semi")
    n_exact = exact.agg(F.count("*").alias("after_exact_dedup"))
    survivors = pipeline_survivors(spark, sf_dir)
    n_final = survivors.agg(
        F.count("*").alias("after_near_dedup"),
        F.sum("n_chunks").alias("total_chunks"),
    )
    return docs_in.crossJoin(n_quality).crossJoin(n_exact).crossJoin(n_final)


_PIPELINE_SQL = f"""
WITH quality AS (
  SELECT doc_id, text, lang,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
  WHERE len(string_split(text, ' ')) >= {MIN_TOKENS}
    AND len(list_filter(string_split(text, ' '),
                        x -> list_contains(['the', 'a', 'of', 'and'], x))) * 1.0
          / len(string_split(text, ' ')) <= {MAX_STOPWORD_RATIO}
),
keepers AS (
  SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)
),
exact AS (
  SELECT q.* FROM quality q WHERE q.doc_id IN (SELECT doc_id FROM keepers)
),
near_dropped AS (
  SELECT DISTINCT doc_b AS doc_id FROM ({_MINHASH_SQL})
),
survivors AS (
  SELECT e.doc_id, e.n_tokens,
         (e.n_tokens + {CHUNK_TOKENS - 1}) // {CHUNK_TOKENS} AS n_chunks
  FROM exact e
  WHERE e.doc_id NOT IN (SELECT doc_id FROM near_dropped)
)
SELECT (SELECT count(*) FROM documents)  AS docs_in,
       (SELECT count(*) FROM quality)    AS after_quality,
       (SELECT count(*) FROM exact)      AS after_exact_dedup,
       (SELECT count(*) FROM survivors)  AS after_near_dedup,
       (SELECT sum(n_chunks) FROM survivors) AS total_chunks
"""


def write_training_shards(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Materialize the survivor set as lang-partitioned parquet —
    the pipeline's production sink (partition pruning for readers)."""
    pipeline_survivors(spark, sf_dir).write.mode("overwrite").partitionBy("lang").parquet(out_dir)


QUERIES = {"pipeline_stage_counts": pipeline_stage_counts}
ORACLES = {"pipeline_stage_counts": _PIPELINE_SQL}
