"""Corpus-level text ranking: TF-IDF top terms, and per-label
embedding centroids (the coarse quantizer an IVF index builds on).

TF-IDF uses a RATIONAL idf (N/df, no logarithm): logarithms are
libm-dependent across engines and a 1-ulp difference could flip a
rank at the top-k boundary; the rational form is bit-identical so
ranking (and therefore row membership) matches the oracle exactly.

Scale: tf/df are two aggregations over the exploded (doc, word)
stream — shuffles on (doc, word) and word respectively; N is a
1-row broadcast. No driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries.base import load_spread

TOP_TERMS = 3


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Everything derives from ONE (doc_id, word) aggregate: doc
    length is a window-sum over it (same doc_id partitioning the
    rank window needs anyway) and document frequency is a count of
    its rows per word (tf is already distinct per doc — no second
    explode+distinct pass). The naive form scans and explodes the
    corpus three times; this shape scans once, and Catalyst's
    exchange reuse collapses the tf subplan shared by the df branch.
    At 100 TB that is the difference between one corpus-wide shuffle
    of (doc_id, word) pairs plus a small word-keyed rollup, and
    three full-corpus shuffles."""
    d = load_spread(spark, sf_dir, "documents", "doc_id")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf_count"))
    df = tf.groupBy("word").agg(F.count("*").alias("doc_freq"))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    w_doc = Window.partitionBy("doc_id")
    scored = (
        tf.withColumn("n_words", F.sum("tf_count").over(w_doc))
        .join(F.broadcast(df), "word")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tf_count") * 1.0 / F.col("n_words"))
            * (F.col("n_docs") * 1.0 / F.col("doc_freq")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_TERMS)
        .select("doc_id", "rank", "word", "tfidf")
        .orderBy("doc_id", "rank")
    )


_TFIDF_SQL = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, word, count(*) AS tf_count FROM words GROUP BY 1, 2),
doc_len AS (SELECT doc_id, count(*) AS n_words FROM words GROUP BY 1),
df AS (SELECT word, count(*) AS doc_freq FROM (SELECT DISTINCT doc_id, word FROM words) GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word,
         (tf.tf_count * 1.0 / doc_len.n_words) * (n.n_docs * 1.0 / df.doc_freq) AS tfidf
  FROM tf JOIN doc_len USING (doc_id) JOIN df USING (word) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, word, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rank
  FROM scored
)
SELECT doc_id, rank, word, tfidf FROM ranked
WHERE rank <= {TOP_TERMS}
ORDER BY doc_id, rank
"""


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (IVF coarse quantizer): positional explode →
    per-dimension mean → norm. The norm is rounded (aggregation order
    differs between engines in the last bits)."""
    e = load_spread(spark, sf_dir, "embeddings", "vec_id")
    dims = e.select("label", "vec_id", F.posexplode("embedding").alias("pos", "v"))
    per_dim = dims.groupBy("label", "pos").agg(F.avg(F.col("v").cast("double")).alias("c"))
    return (
        per_dim.groupBy("label")
        .agg(
            F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias("centroid_norm"),
            F.count("*").alias("n_dims"),
        )
        .join(
            e.groupBy("label").agg(F.count("*").alias("n_vecs")),
            "label",
        )
        .select("label", "n_vecs", "n_dims", "centroid_norm")
        .orderBy("label")
    )


_CENTROIDS_SQL = """
WITH dims AS (
  SELECT label, vec_id, g.i AS pos, CAST(embedding[g.i] AS DOUBLE) AS v
  FROM embeddings, unnest(range(1, 65)) AS g(i)
),
per_dim AS (SELECT label, pos, avg(v) AS c FROM dims GROUP BY 1, 2),
norms AS (
  SELECT label, round(sqrt(sum(c * c)), 6) AS centroid_norm, count(*) AS n_dims
  FROM per_dim GROUP BY label
),
counts AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label)
SELECT label, n_vecs, n_dims, centroid_norm
FROM norms JOIN counts USING (label)
ORDER BY label
"""


QUERIES = {
    "tfidf_top_terms": tfidf_top_terms,
    "embedding_centroids": embedding_centroids,
}

ORACLES = {
    "tfidf_top_terms": _TFIDF_SQL,
    "embedding_centroids": _CENTROIDS_SQL,
}
