"""Byte-pair-encoding merge statistics over ``documents`` — the
inner loop of tokenizer training (count adjacent symbol pairs,
rank candidate merges). [beyond-reference] surface (SURVEY.md §2.2,
LLM-pipeline tokenization family).

The trick that makes BPE trainable at corpus scale is counting pairs
on the WORD DICTIONARY, not the corpus: Zipf's law makes distinct
words orders of magnitude fewer than word occurrences, so the
quadratic-ish per-word symbol work runs on the dictionary while the
corpus contributes only a word-count aggregation (one shuffle of the
words themselves). This query implements exactly that two-stage
shape for the first merge round (symbols = characters):

  corpus --split/explode--> words --groupBy--> (word, n)   [big agg]
  dict --sequence/explode--> adjacent char pairs × n       [small]
  pairs --groupBy--> merge candidates, top-20              [tiny]

Words split on the single-space convention the rest of the llm/
modules use (string_split(text, ' ') on both engines — no regex
class to diverge); ties in the merge ranking break lexicographically
so top-20 is deterministic.

Scale: stage 1 is the only corpus-sized shuffle (word strings,
map-side combined). Stage 2's explode factor is word length — bounded
by the dictionary, not the corpus. Later BPE rounds would re-segment
the dictionary against the chosen merges (iterate this query with a
merges broadcast); the corpus agg is computed once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.base import load

TOP_MERGES = 20


def bpe_pair_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        wc.filter(F.length("w") >= 2)
        .select("w", "n", F.explode(F.expr("sequence(1, length(w) - 1)")).alias("i"))
        .select(F.expr("substr(w, i, 2)").alias("pair"), "n")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "pair")
        .limit(TOP_MERGES)
    )


_BPE_SQL = f"""
WITH words AS (
  SELECT t.w
  FROM documents,
       UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS t(w)
),
wc AS (SELECT w, count(*) AS n FROM words GROUP BY w),
pairs AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, n
  FROM wc, UNNEST(generate_series(1, length(w) - 1)) AS r(i)
  WHERE length(w) >= 2
)
SELECT pair, CAST(sum(n) AS BIGINT) AS pair_count
FROM pairs
GROUP BY pair
ORDER BY pair_count DESC, pair
LIMIT {TOP_MERGES}
"""


QUERIES = {"bpe_pair_merge_counts": bpe_pair_merge_counts}
ORACLES = {"bpe_pair_merge_counts": _BPE_SQL}
