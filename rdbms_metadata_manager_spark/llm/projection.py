"""Johnson–Lindenstrauss random projection 64 → 16 dims — the cheap
dimensionality reduction a curation pipeline runs before clustering /
ANN when full-width vectors are too expensive to shuffle (4× smaller
embeddings, pairwise distances preserved within JL distortion).
[beyond-reference] surface (SURVEY.md §2.2, LLM-pipeline family).

Projection matrix: md5-derived integer weights w[p,d] = h32(p||','||d)
mod 1001 − 500 — the same reproducible-pseudo-random construction as
the LSH hyperplanes (similarity.py), so the DuckDB oracle rebuilds
the identical matrix; element ticks floor(x·1000) make every
projection an exact int64 sum (no float accumulation order anywhere).

Plan shape: the relational dot product — posexplode the vector,
broadcast-join the 1 024-row plane table on the dimension key, one
partial-agged groupBy (vec_id, plane). Everything whole-stage
codegen; the interpreted-HOF fold alternative measured ~10× slower
on this box for pairwise work (BENCH_NOTES), and a Pandas-UDF matmul
(the gram.py pattern) is the escape hatch if P·D grows to real
matrix sizes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.base import load_spread
from .hashing import h32, h32_sql

N_PROJ = 16
PROJ_DIM = 64
TICK = 1000


def _plane_table(spark: SparkSession) -> DataFrame:
    ids = spark.range(N_PROJ * PROJ_DIM)
    seed = F.concat(
        (F.col("id") / PROJ_DIM).cast("long").cast("string"),
        F.lit(","),
        (F.col("id") % PROJ_DIM).cast("string"),
    )
    return ids.select(
        (F.col("id") / PROJ_DIM).cast("long").alias("plane"),
        (F.col("id") % PROJ_DIM).alias("d"),
        (h32(seed) % 1001 - 500).cast("long").alias("wt"),
    )


def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_spread(spark, sf_dir, "embeddings", "vec_id").select(
        "vec_id", F.col("embedding").alias("v")
    )
    elems = emb.select(
        "vec_id", F.posexplode(F.col("v")).alias("d", "x")
    ).select(
        "vec_id",
        "d",
        F.floor(F.col("x").cast("double") * TICK).cast("long").alias("xt"),
    )
    return (
        elems.join(F.broadcast(_plane_table(spark)), "d")
        .groupBy("vec_id", "plane")
        .agg(F.sum(F.col("xt") * F.col("wt")).alias("proj_ticks"))
        .orderBy("vec_id", "plane")
    )


_PROJ_SQL = f"""
WITH planes AS (
  SELECT i // {PROJ_DIM} AS plane, i % {PROJ_DIM} AS d,
         CAST({h32_sql(f"(i // {PROJ_DIM})::VARCHAR || ',' || (i % {PROJ_DIM})::VARCHAR")} % 1001 - 500 AS BIGINT) AS wt
  FROM (SELECT range AS i FROM range(0, {N_PROJ * PROJ_DIM}))
),
elems AS (
  SELECT vec_id, d - 1 AS d,
         CAST(floor(embedding[d]::DOUBLE * {TICK}) AS BIGINT) AS xt
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(d)
)
SELECT vec_id, plane, CAST(sum(xt * wt) AS BIGINT) AS proj_ticks
FROM elems JOIN planes USING (d)
GROUP BY vec_id, plane
ORDER BY vec_id, plane
"""


QUERIES = {"embedding_random_projection": embedding_random_projection}
ORACLES = {"embedding_random_projection": _PROJ_SQL}
