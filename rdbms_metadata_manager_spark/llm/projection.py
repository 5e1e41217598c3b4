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

from ..queries.base import load, load_spread
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


def _dim_stats_kernel(table):
    """Whole-group Arrow kernel: one numpy sort per dimension.
    percentile_disc(q) = smallest value with CDF ≥ q, i.e. sorted
    index ceil(q·n) − 1 — reproduced exactly so the DuckDB oracle
    hash-matches."""
    import numpy as np
    import pyarrow as pa

    t = np.sort(table.column("t").to_numpy(zero_copy_only=False))
    n = len(t)
    med = int(t[(n + 1) // 2 - 1])
    ad = np.sort(np.abs(t - med))
    mad = int(ad[(n + 1) // 2 - 1])
    n_out = int((ad > 5 * mad).sum()) if mad > 0 else 0
    dim = int(table.column("dim")[0].as_py())
    return pa.table(
        {
            "dim": pa.array([dim], pa.int32()),
            "n_vals": pa.array([n], pa.int64()),
            "med_tick": pa.array([med], pa.int64()),
            "mad_tick": pa.array([mad], pa.int64()),
            "n_outliers": pa.array([n_out], pa.int64()),
            "is_dead": pa.array([mad == 0], pa.bool_()),
        }
    )


def embedding_dim_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION embedding health report: exact median, MAD,
    5×MAD outlier count, and a dead-dimension flag (MAD = 0) over
    integer ticks — the robust-statistics QA an embedding pipeline
    runs to catch collapsed, saturated, or exploding dimensions
    before they poison downstream ANN/clustering.

    Plan: ONE codegen posexplode scan → one exchange of compact
    (dim:int, tick:int64) rows on the 64-value key → a grouped-map
    `applyInArrow` kernel (whole group as an arrow Table, one numpy
    sort each). The all-relational percentile_disc form measured
    3.6 s at sf0.1 (three scans, interpreted SortAggregates over the
    1.6 M-row exploded relation); this shape is one shuffle and
    vectorized math. Per-group rows = corpus size — for billions of
    vectors switch the kernel to streaming batches with a two-pass
    histogram median; the 64-way key fan-out stays the same. Plain
    ``load`` (not ``load_spread``): the pre-kernel work is one
    trivial explode projection, and the dim exchange redistributes
    anyway — a vec_id repartition would just be a second shuffle
    (plan-pinned to exactly one)."""
    emb = load(spark, sf_dir, "embeddings")
    elems = emb.select(F.posexplode("embedding").alias("dim", "x")).select(
        "dim", F.floor(F.col("x").cast("double") * TICK).cast("long").alias("t")
    )
    return (
        elems.groupBy("dim")
        .applyInArrow(
            _dim_stats_kernel,
            "dim int, n_vals long, med_tick long, mad_tick long, "
            "n_outliers long, is_dead boolean",
        )
        .orderBy("dim")
    )


_DIM_STATS_SQL = f"""
WITH elems AS (
  SELECT d - 1 AS dim,
         CAST(floor(embedding[d]::DOUBLE * {TICK}) AS BIGINT) AS t
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(d)
),
med AS (
  SELECT dim, percentile_disc(0.5) WITHIN GROUP (ORDER BY t) AS med_tick
  FROM elems GROUP BY dim
),
mad AS (
  SELECT e.dim,
         percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(e.t - m.med_tick)) AS mad_tick
  FROM elems e JOIN med m USING (dim)
  GROUP BY e.dim
)
SELECT e.dim,
       count(*) AS n_vals,
       m.med_tick,
       d.mad_tick,
       CAST(count(*) FILTER (
         WHERE d.mad_tick > 0 AND abs(e.t - m.med_tick) > 5 * d.mad_tick
       ) AS BIGINT) AS n_outliers,
       d.mad_tick = 0 AS is_dead
FROM elems e JOIN med m USING (dim) JOIN mad d USING (dim)
GROUP BY e.dim, m.med_tick, d.mad_tick
ORDER BY e.dim
"""


MAX_MAD_BAND = 5


def embedding_norm_outlier_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-vector norm health: histogram of |‖v‖² − median| in
    median-absolute-deviation bands — the cheap full-corpus screen
    for broken embeddings (zero vectors, un-normalized batches, a
    model half misconfigured mid-backfill) that per-dimension stats
    ([[embedding_dim_robust_stats]]) dilute across 64 columns.

    Exactness: ‖v‖² is an ORDERED left fold over double-cast
    elements (both engines fold the array in index order → identical
    doubles); median and MAD are ``percentile_disc`` — actual data
    values, no interpolated arithmetic; the band index is one float
    division on identical operands. Plan: one map-side fold per row,
    two tiny order-statistics aggregates, one 6-group rollup — the
    broadcast of (med, mad) is 1 row. MAD = 0 (perfectly uniform
    norms) puts every vector in band 0 rather than dividing by zero."""
    from .similarity import _as_double

    emb = load_spread(spark, sf_dir, "embeddings", "vec_id").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    # Materialize the (vec_id, norm2) and deviation relations: the
    # median/MAD branches would otherwise each re-plan the fold over
    # the raw vectors (3 scans of the corpus for a 16-byte/row
    # intermediate). On a cluster these are the tiny side tables of
    # the two order-statistics jobs.
    norms = emb.select(
        "vec_id",
        F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x).alias("norm2"),
    ).localCheckpoint(eager=True)
    stats = norms.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY norm2)").alias("med")
    )
    devs = (
        norms.crossJoin(F.broadcast(stats))
        .select("vec_id", "norm2", F.abs(F.col("norm2") - F.col("med")).alias("adev"))
        .localCheckpoint(eager=True)
    )
    mad = devs.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    band = F.expr(
        f"CASE WHEN mad = 0.0 THEN 0 "
        f"ELSE least(cast(floor(adev / mad) AS BIGINT), {MAX_MAD_BAND}) END"
    )
    return (
        devs.crossJoin(F.broadcast(mad))
        .select(band.alias("mad_band"), "vec_id")
        .groupBy("mad_band")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("mad_band")
    )


_NORM_BANDS_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
norms AS (
  SELECT vec_id,
         list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b) AS norm2
  FROM e
),
med AS (SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY norm2) AS med FROM norms),
devs AS (SELECT vec_id, abs(norm2 - med) AS adev FROM norms, med),
mad AS (SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY adev) AS mad FROM devs)
SELECT CASE WHEN mad = 0.0 THEN 0
            ELSE least(floor(adev / mad)::BIGINT, {MAX_MAD_BAND}) END AS mad_band,
       count(*) AS n_vecs
FROM devs, mad
GROUP BY 1
ORDER BY mad_band
"""


QUERIES = {
    "embedding_random_projection": embedding_random_projection,
    "embedding_dim_robust_stats": embedding_dim_robust_stats,
    "embedding_norm_outlier_bands": embedding_norm_outlier_bands,
}
ORACLES = {
    "embedding_random_projection": _PROJ_SQL,
    "embedding_dim_robust_stats": _DIM_STATS_SQL,
    "embedding_norm_outlier_bands": _NORM_BANDS_SQL,
}
