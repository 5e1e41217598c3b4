"""Embedding scalar quantization (int8) over ``embeddings``.

[beyond-reference] similarity-search scale lever (BASELINE.json north
star; reference has no data plane at all — its whole surface is
app.py:25-107 metadata rules). A float32 embedding corpus at 100 TB
is mostly vector bytes; per-dimension int8 scalar quantization cuts
the ANN working set 4x so IVF cell scans (``ivf.py``) stay
memory-resident on each executor. This is the standard
quantize-then-rerank layout: search over codes, re-score the short
candidate list against the float originals.

Cross-engine exactness: every arithmetic step is IEEE-754 double with
the same expression tree in Spark and DuckDB — the float32 input is
widened to double (exact), per-dim min/max are doubles, and the code
is ``least(floor((v - minv) * 256 / (maxv - minv)), 255) - 128``,
an integer both engines agree on bit-for-bit (floor can only sit on
an exact-integer boundary at v == minv / v == maxv, both exact).

Scale: the per-dimension min/max table is DIM rows (64 here) — a
map-side partial aggregate followed by a broadcast join back onto the
exploded corpus: no shuffle of the big side at all. The explode is a
generator projection, pipelined inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.base import load

QUANT_LEVELS = 256  # int8: codes shifted to [-128, 127]


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension min-max scalar quantization of every embedding
    to an int8 code. Output is one row per (vec_id, dim) with the
    1-based dimension index — the columnar layout a PQ/SQ index
    builder consumes directly."""
    emb = load(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "raw")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("dim"),
        F.col("raw").cast("double").alias("v"),
    )
    ranges = vals.groupBy("dim").agg(
        F.min("v").alias("minv"), F.max("v").alias("maxv")
    )
    code = (
        F.least(
            F.floor((F.col("v") - F.col("minv")) * QUANT_LEVELS / (F.col("maxv") - F.col("minv"))),
            F.lit(255),
        )
        - 128
    )
    return (
        vals.join(F.broadcast(ranges), "dim")
        .select("vec_id", "dim", code.cast("int").alias("code"))
        .orderBy("vec_id", "dim")
    )


_QUANT_SQL = f"""
WITH vals AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
ranges AS (
  SELECT dim, min(v) AS minv, max(v) AS maxv FROM vals GROUP BY dim
)
SELECT vec_id, vals.dim,
       CAST(least(floor((v - minv) * {QUANT_LEVELS} / (maxv - minv)), 255) - 128 AS INT) AS code
FROM vals JOIN ranges ON vals.dim = ranges.dim
ORDER BY vec_id, vals.dim
"""


def embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruction-error report per dimension: mean absolute error
    between the original value and the dequantized code centre, plus
    the dimension's range. The go/no-go stat before committing an ANN
    index to quantized codes. Integer-exact inputs, one mean — the
    sum order inside avg() is engine-dependent, so the mean is kept
    exact by summing scaled BIGINT error ticks (floor-tick pattern,
    see profiling.py) and dividing once."""
    emb = load(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "raw")
    ).select(
        (F.col("pos") + 1).alias("dim"),
        F.col("raw").cast("double").alias("v"),
    )
    ranges = vals.groupBy("dim").agg(
        F.min("v").alias("minv"), F.max("v").alias("maxv")
    )
    width = (F.col("maxv") - F.col("minv")) / QUANT_LEVELS
    code = F.least(
        F.floor((F.col("v") - F.col("minv")) * QUANT_LEVELS / (F.col("maxv") - F.col("minv"))),
        F.lit(255),
    )
    recon = F.col("minv") + (code + F.lit(0.5)) * width
    # exact mean: per-row |err| is IEEE-identical cross-engine; scale
    # to integer 1e9-ticks before summing so the reduction commutes.
    err_ticks = F.floor(F.abs(F.col("v") - recon) * 1e9).cast("bigint")
    return (
        vals.join(F.broadcast(ranges), "dim")
        .withColumn("err_ticks", err_ticks)
        .groupBy("dim")
        .agg(
            F.sum("err_ticks").alias("sum_err_ticks"),
            F.count("*").alias("n"),
            F.min("minv").alias("dim_min"),
            F.max("maxv").alias("dim_max"),
        )
        .select(
            "dim",
            (F.col("sum_err_ticks").cast("double") / F.col("n") / 1e9).alias("mae"),
            "dim_min",
            "dim_max",
        )
        .orderBy("dim")
    )


_QUANT_ERR_SQL = f"""
WITH vals AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
ranges AS (
  SELECT dim, min(v) AS minv, max(v) AS maxv FROM vals GROUP BY dim
),
scored AS (
  SELECT vals.dim, minv, maxv,
         floor(abs(v - (minv + (least(floor((v - minv) * {QUANT_LEVELS} / (maxv - minv)), 255) + 0.5)
                        * ((maxv - minv) / {QUANT_LEVELS}))) * 1e9)::BIGINT AS err_ticks
  FROM vals JOIN ranges ON vals.dim = ranges.dim
)
SELECT dim,
       (sum(err_ticks)::BIGINT)::DOUBLE / count(*) / 1e9 AS mae,
       min(minv) AS dim_min,
       max(maxv) AS dim_max
FROM scored GROUP BY dim ORDER BY dim
"""


QUERIES = {
    "embedding_quantize_int8": embedding_quantize_int8,
    "embedding_quantization_error": embedding_quantization_error,
}

ORACLES = {
    "embedding_quantize_int8": _QUANT_SQL,
    "embedding_quantization_error": _QUANT_ERR_SQL,
}
