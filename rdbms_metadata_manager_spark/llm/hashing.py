"""Deterministic cross-engine hashing primitives.

Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` are different
functions, so every hash that must agree with the DuckDB oracle is
derived from md5 (identical in both engines): take the first 8 hex
chars → unsigned 32-bit int. 32 bits is plenty for shingle/minhash/
simhash work and stays well inside BIGINT in both engines.

Spark side: ``conv(substr(md5(x), 1, 8), 16, 10)::bigint``
DuckDB side: ``('0x' || substr(md5(x), 1, 8))::BIGINT``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h32(col: Column) -> Column:
    """Unsigned 32-bit hash of a string column (md5-prefix based)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def h32_sql(expr: str) -> str:
    """DuckDB rendering of the same hash."""
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def word_shingles(words: Column, n: int = 3, distinct: bool = True) -> Column:
    """n-word shingles from a words array (order preserved inside
    each shingle; ``distinct=False`` keeps repeats for repetition
    counting). Mirrors the DuckDB list-comprehension form in
    ``word_shingles_sql``.

    Short-array guard: for fewer than n words the result is EMPTY,
    matching DuckDB's empty ``range``. Without it,
    ``sequence(0, size-n)`` steps DOWNWARD for a negative stop
    ([0, -1]), fabricating a bogus shingle and then crashing in
    ``slice(words, 0, n)`` — every shingle-based operator would die
    on the first 1-2-word document while the oracle side sails on."""
    raw = F.when(F.size(words) >= n, F.sequence(F.lit(0), F.size(words) - n)).otherwise(
        F.array().cast("array<int>")
    )
    shingles = F.transform(raw, lambda j: F.concat_ws(" ", F.slice(words, j + 1, n)))
    return F.array_distinct(shingles) if distinct else shingles


def word_shingles_sql(words_expr: str, n: int = 3, distinct: bool = True) -> str:
    inner = (
        f"list_transform(range(1, len({words_expr}) - {n - 2}), "
        f"j -> array_to_string({words_expr}[j:j+{n - 1}], ' '))"
    )
    return f"list_distinct({inner})" if distinct else inner


# Salt-bucket count for control pairing. Constant by design: the
# pairing must be bit-reproducible across engines and cluster sizes,
# so the bucket key is a pure function of the row id, never of the
# physical partitioning. 32 buckets bounds the per-bucket rank window
# at corpus/32 rows — at 100 TB raise B (one constant) so each bucket
# fits an executor; the oracle formula scales with it automatically.
CONTROL_PAIR_BUCKETS = 32


def md5_control_pairs(df, id_col: str):
    """Deterministic ~|rows|/2 control pairing: md5-salted BUCKETED
    rank over ``id_col`` → adjacent ranks joined within each bucket —
    no row pairs with itself, every row appears in ≤1 pair. ONE
    definition shared by ``dedup.dedup_negative_control`` (text) and
    ``similarity.embedding_pair_cosine_profile`` (vectors), so the
    salt / bucket / tie-break / odd-even join can never drift between
    the two background-baseline faces. Returns every input column
    prefixed ``a_``/``b_``.

    Scale: the rank window is PARTITIONED BY the md5-derived bucket
    (``pmod(h32('ctl:'||id), B)``), so no executor ever sees more than
    ~corpus/B rows — the earlier unpartitioned ``Window.orderBy`` form
    moved the whole corpus to one partition (the "No Partition Defined
    for Window" warning flagged in VERDICT r4 #1). An odd-sized bucket
    drops its single tail row (≤B rows total, documented loss; the
    oracle mirrors the identical bucketed rank so both engines drop
    the same rows)."""
    from pyspark.sql import Window

    # ONE window pass: rank and the partner row's columns (lead(1) in
    # the same (bucket, rank) order) come out of the same WindowExec —
    # the previous odd/even split-and-self-join form evaluated the
    # window chain twice (the two filter branches share no subtree
    # after a column rename) and paid a (bucket, rank) join exchange
    # carrying the full payload on both sides (guide §2.4: remove the
    # shuffle outright — an adjacent-rank join IS lead()). Pair set is
    # identical: row at odd rank r pairs with rank r+1 in its bucket
    # iff that row exists; a NULL _h_next marks the dropped odd tail
    # (lead never crosses the partition = bucket boundary).
    w = Window.partitionBy("_bkt").orderBy(F.col("_h"), F.col(id_col))
    ranked = df.withColumn(
        "_h", F.md5(F.concat(F.lit("ctl:"), F.col(id_col)))
    ).withColumn(
        "_bkt",
        F.pmod(
            F.conv(F.substring(F.col("_h"), 1, 8), 16, 10).cast("bigint"),
            F.lit(CONTROL_PAIR_BUCKETS),
        ),
    )
    paired = ranked.select(
        F.row_number().over(w).alias("_rk"),
        F.lead("_h", 1).over(w).alias("_h_next"),
        *[F.col(c).alias(f"a_{c}") for c in df.columns],
        *[F.lead(c, 1).over(w).alias(f"b_{c}") for c in df.columns],
    )
    return paired.filter(
        (F.col("_rk") % 2 == 1) & F.col("_h_next").isNotNull()
    ).drop("_rk", "_h_next")


def md5_control_pairs_ctes(source_sql: str, id_col: str) -> str:
    """DuckDB rendering of the same bucketed pairing: a ``ranked`` CTE
    body to splice, consumed with ``CONTROL_PAIR_JOIN``."""
    return (
        "ranked AS (\n"
        f"  SELECT *, md5('ctl:' || {id_col}) AS _h,\n"
        f"         ('0x' || substr(md5('ctl:' || {id_col}), 1, 8))::BIGINT"
        f" % {CONTROL_PAIR_BUCKETS} AS _bkt,\n"
        f"         row_number() OVER (PARTITION BY ('0x' || substr(md5('ctl:' ||"
        f" {id_col}), 1, 8))::BIGINT % {CONTROL_PAIR_BUCKETS}"
        f" ORDER BY md5('ctl:' || {id_col}), {id_col}) AS _rk\n"
        f"  FROM ({source_sql})\n"
        ")"
    )


CONTROL_PAIR_JOIN = (
    "ranked a JOIN ranked b ON b._bkt = a._bkt AND b._rk = a._rk + 1"
    " AND a._rk % 2 = 1"
)
