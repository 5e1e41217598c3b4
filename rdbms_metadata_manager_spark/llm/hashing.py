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
