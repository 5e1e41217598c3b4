"""Live-PostgreSQL catalog reader over a ``psql`` subprocess transport.

Integration face for the reference's primary mode — a live database
connection (reference app.py:123-125, README.md:43-50). The catalog
SQL is the SAME text the JDBC reader uses (``jdbc_source._PG_*``);
only the wire differs: this container has PostgreSQL server binaries
but no JDBC driver jar or Python DB-API client, so rows travel as
``COPY (…) TO STDOUT (FORMAT text)`` through ``psql`` (tab-delimited,
backslash-escaped, unambiguous ``\\N`` NULL).

Scale note: a catalog is small even for a huge warehouse (10^5 tables
× 10^2 columns ≈ 10^7 rows ≈ 1 GB of text), so a single driver-side
read is the right shape; for a catalog beyond that, the JDBC reader's
partitioned-read options (jdbc_source._jdbc) are the cluster path.
The DataFrames produced here are byte-identical contracts to the
fixture and JDBC paths, so ``rules.detect_schema_flaws`` is
transport-agnostic.
"""

from __future__ import annotations

import shutil
import subprocess

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import jdbc_source
from .fixtures import _local_df
from .schemas import COLUMNS_META_SCHEMA, INDEXES_META_SCHEMA

_NULL = "\\N"

# COPY text-format backslash escapes (PostgreSQL documentation,
# "COPY ... Text Format"): a literal backslash in DATA always arrives
# doubled, so the bare sentinel '\N' is unambiguously NULL — unlike
# CSV format, where a data value equal to the NULL sentinel is merely
# quoted and csv parsing erases the distinction.
_TEXT_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f", "v": "\v", "\\": "\\"}


def _unescape(v: str) -> str:
    if "\\" not in v:
        return v
    out = []
    i = 0
    while i < len(v):
        c = v[i]
        if c == "\\" and i + 1 < len(v):
            out.append(_TEXT_ESCAPES.get(v[i + 1], v[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)

# Flat FK rows as they leave the catalog query, before
# jdbc_source.group_foreign_keys collapses them to one row/constraint.
_FK_FLAT_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("constraint_name", T.StringType(), False),
        T.StructField("column_name", T.StringType(), False),
        T.StructField("ordinal_position", T.IntegerType(), False),
        T.StructField("referred_table", T.StringType(), False),
        T.StructField("referred_column", T.StringType(), False),
    ]
)


def psql_available() -> bool:
    return shutil.which("psql") is not None


def run_sql(sql: str, database: str, host: str, user: str = "postgres") -> list[list[str | None]]:
    """Run ``sql`` and return rows as lists of strings (None for SQL
    NULL). ``host`` may be a unix-socket directory or a hostname.
    Uses COPY *text* format: tab-delimited, backslash-escaped, with
    an unambiguous ``\\N`` NULL (a data value of those two characters
    arrives escaped as ``\\\\N``)."""
    copy_stmt = f"COPY ({sql.rstrip().rstrip(';')}) TO STDOUT (FORMAT text)"
    out = subprocess.run(
        ["psql", "-h", host, "-U", user, "-d", database, "-X", "-q", "-v", "ON_ERROR_STOP=1", "-c", copy_stmt],
        check=True,
        capture_output=True,
        text=True,
    ).stdout
    # split on '\n' ONLY: COPY text escapes \n/\r in data, so the row
    # terminator is exactly one newline — str.splitlines() would also
    # split on U+0085/U+2028/U+2029, which COPY text does NOT escape,
    # breaking row framing for identifiers containing them.
    lines = out.split("\n")
    if lines and lines[-1] == "":
        lines.pop()  # COPY terminates every row with \n → one trailing ""
    return [
        [None if v == _NULL else _unescape(v) for v in line.split("\t")]
        for line in lines
    ]


def _coerce(rows: list[list[str | None]], schema: T.StructType) -> list[tuple]:
    """COPY-text strings → Python values per the contract schema
    (PostgreSQL output booleans are 't'/'f')."""
    def conv(v: str | None, dt: T.DataType):
        if v is None:
            return None
        if isinstance(dt, (T.IntegerType, T.LongType)):
            return int(v)
        if isinstance(dt, T.BooleanType):
            return v == "t"
        return v

    return [tuple(conv(v, f.dataType) for v, f in zip(row, schema.fields)) for row in rows]


def read_columns_meta_live(spark: SparkSession, database: str, host: str) -> DataFrame:
    rows = _coerce(run_sql(jdbc_source._PG_COLUMNS_QUERY, database, host), COLUMNS_META_SCHEMA)
    df = _local_df(spark, rows, COLUMNS_META_SCHEMA)
    return df.withColumn("data_type", jdbc_source._normalize_type(F.col("data_type")))


def read_indexes_meta_live(spark: SparkSession, database: str, host: str) -> DataFrame:
    rows = _coerce(run_sql(jdbc_source._PG_INDEXES_QUERY, database, host), INDEXES_META_SCHEMA)
    return _local_df(spark, rows, INDEXES_META_SCHEMA)


def read_foreign_keys_meta_live(spark: SparkSession, database: str, host: str) -> DataFrame:
    rows = _coerce(run_sql(jdbc_source._PG_FK_QUERY, database, host), _FK_FLAT_SCHEMA)
    return jdbc_source.group_foreign_keys(_local_df(spark, rows, _FK_FLAT_SCHEMA))


def read_catalog_live(spark: SparkSession, database: str, host: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three catalog contracts from a live PostgreSQL — the
    drop-in input for ``rules.detect_schema_flaws``."""
    return (
        read_columns_meta_live(spark, database, host),
        read_indexes_meta_live(spark, database, host),
        read_foreign_keys_meta_live(spark, database, host),
    )
