"""File-format sources/sinks beyond the reference's single CSV write
(reference app.py:110-119): parquet (partitioned + plain), CSV, JSON,
ORC, and bucketed tables for co-located joins.

Scale notes:
- Partitioned parquet writes (partitionBy) give partition pruning on
  read — the first lever against a 100 TB scan.
- Bucketed tables (bucketBy + saveAsTable) pre-shuffle both join
  sides once at write time; subsequent equi-joins on the bucket key
  skip the exchange entirely (verified in tests via the query plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_range_clustered_parquet(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8
) -> None:
    """Range-cluster the data on ``cols`` before writing: global range
    partitioning + an in-partition sort makes every output file own a
    disjoint key range, so parquet min/max statistics prune whole
    files/row-groups for range predicates on those keys. This is the
    sorted-layout lever (z-order-lite) that makes a 100 TB time- or
    key-range scan touch only the matching slice."""
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_small_files(
    spark: SparkSession, in_path: str, out_path: str, target_file_bytes: int = 128 << 20
) -> int:
    """Small-file compaction: rewrite a fragmented parquet dataset
    into ceil(total_bytes / target) files. The small-files problem is
    the classic operational failure at 100 TB — a streaming or
    per-batch writer leaves millions of KB-sized files, and every
    downstream scan then pays per-file open/footer/scheduling costs
    that dwarf the I/O. Sizing comes from the filesystem's own
    content summary (works on HDFS/S3A/local alike), and the rewrite
    is a single round-robin repartition — no skew, no sort, scan
    speed in and out. Returns the target file count."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(in_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpath).getLength()
    n_files = max(1, -(-total // target_file_bytes))
    (
        spark.read.parquet(in_path)
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_files


ZORDER_BITS = 16


def _zorder_key(x_norm, y_norm):
    """Interleave the low 16 bits of two normalized ints into a
    32-bit Morton (z-order) key — pure JVM bit ops, whole-stage
    codegen, no UDF."""
    from pyspark.sql import functions as F

    key = F.lit(0).cast("long")
    for i in range(ZORDER_BITS):
        bx = F.shiftright(x_norm, i).bitwiseAND(F.lit(1))
        by = F.shiftright(y_norm, i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(bx, 2 * i)).bitwiseOR(F.shiftleft(by, 2 * i + 1))
    return key


def write_zorder_clustered_parquet(
    df: DataFrame, path: str, col_x: str, col_y: str, n_files: int = 16
) -> None:
    """Two-dimensional clustered layout: rows are range-partitioned
    and sorted by a Morton (z-order) interleave of both columns, so
    every output file owns a compact rectangle in (x, y) space and
    parquet min/max footers prune files for range predicates on
    EITHER column. This is the layout answer when two access patterns
    compete — single-column range clustering (see
    write_range_clustered_parquet) serves one dimension perfectly and
    the other not at all; z-order serves both at ~sqrt efficiency.
    Normalization bounds come from one tiny min/max aggregate."""
    from pyspark.sql import functions as F

    mm = df.agg(
        F.min(col_x).alias("xlo"),
        F.max(col_x).alias("xhi"),
        F.min(col_y).alias("ylo"),
        F.max(col_y).alias("yhi"),
    ).first()
    scale = (1 << ZORDER_BITS) - 1

    def norm(c, lo, hi):
        if hi == lo:
            return F.lit(0).cast("long")
        return F.floor(
            (F.col(c).cast("double") - float(lo)) * scale / (float(hi) - float(lo))
        ).cast("long")

    key = _zorder_key(norm(col_x, mm.xlo, mm.xhi), norm(col_y, mm.ylo, mm.yhi))
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def delete_keys_partition_rewrite(
    spark: SparkSession, path: str, partition_col: str, key_col: str, keys: DataFrame
) -> list:
    """Targeted hard-delete (GDPR right-to-be-forgotten shape):
    remove every row whose ``key_col`` is in ``keys`` from a
    ``partition_col``-partitioned parquet dataset, rewriting ONLY the
    partitions that actually contain matches. At 100 TB a full-corpus
    rewrite for a few thousand keys is the failure mode; this touches
    the deletion footprint only:

    1. one broadcast semi-join finds the affected partition values;
    2. each affected partition is anti-joined against the key list
       and written to a temp dir, then swapped in crash-safely
       (backup-aside rename via partition_swap.py — readers never see
       a half-written partition and a crash mid-swap loses nothing);
    3. untouched partitions keep their exact bytes (asserted in
       tests via file listing + mtimes).

    Returns the list of rewritten partition values."""
    from pyspark.sql import functions as F

    data = spark.read.parquet(path)
    affected = sorted(
        r[0]
        for r in data.join(F.broadcast(keys), key_col)
        .select(partition_col)
        .distinct()
        .collect()
    )
    from .partition_swap import recover_partition_swaps, swap_partition

    recover_partition_swaps(spark, path)
    for val in affected:
        part_dir = f"{path}/{partition_col}={val}"
        tmp_dir = f"{path}/.rewrite-{partition_col}={val}"
        remaining = spark.read.parquet(part_dir).join(keys, key_col, "left_anti")
        remaining.write.mode("overwrite").parquet(tmp_dir)
        swap_partition(spark, part_dir, tmp_dir)
    return affected


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_bucketed_table(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8, sort_col: str | None = None
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Joins/aggregations on ``bucket_col`` between two tables bucketed
    the same way run shuffle-free."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A crashed previous run can leave the managed location behind
    # with no catalog entry; saveAsTable then refuses the name.
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)

    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)
