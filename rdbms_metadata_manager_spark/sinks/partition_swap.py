"""Crash-safe partition swap for partitioned-parquet rewrites.

[beyond-reference] shared by the CDC upsert sink
(streaming/upsert.py) and the GDPR delete rewrite
(sinks/io_formats.py). Both rewrite one partition directory at a
time: new contents go to a dot-prefixed temp dir, then replace the
live dir. A naive ``delete(live); rename(tmp, live)`` has a crash
window in which the partition's pre-existing rows exist nowhere a
reader (or a redelivered micro-batch) can see — on restart a
foreachBatch upsert would find the partition missing and write only
the batch's rows, silently dropping every other key.

The swap here renames the live dir ASIDE instead of deleting it
(same recipe as streaming/incremental_agg.py's state swap), so at
every instant the previous contents survive either under the live
name or under the ``.swap-old-`` backup name:

- crash before the first rename → live dir untouched, temp dir is
  dot-prefixed garbage (invisible to Spark readers);
- crash between the renames → live dir missing, backup holds the
  previous contents → :func:`recover_partition_swaps` restores it;
- crash after the second rename → new contents live, stale backup →
  recover discards it.

``recover_partition_swaps`` is idempotent and cheap (one directory
listing); sinks call it on startup before applying new work.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

BACKUP_PREFIX = ".swap-old-"


def _fs(spark: SparkSession, path: str):
    hadoop = spark._jvm.org.apache.hadoop.fs.Path
    fs = hadoop(path).getFileSystem(spark._jsc.hadoopConfiguration())
    return hadoop, fs


def swap_partition(spark: SparkSession, live_dir: str, tmp_dir: str) -> None:
    """Replace ``live_dir`` with ``tmp_dir`` without a window where
    the previous contents are unrecoverable."""
    hadoop, fs = _fs(spark, live_dir)
    parent, name = live_dir.rsplit("/", 1)
    backup_dir = f"{parent}/{BACKUP_PREFIX}{name}"
    # A stale backup from an earlier crash would make the rename-aside
    # land inside it; recover first (also restores a half-swapped dir).
    recover_partition_swaps(spark, parent)
    if fs.exists(hadoop(live_dir)):
        fs.rename(hadoop(live_dir), hadoop(backup_dir))
    if not fs.rename(hadoop(tmp_dir), hadoop(live_dir)):
        raise IOError(f"rename {tmp_dir} -> {live_dir} failed")
    if fs.exists(hadoop(backup_dir)):
        fs.delete(hadoop(backup_dir), True)


def recover_partition_swaps(spark: SparkSession, root: str) -> list:
    """Finish or roll back any swap interrupted by a crash. For each
    ``.swap-old-X`` under ``root``: if ``X`` exists the new contents
    were committed → drop the backup; if ``X`` is missing the crash
    hit between the renames → restore the backup as ``X``. Returns
    the names handled (for tests/observability)."""
    hadoop, fs = _fs(spark, root)
    if not fs.exists(hadoop(root)):
        return []
    handled = []
    for status in fs.listStatus(hadoop(root)):
        name = str(status.getPath().getName())
        if not name.startswith(BACKUP_PREFIX):
            continue
        live = f"{root}/{name[len(BACKUP_PREFIX):]}"
        if fs.exists(hadoop(live)):
            fs.delete(status.getPath(), True)
            handled.append((name, "discarded"))
        else:
            fs.rename(status.getPath(), hadoop(live))
            handled.append((name, "restored"))
    return handled
