"""Issue-report sinks (reference app.py:110-119,127-133).

The reference pretty-prints row-by-row and writes one CSV file with
header ``Table,Column,Issue Type,Issue,Recommendation``
(app.py:111). Here:

- console sink formats on the driver from a bounded ``collect()``
  (an issue report is human-scale by definition; we still cap it);
- CSV sink is a distributed write — ``coalesce(1)`` only when a
  single file is required for reference-compatibility, partitioned
  parquet otherwise (the scale path).

The reference writes into a never-created ``exports/`` directory
(app.py:135 vs Dockerfile:19 — SURVEY.md §2.3(8)); we create parent
dirs, deliberately fixing that.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Header field names per reference app.py:111 (note "Issue Type" with
# a space — the reference's dict key is "issue type").
CSV_COLUMNS = {
    "table": "Table",
    "column": "Column",
    "issue_type": "Issue Type",
    "issue": "Issue",
    "recommendation": "Recommendation",
}


def print_report(issues: DataFrame, database_name: str, limit: int = 1000) -> str:
    """Per-issue 5-line pretty print, matching app.py:127-133."""
    rows = issues.limit(limit).collect()
    if not rows:
        return f'No issues detected in schema "{database_name}".'
    lines = [f'Schema "{database_name}" issues detected:']
    for r in rows:
        lines.append(f"Table: {r['table']}")
        lines.append(f"Column: {r['column']}")
        lines.append(f"Issue Type: {r['issue_type']}")
        lines.append(f"Issue: {r['issue']}")
        lines.append(f"Recommendation: {r['recommendation']}\n")
    out = "\n".join(lines)
    print(out)
    return out


def _renamed(issues: DataFrame) -> DataFrame:
    return issues.select(
        *[F.col(src).alias(dst) for src, dst in CSV_COLUMNS.items()]
    )


def write_csv(issues: DataFrame, path: str, single_file: bool = True) -> None:
    """CSV sink (app.py:110-119). ``single_file`` reproduces the
    reference's one-file output; leave False for partitioned writes
    at scale."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    df = _renamed(issues)
    if single_file:
        df = df.coalesce(1)
    df.write.mode("overwrite").option("header", True).csv(path)


def write_parquet(issues: DataFrame, path: str) -> None:
    """Scale-path sink: partitioned parquet, no coalesce."""
    issues.write.mode("overwrite").parquet(path)
