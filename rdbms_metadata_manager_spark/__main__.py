"""CLI entry point — drop-in replacement for the reference's
``python app.py`` UX (reference app.py:122-137).

Env contract (identical to the reference README:18-31):
  DB_URL         SQLAlchemy-style URL; the database name is parsed
                 from the path. jdbc: URLs are passed to the JDBC
                 catalog source. The special scheme ``fixture://<name>``
                 runs offline on the built-in metadata fixtures
                 (ecommerce_db / quirks_db) — the tested path in
                 environments with no live database.
  EXPORT_TO_CSV  "YES" → also write exports/<db>_schema_issues.csv
                 (the reference never created exports/; we do).

Exit output matches the reference: per-issue 5-line blocks, or
'No issues detected in schema "<db>".'
"""

from __future__ import annotations

import os
import sys

from .catalog import fixtures
from .catalog.jdbc_source import (
    get_database_name,
    read_columns_meta,
    read_foreign_keys_meta,
    read_indexes_meta,
)
from .rules import detect_schema_flaws
from .session import get_spark
from .sinks import print_report, write_csv


def main() -> int:
    db_url = os.getenv("DB_URL")
    if not db_url:
        raise ValueError(
            "Connect String (DB_URL) not set. Please provide it in the .env file."
        )
    spark = get_spark("schema-auditor-cli")

    if db_url.startswith("fixture://"):
        database_name = db_url[len("fixture://") :] or "ecommerce_db"
        cols = fixtures.columns_meta(spark, database_name)
        idx = fixtures.indexes_meta(spark, database_name)
        fks = fixtures.foreign_keys_meta(spark, database_name)
    else:
        database_name = get_database_name(db_url)
        dialect = "postgresql" if db_url.startswith(("postgresql", "jdbc:postgresql")) else "mysql"
        cols = read_columns_meta(spark, db_url, database_name, dialect)
        idx = read_indexes_meta(spark, db_url, database_name, dialect)
        fks = read_foreign_keys_meta(spark, db_url, database_name, dialect)

    issues = detect_schema_flaws(cols, idx, fks)
    print_report(issues, database_name)
    if not issues.isEmpty() and os.getenv("EXPORT_TO_CSV", "NO").strip().upper() == "YES":
        path = f"exports/{database_name}_schema_issues.csv"
        write_csv(issues, path)
        print(f"Results exported to {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
