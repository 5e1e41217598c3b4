"""Schema drift detection tests over the ecommerce fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdbms_metadata_manager_spark.catalog import fixtures
from rdbms_metadata_manager_spark.rules.drift import schema_drift


def test_identical_snapshots_yield_no_drift(spark):
    cols = fixtures.columns_meta(spark)
    assert schema_drift(cols, cols).count() == 0


def test_drift_classifies_add_drop_and_alterations(spark):
    old = fixtures.columns_meta(spark)
    new = (
        old.filter(~((F.col("table_name") == "Users") & (F.col("column_name") == "username")))
        .withColumn(
            "data_type",
            F.when(
                (F.col("table_name") == "Products") & (F.col("column_name") == "price"),
                F.lit("DECIMAL"),
            ).otherwise(F.col("data_type")),
        )
        .withColumn(
            "is_nullable",
            F.when(
                (F.col("table_name") == "Users") & (F.col("column_name") == "email"),
                F.lit(False),
            ).otherwise(F.col("is_nullable")),
        )
    )
    extra = old.filter(
        (F.col("table_name") == "Users") & (F.col("column_name") == "email")
    ).select(
        "database",
        "table_name",
        F.lit("email_verified_at").alias("column_name"),
        F.lit(99).alias("ordinal"),
        F.lit("DATETIME").alias("data_type"),
        F.lit(None).cast("int").alias("char_max_length"),
        F.lit(True).alias("is_nullable"),
        F.lit(None).cast("boolean").alias("is_unique"),
        F.lit(False).alias("is_primary_key"),
    )
    new = new.unionByName(extra)

    drift = {(r.table_name, r.column_name, r.change): r for r in schema_drift(old, new).collect()}
    assert ("Users", "username", "column_dropped") in drift
    assert ("Users", "email_verified_at", "column_added") in drift
    r = drift[("Products", "price", "data_type_changed")]
    assert r.before != "DECIMAL" and r.after == "DECIMAL"
    r = drift[("Users", "email", "is_nullable_changed")]
    assert r.before == "true" and r.after == "false"
    # nothing else drifted
    assert len(drift) == 4


def test_null_attribute_transitions_are_detected(spark):
    """NULL→value and value→NULL on a tracked attribute must register
    (eqNullSafe, not =): e.g. is_unique reflected as NULL becoming
    an explicit False."""
    old = fixtures.columns_meta(spark)
    target = (F.col("table_name") == "Users") & (F.col("column_name") == "username")
    new = old.withColumn(
        "is_unique",
        F.when(target, F.lit(False)).otherwise(F.col("is_unique")),
    )
    # fixture has is_unique NULL for username (reflection quirk)
    assert old.filter(target & F.col("is_unique").isNull()).count() == 1
    rows = schema_drift(old, new).collect()
    assert len(rows) == 1
    assert rows[0].change == "is_unique_changed"
    assert rows[0].before is None and rows[0].after == "false"


def test_same_table_name_in_two_databases_does_not_cross_match(spark):
    """Snapshots spanning two databases that share a table name must
    diff per-database: ecommerce_db.Users and quirks-side Users
    look-alikes must never join to each other."""
    cols = fixtures.columns_meta(spark)
    other = cols.withColumn("database", F.lit("archive_db")).withColumn(
        "data_type", F.lit("TEXT")
    )
    old = cols.unionByName(other)
    # change one attribute in ONE database only
    new = old.withColumn(
        "is_nullable",
        F.when(
            (F.col("database") == "ecommerce_db")
            & (F.col("table_name") == "Users")
            & (F.col("column_name") == "email"),
            F.lit(False),
        ).otherwise(F.col("is_nullable")),
    )
    rows = schema_drift(old, new).collect()
    assert len(rows) == 1
    assert (rows[0].database, rows[0].table_name, rows[0].column_name, rows[0].change) == (
        "ecommerce_db", "Users", "email", "is_nullable_changed"
    )
