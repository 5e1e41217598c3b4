"""Round-5 regressions: ADVICE r4 items each get a fixture that the
shipped testdata cannot exercise (NULL FK keys, PII-lookalike column
names, wide changepoint sums), plus independent-reference tests for
the round's new operators."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from conftest import assert_matches_oracle


def test_constraint_mining_fk_support_with_null_child_keys(spark, sf_dir, tmp_path):
    """ADVICE r4 #1: on a corpus where the child FK column carries
    NULLs, the Spark legs and the DuckDB oracle must still agree —
    the old .distinct() counted NULL as a distinct key in n_rows and
    the support denominator while count(DISTINCT) excluded it."""
    import duckdb

    from rdbms_metadata_manager_spark.queries.quality import (
        _constraint_oracle,
        constraint_mining,
    )

    d = tmp_path / "nullfk"
    d.mkdir()
    for t in ("customer", "lineitem", "nation"):
        shutil.copyfile(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    # orders with o_custkey NULLed on every 7th row
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * REPLACE (
                CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END
                AS o_custkey)
              FROM '{sf_dir}/orders.parquet')
        TO '{d}/orders.parquet' (FORMAT PARQUET)
        """
    )
    n_null = con.execute(
        f"SELECT count(*) FROM '{d}/orders.parquet' WHERE o_custkey IS NULL"
    ).fetchone()[0]
    con.close()
    assert n_null > 0, "fixture must actually contain NULL child keys"
    assert_matches_oracle(
        constraint_mining(spark, str(d)), _constraint_oracle(), str(d)
    )


def test_pii_quasi_regex_is_word_anchored_cross_engine(spark):
    """ADVICE r4 #2: lookalike column names (message, image_url,
    page_views, storage_tier, adobe_id, zipper_sku) must classify as
    non-PII while the real quasi-identifiers still hit — and Spark
    rlike must agree with DuckDB regexp_matches name by name."""
    import duckdb

    from rdbms_metadata_manager_spark.queries.metadata import PII_QUASI_RX

    cases = {
        # lookalikes that the unanchored 'age'/'dob'/'zip' substrings used to flag
        "message": False,
        "image_url": False,
        "page_views": False,
        "storage_tier": False,
        "adobe_id": False,
        "zipper_sku": False,
        # real quasi-identifiers
        "age": True,
        "age_band": True,
        "user_age": True,
        "dob": True,
        "dob_year": True,
        "zip": True,
        "zip_code": True,
        "birth_date": True,
        "postal_code": True,
        "gender": True,
        "user_id": True,
    }
    df = spark.createDataFrame([(n,) for n in cases], "name string").select(
        "name", F.lower(F.col("name")).rlike(PII_QUASI_RX).alias("hit")
    )
    got = {r.name: r.hit for r in df.collect()}
    assert got == cases, got
    con = duckdb.connect()
    for name, want in cases.items():
        (duck,) = con.execute(
            f"SELECT regexp_matches(lower('{name}'), '{PII_QUASI_RX}')"
        ).fetchone()
        assert duck == want, (name, duck, want)
    con.close()


def test_cusum_is_exact_at_int64_overflow_magnitudes(spark):
    """ADVICE r4 #4: with daily totals around 2.5e16, the CUSUM
    numerator n_total·S_d − n_left·S overflows int64 if the products
    are carried narrow. The widened DECIMAL(38,0) arithmetic must
    match exact Python bignum integer math day by day."""
    from rdbms_metadata_manager_spark.queries.forecast import (
        CHANGEPOINT_MIN_SEG,
        CHANGEPOINT_TOP,
        _cusum_report,
    )

    # Base level ~2.5e16 makes every n·S product wrap int64, while the
    # modest step (+1e6) keeps the SCORE itself inside the BIGINT
    # output contract — the regime ADVICE r4 #4 describes.
    xs = [25_000_000_000_000_000 + d * 13 for d in range(20)]
    xs += [25_000_000_000_001_000_000 // 1000 + d * 7 for d in range(20)]
    series = spark.createDataFrame(
        [(d, x) for d, x in enumerate(xs)], "day_idx long, x long"
    )
    got = [tuple(r) for r in _cusum_report(series).collect()]

    n_total, s_total = len(xs), sum(xs)
    rows = []
    s_left = 0
    for d, x in enumerate(xs):
        s_left += x
        n_left = d + 1
        if CHANGEPOINT_MIN_SEG <= n_left <= n_total - CHANGEPOINT_MIN_SEG:
            num = n_total * s_left - n_left * s_total
            score = (num * num) // (n_total * n_left * (n_total - n_left))
            rows.append((d, n_left, n_total - n_left, score))
    # the differences are small but the PRODUCTS they are built from
    # wrap int64 on later days — exactly the narrow-arithmetic trap
    assert n_total * s_total > 2**63, "fixture must exceed int64 in the products"
    want = sorted(rows, key=lambda r: (-r[3], r[0]))[:CHANGEPOINT_TOP]
    assert got == want
    assert got[0][0] == 19  # argmax at the planted step boundary


def test_ranged_prefix_matches_global_window(spark):
    """The two-pass range kernel must reproduce the single-partition
    global window EXACTLY — rank and running sums — on a value-heavy
    distribution with ties (the order is made total by the id
    tiebreak), across bucket counts including more buckets than
    rows."""
    from pyspark.sql import Window

    from rdbms_metadata_manager_spark.queries.prefix import ranged_prefix

    rows = [(i, (i * 7919) % 13, (i * 104729) % 97) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long, w long")
    order = [F.desc("v"), F.col("id")]
    wref = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.id: (r.rank, r.cum_v, r.cum_w)
        for r in df.select(
            "id",
            F.row_number().over(wref).alias("rank"),
            F.sum("v").over(wref).alias("cum_v"),
            F.sum("w").over(wref).alias("cum_w"),
        ).collect()
    }
    for buckets in (1, 4, 32, 1000):
        got = {
            r.id: (r.rank, r.cum_v, r.cum_w)
            for r in ranged_prefix(
                df, order, sum_cols=["v", "w"], rank_col="rank", buckets=buckets
            ).collect()
        }
        assert got == want, f"buckets={buckets}"
