"""Adversarial fixtures for the late round-6 session-2 statistics:
degenerate regimes (constant series, perfect alternation, monopoly
markets, disjoint capture occasions, perfect covariate correlation)
that the shipped testdata cannot produce — each checked cross-engine
via the oracle AND against the closed-form answer."""

from __future__ import annotations

import duckdb

from conftest import assert_matches_oracle


def _orders(d, rows):
    """rows: (orderkey, custkey, price_float, date_sql)"""
    con = duckdb.connect()
    values = ", ".join(
        f"({ok}, {ck}, 'O', {p!r}, TIMESTAMP '{dt}', '1-URGENT')"
        for ok, ck, p, dt in rows
    )
    con.execute(
        f"""
        COPY (SELECT * FROM (VALUES {values})
              AS t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate, o_orderpriority))
        TO '{d}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.close()


def test_mann_kendall_monotone_and_constant_fixtures(spark, tmp_path):
    from rdbms_metadata_manager_spark.queries.inference import (
        _MANN_KENDALL_SQL,
        mann_kendall_trend_test,
    )

    # strictly increasing daily revenue: S = n(n-1)/2, no ties
    d1 = tmp_path / "inc"
    d1.mkdir()
    _orders(
        d1,
        [(i, i, 100.0 + i, f"1995-01-{i:02d}") for i in range(1, 11)],
    )
    df = mann_kendall_trend_test(spark, str(d1))
    assert_matches_oracle(df, _MANN_KENDALL_SQL, str(d1))
    r = df.collect()[0]
    assert (r.n_days, r.s_stat) == (10, 45)
    assert r.var_s_x18 == 10 * 9 * 25
    assert r.z_stat > 3.0

    # constant revenue: S = 0 AND every value tied -> var 0 -> z NULL
    d2 = tmp_path / "const"
    d2.mkdir()
    _orders(d2, [(i, i, 100.0, f"1995-01-{i:02d}") for i in range(1, 11)])
    df2 = mann_kendall_trend_test(spark, str(d2))
    assert_matches_oracle(df2, _MANN_KENDALL_SQL, str(d2))
    r2 = df2.collect()[0]
    assert r2.s_stat == 0
    assert r2.var_s_x18 == 0
    assert r2.z_stat is None


def test_runs_test_alternating_fixture(spark, tmp_path):
    """Perfect high/low alternation maximizes the run count: R = n
    exactly, z << 0 (over-mixing). Also pins the equal-to-median
    exclusion: with an odd count the median day drops out."""
    from rdbms_metadata_manager_spark.queries.inference import (
        _RUNS_SQL,
        wald_wolfowitz_runs_test,
    )

    d = tmp_path / "alt"
    d.mkdir()
    # alternating low/high with ALL-DISTINCT values so the median
    # (percentile_disc rank 4 of 8 = 40) excludes exactly one day:
    # 10,200,20,210,30,220,[40],230 -> signs 0 1 0 1 0 1 1
    vals = [10.0, 200.0, 20.0, 210.0, 30.0, 220.0, 40.0, 230.0]
    _orders(
        d, [(i, i, v, f"1995-02-{i:02d}") for i, v in enumerate(vals, start=1)]
    )
    df = wald_wolfowitz_runs_test(spark, str(d))
    assert_matches_oracle(df, _RUNS_SQL, str(d))
    r = df.collect()[0]
    assert (r.n_used, r.n_above, r.n_below) == (7, 4, 3)
    assert r.n_runs == 6
    e = 2.0 * 4 * 3 / 7 + 1.0
    assert abs(r.expected_runs - e) < 1e-12
    assert r.z_stat > 0  # more runs than expected: over-mixing


def test_runs_test_two_day_degenerate_is_null(spark, tmp_path):
    """ADVICE r6 #3: n_used = 2 with one day on each side of the
    median gives expected_runs = 2 and a ZERO variance term — the
    z-stat must be NULL (guarded), not a 0/0 NaN whose cross-engine
    hash match was accidental."""
    from rdbms_metadata_manager_spark.queries.inference import (
        _RUNS_SQL,
        wald_wolfowitz_runs_test,
    )

    d = tmp_path / "deg"
    d.mkdir()
    # 3 days: median day (20) is excluded -> n_used = 2, one above,
    # one below, expected_runs = 2*1*1/2 + 1 = 2
    _orders(
        d,
        [(1, 1, 10.0, "1995-03-01"), (2, 2, 20.0, "1995-03-02"),
         (3, 3, 30.0, "1995-03-03")],
    )
    df = wald_wolfowitz_runs_test(spark, str(d))
    assert_matches_oracle(df, _RUNS_SQL, str(d))
    r = df.collect()[0]
    assert (r.n_used, r.n_above, r.n_below) == (2, 1, 1)
    assert abs(r.expected_runs - 2.0) < 1e-12
    assert r.z_stat is None


def test_capture_recapture_disjoint_halves_fixture(spark, tmp_path):
    """Zero overlap between occasions: Chapman degrades to
    (n1+1)(n2+1) - 1 — a wild overestimate the audit must REPORT,
    not hide."""
    import shutil

    con = duckdb.connect()
    d = tmp_path / "cap"
    d.mkdir()
    con.execute(
        f"""
        COPY (SELECT i AS event_id,
                     TIMESTAMP '1995-01-01' + INTERVAL (CASE WHEN i <= 5
                       THEN 0 ELSE 20 END) DAY AS ts,
                     i AS user_id, 'click' AS event_type,
                     1.0 AS value, '{{}}' AS props
              FROM range(1, 11) t(i))
        TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    from rdbms_metadata_manager_spark.queries.inference import (
        _CAPTURE_SQL,
        capture_recapture_users,
    )

    df = capture_recapture_users(spark, str(d))
    assert_matches_oracle(df, _CAPTURE_SQL, str(d))
    r = df.collect()[0]
    assert (r.n_true, r.n1, r.n2, r.m_both) == (10, 5, 5, 0)
    assert r.chapman_estimate == 6 * 6 - 1
    assert r.est_err_pm == (1000 * (35 - 10)) // 10


def test_hhi_monopoly_region_fixture(spark, tmp_path):
    """A single-supplier region is by definition HHI = 10^8 and
    top-1 share = 10000 bp, exactly."""
    con = duckdb.connect()
    d = tmp_path / "hhi"
    d.mkdir()
    con.execute(
        f"""
        COPY (SELECT * FROM (VALUES (0, 'MONO', 0, 'x')) AS t(r_regionkey,
              r_name, _x, r_comment))
        TO '{d}/region.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT * FROM (VALUES (0, 'N0', 0)) AS t(n_nationkey, n_name,
              n_regionkey))
        TO '{d}/nation.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT * FROM (VALUES (1, 'S1', 0, 10.0)) AS t(s_suppkey,
              s_name, s_nationkey, s_acctbal))
        TO '{d}/supplier.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT i AS l_orderkey, i AS l_partkey, 1 AS l_suppkey,
                     1 AS l_linenumber, 1.0 AS l_quantity,
                     100.0 + i AS l_extendedprice, 0.0 AS l_discount,
                     0.0 AS l_tax, 'N' AS l_returnflag, 'O' AS l_linestatus,
                     TIMESTAMP '1995-01-01' AS l_shipdate
              FROM range(1, 6) t(i))
        TO '{d}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    from rdbms_metadata_manager_spark.queries.inference import (
        _HHI_SQL,
        hhi_market_concentration,
    )

    df = hhi_market_concentration(spark, str(d))
    assert_matches_oracle(df, _HHI_SQL, str(d))
    r = df.collect()[0]
    assert r.n_suppliers == 1
    assert r.hhi_e8 == 10**8
    assert r.top1_share_bp == 10000
