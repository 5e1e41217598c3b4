"""Adversarial-fixture tests for the round-6 operators' subtle
semantics — edge shapes the shipped testdata cannot reliably produce:
an interval ENDING at the exact instant another starts (the
end-exclusive tie rule), heavy midrank ties in the rank-sum test, and
even/odd/duplicate-valued groups in the lower-median selection. Each
fixture is written as parquet and checked BOTH against the pure
expectation and through the DuckDB oracle hash gate."""

from __future__ import annotations

import duckdb
import pytest

from conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("r6_edges"))
    con = duckdb.connect()
    # events: user 1 has one event at t0 (session = [t0, t0+15min));
    # user 2's single event lands EXACTLY at t0+15min — its session
    # starts at the same microsecond user 1's ends. End-exclusive
    # sweep order (-1 before +1) must keep the peak at 1.
    # users 3 and 4 overlap for real -> peak 2 later in the day.
    con.execute(
        f"""
        COPY (
          SELECT * FROM (VALUES
            (0, TIMESTAMP '2024-01-01 00:00:00', 1, 'click', 1.0, '{{}}'),
            (1, TIMESTAMP '2024-01-01 00:15:00', 2, 'click', 2.0, '{{}}'),
            (2, TIMESTAMP '2024-01-01 02:00:00', 3, 'view',  4.0, '{{}}'),
            (3, TIMESTAMP '2024-01-01 02:05:00', 4, 'view',  8.0, '{{}}'),
            -- tie-heavy metric values for the rank-sum test: users
            -- 5..10 all sum to the same 16.0
            (4, TIMESTAMP '2024-01-01 03:00:00', 5, 'click', 16.0, '{{}}'),
            (5, TIMESTAMP '2024-01-01 03:00:01', 6, 'click', 16.0, '{{}}'),
            (6, TIMESTAMP '2024-01-01 03:00:02', 7, 'click', 16.0, '{{}}'),
            (7, TIMESTAMP '2024-01-01 03:00:03', 8, 'click', 16.0, '{{}}'),
            (8, TIMESTAMP '2024-01-01 03:00:04', 9, 'click', 16.0, '{{}}'),
            (9, TIMESTAMP '2024-01-01 03:00:05', 10, 'click', 16.0, '{{}}')
          ) AS t(event_id, ts, user_id, event_type, value, props)
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    # orders: group 'A' has an EVEN count with duplicate ticks
    # (lower median must pick rank ceil(n/2)); group 'B' is odd.
    con.execute(
        f"""
        COPY (
          SELECT * FROM (VALUES
            (1, 1, 'O', 10.00, TIMESTAMP '1995-01-01', 'A'),
            (2, 1, 'O', 10.00, TIMESTAMP '1995-01-05', 'A'),
            (3, 2, 'O', 30.00, TIMESTAMP '1995-01-09', 'A'),
            (4, 2, 'O', 50.00, TIMESTAMP '1995-02-01', 'A'),
            (5, 3, 'O',  7.00, TIMESTAMP '1995-01-01', 'B'),
            (6, 3, 'O',  9.00, TIMESTAMP '1995-03-01', 'B'),
            (7, 3, 'O', 11.00, TIMESTAMP '1995-03-11', 'B')
          ) AS t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                 o_orderdate, o_orderpriority)
        ) TO '{d}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return d


def test_concurrency_end_exclusive_boundary(spark, fixture_dir):
    from rdbms_metadata_manager_spark.streaming.events_batch import (
        _CONCURRENCY_SQL,
        max_concurrent_sessions,
    )

    r = max_concurrent_sessions(spark, fixture_dir).collect()[0]
    # 4 single-event sessions + 6 tie-block sessions = 10
    assert r.n_sessions == 10
    # users 1 and 2 do NOT overlap (end exclusive); users 5..10's
    # sessions all overlap within 5 seconds -> the true peak is 6
    assert r.peak_concurrent == 6
    assert_matches_oracle(
        max_concurrent_sessions(spark, fixture_dir), _CONCURRENCY_SQL, fixture_dir
    )


def test_mann_whitney_midranks_under_heavy_ties(spark, fixture_dir):
    from rdbms_metadata_manager_spark.llm.hashing import h32_sql
    from rdbms_metadata_manager_spark.queries.cohort import (
        _mw_oracle,
        mann_whitney_u_test,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT coalesce(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)), 0),
               {h32_sql("'mw:' || user_id::VARCHAR")} % 2
        FROM '{fixture_dir}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    con.close()
    vals = sorted(rows)
    n_a = sum(1 for _, a in rows if a == 0)
    r_a_x2 = 0
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j][0] == vals[i][0]:
            j += 1
        avgrank_x2 = 2 * i + (j - i) + 1
        r_a_x2 += avgrank_x2 * sum(1 for k in range(i, j) if vals[k][1] == 0)
        i = j
    got = mann_whitney_u_test(spark, fixture_dir).collect()[0]
    assert got.n_a == n_a
    assert got.u_a_x2 == r_a_x2 - n_a * (n_a + 1)
    # the fixture must actually exercise a midrank: the six 1600-tick
    # users form one tie block whose doubled midrank (2·4 + 6 + 1 =
    # 15) is ODD, i.e. a non-integral 7.5 average rank — the case a
    # plain row_number rank-sum gets wrong
    tie_sizes = {}
    for v, _ in vals:
        tie_sizes[v] = tie_sizes.get(v, 0) + 1
    assert max(tie_sizes.values()) == 6
    assert_matches_oracle(
        mann_whitney_u_test(spark, fixture_dir), _mw_oracle(), fixture_dir
    )


def test_grouped_mad_even_odd_duplicate_groups(spark, fixture_dir):
    from rdbms_metadata_manager_spark.queries.profiling import (
        _MAD_SQL,
        grouped_mad_two_pass,
    )

    got = {r.grp: r for r in grouped_mad_two_pass(spark, fixture_dir).collect()}
    # A: ticks [1000, 1000, 3000, 5000]; lower median = rank 2 = 1000;
    # deviations [0, 0, 2000, 4000] -> lower median = 0
    assert (got["A"].n_rows, got["A"].median_cents, got["A"].mad_cents) == (4, 1000, 0)
    # B: ticks [700, 900, 1100]; median = 900; deviations [200, 0, 200]
    # -> lower median = 200
    assert (got["B"].n_rows, got["B"].median_cents, got["B"].mad_cents) == (3, 900, 200)
    assert_matches_oracle(
        grouped_mad_two_pass(spark, fixture_dir), _MAD_SQL, fixture_dir
    )


def test_backlog_on_fixture_orders(spark, fixture_dir):
    """Orders without lineitem rows never close — the backlog query
    inner-joins the close relation, so a lineitem-less orders table
    yields an empty curve rather than a phantom backlog."""
    import shutil

    from rdbms_metadata_manager_spark.queries.tpch_extra import open_orders_backlog

    # fixture has no lineitem.parquet -> reading it must fail loudly,
    # not silently fabricate; give it an empty lineitem instead
    src = "/root/testdata/sf0.001/lineitem.parquet"
    spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(
        f"{fixture_dir}/lineitem.parquet"
    )
    assert open_orders_backlog(spark, fixture_dir).count() == 0
