"""Property-based tests (hypothesis) for the round-6 session-2
statistical kernels: random tiny order tables exercise tie patterns,
single-order customers, same-day clusters, and negative trends that
the shipped testdata draws only one sample of. Each property compares
the Spark operator against an independent pure-Python reference (and,
for Kaplan-Meier, against the DuckDB oracle as well)."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from conftest import assert_matches_oracle  # noqa: E402
from test_inference_ops import _km_reference, _midranks_x2  # noqa: E402

# (custkey 1-4, day-offset 0-30, price-cents 100-99999)
_ORDERS = st.lists(
    st.tuples(
        st.integers(1, 4), st.integers(0, 30), st.integers(100, 99_999)
    ),
    min_size=1,
    max_size=25,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BASE_DAY = 9131  # 1995-01-01 in epoch days


def _write_orders(d, rows):
    con = duckdb.connect()
    values = ", ".join(
        f"({i + 1}, {ck}, 'O', {cents / 100.0!r},"
        f" TIMESTAMP '1995-01-01' + INTERVAL {day} DAY, '1-URGENT')"
        for i, (ck, day, cents) in enumerate(rows)
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


@given(rows=_ORDERS)
@settings(**_SETTINGS)
def test_kaplan_meier_property(spark, tmp_path_factory, rows):
    d = tmp_path_factory.mktemp("kmprop")
    _write_orders(d, rows)
    cust = defaultdict(list)
    for ck, day, _ in rows:
        cust[ck].append(_BASE_DAY + day)
    gmax = max(day for days in cust.values() for day in days)
    exp = _km_reference(cust, gmax)

    from rdbms_metadata_manager_spark.queries.inference import (
        _KM_SQL,
        kaplan_meier_repurchase,
    )

    df = kaplan_meier_repurchase(spark, str(d))
    assert_matches_oracle(df, _KM_SQL, str(d))
    got = df.collect()
    assert len(got) == len(exp)
    for r, (dur, n_risk, dd, c, surv) in zip(got, exp):
        assert (r.dur_days, r.n_risk, r.d_events, r.c_censored) == (
            dur,
            n_risk,
            dd,
            c,
        )
        assert abs(r.surv - surv) < 1e-12


@given(rows=_ORDERS)
@settings(**_SETTINGS)
def test_spearman_property(spark, tmp_path_factory, rows):
    d = tmp_path_factory.mktemp("spprop")
    _write_orders(d, rows)
    daily = defaultdict(lambda: [0, 0])
    for _, day, cents in rows:
        daily[day][0] += 1
        daily[day][1] += cents
    xs = [v[0] for v in daily.values()]
    ys = [v[1] for v in daily.values()]
    rxm, rym = _midranks_x2(xs), _midranks_x2(ys)
    rx, ry = [rxm[x] for x in xs], [rym[y] for y in ys]
    n = len(daily)
    sx, sy = sum(rx), sum(ry)
    cov = n * sum(a * b for a, b in zip(rx, ry)) - sx * sy
    vx = n * sum(a * a for a in rx) - sx * sx
    vy = n * sum(b * b for b in ry) - sy * sy

    from rdbms_metadata_manager_spark.queries.inference import spearman_daily_rho

    row = spearman_daily_rho(spark, str(d)).collect()[0]
    assert (row.n_days, row.cov_num, row.varx_num, row.vary_num) == (
        n,
        cov,
        vx,
        vy,
    )
    if n < 2 or vx == 0 or vy == 0:
        assert row.rho is None
    else:
        import math

        assert abs(row.rho - cov / math.sqrt(vx * vy)) < 1e-12


def _trunc_div(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


@given(rows=_ORDERS)
@settings(**_SETTINGS)
def test_theil_sen_property(spark, tmp_path_factory, rows):
    d = tmp_path_factory.mktemp("tsprop")
    _write_orders(d, rows)
    daily = defaultdict(int)
    for _, day, cents in rows:
        daily[day] += cents
    pts = sorted((_BASE_DAY + day, r) for day, r in daily.items())
    slopes = sorted(
        _trunc_div(1_000_000 * (r2 - r1), d2 - d1)
        for i, (d1, r1) in enumerate(pts)
        for d2, r2 in pts[i + 1 :]
    )

    from rdbms_metadata_manager_spark.queries.inference import theil_sen_daily_trend

    got = theil_sen_daily_trend(spark, str(d)).collect()
    if not slopes:
        # single day: no pairs -> the median-filter relation is empty
        assert got == [] or got[0].n_pairs in (0, None)
        return
    med = slopes[-(-len(slopes) // 2) - 1]
    ics = sorted(1_000_000 * r - med * day for day, r in pts)
    ic = ics[-(-len(ics) // 2) - 1]
    row = got[0]
    assert (row.n_days, row.n_pairs) == (len(pts), len(slopes))
    assert row.slope_microcents_per_day == med
    assert row.intercept_microcents == ic


def test_theil_sen_single_day_parity_fixture(spark, tmp_path):
    """A single-day corpus has zero pairwise slopes: both engines
    must still emit ONE report row (n_pairs=0, NULL slope and
    intercept) — the parity gap the property sweep found."""
    d = tmp_path / "ts1"
    d.mkdir()
    _write_orders(d, [(1, 5, 12345), (2, 5, 999)])
    from rdbms_metadata_manager_spark.queries.inference import (
        _THEIL_SEN_SQL,
        theil_sen_daily_trend,
    )

    df = theil_sen_daily_trend(spark, str(d))
    assert_matches_oracle(df, _THEIL_SEN_SQL, str(d))
    row = df.collect()[0]
    assert (row.n_days, row.n_pairs) == (1, 0)
    assert row.slope_microcents_per_day is None
    assert row.intercept_microcents is None
