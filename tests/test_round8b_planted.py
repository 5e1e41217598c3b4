"""Planted-effect validation for the round-8 second-session
statistics: oracle parity proves the two engines agree; these prove
the statistics MEASURE what they claim. Every scenario is a tiny
deterministic synthetic corpus with a known signal (or a known null),
and the assertion is directional with wide margins pre-computed
offline (prototype run recorded in the test docstrings)."""

from __future__ import annotations

import datetime
import hashlib
import math

import pytest

BASE_DAY = 19000  # epoch day well past 1970 (engine-neutral)


def _ts(day: int, i: int = 0) -> datetime.datetime:
    return datetime.datetime.utcfromtimestamp(day * 86400 + i)


def _write_events(spark, d: str, rows):
    """rows: list of (day, user_id, event_type, value_dollars)."""
    data = [
        (j, _ts(day, j % 80000), uid, et, float(v), "{}")
        for j, (day, uid, et, v) in enumerate(rows)
    ]
    spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).write.parquet(f"{d}/events.parquet")


def _write_orders(spark, d: str, rows):
    """rows: list of (orderkey, status, totalprice, date, priority)."""
    data = [(ok, 1, st, float(tp), dt, pr) for ok, st, tp, dt, pr in rows]
    spark.createDataFrame(
        data, "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).write.parquet(f"{d}/orders.parquet")


def _arm(uid: int) -> int:
    return int(hashlib.md5(f"cuped:{uid}".encode()).hexdigest()[:8], 16) % 2


PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def test_planted_jonckheere_detects_monotone_trend(spark, tmp_path):
    """Price strictly increases with priority group: every cross-group
    pair is concordant, so JT sits at its maximum and z is huge."""
    from rdbms_metadata_manager_spark.queries.nonparam import (
        jonckheere_terpstra_priority,
    )

    d = str(tmp_path)
    rows = []
    for g in range(1, 6):
        for i in range(40):
            rows.append((g * 1000 + i, "O", g * 100 + (i % 7) / 100.0,
                         _ts(BASE_DAY + i), PRIOS[g - 1]))
    _write_orders(spark, d, rows)
    got = jonckheere_terpstra_priority(spark, d).collect()[0]
    assert got["n_orders"] == 200
    assert got["jt_z"] > 5
    assert got["jt_milli_per_pair"] > got["mean_milli_per_pair"] + 300


def test_planted_cochran_armitage_detects_rate_trend(spark, tmp_path):
    """'F' rate climbs 0.1 -> 0.9 across the ordered groups."""
    from rdbms_metadata_manager_spark.queries.nonparam import cochran_armitage_trend

    d = str(tmp_path)
    rows = []
    for g in range(1, 6):
        n_f = 10 * (g - 1) + 5
        for i in range(50):
            rows.append((g * 1000 + i, "F" if i < n_f else "O", 10.0,
                         _ts(BASE_DAY + i), PRIOS[g - 1]))
    _write_orders(spark, d, rows)
    got = cochran_armitage_trend(spark, d).collect()[0]
    assert got["ca_z"] > 5


def test_planted_mood_detects_shifted_group(spark, tmp_path):
    """Groups 1-4 all below the grand median, group 5 entirely above:
    near-perfect association, chi-square ~ n."""
    from rdbms_metadata_manager_spark.queries.nonparam import mood_median_test

    d = str(tmp_path)
    rows = []
    for g in range(1, 6):
        price = 100.0 if g == 5 else 10.0
        for i in range(40):
            rows.append((g * 1000 + i, "O", price, _ts(BASE_DAY + i), PRIOS[g - 1]))
    _write_orders(spark, d, rows)
    got = mood_median_test(spark, d).collect()[0]
    assert got["grand_median_cents"] == 1000
    assert got["chi2_micro"] > 150_000_000  # chi2 = 200 in real units


def test_planted_friedman_perfect_consistency_and_all_tied_null(spark, tmp_path):
    """Types keep the exact same daily ordering (counts 10 < 20 < 30
    every day): tie-free Friedman is exactly 2n, per-mille 2000n.
    The all-tied grid (equal counts) zeroes the denominator -> NULL."""
    from rdbms_metadata_manager_spark.queries.nonparam import (
        friedman_daily_event_types,
    )

    d1 = str(tmp_path / "signal")
    rows = []
    for day in range(10):
        for et, cnt in (("A", 10), ("B", 20), ("C", 30)):
            for i in range(cnt):
                rows.append((BASE_DAY + day, i, et, 0.0))
    _write_events(spark, d1, rows)
    got = friedman_daily_event_types(spark, d1).collect()[0]
    assert (got["n_days"], got["k_types"], got["df"]) == (10, 3, 2)
    assert got["chi2_pm"] == 2000 * 10

    d2 = str(tmp_path / "tied")
    rows = [
        (BASE_DAY + day, i, et, 0.0)
        for day in range(10)
        for et in ("A", "B", "C")
        for i in range(5)
    ]
    _write_events(spark, d2, rows)
    assert friedman_daily_event_types(spark, d2).collect()[0]["chi2_pm"] is None


def test_planted_hodges_lehmann_exact_shift(spark, tmp_path):
    """Weekend daily revenue exactly $10 above weekdays: every pair
    difference is 1000 cents, so HL is exactly 1000."""
    from rdbms_metadata_manager_spark.queries.nonparam import hodges_lehmann_shift

    d = str(tmp_path)
    rows = []
    for day in range(BASE_DAY, BASE_DAY + 28):
        weekend = (day + 3) % 7 >= 5
        rows.append((day, 1, "x", 110.0 if weekend else 100.0))
    _write_events(spark, d, rows)
    got = hodges_lehmann_shift(spark, d).collect()[0]
    assert got["n_weekend_days"] == 8
    assert got["n_weekday_days"] == 20
    assert got["hl_shift_cents"] == 1000


def test_planted_welch_and_ansari_read_the_arms(spark, tmp_path):
    """Arm 1 users get +$100 mean (Welch t > 5) in one corpus; in a
    second corpus arm 1 holds the extremes of the pooled range while
    arm 0 sits in the middle (Ansari-Bradley z < -3: extremes score
    LOW when ranking from both ends). Arms computed with the same md5
    as the engine - nothing assumed."""
    from rdbms_metadata_manager_spark.queries.nonparam import (
        ansari_bradley_dispersion,
        welch_t_ab,
    )

    users = list(range(1, 201))
    d1 = str(tmp_path / "mean_shift")
    rows = [
        (BASE_DAY, u, "x", (200.0 if _arm(u) else 100.0) + (u % 5))
        for u in users
    ]
    _write_events(spark, d1, rows)
    got = welch_t_ab(spark, d1).collect()[0]
    assert got["n_ctrl"] + got["n_treat"] == 200
    assert got["t_stat"] > 5
    assert got["mean_diff_milli"] > 90_000  # >= ~$90 in milli-cents

    d2 = str(tmp_path / "dispersion")
    rows = [
        (
            BASE_DAY,
            u,
            "x",
            ((1.0 if u % 2 else 399.0) if _arm(u) else (195.0 if u % 2 else 205.0)),
        )
        for u in users
    ]
    _write_events(spark, d2, rows)
    got = ansari_bradley_dispersion(spark, d2).collect()[0]
    assert got["ab_z"] < -3


def test_planted_durbin_watson_reads_serial_correlation(spark, tmp_path):
    """Smooth sine-wave counts -> positively correlated residuals,
    DW near 0 (prototype: 0.05); alternating counts -> negatively
    correlated residuals, DW near 4 (prototype: 3.94)."""
    from rdbms_metadata_manager_spark.queries.nonparam import durbin_watson_daily

    d1 = str(tmp_path / "sine")
    rows = []
    for t in range(60):
        cnt = 100 + round(50 * math.sin(2 * math.pi * t / 30))
        rows.extend((BASE_DAY + t, i, "x", 0.0) for i in range(cnt))
    _write_events(spark, d1, rows)
    assert durbin_watson_daily(spark, d1).collect()[0]["dw_stat"] < 0.5

    d2 = str(tmp_path / "alt")
    rows = []
    for t in range(60):
        cnt = 100 if t % 2 == 0 else 50
        rows.extend((BASE_DAY + t, i, "x", 0.0) for i in range(cnt))
    _write_events(spark, d2, rows)
    assert durbin_watson_daily(spark, d2).collect()[0]["dw_stat"] > 3.0


def test_planted_kpss_reads_level_shift(spark, tmp_path):
    """A mid-series level shift (50 -> 200 events/day) wanders far
    from any constant level (prototype eta 5.00); an alternating
    50/51 series is stationary (prototype eta 0.008)."""
    from rdbms_metadata_manager_spark.queries.nonparam import kpss_level_daily

    d1 = str(tmp_path / "shift")
    rows = []
    for t in range(60):
        cnt = 50 if t < 30 else 200
        rows.extend((BASE_DAY + t, i, "x", 0.0) for i in range(cnt))
    _write_events(spark, d1, rows)
    assert kpss_level_daily(spark, d1).collect()[0]["kpss_micro"] > 1_000_000

    d2 = str(tmp_path / "stat")
    rows = []
    for t in range(60):
        cnt = 50 if t % 2 else 51
        rows.extend((BASE_DAY + t, i, "x", 0.0) for i in range(cnt))
    _write_events(spark, d2, rows)
    assert kpss_level_daily(spark, d2).collect()[0]["kpss_micro"] < 100_000


def test_planted_granger_value_drives_next_day_volume(spark, tmp_path):
    """Tomorrow's event count is (value_cents // 100) + small noise:
    the lagged value explains volume almost perfectly beyond volume's
    own lag (prototype F ~ 3e4)."""
    from rdbms_metadata_manager_spark.queries.nonparam import (
        granger_value_leads_volume,
    )

    d = str(tmp_path)
    vals = [1000 + 500 * ((t * 37) % 11) for t in range(100)]
    counts = [50] + [vals[t] // 100 + (t % 3) for t in range(99)]
    rows = []
    for t in range(100):
        rows.append((BASE_DAY + t, 0, "x", vals[t] / 100.0))
        rows.extend((BASE_DAY + t, i, "x", 0.0) for i in range(1, counts[t]))
    _write_events(spark, d, rows)
    got = granger_value_leads_volume(spark, d).collect()[0]
    assert got["n_days_used"] == 99
    assert got["f_granger"] > 100


def test_planted_seasonal_mk_all_concordant(spark, tmp_path):
    """Within every month stratum revenue strictly increases along
    the calendar: S hits its maximum 3 * C(15,2) = 315."""
    from rdbms_metadata_manager_spark.queries.nonparam import seasonal_mann_kendall

    d = str(tmp_path)
    rows = []
    ok = 0
    for yi, year in enumerate((1995, 1996, 1997)):
        for m in (1, 2, 3):
            for day in range(1, 6):
                ok += 1
                cents = 100000 * yi + 1000 * m + day
                rows.append(
                    (ok, "O", cents / 100.0,
                     datetime.datetime(year, m, day), PRIOS[0])
                )
    _write_orders(spark, d, rows)
    got = seasonal_mann_kendall(spark, d).collect()[0]
    assert (got["n_days"], got["n_seasons"]) == (45, 3)
    assert got["s_stat"] == 3 * (15 * 14 // 2)
    assert got["z_stat"] > 3


def test_planted_partial_corr_strips_shared_trend(spark, tmp_path):
    """Volume and value both ride a linear day trend with independent
    wiggles: raw r_xy ~ 0.999 but the day-partialled correlation
    collapses (prototype -0.06)."""
    from rdbms_metadata_manager_spark.queries.nonparam import (
        partial_corr_volume_value,
    )

    d = str(tmp_path)
    rows = []
    for t in range(60):
        cnt = 5 * t + ((t * 37) % 11) + 1
        cents = 1000 * t + ((t * 53) % 13)
        rows.append((BASE_DAY + t, 0, "x", cents / 100.0))
        rows.extend((BASE_DAY + t, i, "x", 0.0) for i in range(1, cnt))
    _write_events(spark, d, rows)
    got = partial_corr_volume_value(spark, d).collect()[0]
    assert got["r_xy"] > 0.95
    assert abs(got["partial_r_xy_given_day"]) < 0.3
