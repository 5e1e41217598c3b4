"""Round-8 second-session operators: the nonparametric/trend batch
(queries/nonparam.py) and the forecast-calibration trio
(llm/calibration.py) — oracle parity for all ten, plus independent
pure-Python recomputations: brute-force Jonckheere–Terpstra over raw
pairs, tie-corrected Friedman from scratch, numpy-free Welch/DW/CA
algebra, exact-Fraction sequential PAVA vs the minimax formulation,
and a literal rank-walk average precision."""

from __future__ import annotations

import os
from fractions import Fraction

import duckdb
import pytest

from conftest import SF_DIR, assert_matches_oracle


def _con(sf_dir):
    con = duckdb.connect()
    for t in ["orders", "events", "documents"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


# ---------------------------------------------------------------------------
# oracle parity (the driver's gate) for all ten
# ---------------------------------------------------------------------------

_NONPARAM = [
    "friedman_daily_event_types",
    "jonckheere_terpstra_priority",
    "cochran_armitage_trend",
    "durbin_watson_daily",
    "welch_t_ab",
    "mood_median_test",
    "hodges_lehmann_shift",
]
_CALIB = [
    "brier_score_decomposition",
    "isotonic_calibration_pava",
    "average_precision_scorer",
]


@pytest.mark.parametrize("name", _NONPARAM)
def test_nonparam_matches_oracle(spark, sf_dir, name):
    from rdbms_metadata_manager_spark.queries import nonparam as N

    assert_matches_oracle(N.QUERIES[name](spark, sf_dir), N.ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", _CALIB)
def test_calibration_matches_oracle(spark, sf_dir, name):
    from rdbms_metadata_manager_spark.llm import calibration as C

    assert_matches_oracle(C.QUERIES[name](spark, sf_dir), C.ORACLES[name], sf_dir)


# ---------------------------------------------------------------------------
# jonckheere_terpstra_priority — brute force over raw pairs
# ---------------------------------------------------------------------------


def test_jt_brute_force(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.nonparam import (
        jonckheere_terpstra_priority,
    )

    con = _con(sf_dir)
    rows = con.execute(
        "SELECT CAST(substr(o_orderpriority,1,1) AS INT),"
        " CAST(floor(o_totalprice*100+0.5) AS BIGINT) FROM orders"
    ).fetchall()
    con.close()
    n = len(rows)
    # doubled JT: 2 per strictly-ordered concordant pair, 1 per
    # across-group value tie
    jt2 = 0
    for a in range(n):
        ga, va = rows[a]
        for b in range(n):
            gb, vb = rows[b]
            if ga < gb:
                if va < vb:
                    jt2 += 2
                elif va == vb:
                    jt2 += 1
    got = jonckheere_terpstra_priority(spark, sf_dir).collect()[0]
    assert got["n_orders"] == n
    assert got["jt_milli_per_pair"] == (1000 * jt2) // (n * (n - 1))
    # no-ties-free z sanity: mean2 per pair and z finite
    assert got["jt_z"] is not None


# ---------------------------------------------------------------------------
# friedman_daily_event_types — tie-corrected recompute from scratch
# ---------------------------------------------------------------------------


def test_friedman_recompute(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.nonparam import (
        friedman_daily_event_types,
    )

    con = _con(sf_dir)
    cells = con.execute(
        "SELECT epoch_us(ts)//1000000//86400 AS d, event_type, count(*)"
        " FROM events GROUP BY 1, 2"
    ).fetchall()
    con.close()
    days = sorted({r[0] for r in cells})
    types = sorted({r[1] for r in cells})
    cnt = {(d, t): 0 for d in days for t in types}
    for d, t, c in cells:
        cnt[(d, t)] = c
    k, n = len(types), len(days)
    r2sum = dict.fromkeys(types, 0)
    a4 = 0
    for d in days:
        vals = sorted(cnt[(d, t)] for t in types)
        for t in types:
            v = cnt[(d, t)]
            lt = sum(1 for x in vals if x < v)
            eq = sum(1 for x in vals if x == v)
            r2 = 2 * lt + eq + 1  # doubled midrank
            r2sum[t] += r2
            a4 += r2 * r2
    sum_r2sq = sum(v * v for v in r2sum.values())
    den = a4 - n * k * (k + 1) * (k + 1)
    want = (1000 * (k - 1) * (sum_r2sq - n * n * k * (k + 1) * (k + 1))) // den
    got = friedman_daily_event_types(spark, sf_dir).collect()[0]
    assert (got["n_days"], got["k_types"], got["df"]) == (n, k, k - 1)
    assert got["chi2_pm"] == want


# ---------------------------------------------------------------------------
# welch_t_ab / cochran_armitage_trend / durbin_watson_daily — algebra
# ---------------------------------------------------------------------------


def test_welch_recompute(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.nonparam import welch_t_ab

    con = _con(sf_dir)
    rows = con.execute(
        "SELECT ('0x' || substr(md5('cuped:' || user_id::VARCHAR), 1, 8))::BIGINT % 2,"
        " sum(CAST(floor(value*100+0.5) AS BIGINT))"
        " FROM events GROUP BY user_id"
    ).fetchall()
    con.close()
    arms = {0: [], 1: []}
    for a, c in rows:
        arms[a].append(c)
    n0, n1 = len(arms[0]), len(arms[1])
    m0, m1 = sum(arms[0]) / n0, sum(arms[1]) / n1
    v0 = sum((x - m0) ** 2 for x in arms[0]) / (n0 - 1)
    v1 = sum((x - m1) ** 2 for x in arms[1]) / (n1 - 1)
    se2 = v1 / n1 + v0 / n0
    t = (m1 - m0) / se2**0.5
    df = se2 * se2 / ((v1 / n1) ** 2 / (n1 - 1) + (v0 / n0) ** 2 / (n0 - 1))
    got = welch_t_ab(spark, sf_dir).collect()[0]
    assert (got["n_ctrl"], got["n_treat"]) == (n0, n1)
    assert got["t_stat"] == pytest.approx(t, rel=1e-9)
    assert got["df_welch"] == pytest.approx(df, rel=1e-9)


def test_cochran_armitage_recompute(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.nonparam import cochran_armitage_trend

    con = _con(sf_dir)
    rows = con.execute(
        "SELECT CAST(substr(o_orderpriority,1,1) AS INT),"
        " CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END FROM orders"
    ).fetchall()
    con.close()
    n = len(rows)
    rr = sum(r for _, r in rows)
    swr = sum(w * r for w, r in rows)
    swn = sum(w for w, _ in rows)
    sw2n = sum(w * w for w, _ in rows)
    num = n * swr - rr * swn
    den2 = rr * (n - rr) * (n * sw2n - swn * swn)
    z = num * n**0.5 / den2**0.5
    got = cochran_armitage_trend(spark, sf_dir).collect()[0]
    assert (got["n_orders"], got["n_finished"]) == (n, rr)
    assert got["finished_rate_pm"] == (1000 * rr) // n
    assert got["ca_z"] == pytest.approx(z, rel=1e-9)


def test_durbin_watson_recompute(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.nonparam import durbin_watson_daily

    con = _con(sf_dir)
    daily = con.execute(
        "SELECT epoch_us(ts)//1000000//86400 AS d, count(*) FROM events"
        " GROUP BY 1 ORDER BY 1"
    ).fetchall()
    con.close()
    n = len(daily)
    sx = sum(d for d, _ in daily)
    sy = sum(y for _, y in daily)
    sxx = sum(d * d for d, _ in daily)
    sxy = sum(d * y for d, y in daily)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    es = [y - a - b * d for d, y in daily]
    dw = sum((es[i] - es[i - 1]) ** 2 for i in range(1, n)) / sum(e * e for e in es)
    got = durbin_watson_daily(spark, sf_dir).collect()[0]
    assert got["n_days"] == n
    # micro-flooring perturbs each quadratic term by < 1e-6
    assert got["dw_stat"] == pytest.approx(dw, rel=1e-4)
    assert 0 < got["dw_stat"] < 4


# ---------------------------------------------------------------------------
# mood_median_test / hodges_lehmann_shift — exact selection checks
# ---------------------------------------------------------------------------


def test_mood_median_recompute(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.nonparam import mood_median_test

    con = _con(sf_dir)
    vals = [
        r[0]
        for r in con.execute(
            "SELECT CAST(floor(o_totalprice*100+0.5) AS BIGINT) FROM orders ORDER BY 1"
        ).fetchall()
    ]
    rows = con.execute(
        "SELECT CAST(substr(o_orderpriority,1,1) AS INT),"
        " CAST(floor(o_totalprice*100+0.5) AS BIGINT) FROM orders"
    ).fetchall()
    con.close()
    n = len(vals)
    med = vals[(n + 1) // 2 - 1]  # lower median
    got = mood_median_test(spark, sf_dir).collect()[0]
    assert got["n_orders"] == n
    assert got["grand_median_cents"] == med
    a = dict.fromkeys(range(1, 6), 0)
    t = dict.fromkeys(range(1, 6), 0)
    for g, v in rows:
        t[g] += 1
        if v > med:
            a[g] += 1
    atot = sum(a.values())
    import math

    chi2 = 0
    for g in range(1, 6):
        for o, coltot in ((a[g], atot), (t[g] - a[g], n - atot)):
            chi2 += math.floor(
                1000000 * float(o * n - t[g] * coltot) ** 2 / (n * t[g] * coltot)
            )
    assert got["chi2_micro"] == chi2


def test_hodges_lehmann_brute(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.nonparam import hodges_lehmann_shift

    con = _con(sf_dir)
    daily = con.execute(
        "SELECT epoch_us(ts)//1000000//86400 AS d,"
        " sum(CAST(floor(value*100+0.5) AS BIGINT)) FROM events GROUP BY 1"
    ).fetchall()
    con.close()
    we = [y for d, y in daily if (d + 3) % 7 >= 5]
    wd = [y for d, y in daily if (d + 3) % 7 < 5]
    diffs = sorted(a - b for a in we for b in wd)
    got = hodges_lehmann_shift(spark, sf_dir).collect()[0]
    assert got["n_weekend_days"] == len(we)
    assert got["n_weekday_days"] == len(wd)
    assert got["n_pairs"] == len(diffs)
    assert got["hl_shift_cents"] == diffs[(len(diffs) + 1) // 2 - 1]


# ---------------------------------------------------------------------------
# calibration trio — Fraction-exact PAVA, literal AP walk, Brier algebra
# ---------------------------------------------------------------------------


def _forecast_rows(sf_dir):
    """(p_pm, o) per doc, straight from the oracle's own CTE text so
    the Python recomputes below share the exact forecast definition."""
    from rdbms_metadata_manager_spark.llm.calibration import (
        _FORECAST_CTE,
        _DOC_FEATURES_CTES,
    )

    con = _con(sf_dir)
    rows = con.execute(
        f"WITH {_DOC_FEATURES_CTES}, {_FORECAST_CTE}"
        " SELECT doc_id, p_pm, o FROM fc ORDER BY doc_id"
    ).fetchall()
    con.close()
    return rows


def test_pava_equals_sequential_pava(spark, sf_dir):
    """The minimax max-min formulation (what the query computes, over
    FLOORED per-mille interval averages) must equal the classic
    sequential pool-adjacent-violators fit computed with exact
    Fractions and floored at the end — they coincide because floor is
    monotone and max/min commute with monotone maps."""
    from rdbms_metadata_manager_spark.llm.calibration import (
        BIN_W,
        isotonic_calibration_pava,
    )

    rows = _forecast_rows(sf_dir)
    bins: dict[int, list[int]] = {}
    for _, p, o in rows:
        b = p // BIN_W
        nk, kk = bins.get(b, (0, 0))
        bins[b] = (nk + 1, kk + o)
    order = sorted(bins)
    # classic PAVA with exact rational block means
    blocks = [
        [Fraction(1000 * bins[b][1], 1), Fraction(bins[b][0], 1), [b]]
        for b in order
    ]  # [weighted sum of 1000*rate, weight, members]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] / blocks[i][1] > blocks[i + 1][0] / blocks[i + 1][1]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            blocks[i][2] += blocks[i + 1][2]
            del blocks[i + 1]
            i = max(0, i - 1)
        else:
            i += 1
    want = {}
    for s, w, members in blocks:
        fitted = int(s / w)  # floor of the exact rational mean
        for b in members:
            want[b] = fitted
    got = {
        r["score_bin"]: r["iso_rate_pm"]
        for r in isotonic_calibration_pava(spark, sf_dir).collect()
    }
    assert got == want
    fitted_seq = [got[b] for b in sorted(got)]
    assert fitted_seq == sorted(fitted_seq), "isotonic fit must be monotone"


def test_average_precision_walk(spark, sf_dir):
    from rdbms_metadata_manager_spark.llm.calibration import (
        average_precision_scorer,
    )
    from rdbms_metadata_manager_spark.llm.curation import CLF_SCORE_SQL, RULE_KEEP_PRED
    from rdbms_metadata_manager_spark.llm.calibration import _DOC_FEATURES_CTES

    con = _con(sf_dir)
    rows = con.execute(
        f"WITH {_DOC_FEATURES_CTES}"
        f" SELECT doc_id, ({CLF_SCORE_SQL}) AS score,"
        f" CASE WHEN {RULE_KEEP_PRED} THEN 1 ELSE 0 END AS pos FROM scored"
        " ORDER BY score DESC, doc_id"
    ).fetchall()
    con.close()
    cum = 0
    ap_sum = 0
    p10 = p100 = None
    for k, (_, _, pos) in enumerate(rows, start=1):
        cum += pos
        if pos:
            ap_sum += (1000000 * cum) // k
        if k == 10:
            p10 = (1000 * cum) // 10
        if k == 100:
            p100 = (1000 * cum) // 100
    n_pos = cum
    got = average_precision_scorer(spark, sf_dir).collect()[0]
    assert got["n_docs"] == len(rows)
    assert got["n_pos"] == n_pos
    assert got["ap_micro"] == ap_sum // n_pos
    assert got["p_at_10_pm"] == p10
    assert got["p_at_100_pm"] == p100


def test_brier_decomposition_recompute(spark, sf_dir):
    from rdbms_metadata_manager_spark.llm.calibration import (
        BIN_W,
        brier_score_decomposition,
    )

    rows = _forecast_rows(sf_dir)
    n = len(rows)
    kk = sum(o for _, _, o in rows)
    bs = sum((p - 1000 * o) ** 2 for _, p, o in rows)
    bins: dict[int, list[int]] = {}
    for _, p, o in rows:
        b = p // BIN_W
        nk, k2, s = bins.get(b, (0, 0, 0))
        bins[b] = (nk + 1, k2 + o, s + p)
    rel = sum((s - 1000 * k2) ** 2 // nk for nk, k2, s in bins.values())
    res = sum((1000000 * k2 * k2) // nk for nk, k2, s in bins.values())
    got = brier_score_decomposition(spark, sf_dir).collect()[0]
    assert got["n_docs"] == n
    assert got["n_bins"] == len(bins)
    assert got["brier_micro"] == bs // n
    assert got["reliability_micro"] == rel // n
    assert got["resolution_micro"] == (res - (1000000 * kk * kk) // n) // n
    assert got["uncertainty_micro"] == (1000000 * kk * (n - kk)) // (n * n)
    # Murphy's identity holds for the BINNED forecaster up to the
    # within-bin variance and covariance terms, both bounded by the
    # bin width: WBV <= (BIN_W/1000)^2 and |2*cov| <= 2*(BIN_W/1000).
    lhs = got["brier_micro"]
    rhs = got["reliability_micro"] - got["resolution_micro"] + got["uncertainty_micro"]
    assert abs(lhs - rhs) <= 2 * 1000 * BIN_W + BIN_W * BIN_W + 10
