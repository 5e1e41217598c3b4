"""Round-7 statistics batch: independent pure-Python references and
adversarial fixtures (planted drift, perfect correlation, degenerate
groups) that the shipped word-soup/TPC-H testdata cannot exercise —
each also checked cross-engine via its DuckDB oracle."""

from __future__ import annotations

import hashlib
import math

import duckdb

from conftest import assert_matches_oracle


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _events(d, rows):
    """rows: (event_id, user_id, ts_sql, value)"""
    con = duckdb.connect()
    values = ", ".join(
        f"({eid}, TIMESTAMP '{ts}', {uid}, 'click', {v!r}, '{{}}')"
        for eid, uid, ts, v in rows
    )
    con.execute(
        f"""
        COPY (SELECT * FROM (VALUES {values})
              AS t(event_id, ts, user_id, event_type, value, props))
        TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()


def _orders(d, rows):
    """rows: (orderkey, custkey, price_float, date_sql, priority)"""
    con = duckdb.connect()
    values = ", ".join(
        f"({ok}, {ck}, 'O', {p!r}, TIMESTAMP '{dt}', '{prio}')"
        for ok, ck, p, dt, prio in rows
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


def test_permutation_test_matches_pure_python(spark, sf_dir):
    """Full pure-Python replication of the md5 permutation machinery
    on the shipped corpus: per-user sums from DuckDB, the 199
    relabelings + the observed 'cuped:' arms re-derived with hashlib,
    extremeness decided with exact int cross-multiplication."""
    from rdbms_metadata_manager_spark.queries.stats import (
        PERM_COUNT,
        permutation_test_ab,
    )

    con = duckdb.connect()
    per_user = con.execute(
        f"""SELECT user_id,
                   sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT
            FROM '{sf_dir}/events.parquet' GROUP BY user_id"""
    ).fetchall()
    con.close()

    def stats(arm_of):
        n_a = s_a = n_b = s_b = 0
        for uid, cents in per_user:
            if arm_of(uid) == 0:
                n_a += 1
                s_a += cents
            else:
                n_b += 1
                s_b += cents
        return n_a, s_a, n_b, s_b

    def d_scale(st):
        n_a, s_a, n_b, s_b = st
        return abs(s_a * n_b - s_b * n_a), n_a * n_b

    d0, scale0 = d_scale(stats(lambda u: _h32(f"cuped:{u}") % 2))
    n_extreme = 0
    for p in range(1, PERM_COUNT + 1):
        dp, sp = d_scale(stats(lambda u, p=p: _h32(f"perm:{p}:{u}") % 2))
        if sp == 0 or dp * scale0 >= d0 * sp:
            n_extreme += 1
    row = permutation_test_ab(spark, sf_dir).collect()[0]
    assert row.n_users == len(per_user)
    assert row.n_perms == PERM_COUNT
    assert row.n_extreme == n_extreme
    assert row.p_value_permille == (1000 * (1 + n_extreme)) // (PERM_COUNT + 1)


def test_bootstrap_ci_matches_pure_python(spark, sf_dir):
    """The 256 replicate means re-derived in Python (exact integer
    micro-cents), the CI bounds re-picked with the percentile_disc
    rank convention ceil(q*n)."""
    from rdbms_metadata_manager_spark.queries.stats import (
        BOOT_REPS,
        BOOT_WMAX,
        bayesian_bootstrap_revenue_ci,
    )

    con = duckdb.connect()
    daily = con.execute(
        f"""SELECT epoch_us(o_orderdate) // 1000000 // 86400,
                   sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT
            FROM '{sf_dir}/orders.parquet' GROUP BY 1"""
    ).fetchall()
    con.close()
    means = []
    for b in range(BOOT_REPS):
        sw = swr = 0
        for d, r in daily:
            w = 1 + _h32(f"boot:{b}:{d}") % BOOT_WMAX
            sw += w
            swr += w * r
        means.append((1_000_000 * swr) // sw)
    means.sort()
    lo = means[math.ceil(0.025 * BOOT_REPS) - 1]
    hi = means[math.ceil(0.975 * BOOT_REPS) - 1]
    row = bayesian_bootstrap_revenue_ci(spark, sf_dir).collect()[0]
    assert (row.n_days, row.n_replicates) == (len(daily), BOOT_REPS)
    assert row.mean_micro_obs == (
        1_000_000 * sum(r for _, r in daily)
    ) // len(daily)
    assert (row.ci_lo_micro, row.ci_hi_micro) == (lo, hi)
    assert row.ci_lo_micro <= row.mean_micro_obs <= row.ci_hi_micro


def test_anova_f_known_fixture(spark, tmp_path):
    from rdbms_metadata_manager_spark.queries.stats import (
        _anova_oracle,
        anova_f_order_priority,
    )

    # two groups with real variance: expected F from the same
    # fixed-order IEEE DAG the engines run
    d = tmp_path / "anova"
    d.mkdir()
    vals = {"1-URGENT": [1.0, 2.0, 3.0], "5-LOW": [5.0, 7.0]}
    rows = []
    i = 0
    for prio, vs in vals.items():
        for v in vs:
            i += 1
            rows.append((i, i, v, f"1995-01-{i:02d}", prio))
    _orders(d, rows)
    df = anova_f_order_priority(spark, str(d))
    assert_matches_oracle(df, _anova_oracle(), str(d))
    r = df.collect()[0]
    cents = {p: [round(v * 100) for v in vs] for p, vs in vals.items()}
    n = sum(len(v) for v in cents.values())
    s = sum(sum(v) for v in cents.values())
    ss = sum(x * x for v in cents.values() for x in v)
    tb = sum(sum(v) ** 2 / len(v) for v in cents.values())
    k = 2
    f_exp = ((tb - s * s / n) / (k - 1)) / ((ss - tb) / (n - k))
    assert (r.n_orders, r.k_groups, r.df_between, r.df_within) == (5, 2, 1, 3)
    assert abs(r.f_stat - f_exp) < 1e-9 * max(1.0, abs(f_exp))

    # zero within-group variance -> den <= 0 -> NULL
    d2 = tmp_path / "anova0"
    d2.mkdir()
    _orders(
        d2,
        [(1, 1, 1.0, "1995-01-01", "1-URGENT"), (2, 2, 1.0, "1995-01-02", "1-URGENT"),
         (3, 3, 2.0, "1995-01-03", "5-LOW"), (4, 4, 2.0, "1995-01-04", "5-LOW")],
    )
    df2 = anova_f_order_priority(spark, str(d2))
    assert_matches_oracle(df2, _anova_oracle(), str(d2))
    assert df2.collect()[0].f_stat is None

    # single non-empty group -> k < 2 -> NULL
    d3 = tmp_path / "anova1"
    d3.mkdir()
    _orders(d3, [(1, 1, 1.0, "1995-01-01", "2-HIGH"), (2, 2, 9.0, "1995-01-02", "2-HIGH")])
    df3 = anova_f_order_priority(spark, str(d3))
    assert_matches_oracle(df3, _anova_oracle(), str(d3))
    r3 = df3.collect()[0]
    assert r3.k_groups == 1 and r3.f_stat is None


def test_xcorr_perfect_linear_and_lags(spark, tmp_path):
    """Daily value exactly linear in daily count -> r = 1 at lag 0,
    and the lagged legs correlate i against i+L (still perfectly
    linear). Pure-Python Pearson agrees at every lag."""
    from rdbms_metadata_manager_spark.queries.stats import (
        _XCORR_SQL,
        daily_cross_correlation,
    )

    d = tmp_path / "xc"
    d.mkdir()
    rows = []
    eid = 0
    # day i (1..12) has i events, each worth 2.00 -> x_i = i, y_i = 200*i
    for i in range(1, 13):
        for _ in range(i):
            eid += 1
            rows.append((eid, eid, f"2024-03-{i:02d} 00:00:00", 2.0))
    _events(d, rows)
    df = daily_cross_correlation(spark, str(d))
    assert_matches_oracle(df, _XCORR_SQL, str(d))
    got = {r.lag_days: r for r in df.collect()}
    assert set(got) == set(range(8))
    for lag in range(8):
        xs = list(range(1, 13 - lag))
        ys = [200 * (x + lag) for x in xs]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        r_exp = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        assert got[lag].n_pairs == n
        assert abs(got[lag].xcorr - r_exp) < 1e-12
        assert abs(got[lag].xcorr - 1.0) < 1e-9  # linear -> r = 1


def test_xcorr_constant_series_is_null(spark, tmp_path):
    from rdbms_metadata_manager_spark.queries.stats import (
        _XCORR_SQL,
        daily_cross_correlation,
    )

    d = tmp_path / "xc0"
    d.mkdir()
    # one event per day -> x constant -> zero variance -> NULL r
    _events(
        d,
        [(i, i, f"2024-03-{i:02d} 00:00:00", float(i)) for i in range(1, 9)],
    )
    df = daily_cross_correlation(spark, str(d))
    assert_matches_oracle(df, _XCORR_SQL, str(d))
    for r in df.collect():
        assert r.xcorr is None


def test_conformal_known_band_and_coverage(spark, tmp_path):
    """Linear daily revenue: every seasonal residual is the same 70
    cents/day * 7 = constant, so q_hat equals it and eval coverage is
    exactly 1000 permille; the rank k = ceil(0.9*(n_cal+1)) is pinned
    by construction."""
    from rdbms_metadata_manager_spark.queries.stats import (
        _CONFORMAL_SQL,
        conformal_forecast_intervals,
    )

    d = tmp_path / "conf"
    d.mkdir()
    # days 1..28, revenue 10.00 + 0.10*i dollars -> r_d - r_{d-7} = 70 cents
    _orders(
        d,
        [(i, i, 10.0 + 0.10 * i, f"1995-01-{i:02d}", "3-MEDIUM") for i in range(1, 29)],
    )
    df = conformal_forecast_intervals(spark, str(d))
    assert_matches_oracle(df, _CONFORMAL_SQL, str(d))
    r = df.collect()[0]
    # residual days: 8..28 (21 days), mid = (8+28)//2 = 18
    # cal = days 8..17 (10), eval = 18..28 (11)
    assert (r.n_cal, r.n_eval) == (10, 11)
    assert r.q_hat_cents == 70
    assert r.coverage_permille == 1000
    assert r.nominal_permille == 900


def test_conformal_empty_calibration_half_reports_zero(spark, tmp_path):
    """Review r7 finding (confirmed divergence): exactly 8
    consecutive order days give ONE residual day, an EMPTY
    calibration half, and one eval row — n_cal must be 0 on both
    engines (it comes from the always-one-row calibration count, not
    a first() over zero ranked rows, which yielded NULL)."""
    from rdbms_metadata_manager_spark.queries.stats import (
        _CONFORMAL_SQL,
        conformal_forecast_intervals,
    )

    d = tmp_path / "conf8"
    d.mkdir()
    _orders(
        d,
        [(i, i, 10.0 + i, f"1995-01-{i:02d}", "3-MEDIUM") for i in range(1, 9)],
    )
    df = conformal_forecast_intervals(spark, str(d))
    assert_matches_oracle(df, _CONFORMAL_SQL, str(d))
    r = df.collect()[0]
    assert (r.n_cal, r.n_eval) == (0, 1)
    assert r.q_hat_cents is None and r.coverage_permille is None


def test_conformal_too_few_days_is_empty(spark, tmp_path):
    """Fewer than 8 distinct days -> no forecastable day -> the
    report contracts to ZERO rows on both engines (the GROUP BY
    semantics), never a divide-by-zero."""
    from rdbms_metadata_manager_spark.queries.stats import (
        _CONFORMAL_SQL,
        conformal_forecast_intervals,
    )

    d = tmp_path / "conf0"
    d.mkdir()
    _orders(
        d,
        [(i, i, 10.0, f"1995-01-{i:02d}", "3-MEDIUM") for i in range(1, 6)],
    )
    df = conformal_forecast_intervals(spark, str(d))
    assert_matches_oracle(df, _CONFORMAL_SQL, str(d))
    assert df.count() == 0


def test_bh_fdr_matches_pure_python_with_planted_drift(spark, tmp_path):
    """One nation's orders all land in the first half (massive |z|),
    two stay uniform; the full BH step-up is replicated in Python —
    thresholds included — and every output cell must agree."""
    from rdbms_metadata_manager_spark.queries.stats import (
        _BH_M,
        BH_Z_THRESHOLDS,
        bh_fdr_nation_drift,
        _bh_oracle,
    )

    d = tmp_path / "bh"
    d.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT * FROM (VALUES
              (0, 'DRIFTLAND', 0, ''), (1, 'STEADYA', 0, ''), (2, 'STEADYB', 0, ''))
              AS t(n_nationkey, n_name, n_regionkey, n_comment))
            TO '{d}/nation.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT i AS c_custkey, (i % 3) AS c_nationkey
              FROM range(1, 31) t(i))
            TO '{d}/customer.parquet' (FORMAT PARQUET)"""
    )
    # calendar days 1..20 -> mid = 10; nation 0 customers (custkey %3==0)
    # order ONLY on days 1..9; nations 1,2 order on all 20 days
    con.execute(
        f"""COPY (
          SELECT row_number() OVER () AS o_orderkey, c AS o_custkey,
                 'O' AS o_orderstatus, 100.0 AS o_totalprice,
                 TIMESTAMP '1995-01-01' + INTERVAL (day - 1) DAY AS o_orderdate,
                 '3-MEDIUM' AS o_orderpriority
          FROM range(1, 31) t1(c), range(1, 21) t2(day)
          WHERE (c % 3 != 0) OR day <= 9
        ) TO '{d}/orders.parquet' (FORMAT PARQUET)"""
    )
    counts = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"""SELECT c_nationkey,
                       sum(CASE WHEN epoch_us(o_orderdate)//1000000//86400 <
                           (SELECT (min(epoch_us(o_orderdate)//1000000//86400)
                                  + max(epoch_us(o_orderdate)//1000000//86400))//2
                            FROM '{d}/orders.parquet') THEN 1 ELSE 0 END)::BIGINT,
                       count(*)::BIGINT
                FROM '{d}/orders.parquet' o
                JOIN '{d}/customer.parquet' c ON o.o_custkey = c.c_custkey
                GROUP BY 1"""
        ).fetchall()
    }
    con.close()
    names = {0: "DRIFTLAND", 1: "STEADYA", 2: "STEADYB"}
    t1 = sum(v[0] for v in counts.values())
    t2 = sum(v[1] - v[0] for v in counts.values())
    py = {}
    for k, (n1, tot) in counts.items():
        n2 = tot - n1
        pooled = (n1 + n2) / (t1 + t2)
        if t1 == 0 or t2 == 0 or pooled <= 0 or pooled >= 1:
            z = 0.0
        else:
            z = (n1 / t1 - n2 / t2) / math.sqrt(
                pooled * (1 - pooled) * (1 / t1 + 1 / t2)
            )
        py[names[k]] = (n1, n2, z)
    ranked = sorted(py.items(), key=lambda kv: (-abs(kv[1][2]), kv[0]))
    i_star = 0
    for i, (nm, (_, _, z)) in enumerate(ranked, start=1):
        th = BH_Z_THRESHOLDS[i - 1] if i <= _BH_M else 1e308
        if abs(z) >= th:
            i_star = max(i_star, i)
    expected = {
        nm: (n1, n2, z, i, i <= i_star)
        for i, (nm, (n1, n2, z)) in enumerate(ranked, start=1)
    }

    df = bh_fdr_nation_drift(spark, str(d))
    assert_matches_oracle(df, _bh_oracle(), str(d))
    got = {r.n_name: r for r in df.collect()}
    assert set(got) == set(expected)
    for nm, (n1, n2, z, rank, rej) in expected.items():
        r = got[nm]
        assert (r.n_first, r.n_second, r.bh_rank, r.rejected) == (n1, n2, rank, rej)
        assert abs(r.z_stat - z) < 1e-9 * max(1.0, abs(z))
    assert got["DRIFTLAND"].rejected  # the planted drift is found
    assert got["DRIFTLAND"].bh_rank == 1


def test_scorer_auc_matches_pure_python_midrank(spark, sf_dir):
    """AUC re-derived in Python from the engine's own per-doc
    (score, rule-verdict) relations with the tie-aware U statistic —
    independent of the histogram/prefix plumbing under test."""
    from rdbms_metadata_manager_spark.llm.curation import (
        quality_classifier_scores,
        quality_filter_gate,
        quality_scorer_auc,
    )

    scores = {
        r.doc_id: r.score
        for r in quality_classifier_scores(spark, sf_dir).collect()
    }
    keeps = {r.doc_id: r.keep for r in quality_filter_gate(spark, sf_dir).collect()}
    pos = sorted(s for i, s in scores.items() if keeps[i])
    neg = sorted(s for i, s in scores.items() if not keeps[i])
    u2 = 0
    for p in pos:
        # 2*(# neg strictly below) + (# neg tied)
        import bisect

        u2 += 2 * bisect.bisect_left(neg, p) + (
            bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p)
        )
    row = quality_scorer_auc(spark, sf_dir).collect()[0]
    assert (row.n_pos, row.n_neg) == (len(pos), len(neg))
    if pos and neg:
        assert row.auc_permille == (1000 * u2) // (2 * len(pos) * len(neg))
    else:
        assert row.auc_permille is None


def test_mix_ess_uniform_sources_is_full_n(spark, tmp_path):
    """Equal token mass per source -> equal weights -> ESS = n
    exactly (milli-units) and design effect exactly 1000."""
    from rdbms_metadata_manager_spark.llm.pipeline import (
        _ESS_SQL,
        mix_effective_sample_size,
    )
    import pandas as pd

    d = tmp_path / "ess"
    d.mkdir()
    rows = []
    for s in ("alpha", "beta", "gamma"):
        for i in range(4):
            rows.append((len(rows) + 1, "one two three four five", "en", s, 23))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    con = duckdb.connect()
    con.register("pdf", pdf)
    con.execute(
        f"COPY (SELECT * FROM pdf) TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    con.close()
    df = mix_effective_sample_size(spark, str(d))
    assert_matches_oracle(df, _ESS_SQL, str(d))
    r = df.collect()[0]
    assert (r.n_docs, r.n_sources) == (12, 3)
    assert r.ess_milli == 12_000
    assert r.deff_milli == 1000


def test_mix_ess_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.llm.pipeline import mix_effective_sample_size

    con = duckdb.connect()
    per_source = con.execute(
        f"""SELECT source, count(*)::BIGINT,
                   sum(len(string_split(text, ' ')))::BIGINT
            FROM '{sf_dir}/documents.parquet' GROUP BY source"""
    ).fetchall()
    con.close()
    grand = sum(t for _, _, t in per_source)
    m = len(per_source)
    s1 = s2 = n = 0
    for _, n_docs, t in per_source:
        w = (1000 * grand) // (m * t) if t else 0
        n += n_docs
        s1 += n_docs * w
        s2 += n_docs * w * w
    r = mix_effective_sample_size(spark, sf_dir).collect()[0]
    assert (r.n_docs, r.n_sources) == (n, m)
    assert r.ess_milli == (1000 * s1 * s1) // s2
    assert r.deff_milli == (1000 * n * s2) // (s1 * s1)


def test_cramers_v_independence_and_perfect_association(spark, tmp_path):
    from rdbms_metadata_manager_spark.queries.stats import (
        _CRAMER_SQL,
        cramers_v_nation_segment,
    )

    con = duckdb.connect()
    # independent: every (nation, segment) cell has exactly 2 rows ->
    # o*N == rt*ct everywhere -> chi2 exactly 0, V = 0
    d1 = tmp_path / "ind"
    d1.mkdir()
    con.execute(
        f"""COPY (SELECT i AS c_custkey, (i % 3) AS c_nationkey,
                     'SEG' || ((i // 3) % 4)::VARCHAR AS c_mktsegment
              FROM range(0, 24) t(i))
            TO '{d1}/customer.parquet' (FORMAT PARQUET)"""
    )
    df1 = cramers_v_nation_segment(spark, str(d1))
    assert_matches_oracle(df1, _CRAMER_SQL, str(d1))
    r1 = df1.collect()[0]
    assert (r1.chi2_micro, r1.cramers_v) == (0, 0.0)

    # perfect: nation determines segment -> V = 1 (chi2 = N*(k-1))
    d2 = tmp_path / "perf"
    d2.mkdir()
    con.execute(
        f"""COPY (SELECT i AS c_custkey, (i % 3) AS c_nationkey,
                     'SEG' || (i % 3)::VARCHAR AS c_mktsegment
              FROM range(0, 30) t(i))
            TO '{d2}/customer.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    df2 = cramers_v_nation_segment(spark, str(d2))
    assert_matches_oracle(df2, _CRAMER_SQL, str(d2))
    r2 = df2.collect()[0]
    # per-cell micro-truncation bounds the error by #cells micro-units
    assert abs(r2.cramers_v - 1.0) < 1e-6
    assert abs(r2.chi2_micro - 30 * (3 - 1) * 1_000_000) <= 9


def test_cramers_v_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.stats import cramers_v_nation_segment

    con = duckdb.connect()
    cells = con.execute(
        f"""SELECT c_nationkey, c_mktsegment, count(*)::BIGINT
            FROM '{sf_dir}/customer.parquet' GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    rt, ct, n = {}, {}, 0
    for nk, seg, o in cells:
        rt[nk] = rt.get(nk, 0) + o
        ct[seg] = ct.get(seg, 0) + o
        n += o
    obs = sum(
        ((o * n - rt[nk] * ct[seg]) ** 2 * 1_000_000) // (rt[nk] * ct[seg] * n)
        for nk, seg, o in cells
    )
    e_obs = sum((rt[nk] * ct[seg] * 1_000_000) // n for nk, seg, _ in cells)
    chi_micro = obs + 1_000_000 * n - e_obs
    v = math.sqrt((chi_micro / 1e6) / (n * (min(len(rt), len(ct)) - 1)))
    r = cramers_v_nation_segment(spark, sf_dir).collect()[0]
    assert (r.n_customers, r.n_nations, r.n_segments) == (n, len(rt), len(ct))
    assert r.chi2_micro == chi_micro
    assert abs(r.cramers_v - v) < 1e-12


def test_ab_power_mde_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.stats import (
        Z_ALPHA2,
        Z_BETA,
        ab_power_mde_report,
    )

    con = duckdb.connect()
    per_user = con.execute(
        f"""SELECT user_id,
                   sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT
            FROM '{sf_dir}/events.parquet' GROUP BY user_id"""
    ).fetchall()
    con.close()
    n = len(per_user)
    s = sum(x for _, x in per_user)
    ss = sum(x * x for _, x in per_user)
    n_a = sum(1 for u, _ in per_user if _h32(f"cuped:{u}") % 2 == 0)
    var = (ss - s * s / n) / (n - 1)
    mde = (Z_ALPHA2 + Z_BETA) * math.sqrt(var * (1 / n_a + 1 / (n - n_a)))
    r = ab_power_mde_report(spark, sf_dir).collect()[0]
    assert (r.n_users, r.n_a, r.n_b) == (n, n_a, n - n_a)
    assert r.mean_cents_milli == (1000 * s) // n
    assert abs(r.mde_cents - mde) < 1e-9 * max(1.0, mde)


def test_jackknife_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.llm.curation import (
        jackknife_source_sensitivity,
        quality_classifier_scores,
    )

    scores = {
        r.doc_id: r.score
        for r in quality_classifier_scores(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    srcs = dict(
        con.execute(
            f"SELECT doc_id, source FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    con.close()
    per = {}
    for i, sc in scores.items():
        ns, ssum = per.get(srcs[i], (0, 0))
        per[srcs[i]] = (ns + 1, ssum + sc)
    n = sum(v[0] for v in per.values())
    s = sum(v[1] for v in per.values())
    got = {r.source: r for r in jackknife_source_sensitivity(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for src, (ns, ssum) in per.items():
        r = got[src]
        assert r.n_docs == ns
        if n - ns == 0:
            assert r.loo_mean_milli is None
        else:
            loo = _trunc_div(1000 * (s - ssum), n - ns)
            assert r.loo_mean_milli == loo
            assert r.delta_milli == loo - _trunc_div(1000 * s, n)


def _trunc_div(a: int, b: int) -> int:
    """div/: truncation toward zero (Python // floors)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_gains_curve_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.llm.curation import (
        gains_curve_scorer,
        quality_classifier_scores,
        quality_filter_gate,
    )

    scores = {
        r.doc_id: r.score
        for r in quality_classifier_scores(spark, sf_dir).collect()
    }
    keeps = {r.doc_id: r.keep for r in quality_filter_gate(spark, sf_dir).collect()}
    ranked = sorted(scores, key=lambda i: (-scores[i], i))
    n, p = len(ranked), sum(keeps.values())
    exp = {}
    for rk, i in enumerate(ranked, start=1):
        dec = ((rk - 1) * 10) // n
        nd, nk = exp.get(dec, (0, 0))
        exp[dec] = (nd + 1, nk + (1 if keeps[i] else 0))
    got = {r.decile: r for r in gains_curve_scorer(spark, sf_dir).collect()}
    assert set(got) == set(exp)
    cum = 0
    for dec in sorted(exp):
        nd, nk = exp[dec]
        cum += nk
        r = got[dec]
        assert (r.n_docs, r.n_kept) == (nd, nk)
        assert r.cum_kept_permille == (1000 * cum) // p
    # the curve is monotone and ends at exactly 1000 permille
    assert got[max(exp)].cum_kept_permille == 1000


def test_cmh_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.stats import cmh_return_rate_strata

    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH returned AS (
          SELECT DISTINCT l_orderkey FROM '{sf_dir}/lineitem.parquet'
          WHERE l_returnflag = 'R'
        )
        SELECT c.c_nationkey, o.o_custkey,
               CASE WHEN r.l_orderkey IS NOT NULL THEN 1 ELSE 0 END
        FROM '{sf_dir}/orders.parquet' o
        LEFT JOIN returned r ON o.o_orderkey = r.l_orderkey
        JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
        """
    ).fetchall()
    con.close()
    strata = {}
    for nk, ck, ret in rows:
        n, n1, m1, a = strata.get(nk, (0, 0, 0, 0))
        arm0 = _h32(f"cmh:{ck}") % 2 == 0
        strata[nk] = (n + 1, n1 + arm0, m1 + ret, a + (ret if arm0 else 0))
    sum_a = sum(v[3] for v in strata.values())
    e_micro = sum(
        math.floor((n1 * m1 / n) * 1_000_000)
        for n, n1, m1, _ in strata.values()
        if n > 0
    )
    v_micro = sum(
        math.floor((n1 * (n - n1) * m1 * (n - m1) / (n * n * (n - 1))) * 1_000_000)
        for n, n1, m1, _ in strata.values()
        if n >= 2
    )
    r = cmh_return_rate_strata(spark, sf_dir).collect()[0]
    assert (r.n_strata, r.n_orders, r.sum_a) == (
        len(strata),
        len(rows),
        sum_a,
    )
    z = (1_000_000 * sum_a - e_micro) / math.sqrt(1_000_000 * v_micro)
    assert abs(r.cmh_z - z) < 1e-9 * max(1.0, abs(z))


def test_minmax_skipping_layout_asymmetry(spark, sf_dir):
    """The whole point of the audit: each layout must skip MOST files
    for probes on its own cluster key and (on this uncorrelated
    data) almost none for the other key — plus a full pure-Python
    replication of zones, probes, and overlap counts."""
    from rdbms_metadata_manager_spark.queries.audit import (
        SKIP_FILES,
        SKIP_PROBES,
        minmax_skipping_audit,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_orderkey, o_custkey,
                   epoch_us(o_orderdate) // 1000000 // 86400
            FROM '{sf_dir}/orders.parquet'"""
    ).fetchall()
    con.close()
    n = len(rows)
    keys = {"ck": lambda r: r[1], "dy": lambda r: r[2]}
    expected = {}
    for layout, lcol in (("by_custkey", "ck"), ("by_date", "dy")):
        ranked = sorted(rows, key=lambda r: (keys[lcol](r), r[0]))
        zones = {}
        for rk, row in enumerate(ranked, start=1):
            f = ((rk - 1) * SKIP_FILES) // n
            z = zones.get(f)
            dy, ck = row[2], row[1]
            if z is None:
                zones[f] = [dy, dy, ck, ck]
            else:
                z[0], z[1] = min(z[0], dy), max(z[1], dy)
                z[2], z[3] = min(z[2], ck), max(z[3], ck)
        for probe_key, pcol in (("custkey", "ck"), ("date", "dy")):
            vals = [keys[pcol](r) for r in rows]
            lo0, hi0 = min(vals), max(vals)
            step = max((hi0 - lo0 + 1) // SKIP_PROBES, 1)
            for k in range(SKIP_PROBES):
                p_lo = lo0 + k * step
                p_hi = hi0 if k == SKIP_PROBES - 1 else lo0 + (k + 1) * step - 1
                idx = (0, 1) if pcol == "dy" else (2, 3)
                touched = sum(
                    1
                    for z in zones.values()
                    if z[idx[1]] >= p_lo and z[idx[0]] <= p_hi
                )
                expected[(layout, probe_key, k)] = (len(zones), touched)
    got = {
        (r.layout, r.probe_key, r.probe_id): r
        for r in minmax_skipping_audit(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for key, (ft, touched) in expected.items():
        r = got[key]
        assert (r.files_total, r.files_touched) == (ft, touched)
        assert r.skip_permille == (1000 * (ft - touched)) // ft
    # the asymmetry the audit exists to measure
    own = [
        r.skip_permille
        for r in got.values()
        if (r.layout, r.probe_key) in (("by_date", "date"), ("by_custkey", "custkey"))
    ]
    cross = [
        r.skip_permille
        for r in got.values()
        if (r.layout, r.probe_key) in (("by_date", "custkey"), ("by_custkey", "date"))
    ]
    assert min(own) >= 750  # own-key probes skip >= 3/4 of files
    assert max(cross) <= 250  # cross-key probes barely skip


def test_global_agg_stats_on_empty_input(spark, sf_dir, tmp_path):
    """The three global-aggregate reports (permutation, bootstrap,
    ANOVA) must yield ONE row of NULL-guarded cells on an empty
    corpus — matching their oracles' aggregate-without-GROUP-BY
    semantics — never a divide-by-zero."""
    d = str(tmp_path / "empty")
    import os

    os.makedirs(d)
    con = duckdb.connect()
    for t in ["orders", "events", "customer", "lineitem"]:
        con.execute(
            f"""COPY (SELECT * FROM '{sf_dir}/{t}.parquet' LIMIT 0)
                TO '{d}/{t}.parquet' (FORMAT PARQUET)"""
        )
    con.close()
    from rdbms_metadata_manager_spark.queries.stats import (
        _BOOT_SQL,
        _PERM_SQL,
        _anova_oracle,
        anova_f_order_priority,
        bayesian_bootstrap_revenue_ci,
        permutation_test_ab,
    )

    perm = permutation_test_ab(spark, d)
    assert_matches_oracle(perm, _PERM_SQL, d)
    r = perm.collect()[0]
    assert r.p_value_permille is None

    boot = bayesian_bootstrap_revenue_ci(spark, d)
    assert_matches_oracle(boot, _BOOT_SQL, d)
    r = boot.collect()[0]
    assert (r.n_days, r.mean_micro_obs) == (0, None)

    anova = anova_f_order_priority(spark, d)
    assert_matches_oracle(anova, _anova_oracle(), d)
    assert anova.collect()[0].f_stat is None

    from rdbms_metadata_manager_spark.queries.stats import (
        _CMH_SQL,
        cmh_return_rate_strata,
    )

    cmh = cmh_return_rate_strata(spark, d)
    assert_matches_oracle(cmh, _CMH_SQL, d)
    r = cmh.collect()[0]
    assert (r.n_strata, r.n_orders) == (0, 0)
    assert r.cmh_z is None
