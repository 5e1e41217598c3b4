"""Independent pure-Python reference tests for the statistical-
inference operators (inference.py) and fk_inclusion_discovery, plus
adversarial fixtures for their degenerate regimes (all-tied groups,
censored-only customers, constant series). The references share no
code with either engine."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from conftest import assert_matches_oracle

DAY_US = 86400 * 1_000_000


def _midranks_x2(values):
    """value -> doubled midrank over the multiset `values`."""
    cnt = Counter(values)
    out = {}
    cum = 0
    for v in sorted(cnt):
        n = cnt[v]
        out[v] = 2 * cum + n + 1
        cum += n
    return out


def test_kruskal_wallis_matches_pure_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), o_orderpriority"
        f" FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    con.close()
    ranks = _midranks_x2([m for m, _ in rows])
    by_grp = defaultdict(list)
    for m, g in rows:
        by_grp[g].append(ranks[m])
    n = len(rows)
    s = 0.0
    exp_rows = {}
    for g in sorted(by_grp):
        r_x2 = sum(by_grp[g])
        exp_rows[g] = (len(by_grp[g]), r_x2)
        s += (r_x2 / 2.0) ** 2 / len(by_grp[g])
    h = 12.0 * s / (n * (n + 1.0)) - 3.0 * (n + 1.0)
    cnt = Counter(m for m, _ in rows)
    tie = sum(c**3 - c for c in cnt.values())
    c_corr = 1.0 - tie / (float(n) ** 3 - n)

    from rdbms_metadata_manager_spark.queries.inference import (
        kruskal_wallis_priority,
    )

    got = kruskal_wallis_priority(spark, sf_dir).collect()
    assert len(got) == len(exp_rows)
    for r in got:
        n_g, r_x2 = exp_rows[r.grp]
        assert (r.n_g, r.rank_sum_x2) == (n_g, r_x2)
        assert r.n_total == n
        assert abs(r.h_stat - h) < 1e-9 * max(1.0, abs(h))
        assert abs(r.h_tie_adj - h / c_corr) < 1e-9 * max(1.0, abs(h))


def test_kruskal_all_tied_values_null_adjusted(spark, tmp_path):
    """Every metric value identical -> tie correction C = 0 -> the
    adjusted statistic must be NULL on BOTH engines (not a division
    error), and raw H must be exactly 0."""
    d = tmp_path / "tied"
    d.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT i AS o_orderkey, i AS o_custkey,
                     'O' AS o_orderstatus, 100.00 AS o_totalprice,
                     TIMESTAMP '1995-01-01' AS o_orderdate,
                     CASE i % 3 WHEN 0 THEN '1-URGENT' WHEN 1 THEN '2-HIGH'
                          ELSE '3-MEDIUM' END AS o_orderpriority
              FROM range(1, 31) t(i))
        TO '{d}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    from rdbms_metadata_manager_spark.queries.inference import (
        _KRUSKAL_SQL,
        kruskal_wallis_priority,
    )

    df = kruskal_wallis_priority(spark, str(d))
    assert_matches_oracle(df, _KRUSKAL_SQL, str(d))
    rows = df.collect()
    assert all(r.h_tie_adj is None for r in rows)
    assert all(abs(r.h_stat) < 1e-9 for r in rows)


def test_spearman_matches_pure_python(spark, sf_dir):
    con = duckdb.connect()
    daily = con.execute(
        f"""
        SELECT epoch_us(o_orderdate) // 1000000 // 86400 AS day_idx,
               count(*) AS n_ord,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
        FROM '{sf_dir}/orders.parquet' GROUP BY 1
        """
    ).fetchall()
    con.close()
    xs = [n for _, n, _ in daily]
    ys = [r for _, _, r in daily]
    rx_map, ry_map = _midranks_x2(xs), _midranks_x2(ys)
    rx = [rx_map[x] for x in xs]
    ry = [ry_map[y] for y in ys]
    n = len(daily)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(v * v for v in rx)
    syy = sum(v * v for v in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    cov = n * sxy - sx * sy
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    rho = cov / math.sqrt(vx * vy)

    from rdbms_metadata_manager_spark.queries.inference import spearman_daily_rho

    row = spearman_daily_rho(spark, sf_dir).collect()[0]
    assert (row.n_days, row.cov_num, row.varx_num, row.vary_num) == (n, cov, vx, vy)
    assert abs(row.rho - rho) < 1e-12


def test_spearman_constant_series_null_rho(spark, tmp_path):
    """Constant revenue across days -> zero rank variance -> rho NULL
    on both engines, numerators still exact."""
    d = tmp_path / "const"
    d.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT i AS o_orderkey, i AS o_custkey, 'O' AS o_orderstatus,
                     50.00 AS o_totalprice,
                     TIMESTAMP '1995-01-01' + INTERVAL (i % 10) DAY AS o_orderdate,
                     '1-URGENT' AS o_orderpriority
              FROM range(1, 41) t(i))
        TO '{d}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    from rdbms_metadata_manager_spark.queries.inference import (
        _SPEARMAN_SQL,
        spearman_daily_rho,
    )

    df = spearman_daily_rho(spark, str(d))
    assert_matches_oracle(df, _SPEARMAN_SQL, str(d))
    row = df.collect()[0]
    # 4 orders on each of 10 days: both series constant -> vary = 0
    assert row.n_days == 10
    assert row.varx_num == 0 and row.vary_num == 0
    assert row.rho is None


def _km_reference(cust_days, gmax):
    """Pure-Python Kaplan-Meier over per-customer sorted day lists."""
    iv = []
    for days in cust_days.values():
        days.sort()
        iv += [(b - a, 1) for a, b in zip(days, days[1:])]
        iv.append((gmax - days[-1], 0))
    table = defaultdict(lambda: [0, 0])
    for dur, ev in iv:
        table[dur][0 if ev else 1] += 1
    out = []
    remaining = len(iv)
    surv = 1.0
    for dur in sorted(table):
        d, c = table[dur]
        n_risk = remaining
        if d:
            surv *= (n_risk - d) / n_risk
        out.append((dur, n_risk, d, c, surv))
        remaining -= d + c
    return out


def test_kaplan_meier_matches_pure_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_custkey, epoch_us(o_orderdate) // 1000000 // 86400"
        f" FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    con.close()
    cust = defaultdict(list)
    for ck, day in rows:
        cust[ck].append(day)
    gmax = max(day for _, day in rows)
    exp = _km_reference(cust, gmax)

    from rdbms_metadata_manager_spark.queries.inference import (
        kaplan_meier_repurchase,
    )

    got = kaplan_meier_repurchase(spark, sf_dir).collect()
    assert len(got) == len(exp)
    for r, (dur, n_risk, d, c, surv) in zip(got, exp):
        assert (r.dur_days, r.n_risk, r.d_events, r.c_censored) == (dur, n_risk, d, c)
        assert abs(r.surv - surv) < 1e-12


def test_kaplan_meier_censor_only_and_same_day_fixture(spark, tmp_path):
    """Adversarial shapes: a single-order customer (contributes ONLY
    a censored interval), a customer with two same-day orders (a
    dur=0 EVENT), and a customer whose last order IS the global max
    date (censored at dur=0) — the life-table tie row where events
    and censors share t=0 and censored rows must stay in the risk
    set."""
    d = tmp_path / "km"
    d.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * FROM (VALUES
          (1, 1, 'O', 10.0, TIMESTAMP '1995-01-10', '1-URGENT'),
          (2, 2, 'O', 10.0, TIMESTAMP '1995-01-01', '1-URGENT'),
          (3, 2, 'O', 10.0, TIMESTAMP '1995-01-01', '1-URGENT'),
          (4, 2, 'O', 10.0, TIMESTAMP '1995-01-05', '1-URGENT'),
          (5, 3, 'O', 10.0, TIMESTAMP '1995-01-02', '1-URGENT'),
          (6, 3, 'O', 10.0, TIMESTAMP '1995-01-12', '1-URGENT')
        ) AS t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority))
        TO '{d}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    from rdbms_metadata_manager_spark.queries.inference import (
        _KM_SQL,
        kaplan_meier_repurchase,
    )

    df = kaplan_meier_repurchase(spark, str(d))
    assert_matches_oracle(df, _KM_SQL, str(d))
    rows = {r.dur_days: r for r in df.collect()}
    # intervals: cust1 censored dur=2; cust2 events 0,4 + censored 7;
    # cust3 event 10 + censored 0  -> 6 intervals total
    assert rows[0].n_risk == 6 and rows[0].d_events == 1 and rows[0].c_censored == 1
    assert abs(rows[0].surv - 5 / 6) < 1e-12
    assert rows[10].n_risk == 1 and rows[10].d_events == 1
    assert abs(rows[10].surv - 0.0) < 1e-12


def test_hhi_matches_pure_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT r.r_name, l.l_suppkey,
               sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                   AS BIGINT)) AS cents
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
        JOIN '{sf_dir}/nation.parquet' n ON s.s_nationkey = n.n_nationkey
        JOIN '{sf_dir}/region.parquet' r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
        """
    ).fetchall()
    con.close()
    by_region = defaultdict(dict)
    for rn, sk, cents in rows:
        by_region[rn][sk] = cents

    from rdbms_metadata_manager_spark.queries.inference import (
        hhi_market_concentration,
    )

    got = {r.region_name: r for r in hhi_market_concentration(spark, sf_dir).collect()}
    assert set(got) == set(by_region)
    for rn, sup in by_region.items():
        total = sum(sup.values())
        r = got[rn]
        assert r.n_suppliers == len(sup)
        assert r.revenue_cents == total
        assert r.hhi_e8 == (10**8 * sum(v * v for v in sup.values())) // total**2
        assert r.top1_share_bp == (10**4 * max(sup.values())) // total


def test_cohort_ltv_matches_pure_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT o_custkey, year(o_orderdate) * 12 + month(o_orderdate) - 1,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/orders.parquet'
        """
    ).fetchall()
    con.close()
    first = {}
    for ck, m, _ in rows:
        first[ck] = min(first.get(ck, m), m)
    sizes = Counter(first.values())
    cells = defaultdict(int)
    for ck, m, cents in rows:
        cells[(first[ck], m - first[ck])] += cents

    from rdbms_metadata_manager_spark.queries.inference import cohort_ltv_curve

    got = cohort_ltv_curve(spark, sf_dir).collect()
    assert len(got) == len(cells)
    cum = defaultdict(int)
    exp = {}
    for (cohort, age) in sorted(cells):
        cum[cohort] += cells[(cohort, age)]
        exp[(cohort, age)] = cum[cohort]
    for r in got:
        key = (r.cohort_idx, r.age_months)
        assert r.cum_rev_cents == exp[key]
        assert r.n_customers == sizes[r.cohort_idx]
        assert r.ltv_cents_per_customer == exp[key] // sizes[r.cohort_idx]
        y, m = divmod(r.cohort_idx, 12)
        assert r.cohort_month == f"{y}-{m + 1:02d}"


def test_dow_hour_matches_pure_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT epoch_us(ts) // 1000000 FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    con.close()
    cells = Counter()
    for (secs,) in rows:
        cells[((secs // 86400 + 3) % 7, (secs // 3600) % 24 // 4)] += 1
    n_total = sum(cells.values())
    row_tot = Counter()
    col_tot = Counter()
    for (dw, h4), n in cells.items():
        row_tot[dw] += n
        col_tot[h4] += n

    from rdbms_metadata_manager_spark.queries.inference import (
        dow_hour_activity_residuals,
    )

    got = dow_hour_activity_residuals(spark, sf_dir).collect()
    assert len(got) == 42
    for r in got:
        n = cells.get((r.dow, r.hour4), 0)
        assert r.n_events == n
        assert r.row_total == row_tot.get(r.dow, 0)
        assert r.col_total == col_tot.get(r.hour4, 0)
        assert r.share_pm == (1000 * n) // n_total
        rc = row_tot.get(r.dow, 0) * col_tot.get(r.hour4, 0)
        if rc == 0:
            assert r.resid_pm is None
        else:
            num = 1000 * (n * n_total - rc)
            # truncation toward zero (div), not floor
            assert r.resid_pm == int(num / rc) if num < 0 else num // rc


def test_fk_inclusion_matches_pure_python_sets(spark, sf_dir):
    con = duckdb.connect()

    def vals(tbl, col):
        return {
            v
            for (v,) in con.execute(
                f"SELECT DISTINCT {col} FROM '{sf_dir}/{tbl}.parquet'"
                f" WHERE {col} IS NOT NULL"
            ).fetchall()
        }

    lo = vals("lineitem", "l_orderkey")
    ok = vals("orders", "o_orderkey")
    ck = vals("customer", "c_custkey")
    oc = vals("orders", "o_custkey")
    con.close()

    from rdbms_metadata_manager_spark.queries.metadata import fk_inclusion_discovery

    got = {(r.child_ref, r.parent_ref): r for r in fk_inclusion_discovery(spark, sf_dir).collect()}
    assert len(got) == 12
    r = got[("lineitem.l_orderkey", "orders.o_orderkey")]
    assert r.n_child_distinct == len(lo)
    assert r.n_parent_distinct == len(ok)
    assert r.n_contained == len(lo & ok)
    assert r.verdict == ("holds" if lo <= ok else "no")
    # the reverse probe: customers without orders break containment
    r2 = got[("customer.c_custkey", "orders.o_custkey")]
    assert r2.n_contained == len(ck & oc)
    assert r2.containment_pm == 1000 * len(ck & oc) // len(ck)


def test_cuped_matches_pure_python(spark, sf_dir):
    """Independent CUPED reference: per-user pre/post cents, pooled
    theta = cov/var, adjusted arm difference, rho^2 variance
    reduction — sharing no code with either engine (including an
    independent h32 arm assignment via the tested SQL helper)."""
    import duckdb as _dd

    from rdbms_metadata_manager_spark.llm.hashing import h32_sql

    con = _dd.connect()
    arm_expr = h32_sql("'cuped:' || user_id::VARCHAR") + " % 2"
    rows = con.execute(
        f"""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) // 1000000 // 86400 AS day,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM '{sf_dir}/events.parquet'
        ), rng AS (SELECT (min(day) + max(day)) // 2 AS mid FROM ev)
        SELECT user_id, {arm_expr},
               coalesce(sum(CASE WHEN day < mid THEN cents END), 0),
               coalesce(sum(CASE WHEN day >= mid THEN cents END), 0)
        FROM ev, rng GROUP BY user_id, 2
        """
    ).fetchall()
    con.close()
    n = len(rows)
    sx = sum(x for _, _, x, _ in rows)
    sy = sum(y for _, _, _, y in rows)
    sxx = sum(x * x for _, _, x, _ in rows)
    sxy = sum(x * y for _, _, x, y in rows)
    syy = sum(y * y for _, _, _, y in rows)
    cov, vx, vy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    theta = cov / vx
    a = [(x, y) for _, arm, x, y in rows if arm == 0]
    b = [(x, y) for _, arm, x, y in rows if arm == 1]
    mean = lambda vs: sum(vs) / len(vs)
    adj = lambda grp: mean([y for _, y in grp]) - theta * (
        mean([x for x, _ in grp]) - sx / n
    )

    from rdbms_metadata_manager_spark.queries.inference import cuped_adjusted_ab

    row = cuped_adjusted_ab(spark, sf_dir).collect()[0]
    assert (row.n_users, row.n_a, row.n_b) == (n, len(a), len(b))
    assert abs(row.theta - theta) < 1e-9 * abs(theta)
    assert abs(
        row.diff_raw - (mean([y for _, y in a]) - mean([y for _, y in b]))
    ) < 1e-6
    assert abs(row.diff_cuped - (adj(a) - adj(b))) < 1e-6
    assert abs(row.variance_reduction - cov * cov / (vx * vy)) < 1e-12
    # CUPED must not INCREASE variance: rho^2 in [0, 1]
    assert 0.0 <= row.variance_reduction <= 1.0
