"""Round-6 additions: independent pure-Python reference tests for the
new operators (interval concurrency, Mann-Whitney U, degree
assortativity, grouped MAD) plus regression fixtures for the ADVICE r5
overflow widenings. The reference implementations share NO code with
either engine — a bug would have to reproduce identically three ways
to slip through."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from pyspark.sql import functions as F

from conftest import assert_matches_oracle

GAP_US = 15 * 60 * 1_000_000


def _sessions_from_events(rows):
    """rows: (user_id, ts_us) -> list of (start_us, end_us) with the
    15-minute-gap rule, end = last event + gap."""
    by_user = defaultdict(list)
    for uid, t in rows:
        by_user[uid].append(t)
    out = []
    for uid, ts in by_user.items():
        ts.sort()
        start = prev = ts[0]
        for t in ts[1:]:
            if t - prev > GAP_US:
                out.append((start, prev + GAP_US))
                start = t
            prev = t
        out.append((start, prev + GAP_US))
    return out


def test_max_concurrent_sessions_matches_pure_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, epoch_us(ts) FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    con.close()
    iv = _sessions_from_events(rows)
    deltas = sorted(
        [(s, 1) for s, _ in iv] + [(e, -1) for _, e in iv]
    )  # (t, d): d=-1 sorts before +1 at equal t — end exclusive
    cur = peak = 0
    peak_at = None
    for t, d in deltas:
        cur += d
        if cur > peak:
            peak, peak_at = cur, t
    from rdbms_metadata_manager_spark.streaming.events_batch import (
        max_concurrent_sessions,
    )

    row = max_concurrent_sessions(spark, sf_dir).collect()[0]
    assert row.n_sessions == len(iv)
    assert row.peak_concurrent == peak
    got_us = int(row.peak_at.timestamp() * 1_000_000)
    # float seconds round-trip can wobble the last microsecond digit
    assert abs(got_us - peak_at) <= 1


def test_mann_whitney_u_matches_pure_python_midranks(spark, sf_dir):
    from rdbms_metadata_manager_spark.llm.hashing import h32_sql

    con = duckdb.connect()
    salted = "'mw:' || user_id::VARCHAR"
    rows = con.execute(
        f"""
        SELECT coalesce(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)), 0),
               {h32_sql(salted)} % 2
        FROM '{sf_dir}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    con.close()
    vals = sorted(rows)
    # midranks x2 via run-length walk over the sorted metric values
    r_a_x2 = 0
    n_a = sum(1 for _, a in rows if a == 0)
    n_b = len(rows) - n_a
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j][0] == vals[i][0]:
            j += 1
        avgrank_x2 = 2 * i + (j - i) + 1  # 2*cum_before + n_t + 1
        r_a_x2 += avgrank_x2 * sum(1 for k in range(i, j) if vals[k][1] == 0)
        i = j
    u_a_x2 = r_a_x2 - n_a * (n_a + 1)
    from rdbms_metadata_manager_spark.queries.cohort import mann_whitney_u_test

    row = mann_whitney_u_test(spark, sf_dir).collect()[0]
    assert (row.n_a, row.n_b) == (n_a, n_b)
    assert row.u_a_x2 == u_a_x2
    assert row.cle_permille == (1000 * u_a_x2) // (2 * n_a * n_b)
    # A/A sanity: the hash split should sit near 500 per-mille — only
    # meaningful with enough users (sf0.001 has 15; a 7/8 split lands
    # anywhere)
    if n_a + n_b >= 200:
        assert 300 <= row.cle_permille <= 700


def test_degree_assortativity_matches_pure_python_pearson(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.mining import (
        MAX_BASKET,
        degree_assortativity,
    )

    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH bk AS (
          SELECT l_orderkey, l_partkey FROM (
            SELECT l_orderkey, l_partkey,
                   count(*) OVER (PARTITION BY l_orderkey) AS basket_n
            FROM (SELECT DISTINCT l_orderkey, l_partkey
                  FROM '{sf_dir}/lineitem.parquet')
          ) WHERE basket_n <= {MAX_BASKET}
        )
        SELECT a.l_partkey, b.l_partkey
        FROM bk a JOIN bk b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        """
    ).fetchall()
    con.close()
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    pairs = [(deg[a], deg[b]) for a, b in edges] + [
        (deg[b], deg[a]) for a, b in edges
    ]
    m = len(pairs)
    sx = sum(x for x, _ in pairs)
    sxx = sum(x * x for x, _ in pairs)
    sxy = sum(x * y for x, y in pairs)
    num, den = m * sxy - sx * sx, m * sxx - sx * sx
    # truncation toward zero, matching Spark div / DuckDB //
    want = None
    if den != 0:
        q = (1000 * abs(num)) // abs(den)
        want = q if (num >= 0) == (den > 0) else -q
    row = degree_assortativity(spark, sf_dir).collect()[0]
    assert row.n_edges == len(edges)
    assert row.assortativity_permille == want
    # a float cross-check that the permille is the right Pearson r
    if den != 0:
        r = num / den
        assert abs(row.assortativity_permille - 1000 * r) <= 1.0


def test_grouped_mad_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.profiling import grouped_mad_two_pass

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT o_orderpriority, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/orders.parquet'
        """
    ).fetchall()
    con.close()
    by_grp = defaultdict(list)
    for g, t in rows:
        by_grp[g].append(t)

    def lower_median(xs):
        xs = sorted(xs)
        return xs[(len(xs) + 1) // 2 - 1]

    got = {r.grp: r for r in grouped_mad_two_pass(spark, sf_dir).collect()}
    assert set(got) == set(by_grp)
    for g, xs in by_grp.items():
        med = lower_median(xs)
        mad = lower_median([abs(x - med) for x in xs])
        assert got[g].n_rows == len(xs)
        assert got[g].median_cents == med
        assert got[g].mad_cents == mad


def test_event_burstiness_fano_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.forecast import event_burstiness_fano

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type, date_trunc('hour', ts), count(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    con.close()
    by_type = defaultdict(dict)
    for t, h, c in rows:
        by_type[t][h] = c
    got = {r.event_type: r for r in event_burstiness_fano(spark, sf_dir).collect()}
    assert set(got) == set(by_type)
    for t, hours in by_type.items():
        h0, h1 = min(hours), max(hours)
        n = int((h1 - h0).total_seconds() // 3600) + 1
        counts = [0] * n
        for h, c in hours.items():
            counts[int((h - h0).total_seconds() // 3600)] = c
        s, q = sum(counts), sum(c * c for c in counts)
        want = (1000 * (n * q - s * s)) // (n * s)
        assert got[t].n_hours == n
        assert got[t].n_events == s
        assert got[t].fano_permille == want
        # sanity: a random event stream should not read as ultra-regular
        assert got[t].fano_permille > 0


def test_rich_club_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.mining import (
        MAX_BASKET,
        RICH_CLUB_KS,
        rich_club_coefficient,
    )

    con = duckdb.connect()
    edges = con.execute(
        f"""
        WITH bk AS (
          SELECT l_orderkey, l_partkey FROM (
            SELECT l_orderkey, l_partkey,
                   count(*) OVER (PARTITION BY l_orderkey) AS basket_n
            FROM (SELECT DISTINCT l_orderkey, l_partkey
                  FROM '{sf_dir}/lineitem.parquet')
          ) WHERE basket_n <= {MAX_BASKET}
        )
        SELECT a.l_partkey, b.l_partkey
        FROM bk a JOIN bk b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        """
    ).fetchall()
    con.close()
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    got = {r.k: r for r in rich_club_coefficient(spark, sf_dir).collect()}
    assert set(got) == set(RICH_CLUB_KS)
    for k in RICH_CLUB_KS:
        nodes = {n for n, d in deg.items() if d > k}
        e_k = sum(1 for a, b in edges if a in nodes and b in nodes)
        r = got[k]
        assert r.n_nodes == len(nodes)
        assert r.n_edges == e_k
        if len(nodes) < 2:
            assert r.phi_permille is None
        else:
            assert r.phi_permille == (2000 * e_k) // (len(nodes) * (len(nodes) - 1))


def test_event_type_user_jaccard_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.advanced import event_type_user_jaccard

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT DISTINCT user_id, event_type FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    con.close()
    sets = defaultdict(set)
    for u, t in rows:
        sets[t].add(u)
    types = sorted(sets)
    got = {(r.ta, r.tb): r for r in event_type_user_jaccard(spark, sf_dir).collect()}
    assert set(got) == {
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    }
    for (a, b), r in got.items():
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        assert (r.n_a, r.n_b, r.inter) == (len(sets[a]), len(sets[b]), inter)
        assert r.jaccard_permille == (1000 * inter) // union


def test_recursive_cte_reach_matches_pure_python_bfs(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.graph import (
        REACH_DEPTH,
        TOP_LANES,
        recursive_cte_trade_reach,
    )

    con = duckdb.connect()
    lanes = con.execute(
        f"""
        WITH tw AS (
          SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
          FROM '{sf_dir}/lineitem.parquet' l
          JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
          JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
          JOIN '{sf_dir}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
          GROUP BY 1, 2
        )
        SELECT src, dst FROM (
          SELECT src, dst,
                 row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
          FROM tw
        ) WHERE rn <= {TOP_LANES}
        """
    ).fetchall()
    con.close()
    adj = defaultdict(list)
    for s, d in lanes:
        adj[s].append(d)
    dist = {0: 0}
    frontier = [0]
    for d in range(1, REACH_DEPTH + 1):
        nxt = []
        for n in frontier:
            for m in adj[n]:
                if m not in dist:
                    dist[m] = d
                    nxt.append(m)
        frontier = nxt
    got = {r.n_nationkey: r.dist for r in recursive_cte_trade_reach(spark, sf_dir).collect()}
    assert got == dist


def test_user_acquisition_and_lifetime_match_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.cohort import (
        user_acquisition_curve,
        user_lifetime_quartiles,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, epoch_us(ts) FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    con.close()
    first, last = {}, {}
    for u, t in rows:
        first[u] = min(first.get(u, t), t)
        last[u] = max(last.get(u, t), t)
    from datetime import date, timedelta

    days = defaultdict(int)
    for u, t in first.items():
        days[date(1970, 1, 1) + timedelta(days=t // 86_400_000_000)] += 1
    got = user_acquisition_curve(spark, sf_dir).collect()
    assert [r.day for r in got] == sorted(days)
    cum = 0
    for r in got:
        assert r.n_new_users == days[r.day]
        cum += r.n_new_users
        assert r.cum_users == cum
    assert cum == len(first)

    lifetimes = sorted(
        (last[u] // 1_000_000 // 86400) - (first[u] // 1_000_000 // 86400)
        for u in first
    )
    n = len(lifetimes)
    q = user_lifetime_quartiles(spark, sf_dir).collect()[0]
    assert q.n_users == n
    assert q.q1_days == lifetimes[-(-n // 4) - 1]
    assert q.median_days == lifetimes[-(-n // 2) - 1]
    assert q.q3_days == lifetimes[-(-3 * n // 4) - 1]


def test_open_orders_backlog_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.tpch_extra import open_orders_backlog

    con = duckdb.connect()
    iv = con.execute(
        f"""
        SELECT o.o_orderdate::DATE, max(l.l_shipdate)::DATE
        FROM '{sf_dir}/orders.parquet' o
        JOIN '{sf_dir}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
        """
    ).fetchall()
    con.close()
    from datetime import timedelta

    opened, closed = defaultdict(int), defaultdict(int)
    for o, c in iv:
        opened[o] += 1
        closed[c + timedelta(days=1)] += 1
    d0, d1 = min(opened | closed), max(opened | closed)
    got = open_orders_backlog(spark, sf_dir).collect()
    assert got[0].day == d0 and got[-1].day == d1
    assert len(got) == (d1 - d0).days + 1
    backlog = 0
    for r in got:
        assert r.n_opened == opened.get(r.day, 0)
        assert r.n_closed == closed.get(r.day, 0)
        backlog += r.n_opened - r.n_closed
        assert r.backlog == backlog
    assert backlog == 0  # every order eventually closes


def test_fk_fanout_profile_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.quality import (
        _FANOUT_EDGES,
        fk_fanout_profile,
    )

    got = {r.edge: r for r in fk_fanout_profile(spark, sf_dir).collect()}
    assert set(got) == {e[0] for e in _FANOUT_EDGES}
    con = duckdb.connect()
    for label, child, ckey, parent, pkey in _FANOUT_EDGES:
        pkeys = {
            r[0]
            for r in con.execute(
                f"SELECT {pkey} FROM '{sf_dir}/{parent}.parquet'"
            ).fetchall()
        }
        fan = defaultdict(int)
        n_children = 0
        for (k,) in con.execute(
            f"SELECT {ckey} FROM '{sf_dir}/{child}.parquet' WHERE {ckey} IS NOT NULL"
        ).fetchall():
            n_children += 1
            if k in pkeys:
                fan[k] += 1
        r = got[label]
        assert r.n_parents == len(pkeys)
        assert r.n_children == n_children
        assert r.n_referenced_parents == len(fan)
        assert r.referenced_permille == 1000 * len(fan) // len(pkeys)
        assert r.min_fanout == min(fan.values())
        assert r.max_fanout == max(fan.values())
        assert r.avg_fanout_permille == 1000 * sum(fan.values()) // len(fan)
    con.close()


def test_state_dwell_shares_match_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.scd import state_dwell_time_shares

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT user_id, epoch_us(ts), event_id, event_type
        FROM '{sf_dir}/events.parquet' ORDER BY user_id, 2, event_id
        """
    ).fetchall()
    con.close()
    by_user = defaultdict(list)
    for u, t, e, typ in rows:
        by_user[u].append((t, typ))
    dwell, n_iv = defaultdict(int), defaultdict(int)
    for u, evs in by_user.items():
        runs = []  # (type, start)
        for t, typ in evs:
            if not runs or runs[-1][0] != typ:
                runs.append((typ, t))
        for (typ, start), (_, nxt) in zip(runs, runs[1:]):
            dwell[typ] += nxt - start
            n_iv[typ] += 1
    total = sum(dwell.values())
    got = {r.event_type: r for r in state_dwell_time_shares(spark, sf_dir).collect()}
    assert set(got) == set(dwell)
    for typ, r in got.items():
        assert r.n_intervals == n_iv[typ]
        assert r.dwell_us == dwell[typ]
        assert r.dwell_share_permille == 1000 * dwell[typ] // total


def test_srm_and_repeat_intervals_match_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.llm.hashing import h32_sql
    from rdbms_metadata_manager_spark.queries.cohort import (
        LIFETIME_QS,
        ab_srm_check,
        repeat_purchase_intervals,
    )

    con = duckdb.connect()
    arms = con.execute(
        f"""
        SELECT {h32_sql("'mw:' || user_id::VARCHAR")} % 2
        FROM (SELECT DISTINCT user_id FROM '{sf_dir}/events.parquet')
        """
    ).fetchall()
    n_a = sum(1 for (a,) in arms if a == 0)
    n_b = len(arms) - n_a
    r = ab_srm_check(spark, sf_dir).collect()[0]
    chi2 = 1_000_000 * (n_a - n_b) ** 2 // (n_a + n_b)
    assert (r.n_a, r.n_b, r.chi2_micro) == (n_a, n_b, chi2)
    assert r.srm_detected == (chi2 > 3_841_459)

    orders = con.execute(
        f"SELECT o_custkey, o_orderdate::DATE, o_orderkey FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    con.close()
    by_cust = defaultdict(list)
    for c, d, k in orders:
        by_cust[c].append((d, k))
    gaps = []
    for c, os_ in by_cust.items():
        os_.sort()
        for (d0, _), (d1, _) in zip(os_, os_[1:]):
            gaps.append((d1 - d0).days)
    gaps.sort()
    n = len(gaps)
    q = repeat_purchase_intervals(spark, sf_dir).collect()[0]
    assert q.n_gaps == n
    want = [gaps[-(-num * n // den) - 1] for num, den in LIFETIME_QS]
    assert (q.q1_days, q.median_days, q.q3_days) == tuple(want)


def test_neyman_allocation_matches_pure_python(spark, sf_dir):
    import math

    from rdbms_metadata_manager_spark.llm.sampling import (
        NEYMAN_BUDGET,
        neyman_allocation_plan,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT c_mktsegment, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/customer.parquet'
        """
    ).fetchall()
    con.close()
    strata = defaultdict(list)
    for seg, x in rows:
        strata[seg].append(x)
    w = {
        seg: int(math.floor(math.sqrt(float(len(xs) * sum(v * v for v in xs) - sum(xs) ** 2))))
        for seg, xs in strata.items()
    }
    w_tot, n_tot = sum(w.values()), sum(len(xs) for xs in strata.values())
    got = {r.stratum: r for r in neyman_allocation_plan(spark, sf_dir).collect()}
    assert set(got) == set(strata)
    for seg, xs in strata.items():
        r = got[seg]
        assert r.n_pop == len(xs)
        assert r.w == w[seg]
        assert r.neyman_n == NEYMAN_BUDGET * w[seg] // w_tot
        assert r.proportional_n == NEYMAN_BUDGET * len(xs) // n_tot
    # the design property: total allocation is within |strata| of budget
    assert 0 <= NEYMAN_BUDGET - sum(r.neyman_n for r in got.values()) < len(got) + 1


def test_t_closeness_wide_products_do_not_wrap(spark, sf_dir, tmp_path):
    """ADVICE r5 #1 regression: with counts inflated so cnt*N exceeds
    int64 the Spark side must keep matching the HUGEINT oracle. True
    1e10-row fixtures don't fit a test; instead verify the widened
    expression class directly: DECIMAL(38,0) products of two ~1e10
    factors survive where the bigint product wraps."""
    big = 12_000_000_000  # 1.2e10; big*big ~ 1.44e20 >> int64 max
    df = spark.createDataFrame([(big, big)], "a long, b long")
    wide = df.select(
        (F.col("a").cast("decimal(38,0)") * F.col("b")).alias("p")
    ).collect()[0]
    assert int(wide.p) == big * big
    got = duckdb.sql(f"SELECT {big}::HUGEINT * {big} AS p").fetchone()[0]
    assert int(got) == big * big


def test_selfjoin_f2_matches_oracle_after_widening(spark, sf_dir):
    """ADVICE r5 #2: the widened F2 squares still hash-match."""
    from rdbms_metadata_manager_spark.queries.skew import _F2_SQL, selfjoin_size_estimate

    assert_matches_oracle(selfjoin_size_estimate(spark, sf_dir), _F2_SQL, sf_dir)


def test_bfs_adjacency_rewrite_matches_oracles(spark, sf_dir):
    """The adjacency-BFS rewrite (VERDICT r5 item 2) keeps both faces
    oracle-exact, and the early-exit can never clip a layer: every
    (node, dist) the unrolled oracle derives must still appear."""
    from rdbms_metadata_manager_spark.queries.mining import (
        _bfs_oracle,
        _diameter_oracle,
        bfs_levels_from_hub,
        diameter_double_sweep,
    )

    assert_matches_oracle(bfs_levels_from_hub(spark, sf_dir), _bfs_oracle(), sf_dir)
    assert_matches_oracle(
        diameter_double_sweep(spark, sf_dir), _diameter_oracle(), sf_dir
    )
