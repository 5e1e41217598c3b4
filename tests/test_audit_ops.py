"""Independent pure-Python references for the operational-audit and
graph batch (gini, duplicate payments, join-cardinality audit,
bipartite HITS), plus boundary fixtures for the 7-day duplicate
window."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from conftest import assert_matches_oracle


def test_gini_matches_pure_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        FROM '{sf_dir}/orders.parquet' GROUP BY o_custkey
        """
    ).fetchall()
    con.close()
    xs = sorted(v for (v,) in rows)
    n = len(xs)
    sx = sum(xs)
    six = sum(i * x for i, x in enumerate(xs, start=1))
    exp = (1000 * (2 * six - (n + 1) * sx)) // (n * sx)

    from rdbms_metadata_manager_spark.queries.inference import gini_revenue_exact

    row = gini_revenue_exact(spark, sf_dir).collect()[0]
    assert (row.n_customers, row.total_cents, row.gini_permille) == (n, sx, exp)


def test_duplicate_payments_match_pure_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT o_custkey, o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
               epoch_us(o_orderdate) // 1000000 // 86400
        FROM '{sf_dir}/orders.parquet'
        """
    ).fetchall()
    con.close()
    groups = defaultdict(list)
    for ck, ok, cents, day in rows:
        groups[(ck, cents)].append((day, ok))
    exp = set()
    for (ck, cents), members in groups.items():
        members.sort()
        for i, (d1, k1) in enumerate(members):
            for d2, k2 in members[i + 1 :]:
                if d2 - d1 <= 7:
                    exp.add((ck, cents, k1, k2, d2 - d1))

    from rdbms_metadata_manager_spark.queries.audit import (
        duplicate_payment_candidates,
    )

    got = {
        (r.o_custkey, r.amount_cents, r.orderkey_first, r.orderkey_second, r.day_gap)
        for r in duplicate_payment_candidates(spark, sf_dir).collect()
    }
    assert got == exp


def test_duplicate_payments_window_boundary_fixture(spark, tmp_path):
    """Exactly-7-day gaps are IN, 8-day gaps are OUT; same-day pairs
    emit once with the lower orderkey first; a 3-order cluster emits
    all qualifying pairs."""
    d = tmp_path / "dup"
    d.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * FROM (VALUES
          (10, 1, 'O', 99.99, TIMESTAMP '1995-03-01', '1-URGENT'),
          (11, 1, 'O', 99.99, TIMESTAMP '1995-03-08', '1-URGENT'),
          (12, 1, 'O', 99.99, TIMESTAMP '1995-03-09', '1-URGENT'),
          (20, 2, 'O', 50.00, TIMESTAMP '1995-03-01', '1-URGENT'),
          (21, 2, 'O', 50.00, TIMESTAMP '1995-03-01', '1-URGENT'),
          (30, 3, 'O', 10.00, TIMESTAMP '1995-03-01', '1-URGENT'),
          (31, 3, 'O', 10.01, TIMESTAMP '1995-03-01', '1-URGENT')
        ) AS t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority))
        TO '{d}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    from rdbms_metadata_manager_spark.queries.audit import (
        _DUP_PAY_SQL,
        duplicate_payment_candidates,
    )

    df = duplicate_payment_candidates(spark, str(d))
    assert_matches_oracle(df, _DUP_PAY_SQL, str(d))
    got = {
        (r.o_custkey, r.orderkey_first, r.orderkey_second, r.day_gap)
        for r in df.collect()
    }
    # cust1: 10->11 gap7 IN, 11->12 gap1 IN, 10->12 gap8 OUT;
    # cust2: same-day pair once; cust3: amounts differ -> none
    assert got == {(1, 10, 11, 7), (1, 11, 12, 1), (2, 20, 21, 0)}


def test_join_cardinality_matches_pure_python(spark, sf_dir):
    con = duckdb.connect()

    def counts(tbl, key):
        return Counter(
            dict(
                con.execute(
                    f"SELECT {key}, count(*) FROM '{sf_dir}/{tbl}.parquet'"
                    f" WHERE {key} IS NOT NULL GROUP BY 1"
                ).fetchall()
            )
        )

    lo = counts("lineitem", "l_orderkey")
    oo = counts("orders", "o_orderkey")
    oc = counts("orders", "o_custkey")
    cc = counts("customer", "c_custkey")
    con.close()

    from rdbms_metadata_manager_spark.queries.audit import join_cardinality_audit

    got = {r.join_name: r for r in join_cardinality_audit(spark, sf_dir).collect()}
    assert len(got) == 5

    def check(row, cl, cr):
        actual = sum(n * cr[k] for k, n in cl.items() if k in cr)
        n_l, n_r = sum(cl.values()), sum(cr.values())
        est = (n_l * n_r) // max(len(cl), len(cr))
        assert (row.n_left, row.d_left) == (n_l, len(cl))
        assert (row.n_right, row.d_right) == (n_r, len(cr))
        assert row.actual_rows == actual
        assert row.est_rows == est
        assert row.actual_vs_est_pm == (1000 * actual) // est

    check(got["lineitem_orders"], lo, oo)
    check(got["orders_customer"], oc, cc)


def test_bipartite_hits_matches_pure_python(spark, sf_dir):
    con = duckdb.connect()
    edges = set(
        con.execute(
            f"SELECT DISTINCT user_id, event_type FROM '{sf_dir}/events.parquet'"
        ).fetchall()
    )
    con.close()
    a1 = Counter(t for _, t in edges)
    h1 = defaultdict(int)
    for u, t in edges:
        h1[u] += a1[t]
    a2 = defaultdict(int)
    for u, t in edges:
        a2[t] += h1[u]

    from rdbms_metadata_manager_spark.queries.graph import (
        bipartite_hits_event_types,
    )

    got = bipartite_hits_event_types(spark, sf_dir).collect()
    assert len(got) == len(a1)
    for r in got:
        assert r.n_users == a1[r.event_type]
        assert r.paths3 == a2[r.event_type]
        assert r.paths3_per_user == a2[r.event_type] // a1[r.event_type]
    # ranking is by exact path counts, descending
    assert [r.paths3 for r in got] == sorted((r.paths3 for r in got), reverse=True)


def test_wilson_ci_matches_pure_python(spark, sf_dir):
    import math

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT p_brand, count(*),
               sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON l.l_partkey = p.p_partkey
        GROUP BY 1
        """
    ).fetchall()
    con.close()
    exp = {b: (int(n), int(r)) for b, n, r in rows}

    from rdbms_metadata_manager_spark.queries.inference import wilson_ci_return_rate

    got = wilson_ci_return_rate(spark, sf_dir).collect()
    assert len(got) == len(exp)
    z, z2 = 1.96, 3.8416
    for row in got:
        n, r = exp[row.p_brand]
        assert (row.n_items, row.n_returned) == (n, r)
        assert row.return_rate_pm == (1000 * r) // n
        p = r / n
        denom = 1.0 + z2 / n
        center = (p + z2 / (2.0 * n)) / denom
        half = (z / denom) * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
        assert abs(row.wilson_low - (center - half)) < 1e-12
        assert abs(row.wilson_high - (center + half)) < 1e-12
        assert 0.0 <= row.wilson_low <= row.wilson_high <= 1.0


def test_approx_percentile_audit_flags_and_exact_ticks(spark, sf_dir):
    con = duckdb.connect()
    ticks = sorted(
        t
        for (t,) in con.execute(
            f"SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
            f" FROM '{sf_dir}/lineitem.parquet'"
        ).fetchall()
    )
    con.close()
    n = len(ticks)

    from rdbms_metadata_manager_spark.queries.audit import (
        approx_percentile_rank_audit,
    )

    got = approx_percentile_rank_audit(spark, sf_dir).collect()
    assert [r.q_permille for r in got] == [100, 250, 500, 750, 900, 990]
    for r in got:
        assert r.n_rows == n
        # percentile_disc convention: smallest value with
        # cume_dist >= q, i.e. element at rank ceil(q*n)
        k = max(1, -(-r.q_permille * n // 1000))
        assert r.exact_tick == ticks[k - 1]
        assert r.rank_in_bound is True


def test_spc_individuals_matches_pure_python(spark, sf_dir):
    con = duckdb.connect()
    daily = sorted(
        con.execute(
            f"""
            SELECT epoch_us(o_orderdate) // 1000000 // 86400,
                   sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            FROM '{sf_dir}/orders.parquet' GROUP BY 1
            """
        ).fetchall()
    )
    con.close()
    xs = [x for _, x in daily]
    mrs = [abs(b - a) for a, b in zip(xs, xs[1:])]
    center = sum(xs) / len(xs)
    band = 2.66 * sum(mrs) / len(mrs)

    from rdbms_metadata_manager_spark.queries.audit import spc_individuals_chart

    got = spc_individuals_chart(spark, sf_dir).collect()
    assert len(got) == len(daily)
    n_out = 0
    for r, (day, x) in zip(got, daily):
        assert (r.day, r.revenue_cents) == (day, x)
        assert abs(r.center - center) < 1e-6
        assert abs(r.ucl - (center + band)) < 1e-6
        assert r.out_of_control == (x > center + band or x < center - band)
        n_out += r.out_of_control
    # the chart must actually discriminate: not all in, not all out
    assert 0 < n_out < len(got) or n_out == 0


def test_spc_single_day_has_null_band_no_flags(spark, tmp_path):
    """One subgroup -> no moving ranges -> NULL limits and FALSE
    flags on BOTH engines (not a division error)."""
    d = tmp_path / "spc1"
    d.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT i AS o_orderkey, i AS o_custkey, 'O' AS o_orderstatus,
                     100.0 + i AS o_totalprice,
                     TIMESTAMP '1995-06-01' AS o_orderdate,
                     '1-URGENT' AS o_orderpriority
              FROM range(1, 6) t(i))
        TO '{d}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    from rdbms_metadata_manager_spark.queries.audit import (
        _SPC_SQL,
        spc_individuals_chart,
    )

    df = spc_individuals_chart(spark, str(d))
    assert_matches_oracle(df, _SPC_SQL, str(d))
    row = df.collect()[0]
    assert row.ucl is None and row.lcl is None
    assert row.out_of_control is False


def test_abc_classes_match_pure_python(spark, sf_dir):
    con = duckdb.connect()
    rev = con.execute(
        f"""
        SELECT l_partkey,
               sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                   AS BIGINT))
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1
        """
    ).fetchall()
    con.close()
    order = sorted(rev, key=lambda t: (-t[1], t[0]))
    total = sum(r for _, r in order)
    cum = 0
    exp = {}
    for i, (pk, r) in enumerate(order, start=1):
        cum += r
        cls = "A" if 100 * cum <= 80 * total else ("B" if 100 * cum <= 95 * total else "C")
        exp[pk] = (r, i, cum, cls)

    from rdbms_metadata_manager_spark.queries.audit import abc_inventory_classes

    got = abc_inventory_classes(spark, sf_dir).collect()
    assert len(got) == len(exp)
    for row in got:
        r, i, cum, cls = exp[row.p_partkey]
        assert (row.revenue_cents, row.revenue_rank, row.cum_revenue_cents) == (
            r,
            i,
            cum,
        )
        assert row.abc_class == cls
    # all three classes must be populated on real data
    assert {r.abc_class for r in got} == {"A", "B", "C"}


def test_revenue_bridge_reconciles_exactly(spark, sf_dir):
    """The FP&A conservation law: for EVERY brand,
    price + volume + residual == delta, exactly (integers); brands
    missing a year carry the whole delta in the residual."""
    from rdbms_metadata_manager_spark.queries.audit import (
        revenue_bridge_decomposition,
    )

    got = revenue_bridge_decomposition(spark, sf_dir).collect()
    assert got, "bridge must produce brands at every SF"
    for r in got:
        eff = (r.price_effect_cents or 0) + (r.volume_effect_cents or 0)
        assert eff + r.mix_residual_cents == r.delta_cents
        assert r.delta_cents == r.rev1_cents - r.rev0_cents
        if r.q0 == 0 or r.q1 == 0:
            assert r.price_effect_cents is None
            assert r.mix_residual_cents == r.delta_cents


def test_revenue_bridge_one_year_brand_fixture(spark, tmp_path):
    """A brand that EXITS after year 0 and one that is NEW in year 1
    must both survive the full-outer pivot with NULL effects and an
    exactly-reconciling residual, cross-engine."""
    d = tmp_path / "bridge"
    d.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * FROM (VALUES
          (1, 1, 1, 1, 5.0, 100.0, 0.0, 0.0, 'N', 'O', TIMESTAMP '1996-05-01'),
          (2, 2, 1, 1, 3.0, 60.0, 0.0, 0.0, 'N', 'O', TIMESTAMP '1997-05-01'),
          (3, 3, 1, 1, 2.0, 50.0, 0.0, 0.0, 'N', 'O', TIMESTAMP '1996-05-01'),
          (4, 3, 1, 2, 4.0, 90.0, 0.0, 0.0, 'N', 'O', TIMESTAMP '1997-05-01')
        ) AS t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate))
        TO '{d}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT * FROM (VALUES
          (1, 'BRAND#EXIT'), (2, 'BRAND#NEW'), (3, 'BRAND#BOTH')
        ) AS t(p_partkey, p_brand))
        TO '{d}/part.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    from rdbms_metadata_manager_spark.queries.audit import (
        _BRIDGE_SQL,
        revenue_bridge_decomposition,
    )

    df = revenue_bridge_decomposition(spark, str(d))
    assert_matches_oracle(df, _BRIDGE_SQL, str(d))
    rows = {r.p_brand: r for r in df.collect()}
    assert rows["BRAND#EXIT"].price_effect_cents is None
    assert rows["BRAND#EXIT"].mix_residual_cents == -10000
    assert rows["BRAND#NEW"].mix_residual_cents == 6000
    both = rows["BRAND#BOTH"]
    assert (both.price_effect_cents or 0) + (
        both.volume_effect_cents or 0
    ) + both.mix_residual_cents == both.delta_cents


def test_harmonic_centrality_matches_pure_python_bfs(spark, sf_dir):
    """Independent BFS over the same top-2 trade lanes (depth 4):
    per-root reach counts and the integer-per-mille harmonic sums
    must match the recursive-CTE computation exactly."""
    con = duckdb.connect()
    lanes_rows = con.execute(
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
        ) WHERE rn <= 2
        """
    ).fetchall()
    nations = [
        k
        for (k,) in con.execute(
            f"SELECT n_nationkey FROM '{sf_dir}/nation.parquet'"
        ).fetchall()
    ]
    con.close()
    adj = defaultdict(list)
    for s, t in lanes_rows:
        adj[s].append(t)

    def bfs(root):
        dist = {root: 0}
        frontier = [root]
        for d in range(1, 5):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        return dist

    from rdbms_metadata_manager_spark.queries.graph import (
        harmonic_centrality_trade,
    )

    got = {r.n_nationkey: r for r in harmonic_centrality_trade(spark, sf_dir).collect()}
    assert set(got) == set(nations)
    for root in nations:
        dist = bfs(root)
        reached = [d for n, d in dist.items() if n != root]
        assert got[root].n_reached == len(reached)
        assert got[root].harmonic_x1000 == sum(1000 // d for d in reached)


def test_lsh_band_planner_matches_closed_form(spark, sf_dir):
    """p_catch must equal floor(1000*(1-(1-s^r)^b)) computed
    independently, the threshold must be (1/b)^(1/r), the curve must
    be monotone in s for every family, and exactly one family row set
    is flagged deployed."""
    from rdbms_metadata_manager_spark.llm.dedup import (
        MINHASH_BANDS,
        MINHASH_ROWS,
        lsh_band_planner,
    )

    got = lsh_band_planner(spark, sf_dir).collect()
    assert len(got) == 4 * 9
    by_family = defaultdict(list)
    for r in got:
        s = r.s_pm / 1000.0
        p = 1.0 - (1.0 - s**r.r) ** r.b
        assert abs(r.p_catch_pm - int(1000.0 * p)) <= 1  # float assoc slack
        assert abs(r.s_threshold - (1.0 / r.b) ** (1.0 / r.r)) < 1e-12
        assert r.deployed == (r.r == MINHASH_ROWS and r.b == MINHASH_BANDS)
        by_family[(r.r, r.b)].append((r.s_pm, r.p_catch_pm))
    for fam, pts in by_family.items():
        ps = [p for _, p in sorted(pts)]
        assert ps == sorted(ps), f"non-monotone S-curve for {fam}"
    assert sum(1 for r in got if r.deployed) == 9


def test_theil_sen_matches_pure_python(spark, sf_dir):
    con = duckdb.connect()
    daily = sorted(
        con.execute(
            f"""
            SELECT epoch_us(o_orderdate) // 1000000 // 86400,
                   sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            FROM '{sf_dir}/orders.parquet' GROUP BY 1
            """
        ).fetchall()
    )
    con.close()

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    slopes = sorted(
        trunc_div(1_000_000 * (r2 - r1), d2 - d1)
        for i, (d1, r1) in enumerate(daily)
        for d2, r2 in daily[i + 1 :]
    )
    n_pairs = len(slopes)
    med = slopes[-(-n_pairs // 2) - 1]  # percentile_disc(0.5): rank ceil(n/2)
    ics = sorted(1_000_000 * r - med * d for d, r in daily)
    ic = ics[-(-len(ics) // 2) - 1]

    from rdbms_metadata_manager_spark.queries.inference import theil_sen_daily_trend

    row = theil_sen_daily_trend(spark, sf_dir).collect()[0]
    assert (row.n_days, row.n_pairs) == (len(daily), n_pairs)
    assert row.slope_microcents_per_day == med
    assert row.intercept_microcents == ic


def test_survivorship_classes_partition_and_order(spark, sf_dir):
    """The three classes must exactly partition the scored corpus,
    kept must dominate dropped on both mean and median (by
    construction of keep-best), and every family contributes exactly
    one kept member."""
    from rdbms_metadata_manager_spark.llm.clustering import (
        dedup_clusters,
        dedup_survivorship_audit,
    )
    from rdbms_metadata_manager_spark.llm.curation import (
        quality_classifier_scores,
    )

    got = {r.doc_class: r for r in dedup_survivorship_audit(spark, sf_dir).collect()}
    n_scored = quality_classifier_scores(spark, sf_dir).count()
    cc = dedup_clusters(spark, sf_dir)
    n_fam_docs = cc.count()
    n_families = cc.select("cluster_id").distinct().count()
    assert sum(r.n_docs for r in got.values()) == n_scored
    assert got["kept"].n_docs == n_families
    assert got["dropped"].n_docs == n_fam_docs - n_families
    assert got["kept"].mean_score_milli >= got["dropped"].mean_score_milli
    assert got["kept"].median_score >= got["dropped"].median_score


def test_packing_bounds_match_pure_python(spark, sf_dir):
    con = duckdb.connect()
    lens = [
        n
        for (n,) in con.execute(
            f"SELECT len(string_split(text, ' ')) FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    con.close()

    from rdbms_metadata_manager_spark.llm.sampling import (
        PACK_LENGTHS,
        packing_bounds_curve,
    )

    got = {r.seq_len: r for r in packing_bounds_curve(spark, sf_dir).collect()}
    assert sorted(got) == PACK_LENGTHS
    total = sum(lens)
    for L in PACK_LENGTHS:
        capped = sum(min(n, L) for n in lens)
        r = got[L]
        assert r.n_docs == len(lens)
        assert r.total_tokens == total
        assert r.n_overflow_docs == sum(1 for n in lens if n > L)
        assert r.capped_tokens == capped
        assert r.min_bins == -(-capped // L)
        assert r.truncation_loss_pm == 1000 * (total - capped) // total
    # monotone: longer contexts lose less
    losses = [got[L].truncation_loss_pm for L in PACK_LENGTHS]
    assert losses == sorted(losses, reverse=True)


def test_ivf_nprobe_recall_monotone_and_saturating(spark, sf_dir):
    """Probing more cells only ADDS candidates: recall must be
    non-decreasing in nprobe, hit K cells (=|labels| at nprobe=8 on
    this 8-label corpus) means the ANN set IS the exact set ->
    recall exactly 1000; every hits count is bounded by n_queries*K."""
    from rdbms_metadata_manager_spark.llm.ivf import (
        PROBE_SWEEP,
        TOP_K,
        ivf_nprobe_recall_curve,
    )

    got = ivf_nprobe_recall_curve(spark, sf_dir).collect()
    assert [r.nprobe for r in got] == PROBE_SWEEP
    hits = [r.hits for r in got]
    assert hits == sorted(hits)
    for r in got:
        assert 0 <= r.hits <= r.n_queries * TOP_K
        assert r.recall_pm == 1000 * r.hits // (r.n_queries * TOP_K)
    # the sweep must discriminate: the tail probes strictly more of
    # the corpus than the head
    assert got[-1].recall_pm > got[0].recall_pm


def test_mann_kendall_matches_pure_python(spark, sf_dir):
    import math

    con = duckdb.connect()
    daily = sorted(
        con.execute(
            f"""
            SELECT epoch_us(o_orderdate) // 1000000 // 86400,
                   sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            FROM '{sf_dir}/orders.parquet' GROUP BY 1
            """
        ).fetchall()
    )
    con.close()
    rs = [r for _, r in daily]
    n = len(rs)
    s = sum(
        (0 if rs[j] == rs[i] else (1 if rs[j] > rs[i] else -1))
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(rs)
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values()
    )
    z = (s - (1 if s > 0 else -1 if s < 0 else 0)) / math.sqrt(var18 / 18.0)

    from rdbms_metadata_manager_spark.queries.inference import (
        mann_kendall_trend_test,
    )

    row = mann_kendall_trend_test(spark, sf_dir).collect()[0]
    assert (row.n_days, row.s_stat, row.var_s_x18) == (n, s, var18)
    assert abs(row.z_stat - z) < 1e-12


def test_capture_recapture_matches_pure_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, epoch_us(ts) // 1000000 // 86400"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    con.close()
    days = [d for _, d in rows]
    mid = (min(days) + max(days)) // 2
    u1 = {u for u, d in rows if d < mid}
    u2 = {u for u, d in rows if d >= mid}
    n_true = len(u1 | u2)
    chapman = ((len(u1) + 1) * (len(u2) + 1)) // (len(u1 & u2) + 1) - 1

    from rdbms_metadata_manager_spark.queries.inference import (
        capture_recapture_users,
    )

    row = capture_recapture_users(spark, sf_dir).collect()[0]
    assert (row.n_true, row.n1, row.n2, row.m_both) == (
        n_true,
        len(u1),
        len(u2),
        len(u1 & u2),
    )
    assert row.chapman_estimate == chapman
    diff = 1000 * (chapman - n_true)
    trunc = abs(diff) // n_true
    assert row.est_err_pm == (trunc if diff >= 0 else -trunc)


def test_runs_test_matches_pure_python(spark, sf_dir):
    import math

    con = duckdb.connect()
    daily = sorted(
        con.execute(
            f"""
            SELECT epoch_us(o_orderdate) // 1000000 // 86400,
                   sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            FROM '{sf_dir}/orders.parquet' GROUP BY 1
            """
        ).fetchall()
    )
    con.close()
    rs = sorted(r for _, r in daily)
    med = rs[-(-len(rs) // 2) - 1]  # percentile_disc(0.5)
    signs = [1 if r > med else 0 for _, r in daily if r != med]
    n = len(signs)
    n1, n0 = sum(signs), n - sum(signs)
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    e = 2.0 * n1 * n0 / n + 1.0
    z = (runs - e) / math.sqrt((e - 1.0) * (e - 2.0) / (n - 1.0))

    from rdbms_metadata_manager_spark.queries.inference import (
        wald_wolfowitz_runs_test,
    )

    row = wald_wolfowitz_runs_test(spark, sf_dir).collect()[0]
    assert (row.n_used, row.n_above, row.n_below, row.n_runs) == (n, n1, n0, runs)
    assert abs(row.expected_runs - e) < 1e-9
    assert abs(row.z_stat - z) < 1e-9
