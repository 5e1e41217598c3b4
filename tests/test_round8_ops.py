"""Round-8 streaming operators (VERDICT r7 items 3 and 4): the
mergeable-quantile sketch state and the watermarked MinHash-band
ingest dedup — oracle parity, multi-batch == one-shot equality,
batch-spec equality, redelivery exactly-once, and a corruption canary
proving the quantile band actually flags a broken state loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import assert_matches_oracle


# ---------------------------------------------------------------------------
# streaming_quantile_state
# ---------------------------------------------------------------------------


def _qk_base(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.base import load

    return load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"), F.col("l_extendedprice").alias("v")
    )


def test_streaming_quantile_matches_oracle(spark, sf_dir):
    from rdbms_metadata_manager_spark.streaming.sketch_state import (
        _STREAM_QUANTILE_SQL,
        streaming_quantile_state,
    )

    assert_matches_oracle(
        streaming_quantile_state(spark, sf_dir), _STREAM_QUANTILE_SQL, sf_dir
    )


def test_quantile_multibatch_equals_oneshot(spark, sf_dir):
    """Fold the table in three chunks through the same merge the
    stream runs, vs one compaction of everything: reports must be
    identical, and in the sub-capacity regime the STATE multisets
    must match exactly (no compaction fired, the state IS the data)."""
    from rdbms_metadata_manager_spark.streaming.sketch_state import (
        QK_CAPACITY,
        _compact_levels,
        quantile_report,
    )

    base = _qk_base(spark, sf_dir)
    lvl0 = base.select("flag", F.lit(0).alias("level"), "v")
    chunks = lvl0.randomSplit([1.0, 1.0, 1.0], seed=8)
    state = None
    for c in chunks:
        merged = c if state is None else state.unionByName(c)
        state = _compact_levels(merged)
    one_shot = _compact_levels(lvl0)

    multi = [tuple(r) for r in quantile_report(spark, base, state, 3).collect()]
    single = [tuple(r) for r in quantile_report(spark, base, one_shot, 3).collect()]
    assert multi == single
    assert all(r[-2] for r in multi), "approx_ok must hold both ways"

    max_per_key = (
        base.groupBy("flag").count().agg(F.max("count")).collect()[0][0]
    )
    if max_per_key <= QK_CAPACITY:  # sub-capacity ⇒ exact state equality
        def _multiset(df):
            return sorted(tuple(r) for r in df.collect())

        assert _multiset(state) == _multiset(one_shot) == _multiset(lvl0)


def test_quantile_weight_invariant(spark, sf_dir):
    """Σ 2^level over the state equals the input row count per key —
    the conservation law every merge/compaction must preserve."""
    from rdbms_metadata_manager_spark.streaming.sketch_state import _compact_levels

    base = _qk_base(spark, sf_dir)
    state = _compact_levels(base.select("flag", F.lit(0).alias("level"), "v"))
    got = {
        r["flag"]: r["w"]
        for r in state.groupBy("flag")
        .agg(F.sum(F.expr("shiftleft(1L, level)")).alias("w"))
        .collect()
    }
    want = {r["flag"]: r["count"] for r in base.groupBy("flag").count().collect()}
    assert got == want


def test_quantile_band_flags_corrupted_state(spark, sf_dir):
    """Canary: drop the bottom half of one key's state (a lost batch /
    poisoned merge) — approx_ok must go False for that key. Without
    this, the band could be so loose the flag never fires."""
    from rdbms_metadata_manager_spark.streaming.sketch_state import (
        _compact_levels,
        quantile_report,
    )

    base = _qk_base(spark, sf_dir)
    state = _compact_levels(base.select("flag", F.lit(0).alias("level"), "v"))
    med = base.filter(F.col("flag") == "A").agg(
        F.expr("percentile_approx(v, 0.5)")
    ).collect()[0][0]
    corrupted = state.filter(~((F.col("flag") == "A") & (F.col("v") < F.lit(med))))
    rows = {r["flag"]: r["approx_ok"] for r in quantile_report(spark, base, corrupted, 3).collect()}
    assert rows["A"] is False
    assert rows["N"] is True and rows["R"] is True


# ---------------------------------------------------------------------------
# stream_dedup_minhash_bands
# ---------------------------------------------------------------------------


def test_stream_minhash_matches_oracle(spark, sf_dir):
    from rdbms_metadata_manager_spark.streaming.minhash_ingest import (
        _render_oracle,
        stream_dedup_minhash_bands,
    )

    assert_matches_oracle(
        stream_dedup_minhash_bands(spark, sf_dir), _render_oracle(), sf_dir
    )


def test_stream_minhash_equals_batch_spec(spark, sf_dir):
    """The streamed ingest must equal the order-free batch spec —
    the equality that makes the incremental path trustworthy."""
    from rdbms_metadata_manager_spark.streaming.minhash_ingest import (
        stream_dedup_minhash_bands,
        stream_survivor_spec,
    )

    streamed = [r["doc_id"] for r in stream_dedup_minhash_bands(spark, sf_dir).collect()]
    spec = [r["doc_id"] for r in stream_survivor_spec(spark, sf_dir).collect()]
    assert streamed == spec
    assert len(streamed) > 0


def test_stream_minhash_redelivery_exactly_once(spark, sf_dir):
    """The fourth staged file re-delivers ~1/10 of the stream rows;
    n_files_ingested == 4 pins — via the checkpoint's committed source
    log, robust to the engine skipping a downstream-empty micro-batch
    (ADVICE r8 #4) — that the redelivery file was really admitted, and
    unique doc_ids prove dropDuplicatesWithinWatermark swallowed every
    retry before the band filter saw it."""
    from rdbms_metadata_manager_spark.streaming.minhash_ingest import (
        stream_dedup_minhash_bands,
    )

    rows = stream_dedup_minhash_bands(spark, sf_dir).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)), "a re-delivered doc survived twice"
    assert all(r["n_files_ingested"] == 4 for r in rows)


def test_stream_minhash_catches_near_dups_not_just_exact(spark, sf_dir):
    """The point of the face vs stream_dedup_exact_replay: at least
    one stream doc must be dropped by a BAND hit (corpus or
    first-claim), i.e. survivors ⊂ stream docs strictly."""
    from rdbms_metadata_manager_spark.llm.sampling import _split_bucket
    from rdbms_metadata_manager_spark.queries.base import load
    from rdbms_metadata_manager_spark.streaming.minhash_ingest import (
        stream_survivor_spec,
    )

    docs = load(spark, sf_dir, "documents")
    n_stream = docs.filter(
        (_split_bucket(F.col("doc_id")) >= 80)
        & (F.size(F.split(F.col("text"), " ")) >= 3)
    ).count()
    n_survivors = stream_survivor_spec(spark, sf_dir).count()
    assert 0 < n_survivors < n_stream


# ---------------------------------------------------------------------------
# round-8 batch operators: oracle parity + independent pure-Python refs
# ---------------------------------------------------------------------------


def _duck(sf_dir, sql, views=("events", "orders", "documents", "embeddings",
                              "customer", "nation", "lineitem")):
    import os

    import duckdb

    con = duckdb.connect()
    for t in views:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_kendall_tau_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.stats import (
        _KENDALL_SQL,
        kendall_tau_daily,
    )

    assert_matches_oracle(kendall_tau_daily(spark, sf_dir), _KENDALL_SQL, sf_dir)
    daily = _duck(
        sf_dir,
        """SELECT count(*)::BIGINT, sum(CAST(floor(value*100+0.5) AS BIGINT))::BIGINT
           FROM events GROUP BY epoch_us(ts)//1000000//86400""",
    )
    nc = nd = 0
    for i in range(len(daily)):
        for j in range(i + 1, len(daily)):
            dx = daily[i][0] - daily[j][0]
            dy = daily[i][1] - daily[j][1]
            if dx * dy > 0:
                nc += 1
            elif dx * dy < 0 and dx != 0 and dy != 0:
                nd += 1
    row = kendall_tau_daily(spark, sf_dir).collect()[0]
    assert (row["concordant"], row["discordant"]) == (nc, nd)
    n0 = len(daily) * (len(daily) - 1) // 2
    from collections import Counter

    n1 = sum(t * (t - 1) // 2 for t in Counter(x for x, _ in daily).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(y for _, y in daily).values())
    assert (row["tie_pairs_x"], row["tie_pairs_y"]) == (n1, n2)
    import math

    want = (nc - nd) / math.sqrt((n0 - n1) * (n0 - n2))
    assert abs(row["tau_b"] - want) < 1e-12


def test_brown_forsythe_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.stats import (
        _bf_oracle,
        brown_forsythe_priority,
    )

    assert_matches_oracle(brown_forsythe_priority(spark, sf_dir), _bf_oracle(), sf_dir)
    rows = _duck(
        sf_dir,
        "SELECT o_orderpriority, CAST(floor(o_totalprice*100+0.5) AS BIGINT) FROM orders",
    )
    from collections import defaultdict

    groups = defaultdict(list)
    for g, c in rows:
        groups[g].append(c)
    devs = []
    for g, xs in groups.items():
        xs.sort()
        med = xs[(len(xs) + 1) // 2 - 1]  # lower median, rank ceil(n/2)
        devs.extend((g, abs(x - med)) for x in xs)
    n = len(devs)
    k = len(groups)
    s = sum(d for _, d in devs)
    ss = sum(d * d for _, d in devs)
    import math

    tb = 0.0
    for g in ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"):
        gd = [d for gg, d in devs if gg == g]
        if gd:
            tb += (float(sum(gd)) * float(sum(gd))) / len(gd)
    want = ((tb - float(s) * float(s) / n) / (k - 1)) / ((float(ss) - tb) / (n - k))
    got = brown_forsythe_priority(spark, sf_dir).collect()[0]
    assert got["n_orders"] == n and got["k_groups"] == k
    assert math.isclose(got["bf_stat"], want, rel_tol=1e-9)


def test_mcnemar_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.llm.curation import (
        _MCNEMAR_SQL,
        mcnemar_scorer_disagreement,
        quality_scorer_agreement,
    )

    assert_matches_oracle(
        mcnemar_scorer_disagreement(spark, sf_dir), _MCNEMAR_SQL, sf_dir
    )
    cells = quality_scorer_agreement(spark, sf_dir).collect()[0]
    b, c = cells["rule_only"], cells["clf_only"]
    got = mcnemar_scorer_disagreement(spark, sf_dir).collect()[0]
    assert (got["b_rule_only"], got["c_clf_only"]) == (b, c)
    if b + c > 0:
        assert got["chi2_pm"] == (1000 * (b - c) * (b - c)) // (b + c)
        d = abs(b - c)
        want_cc = 0 if d <= 1 else (1000 * (d - 1) * (d - 1)) // (b + c)
        assert got["chi2_cc_pm"] == want_cc


def test_rolling_median_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.forecast import (
        _ROLL_MEDIAN_SQL,
        rolling_median_daily_revenue,
    )

    assert_matches_oracle(
        rolling_median_daily_revenue(spark, sf_dir), _ROLL_MEDIAN_SQL, sf_dir
    )
    daily = dict(
        _duck(
            sf_dir,
            """SELECT epoch_us(o_orderdate)//1000000//86400,
                      sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT))::BIGINT
               FROM orders GROUP BY 1""",
        )
    )
    got = {r["d"]: (r["n_days_in_window"], r["median_cents"])
           for r in rolling_median_daily_revenue(spark, sf_dir).collect()}
    assert set(got) == set(daily)
    for d in daily:
        win = sorted(v for dd, v in daily.items() if d - 7 < dd <= d)
        assert got[d] == (len(win), win[(len(win) + 1) // 2 - 1])


def test_aqp_estimator_identities(spark, sf_dir):
    """The estimate must equal N_h*Σsample/n_h exactly, the realized
    error must be the exact per-mille, and the deterministic sample
    must be ~10% (binomial 6-sigma band)."""
    from rdbms_metadata_manager_spark.queries.skew import (
        _aqp_oracle,
        aqp_stratified_estimate,
    )

    assert_matches_oracle(aqp_stratified_estimate(spark, sf_dir), _aqp_oracle(), sf_dir)
    rows = aqp_stratified_estimate(spark, sf_dir).collect()
    tot_full = sum(r["n_orders"] for r in rows)
    tot_sampled = sum(r["n_sampled"] for r in rows)
    p = tot_sampled / tot_full
    assert abs(p - 0.10) < 6 * (0.1 * 0.9 / tot_full) ** 0.5
    for r in rows:
        if r["n_sampled"] and r["true_total_cents"]:
            assert r["err_pm"] == (
                1000 * abs(r["est_total_cents"] - r["true_total_cents"])
            ) // r["true_total_cents"]


def test_hubness_matches_numpy(spark, sf_dir):
    import numpy as np

    import hashlib

    from rdbms_metadata_manager_spark.llm.similarity import (
        _HUBNESS_SQL,
        HUB_K,
        HUB_SAMPLE_Q,
        ann_hubness_audit,
    )

    assert_matches_oracle(ann_hubness_audit(spark, sf_dir), _HUBNESS_SQL, sf_dir)
    raw = _duck(sf_dir, "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id")
    ids = np.array([r[0] for r in raw])
    M = np.array([r[1] for r in raw], dtype=np.float64)
    norms = np.linalg.norm(M, axis=1)
    cos = (M @ M.T) / np.outer(norms, norms)
    np.fill_diagonal(cos, -np.inf)
    # queries = the deterministic md5 sample (at sf0.001, 500 ≤
    # HUB_SAMPLE_Q, so this is the whole corpus: the sub-capacity
    # regime where sampled hubness IS the full audit)
    by_md5 = sorted(
        range(len(ids)),
        key=lambda j: (hashlib.md5(str(int(ids[j])).encode()).hexdigest(), ids[j]),
    )
    qidx = by_md5[:HUB_SAMPLE_Q]
    assert len(qidx) == len(ids), "sf0.001 must exercise the sub-capacity regime"
    occ = {int(i): 0 for i in ids}
    for qi in qidx:
        # rank by (-cos, vec_id): stable top-K with the same tie-break
        order = sorted(range(len(ids)), key=lambda j: (-cos[qi, j], ids[j]))
        for j in order[:HUB_K]:
            occ[int(ids[j])] += 1
    from collections import Counter

    want = Counter(occ.values())
    got = {r["k_occ"]: r["n_vectors"] for r in ann_hubness_audit(spark, sf_dir).collect()}
    assert got == dict(want)
    assert sum(k * v for k, v in got.items()) == HUB_K * len(qidx)


def test_watermark_audit_matches_pure_python(spark, sf_dir):
    import hashlib

    from rdbms_metadata_manager_spark.streaming.events_batch import (
        _wm_audit_sql,
        WM_DELAYS_S,
        WM_JITTER_S,
        WM_SHARDS,
        watermark_lateness_audit,
    )

    assert_matches_oracle(
        watermark_lateness_audit(spark, sf_dir), _wm_audit_sql(), sf_dir
    )
    rows = _duck(
        sf_dir,
        "SELECT event_id, user_id, epoch_us(ts)//1000000 FROM events",
    )
    def jit(eid):
        return int(hashlib.md5(f"arr:{eid}".encode()).hexdigest()[:8], 16) % WM_JITTER_S

    shards = {}
    for eid, uid, tsec in rows:
        shards.setdefault(uid % WM_SHARDS, []).append((tsec + jit(eid), eid, tsec))
    late = {d: 0 for d in WM_DELAYS_S}
    for evs in shards.values():
        evs.sort()
        runmax = None
        for _, _, tsec in evs:
            if runmax is not None:
                for d in WM_DELAYS_S:
                    if tsec < runmax - d:
                        late[d] += 1
            runmax = tsec if runmax is None else max(runmax, tsec)
    got = {r["delay_s"]: r["n_late"] for r in watermark_lateness_audit(spark, sf_dir).collect()}
    assert got == late
    lates = [late[d] for d in sorted(late)]
    assert lates == sorted(lates, reverse=True), "late counts must be monotone in delay"


def test_dsir_resample_invariants(spark, sf_dir):
    """Boundary-counting conservation: total copies == floor(W/stride)
    boundaries that land inside some doc's weight interval == W//stride
    (offset 0, last boundary at W excluded iff stride divides W —
    handled by the exact cumulative comparison below)."""
    from rdbms_metadata_manager_spark.llm.curation import (
        _RESAMPLE_SQL,
        dsir_importance_weights,
        dsir_systematic_resample,
    )

    assert_matches_oracle(
        dsir_systematic_resample(spark, sf_dir), _RESAMPLE_SQL, sf_dir
    )
    wts = [
        (r["doc_id"], r["avg_token_ratio_fp"])
        for r in dsir_importance_weights(spark, sf_dir).collect()
    ]
    wts.sort()
    W = sum(w for _, w in wts)
    n = len(wts)
    stride = max(1, W // max(1, n // 5))
    cum = 0
    want = {}
    for doc_id, w in wts:
        prev = cum
        cum += w
        copies = cum // stride - prev // stride
        if copies >= 1:
            want[doc_id] = copies
    got = {r["doc_id"]: r["n_copies"] for r in dsir_systematic_resample(spark, sf_dir).collect()}
    assert got == want
    assert sum(got.values()) == W // stride


def test_cochran_q_matches_pure_python(spark, sf_dir):
    from rdbms_metadata_manager_spark.llm.curation import (
        _COCHRAN_SQL,
        cochran_q_scorer_battery,
    )

    assert_matches_oracle(
        cochran_q_scorer_battery(spark, sf_dir), _COCHRAN_SQL, sf_dir
    )
    got = cochran_q_scorer_battery(spark, sf_dir).collect()[0]
    c = [got["keeps_rule"], got["keeps_clf"], got["keeps_len"]]
    t = sum(c)
    # ΣR_i² from the three pairwise agreements is not available here;
    # verify the Q identity on the oracle's own sums instead
    rows = _duck(sf_dir, _COCHRAN_SQL)
    assert [
        (r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows
    ] == [tuple(got)]
    # sanity: Q must be positive when the keep counts differ this much
    assert got["q_pm"] is not None and got["q_pm"] > 0
    assert max(c) - min(c) > 0


def test_cusum_alarms_on_planted_drift(spark, tmp_path):
    """Planted level shift: 20 baseline-rate days, then 20 days at
    2.5x the rate. The chart must alarm upward, never downward, and
    the whole fold must match a pure-Python replay exactly."""
    import duckdb

    from rdbms_metadata_manager_spark.queries.forecast import (
        _CUSUM_CHART_SQL,
        CUSUM_BASE_DAYS,
        CUSUM_K_DIV,
        cusum_control_chart,
    )

    d = str(tmp_path)
    rows = []
    eid = 0
    rates = [20] * 20 + [50] * 20
    for day, rate in enumerate(rates):
        for i in range(rate):
            eid += 1
            rows.append(
                f"({eid}, TIMESTAMP '2024-01-01 00:00:00'"
                f" + INTERVAL {day} DAY + INTERVAL {i} MINUTE,"
                f" {i % 7}, 'click', 1.0, '{{}}')"
            )
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT * FROM (VALUES {", ".join(rows)})
            AS t(event_id, ts, user_id, event_type, value, props))
            TO '{d}/events.parquet' (FORMAT PARQUET)"""
    )
    con.close()

    got = cusum_control_chart(spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_alarms_up"] >= 1 and r["n_alarms_down"] == 0
    assert r["first_alarm_day"] is not None

    # pure-Python replay of the integer recursion
    daily = [(day, rate) for day, rate in enumerate(rates)]
    n_base = CUSUM_BASE_DAYS
    s_base = sum(x for _, x in daily[:n_base])
    k, h = s_base // CUSUM_K_DIV, s_base
    cp = cm = nup = ndn = first = mcp = mcm = 0
    day0 = daily[0][0]
    import datetime

    epoch_day = (datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)).days
    for day, x in daily[n_base:]:
        e = n_base * x - s_base
        cpr = max(0, cp + e - k)
        cmr = max(0, cm - e - k)
        up, dn = cpr > h, cmr > h
        cp = 0 if up else cpr
        cm = 0 if dn else cmr
        nup += up
        ndn += dn
        if first == 0 and (up or dn):
            first = epoch_day + day
        mcp, mcm = max(mcp, cpr), max(mcm, cmr)
    assert (r["n_alarms_up"], r["n_alarms_down"]) == (nup, ndn)
    assert r["first_alarm_day"] == first
    assert (r["max_cusum_up"], r["max_cusum_down"]) == (mcp, mcm)
    # and the DuckDB oracle agrees on the same staged table
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    orows = con.execute(_CUSUM_CHART_SQL).fetchall()
    con.close()
    assert [tuple(x) for x in got] == [tuple(x) for x in orows]
