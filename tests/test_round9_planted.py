"""Planted-effect validation for the round-9 statistics (the standing
bar set by VERDICT r8 item 3): oracle parity proves the engines agree;
these prove each statistic MEASURES what it claims, on tiny
deterministic synthetic corpora with a known signal or a known null.
Directional assertions use wide margins; exact-value assertions use
closed forms derived in the docstrings."""

from __future__ import annotations

import datetime
import hashlib
import math

BASE_DAY = 19000  # epoch day well past 1970 (engine-neutral)


def _ts(day: int, i: int = 0) -> datetime.datetime:
    return datetime.datetime.utcfromtimestamp(day * 86400 + i)


def _is_weekend(day: int) -> bool:
    return (day + 3) % 7 >= 5


def _write_orders(spark, d: str, rows):
    """rows: list of (orderkey, totalprice_dollars, day)."""
    data = [(ok, 1, "O", float(tp), _ts(day), "3-MEDIUM") for ok, tp, day in rows]
    spark.createDataFrame(
        data, "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).write.parquet(f"{d}/orders.parquet")


def _write_events(spark, d: str, rows):
    """rows: list of (day, user_id, event_type)."""
    data = [
        (j, _ts(day, j % 80000), uid, et, 1.0, "{}")
        for j, (day, uid, et) in enumerate(rows)
    ]
    spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).write.parquet(f"{d}/events.parquet")


def _write_documents(spark, d: str, rows):
    """rows: list of (doc_id, text, source, n_chars)."""
    data = [(i, t, "en", s, n) for i, t, s, n in rows]
    spark.createDataFrame(
        data, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")


def _days(n: int, weekend: bool):
    out, day = [], BASE_DAY
    while len(out) < n:
        if _is_weekend(day) == weekend:
            out.append(day)
        day += 1
    return out


def test_planted_cvm_separation_vs_null(spark, tmp_path):
    """Fully separated regimes (weekend $100, weekday $10): at the
    lower support point ΔF = 1, so T = n·m²/N² (here 100·200²/300² ≈
    44.4) — t_cvm_micro ≈ 44e6. Identical regimes: every prefix has
    m·A = n·B exactly, T ≡ 0."""
    from rdbms_metadata_manager_spark.queries.distshift import (
        cramer_von_mises_weekend,
    )

    d1 = str(tmp_path / "sep")
    rows = [(i, 100.0, day) for i, day in enumerate(_days(100, True))] + [
        (1000 + i, 10.0, day) for i, day in enumerate(_days(200, False))
    ]
    _write_orders(spark, d1, rows)
    got = cramer_von_mises_weekend(spark, d1).collect()[0]
    assert (got["n_weekend"], got["n_weekday"]) == (100, 200)
    n, m = 100, 200
    assert got["t_cvm_micro"] == (1_000_000 * m * (n * m) ** 2) // (n * m * (n + m) ** 2)
    assert got["t_cvm_micro"] > 10_000_000

    d2 = str(tmp_path / "null")
    rows = []
    for j, day in enumerate(_days(50, True) + _days(50, False)):
        for p in (10.0, 20.0, 30.0):  # identical mix on every day
            rows.append((j * 10 + int(p), p, day))
    _write_orders(spark, d2, rows)
    got = cramer_von_mises_weekend(spark, d2).collect()[0]
    assert got["t_cvm_micro"] == 0


def test_planted_bhattacharyya_identical_vs_disjoint(spark, tmp_path):
    """Identical band histograms → BC = 1 (minus ≤ n_bands micro
    floors); disjoint band support → BC = 0, Hellinger² = 1."""
    from rdbms_metadata_manager_spark.queries.distshift import (
        BHATT_BAND_W,
        bhattacharyya_weekend_overlap,
    )

    d1 = str(tmp_path / "same")
    prices = [10.0, 30_000.0, 60_000.0, 90_000.0]
    rows = []
    for j, day in enumerate(_days(40, True) + _days(40, False)):
        for p in prices:
            rows.append((j * 10 + int(p) % 7, p, day))
    _write_orders(spark, d1, rows)
    got = bhattacharyya_weekend_overlap(spark, d1).collect()[0]
    assert got["n_bands"] == len({int(p * 100) // BHATT_BAND_W for p in prices})
    assert got["bc_micro"] >= 1_000_000 - got["n_bands"]

    d2 = str(tmp_path / "disjoint")
    rows = [(i, 100_000.0, day) for i, day in enumerate(_days(50, True))] + [
        (1000 + i, 10.0, day) for i, day in enumerate(_days(50, False))
    ]
    _write_orders(spark, d2, rows)
    got = bhattacharyya_weekend_overlap(spark, d2).collect()[0]
    assert got["bc_micro"] == 0
    assert got["hellinger_sq_micro"] == 1_000_000


def test_planted_ljung_box_alternating_vs_hash_noise(spark, tmp_path):
    """A period-2 series (counts 10, 50, 10, 50, …) has |ρ_k| ≈ 1 at
    every lag → Q explodes; md5-jitter counts are serially unrelated
    → Q stays an order of magnitude smaller."""
    from rdbms_metadata_manager_spark.queries.distshift import (
        ljung_box_daily_events,
    )

    d1 = str(tmp_path / "alt")
    rows = []
    for j in range(60):
        cnt = 10 if j % 2 == 0 else 50
        rows.extend((BASE_DAY + j, i, "A") for i in range(cnt))
    _write_events(spark, d1, rows)
    alt = ljung_box_daily_events(spark, d1).collect()[0]
    assert alt["n_days"] == 60
    assert alt["rho_1"] < -0.9 and alt["rho_2"] > 0.9
    assert alt["q_lb"] > 100

    d2 = str(tmp_path / "noise")
    rows = []
    for j in range(60):
        cnt = 10 + int(hashlib.md5(f"lb:{j}".encode()).hexdigest()[:4], 16) % 7
        rows.extend((BASE_DAY + j, i, "A") for i in range(cnt))
    _write_events(spark, d2, rows)
    noise = ljung_box_daily_events(spark, d2).collect()[0]
    assert noise["q_lb"] < alt["q_lb"] / 10


def test_planted_page_perfect_consistency(spark, tmp_path):
    """Every week ranks the types exactly as the global totals do
    (10 < 20 < 30, tie-free): doubled midranks are 2r, so
    L2 = 2nΣj² = 28n, E[L2] = 24n, z = sqrt(2n) exactly."""
    from rdbms_metadata_manager_spark.queries.distshift import (
        page_trend_weekly_events,
    )

    d = str(tmp_path)
    rows = []
    n_weeks = 18
    for wk in range(n_weeks):
        day = BASE_DAY + 7 * wk - (BASE_DAY % 7)  # one full week per block
        for et, cnt in (("A", 10), ("B", 20), ("C", 30)):
            rows.extend((day, i, et) for i in range(cnt))
    _write_events(spark, d, rows)
    got = page_trend_weekly_events(spark, d).collect()[0]
    assert (got["n_weeks"], got["k_types"]) == (n_weeks, 3)
    assert got["l2_stat"] == 28 * n_weeks
    assert got["e_l2_stat"] == 24 * n_weeks
    assert got["z_stat"] == math.sqrt(2 * n_weeks)
    assert got["z_stat"] > 5


def test_planted_grubbs_flags_injected_spike(spark, tmp_path):
    """30 quiet $100 days plus one $5000 day: the spike day is the
    arg-max deviation and G far exceeds any quiet-series value."""
    from rdbms_metadata_manager_spark.queries.distshift import (
        grubbs_outlier_daily_revenue,
    )

    d = str(tmp_path)
    spike_day = BASE_DAY + 13
    rows = [(j, 100.0, BASE_DAY + j) for j in range(31) if BASE_DAY + j != spike_day]
    rows.append((99, 5000.0, spike_day))
    _write_orders(spark, d, rows)
    got = grubbs_outlier_daily_revenue(spark, d).collect()[0]
    assert got["n_days"] == 31
    assert got["outlier_epoch_day"] == spike_day
    assert got["day_revenue_cents"] == 500_000
    assert got["g_stat"] > 4


def test_planted_wasserstein_exact_shift(spark, tmp_path):
    """Source A all length 100, source B all length 200, equal sizes:
    each source's CDF differs from the corpus CDF by exactly 1/2 over
    the 100-char gap → W1 = 50 chars = 50_000_000 micro for BOTH."""
    from rdbms_metadata_manager_spark.llm.drift import (
        wasserstein_source_length_drift,
    )

    d = str(tmp_path)
    rows = [(i, "x", "A", 100) for i in range(40)] + [
        (100 + i, "x", "B", 200) for i in range(40)
    ]
    _write_documents(spark, d, rows)
    got = {r["source"]: r for r in wasserstein_source_length_drift(spark, d).collect()}
    assert got["A"]["w1_len_micro"] == 50_000_000
    assert got["B"]["w1_len_micro"] == 50_000_000
    assert got["A"]["n_docs"] == got["B"]["n_docs"] == 40


def test_planted_rbo_identical_vs_disjoint(spark, tmp_path):
    """Identical byte/token rankings → overlap d at every depth and
    RBO@20 = Σ(1−p)p^(d−1) = 1 − 0.9²⁰ ≈ 0.8784 (micro floors lose
    < 20). Head-disjoint rankings (one-huge-token docs top the char
    order, many-tiny-token docs top the token order) → RBO ≡ 0."""
    from rdbms_metadata_manager_spark.llm.drift import (
        RBO_DEPTH,
        RBO_P,
        rbo_scorer_rankings,
    )

    d1 = str(tmp_path / "same")
    # doc i: i one-char tokens → chars = 2i−1, tokens = i; both
    # rankings order docs identically (descending i)
    rows = [(i, "a " * i + "a", "s", 0) for i in range(1, 31)]
    _write_documents(spark, d1, rows)
    got = rbo_scorer_rankings(spark, d1).collect()
    # mirror the kernel's exact float DAG (w·x/d with x = d — the
    # multiply-then-divide is NOT an algebraic no-op in IEEE)
    want = sum(
        math.floor(
            1_000_000.0 * ((1.0 - RBO_P) * RBO_P ** (dd - 1)) * float(dd) / float(dd)
        )
        for dd in range(1, RBO_DEPTH + 1)
    )
    assert all(r["overlap"] == r["depth"] for r in got)
    assert got[-1]["rbo_upto_micro"] == want
    assert got[-1]["rbo_upto_micro"] > 878_000

    d2 = str(tmp_path / "disjoint")
    rows = [(i, "x" * (1000 + i), "s", 0) for i in range(20)] + [
        (100 + i, "a " * (100 + i), "s", 0) for i in range(20)
    ]
    _write_documents(spark, d2, rows)
    got = rbo_scorer_rankings(spark, d2).collect()
    assert all(r["overlap"] == 0 and r["rbo_upto_micro"] == 0 for r in got)


def test_planted_vocab_gini_uniform_vs_dominant(spark, tmp_path):
    """A perfectly uniform vocabulary has Gini exactly 0; one token
    carrying 1000 of 1009 occurrences scores the closed-form
    (2·10045 − 11·1009)/(10·1009) ≈ 0.891."""
    from rdbms_metadata_manager_spark.llm.drift import vocab_gini_concentration

    d1 = str(tmp_path / "uniform")
    rows = [(i, f"tok{i:03d}a tok{i:03d}b", "s", 0) for i in range(50)]
    _write_documents(spark, d1, rows)
    got = vocab_gini_concentration(spark, d1).collect()[0]
    assert (got["n_vocab"], got["n_tokens"]) == (100, 100)
    assert got["gini_micro"] == 0

    d2 = str(tmp_path / "dominant")
    rows = [(0, " ".join(["big"] * 1000), "s", 0)] + [
        (1 + i, f"rare{i}", "s", 0) for i in range(9)
    ]
    _write_documents(spark, d2, rows)
    got = vocab_gini_concentration(spark, d2).collect()[0]
    assert (got["n_vocab"], got["n_tokens"]) == (10, 1009)
    sif = sum(i + 1 for i in range(9)) + 10 * 1000
    assert got["gini_micro"] == (1_000_000 * (2 * sif - 11 * 1009)) // (10 * 1009)
    assert got["gini_micro"] > 800_000
    assert got["top1_pm"] == (1000 * 1000) // 1009
