"""Round-9 exact-invariance and degenerate-edge battery: each new
statistic has a mathematical invariance (rank/affine/scale/shift) that
the EXACT integer kernels must honour to the bit, plus a non-empty
degenerate regime (one-sided split, k = 1, n < 3, single source, all
ties) where the NULL guards — not crashes, not divide-by-zero — are
the contract. Every synthetic corpus is also oracle-parity-checked,
so the guards are proven engine-identical, not just present."""

from __future__ import annotations

import datetime

import pytest

from conftest import assert_matches_oracle

BASE_DAY = 19000


def _ts(day: int, i: int = 0) -> datetime.datetime:
    return datetime.datetime.utcfromtimestamp(day * 86400 + i)


def _is_weekend(day: int) -> bool:
    return (day + 3) % 7 >= 5


# single-FILE parquet (pyarrow), not Spark's directory layout: these
# corpora feed assert_matches_oracle, and DuckDB's reader needs the
# same path to be a file like the real testdata sf dirs
def _write_single(d: str, name: str, table):
    import os

    import pyarrow.parquet as pq

    os.makedirs(d, exist_ok=True)
    pq.write_table(table, f"{d}/{name}.parquet")


def _write_orders(spark, d: str, rows):
    import pyarrow as pa

    _write_single(
        d,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array([ok for ok, _, _ in rows], pa.int64()),
                "o_custkey": pa.array([1] * len(rows), pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(rows)),
                "o_totalprice": pa.array([float(tp) for _, tp, _ in rows]),
                "o_orderdate": pa.array(
                    [_ts(day) for _, _, day in rows], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["3-MEDIUM"] * len(rows)),
            }
        ),
    )


def _write_events(spark, d: str, rows):
    import pyarrow as pa

    _write_single(
        d,
        "events",
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [_ts(day, j % 80000) for j, (day, _, _) in enumerate(rows)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([uid for _, uid, _ in rows], pa.int64()),
                "event_type": pa.array([et for _, _, et in rows]),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
    )


def _write_documents(spark, d: str, rows):
    import pyarrow as pa

    _write_single(
        d,
        "documents",
        pa.table(
            {
                "doc_id": pa.array([i for i, _, _, _ in rows], pa.int64()),
                "text": pa.array([t for _, t, _, _ in rows]),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array([s for _, _, s, _ in rows]),
                "n_chars": pa.array([n for _, _, _, n in rows], pa.int64()),
            }
        ),
    )


def _days(n: int, weekend: bool):
    out, day = [], BASE_DAY
    while len(out) < n:
        if _is_weekend(day) == weekend:
            out.append(day)
        day += 1
    return out


def _mixed_order_rows(scale: float = 1.0):
    rows = []
    k = 0
    for day in _days(30, True) + _days(40, False):
        for p in (11.25, 47.50, 98.75):
            rows.append((k, p * scale + (k % 5), day))
            k += 1
    return rows


def test_cvm_is_rank_invariant(spark, tmp_path):
    """CvM depends only on the joint ranking: tripling every price
    (exact in cents) leaves t_cvm_micro identical to the bit."""
    from rdbms_metadata_manager_spark.queries.distshift import (
        _CVM_SQL,
        cramer_von_mises_weekend,
    )

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    _write_orders(spark, d1, _mixed_order_rows(1.0))
    _write_orders(spark, d2, [(k, p * 3, day) for k, p, day in _mixed_order_rows(1.0)])
    r1 = cramer_von_mises_weekend(spark, d1).collect()[0]
    r2 = cramer_von_mises_weekend(spark, d2).collect()[0]
    assert r1["t_cvm_micro"] is not None
    assert tuple(r1) == tuple(r2)
    assert_matches_oracle(cramer_von_mises_weekend(spark, d1), _CVM_SQL, d1)


def test_cvm_and_bhattacharyya_null_on_one_sided_corpus(spark, tmp_path):
    """A corpus with ZERO weekend orders is non-empty but one-sided:
    both two-sample statistics must yield the guarded NULL — engine-
    identically (oracle parity on the same synthetic dir)."""
    from rdbms_metadata_manager_spark.queries.distshift import (
        _BHATT_SQL,
        _CVM_SQL,
        bhattacharyya_weekend_overlap,
        cramer_von_mises_weekend,
    )

    d = str(tmp_path)
    _write_orders(spark, d, [(i, 25.0 + i, day) for i, day in enumerate(_days(40, False))])
    r = cramer_von_mises_weekend(spark, d).collect()[0]
    assert r["n_weekend"] == 0 and r["t_cvm_micro"] is None
    r = bhattacharyya_weekend_overlap(spark, d).collect()[0]
    assert r["bc_micro"] is None and r["hellinger_sq_micro"] is None
    assert_matches_oracle(cramer_von_mises_weekend(spark, d), _CVM_SQL, d)
    assert_matches_oracle(bhattacharyya_weekend_overlap(spark, d), _BHATT_SQL, d)


def test_bhattacharyya_is_symmetric(spark, tmp_path):
    """BC(p, q) = BC(q, p): mirroring every order across the
    weekend/weekday split (same band profile, sides swapped) preserves
    bc_micro exactly — each term's a·b product is unchanged."""
    from rdbms_metadata_manager_spark.queries.distshift import (
        bhattacharyya_weekend_overlap,
    )

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    we, wd = _days(30, True), _days(30, False)
    prices_a = [10.0] * 20 + [30_000.0] * 10
    prices_b = [10.0] * 5 + [30_000.0] * 25
    rows1 = [(i, p, we[i % 30]) for i, p in enumerate(prices_a)] + [
        (100 + i, p, wd[i % 30]) for i, p in enumerate(prices_b)
    ]
    rows2 = [(i, p, wd[i % 30]) for i, p in enumerate(prices_a)] + [
        (100 + i, p, we[i % 30]) for i, p in enumerate(prices_b)
    ]
    _write_orders(spark, d1, rows1)
    _write_orders(spark, d2, rows2)
    r1 = bhattacharyya_weekend_overlap(spark, d1).collect()[0]
    r2 = bhattacharyya_weekend_overlap(spark, d2).collect()[0]
    assert r1["bc_micro"] == r2["bc_micro"] is not None
    assert (r1["n_weekend"], r1["n_weekday"]) == (r2["n_weekday"], r2["n_weekend"])


def test_ljung_box_is_affine_invariant_and_null_on_short_series(spark, tmp_path):
    """Autocorrelations are invariant under x → a·x + b: tripling
    every day's event count (a = 3) reproduces every ρ_k and Q to the
    BIT (the scaled integer covariances share the same true quotient,
    and IEEE division is correctly rounded). A 7-day series (n ≤
    LB_LAGS + 1) yields the guarded NULLs."""
    from rdbms_metadata_manager_spark.queries.distshift import (
        LB_LAGS,
        ljung_box_daily_events,
    )

    base = []
    counts = [11, 14, 9, 17, 12, 8, 15, 13, 10, 16, 12, 9]
    for j, c in enumerate(counts):
        base.append((BASE_DAY + j, c))
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    _write_events(spark, d1, [(day, i, "A") for day, c in base for i in range(c)])
    _write_events(spark, d2, [(day, i, "A") for day, c in base for i in range(3 * c)])
    r1 = ljung_box_daily_events(spark, d1).collect()[0]
    r2 = ljung_box_daily_events(spark, d2).collect()[0]
    assert r1["q_lb"] is not None
    for k in range(1, LB_LAGS + 1):
        assert r1[f"rho_{k}"] == r2[f"rho_{k}"]
    assert r1["q_lb"] == r2["q_lb"]

    d3 = str(tmp_path / "short")
    _write_events(
        spark, d3, [(BASE_DAY + j, i, "A") for j in range(7) for i in range(5 + j)]
    )
    r = ljung_box_daily_events(spark, d3).collect()[0]
    assert r["n_days"] == 7 and r["q_lb"] is None and r["rho_1"] is None


def test_page_all_tied_is_exact_null_and_single_type_guard(spark, tmp_path):
    """All-tied weeks (every type equal every week): every doubled
    midrank is k + 1, so L2 = E[L2] exactly and z = 0.0 — the exact
    centre of the null. A single event type (k = 1) → NULL z."""
    from rdbms_metadata_manager_spark.queries.distshift import (
        page_trend_weekly_events,
    )

    d1 = str(tmp_path / "tied")
    rows = []
    for wk in range(10):
        day = BASE_DAY + 7 * wk - (BASE_DAY % 7)
        for et in ("A", "B", "C"):
            rows.extend((day, i, et) for i in range(7))
    _write_events(spark, d1, rows)
    r = page_trend_weekly_events(spark, d1).collect()[0]
    assert r["l2_stat"] == r["e_l2_stat"]
    assert r["z_stat"] == 0.0

    d2 = str(tmp_path / "single")
    _write_events(
        spark, d2, [(BASE_DAY + j, i, "A") for j in range(30) for i in range(4)]
    )
    r = page_trend_weekly_events(spark, d2).collect()[0]
    assert r["k_types"] == 1 and r["z_stat"] is None


def test_grubbs_shift_invariance_and_short_series_guard(spark, tmp_path):
    """Adding a constant $50 order to EVERY day shifts the mean but
    not the deviations or the variance: the flagged day, dev_scaled,
    and G survive (G to float tolerance — its operands change even
    though the real value does not). n = 2 days → NULL G, row kept."""
    from rdbms_metadata_manager_spark.queries.distshift import (
        _grubbs_oracle,
        grubbs_outlier_daily_revenue,
    )

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    base = [(j, 100.0 + 7 * (j % 5), BASE_DAY + j) for j in range(20)]
    base.append((99, 3000.0, BASE_DAY + 9))
    _write_orders(spark, d1, base)
    shifted = base + [(200 + j, 50.0, BASE_DAY + j) for j in range(20)]
    _write_orders(spark, d2, shifted)
    r1 = grubbs_outlier_daily_revenue(spark, d1).collect()[0]
    r2 = grubbs_outlier_daily_revenue(spark, d2).collect()[0]
    assert r1["outlier_epoch_day"] == r2["outlier_epoch_day"] == BASE_DAY + 9
    assert r1["dev_scaled"] == r2["dev_scaled"]
    assert r2["g_stat"] == pytest.approx(r1["g_stat"], rel=1e-12)

    d3 = str(tmp_path / "short")
    _write_orders(spark, d3, [(0, 10.0, BASE_DAY), (1, 99.0, BASE_DAY + 1)])
    r = grubbs_outlier_daily_revenue(spark, d3).collect()[0]
    assert r["n_days"] == 2 and r["g_stat"] is None
    assert_matches_oracle(
        grubbs_outlier_daily_revenue(spark, d3), _grubbs_oracle(), d3
    )


def test_wasserstein_shift_invariance_and_single_source_zero(spark, tmp_path):
    """Shifting EVERY document length by +1000 chars translates both
    CDFs together: every per-source W1 is unchanged exactly. A
    single-source corpus IS the corpus distribution → W1 = 0."""
    from rdbms_metadata_manager_spark.llm.drift import (
        _WASSERSTEIN_SQL,
        wasserstein_source_length_drift,
    )

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    lens = {"A": [100, 150, 150, 220], "B": [90, 300, 310, 500], "C": [100, 100]}
    rows = [
        (i * 10 + j, "x", s, ln)
        for i, (s, ls) in enumerate(sorted(lens.items()))
        for j, ln in enumerate(ls)
    ]
    _write_documents(spark, d1, rows)
    _write_documents(spark, d2, [(i, t, s, ln + 1000) for i, t, s, ln in rows])
    r1 = {r["source"]: r["w1_len_micro"] for r in wasserstein_source_length_drift(spark, d1).collect()}
    r2 = {r["source"]: r["w1_len_micro"] for r in wasserstein_source_length_drift(spark, d2).collect()}
    assert r1 == r2 and any(v > 0 for v in r1.values())

    d3 = str(tmp_path / "mono")
    _write_documents(spark, d3, [(i, "x", "only", 100 + 13 * i) for i in range(12)])
    rows3 = wasserstein_source_length_drift(spark, d3).collect()
    assert len(rows3) == 1 and rows3[0]["w1_len_micro"] == 0
    assert_matches_oracle(
        wasserstein_source_length_drift(spark, d3), _WASSERSTEIN_SQL, d3
    )


def test_rbo_tail_blind_below_depth(spark, tmp_path):
    """RBO@D reads only the two top-D lists: adding 30 documents that
    rank below depth 20 in BOTH orderings reproduces the whole
    20-row report byte-for-byte."""
    from rdbms_metadata_manager_spark.llm.drift import rbo_scorer_rankings

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    # doc i: i+30 one-char tokens → chars/tokens both rank by i
    head = [(i, "a " * (i + 30) + "a", "s", 0) for i in range(25)]
    tail = [(100 + i, "b b", "s", 0) for i in range(30)]  # 3 chars, 2 tokens
    _write_documents(spark, d1, head)
    _write_documents(spark, d2, head + tail)
    r1 = [tuple(r) for r in rbo_scorer_rankings(spark, d1).collect()]
    r2 = [tuple(r) for r in rbo_scorer_rankings(spark, d2).collect()]
    assert r1 == r2
    assert r1[-1][3] > 0


def test_vocab_gini_replication_invariance_and_single_token(spark, tmp_path):
    """Gini is a share statistic: replicating the whole corpus
    (every frequency ×2) leaves gini_micro and top1_pm exactly
    unchanged (⌊2x/2y⌋ = ⌊x/y⌋). A one-token vocabulary is perfectly
    equal → gini exactly 0."""
    from rdbms_metadata_manager_spark.llm.drift import (
        _VOCAB_GINI_SQL,
        vocab_gini_concentration,
    )

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    texts = ["big big big rare1", "big mid mid rare2", "big big mid"]
    rows = [(i, t, "s", 0) for i, t in enumerate(texts)]
    _write_documents(spark, d1, rows)
    _write_documents(
        spark, d2, rows + [(10 + i, t, "s", 0) for i, t in enumerate(texts)]
    )
    r1 = vocab_gini_concentration(spark, d1).collect()[0]
    r2 = vocab_gini_concentration(spark, d2).collect()[0]
    assert r1["gini_micro"] == r2["gini_micro"] is not None
    assert r1["top1_pm"] == r2["top1_pm"]
    assert r2["n_tokens"] == 2 * r1["n_tokens"]

    d3 = str(tmp_path / "one")
    _write_documents(spark, d3, [(0, "same same same same", "s", 0)])
    r = vocab_gini_concentration(spark, d3).collect()[0]
    assert (r["n_vocab"], r["gini_micro"], r["top1_pm"]) == (1, 0, 1000)
    assert_matches_oracle(vocab_gini_concentration(spark, d3), _VOCAB_GINI_SQL, d3)
