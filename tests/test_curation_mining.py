"""Unit + plan tests for the curation (chunk dedup / quality gate /
BM25) and mining (co-purchase pairs / triangles / drift) operators.
Oracle parity is covered by test_oracle_parity.py; these tests pin the
SEMANTICS (non-vacuity, known-answer synthetic graphs) and the plan
shapes that make them scale."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from rdbms_metadata_manager_spark.llm import curation
from rdbms_metadata_manager_spark.queries import mining, quality
from rdbms_metadata_manager_spark.queries.base import load


def _write_documents(tmp_path, texts):
    df = pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_chunk_dedup_flags_shared_passage(spark, tmp_path):
    shared = " ".join(f"w{i}" for i in range(curation.CHUNK_WORDS))
    uniq_a = " ".join(f"a{i}" for i in range(curation.CHUNK_WORDS))
    uniq_b = " ".join(f"b{i}" for i in range(curation.CHUNK_WORDS))
    # docs 1 and 2 open with the SAME 16-word chunk (boundary-aligned);
    # doc 3 is entirely unique.
    d = _write_documents(tmp_path, [f"{shared} {uniq_a}", f"{shared} {uniq_b}", uniq_a[::-1]])
    rows = {r["doc_id"]: r for r in curation.dedup_chunk_ratio(spark, d).collect()}
    assert rows[1]["dup_chunks"] == 1 and rows[1]["n_chunks"] == 2
    assert rows[2]["dup_chunks"] == 1
    assert rows[3]["dup_chunks"] == 0 and rows[3]["dup_pm"] == 0
    assert rows[1]["dup_pm"] == 500


def test_chunk_rewrite_keeps_first_and_empties_exact_dup(spark, tmp_path):
    shared = " ".join(f"w{i}" for i in range(curation.CHUNK_WORDS))
    uniq_a = " ".join(f"a{i}" for i in range(curation.CHUNK_WORDS))
    uniq_b = " ".join(f"b{i}" for i in range(curation.CHUNK_WORDS))
    # doc 1 owns the shared chunk (first occurrence), doc 2 loses it,
    # doc 3 is a verbatim copy of doc 1 and must come back empty,
    # doc 4 is untouched and must reconstruct byte-identically.
    d = _write_documents(
        tmp_path,
        [f"{shared} {uniq_a}", f"{shared} {uniq_b}", f"{shared} {uniq_a}", uniq_b[::-1]],
    )
    rows = {r["doc_id"]: r for r in curation.chunk_dedup_rewrite(spark, d).collect()}
    assert rows[1]["removed_chunks"] == 0 and rows[1]["clean_text"] == f"{shared} {uniq_a}"
    assert rows[2]["removed_chunks"] == 1 and rows[2]["clean_text"] == uniq_b
    assert rows[3]["removed_chunks"] == 2 and rows[3]["clean_text"] == ""
    assert rows[4]["removed_chunks"] == 0 and rows[4]["clean_text"] == uniq_b[::-1]


def test_chunk_rewrite_identity_and_conservation_on_testdata(spark, sf_dir):
    out = curation.chunk_dedup_rewrite(spark, sf_dir).cache()
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # untouched docs reconstruct byte-identically (single-space corpus)
    mismatch = (
        out.filter(F.col("removed_chunks") == 0)
        .join(docs, "doc_id")
        .filter(F.col("clean_text") != F.col("text"))
        .count()
    )
    assert mismatch == 0
    # non-vacuous on the planted near-dups at every SF (31 docs lose
    # chunks at sf0.001, 37 at sf0.01); fully-emptied exact dups are
    # pinned by the crafted-corpus test (they exist at sf>=0.01 but
    # not sf0.001).
    removed = out.agg(F.sum("removed_chunks").alias("r")).collect()[0]["r"]
    assert removed > 0
    out.unpersist()


def test_scorer_agreement_cells_match_the_two_scorers(spark, sf_dir):
    """The fused one-pass confusion table must equal the join of the
    two standalone scorers, and kappa_pm must match a Python
    recomputation from the same cells."""
    gate = curation.quality_filter_gate(spark, sf_dir).select("doc_id", "keep")
    clf = curation.quality_classifier_scores(spark, sf_dir).select("doc_id", "accepted")
    j = gate.join(clf, "doc_id").collect()
    a = sum(1 for r in j if r.keep and r.accepted)
    b = sum(1 for r in j if r.keep and not r.accepted)
    c = sum(1 for r in j if not r.keep and r.accepted)
    d = sum(1 for r in j if not r.keep and not r.accepted)
    row = curation.quality_scorer_agreement(spark, sf_dir).collect()[0]
    assert (row.both_keep, row.rule_only, row.clf_only, row.both_drop) == (a, b, c, d)
    assert row.n_docs == a + b + c + d
    den = (a + b) * (b + d) + (a + c) * (c + d)
    knum = 2 * (a * d - b * c)
    sign = -1 if knum < 0 else 1
    assert row.kappa_pm == sign * (1000 * abs(knum) // den)
    assert row.agree_pm == (a + d) * 1000 // (a + b + c + d)


def test_kappa_sign_split_matches_python_on_crafted_cells(spark):
    """Negative kappa is where Spark's truncating div and DuckDB's
    flooring // can diverge — the sign-split must make both equal the
    Python sign * (1000*|num|) // den on every quadrant mix."""
    import duckdb

    cases = [
        (0, 2, 2, 0),   # perfect disagreement: kappa = -1000
        (2, 0, 0, 2),   # perfect agreement: +1000
        (1, 1, 1, 1),   # chance: 0
        (5, 1, 3, 2),   # negative non-integer kappa
        (7, 2, 1, 9),   # positive non-integer kappa
        (3, 0, 0, 0),   # degenerate margin: den = 0 -> NULL
    ]
    for a, b, c, d in cases:
        n = a + b + c + d
        pdf = pd.DataFrame(
            {"n_docs": [n], "both_keep": [a], "rule_only": [b],
             "clf_only": [c], "both_drop": [d]}
        ).astype("int64")
        got = curation._kappa_projection(spark.createDataFrame(pdf)).collect()[0].kappa_pm
        den = (a + b) * (b + d) + (a + c) * (c + d)
        knum = 2 * (a * d - b * c)
        want = None if den == 0 else (-1 if knum < 0 else 1) * (1000 * abs(knum) // den)
        assert got == want, (a, b, c, d, got, want)
        # and the DuckDB oracle's kappa arithmetic agrees cell-for-cell
        dk = duckdb.sql(
            f"""SELECT CASE WHEN ({a}::HUGEINT + {b}) * ({b}::HUGEINT + {d})
                        + ({a}::HUGEINT + {c}) * ({c}::HUGEINT + {d}) = 0 THEN NULL
                 ELSE (CASE WHEN {a}::HUGEINT * {d} < {b}::HUGEINT * {c} THEN -1 ELSE 1 END
                       * ((2000 * abs({a}::HUGEINT * {d} - {b}::HUGEINT * {c}))
                          // (({a}::HUGEINT + {b}) * ({b}::HUGEINT + {d})
                              + ({a}::HUGEINT + {c}) * ({c}::HUGEINT + {d}))))::BIGINT END"""
        ).fetchone()[0]
        assert dk == want, (a, b, c, d, dk, want)


def test_chunk_dedup_nonvacuous_on_testdata(spark, sf_dir):
    agg = (
        curation.dedup_chunk_ratio(spark, sf_dir)
        .agg(F.sum("dup_chunks").alias("d"), F.sum("n_chunks").alias("n"))
        .collect()[0]
    )
    assert agg["n"] > 0 and 0 <= agg["d"] <= agg["n"]


def test_quality_gate_keeps_and_drops(spark, sf_dir):
    rows = curation.quality_filter_gate(spark, sf_dir).collect()
    kept = [r for r in rows if r["keep"]]
    dropped = [r for r in rows if not r["keep"]]
    assert kept and dropped, "gate must be non-vacuous on the testdata"
    allowed = {"", "n_words", "word_len", "dominance", "stopword"}
    assert {r["first_fail"] for r in rows} <= allowed
    for r in rows:
        assert r["keep"] == (r["first_fail"] == "")


def test_bm25_rank_contract(spark, sf_dir):
    rows = curation.bm25_keyword_search(spark, sf_dir).collect()
    by_term: dict[str, list] = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    assert set(by_term) == set(curation.BM25_TERMS)
    for term, rs in by_term.items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score_num"] / r["score_den"] for r in rs]
        assert scores == sorted(scores, reverse=True), term
        assert all(r["tf"] >= 1 and r["score_num"] > 0 and r["score_den"] > 0 for r in rs)


def test_triangles_known_graph(spark, tmp_path):
    # order 1 buys {1,2,3} -> one triangle; order 2 buys {3,4} -> one
    # extra edge, no new triangle. 4 nodes, 4 edges, 1 triangle.
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 1, 2, 2, 2],
            "l_partkey": [1, 2, 3, 3, 4, 4],  # duplicate (2,4) membership collapses
        }
    )
    pq.write_table(pa.Table.from_pandas(li), str(tmp_path / "lineitem.parquet"))
    row = mining.copurchase_triangles(spark, str(tmp_path)).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (4, 4, 1)


def test_copurchase_pairs_topk_plan_and_bounds(spark, sf_dir):
    df = mining.copurchase_part_pairs(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= mining.TOP_PAIRS
    counts = [r["n_orders"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["part_a"] < r["part_b"] for r in rows)
    # the final top-k must compile to TakeOrderedAndProject, not a global sort
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_drift_shares_are_permille(spark, sf_dir):
    rows = mining.drift_event_type_shares(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["early_pm"] <= 1000 and 0 <= r["late_pm"] <= 1000
        assert r["drift_pm"] == abs(r["early_pm"] - r["late_pm"])


def test_dq_expectations_all_pass_on_testdata(spark, sf_dir):
    rows = {r["check_name"]: r for r in quality.dq_expectations_orders(spark, sf_dir).collect()}
    assert len(rows) == len(quality._ORDER_CHECKS)
    assert all(r["passed"] for r in rows.values()), rows


def test_dq_expectations_flag_bad_rows(spark, tmp_path):
    bad = pd.DataFrame(
        {
            "o_orderkey": [1, 1, 3],  # duplicate key
            "o_custkey": pd.array([1, None, 3], dtype="Int64"),  # null FK
            "o_orderstatus": ["O", "X", "F"],  # out-of-domain status
            "o_totalprice": [10.0, -5.0, 20.0],  # non-positive price
            # micros, not pandas' default nanos — the session reads
            # TIMESTAMP(NANOS) as raw BIGINT (see base.load).
            "o_orderdate": pd.to_datetime(["1995-06-01", "1990-01-01", "1996-01-01"]).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT", "", "2-HIGH"],  # blank priority
        }
    )
    pq.write_table(pa.Table.from_pandas(bad), str(tmp_path / "orders.parquet"))
    rows = {r["check_name"]: r for r in quality.dq_expectations_orders(spark, str(tmp_path)).collect()}
    expect_fail = {
        "orderkey_unique": 1,
        "custkey_complete": 1,
        "status_in_domain": 1,
        "totalprice_positive": 1,
        "orderdate_in_range": 1,
        "priority_complete": 1,
    }
    for name, metric in expect_fail.items():
        assert rows[name]["metric"] == metric and not rows[name]["passed"], name
    assert rows["row_count_positive"]["passed"]


def test_dq_referential_integrity_intact_and_broadcasts_tiny_dims(spark, sf_dir):
    df = quality.dq_referential_integrity(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == len(quality._FK_EDGES)
    assert all(r["intact"] and r["orphan_rows"] == 0 for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_dq_referential_detects_orphans(spark, tmp_path):
    # minimal star: one nation row missing its region -> exactly the
    # nation->region edge reports 1 orphan, everything else intact.
    tables = {
        "region": pd.DataFrame({"r_regionkey": [0]}),
        "nation": pd.DataFrame({"n_nationkey": [0, 1], "n_regionkey": [0, 9]}),
        "customer": pd.DataFrame({"c_custkey": [1], "c_nationkey": [0]}),
        "supplier": pd.DataFrame({"s_suppkey": [1], "s_nationkey": [0]}),
        "part": pd.DataFrame({"p_partkey": [1]}),
        "orders": pd.DataFrame({"o_orderkey": [1], "o_custkey": [1]}),
        "lineitem": pd.DataFrame(
            {"l_orderkey": [1], "l_partkey": [1], "l_suppkey": [1]}
        ),
    }
    for name, df in tables.items():
        pq.write_table(pa.Table.from_pandas(df), str(tmp_path / f"{name}.parquet"))
    rows = {r["fk_edge"]: r for r in quality.dq_referential_integrity(spark, str(tmp_path)).collect()}
    assert rows["nation.n_regionkey->region"]["orphan_rows"] == 1
    assert not rows["nation.n_regionkey->region"]["intact"]
    assert all(r["intact"] for k, r in rows.items() if k != "nation.n_regionkey->region")


def test_ols_fit_exact_line_and_flat_noise(spark):
    """y = 2x + 5 in kilodollar units (slope lands at 2000 $/day)
    must fit with r2 = 1000 per-mille; a constant series has slope 0
    and an undefined (NULL) R^2."""
    from rdbms_metadata_manager_spark.queries.forecast import _ols_fit

    line = [("LINE", x, 2 * x + 5) for x in range(10)]
    flat = [("FLAT", x, 100) for x in range(10)]
    daily = spark.createDataFrame(line + flat, "c_mktsegment string, x long, y long")
    got = {r.c_mktsegment: (r.slope_usd_per_day, r.r2_permille) for r in _ols_fit(daily).collect()}
    assert got["LINE"] == (2000, 1000), got
    # constant series: zero slope; R^2 undefined (zero variance) -> NULL
    assert got["FLAT"] == (0, None), got


def test_acf_report_alternating_and_linear_series(spark):
    """A perfect period-2 series (0,10,0,10,...) has r = -1 at odd
    lags and r = +1 at even lags (signed r^2 per-mille = ∓1000); a
    constant series has zero variance at every lag -> NULL."""
    from rdbms_metadata_manager_spark.queries.forecast import MAX_LAG, _acf_report

    alt = spark.createDataFrame(
        [(i, 10 * (i % 2)) for i in range(40)], "day_idx long, x long"
    )
    got = {r.lag: r.acf_r2_permille_signed for r in _acf_report(alt).collect()}
    assert set(got) == set(range(1, MAX_LAG + 1))
    for lag, r2 in got.items():
        assert r2 == (1000 if lag % 2 == 0 else -1000), (lag, r2)

    flat = spark.createDataFrame([(i, 7) for i in range(40)], "day_idx long, x long")
    assert all(
        r.acf_r2_permille_signed is None for r in _acf_report(flat).collect()
    )


def test_association_rules_confidence_consistency(spark, sf_dir):
    """Every reported rule must satisfy the definitional inequalities:
    conf <= 1000, co >= MIN_SUPPORT, and lift consistent with the
    reported confidences (lift = conf_ab * n_baskets / deg_b up to
    integer flooring)."""
    from rdbms_metadata_manager_spark.queries.mining import MIN_SUPPORT, association_rules_lift

    rows = association_rules_lift(spark, sf_dir).collect()
    assert rows, "no rules at min support"
    for r in rows:
        assert r.co >= MIN_SUPPORT
        assert 0 < r.conf_ab_permille <= 1000
        assert 0 < r.conf_ba_permille <= 1000
        assert r.lift_permille > 0


def test_score_calibration_bins_partition_and_consistency(spark, sf_dir):
    """Bins must partition the corpus (doc counts sum to the gate's
    row count) and each bin's kept count must equal the gate verdicts
    of the docs scored into it."""
    from rdbms_metadata_manager_spark.llm.curation import (
        quality_filter_gate,
        score_calibration_bins,
    )

    bins = score_calibration_bins(spark, sf_dir).collect()
    gate = quality_filter_gate(spark, sf_dir).collect()
    assert sum(r.n_docs for r in bins) == len(gate)
    assert sum(r.n_kept for r in bins) == sum(1 for r in gate if r.keep)
    for r in bins:
        assert 0 <= r.n_kept <= r.n_docs
        assert r.keep_rate_permille == (1000 * r.n_kept) // r.n_docs


def test_benford_known_digits_and_zero_filter(spark, tmp_path):
    """Crafted lineitem with hand-computable first digits; values
    below 1 (first digit 0) must be excluded from the distribution."""
    li = pd.DataFrame(
        {
            "l_extendedprice": [1234.5, 19.0, 250.0, 2.5, 999.99, 0.5],
            "l_quantity": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        }
    )
    pq.write_table(pa.Table.from_pandas(li), str(tmp_path / "lineitem.parquet"))
    rows = quality.benford_digit_audit(spark, str(tmp_path)).collect()
    price = {r.digit: r for r in rows if r.measure == "l_extendedprice"}
    qty = {r.digit: r for r in rows if r.measure == "l_quantity"}
    # 0.5 floors to 0 and is dropped: 5 price rows remain
    assert {d: r.n for d, r in price.items()} == {1: 2, 2: 2, 9: 1}
    assert price[1].observed_permille == 400 and price[9].observed_permille == 200
    assert price[1].expected_permille == 301 and price[9].expected_permille == 46
    assert price[9].deviation_permille == 200 - 46
    assert {d: r.n for d, r in qty.items()} == {d: 1 for d in range(1, 7)}


def test_benford_permille_partition_on_testdata(spark, sf_dir):
    """Per-measure observed shares must tile ~1000 (floor-division
    slack < 9) and every digit must be in 1..9 with the pinned
    Benford expectation."""
    rows = quality.benford_digit_audit(spark, sf_dir).collect()
    assert rows
    for measure in {"l_extendedprice", "l_quantity"}:
        mr = [r for r in rows if r.measure == measure]
        assert mr and all(1 <= r.digit <= 9 for r in mr)
        share = sum(r.observed_permille for r in mr)
        assert 1000 - 9 <= share <= 1000
        for r in mr:
            assert r.expected_permille == quality._BENFORD_PERMILLE[r.digit]
            assert r.deviation_permille == abs(r.observed_permille - r.expected_permille)


def test_boilerplate_ngram_census(spark, tmp_path):
    """A 5-gram shared by three docs must outrank one shared by two;
    a repeated 5-gram within ONE doc counts once (df counts docs)."""
    from rdbms_metadata_manager_spark.llm.curation import boilerplate_ngram_report

    tpl = "all rights reserved by example"
    other = "click here to sign up"
    texts = [
        f"{tpl} unique one",
        f"{tpl} unique two",
        f"{tpl} {tpl}",          # template twice in one doc: df += 1
        f"{other} filler filler",
        f"{other} more filler",
    ]
    d = _write_documents(tmp_path, texts)
    rows = boilerplate_ngram_report(spark, d).collect()
    by_ngram = {r.ngram: r for r in rows}
    assert by_ngram[tpl].df == 3
    assert by_ngram[other].df == 2
    assert by_ngram[tpl].df_permille == 600 and by_ngram[other].df_permille == 400
    assert rows[0].ngram == tpl  # df-desc ordering
