"""Hand-computed cases for the cogrouped-map KS test and the
vocabulary OOV report (session-G additions)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from rdbms_metadata_manager_spark.llm.text import VOCAB_SIZE, vocab_oov_rate
from rdbms_metadata_manager_spark.queries.cogroup import cogroup_balance_ks


def _write_balances(tmp_path, cust_rows, supp_rows):
    cust = pd.DataFrame(cust_rows, columns=["c_custkey", "c_nationkey", "c_acctbal"])
    supp = pd.DataFrame(supp_rows, columns=["s_suppkey", "s_nationkey", "s_acctbal"])
    pq.write_table(pa.Table.from_pandas(cust), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.Table.from_pandas(supp), str(tmp_path / "supplier.parquet"))
    return str(tmp_path)


def test_cogroup_ks_hand_computed(spark, tmp_path):
    # nation 1: cust cents [10000, 30000], supp cents [20000]
    #   thresholds 100/200/300 → |fa*n_s − fb*n_c| = |1−0|,|1−2|,|2−2|
    #   → ks_num 1, ks_den 2, per-mille 500
    # nation 2: identical singletons → ks_num 0
    # nation 3: customer only → filtered out (no two-sample statistic)
    d = _write_balances(
        tmp_path,
        [(1, 1, 100.0), (2, 1, 300.0), (3, 2, 42.0), (4, 3, 7.0)],
        [(1, 1, 200.0), (2, 2, 42.0)],
    )
    rows = {r["nationkey"]: r.asDict() for r in cogroup_balance_ks(spark, d).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_cust"] == 2 and rows[1]["n_supp"] == 1
    assert rows[1]["ks_num"] == 1 and rows[1]["ks_den"] == 2
    assert rows[1]["ks_per_mille"] == 500
    assert rows[2]["ks_num"] == 0 and rows[2]["ks_per_mille"] == 0


def test_cogroup_ks_disjoint_supports_hit_max_distance(spark, tmp_path):
    # all customer balances strictly below all supplier balances →
    # D = 1 exactly (ks_num == ks_den)
    d = _write_balances(
        tmp_path,
        [(1, 1, 1.0), (2, 1, 2.0), (3, 1, 3.0)],
        [(1, 1, 100.0), (2, 1, 200.0)],
    )
    row = cogroup_balance_ks(spark, d).collect()[0]
    assert row["ks_num"] == row["ks_den"] == 6
    assert row["ks_per_mille"] == 1000


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


def test_vocab_oov_tie_break_is_lexicographic(spark, tmp_path):
    # 17 distinct words, every count tied at 1 → vocab keeps the
    # lexicographically first VOCAB_SIZE; the last word is OOV.
    words = [f"w{i:02d}" for i in range(VOCAB_SIZE + 1)]
    d = _write_documents(tmp_path, [" ".join(words)])
    row = vocab_oov_rate(spark, d).collect()[0]
    assert row["n_tokens"] == VOCAB_SIZE + 1
    assert row["n_oov"] == 1
    assert row["oov_per_mille"] == 1000 // (VOCAB_SIZE + 1)


def test_vocab_oov_counts_token_occurrences_not_types(spark, tmp_path):
    # doc 1 pushes "hot" to the top of the vocab; doc 2 is all "cold"
    # (rank > VOCAB_SIZE is impossible here with < VOCAB_SIZE distinct
    # words, so every word is in-vocab → 0 OOV).
    d = _write_documents(tmp_path, ["hot hot hot cold", "cold cold"])
    rows = {r["doc_id"]: r.asDict() for r in vocab_oov_rate(spark, d).collect()}
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_oov"] == 0
    assert rows[2]["n_tokens"] == 2 and rows[2]["n_oov"] == 0


def test_leakage_safe_split_keeps_dup_families_in_one_split(spark, tmp_path):
    """Verbatim copies must land in the same split regardless of
    doc_id (the testdata's planted dups are NEAR-dups, so verbatim
    families are crafted here). With 40 distinct texts copied twice
    under scattered doc_ids, a doc_id-keyed split would separate at
    least one family with probability ~1 − 0.82⁴⁰; the content-keyed
    split never does."""
    from pyspark.sql import functions as F

    from rdbms_metadata_manager_spark.llm.sampling import leakage_safe_split

    texts = [f"unique document body number {i} with payload" for i in range(40)]
    d = _write_documents(tmp_path, texts + texts)
    df = leakage_safe_split(spark, d)
    fam = df.groupBy("text_hash").agg(
        F.countDistinct("split").alias("n_splits"), F.count("*").alias("n_docs")
    )
    assert fam.filter(F.col("n_splits") > 1).count() == 0
    assert fam.filter(F.col("n_docs") == 2).count() == 40
    # sanity: more than one split value actually occurs
    assert df.select("split").distinct().count() > 1


def _write_embeddings(tmp_path, vecs):
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_embedding_dim_robust_stats_hand_computed(spark, tmp_path):
    from rdbms_metadata_manager_spark.llm.projection import embedding_dim_robust_stats

    # dim 0: constant 0.5 → MAD 0 → dead, no outliers even though all
    #        deviations are 0
    # dim 1: ticks [1000,2000,3000,4000,100000] → med 3000, MAD 1000,
    #        one 5×MAD outlier (the 100000)
    vecs = [[0.5, 1.0], [0.5, 2.0], [0.5, 3.0], [0.5, 4.0], [0.5, 100.0]]
    d = _write_embeddings(tmp_path, vecs)
    rows = {r["dim"]: r.asDict() for r in embedding_dim_robust_stats(spark, d).collect()}
    assert rows[0] == {
        "dim": 0, "n_vals": 5, "med_tick": 500, "mad_tick": 0,
        "n_outliers": 0, "is_dead": True,
    }
    assert rows[1] == {
        "dim": 1, "n_vals": 5, "med_tick": 3000, "mad_tick": 1000,
        "n_outliers": 1, "is_dead": False,
    }


def test_session_pattern_abandonment_hand_cases(spark, tmp_path):
    """click→no-purchase-after = abandoned; purchase BEFORE the click
    doesn't save a session; purchase after does."""
    import datetime as dt

    from rdbms_metadata_manager_spark.streaming.events_batch import (
        session_pattern_abandonment,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=30)
    rows = [
        # user 1: click → view         → abandoned
        (1, t0, 1, "click", 0.0, "{}"),
        (2, t0 + s, 1, "view", 0.0, "{}"),
        # user 2: click → purchase     → converted
        (3, t0, 2, "click", 0.0, "{}"),
        (4, t0 + s, 2, "purchase", 0.0, "{}"),
        # user 3: view only            → not clicked
        (5, t0, 3, "view", 0.0, "{}"),
        # user 4: purchase → click     → abandoned (no purchase AFTER)
        (6, t0, 4, "purchase", 0.0, "{}"),
        (7, t0 + s, 4, "click", 0.0, "{}"),
        # user 5: click → purchase → click → abandoned: the LAST
        # add-to-cart was never checked out (the case a first-click
        # LIKE pattern would misclassify as converted)
        (8, t0, 5, "click", 0.0, "{}"),
        (9, t0 + s, 5, "purchase", 0.0, "{}"),
        (10, t0 + 2 * s, 5, "click", 0.0, "{}"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"))
    got = {r["entry_type"]: r.asDict() for r in session_pattern_abandonment(spark, str(tmp_path)).collect()}
    assert got["click"] == {
        "entry_type": "click", "n_sessions": 3, "n_clicked": 3,
        "n_abandoned": 2, "abandoned_pm": 666,
    }
    assert got["view"]["n_clicked"] == 0 and got["view"]["abandoned_pm"] is None
    assert got["purchase"] == {
        "entry_type": "purchase", "n_sessions": 1, "n_clicked": 1,
        "n_abandoned": 1, "abandoned_pm": 1000,
    }


import pytest


@pytest.mark.parametrize(
    "name",
    [
        "cogroup_balance_ks",
        "vocab_oov_rate",
        "dedup_clusters_star",
        "leakage_safe_split",
        "embedding_dim_robust_stats",
        "pipe_syntax_order_stats",
        "session_pattern_abandonment",
        "crossmodal_dup_audit",
        "null_safe_band_join",
        "try_arithmetic_audit",
        # session-J ops: iterative BPE (driver-decision loop), the
        # md5-rank control pairing, tie-broken rank/argmax cuts
        "bpe_train_merges",
        "bpe_vocab_after_merges",
        "zipf_rank_frequency_audit",
        "language_id_confusion",
        "minhash_estimate_calibration",
        "dedup_negative_control",
        "dedup_tf_cosine",
        "source_signature_chisq",
        "countmin_heavy_hitters",
        "event_markov_transitions",
        "autocorr_daily_events",
        "seasonal_decompose_daily",
        "ktruss_copurchase_edges",
        "embedding_pair_cosine_profile",
        "user_event_gap_histogram",
        "funnel_time_to_convert",
        "multimodal_audio_chunks",
        "bitmap_distinct_users",
        "corpus_overview_report",
        # round-4 ops: memo-riding SCAN scores, driver-decision MMR
        # greedy, window CUSUM, dictionary-join fertility
        "scan_structural_similarity",
        "similarity_mmr_rerank",
        "changepoint_daily_events",
        "tokenizer_fertility_report",
        "similarity_filtered_topk",
        "similarity_binary_rerank",
        "l_diversity_audit",
        "matryoshka_truncation_recall",
        "retrieval_eval_metrics",
        "label_noise_knn_audit",
        "coreset_kcenter_sample",
        "partition_layout_advisor",
        "join_strategy_advisor",
        "gdpr_erasure_audit",
        "cluster_safe_split",
        "user_activity_streaks",
        "dp_sensitivity_audit",
        "constraint_mining",
        "zorder_locality_report",
        "catalog_pii_risk_scan",
        "ab_test_aa_calibration",
        "weekly_revenue_wow",
        # round-5 additions — the range kernel (sampled boundaries),
        # the Arrow matmul prefilter (batch-split sensitivity), the
        # grouped BFS checkpoints, and the hash-salted shard faces
        "pareto_revenue_concentration",
        "zipf_rank_frequency_audit",
        "source_token_budget_cap",
        "semdedup_embedding_clusters",
        "dedup_negative_control",
        "epoch_shuffle_shards",
        "dedup_keep_best",
        "exact_median_two_pass",
        "diameter_double_sweep",
        "multi_touch_attribution",
        "rag_chunk_overlap_stats",
        "holt_trend_daily_events",
    ],
)
def test_session_g_ops_are_run_to_run_deterministic(name, spark, sf_dir):
    """Two independent executions must be byte-identical — guards the
    Arrow kernels (group/batch split sensitivity), the iterative star
    contraction, and the hash-keyed split against any hidden
    nondeterminism."""
    from rdbms_metadata_manager_spark.registry import all_queries

    q = all_queries()[name]
    assert q(spark, sf_dir).collect() == q(spark, sf_dir).collect()
