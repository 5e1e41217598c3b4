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
