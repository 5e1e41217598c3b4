"""Semantic invariants for the profiling / sampling / packing
operators — beyond the oracle hash-match (test_oracle_parity.py),
these pin the properties a user actually relies on."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from rdbms_metadata_manager_spark.llm.sampling import (
    SEQ_BUDGET,
    STRAT_RATES,
    pack_training_sequences,
    sample_stratified_lang,
    split_train_val_test,
)
from rdbms_metadata_manager_spark.queries.profiling import profile_orders_columns


def test_split_is_deterministic_and_partitioning_invariant(spark, sf_dir):
    a = split_train_val_test(spark, sf_dir).collect()
    b = split_train_val_test(spark, sf_dir).collect()
    assert a == b
    # Same assignment regardless of how the input is partitioned —
    # the property randomSplit does NOT have.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(7, "lang")
    # Re-derive the bucket on the reshuffled data: identical rows.
    from rdbms_metadata_manager_spark.llm.hashing import h32

    bucket = h32(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    re_rows = {
        r["doc_id"]: r["bucket"]
        for r in docs.select("doc_id", bucket.alias("bucket")).collect()
    }
    assert all(r["bucket"] == re_rows[r["doc_id"]] for r in a)
    # All three splits are populated with roughly 80/10/10 mass.
    counts = {r["split"]: 0 for r in a}
    for r in a:
        counts[r["split"]] += 1
    n = len(a)
    assert 0.7 < counts["train"] / n < 0.9
    assert counts["val"] > 0 and counts["test"] > 0


def test_stratified_sample_honors_rates(spark, sf_dir):
    sampled = sample_stratified_lang(spark, sf_dir).toPandas()
    totals = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .count()
        .toPandas()
        .set_index("lang")["count"]
    )
    for lang, got in sampled.groupby("lang").size().items():
        rate = STRAT_RATES[lang] / 1000
        # Bernoulli(rate) over n docs: loose 5-sigma-ish band.
        n = totals[lang]
        assert abs(got - n * rate) <= max(5, 5 * (n * rate * (1 - rate)) ** 0.5)
    # languages at rate 1000 are kept whole
    for lang, permille in STRAT_RATES.items():
        if permille == 1000 and lang in totals.index:
            assert sampled[sampled.lang == lang].shape[0] == totals[lang]


def test_packing_layout_is_contiguous(spark, sf_dir):
    df = pack_training_sequences(spark, sf_dir).toPandas()
    assert (df.offset_in_seq >= 0).all() and (df.offset_in_seq < SEQ_BUDGET).all()
    for _, g in df.groupby("lang"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        # offsets chain: next start = prev start + prev tokens
        starts = g.seq_id * SEQ_BUDGET + g.offset_in_seq
        expected = starts.shift(1).fillna(0) + g.n_tokens.shift(1).fillna(0)
        assert (starts == expected.astype("int64")).all()
        # seq ids are monotone within the stream
        assert g.seq_id.is_monotonic_increasing


def test_profile_counts_nulls_and_distincts(spark):
    # Hand-built frame with known nulls — the testdata has none, so
    # pin the null-accounting on a synthetic orders table.
    pdf = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [10, None, 10, None],
            "o_orderstatus": ["O", "F", None, "O"],
            "o_totalprice": [10.5, None, 10.5, 99.25],
            "o_orderdate": pd.to_datetime(["2024-01-01", "2024-01-02", None, "2024-01-02"]),
            "o_orderpriority": ["1-URGENT", "1-URGENT", "1-URGENT", None],
        }
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "orders.parquet")
        spark.createDataFrame(pdf).coalesce(1).write.parquet(path)
        prof = {
            r["column_name"]: r
            for r in profile_orders_columns(spark, d).collect()
        }
    assert all(r["n_rows"] == 4 for r in prof.values())
    assert prof["o_custkey"]["n_nulls"] == 2
    assert prof["o_custkey"]["n_distinct"] == 1
    assert prof["o_totalprice"]["n_nulls"] == 1
    assert prof["o_totalprice"]["n_distinct"] == 2
    assert prof["o_totalprice"]["min_repr"] == "105000"  # 10.5 * 1e4 ticks
    assert prof["o_orderdate"]["min_repr"] == "2024-01-01 00:00:00"
    assert prof["o_orderkey"]["n_nulls"] == 0
    assert prof["o_orderstatus"]["max_repr"] == "O"
