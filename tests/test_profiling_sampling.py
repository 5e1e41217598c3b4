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


def test_decontamination_consistent_with_split_and_neardups(spark, sf_dir):
    """Cross-operator: every contaminated doc is in the train split;
    ratios are in (0,1]; and any J>=0.9 near-dup pair (from the exact
    n-gram dedup) that straddles the train/test cut MUST be flagged —
    a 3-gram Jaccard that high forces shared 4-grams."""
    from rdbms_metadata_manager_spark.llm.dedup import dedup_ngram_jaccard
    from rdbms_metadata_manager_spark.llm.hygiene import decontaminate_train_test

    split = {r["doc_id"]: r["split"] for r in split_train_val_test(spark, sf_dir).collect()}
    flagged = {}
    for r in decontaminate_train_test(spark, sf_dir).collect():
        assert split[r["doc_id"]] == "train"
        assert 0 < r["contamination_ratio"] <= 1.0
        assert 1 <= r["n_shared_shingles"] <= r["n_shingles"]
        flagged[r["doc_id"]] = r["n_shared_shingles"]
    for r in dedup_ngram_jaccard(spark, sf_dir).collect():
        if r["jaccard"] >= 0.9:
            pair = {r["doc_a"]: split[r["doc_a"]], r["doc_b"]: split[r["doc_b"]]}
            trains = [d for d, s in pair.items() if s == "train"]
            tests = [d for d, s in pair.items() if s == "test"]
            if trains and tests:
                assert all(d in flagged for d in trains)


def test_repetition_shingle_count_matches_token_stats(spark, sf_dir):
    """n_shingles is exactly n_tokens - 2 for the 3-gram stream."""
    from rdbms_metadata_manager_spark.llm.hygiene import text_repetition_stats
    from rdbms_metadata_manager_spark.llm.text import text_token_stats

    tokens = {r["doc_id"]: r["n_tokens"] for r in text_token_stats(spark, sf_dir).collect()}
    rows = text_repetition_stats(spark, sf_dir).collect()
    assert len(rows) == len(tokens)
    for r in rows:
        assert r["n_shingles"] == tokens[r["doc_id"]] - 2
        assert 1 <= r["max_shingle_freq"] <= r["n_shingles"]
        assert r["n_distinct_shingles"] <= r["n_shingles"]


def test_histogram_conserves_mass(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.profiling import histogram_order_values

    rows = histogram_order_values(spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r["n_orders"] for r in rows) == total
    bins = [r["bin"] for r in rows]
    assert bins == sorted(bins) and bins[0] >= 0 and bins[-1] <= 19


def test_resample_conserves_events(spark, sf_dir):
    from rdbms_metadata_manager_spark.queries.profiling import resample_events_hourly

    rows = resample_events_hourly(spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r["n_events"] for r in rows) == total
    # gap rows are exactly the zero-count rows
    assert all((r["n_events"] == 0) == r["is_gap"] for r in rows)


def test_shard_packing_invariants(spark, sf_dir):
    """Next-fit invariants on real data: shard ids are contiguous
    from 0 per source, docs stay in doc_id order within shards, and
    no shard exceeds capacity unless it holds a single oversized
    doc."""
    import collections

    from rdbms_metadata_manager_spark.llm.sampling import (
        SHARD_CAPACITY,
        shard_packing_nextfit,
    )

    rows = shard_packing_nextfit(spark, sf_dir).collect()
    per_shard = collections.defaultdict(list)
    for r in rows:
        per_shard[(r.source, r.shard_id)].append(r)
    for (source, sid), docs in per_shard.items():
        total = sum(d.tokens for d in docs)
        assert total <= SHARD_CAPACITY or len(docs) == 1, (source, sid, total)
    by_source = collections.defaultdict(list)
    for r in sorted(rows, key=lambda r: (r.source, r.doc_id)):
        by_source[r.source].append(r.shard_id)
    for source, sids in by_source.items():
        assert sids[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(sids, sids[1:])), source
