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
    n_batches == 4 pins that it arrived as its own micro-batch, and
    unique doc_ids prove dropDuplicatesWithinWatermark swallowed every
    retry before the band filter saw it."""
    from rdbms_metadata_manager_spark.streaming.minhash_ingest import (
        stream_dedup_minhash_bands,
    )

    rows = stream_dedup_minhash_bands(spark, sf_dir).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)), "a re-delivered doc survived twice"
    assert all(r["n_batches"] == 4 for r in rows)


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
