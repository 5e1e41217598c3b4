"""ADVICE r7 #1: global memo eviction hook.

The per-app memo caches assume an immutable corpus (see
rdbms_metadata_manager_spark/memo.py); clear_memos() is the explicit
escape hatch for in-place rewrites and long-lived multi-corpus
sessions. This test proves (a) every known cache module registers,
(b) a populated cache is evicted and the query recomputes, and
(c) results are identical before/after eviction (the memo is a pure
performance artifact, never a semantic one).
"""

from __future__ import annotations

from rdbms_metadata_manager_spark.memo import (
    clear_memos,
    register_memo,
    registered_memo_count,
)


def test_all_known_cache_modules_register():
    # Importing the registry imports every query module, which runs
    # the module-level register_memo calls.
    from rdbms_metadata_manager_spark.registry import all_queries

    all_queries()
    # 17 caches at round 8: curation, clustering, fingerprint, kmeans,
    # dedup x6, pq, bpe, graph, mining x4. New caches must register
    # too — bump this floor when adding one.
    assert registered_memo_count() >= 17


def test_clear_memos_evicts_and_recomputes(spark, sf_dir):
    from rdbms_metadata_manager_spark.llm import curation

    curation._QC_CACHE.clear()
    before = curation.quality_classifier_scores(spark, sf_dir)
    rows_before = sorted(map(tuple, before.limit(50).collect()))
    assert len(curation._QC_CACHE) == 1
    evicted = clear_memos()
    assert evicted >= 1
    assert len(curation._QC_CACHE) == 0
    after = curation.quality_classifier_scores(spark, sf_dir)
    assert after is not before  # genuinely recomputed, not the old ref
    rows_after = sorted(map(tuple, after.limit(50).collect()))
    assert rows_before == rows_after


def test_clear_memos_handles_heterogeneous_values():
    # bpe-style (list, DataFrame) tuples and plain lists must not trip
    # the unpersist walk.
    cache = register_memo({})
    cache[("a", "b")] = ([("x", 1)], None)
    cache[("c", "d")] = [1, 2, 3]
    assert clear_memos() >= 2
    assert cache == {}
