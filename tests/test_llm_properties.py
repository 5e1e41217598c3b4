"""Cross-operator semantic invariants for the LLM surface — the
relationships BETWEEN operators that single-query oracles can't see."""

from __future__ import annotations

import collections

import pytest

from rdbms_metadata_manager_spark.llm.dedup import (
    JACCARD_THRESHOLD,
    SIMHASH_MAX_HAMMING,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
)
from rdbms_metadata_manager_spark.llm.similarity import (
    similarity_ann_lsh,
    similarity_topk_bruteforce,
)
from rdbms_metadata_manager_spark.llm.text import text_token_stats
from rdbms_metadata_manager_spark.llm.udfs import udtf_document_chunks


def test_minhash_candidates_subset_of_exact_with_full_recall_on_planted(spark, sf_dir):
    """LSH precision is exact (post-verification) and recall on the
    near-identical planted dups (J≈0.9+) is 1.0."""
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in dedup_ngram_jaccard(spark, sf_dir).collect()}
    lsh = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, sf_dir).collect()}
    assert lsh <= set(exact)
    planted = {p for p, j in exact.items() if j >= 0.9}
    assert planted <= lsh


def test_jaccard_values_bounded(spark, sf_dir):
    for r in dedup_ngram_jaccard(spark, sf_dir).collect():
        assert JACCARD_THRESHOLD <= r.jaccard <= 1.0
        assert r.doc_a < r.doc_b


def test_simhash_hamming_bounded_and_symmetric_free(spark, sf_dir):
    for r in dedup_simhash(spark, sf_dir).collect():
        assert 0 <= r.hamming <= SIMHASH_MAX_HAMMING
        assert r.doc_a < r.doc_b  # each pair reported once


def test_ann_results_subset_of_bruteforce_universe(spark, sf_dir):
    """ANN cosines must agree with brute force for any shared vec."""
    bf = {r.vec_id: r.cosine for r in similarity_topk_bruteforce(spark, sf_dir).collect()}
    for r in similarity_ann_lsh(spark, sf_dir).collect():
        if r.vec_id in bf:
            assert r.cosine == pytest.approx(bf[r.vec_id], abs=1e-12)


def test_chunk_token_conservation(spark, sf_dir):
    """Chunker must neither drop nor duplicate tokens at window
    boundaries: per-doc chunk token counts sum to the doc's count."""
    per_doc = collections.Counter()
    for r in udtf_document_chunks(spark, sf_dir).collect():
        per_doc[r.doc_id] += r.n_tokens
    expected = {
        r.doc_id: r.n_tokens
        for r in text_token_stats(spark, sf_dir).collect()
        if r.doc_id < 100
    }
    assert dict(per_doc) == expected
