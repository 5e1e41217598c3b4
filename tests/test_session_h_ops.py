"""Crafted-input tests for the round-3 session-H operators:
threshold sweep, sequence-length histogram, temperature mix,
source-level quality gate, and local clustering coefficients —
semantics the synthetic corpus exercises only in aggregate (the
oracle-parity suite checks them there; these pin closed-form
expectations on known inputs)."""

from __future__ import annotations

import pytest


def _write_docs(spark, d, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")


def _words(word: str, n: int) -> str:
    return " ".join([word] * n)


def test_sequence_length_histogram_closed_form(spark, tmp_path):
    from rdbms_metadata_manager_spark.llm.sampling import sequence_length_histogram

    d = str(tmp_path)
    rows = [
        (1, _words("aa", 5), "en", "s", 0),     # bucket 0,  pad 507
        (2, _words("bb", 20), "en", "s", 0),    # bucket 16, pad 492
        (3, _words("cc", 100), "en", "s", 0),   # bucket 64, pad 412
        (4, _words("dd", 600), "en", "s", 0),   # bucket 512, pad 1024-600=424
        (5, _words("ee", 1200), "en", "s", 0),  # bucket 1024 (open top), pad 1536-1200=336
    ]
    _write_docs(spark, d, rows)
    got = {
        r.bucket_lo: (r.n_docs, r.n_tokens_total, r.pad_waste_tokens)
        for r in sequence_length_histogram(spark, d).collect()
    }
    assert got == {
        0: (1, 5, 507),
        16: (1, 20, 492),
        64: (1, 100, 412),
        512: (1, 600, 424),
        1024: (1, 1200, 336),
    }


def test_corpus_temperature_mix_flattens_toward_tail(spark, tmp_path):
    """9:1 token imbalance → sqrt weights 3:1; the tail source is
    upsampled (>1000 pm) and the head downsampled (<1000 pm)."""
    from rdbms_metadata_manager_spark.llm.pipeline import corpus_temperature_mix

    d = str(tmp_path)
    rows = [(i, _words("w", 90), "en", "head", 0) for i in range(10)]
    rows += [(100, _words("w", 100), "en", "tail", 0)]
    _write_docs(spark, d, rows)
    got = {r.source: r.asDict() for r in corpus_temperature_mix(spark, d).collect()}
    head, tail = got["head"], got["tail"]
    assert head["n_tokens"] == 900 and tail["n_tokens"] == 100
    assert head["sqrt_tokens"] == 30 and tail["sqrt_tokens"] == 10
    assert head["weight_ppm"] == 30 * 1_000_000 // 40
    assert tail["weight_ppm"] == 10 * 1_000_000 // 40
    # proportional share would be 900/1000 and 100/1000
    assert head["upsample_pm"] < 1000 < tail["upsample_pm"]
    assert tail["upsample_pm"] == 10 * 1000 * 1000 // (40 * 100)  # 2500


def test_threshold_sweep_monotone_and_matches_gate(spark, tmp_path):
    """n_pairs / n_docs_affected are non-increasing in the threshold,
    and the 50%-row equals the registered Jaccard-join pair count on
    the same corpus (integer test ≡ float filter at every boundary)."""
    from rdbms_metadata_manager_spark.llm.dedup import (
        dedup_ngram_jaccard,
        dedup_threshold_sweep,
    )

    d = str(tmp_path)
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta kappa lam mu nu", "en", "w", 0),
        (2, "alpha beta gamma delta epsilon zeta eta theta kappa lam mu xi", "en", "w", 0),
        (3, "alpha beta gamma delta epsilon zeta eta theta kappa lam mu nu", "en", "w", 0),
        (4, "one two three four five six seven eight nine ten", "en", "w", 0),
    ]
    _write_docs(spark, d, rows)
    sweep = {r.threshold_pct: r for r in dedup_threshold_sweep(spark, d).collect()}
    assert sorted(sweep) == [50, 60, 70, 80, 90]
    for lo, hi in zip([50, 60, 70, 80], [60, 70, 80, 90]):
        assert sweep[lo].n_pairs >= sweep[hi].n_pairs
        assert sweep[lo].n_docs_affected >= sweep[hi].n_docs_affected
    # docs 1 and 3 are verbatim dups (J = 1.0): every threshold keeps them
    assert sweep[90].n_pairs >= 1
    assert sweep[50].n_pairs == dedup_ngram_jaccard(spark, d).count()


def test_source_quality_gate_flags_spam_source(spark, tmp_path):
    from rdbms_metadata_manager_spark.llm.curation import (
        quality_filter_gate,
        source_quality_gate,
    )

    d = str(tmp_path)
    clean_text = (
        "the quick brown fox jumps over lazy dogs while the calm river "
        "winds through green valleys under bright skies toward distant hills"
    )
    rows = [(i, clean_text, "en", "clean", 0) for i in range(5)]
    # one word repeated 30x: top_word_pm = 1000 → dominance reject
    rows += [(100 + i, _words("alpha", 30), "en", "spam", 0) for i in range(5)]
    _write_docs(spark, d, rows)
    got = {r.source: r.asDict() for r in source_quality_gate(spark, d).collect()}
    assert got["spam"]["n_rejected"] == 5
    assert got["spam"]["reject_pm"] == 1000
    assert got["spam"]["gated"] is True
    assert got["spam"]["top_fail_rule"] == "dominance"
    assert got["clean"]["n_rejected"] == 0
    assert got["clean"]["gated"] is False
    assert got["clean"]["top_fail_rule"] == ""
    # rollup must agree with the per-doc gate it summarizes
    per_doc = quality_filter_gate(spark, d)
    n_rej = per_doc.filter("NOT keep").count()
    assert n_rej == sum(v["n_rejected"] for v in got.values())


def test_pmi_collocations_match_bruteforce(spark, tmp_path):
    """Top-k list equals a Python brute-force PMI computation over
    the same corpus (support floor included, float-ordered exactly
    as both engines order)."""
    from rdbms_metadata_manager_spark.llm.text import (
        PMI_MIN_PAIR_COUNT,
        PMI_TOPK,
        pmi_collocations,
    )

    d = str(tmp_path)
    texts = {
        1: "new york " * 30,          # (new,york)x30, (york,new)x29
        2: "hot dog " * 30,
        3: "new dog hot york " * 15,  # crossings dilute the pairs above
        4: "alpha beta gamma delta " * 12,
    }
    rows = [(i, t.strip(), "en", "w", 0) for i, t in texts.items()]
    _write_docs(spark, d, rows)

    from collections import Counter

    uni, bi = Counter(), Counter()
    for t in texts.values():
        w = t.strip().split(" ")
        uni.update(w)
        bi.update(zip(w, w[1:]))
    n = sum(uni.values())
    m = sum(bi.values())
    expected = [
        (w1, w2, c, uni[w1], uni[w2], c * n * n, m * uni[w1] * uni[w2])
        for (w1, w2), c in bi.items()
        if c >= PMI_MIN_PAIR_COUNT
    ]
    expected.sort(key=lambda r: (-(r[5] / r[6]), r[0], r[1]))
    got = [tuple(r) for r in pmi_collocations(spark, d).collect()]
    assert got == expected[:PMI_TOPK]


def test_ngram_novelty_curve_first_seen_semantics(spark, tmp_path):
    """A verbatim copy contributes zero novelty; a part-copy
    contributes exactly its unseen shingles."""
    from rdbms_metadata_manager_spark.llm.dedup import ngram_novelty_curve

    d = str(tmp_path)
    rows = [
        (0, "w0 w1 w2 w3 w4", "en", "s", 0),        # 3 shingles, all novel
        (1, "w0 w1 w2 w3 w4", "en", "s", 0),        # verbatim copy → 0 novel
        (2, "x0 x1 x2 x3", "en", "s", 0),           # 2 shingles, novel
        # 4 shingles; (w0 w1 w2) seen in doc 0, (x0 x1 x2) seen in
        # doc 2 → only the 2 boundary-crossing shingles are novel
        (3, "w0 w1 w2 x0 x1 x2", "en", "s", 0),
    ]
    _write_docs(spark, d, rows)
    got = {
        r.ingest_decile: (r.n_shingles, r.n_novel, r.novelty_pm)
        for r in ngram_novelty_curve(spark, d).collect()
    }
    # deciles: doc_id * 10 div 4
    assert got == {
        0: (3, 3, 1000),
        2: (3, 0, 0),
        5: (2, 2, 1000),
        7: (4, 2, 500),
    }


def test_degree_histogram_known_graph(spark, tmp_path):
    from rdbms_metadata_manager_spark.queries.mining import copurchase_degree_histogram

    d = str(tmp_path)
    li = [(10, 1), (10, 2), (10, 3), (20, 3), (20, 4), (30, 4), (30, 5)]
    spark.createDataFrame(li, "l_orderkey long, l_partkey long").write.mode(
        "overwrite"
    ).parquet(f"{d}/lineitem.parquet")
    got = {
        r.deg_bucket_lo: (r.n_nodes, r.sum_deg)
        for r in copurchase_degree_histogram(spark, d).collect()
    }
    # degrees: node5→1; nodes 1,2,4→2; node3→3 (buckets [1,2), [2,4))
    assert got == {1: (1, 1), 2: (4, 9)}


def test_embedding_norm_bands_closed_form(spark, tmp_path):
    """Known norms: med=4, MAD=3 → bands {0:2, 1:2, capped 5:1}."""
    from rdbms_metadata_manager_spark.llm.projection import embedding_norm_outlier_bands

    d = str(tmp_path)
    vecs = [
        (1, [1.0, 0.0], 0),   # norm2 1  → adev 3 → band 1
        (2, [0.0, 1.0], 0),   # norm2 1  → band 1
        (3, [2.0, 0.0], 0),   # norm2 4  → adev 0 → band 0
        (4, [0.0, 2.0], 0),   # norm2 4  → band 0
        (5, [10.0, 0.0], 0),  # norm2 100 → adev 96 → floor(32) → capped 5
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    got = {r.mad_band: r.n_vecs for r in embedding_norm_outlier_bands(spark, d).collect()}
    assert got == {0: 2, 1: 2, 5: 1}


def test_embedding_norm_bands_zero_mad(spark, tmp_path):
    """Uniform norms → MAD 0 → everything lands in band 0 (no
    divide-by-zero)."""
    from rdbms_metadata_manager_spark.llm.projection import embedding_norm_outlier_bands

    d = str(tmp_path)
    vecs = [(i, [1.0, 0.0], 0) for i in range(4)]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    got = {r.mad_band: r.n_vecs for r in embedding_norm_outlier_bands(spark, d).collect()}
    assert got == {0: 4}


def test_cluster_size_histogram_counts_families(spark, tmp_path):
    """One 3-doc family → exactly one size-3 row with 2 deletable."""
    from rdbms_metadata_manager_spark.llm.clustering import (
        dedup_cluster_size_histogram,
        dedup_clusters,
    )

    d = str(tmp_path)
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta kappa lam mu nu", "en", "w", 0),
        (2, "alpha beta gamma delta epsilon zeta eta theta kappa lam mu xi", "en", "w", 0),
        (3, "alpha beta gamma delta epsilon zeta eta theta kappa lam mu nu", "en", "w", 0),
        (4, "one two three four five six seven eight nine ten", "en", "w", 0),
    ]
    _write_docs(spark, d, rows)
    got = {
        r.family_size: (r.n_clusters, r.n_docs, r.n_deletable)
        for r in dedup_cluster_size_histogram(spark, d).collect()
    }
    assert got == {3: (1, 3, 2)}
    # histogram totals must equal the label relation it summarizes
    assert sum(v[1] for v in got.values()) == dedup_clusters(spark, d).count()


def test_local_clustering_coefficients_known_graph(spark, tmp_path):
    """Baskets {1,2,3}, {3,4}, {4,5}: one triangle; C(1)=C(2)=1.0,
    C(3)=1/3, C(4)=0, node 5 excluded (degree 1)."""
    from rdbms_metadata_manager_spark.queries.mining import local_clustering_coefficients

    d = str(tmp_path)
    li = [(10, 1), (10, 2), (10, 3), (20, 3), (20, 4), (30, 4), (30, 5)]
    spark.createDataFrame(li, "l_orderkey long, l_partkey long").write.mode(
        "overwrite"
    ).parquet(f"{d}/lineitem.parquet")
    got = {
        r.coef_bucket_pct: (r.n_nodes, r.sum_deg, r.sum_triangles)
        for r in local_clustering_coefficients(spark, d).collect()
    }
    assert got == {
        0: (1, 2, 0),    # node 4: deg 2, no triangle
        33: (1, 3, 1),   # node 3: deg 3, one triangle → 333 pm
        100: (2, 4, 2),  # nodes 1, 2: coefficient 1.0
    }
