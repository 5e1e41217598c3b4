"""Central query/oracle registry consumed by __spark_entry__.py.

Every implemented operator from SURVEY.md §2 has an entry here:
name → (spark callable, DuckDB oracle SQL). Modules register
themselves via their QUERIES/ORACLES dicts; names must be globally
unique. Queries whose semantics aren't SQL-expressible (streaming
state, approximate ops) appear in QUERIES without an ORACLES entry —
the driver then records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from .queries import (
        advanced,
        cogroup,
        cohort,
        features,
        forecast,
        formats,
        graph,
        metadata,
        mining,
        modern,
        profiling,
        quality,
        relational,
        scd,
        skew,
        spatial,
        tpch_extra,
        tpch_rest,
    )

    mods = [relational, advanced, tpch_extra, tpch_rest, skew, metadata, modern, profiling, graph, cohort, scd, features, forecast, formats, quality, mining, spatial, cogroup]
    # No try/except here: every dependency these modules use is part
    # of the environment contract (pyarrow/pandas/numpy), and the
    # PRIORITY window below hard-requires their query names — a
    # swallowed ImportError would only resurface as an opaque
    # "PRIORITY names not registered" assertion pointing at the wrong
    # module.
    from .llm import (
        bpe,
        clustering,
        curation,
        dedup,
        entity,
        fingerprint,
        gram,
        hygiene,
        ivf,
        kmeans,
        multimodal,
        pii,
        pipeline,
        pq,
        projection,
        quantize,
        ranking,
        sampling,
        semdedup,
        shared_runs,
        similarity,
        text,
        udfs,
    )
    from .sources import pyds_sink
    from .streaming import events_batch, sketch_state, state_inspect, stream_dedup

    mods += [
        dedup, similarity, text, multimodal, ranking, udfs, ivf, pipeline,
        clustering, kmeans, sampling, hygiene, pii, quantize, entity,
        fingerprint, curation, semdedup, gram, bpe, shared_runs, projection,
        pq,
    ]
    mods += [events_batch, state_inspect, stream_dedup, sketch_state, pyds_sink]
    return mods


# The external correctness driver checks at most the FIRST 50 registered
# queries (registration order).  This list pins that window to the
# highest-value coverage: the reference-parity metadata pipeline first,
# then every LLM-data-pipeline operator family, streaming, and one
# exemplar per SURVEY.md §2.2 category.  Everything not listed keeps its
# module-order position after these.
PRIORITY: tuple[str, ...] = (
    # §2.1 reference parity (the entire point of the reference) —
    # pinned first every round
    "schema_issues",
    "schema_issues_quirks",
    "schema_issue_summary",
    # round-3 rotation (VERDICT r2 item 3): rows green in BOTH r1 and
    # r2 left the window; never-driver-checked queries and everything
    # changed this round took their slots.
    # changed this round — need fresh driver evidence
    "dedup_jaccard_prefix_filter",  # count-filter bound fixed (ADVICE r2 high)
    "rolling_7d_active_users",      # full-week clip (ADVICE r2 low)
    "dq_referential_integrity",     # one-scan-per-child restructure
    "copurchase_part_pairs",        # self-join-free basket pairs
    "copurchase_triangles",         # edge list from the same kernel
    # never driver-checked before this round
    "pyds_catalog_columns",
    "hybrid_search_rrf",
    "knn_join_bruteforce",
    "pit_state_at_purchase",
    "dedup_chunk_ratio",
    "quality_filter_gate",
    "bm25_keyword_search",
    "skyline_customers",
    "spatial_neighbor_stats",
    # LLM pipeline: dedup family (r2-green exemplars kept for streak)
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_winnow_fingerprints",
    "dedup_winnow_overlap",
    # session-D additions — never driver-checked, freshest code
    "embedding_gram_matrix",
    "bpe_pair_merge_counts",
    "hard_negative_mining",
    "stream_dedup_exact_replay",
    # LLM pipeline: similarity / ANN
    "similarity_topk_bruteforce",
    "similarity_ann_lsh",
    "similarity_ivf_search",
    "kmeans_clusters",
    "entity_match_fuzzy_names",
    "pyds_sink_roundtrip",
    # LLM pipeline: text analysis / hygiene / packing / PII / UDFs
    "text_token_stats",
    "language_id_ngram",
    "decontaminate_train_test",
    "multimodal_features",
    "pack_training_sequences",
    "pii_redaction",
    "arrow_doc_byte_stats",
    "transpose_region_revenue",
    # streaming (batch face of the streaming pipelines)
    "events_session_stats",
    # skew handling
    "salted_join_revenue",
    # previously canon-unsafe / no-oracle rows, green r2 — one more round
    "ordered_array_agg_orders",
    "map_functions_events",
    "approx_distinct_stats",
    # §2.2 exemplars not yet green twice
    "q21_waiting_suppliers",
    "unpivot_lineitem_measures",
    "variant_event_props",
    "lateral_top_customers_per_nation",
    "recursive_balance_replay",
    "formats_csv_json_roundtrip",
)


def _ordered(names_to_vals: dict[str, object]) -> dict[str, object]:
    """Priority names first (in PRIORITY order), then the rest in module order."""
    out = {n: names_to_vals[n] for n in PRIORITY if n in names_to_vals}
    out.update((n, v) for n, v in names_to_vals.items() if n not in out)
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for m in _modules():
        for name, fn in m.QUERIES.items():
            assert name not in out, f"duplicate query name {name}"
            out[name] = fn
    missing = [n for n in PRIORITY if n not in out]
    assert not missing, f"PRIORITY names not registered: {missing}"
    return _ordered(out)  # type: ignore[return-value]


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(getattr(m, "ORACLES", {}))
    return _ordered(out)  # type: ignore[return-value]
