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
        audit,
        cogroup,
        cohort,
        features,
        forecast,
        formats,
        graph,
        inference,
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

    mods = [relational, advanced, tpch_extra, tpch_rest, skew, metadata, modern, profiling, graph, cohort, scd, features, forecast, formats, quality, mining, spatial, cogroup, inference, audit]
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
    # round-6 rotation (VERDICT r5 item 1): every r5-green row leaves
    # the window; 47 of the 47 open slots go to never-driver-checked
    # names (102 remained after r5), ordered:
    # (a) the builder's post-r5-freeze re-proof list — queries whose
    #     CODE changed after the freeze (green history doesn't
    #     transfer across a rewrite); source_signature_chisq is the
    #     one previously-green re-entry,
    # (b) queries whose code changed THIS round (ADVICE r5 overflow
    #     widenings; the adjacency-BFS rewrite),
    # (c) the remaining never-checked r5 operators,
    # (d) streaming canaries (VERDICT r5 item 6) — the four
    #     never-checked streaming faces double as the rotation's
    #     environment-sensitivity probes,
    # (e) oldest-first never-checked backfill (registration order).
    # (a) post-r5-freeze re-proofs
    "source_signature_chisq",
    "code_prose_detector",
    "rag_chunk_overlap_stats",
    "naming_convention_audit",
    "exact_median_two_pass",
    # (b) changed this round
    "t_closeness_audit",         # DECIMAL(38,0) widening (ADVICE r6 #1)
    "selfjoin_size_estimate",    # DECIMAL(38,0) F2 squares (ADVICE r6 #2)
    "bfs_levels_from_hub",       # adjacency-BFS rewrite
    "diameter_double_sweep",     # adjacency-BFS rewrite (VERDICT r5 item 2)
    # (c) never-checked r5 operators
    "multi_touch_attribution",
    "bitwise_functions_events",
    "hof_functions_documents",
    "grouped_trimmed_mean_two_pass",
    "bloom_filter_fpr_audit",
    "index_redundancy_audit",
    "dedup_keep_best",
    # (d) streaming canaries — never driver-checked
    "events_sliding_10min",
    "streaming_hll_distinct",
    "streaming_cms_heavy_hitters",
    "pyds_stream_sink_roundtrip",
    # (e) oldest never-driver-checked backfill (registration order)
    "user_event_gap_histogram",
    "funnel_time_to_convert",
    "event_path_trigrams",
    "rfm_customer_segments",
    "dau_mau_stickiness",
    "scd2_user_state_intervals",
    "scd2_state_snapshots",
    "snapshot_diff_orders",
    "feature_scale_orders",
    "feature_quantile_buckets",
    "forecast_seasonal_naive_backtest",
    "ewma_daily_events",
    "ols_trend_per_segment",
    "holt_trend_daily_events",
    "formats_xml_roundtrip",
    "dq_expectations_orders",
    "benford_digit_audit",
    "drift_event_type_shares",
    "kcore_copurchase_parts",
    "label_propagation_communities",
    "association_rules_lift",
    "link_prediction_hub_cn",
    "local_clustering_coefficients",
    "copurchase_degree_histogram",
    "cogroup_balance_ks",
    "dedup_containment",
    "dedup_sketch_recall_report",
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
