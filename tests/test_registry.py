"""Registry invariants: the driver checks the FIRST 50 registered
queries, so the PRIORITY window composition is load-bearing — a
refactor that reorders modules or renames a query must not silently
evict the reference-parity pipeline or an operator family from the
correctness window."""

from __future__ import annotations

from rdbms_metadata_manager_spark.registry import PRIORITY, all_oracles, all_queries


def test_priority_names_all_registered_and_first():
    q = all_queries()
    names = list(q)
    assert names[: len(PRIORITY)] == list(PRIORITY)
    assert len(names) == len(set(names))


def test_oracles_follow_same_order_and_every_query_has_one():
    q, o = all_queries(), all_oracles()
    assert set(o) <= set(q)
    assert list(o)[: len(PRIORITY)] == [n for n in PRIORITY if n in o]
    # every query is oracle-backed (approx_distinct_stats included
    # since its exact+flags redesign); a new rows-only query is a
    # deliberate decision — update this pin when making it
    assert set(q) == set(o), set(q) ^ set(o)


def test_window_covers_reference_parity_and_llm_families():
    window = set(list(all_queries())[:50])
    must_have = {
        "schema_issues",
        "schema_issues_quirks",
        "schema_issue_summary",
        "dedup_minhash_lsh",
        "dedup_winnow_overlap",
        "similarity_ivf_search",
        "text_winnow_fingerprints",
        "events_session_stats",
        "salted_join_revenue",
        "recursive_balance_replay",
    }
    assert must_have <= window


def test_window_outputs_are_canon_safe_scalar_types(spark, sf_dir):
    """The external driver's canonicalizer sorts/hashes result cells
    with pandas — list/map/bytes cells crash it (round-1 failure mode
    of ordered_array_agg_orders / map_functions_events). Every query
    in the 50-query correctness window must therefore emit only
    scalar columns. Schema analysis only — no execution."""
    from pyspark.sql.types import ArrayType, BinaryType, MapType

    q = all_queries()
    offenders = []
    for name in list(q)[:50]:
        schema = q[name](spark, sf_dir).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, BinaryType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders
