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
        # reference parity — pinned every round
        "schema_issues",
        "schema_issues_quirks",
        "schema_issue_summary",
        # r9: every round-9 addition rides its first window
        # (VERDICT r8 item 3 — the in-window doctrine)
        "cramer_von_mises_weekend",
        "bhattacharyya_weekend_overlap",
        "ljung_box_daily_events",
        "page_trend_weekly_events",
        "grubbs_outlier_daily_revenue",
        "wasserstein_source_length_drift",
        "rbo_scorer_rankings",
        "vocab_gini_concentration",
        # r9: pool drain (VERDICT r8 item 1) — spot-pin a spread of
        # the 37 never-driver-checked rotation names
        "text_fingerprint",
        "text_char_entropy",
        "bigram_lm_doc_scores",
        "multimodal_frame_sample",
        "ivf_kmeans_search",
        "leakage_safe_split",
        "shard_packing_nextfit",
        "embedding_quantize_int8",
        "dsir_importance_weights",
        "score_calibration_bins",
        "crossmodal_dup_audit",
        "pq_adc_search",
        # streaming canaries (kept per VERDICT r7 item 1)
        "streaming_hll_distinct",
        "pyds_stream_sink_roundtrip",
    }
    assert must_have <= window


# DuckDB type name → canonical hash class. The driver hashes result
# cells after pandas canonicalization; within one class the rendered
# value is identical regardless of width (int32 vs int64), but ACROSS
# classes it is not — DuckDB sum(BIGINT) returns HUGEINT (int128),
# which pandas renders as object/float64 and the driver hash then
# diverges from Spark's int64 even when every value is equal (the
# r3 failure mode: 3 reds, 12 latent, all and only the HUGEINT-final
# oracles). Any type not listed here is hash-unsafe by default.
_DUCK_CLASS = {
    "BIGINT": "int",
    "INTEGER": "int",
    "SMALLINT": "int",
    "TINYINT": "int",
    "DOUBLE": "float",
    "FLOAT": "float",
    "VARCHAR": "str",
    "DATE": "date",
    "TIMESTAMP": "ts",
    "BOOLEAN": "bool",
}


def _duckdb_limit0(sql: str, sf_dir: str):
    """Column (name, type) list of an oracle's final projection,
    computed by DuckDB without executing the query body."""
    import os

    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    out = list(zip(rel.columns, [str(t) for t in rel.types]))
    con.close()
    return out


def test_all_oracles_emit_hash_safe_duckdb_types(sf_dir):
    """Registry-wide LIMIT-0 type lint (VERDICT r3 item 2): no oracle
    may emit HUGEINT/DECIMAL/anything outside the hash-safe allowlist
    in its FINAL projection. This converts the external driver's
    hash-representation contract into a local gate — local value
    replay alone cannot catch it because int128 == int64 compares
    equal by value."""
    offenders = []
    for name, sql in all_oracles().items():
        for col, typ in _duckdb_limit0(sql, sf_dir):
            if typ not in _DUCK_CLASS:
                offenders.append((name, col, typ))
    assert not offenders, (
        "oracles with hash-unsafe final-projection types "
        "(wrap with CAST(... AS BIGINT/DOUBLE)): " + repr(offenders)
    )


def test_window_spark_schema_matches_oracle_type_classes(spark, sf_dir):
    """For every driver-window query, the Spark result schema and the
    DuckDB oracle's LIMIT-0 schema must agree column-by-column on the
    canonical hash class (int/float/str/date/ts/bool). Catches
    int-vs-float and name drift before the driver does. Schema
    analysis only — no execution of the Spark side beyond plan
    construction."""
    from pyspark.sql import types as T

    spark_class = {
        T.LongType: "int", T.IntegerType: "int",
        T.ShortType: "int", T.ByteType: "int",
        T.DoubleType: "float", T.FloatType: "float",
        T.StringType: "str", T.DateType: "date",
        T.TimestampType: "ts", T.BooleanType: "bool",
    }
    q, o = all_queries(), all_oracles()
    mismatches = []
    for name in list(q)[:50]:
        if name not in o:
            continue
        duck = dict(_duckdb_limit0(o[name], sf_dir))
        schema = q[name](spark, sf_dir).schema
        spark_cols = {
            f.name: spark_class.get(type(f.dataType), f.dataType.simpleString())
            for f in schema.fields
        }
        duck_cols = {c: _DUCK_CLASS.get(t, t) for c, t in duck.items()}
        if spark_cols != duck_cols:
            mismatches.append((name, spark_cols, duck_cols))
    assert not mismatches, mismatches


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


def test_replay_artifact_matches_registry():
    """Freeze discipline as a mechanical gate: the committed
    full-registry replay artifact must cover EXACTLY the current
    registry (a query added without regenerating the artifact fails
    here, not in a judge's diff) and must be all-green."""
    import glob
    import json
    import os

    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Sort by the PARSED round number, not lexically (ADVICE r7 #3:
    # 'r100' < 'r99' lexically, so a lexical max would silently let an
    # old artifact govern from round 100 on).
    paths = sorted(
        glob.glob(os.path.join(repo, "REPLAY_FULL_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)),
    )
    assert paths, "no committed full-registry replay artifact"
    with open(paths[-1]) as fh:  # newest round's artifact governs
        d = json.load(fh)
    assert d["n_green"] == d["n_total"], "committed replay artifact not all-green"
    assert set(d["results"]) == set(all_queries()), (
        "replay artifact out of sync with the registry — regenerate "
        f"scripts/replay_window.py --n <N> --json-out {os.path.basename(paths[-1])}"
    )
