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
        cohort,
        features,
        forecast,
        graph,
        metadata,
        modern,
        profiling,
        relational,
        scd,
        skew,
        tpch_extra,
        tpch_rest,
    )

    mods = [relational, advanced, tpch_extra, tpch_rest, skew, metadata, modern, profiling, graph, cohort, scd, features, forecast]
    try:
        from .llm import (
            clustering,
            dedup,
            entity,
            fingerprint,
            hygiene,
            ivf,
            kmeans,
            multimodal,
            pii,
            pipeline,
            quantize,
            ranking,
            sampling,
            similarity,
            text,
            udfs,
        )

        mods += [
            dedup, similarity, text, multimodal, ranking, udfs, ivf, pipeline,
            clustering, kmeans, sampling, hygiene, pii, quantize, entity,
            fingerprint,
        ]
    except ImportError:
        pass
    try:
        from .streaming import events_batch

        mods.append(events_batch)
    except ImportError:
        pass
    return mods


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for m in _modules():
        for name, fn in m.QUERIES.items():
            assert name not in out, f"duplicate query name {name}"
            out[name] = fn
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(getattr(m, "ORACLES", {}))
    return out
