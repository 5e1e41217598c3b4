"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windowed aggregations cover time-bucketed state; this is
the escape hatch for operator semantics Spark doesn't ship — here, a
per-user running profile (event count, value sum, distinct event
types seen) maintained across micro-batches with explicit GroupState.

Scale: state lives in the state store partitioned by the grouping
key; each micro-batch touches only keys present in the batch. The
operator is the PySpark equivalent of a custom Flink KeyedProcessFunction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("n_types_seen", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("types_seen", ArrayType(StringType())),
    ]
)


def _update_user_profile(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, types = state.get
        seen = set(types)
    else:
        n, total, seen = 0, 0.0, set()
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        seen.update(pdf["event_type"].unique().tolist())
    state.update((n, total, sorted(seen)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [total],
            "n_types_seen": [len(seen)],
        }
    )


def streaming_user_profiles(events: DataFrame) -> DataFrame:
    """events (streaming) → per-user running profile."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
