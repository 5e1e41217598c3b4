"""transformWithStateInPandas — Spark 4's arbitrary-stateful-processing
API (the successor to applyInPandasWithState): typed state handles
(ValueState/ListState/MapState) and timers on a StatefulProcessor.

Operator: per-user event-type tally kept in a ValueState; emits the
running totals each micro-batch. Requires the RocksDB state store
provider (the default HDFS-backed store doesn't implement the new
API) and the protobuf Python package (the TWS state-server wire
protocol) — present on standard clusters, absent in minimal
containers, where the parity test auto-skips.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_purchases", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("n_purchases", LongType())]
)


class UserTallyProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("tally", _STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        n, p = (self._state.get() or (0, 0)) if self._state.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            p += int((pdf["event_type"] == "purchase").sum())
        self._state.update((n, p))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "n_purchases": [p]})

    def close(self) -> None:
        pass


def streaming_user_tallies_tws(events: DataFrame) -> DataFrame:
    spark = events.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        UserTallyProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
