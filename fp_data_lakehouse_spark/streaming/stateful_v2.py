"""Spark 4.x-native stateful processing: ``transformWithStateInPandas``
with typed state handles on the RocksDB state store — the successor API
to ``applyInPandasWithState`` (streaming/stateful.py keeps the classic
form; both ship because both run in production fleets today).

Operator: per-user lifetime running totals (event count + exact value
cents), emitted as an update per micro-batch. State is one ValueState
tuple per user — the canonical "running counters with unbounded
lifetime" shape that the classic API forces into hand-rolled timeout
management and this API makes a typed handle.

Environment note: the API's JVM↔Python state protocol needs a working
``google.protobuf``; this container ships a broken one, so the
convergence test skips here (pytest.importorskip) and runs wherever
the dependency is intact. The classic-API operators in stateful.py
carry the tested stateful coverage in this environment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class RunningTotalsProcessor(StatefulProcessor):
    """ValueState(n_events, value_cents) per user; each micro-batch
    folds its rows into the state and emits the new totals."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n LONG, cents LONG")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._totals.exists():
            n, cents = self._totals.get()
        else:
            n, cents = 0, 0
        for pdf in rows:
            n += len(pdf)
            cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_cents": [cents]}
        )

    def close(self) -> None:
        pass


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user running totals over an events stream. The session must
    use the RocksDB state store provider (see ROCKSDB_PROVIDER — a
    runtime conf, set before the query starts)."""
    return events.select("user_id", "value").groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType="user_id LONG, n_events LONG, value_cents LONG",
        outputMode="Update",
        timeMode="None",
    )
