"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for stream semantics the built-in windowed aggregates can't
express (SURVEY.md §2.10 / engine north-star).

Example operator: per-key running counters with high-water marks, emitting
one updated row per key per micro-batch. State is a single compact tuple per
key (count, value sum, max ts seen) — the canonical shape for per-user
lifetime features maintained incrementally at stream scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_ts", T.TimestampType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_ts", T.TimestampType()),
    ]
)


def running_user_counters(stream: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Maintain per-user lifetime (count, value sum, latest ts) across
    micro-batches; emit the updated row for each user seen in a batch.

    ``applyInPandasWithState`` receives each key's batch rows as pandas
    frames plus its persisted state — pure-Python state transition, Arrow
    transfer, state store durability handled by Spark.
    """

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total, max_ts = (state.get if state.exists else (0, 0.0, None))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf[ts_col].max()
            if max_ts is None or batch_max > max_ts:
                max_ts = batch_max
        state.update((n, total, max_ts))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_ts": [max_ts],
            }
        )

    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_counters_tws(stream: DataFrame, ts_col: str = "ts") -> DataFrame:
    """The same per-user lifetime counters on Spark 4's
    ``transformWithStateInPandas`` — the successor stateful API
    (StatefulProcessor + typed state handles, RocksDB-backed): schema-d
    value state, explicit lifecycle, composable timers (unused here), and
    state TTL support. Semantics are identical to
    :func:`running_user_counters` by construction, and the differential
    test pins that — the engine ships both so a caller can migrate without
    a behavior change.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) — transformWithState state does
    not run on the default HDFS-backed provider — and a ``google.protobuf``
    installation: Spark's TWS driver worker speaks protobuf to the state
    server. In environments without protobuf (this container) the query
    fails at initialization with STREAMING_PYTHON_RUNNER_INITIALIZATION_
    FAILURE; the differential test is skipped there and
    :func:`running_user_counters` is the runnable path.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Counters(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "counters",
                "n_events long, total_value double, max_ts timestamp",
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            if self._state.exists():
                n, total, max_ts = self._state.get()
            else:
                n, total, max_ts = 0, 0.0, None
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                batch_max = pdf[ts_col].max()
                if max_ts is None or batch_max > max_ts:
                    max_ts = batch_max
            self._state.update((n, total, max_ts))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_ts": [max_ts],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        _Counters(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
