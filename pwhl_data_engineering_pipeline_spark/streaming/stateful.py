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
