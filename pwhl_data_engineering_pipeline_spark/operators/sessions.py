"""Sessionization — gap-based event sessions, batch and streaming forms.

Beyond the reference surface (it has no event streams; SURVEY.md §2.10), but
a core operator for event/training-data pipelines. The batch form is pure
window functions (lag → new-session flag → running sum), so it stays
shuffle-bounded by the session key; the streaming form uses Spark's native
``session_window`` with a watermark.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_sec(c: Column) -> Column:
    """Epoch seconds from TIMESTAMP *or* TIMESTAMP_NTZ (plain parquet
    timestamps read as NTZ on Spark 4, which cannot cast to long directly;
    the intermediate cast interprets NTZ in the session timezone — pinned
    UTC by session.get_spark — so gaps/durations are identical either way)."""
    return c.cast("timestamp").cast("long")


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Assign 1-based per-key session ids: a new session starts when the gap
    to the previous event exceeds ``gap_seconds``.

    One window (= one shuffle on the key). ``order_tiebreak`` columns make
    ordering total when timestamps can tie — required for determinism.
    """
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in order_tiebreak]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull()
        | ((_epoch_sec(F.col(ts_col)) - _epoch_sec(prev)) > gap_seconds),
        1,
    ).otherwise(0)
    running = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_session).over(running))


def session_stats(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Sessionize then aggregate: one row per (key, session) with event count
    and duration — the standard session-level feature table."""
    s = sessionize(df, ts_col, key_cols, gap_seconds, order_tiebreak)
    return s.groupBy(*key_cols, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (_epoch_sec(F.max(F.col(ts_col))) - _epoch_sec(F.min(F.col(ts_col)))).alias(
            "duration_sec"
        ),
        F.min(F.col(ts_col)).alias("session_start"),
    )


def streaming_sessionize(
    stream: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap_seconds: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming equivalent via native ``session_window`` (merging windows
    with a dynamic gap); append mode emits sessions the watermark has closed.
    Same session semantics as :func:`sessionize` for a bounded input."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds").alias("sw"),
            *key_cols,
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *key_cols,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
