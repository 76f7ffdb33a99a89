"""Streaming sessionization — the incremental form of operators/sessions.py.

Spark's native ``session_window`` keeps per-key session state that absorbs
events until the gap elapses *in event time*; the watermark both bounds the
state and finalizes sessions (append mode emits a session only once no
earlier event can extend it). This is the engine's scale path for "user
activity sessions over an unbounded event stream": state is keyed by
(key, session), merged map-side, and evicted deterministically — no
collect, no per-key Python.

Batch/stream parity: ``session_window`` has identical semantics in a batch
``groupBy``, so the differential test runs the SAME aggregation both ways
and asserts the finalized sessions match (tests/test_streaming_sessions.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stats_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based session aggregation — works on a batch OR streaming frame
    (call ``withWatermark`` upstream for streams). One row per finalized
    session: keys, start/end, duration_sec, n_events, total_value."""
    return (
        events.groupBy(
            *key_cols, F.session_window(F.col(ts_col), gap).alias("sw")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            *key_cols,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            (F.col("sw.end").cast("long") - F.col("sw.start").cast("long")).alias(
                "duration_sec"
            ),
            "n_events",
            "total_value",
        )
    )


def streaming_session_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked streaming session rollup (append mode: sessions emit when
    the watermark passes their close — exactly-once finalized sessions).

    State per key is one open session struct, merged incrementally; the
    watermark evicts closed sessions so state size tracks ACTIVE keys, not
    history — the property that keeps this runnable forever at cluster scale.
    Note ``session_window``'s end is ``last_event + gap`` (the window the
    state machine closes), so duration_sec includes the trailing gap; the
    batch twin reports the same value by construction.
    """
    return session_stats_agg(
        stream.withWatermark(ts_col, watermark), ts_col, key_cols, gap
    )
