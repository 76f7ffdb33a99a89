"""Stream-stream joins with watermark-bounded state.

Two unbounded streams can only be joined if Spark can eventually DROP
buffered rows; that requires (a) watermarks on both sides and (b) a time
bound in the join condition relating the two event times. Both are enforced
here — an unbounded stream-stream join is a state leak at 100 TB, so the
API refuses to build one.

Shapes provided:
- ``stream_stream_interval_join``: inner equi-join on keys plus
  ``right_ts ∈ [left_ts + lower, left_ts + upper]`` — the click-to-
  impression / request-to-response attribution join.
- ``left`` outer variant: unmatched left rows emit with NULL right columns
  once the watermark proves no match can still arrive (Spark emits these
  only at state eviction — correct, late, and deterministic).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: int = 0,
    upper_seconds: int = 900,
    left_watermark: str = "1 hour",
    right_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: match right rows landing within
    ``[left_ts + lower, left_ts + upper]`` of each left row, per key.

    Right's watermark must cover left's watermark + the interval width or
    matches are silently dropped at eviction — callers get the safe default
    (2 h vs 1 h + 15 min). Columns: left's, then right's non-key columns.
    ``how`` ∈ {'inner', 'left'} (outer needs the time bound to evict state).
    """
    if left_ts == right_ts:
        raise ValueError("rename one side's event-time column first")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    clash = (set(left.columns) & set(right.columns)) - set(keys)
    if clash:
        raise ValueError(f"rename overlapping non-key columns first: {sorted(clash)}")
    cond = None
    for k in keys:
        c = lw[k] == rw[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (
            F.col(right_ts)
            >= F.col(left_ts) + F.expr(f"INTERVAL {lower_seconds} SECONDS")
        )
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {upper_seconds} SECONDS")
        )
    )
    joined = lw.join(rw, cond, how)
    # Collapse the duplicated key columns (lw[k] == rw[k] keeps both).
    out_cols = [lw[c] for c in left.columns] + [
        rw[c] for c in right.columns if c not in keys
    ]
    return joined.select(*out_cols)
