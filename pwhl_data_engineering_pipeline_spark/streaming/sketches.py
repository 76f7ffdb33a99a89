"""Streaming sketch maintenance: distinct-count analytics over an unbounded
stream WITHOUT ever storing raw events.

Pattern (the streaming face of operators/sketches.py): every micro-batch is
reduced to per-key HLL sketch rows (~4 KB each, algebraic, mergeable) and
appended EXACTLY-ONCE into a snapshot table via the epoch-guarded
commit protocol (sources/snapshots.commit_stream_batch). Any later reader
answers "distinct users per day / per anything coarser" by unioning the
persisted sketches — no raw-event retention, no reprocessing, and the
estimate is within the sketch's error of having sketched the raw union
(HLL union is order- and batching-independent).

At 100 TB-of-stream scale this is the only shape that works: state is
bounded by (#keys × 2^lgk bytes) per batch, the sink writes KBs per epoch,
and a replayed batch after a crash is a metadata-level no-op rather than a
double count — double-counting is the classic failure of naive streaming
distinct counters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..operators.sketches import hll_estimate, hll_rollup
from ..sources.snapshots import commit_stream_batch, read_snapshot


def streaming_hll_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    keys: Sequence[str],
    value_col: str,
    lgk: int = 12,
    stream_id: str = "hll",
):
    """foreachBatch writer: micro-batch → per-``keys`` HLL sketches of
    ``value_col`` → one exactly-once snapshot append. Returns the
    DataStreamWriter (caller picks the trigger and starts it)."""
    key_list = list(keys)

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        sk = hll_rollup(batch_df, key_list, value_col, lgk)
        commit_stream_batch(sk, epoch_id, path, stream_id)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )


def hll_table_estimate(
    spark, path: str, keys: Sequence[str] = (), version: int | None = None
) -> DataFrame:
    """Distinct-count estimates from a persisted sketch table at any grain
    ``keys`` (empty = global), optionally time-traveled to ``version``:
    merges every committed batch's sketches for each group. The scan reads
    sketch rows (KBs per batch), never events."""
    return hll_estimate(read_snapshot(spark, path, version), list(keys))
