"""Streaming BM25 index maintenance — the search-side twin of
streaming/dedup.py's near-dup ingestion.

A retrieval corpus that grows continuously (crawl output, document feeds)
needs its inverted index maintained without re-tokenizing what is already
indexed. ``bm25_index_append`` (operators/search.py) is the batch
primitive; this module wires it into Structured Streaming with
EXACTLY-ONCE semantics on BOTH sides, which the r8 batch-visibility
switch makes almost free to state:

- **Data side**: each micro-batch commits into a snapshot table through
  ``snapshots.commit_stream_batch`` — a replayed (stream_id, epoch) is a
  metadata no-op.
- **Index side**: the batch id is DERIVED from the epoch
  (``{stream_id}-e{epoch}``), so the append itself is idempotent under
  replay: a fully-committed epoch re-appends as a metadata no-op, a
  crashed append purges its own half-landed files and rewrites, and
  probes only ever score batches the committed scalars list — there is
  no window where a probe sees a torn epoch. No manifest re-reading is
  needed (unlike the near-dup repair in streaming/dedup.py, where the
  recomputed survivor set could not be trusted): the batch content here
  is exactly the replayed source micro-batch.

Contract inherited from ``bm25_index_append``: epoch batches carry doc
ids disjoint from everything already indexed (pure-append ingestion).
Redelivered/duplicate DOCUMENTS are a dedup concern — compose
``streaming_dedup_keys`` / ``streaming_dedup_content`` upstream (the
composition is exercised end-to-end, crash included, in
``test_streaming.py::test_streaming_dedup_then_bm25_compose``). The
subtlety that composition surfaced: a replayed epoch where BOTH bodies
no-op must still execute the micro-batch plan once, or the upstream
dedup's state stores never commit and Spark fails the replay run with
STATE_STORE_COMMIT_VALIDATION_FAILED — ``commit_stream_batch`` drains
the frame on its skip path for exactly this reason, which also covers
the index append's skip (it only skips when the table side already
skipped-and-drained or committed-and-consumed). Note availableNow runs
with a stateful upstream add empty watermark-advance micro-batches;
they land as empty committed epochs (harmless — zero postings, one
batch-list entry that the next compaction folds away).
Segment growth is the documented creep: pass ``autocompact_after=N``
so the stream compacts itself in-line whenever the committed batch
count reaches N (safe under live probes/appends via the age-gated
reclaim — see ``bm25_index_compact``), or poll
``operators.search.needs_compaction(spark, index_path)`` from a
scheduler between runs.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

from ..operators.search import (
    _check_batch_id,
    _read_scalars,
    bm25_index_append,
    bm25_index_write,
)

logger = logging.getLogger(__name__)


def streaming_bm25_ingest(
    stream: DataFrame,
    index_path: str,
    table_path: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    trigger_once: bool = True,
    stream_id: str = "bm25",
    autocompact_after: int | None = None,
):
    """Continuous ingestion: every micro-batch lands exactly-once in a
    snapshot table AND in the persisted BM25 index.

    Day-one bootstrap: a missing (or scalars-less half-built) index is
    (re)created with ``bm25_index_write`` from the first batch — the full
    rebuild is idempotent, so a crash anywhere inside bootstrap replays
    clean. Later epochs append under their epoch-derived batch id.

    ``stream_id`` and ``checkpoint_dir`` must be RETIRED TOGETHER: the
    epoch-derived batch ids (``{stream_id}-e{epoch}``) are exactly what
    makes replay idempotent, so reusing a stream_id against an existing
    index from a FRESH checkpoint restarts epochs at 0 and every append
    no-ops as "already committed" — new documents would be silently
    dropped. Skipped NON-REPLAY epochs are therefore logged as warnings
    (ADVICE r8): if you see them on a first run, you have recycled a
    stream_id; pick a new one or keep the original checkpoint.

    ``autocompact_after=N`` forwards to ``bm25_index_append`` so the
    stream resets its own segment creep (age-gated reclaim keeps it safe
    under live probes).

    Returns the started StreamingQuery (``trigger_once=True`` uses
    availableNow for batch-style catch-up runs).
    """
    from ..sources.snapshots import commit_stream_batch

    _check_batch_id(f"{stream_id}-e0")  # fail at wiring time, not epoch time

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        commit_stream_batch(batch_df, epoch_id, table_path, stream_id)
        bm25_index_epoch_step(
            batch_df,
            epoch_id,
            index_path,
            text_col=text_col,
            id_col=id_col,
            n_buckets=n_buckets,
            stream_id=stream_id,
            autocompact_after=autocompact_after,
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bm25_index_epoch_step(
    batch_df: DataFrame,
    epoch_id: int,
    index_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    stream_id: str = "bm25",
    autocompact_after: int | None = None,
) -> None:
    """The index half of a foreachBatch body: bootstrap-or-append
    ``batch_df`` into the persisted BM25 index under the epoch-derived
    batch id ``{stream_id}-e{epoch_id}``. Factored out of
    :func:`streaming_bm25_ingest` so composed sinks (e.g.
    ``streaming_neardup_bm25_ingest`` in streaming/dedup.py, which must
    run its OWN data-side protocol first) reuse the exact same
    replay-idempotent step instead of re-deriving it. Runs on BOTH fresh
    and replayed epochs: the batch id makes a committed epoch a no-op
    (logged — see the stream_id-recycling warning in
    :func:`streaming_bm25_ingest`'s docstring) and a crashed one a
    purge+rewrite repair."""
    spark = batch_df.sparkSession
    try:
        _read_scalars(spark, index_path)
    except FileNotFoundError:
        bm25_index_write(
            batch_df,
            index_path,
            text_col=text_col,
            id_col=id_col,
            n_buckets=n_buckets,
            batch_id=f"{stream_id}-e{epoch_id}",
        )
        return
    res = bm25_index_append(
        batch_df,
        index_path,
        text_col=text_col,
        id_col=id_col,
        batch_id=f"{stream_id}-e{epoch_id}",
        autocompact_after=autocompact_after,
    )
    if res["skipped"]:
        # Expected exactly once per crash-replayed epoch; on a fresh
        # run it means a recycled stream_id (see docstring) and the
        # epoch's documents did NOT enter the index.
        logger.warning(
            "streaming_bm25_ingest: epoch %s (batch id %s) was already "
            "committed to %s — replay no-op, or a recycled stream_id "
            "whose documents are being dropped",
            epoch_id,
            res["batch_id"],
            index_path,
        )
