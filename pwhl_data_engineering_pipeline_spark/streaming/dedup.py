"""Streaming deduplication — the ingestion-side twin of operators.dedup.

A training-data feed (crawler output, event bus) redelivers records: at-least-
once sources, retried producers, overlapping crawl frontiers. Deduplicating at
ingestion keeps every downstream table append-only and idempotent.

Two standard modes, both pure Structured Streaming:

- :func:`streaming_dedup_keys` — ``dropDuplicates`` on exact keys with a
  watermark bound: state holds one entry per key seen within the watermark
  horizon, and Spark evicts state older than the watermark — bounded memory
  at any throughput. Records later than the watermark are dropped by the
  engine (the standard lateness trade-off).
- :func:`streaming_dedup_content` — same machinery keyed on the xxhash64
  content fingerprint (functions.text.fingerprint), so near-identical
  whitespace/case variants of a document collapse at the door. State is an
  8-byte hash per document inside the horizon, not the text.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..functions.text import fingerprint


def streaming_dedup_keys(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key event stream within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` semantics via ``dropDuplicates`` on
    (keys) after a watermark: Spark's dedup state is scoped to the watermark,
    so duplicates arriving within ``watermark`` of the original are dropped
    and state cannot grow without bound."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates([*keys])


def streaming_dedup_content(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Content-fingerprint streaming dedup: normalized-text xxhash64 as the
    dedup key (exact-normalized duplicates collapse; near-dup belongs to the
    batch MinHash/SimHash operators). The fingerprint column is kept in the
    output for downstream lineage joins."""
    keyed = stream.withColumn("__fp", fingerprint(text_col))
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicates(["__fp"])
        .withColumnRenamed("__fp", "content_fingerprint")
    )


def streaming_neardup_ingest(
    stream: DataFrame,
    index_path: str,
    table_path: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_k: int = 5,
    seed: int = 42,
    impl: str = "arrow",
    max_bucket: int = 64,
    trigger_once: bool = True,
    stream_id: str = "neardup",
):
    """Continuous NEAR-dup-suppressed ingestion: each micro-batch probes
    the persisted MinHash band index (operators.dedup — the corpus is
    never re-hashed), commits only surviving documents into a snapshot
    table, then appends the survivors' buckets to the index so later
    batches — and later RESTARTS — dedup against everything already
    admitted. The exact-dup streaming modes above need only watermark
    state; this is the LSH completion their docstrings defer to.

    Delivery semantics, stated precisely:

    - **Data side is exactly-once.** Survivors land via
      ``snapshots.commit_stream_batch`` — a replayed (stream_id, epoch)
      is a metadata no-op, so crash-replays never double-admit.
    - **Index side is at-least-once per bucket row.** The survivor append
      runs AFTER the data commit; a crash between the two leaves the
      batch admitted but (partially) un-indexed, and the replay skips the
      no-op data commit but re-runs the index append. Duplicate bucket
      rows are harmless (pair generation de-dups); the true edge case is
      a crash MID-append: probing on replay may see a survivor's partial
      buckets, drop it from the recomputed survivor set, and leave its
      remaining buckets unindexed — later copies of that one document are
      then detectable only through its partial buckets. Data correctness
      is unaffected; full index repair is one
      ``minhash_index_compact`` + ``refresh_hot_sidecar`` pass.

    Bootstrap: a missing index is day-one, not an error — batch one
    dedups within itself and its survivors CREATE the index.
    """
    from ..operators import dedup as batch_dedup
    from ..sources.snapshots import commit_stream_batch

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        survivors = batch_dedup.dedup_minhash_incremental(
            spark,
            batch_df,
            index_path,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            num_bands=num_bands,
            shingle_k=shingle_k,
            seed=seed,
            impl=impl,
            max_bucket=max_bucket,
            append_survivors=False,
        )
        committed = commit_stream_batch(survivors, epoch_id, table_path, stream_id)
        if committed is None:
            return  # replayed epoch: data already admitted
        batch_dedup.minhash_index_write(
            survivors,
            index_path,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            num_bands=num_bands,
            shingle_k=shingle_k,
            seed=seed,
            impl=impl,
            max_bucket=max_bucket,
            mode="append",
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
