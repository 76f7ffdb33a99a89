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
