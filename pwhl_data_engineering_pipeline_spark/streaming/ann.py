"""Streaming IVF index maintenance — the dense-ANN twin of
streaming/search.py's BM25 ingestion (VERDICT r10 #2).

An embedding corpus that grows continuously (encoder output over a crawl
feed) needs its inverted file maintained without re-routing what is
already indexed. ``ivf_append`` (operators/similarity.py) is the batch
primitive — since r10 it shares the BM25 index's batch-visibility
machinery (batch partitions + versioned manifest + age-gated repair), so
wiring it into Structured Streaming is the same shape as
``streaming_bm25_ingest``, with exactly-once on BOTH sides:

- **Data side**: each micro-batch commits into a snapshot table through
  ``snapshots.commit_stream_batch`` — a replayed (stream_id, epoch) is a
  metadata no-op that still drains the frame (the stateful-upstream
  STATE_STORE_COMMIT_VALIDATION_FAILED lesson from r9).
- **Index side**: the batch id derives from the epoch
  (``{stream_id}-e{epoch}``), so replay is idempotent: a committed epoch
  re-appends as a metadata no-op, a crashed one purges its half-landed
  files and rewrites, and probes only ever see batches the committed
  manifest lists — no torn-epoch window.

Routing uses the index-RESIDENT centroid set (``ivf_append``'s r11
default), so the stream survives an offline :func:`ivf_recompact`
between runs with no rewiring: the next epoch routes with the flipped
centroids automatically. A recompact that flips MID-epoch surfaces as
``ivf_append``'s loud centroids-changed abort; the stream run fails,
and the replay re-routes the epoch against the new set (the crashed
attempt's rows are invisible orphans the re-append purges) — the
exactly-once story holds through the repair.

Contract inherited from ``ivf_append``: epoch batches carry vec_ids
disjoint from everything already indexed (pure-append ingestion).
Duplicate/redelivered VECTORS are a dedup concern — compose
``streaming_dedup_keys`` upstream, exactly as the BM25 sink does.
Centroid-quality creep is the documented drift story: poll
``similarity.ivf_needs_recompact(spark, index_path)`` from a scheduler
between runs and answer with ``ivf_recompact`` in a maintenance window
(single-writer — do not run it while the stream is mid-epoch).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

from ..operators.similarity import (
    _ivf_read_manifest,
    ivf_append,
    ivf_index,
    ivf_write,
)
from ..operators.search import _check_batch_id

logger = logging.getLogger(__name__)


def streaming_ivf_ingest(
    stream: DataFrame,
    index_path: str,
    table_path: str,
    checkpoint_dir: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    refine_iterations: int = 0,
    trigger_once: bool = True,
    stream_id: str = "ivf",
):
    """Continuous dense-ANN ingestion: every micro-batch lands exactly-once
    in a snapshot table AND in the persisted IVF index.

    Day-one bootstrap: a missing (or manifest-less half-built) index is
    (re)created from the first batch — centroids train on that batch
    (``n_centroids``/``refine_iterations``) and ``ivf_write`` persists
    them index-resident; the rebuild is idempotent, so a crash anywhere
    inside bootstrap replays clean. Later epochs ``ivf_append`` under
    their epoch-derived batch id, routed by the resident centroids.
    Bootstrap-batch centroids are a *bootstrap-sized* sample of the
    eventual corpus — exactly the drift scenario the scheduler probe
    watches; expect ``ivf_needs_recompact`` to fire earlier on a stream
    whose first epoch was small or unrepresentative.

    ``stream_id`` and ``checkpoint_dir`` must be RETIRED TOGETHER (the
    same rule as ``streaming_bm25_ingest``): reusing a stream_id against
    an existing index from a fresh checkpoint restarts epochs at 0 and
    every append no-ops as "already committed" — new vectors would be
    silently dropped. Skipped non-replay epochs log warnings for this.

    Returns the started StreamingQuery (``trigger_once=True`` uses
    availableNow for batch-style catch-up runs).
    """
    from ..sources.snapshots import commit_stream_batch

    _check_batch_id(f"{stream_id}-e0")  # fail at wiring time, not epoch time

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        commit_stream_batch(batch_df, epoch_id, table_path, stream_id)
        ivf_index_epoch_step(
            batch_df,
            epoch_id,
            index_path,
            vec_col=vec_col,
            id_col=id_col,
            n_centroids=n_centroids,
            refine_iterations=refine_iterations,
            stream_id=stream_id,
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ivf_index_epoch_step(
    batch_df: DataFrame,
    epoch_id: int,
    index_path: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    refine_iterations: int = 0,
    stream_id: str = "ivf",
) -> None:
    """The index half of a foreachBatch body: bootstrap-or-append
    ``batch_df`` into the persisted IVF index under the epoch-derived
    batch id ``{stream_id}-e{epoch_id}`` — the exact shape of
    ``search.bm25_index_epoch_step``, factored out so composed sinks
    (dedup-then-index pipelines) reuse the replay-idempotent step.
    Runs on BOTH fresh and replayed epochs: the batch id makes a
    committed epoch a no-op (logged) and a crashed one a purge+rewrite
    repair. An EMPTY micro-batch (availableNow watermark-advance epochs
    under a stateful upstream) appends as a zero-vector batch-id
    registration — harmless, and keeps the epoch ledger faithful."""
    spark = batch_df.sparkSession
    if _ivf_read_manifest(spark, index_path) is None:
        if batch_df.isEmpty():
            return  # nothing to bootstrap from; next non-empty epoch builds
        cent, assigned = ivf_index(
            batch_df,
            n_centroids=n_centroids,
            vec_col=vec_col,
            id_col=id_col,
            refine_iterations=refine_iterations,
        )
        ivf_write(assigned, index_path, cent, batch_id=f"{stream_id}-e{epoch_id}")
        return
    res = ivf_append(
        batch_df,
        index_path,
        vec_col=vec_col,
        id_col=id_col,
        batch_id=f"{stream_id}-e{epoch_id}",
    )
    if res["skipped"]:
        # Expected exactly once per crash-replayed epoch; on a fresh run
        # it means a recycled stream_id (see docstring) and the epoch's
        # vectors did NOT enter the index.
        logger.warning(
            "streaming_ivf_ingest: epoch %s (batch id %s) was already "
            "committed to %s — replay no-op, or a recycled stream_id "
            "whose vectors are being dropped",
            epoch_id,
            res["batch_id"],
            index_path,
        )


def streaming_pq_ingest(
    stream: DataFrame,
    index_path: str,
    table_path: str,
    checkpoint_dir: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    m: int = 8,
    k: int = 64,
    iters: int = 5,
    refine_iterations: int = 0,
    trigger_once: bool = True,
    stream_id: str = "pq",
):
    """Continuous compressed-ANN ingestion — the PQ twin of
    :func:`streaming_ivf_ingest`, over the r11 persisted-PQ lifecycle
    (operators/pq.py: batch-visibility appends + versioned resident
    codebooks/centroids): every micro-batch lands exactly-once in a
    snapshot table AND as residual codes in the persisted IVFADC index.

    Day-one bootstrap: the first non-empty batch trains the coarse
    centroids AND the residual codebooks and ``pq_write``s them
    index-resident, stamping the quantization-error baseline from the
    batch itself (the raw vectors are in hand exactly here — the reason
    the drift probe's sample argument is natural in a streaming
    deployment). Later epochs ``pq_append`` under epoch-derived batch
    ids, routed and encoded by the COMMITTED set, so an offline
    :func:`~..operators.pq.pq_recompact` between runs (fed from the
    snapshot table, the system-of-record this sink maintains for
    exactly that purpose — codes are lossy) needs no rewiring.
    Bootstrap-batch codebooks are a bootstrap-sized sample of the
    eventual corpus: expect ``pq_needs_recompact`` (probed with a raw
    sample of recent epochs) to fire earlier on a stream whose first
    epoch was small or unrepresentative.

    Same retire-together rule as every epoch-keyed sink here:
    ``stream_id`` and ``checkpoint_dir`` live and die as a pair."""
    from ..sources.snapshots import commit_stream_batch

    _check_batch_id(f"{stream_id}-e0")

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        commit_stream_batch(batch_df, epoch_id, table_path, stream_id)
        pq_index_epoch_step(
            batch_df,
            epoch_id,
            index_path,
            vec_col=vec_col,
            id_col=id_col,
            n_centroids=n_centroids,
            m=m,
            k=k,
            iters=iters,
            refine_iterations=refine_iterations,
            stream_id=stream_id,
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def pq_index_epoch_step(
    batch_df: DataFrame,
    epoch_id: int,
    index_path: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    m: int = 8,
    k: int = 64,
    iters: int = 5,
    refine_iterations: int = 0,
    stream_id: str = "pq",
) -> None:
    """The PQ-index half of a foreachBatch body — bootstrap-or-append
    under the epoch-derived batch id ``{stream_id}-e{epoch_id}``, the
    exact replay-idempotence shape of :func:`ivf_index_epoch_step`
    (committed epoch → logged no-op; crashed epoch → purge+rewrite
    repair; empty epoch on an unbuilt index → wait for data)."""
    from ..operators import pq as pqm
    from ..operators.similarity import ivf_index as _ivf_index

    spark = batch_df.sparkSession
    if pqm._pq_read_manifest(spark, index_path) is None:
        if batch_df.isEmpty():
            return  # nothing to bootstrap from; next non-empty epoch builds
        cent, assigned = _ivf_index(
            batch_df,
            n_centroids=n_centroids,
            vec_col=vec_col,
            id_col=id_col,
            refine_iterations=refine_iterations,
        )
        books = pqm.pq_train_residual(
            batch_df, assigned, cent, m=m, k=k,
            vec_col=vec_col, id_col=id_col, iters=iters,
        )
        pqm.pq_write(
            pqm.pq_encode_residual(
                batch_df, assigned, cent, books, vec_col=vec_col, id_col=id_col
            ),
            index_path,
            books,
            cent,
            batch_id=f"{stream_id}-e{epoch_id}",
            vectors=batch_df,
        )
        return
    res = pqm.pq_append(
        batch_df,
        index_path,
        vec_col=vec_col,
        id_col=id_col,
        batch_id=f"{stream_id}-e{epoch_id}",
    )
    if res["skipped"]:
        logger.warning(
            "streaming_pq_ingest: epoch %s (batch id %s) was already "
            "committed to %s — replay no-op, or a recycled stream_id "
            "whose vectors are being dropped",
            epoch_id,
            res["batch_id"],
            index_path,
        )
