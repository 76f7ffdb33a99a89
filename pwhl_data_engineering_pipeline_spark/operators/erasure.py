"""Cross-index erasure orchestration — the whole GDPR workflow in one
call (r12 capstone on the per-index delete paths).

A production corpus is indexed MANY ways at once: the snapshot table is
the system-of-record, BM25 serves lexical retrieval, IVF/PQ serve dense
retrieval, and the MinHash band index gates ADMISSION of future
documents. An erasure request is only honored when the document leaves
ALL of them — and the index deletes are separate commits, so a workflow
that crashes halfway must be resumable without double-applying or
silently skipping a target.

:func:`erase_everywhere` composes the five delete paths under ONE shared
``erasure_id``:

- every index delete is the per-index tombstone commit
  (``bm25_delete`` / ``ivf_delete`` / ``pq_delete`` /
  ``minhash_index_delete``), all idempotent on their batch_id and all
  refusing a reused id with a different id set (ADVICE r11) — so a
  re-run of a crashed sweep re-applies exactly the missing targets and
  metadata-skips the committed ones;
- the snapshot delete is a keyed anti-join rewrite
  (``snapshots.snapshot_delete``), idempotent by construction.

Failure semantics: targets are attempted IN ORDER and the first failure
raises with the per-target results so far attached
(``EraseSweepError.results``) — re-run with the SAME ``erasure_id`` to
resume. Masking is immediate on every committed target; the bytes leave
each index at its own purge (``bm25_index_compact`` / ``ivf_recompact``
/ ``pq_recompact`` / ``minhash_index_compact(out_path)``), and the
snapshot's PRE-delete versions remain time-travelable until ``vacuum``
drops them — both documented SLAs, surfaced in the returned
``purge_pending`` list so a scheduler can close the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class EraseSweepError(RuntimeError):
    """A target failed mid-sweep. ``results`` holds the per-target
    outcomes committed before the failure; re-run `erase_everywhere`
    with the same ``erasure_id`` to resume idempotently."""

    def __init__(self, message: str, results: dict):
        super().__init__(message)
        self.results = results


def erase_everywhere(
    spark,
    ids: DataFrame,
    targets: dict,
    erasure_id: str | None = None,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> dict:
    """Apply one erasure request to every index and table it lives in.

    ``targets`` maps target kinds to locations; recognized kinds:

    - ``"bm25"`` → persisted BM25 index path (id column ``doc_id``)
    - ``"ivf"`` → persisted IVF index path (id column ``vec_id_col``)
    - ``"pq"`` → persisted PQ index path (id column ``vec_id_col``)
    - ``"minhash"`` → persisted MinHash band index path (``id_col``)
    - ``"snapshot"`` → snapshot table path (keyed delete on ``id_col``)

    ``ids`` must carry ``id_col``; for the vector indexes it is renamed
    to ``vec_id_col`` (document and embedding ids share a key space in
    this engine's corpus model — pass a pre-renamed frame and
    ``id_col=vec_id_col`` if yours don't).

    ``erasure_id`` defaults to a fresh uuid-derived batch id; PASS AN
    EXPLICIT ONE in any workflow that might crash and re-run, so the
    resume hits the per-index idempotent-skip paths instead of
    committing duplicate tombstone batches (harmless for masking, but
    each adds a manifest version and an anti-join input).

    Returns ``{"erasure_id", "n_ids", "results": {kind: per-target
    result}, "purge_pending": [kinds whose bytes await their purge]}``.
    """
    import uuid as _uuid

    from pyspark.sql import functions as F

    from ..sources import snapshots
    from . import dedup, pq as pqm, search, similarity

    known = {"bm25", "ivf", "pq", "minhash", "snapshot"}
    unknown = set(targets) - known
    if unknown:
        raise ValueError(
            f"unknown erasure target kinds {sorted(unknown)}; expected "
            f"a subset of {sorted(known)}"
        )
    if erasure_id is None:
        erasure_id = "e" + _uuid.uuid4().hex[:16]
    search._check_batch_id(erasure_id)
    keyed = ids.select(F.col(id_col)).distinct()
    n_ids = keyed.count()
    vec_ids = keyed.withColumnRenamed(id_col, vec_id_col)
    results: dict = {}
    plan = [
        ("snapshot", lambda p: {
            "version": snapshots.snapshot_delete(keyed, p, [id_col], retries=1)
        }),
        ("minhash", lambda p: dedup.minhash_index_delete(
            spark, p, keyed, id_col=id_col, batch_id=erasure_id
        )),
        ("bm25", lambda p: search.bm25_delete(
            spark, p, keyed.withColumnRenamed(id_col, "doc_id"),
            batch_id=erasure_id,
        )),
        ("ivf", lambda p: similarity.ivf_delete(
            spark, p, vec_ids, id_col=vec_id_col, batch_id=erasure_id
        )),
        ("pq", lambda p: pqm.pq_delete(
            spark, p, vec_ids, id_col=vec_id_col, batch_id=erasure_id
        )),
    ]
    for kind, fn in plan:
        if kind not in targets:
            continue
        try:
            results[kind] = fn(targets[kind])
        except Exception as e:
            raise EraseSweepError(
                f"erasure {erasure_id!r} failed at target {kind!r} "
                f"({targets[kind]}): {e}. Targets committed before the "
                f"failure: {sorted(results)}. Re-run with the SAME "
                "erasure_id to resume (committed targets skip "
                "idempotently).",
                results,
            ) from e
    purge_pending = [k for k in results if k != "snapshot"]
    if "snapshot" in results:
        # pre-delete versions remain time-travelable until vacuum
        purge_pending.append("snapshot:vacuum")
    return {
        "erasure_id": erasure_id,
        "n_ids": int(n_ids),
        "results": results,
        "purge_pending": purge_pending,
    }


def purge_everywhere(
    spark,
    targets: dict,
    vectors: DataFrame | None = None,
    minhash_out: str | None = None,
    vacuum_min_age_seconds: float = 0.0,
    reclaim_min_age_seconds: float = 0.0,
    vec_id_col: str = "vec_id",
) -> dict:
    """The second half of the erasure SLA: make the BYTES leave every
    surface :func:`erase_everywhere` masked. Per target kind:

    - ``bm25`` → :func:`search.bm25_index_compact` (drops tombstoned
      postings, recomputes df + corpus scalars, restamps delete-covered
      champion sidecars);
    - ``ivf`` → :func:`similarity.ivf_recompact` (retrain + re-route
      over the survivors, tombstone tables retired and swept);
    - ``pq`` → :func:`pq.pq_recompact` — needs RAW vectors (codes are
      lossy): pass ``vectors`` as the system-of-record embedding table;
      the pending tombstones are anti-joined out here, and the
      recompact's own guards then refuse a corpus that is wrong-sized
      or smuggles tombstoned ids back in;
    - ``minhash`` → :func:`dedup.minhash_index_compact(out_path=...)`
      (parquet can't self-overwrite, so the purged copy lands at
      ``minhash_out`` — REQUIRED when a minhash target has pending
      tombstones; swap paths at the orchestration layer);
    - ``snapshot`` → :func:`snapshots.vacuum` keeping only the current
      version, age-gated by ``vacuum_min_age_seconds`` (0 = drop every
      pre-delete version now; raise it to honor a time-travel window —
      the rows stay readable until then, the documented SLA).

    Targets with nothing pending are cheap no-ops (each compact is
    idempotent). Returns per-target purge observables plus
    ``still_pending`` — kinds whose purge could NOT run (e.g. a minhash
    target without ``minhash_out``, a pq target without ``vectors``)
    rather than silently skipping an erasure obligation."""
    from ..sources import snapshots
    from . import dedup, pq as pqm, search, similarity

    known = {"bm25", "ivf", "pq", "minhash", "snapshot"}
    unknown = set(targets) - known
    if unknown:
        raise ValueError(
            f"unknown purge target kinds {sorted(unknown)}; expected a "
            f"subset of {sorted(known)}"
        )
    results: dict = {}
    still_pending: list[str] = []
    # precondition scan FIRST (metadata-only): a purge that cannot honor
    # one of its targets must refuse before doing any work, not after
    # compacting half the surfaces
    if "pq" in targets and vectors is None:
        # _pq_read_manifest, not _read_scalars (ADVICE r12): a
        # manifest-less pre-r11 PQ index means 'no tombstones', the same
        # graceful posture every other PQ reader takes — not a
        # FileNotFoundError out of a purge that has nothing to purge
        if (pqm._pq_read_manifest(spark, targets["pq"]) or {}).get("tombstones"):
            still_pending.append("pq")
    if "minhash" in targets and minhash_out is None:
        if dedup._minhash_meta(spark, targets["minhash"]).get("tombstones"):
            still_pending.append("minhash")
    if still_pending:
        raise EraseSweepError(
            f"purge cannot run for {still_pending} (minhash needs "
            "minhash_out; pq needs the raw survivor vectors) — these "
            "targets still hold erased bytes; nothing was purged.",
            {},
        )
    if "bm25" in targets:
        results["bm25"] = search.bm25_index_compact(
            spark, targets["bm25"],
            reclaim_min_age_seconds=reclaim_min_age_seconds,
        )
    if "ivf" in targets:
        results["ivf"] = similarity.ivf_recompact(
            spark, targets["ivf"],
            reclaim_min_age_seconds=reclaim_min_age_seconds,
        )
    if "pq" in targets:
        meta = pqm._pq_read_manifest(spark, targets["pq"]) or {}
        if not meta.get("tombstones"):
            # nothing pending — do NOT run a recompact just because
            # vectors were provided: purge is the erasure obligation,
            # not drift repair, and a caller's system-of-record frame
            # need not match an already-purged index row-for-row
            # (vectors-is-None with tombstones pending cannot reach
            # here — the up-front precondition scan already refused)
            results["pq"] = {"skipped": True, "reason": "no tombstones"}
        else:
            tomb = pqm._pq_tombstones(spark, targets["pq"], meta, vec_id_col)
            live = (
                vectors if tomb is None
                else vectors.join(tomb, vec_id_col, "left_anti")
            )
            results["pq"] = pqm.pq_recompact(
                spark, targets["pq"], live,
                reclaim_min_age_seconds=reclaim_min_age_seconds,
            )
    if "minhash" in targets:
        if minhash_out is None:
            results["minhash"] = {"skipped": True, "reason": "no tombstones"}
        else:
            results["minhash"] = {
                "hot_buckets": dedup.minhash_index_compact(
                    spark, targets["minhash"], out_path=minhash_out
                ),
                "purged_path": minhash_out,
            }
    if "snapshot" in targets:
        results["snapshot"] = snapshots.vacuum(
            spark, targets["snapshot"], keep_last=1,
            min_age_seconds=vacuum_min_age_seconds,
        )
    return {"results": results, "still_pending": still_pending}
