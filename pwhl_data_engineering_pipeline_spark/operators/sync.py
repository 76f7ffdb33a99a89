"""Index synchronization from the snapshot-table changelog — r13.

Rounds 6–12 built the persisted indexes (BM25, IVF, PQ, MinHash) their
full incremental lifecycle: batch-stamped appends, tombstone deletes,
physical purges, drift probes. What remained manual was the WIRING: the
snapshot table is the system of record, and production keeps indexes
consistent with it by consuming its changelog — not by remembering to
call the right append/delete in application code. This module is that
wiring: ``sync_indexes`` advances every registered index to the table's
current version, exactly once, crash-resumable.

Change classification (net over the synced range — intermediate churn
cancels, so a row updated five times costs one update):

- **inserted** — id present at v1, absent at v0 → index append
  (one batch per synced range, deterministic batch id).
- **deleted** — id present at v0, absent at v1 → tombstone delete
  (the r11/r12 erasure machinery; probes mask immediately, bytes leave
  at the next purge — the documented Lucene posture).
- **updated** — id present in both with different content → the
  expensive path, handled delete→PURGE→append, in that order. The
  ordering is forced by the index contracts: a re-appended tombstoned
  id is masked by every probe AND dropped by the next purge (the
  re-append-while-tombstoned caveat) — so the old version's bytes must
  physically leave (bm25_index_compact / ivf_recompact / pq_recompact)
  BEFORE the new version lands. Immutable-index updates are rewrites;
  a sync amortizes them to one purge per RANGE, not per update. Tables
  fed by the append-only streaming ingest never pay this.

Exactly-once, with crash resume: each index carries a sync stamp
(``<index>/_sync_state/v%08d.json``, an append-only version chain
published by no-overwrite rename — never a delete window) recording the last applied table version, plus a PENDING
intent written before any mutation. All data mutations use
deterministic per-range batch ids (``sa<v0>_<v1>`` append,
``sd<v0>_<v1>`` delete), so re-runs skip committed work via the
indexes' own committed-batch/tombstone-reuse checks. The ordering
hazard — a crash after the append commit must NOT re-run the
delete+purge, which would tombstone-and-purge the freshly appended
update rows — is closed by using the append commit itself as the
range's completion marker: a resumed sync that finds the range's
append batch committed skips straight to finalizing the stamp.
Corollary, loudly: do NOT run an external compaction on an index whose
sync stamp shows a PENDING range — compaction collapses the committed
batch list and would erase the completion marker a crashed sync needs;
maintenance schedulers should check :func:`sync_status` first (the
same single-maintainer contract the champion sidecars document).

MinHash updates, deliberately different: the dedup index's rows are
suppression ANCHORS, and its admission log is history
(minhash_index_delete's documented non-retroactivity). An updated
document's old signature KEEPS anchoring (future copies of the retired
content stay suppressed — conservative) and the new version's buckets
are appended beside it; erasure-grade removal of the old signature is
an explicit GDPR flow (erase_everywhere), not a side effect of an
update. Deletes DO tombstone (erasure semantics).

Scale posture: change classification is one changelog read — new data
dirs only when the range is append-shaped, the netted CHANGE DATA FEED
(O(delta), r13 CDF) when the commits carry one, and a full content
diff only for feed-less history — plus one column-pruned id-join
against the changed-id set (broadcast — erasure/delta-sized). Nothing
scans the corpus except the update path's purge, which is the price of
mutating an immutable index.

Reference anchor: the reference pipeline reloads its warehouse tables
wholesale each run (scripts/load_to_warehouse.py's truncate-reload);
this module is the incremental replacement that keeps DERIVED search
structures consistent without the reload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sources import snapshots as _snap

_KINDS = ("bm25", "ivf", "pq", "minhash")


def _state_dir(index_path: str) -> str:
    return f"{index_path.rstrip('/')}/_sync_state"


def read_state_chain(spark, state_dir: str) -> dict | None:
    """Highest committed version of an append-only state chain
    (``v%08d.json`` files published by no-overwrite rename — the
    ``_commit_scalars`` layout), or None when the chain is empty. Chosen
    over a single delete-then-rename stamp because such a stamp is often
    the ONLY record of its state: a crash inside a delete+rename window
    would lose it entirely, while a version chain always keeps the
    previous state readable. Shared by the sync stamps and the
    partitioned-IVM view state."""
    import json as _json
    import re as _re

    from ..fsutil import list_names, read_text

    best_v, best = -1, None
    for name in list_names(spark, state_dir):
        m = _re.match(r"^v(\d{8})\.json$", name)
        if m and int(m.group(1)) > best_v:
            best_v, best = int(m.group(1)), name
    if best is None:
        return None
    st = _json.loads(read_text(spark, f"{state_dir}/{best}"))
    st["_state_version"] = best_v
    return st


def write_state_chain(spark, state_dir: str, state: dict) -> None:
    """Append-only atomic publish of the next state-chain version. A lost
    rename race (two writers on one chain — outside the single-writer
    contract) raises loudly rather than silently interleaving."""
    import json as _json
    import uuid as _uuid

    from ..fsutil import delete, rename_no_overwrite, write_text

    cur = read_state_chain(spark, state_dir)
    version = (cur["_state_version"] if cur else 0) + 1
    body = {k: v for k, v in state.items() if k != "_state_version"}
    tmp = f"{state_dir}/.v{version:08d}.{_uuid.uuid4().hex}.tmp"
    write_text(spark, tmp, _json.dumps(body))
    if not rename_no_overwrite(spark, tmp, f"{state_dir}/v{version:08d}.json"):
        delete(spark, tmp)
        raise IOError(
            f"state chain v{version} commit conflict at {state_dir} "
            "(concurrent writer?) — single-writer contract violated"
        )


def _read_state(spark, index_path: str) -> dict | None:
    return read_state_chain(spark, _state_dir(index_path))


def _write_state(spark, index_path: str, state: dict) -> None:
    write_state_chain(spark, _state_dir(index_path), state)


def sync_register(
    spark, index_path: str, table_path: str, version: int | None = None
) -> dict:
    """Declare that the index at ``index_path`` reflects ``table_path``
    at ``version`` (default: the table's current version — register
    right after building the index from a snapshot read). Idempotent
    re-register at the same version; refuses to silently move an
    existing stamp (that is a resync, not a registration)."""
    v = version if version is not None else _snap.current_version(spark, table_path)
    if v is None:
        raise FileNotFoundError(f"no snapshot table at {table_path}")
    cur = _read_state(spark, index_path)
    if cur is not None:
        if cur.get("table") == table_path and cur.get("synced") == v and not cur.get("pending"):
            return {"registered": False, "synced": v}
        raise IOError(
            f"index at {index_path} already tracks "
            f"{cur.get('table')}@v{cur.get('synced')} — refusing to "
            "re-register; sync it forward instead"
        )
    _write_state(spark, index_path, {"table": table_path, "synced": v})
    return {"registered": True, "synced": v}


def sync_status(spark, index_path: str, table_path: str | None = None) -> dict:
    """{"synced", "pending", "current", "behind"} for a registered index
    — the scheduler poll (metadata-only)."""
    st = _read_state(spark, index_path)
    if st is None:
        raise FileNotFoundError(
            f"index at {index_path} is not sync-registered "
            "(sync_register after the initial build)"
        )
    table = table_path or st["table"]
    cur = _snap.current_version(spark, table)
    return {
        "table": table,
        "synced": st["synced"],
        "pending": st.get("pending"),
        "current": cur,
        "behind": (cur or 0) - st["synced"],
    }


def table_net_changes(
    spark, table_path: str, v0: int, v1: int, id_col: str,
    assume_new_ids: bool = False,
) -> dict:
    """Net id-keyed change set between two table versions:
    ``{"inserted": ids_df, "deleted": ids_df, "updated": ids_df}``.

    Append-shaped ranges read only the NEW data directories; anything
    else (merge/delete/overwrite commits) goes through the content-level
    ``snapshot_diff``. On the append path, a new id that already exists
    at v0 is REFUSED loudly (one column-pruned semi-join against v0 —
    skip it with ``assume_new_ids=True`` when the producer guarantees
    fresh ids, as the exactly-once streaming sink does): an append
    cannot remove the old row, so the table itself now holds TWO rows
    per key — a keyed-contract violation by the producer, not an update.
    Treating it as an update would index both rows (duplicate doc_ids,
    broken df/n_docs additivity); the fix belongs upstream (route
    updates through snapshot_merge, or dedup the table), after which the
    content diff classifies the range correctly."""
    empty = None
    try:
        new_rows = _snap.read_snapshot_changes(spark, table_path, v0, v1)
        new_ids = new_rows.select(F.col(id_col)).distinct()
        if not assume_new_ids and v0 > 0:
            old_ids = _snap.read_snapshot(spark, table_path, v0).select(
                F.col(id_col)
            )
            n_dup = new_ids.join(old_ids, id_col, "left_semi").count()
            if n_dup:
                raise IOError(
                    f"append-shaped range v{v0}..v{v1} of {table_path} "
                    f"re-landed {n_dup} EXISTING {id_col} value(s): the "
                    "old rows are still in the table, so it now holds "
                    "multiple rows per key — a keyed-contract violation "
                    "the index sync refuses to propagate. Route updates "
                    "through snapshot_merge (or repair the table), then "
                    "re-run the sync."
                )
        return {"inserted": new_ids, "deleted": empty, "updated": empty}
    except ValueError:
        pass
    # non-append range: prefer the O(delta) netted change feed (r13 CDF —
    # multiset-identical to the content diff, so classification is
    # unchanged); snapshot_diff's O(corpus) exceptAll only for feed-less
    # history (pre-CDF commits, rollback, plain overwrite)
    try:
        d = _snap.snapshot_changes_net(spark, table_path, v0, v1)
    except ValueError:
        d = _snap.snapshot_diff(spark, table_path, v0, v1, eager=False)
    flags = d.groupBy(id_col).agg(
        F.max(F.when(F.col("_change") == "insert", 1).otherwise(0)).alias("i"),
        F.max(F.when(F.col("_change") == "delete", 1).otherwise(0)).alias("dl"),
    )
    return {
        "inserted": flags.filter("i = 1 AND dl = 0").select(id_col),
        "deleted": flags.filter("i = 0 AND dl = 1").select(id_col),
        "updated": flags.filter("i = 1 AND dl = 1").select(id_col),
    }


def _current_rows(spark, table_path: str, v1: int, ids: DataFrame, id_col: str):
    """The v1 truth for a changed-id set — broadcast-semi-joined so the
    scan prunes to the id column's statistics and the changed rows.

    Zone-map composition (r13): when ``id_col`` is a declared stats
    column of the table, the scan is additionally bounded by the
    changed ids' [min, max] — the manifest then skips whole data
    directories before listing/footers. With monotone ids (the
    streaming-append shape) an append-range fetch opens only the new
    directories. Correct because a semi-join keeps exactly rows whose
    id is in the set, all of which lie inside the bound; NULL ids (not
    expected from keyed tables) disable the bound."""
    bounds = None
    if id_col in (_snap.read_manifest(spark, table_path, v1).get("stats_cols") or []):
        row = ids.agg(
            F.min(id_col).alias("lo"), F.max(id_col).alias("hi"),
            F.sum(F.when(F.col(id_col).isNull(), 1).otherwise(0)).alias("nn"),
        ).collect()[0]
        if row["nn"] == 0 and row["lo"] is not None:
            bounds = {id_col: (row["lo"], row["hi"])}
    return _snap.read_snapshot(spark, table_path, v1, bounds=bounds).join(
        F.broadcast(ids), id_col, "left_semi"
    )


def _range_ids(v0: int, v1: int) -> tuple[str, str]:
    return f"sa{v0}_{v1}", f"sd{v0}_{v1}"


def _sync_one(
    spark, table_path: str, index_path: str, kind: str,
    id_col: str, assume_new_ids: bool,
    delete_fn, purge_fn, append_fn, committed_append_ids,
    mutation_committed=None,
) -> dict:
    """The shared range protocol. ``delete_fn(ids, batch_id)``,
    ``purge_fn(upd_ids)`` (physical purge before re-append; None for
    kinds that never purge on update), ``append_fn(ids, batch_id)``
    (appends the v1 rows for ids), ``committed_append_ids()`` (the
    index's committed batch list, the completion markers).
    ``mutation_committed(sa, sd) -> bool`` says whether ANY mutation of
    a range's batch ids has committed — when a pending range has none
    (e.g. its classification REFUSED on a producer contract violation,
    which happens before all mutation), the resume may safely re-pin to
    the table's current version so a repaired table can sync through;
    once something committed, the pinned range is immutable (orphaned
    tombstones/appends from a half-applied range must be completed with
    THEIR batch ids, never abandoned)."""
    st = _read_state(spark, index_path)
    if st is None:
        raise FileNotFoundError(
            f"{kind} index at {index_path} is not sync-registered "
            "(sync_register after the initial build)"
        )
    if st.get("table") != table_path:
        raise ValueError(
            f"{kind} index at {index_path} tracks {st.get('table')!r}, "
            f"not {table_path!r}"
        )
    v0 = st["synced"]
    # resume an interrupted range before admitting new work: the pending
    # intent pins (v0, v1) so a crashed sync re-applies ITS range with
    # ITS batch ids even if the table advanced meanwhile
    v1 = st.get("pending")
    if v1 is not None and mutation_committed is not None:
        cur = _snap.current_version(spark, table_path)
        if cur is not None and cur > v1:
            sa_old, sd_old = _range_ids(v0, v1)
            if not mutation_committed(sa_old, sd_old):
                # nothing of the pinned range ever landed — re-pin to the
                # head so a table repaired AFTER a refused classification
                # (keyed-contract violation) can sync through cleanly
                v1 = cur
                _write_state(
                    spark, index_path,
                    {"table": table_path, "synced": v0, "pending": v1},
                )
    if v1 is None:
        cur = _snap.current_version(spark, table_path)
        if cur is None or cur < v0:
            raise ValueError(
                f"table {table_path} is at v{cur}, index synced to v{v0} "
                "— history rewritten under the index; rebuild it"
            )
        if cur == v0:
            return {"kind": kind, "path": "noop", "from_version": v0,
                    "to_version": v0, "inserted": 0, "deleted": 0,
                    "updated": 0}
        v1 = cur
        _write_state(
            spark, index_path,
            {"table": table_path, "synced": v0, "pending": v1},
        )
    sa, sd = _range_ids(v0, v1)

    ch = table_net_changes(spark, table_path, v0, v1, id_col, assume_new_ids)
    ins, dele, upd = ch["inserted"], ch["deleted"], ch["updated"]
    n_ins = ins.count() if ins is not None else 0
    n_del = dele.count() if dele is not None else 0
    n_upd = upd.count() if upd is not None else 0
    purged = False

    if sa in committed_append_ids():
        # completion marker: the append is the LAST mutation of a range,
        # so its commit proves delete+purge already ran — re-running them
        # here would tombstone-and-purge the appended update rows
        path = "resumed_complete"
    elif n_ins == n_del == n_upd == 0:
        path = "noop"
    else:
        path = "applied"
        # updates are tombstoned only on kinds that purge (minhash keeps
        # the old signature anchoring — see the module docstring)
        legs = []
        if n_del:
            legs.append(dele)
        if n_upd and purge_fn is not None:
            legs.append(upd)
        if legs:
            to_delete = legs[0] if len(legs) == 1 else legs[0].unionByName(legs[1])
            delete_fn(to_delete, sd)
        if n_upd and purge_fn is not None:
            purge_fn(upd)
            purged = True
        to_add = None
        if n_ins and n_upd:
            to_add = ins.unionByName(upd)
        elif n_ins:
            to_add = ins
        elif n_upd:
            to_add = upd
        if to_add is not None:
            append_fn(to_add, sa)
    _write_state(
        spark, index_path, {"table": table_path, "synced": v1}
    )
    return {"kind": kind, "path": path, "from_version": v0, "to_version": v1,
            "inserted": n_ins, "deleted": n_del, "updated": n_upd,
            "purged": purged}


def sync_bm25(
    spark, table_path: str, index_path: str,
    id_col: str = "doc_id", text_col: str = "text",
    assume_new_ids: bool = False,
    reclaim_min_age_seconds: float | None = None,
) -> dict:
    from . import search

    def committed():
        return search._read_scalars(spark, index_path).get("batches") or []

    def mutated(sa, sd):
        meta = search._read_scalars(spark, index_path)
        return sa in (meta.get("batches") or []) or sd in (meta.get("tombstones") or [])

    def delete_fn(ids, bid):
        search.bm25_delete(spark, index_path, ids, batch_id=bid)

    def purge_fn(_upd):
        kw = {}
        if reclaim_min_age_seconds is not None:
            kw["reclaim_min_age_seconds"] = reclaim_min_age_seconds
        search.bm25_index_compact(spark, index_path, **kw)

    def append_fn(ids, bid):
        rows = _current_rows(
            spark, table_path, _read_state(spark, index_path).get("pending"),
            ids, id_col,
        ).select(id_col, text_col)
        search.bm25_index_append(
            rows, index_path, text_col=text_col, id_col=id_col, batch_id=bid
        )

    return _sync_one(
        spark, table_path, index_path, "bm25", id_col, assume_new_ids,
        delete_fn, purge_fn, append_fn, committed,
        mutation_committed=mutated,
    )


def sync_ivf(
    spark, table_path: str, index_path: str,
    id_col: str = "vec_id", vec_col: str = "embedding",
    assume_new_ids: bool = False,
) -> dict:
    from . import similarity
    from .search import _read_scalars

    def committed():
        return _read_scalars(spark, index_path).get("batches") or []

    def mutated(sa, sd):
        meta = _read_scalars(spark, index_path)
        return sa in (meta.get("batches") or []) or sd in (meta.get("tombstones") or [])

    def delete_fn(ids, bid):
        similarity.ivf_delete(spark, index_path, ids, id_col=id_col, batch_id=bid)

    def purge_fn(_upd):
        similarity.ivf_recompact(
            spark, index_path, vec_col=vec_col, id_col=id_col
        )

    def append_fn(ids, bid):
        rows = _current_rows(
            spark, table_path, _read_state(spark, index_path).get("pending"),
            ids, id_col,
        ).select(id_col, vec_col)
        similarity.ivf_append(
            rows, index_path, vec_col=vec_col, id_col=id_col, batch_id=bid
        )

    return _sync_one(
        spark, table_path, index_path, "ivf", id_col, assume_new_ids,
        delete_fn, purge_fn, append_fn, committed,
        mutation_committed=mutated,
    )


def sync_pq(
    spark, table_path: str, index_path: str,
    id_col: str = "vec_id", vec_col: str = "embedding",
    assume_new_ids: bool = False,
) -> dict:
    from . import pq as pqm
    from .search import _read_scalars

    def committed():
        return _read_scalars(spark, index_path).get("batches") or []

    def mutated(sa, sd):
        meta = _read_scalars(spark, index_path)
        return sa in (meta.get("batches") or []) or sd in (meta.get("tombstones") or [])

    def delete_fn(ids, bid):
        pqm.pq_delete(spark, index_path, ids, id_col=id_col, batch_id=bid)

    def purge_fn(upd):
        # pq_recompact re-encodes from RAW vectors (codes are lossy) and
        # its undelete guard refuses a corpus containing tombstoned ids —
        # survivors = v1 rows minus everything not yet (re-)appended
        st = _read_state(spark, index_path)
        v1 = st.get("pending")
        live = _snap.read_snapshot(spark, table_path, v1)
        meta = _read_scalars(spark, index_path)
        tomb_ids = [f"{index_path}/_tombstones/{t}" for t in (meta.get("tombstones") or [])]
        if tomb_ids:
            tomb = spark.read.parquet(*tomb_ids).select(F.col(id_col)).distinct()
            live = live.join(tomb, id_col, "left_anti")
        # ids inserted in this range are not in the index either
        live = live.join(
            _snap.read_snapshot(spark, table_path, st["synced"]).select(id_col),
            id_col, "left_semi",
        )
        pqm.pq_recompact(
            spark, index_path, live.select(id_col, vec_col),
            vec_col=vec_col, id_col=id_col,
        )

    def append_fn(ids, bid):
        rows = _current_rows(
            spark, table_path, _read_state(spark, index_path).get("pending"),
            ids, id_col,
        ).select(id_col, vec_col)
        pqm.pq_append(rows, index_path, vec_col=vec_col, id_col=id_col, batch_id=bid)

    return _sync_one(
        spark, table_path, index_path, "pq", id_col, assume_new_ids,
        delete_fn, purge_fn, append_fn, committed,
        mutation_committed=mutated,
    )


def sync_minhash(
    spark, table_path: str, index_path: str,
    id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = 32, num_bands: int = 8, shingle_k: int = 5,
    seed: int = 42, max_bucket: int = 64,
    assume_new_ids: bool = False,
) -> dict:
    """MinHash sync: inserts and UPDATES both append the new version's
    buckets (the old signature keeps anchoring — see the module
    docstring; updates are NOT erasure); deletes tombstone. The dedup
    index has no batch stamping (at-least-once rows are idempotent
    candidate generators), so a resumed range may re-land bucket rows —
    duplicates only re-propose the same pairs and the next compact
    reclaims them; the completion marker here is the finalized stamp."""
    from . import dedup

    def committed():
        return []  # at-least-once appends; no marker, re-append is safe

    def mutated(sa, sd):
        # appends are unverifiable here (no batch stamping) but duplicate
        # bucket rows are the index's documented-safe posture, so only a
        # committed tombstone pins the range
        meta = dedup._minhash_meta(spark, index_path)
        return sd in (meta.get("tombstones") or [])

    def delete_fn(ids, bid):
        dedup.minhash_index_delete(spark, index_path, ids, id_col=id_col, batch_id=bid)

    def append_fn(ids, bid):
        rows = _current_rows(
            spark, table_path, _read_state(spark, index_path).get("pending"),
            ids, id_col,
        ).select(id_col, text_col)
        dedup.minhash_index_write(
            rows, index_path, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, num_bands=num_bands, shingle_k=shingle_k,
            seed=seed, max_bucket=max_bucket, mode="append",
        )

    return _sync_one(
        spark, table_path, index_path, "minhash", id_col, assume_new_ids,
        delete_fn, None, append_fn, committed,
        mutation_committed=mutated,
    )


def sync_indexes(
    spark, table_path: str, targets: dict,
    id_col: str = "doc_id", text_col: str = "text",
    vec_col: str = "embedding", vec_id_col: str | None = None,
    assume_new_ids: bool = False,
) -> dict:
    """One call, every index follows the table: ``targets`` maps kind →
    index path (any subset of bm25/ivf/pq/minhash). Each index advances
    independently from ITS stamp to the table's current version, so a
    new index can join mid-life and a previously-failed one catches up.
    Returns per-kind observables."""
    unknown = set(targets) - set(_KINDS)
    if unknown:
        raise ValueError(
            f"unknown sync target kinds {sorted(unknown)}; expected a "
            f"subset of {sorted(_KINDS)}"
        )
    vid = vec_id_col or id_col
    fns = {}
    if "bm25" in targets:
        fns["bm25"] = lambda: sync_bm25(
            spark, table_path, targets["bm25"], id_col, text_col, assume_new_ids
        )
    if "ivf" in targets:
        fns["ivf"] = lambda: sync_ivf(
            spark, table_path, targets["ivf"], vid, vec_col, assume_new_ids
        )
    if "pq" in targets:
        fns["pq"] = lambda: sync_pq(
            spark, table_path, targets["pq"], vid, vec_col, assume_new_ids
        )
    if "minhash" in targets:
        fns["minhash"] = lambda: sync_minhash(
            spark, table_path, targets["minhash"], id_col, text_col,
            assume_new_ids=assume_new_ids,
        )
    out = {}
    for kind, fn in fns.items():
        # chase to current: a call resuming a stale pending range (or
        # racing a writer) needs another round to reach the table's head;
        # each round is one full stamped range, so this terminates unless
        # the table advances faster than syncs complete — bounded anyway
        rounds = [fn()]
        while rounds[-1]["path"] != "noop" and len(rounds) < 16:
            r = fn()
            if r["path"] == "noop":
                break
            rounds.append(r)
        out[kind] = rounds
    return out
