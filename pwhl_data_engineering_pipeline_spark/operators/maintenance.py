"""One maintenance loop for the whole index estate — r13.

The engine now has, per persisted index, a metadata-cheap *probe* that
says when work is due (``needs_compaction``, ``ivf_needs_recompact``,
``pq_needs_recompact``, ``minhash_needs_compact`` — batch creep, drift,
deletion debt) and, per table, a *sync stamp* that says how far behind
the table each index is (operators/sync.py). What production runs is a
single scheduler tick over all of it. This module is that tick, and it
encodes the one ORDERING RULE the pieces demand:

    **sync before compact.** An index whose sync stamp shows a PENDING
    range must not be compacted: compaction collapses the committed
    batch list, erasing the append-commit completion marker a crashed
    sync needs to resume without re-purging rows it already re-appended
    (operators/sync.py's corollary). So a pending range yields exactly
    one action — ``resume_sync`` — and suppresses every compaction for
    that index; behind-but-clean indexes sync first and compact after,
    inside the same plan.

``maintenance_plan`` is read-only (stamp reads + the probes' bounded
scans; nothing mutates), so schedulers can poll it as often as they
like. ``maintenance_run`` executes a plan in order and keeps the
purge_everywhere posture: an action whose prerequisites are missing
(minhash compaction needs an out_path; a PQ recompact needs the raw
vectors) is reported in ``skipped`` — loudly, never silently dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _snap_current(spark, table_path: str):
    from ..sources import snapshots

    return snapshots.current_version(spark, table_path)


def _pq_tombstone_frac(spark, path: str) -> dict:
    """Deletion-debt-only PQ check for when no raw sample is at hand:
    the tombstone_frac term of pq_needs_recompact (metadata-only), with
    the drift term explicitly reported as unmeasured."""
    from .pq import _pq_read_manifest
    from .search import _tombstone_mass

    meta = _pq_read_manifest(spark, path)
    if not meta or not (meta.get("tombstones") or []):
        return {"recompact": False, "tombstone_frac": 0.0, "drift": "unmeasured"}
    mass = _tombstone_mass(spark, path, meta)
    n = sum(int(v) for v in (meta.get("batch_counts") or {}).values())
    frac = mass / max(n, 1)
    return {
        "recompact": frac >= 0.25,
        "tombstone_frac": float(frac),
        "drift": "unmeasured",
    }


def maintenance_plan(
    spark,
    targets: dict,
    table_path: str | None = None,
    sample_vectors: DataFrame | None = None,
    max_batches: int = 32,
    max_tombstone_frac: float = 0.25,
    drift_threshold: float = 1.25,
    view_vacuum_after: int | None = 64,
    table_optimize_after_dirs: int = 16,
    table_vacuum_after: int | None = 64,
    table_keep_last: int = 2,
) -> list[dict]:
    """One read-only scheduler tick: actions due across ``targets``
    (kind → path; kinds bm25/ivf/pq/minhash, plus ``view`` and
    ``table`` which accept a path OR a list of paths), ordered
    resume_sync → sync/refresh → compact/optimize/vacuum. Each action
    dict carries ``kind``, ``path``, ``action``, a machine-readable
    ``reason``, and ``requires`` (argument names :func:`maintenance_run`
    must be given to execute it). ``sample_vectors`` enables the PQ
    drift probe; when absent the PQ check degrades to deletion-debt
    only (reported). Views topo-order upstream-first (chains); tables
    get dir-count optimize triggers and consumer-aware vacuum floors
    (see the inline notes)."""
    from . import dedup, ivm, pq as pqm, search, similarity, sync

    unknown = set(targets) - {"bm25", "ivf", "pq", "minhash", "view", "table"}
    if unknown:
        raise ValueError(f"unknown maintenance target kinds {sorted(unknown)}")
    resumes: list[dict] = []
    syncs: list[dict] = []
    compacts: list[dict] = []
    for kind, path in targets.items():
        if kind == "table":
            # Snapshot TABLES join the tick (r13): streaming/append
            # ingest fragments a table into one dir per batch —
            # optimize when the dir count creeps (the optimize commit
            # carries an explicitly EMPTY change feed, so incremental
            # consumers stay on the fast path) — and retained manifests
            # hoard storage — vacuum, with a CONSUMER-AWARE floor: the
            # tick knows every view stamped on this table and every
            # index sync-tracking it, and vacuum must keep at least
            # back to the laggiest consumer's version (a pending sync
            # range reads manifests from its synced version; an IVM
            # refresh reads the manifest at its stamp). keep_last is
            # max(table_keep_last, current - consumer floor + 1).
            # SCOPE, loudly: the floor covers consumers listed in THIS
            # targets dict — a view or index maintained outside the
            # tick is invisible to it; register every consumer in the
            # same tick, or keep table_keep_last generous.
            from ..sources import snapshots as _snaps

            import re as _re

            from ..fsutil import list_names as _ls

            tables = list(path) if isinstance(path, (list, tuple)) else [path]
            for t in tables:
                cur = _snap_current(spark, t)
                if cur is None:
                    raise FileNotFoundError(f"no snapshot table at {t}")
                m = _snaps.read_manifest(spark, t, cur)
                optimizing = len(m["dirs"]) >= table_optimize_after_dirs
                if optimizing:
                    compacts.append({
                        "kind": "table", "path": t, "action": "optimize",
                        "reason": {"dirs": len(m["dirs"])},
                        "requires": [],
                    })
                if table_vacuum_after is None:
                    continue
                retained = sum(
                    1 for n in _ls(spark, _snaps._meta_dir(t))
                    if _re.fullmatch(r"v\d{8}\.json", n)
                )
                if retained < table_vacuum_after:
                    continue
                floor = cur
                tnorm = t.rstrip("/")
                for k2, p2 in targets.items():
                    if k2 == "view":
                        vs = list(p2) if isinstance(p2, (list, tuple)) else [p2]
                        for v in vs:
                            spec2 = ivm._read_spec(spark, v)
                            if spec2["source"].rstrip("/") == tnorm:
                                floor = min(floor, spec2["source_version"])
                    elif k2 in ("bm25", "ivf", "pq", "minhash"):
                        try:
                            st2 = sync.sync_status(spark, p2)
                        except FileNotFoundError:
                            continue
                        if st2["table"].rstrip("/") == tnorm:
                            floor = min(floor, st2["synced"])
                # an optimize scheduled in this same tick adds one more
                # version before the vacuum runs — keep one extra so
                # the consumer floor's manifest survives
                keep = max(table_keep_last, cur - floor + 1) + (
                    1 if optimizing else 0
                )
                compacts.append({
                    "kind": "table", "path": t, "action": "vacuum",
                    "reason": {"retained_versions": retained,
                               "keep_last": keep,
                               "consumer_floor": floor},
                    "requires": [],
                })
            continue
        if kind == "view":
            # IVM views carry their own source stamp — behind means a
            # refresh is due (agg_view_refresh is idempotent/crash-safe,
            # so no pending state to resume). A LIST of views is
            # topo-ordered upstream-first (view chains: a view sourcing
            # another view in the set refreshes after it), and a
            # downstream whose upstream gets refreshed this tick is
            # scheduled too — the upstream's refresh advances the
            # version the downstream follows (refreshing a caught-up
            # view is a no-op, so over-scheduling is safe).
            views = list(path) if isinstance(path, (list, tuple)) else [path]
            specs = {v: ivm._read_spec(spark, v) for v in views}
            in_set = {v.rstrip("/") for v in views}
            ordered: list[str] = []
            pending_v = list(views)
            while pending_v:  # Kahn over the (shallow) source edges
                ready = [
                    v for v in pending_v
                    if specs[v]["source"].rstrip("/") not in
                    (in_set - {x.rstrip("/") for x in ordered})
                ]
                if not ready:
                    raise ValueError(
                        f"view chain cycle among {sorted(pending_v)}"
                    )
                for v in sorted(ready):
                    ordered.append(v)
                    pending_v.remove(v)
            will_refresh: set[str] = set()
            for v in ordered:
                spec = specs[v]
                cur = _snap_current(spark, spec["source"])
                behind = (
                    cur is not None and cur > spec["source_version"]
                )
                upstream_due = spec["source"].rstrip("/") in will_refresh
                if behind or upstream_due:
                    will_refresh.add(v.rstrip("/"))
                    reason = {"source": spec["source"]}
                    if behind:
                        reason["behind"] = cur - spec["source_version"]
                    if upstream_due:
                        reason["upstream_refresh_scheduled"] = True
                    syncs.append({
                        "kind": "view", "path": v, "action": "refresh",
                        "reason": reason, "requires": [],
                    })
                if view_vacuum_after is not None:
                    retained = ivm.agg_view_retained_versions(spark, v)
                    if retained >= view_vacuum_after:
                        compacts.append({
                            "kind": "view", "path": v, "action": "vacuum",
                            "reason": {"retained_versions": retained},
                            "requires": [],
                        })
            continue
        pending = False
        try:
            st = sync.sync_status(spark, path, table_path)
        except FileNotFoundError:
            st = None  # not table-tracked; compaction probes still apply
        if st is not None:
            if st["pending"] is not None:
                pending = True
                resumes.append({
                    "kind": kind, "path": path, "action": "resume_sync",
                    "reason": {"pending_range": [st["synced"], st["pending"]]},
                    "requires": ["table_path"],
                })
            elif st["behind"] > 0:
                syncs.append({
                    "kind": kind, "path": path, "action": "sync",
                    "reason": {"behind": st["behind"],
                               "synced": st["synced"],
                               "current": st["current"]},
                    "requires": ["table_path"],
                })
        if pending:
            # the ordering rule: no compaction while a sync range pends —
            # it would erase the resume's completion marker
            continue
        if kind == "bm25":
            meta = search._read_scalars(spark, path)
            due = search.needs_compaction(
                spark, path, max_batches=max_batches,
                max_tombstone_frac=max_tombstone_frac,
            )
            if due:
                compacts.append({
                    "kind": kind, "path": path, "action": "compact",
                    "reason": {
                        "batches": len(meta.get("batches") or []),
                        "tombstone_batches": len(meta.get("tombstones") or []),
                    },
                    "requires": [],
                })
        elif kind == "ivf":
            obs = similarity.ivf_needs_recompact(
                spark, path, threshold=drift_threshold,
                max_tombstone_frac=max_tombstone_frac,
            )
            if obs["recompact"]:
                compacts.append({
                    "kind": kind, "path": path, "action": "recompact",
                    "reason": {k: obs[k] for k in ("ratio", "tombstone_frac")
                               if k in obs},
                    "requires": [],
                })
        elif kind == "pq":
            if sample_vectors is not None:
                obs = pqm.pq_needs_recompact(
                    spark, path, sample_vectors, threshold=drift_threshold,
                    max_tombstone_frac=max_tombstone_frac,
                )
            else:
                obs = _pq_tombstone_frac(spark, path)
            if obs["recompact"]:
                compacts.append({
                    "kind": kind, "path": path, "action": "recompact",
                    "reason": {k: obs[k] for k in
                               ("ratio", "tombstone_frac", "drift")
                               if k in obs},
                    "requires": ["vectors"],
                })
        elif kind == "minhash":
            obs = dedup.minhash_needs_compact(
                spark, path, max_tombstone_frac=max_tombstone_frac,
            )
            if obs["compact"]:
                compacts.append({
                    "kind": kind, "path": path, "action": "compact",
                    "reason": {"tombstone_frac": obs["tombstone_frac"]},
                    "requires": ["minhash_out"],
                })
    return resumes + syncs + compacts


def maintenance_run(
    spark,
    plan: list[dict],
    table_path: str | None = None,
    vectors: DataFrame | None = None,
    minhash_out: str | None = None,
    reclaim_min_age_seconds: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
) -> dict:
    """Execute a :func:`maintenance_plan` in order. Actions whose
    ``requires`` are not satisfied land in ``skipped`` with the missing
    argument named (the purge_everywhere refusal posture, non-fatal here
    because a scheduler tick is periodic — the next tick retries).
    Returns {"done": [...], "skipped": [...]} with per-action
    observables."""
    from . import dedup, ivm, pq as pqm, search, similarity, sync

    have = {"table_path": table_path, "vectors": vectors,
            "minhash_out": minhash_out}
    done: list[dict] = []
    skipped: list[dict] = []
    for act in plan:
        missing = [r for r in act.get("requires", []) if have.get(r) is None]
        if missing:
            skipped.append({**act, "missing": missing})
            continue
        kind, path, action = act["kind"], act["path"], act["action"]
        if kind == "table":
            from ..sources import snapshots as _snaps

            if action == "optimize":
                v = _snaps.snapshot_optimize(spark, path)
                obs = {"optimized_to_version": v}
            else:  # vacuum with the plan's consumer-aware floor
                obs = _snaps.vacuum(
                    spark, path,
                    keep_last=act["reason"]["keep_last"],
                    min_age_seconds=reclaim_min_age_seconds,
                )
        elif kind == "view":
            if action == "vacuum":
                obs = ivm.agg_view_vacuum(
                    spark, path, min_age_seconds=reclaim_min_age_seconds
                )
            else:
                obs = ivm.agg_view_refresh(spark, path)
        elif action in ("sync", "resume_sync"):
            if kind == "bm25":
                obs = sync.sync_bm25(spark, table_path, path, id_col, text_col)
            elif kind == "ivf":
                obs = sync.sync_ivf(spark, table_path, path, vec_id_col, vec_col)
            elif kind == "pq":
                obs = sync.sync_pq(spark, table_path, path, vec_id_col, vec_col)
            else:
                obs = sync.sync_minhash(spark, table_path, path, id_col, text_col)
        elif kind == "bm25":
            obs = search.bm25_index_compact(
                spark, path, reclaim_min_age_seconds=reclaim_min_age_seconds
            )
        elif kind == "ivf":
            obs = similarity.ivf_recompact(spark, path, vec_col=vec_col,
                                           id_col=vec_id_col)
        elif kind == "pq":
            meta = pqm._pq_read_manifest(spark, path) or {}
            if meta.get("tombstones"):
                # deletion debt: the erasure sweep's survivor math applies
                from .erasure import purge_everywhere

                obs = purge_everywhere(
                    spark, {"pq": path}, vectors=vectors,
                    vec_id_col=vec_id_col,
                    reclaim_min_age_seconds=reclaim_min_age_seconds,
                )["results"]["pq"]
            else:
                # drift: retrain over the caller's live corpus (the count
                # guard inside pq_recompact refuses a mismatched frame)
                obs = pqm.pq_recompact(
                    spark, path, vectors, vec_col=vec_col, id_col=vec_id_col,
                    reclaim_min_age_seconds=reclaim_min_age_seconds,
                )
        else:
            obs = {
                "hot_buckets": dedup.minhash_index_compact(
                    spark, path, out_path=minhash_out
                ),
                "purged_path": minhash_out,
            }
        done.append({**act, "result": obs})
    return {"done": done, "skipped": skipped}
