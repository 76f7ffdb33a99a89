"""Incremental view maintenance (IVM) over snapshot tables — r13.

The round-12 engine treats the snapshot table as the system of record
and its manifest chain as a consumable changelog (``snapshot_diff``,
``read_snapshot_changes``). This module closes the loop on the ANALYTICS
side the way streaming/ann closed it on the INDEX side: a materialized
groupBy-aggregate view that *follows the table* — refreshed from the
changelog at a cost that scales with the CHANGED rows/groups, never with
the table.

Why this matters at 100 TB: the reference pipeline's rollups
(reference `sql/` aggregation queries; e.g. the daily weather rollup our
``a1_daily_rollup`` mirrors) are recomputed from scratch every run. At
warehouse scale a dashboard rollup over a 100 TB fact that ingests 0.1%
new rows a day must not rescan 100 TB — it applies the 0.1% delta to a
materialized state. That is the classic IVM split (Griffin & Libkin,
SIGMOD'95; DBSP, VLDB'23):

- **Linear aggregates** (count, sum, avg) form a commutative group:
  inserts add, deletes subtract, so the view merges a *delta aggregate*
  computed over changed rows only — one shuffle of the delta, one join
  against the (groups-sized) view state.
- **Non-linear aggregates** (min/max under deletes, count_distinct)
  have no bounded retraction state. Deleting the current min may
  promote ANY surviving row; the exact repair recomputes — but only the
  AFFECTED groups, via a semi-join of the source on the delta's group
  keys (partition-prunable when the table is partitioned by a group
  column). Insert-only deltas keep min/max mergeable
  (``least``/``greatest``), so the append-shaped fast path stays
  algebraic.

Where the delta comes from (r13 CDF): append-shaped ranges read only
the new data dirs; non-append ranges prefer the table's write-time
CHANGE DATA FEED (``snapshots.snapshot_changes_net`` — O(delta),
multiset-identical to the content diff) and pay ``snapshot_diff``'s
O(corpus) exceptAll only for feed-less history. A netted delta that
turns out insert-only (optimize + appends) keeps even min/max views on
the algebraic path — table maintenance no longer demotes the refresh.

View CHAINS (r13, second half): every single-table view refresh emits
its own feed (refresh knows exactly which groups changed — old and new
rows of the touched groups, group-sized), so a view is itself a
changelog-bearing source. A DOWNSTREAM view declares the upstream
view's path as its source and aggregates the upstream's STATE columns
via expression-valued agg cols (``("total", "sum", "__ivm_s_total")``;
sum-of-sums / count-of-groups compose exactly) — the daily→monthly
rollup chain, each hop refreshed at O(its delta). Chain hops refresh
upstream-first (a downstream refresh before its upstream is a no-op,
not an error; the maintenance tick orders this). Partitioned views do
not emit feeds (their per-partition histories have no single
changelog) and cannot be chain sources — creating a view over one
raises loudly (no manifest at the store root).

State layout: the view is itself a snapshot table (atomic manifest
commits, time travel over VIEW history, optimistic concurrency against
a rival refresher — all inherited). Its manifest carries the spec and
the last-applied source version::

    {"ivm": {"source": <table path>, "source_version": N,
             "keys": [...], "aggs": [{"name","fn","col"}, ...]}}

Stored columns are STATE, not presentation: every sum/avg carries a
non-null count (``__ivm_nn_<name>``) so SQL null semantics survive
retraction (a group whose last non-null value is deleted must read NULL
again, not 0), and every view row carries the group row count
(``__ivm_n``) so a group whose rows all leave the table leaves the view
(full-recompute equivalence, which the oracle value-hashes).
:func:`agg_view_read` derives the presentation frame.

Exactness caveat, loudly: float sums are not a group under IEEE
arithmetic (a+b-b != a in general), so incremental refresh of a DOUBLE
sum can drift below the 1e-6 comparison grain after many retractions.
For hash-exact views aggregate integers or decimals (the tests and the
``ns_ivm_view`` oracle use ``decimal``); double sums get the same
treatment the engine's money paths use (exact integer-scaled sums) by
casting at view definition time.

Crash posture: refresh computes from the STAMPED source version, writes
the new state data dir, then commits data+stamp in ONE manifest rename
(the snapshot `_commit` protocol). A crash before the commit leaves an
orphan data dir (age-gate-swept by ``snapshots.vacuum``) and an
unchanged stamp — the re-run recomputes the same delta. Two racing
refreshers conflict explicitly on the rename; the loser re-reads and
finds the work done (skip) or a new source version (refresh from it).

Housekeeping: every refresh is a new snapshot VERSION of the view
(time travel over view history is free), so a frequently-refreshed
view accumulates superseded state dirs — schedule ``snapshots.vacuum``
on the view (per sub-table for partitioned views) with whatever
retention the view's time-travel consumers need, exactly as for any
snapshot table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sources import snapshots as _snap

_LINEAR = {"count", "sum", "avg"}
_FNS = {"count", "sum", "avg", "min", "max", "count_distinct",
        "approx_count_distinct", "approx_count_distinct_merge"}
# mergeable on INSERT-only deltas, recompute under deletes: min/max by
# least/greatest, approx_count_distinct by DataSketches HLL union
# (Spark 4 hll_sketch_agg/hll_union — register-wise max IS the sketch
# of the union, so append-shaped refreshes never rescan the source;
# sketches cannot retract, so deletes recompute affected groups exactly
# like min/max). The Druid/Pinot continuous-aggregate pattern.
_MERGE_ON_INSERT = {"min", "max", "approx_count_distinct",
                    "approx_count_distinct_merge"}


def _norm_aggs(aggs) -> list[dict]:
    out = []
    for a in aggs:
        if isinstance(a, dict):
            name, fn, col = a["name"], a["fn"], a.get("col")
        else:
            name, fn, col = a
        if fn not in _FNS:
            raise ValueError(f"unsupported IVM aggregate {fn!r}; one of {sorted(_FNS)}")
        if fn != "count" and col is None:
            raise ValueError(f"aggregate {name!r} ({fn}) needs a column")
        out.append({"name": name, "fn": fn, "col": col})
    names = [a["name"] for a in out]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate aggregate output names: {names}")
    return out


def _state_exprs(aggs: list[dict], sign=None) -> list:
    """Aggregate expressions producing the view's STATE columns from raw
    rows. With ``sign`` (a Column of +1/-1) the same expressions produce
    the DELTA state — the linearity that makes the algebraic path one
    shuffle over changed rows. Aggregate ``col`` entries are SQL
    expressions of the row (``F.expr``; plain column names included) —
    like ``key_exprs`` they must be pure row functions, or a retraction
    would not cancel its insert. Expressions are what let a view
    aggregate ANOTHER view's state columns (``__ivm_s_<name>``) — the
    view-chain composition."""
    s = sign if sign is not None else F.lit(1)
    exprs = [F.sum(s).alias("__ivm_n")]
    for a in aggs:
        n, fn, c = a["name"], a["fn"], a["col"]
        e = F.expr(c) if c is not None else None
        if fn == "count":
            # COUNT is 0, never NULL, over an all-null (or empty) support
            src = s if e is None else F.when(e.isNotNull(), s)
            exprs.append(F.coalesce(F.sum(src), F.lit(0)).alias(n))
        elif fn in ("sum", "avg"):
            exprs.append(F.sum(e * s).alias(f"__ivm_s_{n}"))
            exprs.append(
                F.coalesce(
                    F.sum(F.when(e.isNotNull(), s)), F.lit(0)
                ).alias(f"__ivm_nn_{n}")
            )
        elif fn == "min":
            exprs.append(F.min(e).alias(n))
        elif fn == "max":
            exprs.append(F.max(e).alias(n))
        elif fn == "count_distinct":
            exprs.append(F.countDistinct(e).alias(n))
        elif fn == "approx_count_distinct":
            # binary HLL sketch state (lgConfigK default 12, ~1.6% σ);
            # NULL when the group's support is empty/all-NULL
            exprs.append(F.hll_sketch_agg(e).alias(f"__ivm_h_{n}"))
        elif fn == "approx_count_distinct_merge":
            # the CHAIN twin: the column IS already an HLL sketch (an
            # upstream view's __ivm_h_* state) — union, don't re-sketch.
            # Monthly uniques from daily sketches, the Druid rollup.
            exprs.append(F.hll_union_agg(e).alias(f"__ivm_h_{n}"))
    return exprs


def _state_cols(aggs: list[dict]) -> list[str]:
    cols = ["__ivm_n"]
    for a in aggs:
        n, fn = a["name"], a["fn"]
        if fn in ("sum", "avg"):
            cols += [f"__ivm_s_{n}", f"__ivm_nn_{n}"]
        elif fn in ("approx_count_distinct", "approx_count_distinct_merge"):
            cols.append(f"__ivm_h_{n}")
        else:
            cols.append(n)
    return cols


def _with_derived(rows: DataFrame, key_exprs: dict | None) -> DataFrame:
    """Stamp derived key columns (deterministic SQL expressions of the
    row, e.g. ``{"day": "date_trunc('DAY', ts)"}``) — the continuous-
    aggregate shape: a time-bucketed rollup maintains itself from the
    changelog because the bucket is a pure function of the row, so a
    changed row's delta lands in exactly its bucket's group."""
    for name, expr in (key_exprs or {}).items():
        rows = rows.withColumn(name, F.expr(expr))
    return rows


def _compute_state(
    rows: DataFrame, keys: list[str], aggs: list[dict],
    key_exprs: dict | None = None,
) -> DataFrame:
    return _with_derived(rows, key_exprs).groupBy(*keys).agg(*_state_exprs(aggs))


def _ivm_state_dir(view_path: str) -> str:
    return f"{view_path.rstrip('/')}/_ivm_state"


def _read_spec(spark, view_path: str) -> dict:
    # partitioned views keep their spec + stamp in a store-level state
    # chain (there is no single manifest to carry it); single-table views
    # keep it in the view manifest as before
    from .sync import read_state_chain

    chain = read_state_chain(spark, _ivm_state_dir(view_path))
    if chain is not None:
        spec = dict(chain)
        spec["_view_version"] = None
        return spec
    v = _snap.current_version(spark, view_path)
    if v is None:
        raise FileNotFoundError(f"no IVM view at {view_path}")
    m = _snap.read_manifest(spark, view_path, v)
    spec = m.get("ivm")
    if not spec:
        raise ValueError(
            f"snapshot table at {view_path} carries no IVM spec — not an "
            "agg view (or a non-IVM commit clobbered it; refresh only "
            "through agg_view_refresh)"
        )
    spec = dict(spec)
    spec["_view_version"] = v
    return spec


def agg_view_create(
    spark,
    source_path: str,
    view_path: str,
    keys: list[str],
    aggs,
    key_exprs: dict | None = None,
    partition_by: str | None = None,
) -> dict:
    """Materialize ``GROUP BY keys`` aggregate state of the source
    snapshot table at its CURRENT version, as a new snapshot table at
    ``view_path`` stamped with the source version it reflects. One full
    pass — every later :func:`agg_view_refresh` is delta-sized.

    ``key_exprs`` maps derived key names to deterministic SQL
    expressions of the row (``{"day": "date_trunc('DAY', ts)"}``) —
    the continuous-aggregate shape (a daily rollup that follows its
    fact table; the reference's daily weather rollup, maintained
    incrementally). Derived names must appear in ``keys``. The
    expression must be a pure row function: anything non-deterministic
    would route a retraction to a different group than its insert.

    ``partition_by`` (one of ``keys``) stores the view as a PARTITIONED
    snapshot store (one sub-table per key value, the merge_partitioned
    layout): a refresh then reads AND rewrites only the partitions the
    delta touches — the continuous-aggregate deployment shape, where a
    100 TB fact's daily ingest touches a handful of recent time buckets
    and the refresh cost is O(delta + touched buckets), never
    O(all groups). Partition values must be path-safe scalars with
    MODEST cardinality (time buckets, tenants — each touched value is
    one commit); every group belongs to exactly one partition because
    the partition column is a group key."""
    aggs = _norm_aggs(aggs)
    for name in (key_exprs or {}):
        if name not in keys:
            raise ValueError(
                f"derived key {name!r} is not in keys {keys} — add it"
            )
    sv = _snap.current_version(spark, source_path)
    if sv is None:
        raise FileNotFoundError(f"no source snapshot table at {source_path}")
    from .sync import read_state_chain

    if (
        _snap.current_version(spark, view_path) is not None
        or read_state_chain(spark, _ivm_state_dir(view_path)) is not None
    ):
        # both layouts checked: a single-table view carries a manifest at
        # view_path; a partitioned view carries only the state chain
        raise IOError(
            f"something already exists at {view_path} — refusing to "
            "clobber; drop it or refresh it"
        )
    if partition_by is not None and partition_by not in keys:
        raise ValueError(
            f"partition_by {partition_by!r} must be one of keys {keys}"
        )
    state = _compute_state(
        _snap.read_snapshot(spark, source_path, sv), keys, aggs, key_exprs
    )
    spec = {"source": source_path, "source_version": sv, "keys": keys,
            "aggs": aggs, "key_exprs": key_exprs or {},
            "partition_by": partition_by}
    if partition_by is None:
        d = _snap._write_data(state, view_path)
        _snap._commit(
            spark, view_path, [d], "ivm_create", None, state.schema.json(),
            extra={"ivm": spec},
        )
        return {"source_version": sv, "groups": state.count()}
    from .sync import write_state_chain

    state = state.persist()
    try:
        n_groups = state.count()
        parts = [r[0] for r in state.select(partition_by).distinct().collect()]
        for pv in sorted(parts, key=str):
            _commit_partition_state(
                spark, view_path, partition_by, pv,
                state.filter(F.col(partition_by) == F.lit(pv)), sv,
            )
    finally:
        state.unpersist()
    write_state_chain(spark, _ivm_state_dir(view_path), spec)
    return {"source_version": sv, "groups": n_groups,
            "partitions": len(parts)}


def _commit_partition_state(
    spark, view_path: str, part_col: str, value, rows: DataFrame,
    source_version: int,
) -> None:
    """Overwrite one partition sub-table with its new state, stamping the
    source version it reflects — the per-partition completion marker a
    crashed refresh resumes on (a partition already stamped with the
    target version is skipped, so re-merging the same delta can never
    double-count)."""
    part_path = _snap._part_dir(view_path, part_col, value)
    parent = _snap.current_version(spark, part_path)
    d = _snap._write_data(rows, part_path)
    _snap._commit(
        spark, part_path, [d], "ivm_refresh", parent, rows.schema.json(),
        extra={"ivm_source_version": source_version},
    )


def _partition_source_version(spark, view_path: str, part_col: str, value):
    part_path = _snap._part_dir(view_path, part_col, value)
    v = _snap.current_version(spark, part_path)
    if v is None:
        return None
    return _snap.read_manifest(spark, part_path, v).get("ivm_source_version")


def _merge_linear(
    old: DataFrame, delta: DataFrame, keys: list[str], aggs: list[dict],
    deletes_present: bool,
) -> DataFrame:
    """Algebraic merge: old state FULL OUTER JOIN delta state on the group
    keys (the view is groups-sized; the delta is changed-groups-sized),
    group-count <= 0 rows dropped. min/max merge by least/greatest —
    callers guarantee the delta is insert-only when they are present."""
    d = delta.select(
        *keys, *[F.col(c).alias(f"__d_{c}") for c in _state_cols(aggs)]
    )
    merged = old.join(d, keys, "full_outer")

    def add(a, b):
        return (
            F.when(F.col(a).isNull() & F.col(b).isNull(), F.lit(None))
            .otherwise(F.coalesce(F.col(a), F.lit(0)) + F.coalesce(F.col(b), F.lit(0)))
        )

    cols = list(keys)
    cols.append(add("__ivm_n", "__d___ivm_n").alias("__ivm_n"))
    for a in aggs:
        n, fn = a["name"], a["fn"]
        if fn == "count":
            cols.append(add(n, f"__d_{n}").alias(n))
        elif fn in ("sum", "avg"):
            nn = add(f"__ivm_nn_{n}", f"__d___ivm_nn_{n}")
            # a sum whose non-null support hits 0 must read NULL again —
            # retraction arithmetic alone would leave a spurious 0
            s = F.when(
                nn > 0,
                F.coalesce(F.col(f"__ivm_s_{n}"), F.lit(0))
                + F.coalesce(F.col(f"__d___ivm_s_{n}"), F.lit(0)),
            )
            cols.append(s.alias(f"__ivm_s_{n}"))
            cols.append(nn.alias(f"__ivm_nn_{n}"))
        elif fn in ("min", "max"):
            assert not deletes_present  # routed to recompute upstream
            f = F.least if fn == "min" else F.greatest
            cols.append(f(F.col(n), F.col(f"__d_{n}")).alias(n))
        elif fn in ("approx_count_distinct", "approx_count_distinct_merge"):
            assert not deletes_present  # sketches cannot retract
            a_, b_ = F.col(f"__ivm_h_{n}"), F.col(f"__d___ivm_h_{n}")
            # hll_union(NULL, x) is NULL — a group present on one side
            # only must keep that side's sketch
            cols.append(
                F.when(a_.isNull(), b_)
                .when(b_.isNull(), a_)
                .otherwise(F.hll_union(a_, b_))
                .alias(f"__ivm_h_{n}")
            )
        else:  # count_distinct — routed to recompute upstream
            raise AssertionError("count_distinct cannot merge linearly")
    return merged.select(*cols).filter(F.col("__ivm_n") > 0)


def agg_view_refresh(spark, view_path: str, mode: str = "auto") -> dict:
    """Advance the view to the source's current version by applying the
    changelog since the stamped version. Path selection (``mode='auto'``):

    - no change → no-op (no commit);
    - append-shaped history + spec without count_distinct → **algebraic**:
      delta aggregate over the NEW rows only (``read_snapshot_changes``
      reads just the new data dirs), merged into the view;
    - deletes present + all-linear spec → **algebraic with retraction**:
      ``snapshot_diff`` rows carry sign ±1 into the same delta aggregate;
    - deletes with min/max, or count_distinct at all → **affected-group
      recompute**: source semi-joined on the delta's group keys,
      recomputed, spliced over those groups only.

    ``mode='recompute_groups'`` forces the splice path (the escape hatch
    for float-drift repair); ``mode='full'`` re-materializes everything
    (still one commit, stamps current). Returns
    {"path", "from_version", "to_version", "touched_groups"}."""
    spec = _read_spec(spark, view_path)
    source, keys = spec["source"], list(spec["keys"])
    aggs = _norm_aggs(spec["aggs"])
    ke = spec.get("key_exprs") or None
    v0 = spec["source_version"]
    v1 = _snap.current_version(spark, source)
    if v1 is None or v1 < v0:
        raise ValueError(
            f"source {source} is at v{v1}, view reflects v{v0} — a "
            "rollback/vacuum rewrote history under the view; rebuild with "
            "agg_view_create"
        )
    try:
        _snap.read_manifest(spark, source, v0)
    except FileNotFoundError:
        raise ValueError(
            f"source {source} no longer has v{v0} (vacuumed past the "
            "view's stamp) — the changelog since the view's state is "
            "gone; rebuild with agg_view_create"
        ) from None
    if v1 == v0:
        return {"path": "noop", "from_version": v0, "to_version": v1,
                "touched_groups": 0}
    part_col = spec.get("partition_by")
    old = (
        None if part_col is not None
        else _snap.read_snapshot(spark, view_path, spec["_view_version"])
    )

    has_cd = any(a["fn"] == "count_distinct" for a in aggs)
    has_minmax = any(a["fn"] in _MERGE_ON_INSERT for a in aggs)

    delta_rows = None  # signed rows; None => insert-only new-rows frame
    inserts = None
    if mode == "full":
        path = "full"
    else:
        try:
            inserts = _snap.read_snapshot_changes(spark, source, v0, v1)
            deletes_present = False
        except ValueError:
            # non-append history in range: signed change rows. Prefer the
            # O(delta) CHANGE DATA FEED (netted — multiset-identical to
            # the content diff, so routing and touched-group censuses
            # are unchanged); fall back to snapshot_diff's O(corpus)
            # exceptAll only when a commit in the range carries no feed
            # (pre-CDF history, rollback, plain overwrite). eager=False
            # on the diff on purpose — it feeds exactly ONE downstream
            # action, and the eager form pins BOTH full table versions
            # in executor memory for nothing (SCALING.md "Measured r13")
            try:
                diff = _snap.snapshot_changes_net(spark, source, v0, v1)
            except ValueError:
                diff = _snap.snapshot_diff(spark, source, v0, v1, eager=False)
            # routing probe, only when it matters: a min/max view pays
            # affected-group recompute under deletes, so when the netted
            # delta turns out INSERT-ONLY (appends + optimize is the
            # common shape) check it with one delta-sized job and keep
            # the algebraic path
            if has_minmax and not has_cd and mode != "recompute_groups" and (
                diff.filter(F.col("_change") == "delete").limit(1).count() == 0
            ):
                inserts = diff.drop("_change")
                deletes_present = False
            else:
                delta_rows = diff.withColumn(
                    "__ivm_sign",
                    F.when(F.col("_change") == "insert", F.lit(1)).otherwise(F.lit(-1)),
                ).drop("_change")
                deletes_present = True
        if mode == "recompute_groups":
            path = "recompute_groups"
        elif has_cd or (deletes_present and has_minmax):
            path = "recompute_groups"
        elif deletes_present:
            path = "retraction"
        else:
            path = "append"

    _pins: list = []

    def _old_for_partitions(parts: list, like: DataFrame) -> DataFrame:
        """Current state of the EXISTING touched partitions (a brand-new
        partition has no old state); schema borrowed from ``like``."""
        from ..fsutil import exists as _fs_exists

        existing = [
            pv for pv in parts
            if _fs_exists(spark, _snap._part_dir(view_path, part_col, pv))
        ]
        if not existing:
            return like.select(*keys, *_state_cols(aggs)).limit(0)
        return _snap.read_partitioned(
            spark, view_path, part_col, values=existing
        )

    touched_parts: list = []
    touched_keys = None  # full path: feed = whole old + whole new
    prune_report = None  # recompute path: zone-map scan bounding
    if path == "full":
        new_state = _compute_state(
            _snap.read_snapshot(spark, source, v1), keys, aggs, ke
        )
        touched = new_state.count()
        if part_col is not None:
            from ..fsutil import list_names

            new_state = new_state.persist()
            _pins.append(new_state)
            prefix = f"{part_col}="
            existing = {
                n[len(prefix):]
                for n in list_names(spark, view_path.rstrip("/"))
                if n.startswith(prefix)
            }
            fresh = {
                str(r[0]) for r in
                new_state.select(part_col).distinct().collect()
            }
            # dead partitions (no surviving groups) are rewritten EMPTY
            touched_parts = sorted(existing | fresh)
    elif path in ("append", "retraction"):
        if path == "append":
            delta = _compute_state(inserts, keys, aggs, ke)
        else:
            delta = _with_derived(delta_rows, ke).groupBy(*keys).agg(
                *_state_exprs(aggs, sign=F.col("__ivm_sign"))
            )
        if part_col is not None:
            delta = delta.persist()
            _pins.append(delta)
        touched = delta.count()
        if part_col is not None:
            touched_parts = sorted(
                r[0] for r in delta.select(part_col).distinct().collect()
            )
            old = _old_for_partitions(touched_parts, delta)
        touched_keys = delta.select(*keys).distinct()
        new_state = _merge_linear(
            old, delta, keys, aggs, deletes_present=(path == "retraction")
        )
    else:  # recompute_groups
        changed = _with_derived(
            delta_rows if delta_rows is not None else inserts, ke
        )
        gk = changed.select(*keys).distinct()
        gk = gk.persist()
        _pins.append(gk)
        touched = gk.count()
        # zone-map composition: when a PHYSICAL group key is a declared
        # stats column of the source, bound the affected-group rescan to
        # the touched keys' range — the manifest then skips whole data
        # directories that cannot hold an affected group (time-bucketed
        # tables: only the affected buckets' dirs reopen). Correct
        # because every affected group's rows share its key value, so a
        # [min, max] bound on the key loses nothing — UNLESS a touched
        # key is NULL (bounds drop NULL rows); such a col is skipped.
        bounds = {}
        stats_cols = set(
            _snap.read_manifest(spark, source, v1).get("stats_cols") or []
        )
        for k in keys:
            if k in (ke or {}) or k not in stats_cols:
                continue
            row = gk.agg(
                F.min(k).alias("lo"), F.max(k).alias("hi"),
                F.sum(F.when(F.col(k).isNull(), 1).otherwise(0)).alias("nn"),
            ).collect()[0]
            if row["nn"] == 0 and row["lo"] is not None:
                bounds[k] = (row["lo"], row["hi"])
        src_rows = _snap.read_snapshot(
            spark, source, v1, bounds=bounds or None
        )
        prune_report = (
            _snap.snapshot_prune_report(spark, source, bounds, v1)
            if bounds else None
        )
        recomputed = _compute_state(
            _with_derived(src_rows, ke).join(gk, keys, "left_semi"),
            keys, aggs,
        )
        if part_col is not None:
            touched_parts = sorted(
                r[0] for r in gk.select(part_col).distinct().collect()
            )
            old = _old_for_partitions(touched_parts, recomputed)
        # splice: untouched groups copied through, touched groups replaced
        # (a touched group with no surviving source rows simply has no
        # recomputed row — it leaves the view, matching full recompute)
        touched_keys = gk
        new_state = old.join(gk, keys, "left_anti").unionByName(recomputed)

    new_spec = {"source": source, "source_version": v1, "keys": keys,
                "aggs": aggs, "key_exprs": spec.get("key_exprs") or {},
                "partition_by": part_col}
    if part_col is None:
        # The view's own commit emits a CHANGE DATA FEED: refresh knows
        # exactly which groups changed, so persist old/new rows of the
        # touched groups (delete+insert; full mode = whole old + whole
        # new — unchanged pairs net out at read). This is what makes a
        # VIEW a changelog-bearing source for a DOWNSTREAM view (the
        # view-chain composition): agg_view_refresh of the downstream
        # consumes it through the same snapshot_changes_net everything
        # else uses. Feed legs are group-sized; new_state is pinned so
        # the data write and the feed write share one computation.
        new_state = new_state.persist()
        try:
            if touched_keys is None:
                dels, ins = old, new_state
            else:
                dels = old.join(touched_keys, keys, "left_semi")
                ins = new_state.join(touched_keys, keys, "left_semi")
            feed = (
                dels.select(*new_state.columns)
                .withColumn("_change", F.lit("delete"))
                .unionByName(
                    ins.select(*new_state.columns)
                    .withColumn("_change", F.lit("insert"))
                )
            )
            d = _snap._write_data(new_state, view_path)
            cdf = _snap._write_changes(feed, view_path)
            _snap._commit(
                spark, view_path, [d], f"ivm_{path}", spec["_view_version"],
                new_state.schema.json(), extra={"ivm": new_spec, "cdf": cdf},
            )
        finally:
            new_state.unpersist()
            for df in _pins:
                df.unpersist()
        out = {"path": path, "from_version": v0, "to_version": v1,
               "touched_groups": int(touched)}
        if path == "recompute_groups" and prune_report is not None:
            out["source_dirs_pruned"] = prune_report["pruned_dirs"]
            out["source_dirs_total"] = prune_report["total_dirs"]
        return out
    from .sync import write_state_chain

    new_state = new_state.persist()
    _pins.append(new_state)
    try:
        for pv in touched_parts:
            # per-partition completion marker: a crashed refresh re-runs
            # with the SAME (v0, v1) — already-stamped partitions skip, so
            # the algebraic merge can never double-apply a delta
            if _partition_source_version(spark, view_path, part_col, pv) == v1:
                continue
            _commit_partition_state(
                spark, view_path, part_col, pv,
                new_state.filter(F.col(part_col) == F.lit(pv)), v1,
            )
    finally:
        for df in _pins:
            df.unpersist()
    write_state_chain(spark, _ivm_state_dir(view_path), new_spec)
    out = {"path": path, "from_version": v0, "to_version": v1,
           "touched_groups": int(touched),
           "touched_partitions": len(touched_parts)}
    if path == "recompute_groups" and prune_report is not None:
        out["source_dirs_pruned"] = prune_report["pruned_dirs"]
        out["source_dirs_total"] = prune_report["total_dirs"]
    return out


def agg_view_read(spark, view_path: str, version: int | None = None) -> DataFrame:
    """The presentation frame: group keys + one column per requested
    aggregate, derived from state (avg = sum/non-null-count; sums NULL
    when their non-null support is 0 — full SQL semantics)."""
    spec = _read_spec(spark, view_path)
    if spec.get("partition_by"):
        if version is not None:
            raise ValueError(
                "partitioned views have per-partition histories — time "
                "travel the sub-tables directly if needed"
            )
        state = _snap.read_partitioned(
            spark, view_path, spec["partition_by"]
        )
    else:
        state = _snap.read_snapshot(
            spark, view_path,
            version if version is not None else spec["_view_version"],
        )
    cols = list(spec["keys"])
    for a in _norm_aggs(spec["aggs"]):
        n, fn = a["name"], a["fn"]
        if fn == "sum":
            cols.append(
                F.when(F.col(f"__ivm_nn_{n}") > 0, F.col(f"__ivm_s_{n}")).alias(n)
            )
        elif fn == "avg":
            cols.append(
                F.when(
                    F.col(f"__ivm_nn_{n}") > 0,
                    F.col(f"__ivm_s_{n}") / F.col(f"__ivm_nn_{n}"),
                ).alias(n)
            )
        elif fn in ("approx_count_distinct", "approx_count_distinct_merge"):
            # 0 over an empty/all-NULL support, matching count_distinct
            cols.append(
                F.coalesce(
                    F.hll_sketch_estimate(F.col(f"__ivm_h_{n}")), F.lit(0)
                ).alias(n)
            )
        else:
            cols.append(F.col(n).alias(n))
    return state.select(*cols)


def agg_view_verify(spark, view_path: str, approx_rtol: float = 0.10) -> dict:
    """Operational yardstick (and the tests' differential): the view's
    presentation frame vs a full recompute over the source AT THE
    STAMPED VERSION. Returns {"equal", "view_rows", "recompute_rows"} —
    row-exact comparison for exact aggregates (see the float caveat in
    the module docstring). ``approx_count_distinct`` columns compare
    within ``approx_rtol`` relative tolerance instead: a union-built
    HLL sketch and a directly-aggregated one cover the same set but may
    estimate slightly apart (the HIP estimator is update-order
    sensitive), so bit-equality is the wrong contract there."""
    spec = _read_spec(spark, view_path)
    aggs = _norm_aggs(spec["aggs"])
    keys = list(spec["keys"])
    approx = [a["name"] for a in aggs
              if a["fn"].startswith("approx_count_distinct")]
    got = agg_view_read(spark, view_path)
    want_state = _compute_state(
        _snap.read_snapshot(spark, spec["source"], spec["source_version"]),
        keys, aggs, spec.get("key_exprs") or None,
    )
    # present the recompute through the same derivation
    cols = list(keys)
    for a in aggs:
        n, fn = a["name"], a["fn"]
        if fn == "sum":
            cols.append(F.when(F.col(f"__ivm_nn_{n}") > 0, F.col(f"__ivm_s_{n}")).alias(n))
        elif fn == "avg":
            cols.append(
                F.when(F.col(f"__ivm_nn_{n}") > 0,
                       F.col(f"__ivm_s_{n}") / F.col(f"__ivm_nn_{n}")).alias(n)
            )
        elif fn in ("approx_count_distinct", "approx_count_distinct_merge"):
            cols.append(
                F.coalesce(
                    F.hll_sketch_estimate(F.col(f"__ivm_h_{n}")), F.lit(0)
                ).alias(n)
            )
        else:
            cols.append(F.col(n))
    want = want_state.select(*cols)
    exact_cols = [c for c in got.columns if c not in approx]
    ge, we = got.select(*exact_cols), want.select(*exact_cols)
    a = ge.exceptAll(we).count()
    b = we.exceptAll(ge).count()
    equal = a == 0 and b == 0
    if equal and approx:
        j = got.select(
            *keys, *[F.col(c).alias(f"__g_{c}") for c in approx]
        ).join(
            want.select(*keys, *[F.col(c).alias(f"__w_{c}") for c in approx]),
            keys, "full_outer",
        )
        off = j.filter(
            " OR ".join(
                f"(abs(coalesce(__g_{c}, -1) - coalesce(__w_{c}, -1)) > "
                f"{approx_rtol} * greatest(coalesce(__w_{c}, 0), 1))"
                for c in approx
            )
        ).count()
        equal = off == 0
    return {
        "equal": equal,
        "view_rows": got.count(),
        "recompute_rows": want.count(),
    }


def _view_partitions(spark, view_path: str, part_col: str) -> list[str]:
    from ..fsutil import list_names

    prefix = f"{part_col}="
    return sorted(
        n[len(prefix):]
        for n in list_names(spark, view_path.rstrip("/"))
        if n.startswith(prefix)
    )


def agg_view_retained_versions(spark, view_path: str) -> int:
    """How many superseded-or-current manifest versions the view retains —
    the metadata-only vacuum trigger (version NUMBERS are monotonic and
    survive vacuum, so the trigger must count retained manifests, not
    read the current version). Partitioned views report the MAX across
    sub-tables (the worst hoarder drives the housekeeping)."""
    import re as _re

    from ..fsutil import list_names

    spec = _read_spec(spark, view_path)

    def count(path: str) -> int:
        return sum(
            1 for n in list_names(spark, _snap._meta_dir(path))
            if _re.fullmatch(r"v\d{8}\.json", n)
        )

    part_col = spec.get("partition_by")
    if not part_col:
        return count(view_path)
    parts = _view_partitions(spark, view_path, part_col)
    return max((count(_snap._part_dir(view_path, part_col, p)) for p in parts),
               default=0)


def agg_view_vacuum(
    spark, view_path: str, keep_last: int = 2,
    min_age_seconds: float = 3600.0,
) -> dict:
    """Housekeeping for a frequently-refreshed view: every refresh is a
    new snapshot version, so state dirs accumulate until vacuumed.
    Single-table views vacuum directly; partitioned views vacuum each
    sub-table (their histories are independent). ``keep_last`` trades
    view time travel for storage, exactly as for any snapshot table;
    the age gate protects an in-flight refresher's uncommitted dir."""
    spec = _read_spec(spark, view_path)
    part_col = spec.get("partition_by")
    if not part_col:
        return _snap.vacuum(spark, view_path, keep_last, min_age_seconds)
    out = {"manifests_deleted": 0, "dirs_deleted": 0, "partitions": 0}
    for p in _view_partitions(spark, view_path, part_col):
        r = _snap.vacuum(
            spark, _snap._part_dir(view_path, part_col, p),
            keep_last, min_age_seconds,
        )
        out["manifests_deleted"] += r.get("manifests_deleted", 0)
        out["dirs_deleted"] += r.get("dirs_deleted", 0)
        out["partitions"] += 1
    return out
