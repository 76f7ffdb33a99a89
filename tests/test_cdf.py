"""Change data feed (r13): write-time per-commit deltas on the snapshot
table, and their consumption by IVM refresh and index sync.

The theorem under test everywhere: the NETTED feed is multiset-identical
to ``snapshot_diff`` (version deltas compose by signed multiset
addition), so swapping the O(corpus) exceptAll for the O(delta) feed
changes COST, never results. Plus the lifecycle corners: crash orphans
invisible, vacuum reclaims unreferenced change dirs, optimize's empty
feed keeps incremental consumers incremental, schema evolution
NULL-fills across the range.
"""

from __future__ import annotations

import random
import tempfile

import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import ivm, sync
from pwhl_data_engineering_pipeline_spark.sources import snapshots as S


def _rows(spark, data):
    return spark.createDataFrame(data, "id int, s string, x int")


def _multiset_equal(a, b) -> bool:
    cols = sorted(a.columns)
    return (
        a.select(*cols).exceptAll(b.select(*cols)).count() == 0
        and b.select(*cols).exceptAll(a.select(*cols)).count() == 0
    )


def test_net_feed_is_multiset_identical_to_diff(spark):
    base = tempfile.mkdtemp(prefix="cdf_")
    p = f"{base}/t"
    v1 = S.snapshot_overwrite(
        _rows(spark, [(i, f"v{i}", i * 10) for i in range(20)]), p
    )
    v2 = S.snapshot_append(_rows(spark, [(100, "new", 1)]), p)
    v3 = S.snapshot_merge(
        _rows(spark, [(i, f"u{i}", i * 7) for i in range(5)] + [(200, "ins", 5)]),
        p, ["id"],
    )
    v4 = S.snapshot_delete(
        spark.createDataFrame([(3,), (100,), (999,)], "id int"), p, ["id"]
    )
    v5 = S.snapshot_optimize(spark, p)
    for a, b in [(v1, v5), (v2, v4), (v3, v5), (v1, v3), (v4, v5), (0, v5)]:
        net = S.snapshot_changes_net(spark, p, a, b)
        diff = (
            S.snapshot_diff(spark, p, a, b)
            if a > 0
            else S.read_snapshot(spark, p, b).withColumn(
                "_change", F.lit("insert")
            )
        )
        assert _multiset_equal(net, diff.select(*net.columns)), (a, b)


def test_feed_randomized_lifecycle_differential(spark):
    """Seeded random append/merge/delete/optimize sequence: after every
    commit, net(v0, head) ≡ snapshot_diff(v0, head) for a rolling v0."""
    rng = random.Random(1307)
    base = tempfile.mkdtemp(prefix="cdfr_")
    p = f"{base}/t"
    versions = [S.snapshot_overwrite(
        _rows(spark, [(i, f"v{i}", i) for i in range(30)]), p
    )]
    for step in range(8):
        op = rng.choice(["append", "merge", "delete", "optimize"])
        if op == "append":
            lo = 1000 + step * 10
            versions.append(S.snapshot_append(
                _rows(spark, [(lo + j, f"a{step}", j) for j in range(3)]), p
            ))
        elif op == "merge":
            ids = rng.sample(range(30), 4)
            versions.append(S.snapshot_merge(
                _rows(spark, [(i, f"m{step}", i + step) for i in ids]), p, ["id"]
            ))
        elif op == "delete":
            ids = rng.sample(range(30), 2)
            versions.append(S.snapshot_delete(
                spark.createDataFrame([(i,) for i in ids], "id int"), p, ["id"]
            ))
        else:
            versions.append(S.snapshot_optimize(spark, p, n_files=2))
        v0 = versions[max(0, len(versions) - 4)]
        head = versions[-1]
        if v0 == head:
            continue
        net = S.snapshot_changes_net(spark, p, v0, head)
        diff = S.snapshot_diff(spark, p, v0, head)
        assert _multiset_equal(net, diff.select(*net.columns)), (op, v0, head)


def test_optimize_contributes_empty_feed(spark):
    base = tempfile.mkdtemp(prefix="cdfo_")
    p = f"{base}/t"
    v1 = S.snapshot_overwrite(_rows(spark, [(1, "a", 1), (2, "b", 2)]), p)
    S.snapshot_append(_rows(spark, [(3, "c", 3)]), p)
    v3 = S.snapshot_optimize(spark, p, n_files=1)
    m = S.read_manifest(spark, p, v3)
    assert "cdf" in m and m["cdf"] is None
    feed = S.snapshot_changes_feed(spark, p, v1, v3)
    got = [(r.id, r._change) for r in feed.collect()]
    assert got == [(3, "insert")]


def test_feedless_history_raises_and_diff_still_works(spark):
    base = tempfile.mkdtemp(prefix="cdfl_")
    p = f"{base}/t"
    v1 = S.snapshot_overwrite(_rows(spark, [(1, "a", 1)]), p)
    v2 = S.snapshot_overwrite(_rows(spark, [(2, "b", 2)]), p)  # no feed
    with pytest.raises(ValueError, match="neither append-shaped nor CDF"):
        S.snapshot_changes_feed(spark, p, v1, v2)
    assert S.snapshot_diff(spark, p, v1, v2).count() == 2
    # rollback likewise has no feed
    v3 = S.snapshot_rollback(spark, p, v1)
    with pytest.raises(ValueError):
        S.snapshot_changes_net(spark, p, v2, v3)


def test_crashed_commit_leaves_feed_orphan_invisible_and_vacuumable(spark):
    """A change dir written by a commit whose manifest rename never
    happened must be invisible to the feed and reclaimed by vacuum."""
    base = tempfile.mkdtemp(prefix="cdfc_")
    p = f"{base}/t"
    v1 = S.snapshot_overwrite(_rows(spark, [(1, "a", 1)]), p)
    # simulate the crash: write a change dir with no manifest
    orphan = S._write_changes(
        _rows(spark, [(9, "ghost", 9)]).withColumn("_change", F.lit("insert")), p
    )
    v2 = S.snapshot_merge(_rows(spark, [(1, "a2", 2)]), p, ["id"])
    net = S.snapshot_changes_net(spark, p, v1, v2)
    assert sorted((r.id, r._change) for r in net.collect()) == [
        (1, "delete"), (1, "insert"),
    ]
    stats = S.snapshot_stats(spark, p)
    assert stats["change_dirs"] == 2  # orphan + v2's feed
    out = S.vacuum(spark, p, keep_last=1, min_age_seconds=0.0)
    assert out["dirs_deleted"] >= 2  # v1's data dir + v1 feed + orphan
    from pwhl_data_engineering_pipeline_spark.fsutil import exists

    assert not exists(spark, f"{p}/changes/{orphan}")
    # the kept version's feed survives vacuum
    kept = S.read_manifest(spark, p, v2)["cdf"]
    assert exists(spark, f"{p}/changes/{kept}")


def test_feed_handles_additive_schema_evolution(spark):
    base = tempfile.mkdtemp(prefix="cdfe_")
    p = f"{base}/t"
    v1 = S.snapshot_overwrite(_rows(spark, [(1, "a", 1), (2, "b", 2)]), p)
    widened = spark.createDataFrame(
        [(2, "b2", 20, "extra")], "id int, s string, x int, note string"
    )
    v2 = S.snapshot_merge(widened, p, ["id"])
    net = S.snapshot_changes_net(spark, p, v1, v2)
    assert "note" in net.columns
    rows = {(r.id, r._change): r.note for r in net.collect()}
    assert rows[(2, "insert")] == "extra"
    assert rows[(2, "delete")] is None  # old row NULL-filled


def test_unchanged_merge_rows_net_out(spark):
    """A merge that re-lands identical rows emits a cancelling pair —
    the netted feed (like the content diff) shows no change."""
    base = tempfile.mkdtemp(prefix="cdfn_")
    p = f"{base}/t"
    v1 = S.snapshot_overwrite(_rows(spark, [(1, "a", 1), (2, "b", 2)]), p)
    v2 = S.snapshot_merge(_rows(spark, [(1, "a", 1), (2, "B", 2)]), p, ["id"])
    net = S.snapshot_changes_net(spark, p, v1, v2)
    assert sorted((r.id, r.s, r._change) for r in net.collect()) == [
        (2, "B", "insert"), (2, "b", "delete"),
    ]


def test_emit_changes_false_opts_out(spark):
    base = tempfile.mkdtemp(prefix="cdfx_")
    p = f"{base}/t"
    v1 = S.snapshot_overwrite(_rows(spark, [(1, "a", 1)]), p)
    v2 = S.snapshot_merge(
        _rows(spark, [(1, "a2", 2)]), p, ["id"], emit_changes=False
    )
    assert "cdf" not in S.read_manifest(spark, p, v2)
    with pytest.raises(ValueError):
        S.snapshot_changes_feed(spark, p, v1, v2)


def test_ivm_refresh_rides_feed_through_merge_and_optimize(spark):
    """An IVM view over a table mutated by merge/delete/optimize stays
    correct refreshing from the feed (the content diff never runs — we
    prove it by making it IMPOSSIBLE: vacuum the pre-merge data so an
    exceptAll over v0 would fail, while the feed only needs v0's
    manifest... manifests survive vacuum only for kept versions, so
    instead we assert correctness + routing here and leave cost to the
    scale harness)."""
    base = tempfile.mkdtemp(prefix="cdfi_")
    src, vl, vm = f"{base}/src", f"{base}/vl", f"{base}/vm"
    rows = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], i * 100) for i in range(30)],
        "id int, grp string, cents long",
    )
    S.snapshot_overwrite(rows, src)
    ivm.agg_view_create(
        spark, src, vl, ["grp"],
        [("n", "count", None), ("total", "sum", "cents")],
    )
    ivm.agg_view_create(
        spark, src, vm, ["grp"],
        [("lo", "min", "cents"), ("hi", "max", "cents")],
    )
    # merge (updates + insert) → retraction for linear, recompute for minmax
    S.snapshot_merge(
        spark.createDataFrame(
            [(2, "c", 999), (31, "a", 555)], "id int, grp string, cents long"
        ),
        src, ["id"],
    )
    r1 = ivm.agg_view_refresh(spark, vl)
    r1m = ivm.agg_view_refresh(spark, vm)
    assert r1["path"] == "retraction"
    assert r1m["path"] == "recompute_groups"
    assert ivm.agg_view_verify(spark, vl)["equal"]
    assert ivm.agg_view_verify(spark, vm)["equal"]
    # optimize + append → netted feed is INSERT-ONLY → minmax stays
    # algebraic (the routing probe)
    S.snapshot_optimize(spark, src, n_files=1)
    S.snapshot_append(
        spark.createDataFrame([(40, "b", 77)], "id int, grp string, cents long"),
        src,
    )
    r2 = ivm.agg_view_refresh(spark, vl)
    r2m = ivm.agg_view_refresh(spark, vm)
    assert r2["path"] == "retraction"  # linear: signs all +1, same cost
    assert r2m["path"] == "append"  # min/max: algebraic, no recompute
    assert ivm.agg_view_verify(spark, vl)["equal"]
    assert ivm.agg_view_verify(spark, vm)["equal"]


def test_sync_classification_identical_feed_vs_diff(spark, tmp_path):
    """table_net_changes over the same logical history classifies
    identically whether the commits carried a feed (O(delta) path) or
    not (exceptAll fallback) — the equivalence the sync relies on.
    test_sync.py's probe-identity suite covers the full index path
    (its merge/delete commits now ride the feed automatically)."""
    def build(p, emit):
        S.snapshot_overwrite(
            spark.createDataFrame(
                [(i, f"t{i}") for i in range(12)], "doc_id int, text string"
            ), p,
        )
        S.snapshot_merge(
            spark.createDataFrame(
                [(3, "updated"), (50, "fresh")], "doc_id int, text string"
            ),
            p, ["doc_id"], emit_changes=emit,
        )
        S.snapshot_delete(
            spark.createDataFrame([(7,)], "doc_id int"), p, ["doc_id"],
            emit_changes=emit,
        )

    p_feed, p_diff = f"{tmp_path}/feed", f"{tmp_path}/diff"
    build(p_feed, True)
    build(p_diff, False)
    a = sync.table_net_changes(spark, p_feed, 1, 3, "doc_id")
    b = sync.table_net_changes(spark, p_diff, 1, 3, "doc_id")
    for leg in ("inserted", "deleted", "updated"):
        assert _multiset_equal(a[leg], b[leg]), leg
    assert a["inserted"].collect()[0][0] == 50
    assert a["deleted"].collect()[0][0] == 7
    assert a["updated"].collect()[0][0] == 3


# ---------------------------------------------------------------- zone maps


def test_zone_maps_prune_dirs_and_results_match_filter(spark):
    """Per-dir min/max in the manifest skip directories at the manifest
    level; results are always exactly scan-plus-filter."""
    base = tempfile.mkdtemp(prefix="zm_")
    p = f"{base}/t"
    # three appends with disjoint id ranges; declaration on the first
    S.snapshot_append(_rows(spark, [(i, "a", i) for i in range(0, 10)]), p,
                      stats_cols=["id", "x"])
    S.snapshot_append(_rows(spark, [(i, "b", i) for i in range(100, 110)]), p)
    S.snapshot_append(_rows(spark, [(i, "c", i) for i in range(200, 210)]), p)
    rep = S.snapshot_prune_report(spark, p, {"id": (100, 150)})
    assert (rep["total_dirs"], rep["kept_dirs"]) == (3, 1)
    got = sorted(r.id for r in S.read_snapshot(
        spark, p, bounds={"id": (100, 150)}
    ).collect())
    want = sorted(
        r.id for r in S.read_snapshot(spark, p).filter("id >= 100 AND id <= 150").collect()
    )
    assert got == want == list(range(100, 110))
    # open-sided bound
    rep = S.snapshot_prune_report(spark, p, {"id": (None, 50)})
    assert rep["kept_dirs"] == 1
    assert S.read_snapshot(spark, p, bounds={"id": (None, 50)}).count() == 10
    # everything pruned: empty frame, schema preserved
    out = S.read_snapshot(spark, p, bounds={"id": (500, 600)})
    assert out.count() == 0 and out.columns == ["id", "s", "x"]


def test_zone_maps_sticky_through_merge_delete_optimize(spark):
    """The declaration is sticky: rewrite commits recompute the single
    new dir's stats; pruning stays correct through the whole lifecycle."""
    base = tempfile.mkdtemp(prefix="zms_")
    p = f"{base}/t"
    S.snapshot_append(_rows(spark, [(i, "a", i) for i in range(20)]), p,
                      stats_cols=["id"])
    S.snapshot_merge(_rows(spark, [(5, "u", 999), (30, "n", 30)]), p, ["id"])
    S.snapshot_delete(spark.createDataFrame([(7,)], "id int"), p, ["id"])
    S.snapshot_optimize(spark, p, n_files=1)
    S.snapshot_append(_rows(spark, [(i, "z", i) for i in range(1000, 1010)]), p)
    m = S.read_manifest(spark, p, S.current_version(spark, p))
    assert m["stats_cols"] == ["id"]
    assert set(m["dir_stats"]) == set(m["dirs"])
    rep = S.snapshot_prune_report(spark, p, {"id": (1000, None)})
    assert (rep["total_dirs"], rep["kept_dirs"]) == (2, 1)
    got = sorted(r.id for r in S.read_snapshot(
        spark, p, bounds={"id": (0, 40)}
    ).collect())
    assert got == sorted(set(range(20)) - {7} | {30})
    # rollback carries the maps
    S.snapshot_rollback(spark, p, S.current_version(spark, p) - 1)
    m2 = S.read_manifest(spark, p, S.current_version(spark, p))
    assert m2.get("stats_cols") == ["id"] and m2.get("dir_stats")


def test_zone_maps_date_and_null_semantics(spark):
    import datetime

    base = tempfile.mkdtemp(prefix="zmd_")
    p = f"{base}/t"
    mk = lambda lo, hi: spark.createDataFrame(
        [(i, datetime.date(2024, 1, 1) + datetime.timedelta(days=i))
         for i in range(lo, hi)],
        "id int, day date",
    )
    S.snapshot_append(mk(0, 30), p, stats_cols=["day"])
    S.snapshot_append(mk(60, 90), p)
    # all-NULL dir is prunable for bounds on that column
    S.snapshot_append(
        spark.createDataFrame([(999, None)], "id int, day date"), p
    )
    rep = S.snapshot_prune_report(
        spark, p, {"day": (datetime.date(2024, 3, 1), None)}
    )
    assert (rep["total_dirs"], rep["kept_dirs"]) == (3, 1)
    got = S.read_snapshot(
        spark, p, bounds={"day": (datetime.date(2024, 3, 1), None)}
    )
    want = S.read_snapshot(spark, p).filter("day >= DATE'2024-03-01'")
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in want.collect()
    )
    # undeclared tables read unpruned but bounds still filter
    p2 = f"{base}/nodecl"
    S.snapshot_append(mk(0, 10), p2)
    assert S.read_snapshot(
        spark, p2, bounds={"day": (datetime.date(2024, 1, 5), None)}
    ).count() == 6  # days 01-05 .. 01-10
    assert S.snapshot_prune_report(
        spark, p2, {"day": (datetime.date(2030, 1, 1), None)}
    )["pruned_dirs"] == 0


def test_zone_maps_declaring_missing_column_raises(spark):
    base = tempfile.mkdtemp(prefix="zmm_")
    with pytest.raises(ValueError, match="absent from written data"):
        S.snapshot_append(
            _rows(spark, [(1, "a", 1)]), f"{base}/t", stats_cols=["nope"]
        )


def test_zone_maps_sticky_survives_column_omitting_append(spark):
    """Additive schema evolution: an append legally omitting a declared
    stats column records [None, None] for its dir (the rows read NULL
    there — prunable truth), instead of failing the commit; an EXPLICIT
    declaration naming a missing column still refuses (typo guard,
    pinned by test_zone_maps_declaring_missing_column_raises)."""
    base = tempfile.mkdtemp(prefix="zme_")
    p = f"{base}/t"
    S.snapshot_append(_rows(spark, [(1, "a", 10)]), p, stats_cols=["x"])
    S.snapshot_append(
        spark.createDataFrame([(2, "b")], "id int, s string"), p
    )  # no x column — sticky maintenance must not raise
    m = S.read_manifest(spark, p, S.current_version(spark, p))
    vals = [v["x"] for v in m["dir_stats"].values()]
    assert [None, None] in vals and [10, 10] in vals
    # a bound on x prunes the x-less dir and keeps results = filter
    got = S.read_snapshot(
        spark, p, merge_schema=True, bounds={"x": (5, 15)}
    ).collect()
    assert [(r.id, r.x) for r in got] == [(1, 10)]
