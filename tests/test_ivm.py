"""Incremental view maintenance (r13): a materialized groupBy view that
follows its snapshot table via the changelog — algebraic merge for
linear aggregates, signed retraction under deletes, affected-group
recompute for the non-linear ones — always equal to a full recompute
(the differential agg_view_verify pins, and the ns_ivm_view oracle
value-hashes)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import ivm
from pwhl_data_engineering_pipeline_spark.sources import snapshots as snap


def _rows(spark, data):
    return spark.createDataFrame(
        [(g, i, Decimal(v) if v is not None else None) for g, i, v in data],
        "grp string, id long, val decimal(18,2)",
    )


LINEAR = [
    {"name": "n", "fn": "count", "col": None},
    {"name": "nv", "fn": "count", "col": "val"},
    {"name": "total", "fn": "sum", "col": "val"},
    {"name": "mean", "fn": "avg", "col": "val"},
]
MIXED = LINEAR + [
    {"name": "lo", "fn": "min", "col": "val"},
    {"name": "hi", "fn": "max", "col": "val"},
]
NONLIN = MIXED + [{"name": "uniq", "fn": "count_distinct", "col": "val"}]


def test_linear_lifecycle_appends_retraction_and_group_death(spark, tmp_path):
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    snap.snapshot_append(
        _rows(spark, [("a", 1, "1.50"), ("a", 2, "2.25"), ("b", 3, "10.00")]),
        src,
    )
    out = ivm.agg_view_create(spark, src, view, ["grp"], LINEAR)
    assert out["groups"] == 2
    assert ivm.agg_view_verify(spark, view)["equal"]

    # append-shaped: delta aggregate over new rows only
    snap.snapshot_append(
        _rows(spark, [("a", 4, "0.25"), ("c", 5, None)]), src
    )
    r = ivm.agg_view_refresh(spark, view)
    assert r["path"] == "append" and r["touched_groups"] == 2
    assert ivm.agg_view_verify(spark, view)["equal"]
    got = {
        row["grp"]: (row["n"], row["nv"], row["total"], row["mean"])
        for row in ivm.agg_view_read(spark, view).collect()
    }
    # all-null group: count(*)=1, count(val)=0, sum/avg NULL (not 0)
    assert got["c"] == (1, 0, None, None)
    assert got["a"][2] == Decimal("4.00")

    # keyed delete (overwrite commit) → signed retraction path
    snap.snapshot_delete(
        spark.createDataFrame([(3,)], "id long"), src, ["id"]
    )
    r = ivm.agg_view_refresh(spark, view)
    assert r["path"] == "retraction"
    assert ivm.agg_view_verify(spark, view)["equal"]
    # group b lost its only row — it leaves the view entirely
    assert set(
        row["grp"] for row in ivm.agg_view_read(spark, view).collect()
    ) == {"a", "c"}

    # retracting the last non-null value must restore NULL, never 0
    snap.snapshot_delete(
        spark.createDataFrame([(1,), (2,), (4,)], "id long"), src, ["id"]
    )
    ivm.agg_view_refresh(spark, view)
    got = {
        row["grp"]: (row["n"], row["nv"], row["total"])
        for row in ivm.agg_view_read(spark, view).collect()
    }
    assert set(got) == {"c"}
    assert ivm.agg_view_verify(spark, view)["equal"]


def test_minmax_merges_on_appends_recomputes_on_deletes(spark, tmp_path):
    src = str(tmp_path / "src2")
    view = str(tmp_path / "view2")
    snap.snapshot_append(
        _rows(spark, [("a", 1, "5.00"), ("a", 2, "9.00"), ("b", 3, "1.00")]),
        src,
    )
    ivm.agg_view_create(spark, src, view, ["grp"], MIXED)

    # inserts keep min/max algebraic
    snap.snapshot_append(_rows(spark, [("a", 4, "3.00")]), src)
    r = ivm.agg_view_refresh(spark, view)
    assert r["path"] == "append"
    got = {row["grp"]: (row["lo"], row["hi"])
           for row in ivm.agg_view_read(spark, view).collect()}
    assert got["a"] == (Decimal("3.00"), Decimal("9.00"))

    # deleting the current max forces the affected-group recompute —
    # and ONLY group a is touched
    snap.snapshot_delete(spark.createDataFrame([(2,)], "id long"), src, ["id"])
    r = ivm.agg_view_refresh(spark, view)
    assert r["path"] == "recompute_groups" and r["touched_groups"] == 1
    got = {row["grp"]: (row["lo"], row["hi"])
           for row in ivm.agg_view_read(spark, view).collect()}
    assert got["a"] == (Decimal("3.00"), Decimal("5.00"))
    assert got["b"] == (Decimal("1.00"), Decimal("1.00"))
    assert ivm.agg_view_verify(spark, view)["equal"]


def test_count_distinct_always_recomputes_affected_groups(spark, tmp_path):
    src = str(tmp_path / "src3")
    view = str(tmp_path / "view3")
    snap.snapshot_append(
        _rows(spark, [("a", 1, "5.00"), ("a", 2, "5.00"), ("b", 3, "1.00")]),
        src,
    )
    ivm.agg_view_create(spark, src, view, ["grp"], NONLIN)
    # even an append-shaped delta cannot merge a distinct count (the new
    # value may or may not already be present)
    snap.snapshot_append(_rows(spark, [("a", 4, "5.00"), ("a", 5, "7.00")]), src)
    r = ivm.agg_view_refresh(spark, view)
    assert r["path"] == "recompute_groups" and r["touched_groups"] == 1
    got = {row["grp"]: row["uniq"]
           for row in ivm.agg_view_read(spark, view).collect()}
    assert got == {"a": 2, "b": 1}
    assert ivm.agg_view_verify(spark, view)["equal"]


def test_refresh_noop_full_mode_and_rollback_guard(spark, tmp_path):
    src = str(tmp_path / "src4")
    view = str(tmp_path / "view4")
    snap.snapshot_append(_rows(spark, [("a", 1, "1.00")]), src)
    ivm.agg_view_create(spark, src, view, ["grp"], LINEAR)
    v_before = snap.current_version(spark, view)
    assert ivm.agg_view_refresh(spark, view)["path"] == "noop"
    assert snap.current_version(spark, view) == v_before  # no empty commit

    snap.snapshot_append(_rows(spark, [("b", 2, "2.00")]), src)
    assert ivm.agg_view_refresh(spark, view, mode="full")["path"] == "full"
    assert ivm.agg_view_verify(spark, view)["equal"]

    # history rewritten under the view → loud, not silently wrong
    snap.snapshot_rollback(spark, src, 1)
    snap.vacuum(spark, src, keep_last=1, min_age_seconds=0)
    with pytest.raises(ValueError, match="rebuild"):
        # stamped version 2 no longer exists / current went backwards
        ivm.agg_view_refresh(spark, view)


def test_crashed_refresh_rerun_lands_once(spark, tmp_path, monkeypatch):
    """A refresh that dies after writing its data dir but before the
    manifest commit leaves the stamp unchanged; the re-run recomputes
    the same delta and commits once (the orphan dir is vacuum's job)."""
    src = str(tmp_path / "src5")
    view = str(tmp_path / "view5")
    snap.snapshot_append(_rows(spark, [("a", 1, "1.00")]), src)
    ivm.agg_view_create(spark, src, view, ["grp"], LINEAR)
    snap.snapshot_append(_rows(spark, [("a", 2, "2.00")]), src)

    real_commit = snap._commit

    def boom(*a, **k):
        raise RuntimeError("crash before commit")

    monkeypatch.setattr(snap, "_commit", boom)
    with pytest.raises(RuntimeError):
        ivm.agg_view_refresh(spark, view)
    monkeypatch.setattr(snap, "_commit", real_commit)

    assert ivm.agg_view_refresh(spark, view)["path"] == "append"
    assert ivm.agg_view_verify(spark, view)["equal"]
    got = ivm.agg_view_read(spark, view).collect()
    assert len(got) == 1 and got[0]["total"] == Decimal("3.00")
    # replay protection: nothing doubled on yet another refresh
    assert ivm.agg_view_refresh(spark, view)["path"] == "noop"


def test_spec_validation_and_wrong_table_guard(spark, tmp_path):
    src = str(tmp_path / "src6")
    snap.snapshot_append(_rows(spark, [("a", 1, "1.00")]), src)
    with pytest.raises(ValueError, match="unsupported"):
        ivm.agg_view_create(spark, src, str(tmp_path / "v"), ["grp"],
                            [("x", "median", "val")])
    with pytest.raises(ValueError, match="needs a column"):
        ivm.agg_view_create(spark, src, str(tmp_path / "v"), ["grp"],
                            [("x", "sum", None)])
    with pytest.raises(ValueError, match="duplicate"):
        ivm.agg_view_create(spark, src, str(tmp_path / "v"), ["grp"],
                            [("x", "sum", "val"), ("x", "count", None)])
    # a plain snapshot table is not a view
    with pytest.raises(ValueError, match="no IVM spec"):
        ivm.agg_view_refresh(spark, src)
    # refusing to clobber an existing table
    with pytest.raises(IOError, match="refusing"):
        ivm.agg_view_create(spark, src, src, ["grp"], LINEAR)


def test_view_follows_streaming_fed_table(spark, tmp_path):
    """Composition seam (r13): the IVM view refreshes from a table fed by
    the exactly-once streaming snapshot sink — stream-append commits are
    append-shaped, so every refresh rides the algebraic fast path (new
    data dirs only), and a replayed epoch (deduped by the sink) never
    double-counts into the view."""
    from pwhl_data_engineering_pipeline_spark.sources import snapshots as S

    src = str(tmp_path / "stream_src")
    table = str(tmp_path / "stream_tbl")
    ckpt = str(tmp_path / "stream_ck")
    view = str(tmp_path / "stream_view")

    def land(lo, hi):
        spark.range(lo, hi).selectExpr(
            "CAST(id % 7 AS STRING) AS grp", "id",
            "CAST(id AS DECIMAL(18,2)) AS val",
        ).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(
            "grp string, id long, val decimal(18,2)"
        ).parquet(src)
        q = S.streaming_snapshot_sink(stream, table, ckpt).trigger(
            availableNow=True
        ).start()
        q.awaitTermination(120)

    land(0, 50)
    run()
    ivm.agg_view_create(spark, table, view, ["grp"], LINEAR)

    land(50, 80)
    run()
    r = ivm.agg_view_refresh(spark, view)
    assert r["path"] == "append"  # stream-append commits are append-shaped
    assert ivm.agg_view_verify(spark, view)["equal"]

    # a replayed epoch is deduped by the sink: no new version, and the
    # view refresh is a no-op — nothing double-counts
    hist = S.snapshot_history(spark, table)
    epoch = hist[-1]["epoch_id"]
    assert S.commit_stream_batch(
        spark.read.parquet(src), epoch, table, stream_id=ckpt
    ) is None
    assert ivm.agg_view_refresh(spark, view)["path"] == "noop"
    got = {r2["grp"]: (r2["n"], r2["total"])
           for r2 in ivm.agg_view_read(spark, view).collect()}
    assert sum(n for n, _ in got.values()) == 80


def test_randomized_lifecycle_always_equals_recompute(spark, tmp_path):
    """Seeded random walk over the table's life — appends (with nulls and
    brand-new groups), keyed updates, keyed deletes (including whole-group
    wipes), in random order — refreshed incrementally after every step
    and differentially verified against a full recompute each time. The
    routing is whatever the spec demands (MIXED: min/max force
    recompute_groups under deletes); equality is the invariant."""
    import random

    rng = random.Random(13)
    src = str(tmp_path / "rsrc")
    view = str(tmp_path / "rview")
    next_id = [0]

    def fresh_rows(n):
        rows = []
        for _ in range(n):
            g = f"g{rng.randrange(6)}"
            v = None if rng.random() < 0.2 else f"{rng.randrange(1000)}.{rng.randrange(100):02d}"
            rows.append((g, next_id[0], v))
            next_id[0] += 1
        return _rows(spark, rows)

    snap.snapshot_append(fresh_rows(40), src)
    ivm.agg_view_create(spark, src, view, ["grp"], MIXED)

    for step in range(8):
        op = rng.choice(["append", "update", "delete"])
        live_ids = [r["id"] for r in snap.read_snapshot(spark, src)
                    .select("id").collect()]
        if op == "append" or not live_ids:
            snap.snapshot_append(fresh_rows(rng.randrange(1, 15)), src)
        elif op == "update":
            picked = rng.sample(live_ids, min(len(live_ids), rng.randrange(1, 10)))
            upd = _rows(spark, [
                (f"g{rng.randrange(6)}", i,
                 None if rng.random() < 0.2 else f"{rng.randrange(1000)}.00")
                for i in picked
            ])
            snap.snapshot_merge(upd, src, ["id"])
        else:
            picked = rng.sample(live_ids, min(len(live_ids), rng.randrange(1, 12)))
            snap.snapshot_delete(
                spark.createDataFrame([(i,) for i in picked], "id long"),
                src, ["id"],
            )
        r = ivm.agg_view_refresh(spark, view)
        v = ivm.agg_view_verify(spark, view)
        assert v["equal"], (step, op, r)


def test_derived_key_daily_rollup_follows_changes(spark, tmp_path):
    """Continuous aggregate (r13): a daily rollup grouped by a DERIVED
    key (date_trunc of the row's timestamp) maintains itself through
    append / update / delete — the reference's daily weather rollup
    shape, incremental. The derived expression is a pure row function,
    so a retraction lands in exactly the bucket its insert landed in."""
    import datetime

    src = str(tmp_path / "dsrc")
    view = str(tmp_path / "dview")

    def rows(data):
        return spark.createDataFrame(
            [(i, datetime.datetime(2026, 8, d, h), Decimal(v))
             for i, d, h, v in data],
            "id long, ts timestamp, val decimal(18,2)",
        )

    snap.snapshot_append(rows([
        (1, 1, 3, "1.00"), (2, 1, 17, "2.00"), (3, 2, 9, "4.00"),
    ]), src)
    ivm.agg_view_create(
        spark, src, view, ["day"],
        [("n", "count", None), ("total", "sum", "val")],
        key_exprs={"day": "date_trunc('DAY', ts)"},
    )

    snap.snapshot_append(rows([(4, 2, 23, "8.00"), (5, 3, 1, "16.00")]), src)
    assert ivm.agg_view_refresh(spark, view)["path"] == "append"
    # move row 3 to another day AND change its value (keyed update)
    snap.snapshot_merge(rows([(3, 1, 9, "32.00")]), src, ["id"])
    assert ivm.agg_view_refresh(spark, view)["path"] == "retraction"
    snap.snapshot_delete(
        spark.createDataFrame([(2,)], "id long"), src, ["id"]
    )
    assert ivm.agg_view_refresh(spark, view)["path"] == "retraction"
    assert ivm.agg_view_verify(spark, view)["equal"]
    got = {
        r["day"].day: (r["n"], r["total"])
        for r in ivm.agg_view_read(spark, view).collect()
    }
    # day1: rows 1 + moved 3; day2: row 4 only (3 moved out, 2 deleted)
    assert got == {1: (2, Decimal("33.00")), 2: (1, Decimal("8.00")),
                   3: (1, Decimal("16.00"))}

    with pytest.raises(ValueError, match="not in keys"):
        ivm.agg_view_create(
            spark, src, str(tmp_path / "bad"), ["grp"],
            [("n", "count", None)], key_exprs={"day": "date_trunc('DAY', ts)"},
        )


def test_partitioned_view_touches_only_delta_partitions(spark, tmp_path):
    """Partitioned views (r13): refresh reads AND rewrites only the
    partitions the delta touches — untouched sub-tables keep their
    version byte-for-byte — and a crash mid-partition-loop resumes via
    the per-partition source-version marker without double-applying the
    algebraic delta."""
    src = str(tmp_path / "psrc")
    view = str(tmp_path / "pview")
    snap.snapshot_append(
        _rows(spark, [("a", 1, "1.00"), ("a", 2, "2.00"),
                      ("b", 3, "4.00"), ("c", 4, "8.00")]),
        src,
    )
    out = ivm.agg_view_create(
        spark, src, view, ["grp"], LINEAR, partition_by="grp"
    )
    assert out["partitions"] == 3
    assert ivm.agg_view_verify(spark, view)["equal"]
    v_b0 = snap.current_version(spark, f"{view}/grp=b")

    # delta touches only groups a and c
    snap.snapshot_append(
        _rows(spark, [("a", 5, "16.00"), ("c", 6, "32.00")]), src
    )
    r = ivm.agg_view_refresh(spark, view)
    assert r["path"] == "append" and r["touched_partitions"] == 2
    assert snap.current_version(spark, f"{view}/grp=b") == v_b0  # untouched
    assert ivm.agg_view_verify(spark, view)["equal"]

    # retraction also partition-bounded; a brand-new group makes a NEW
    # partition in the same refresh
    snap.snapshot_delete(spark.createDataFrame([(3,)], "id long"), src, ["id"])
    snap.snapshot_append(_rows(spark, [("d", 7, "64.00")]), src)
    r = ivm.agg_view_refresh(spark, view)
    assert r["path"] == "retraction"
    assert set(
        row["grp"] for row in ivm.agg_view_read(spark, view).collect()
    ) == {"a", "c", "d"}  # b died (sub-table emptied), d was born
    assert ivm.agg_view_verify(spark, view)["equal"]


def test_partitioned_view_crash_mid_loop_resumes_exactly_once(
    spark, tmp_path, monkeypatch
):
    src = str(tmp_path / "pcsrc")
    view = str(tmp_path / "pcview")
    snap.snapshot_append(
        _rows(spark, [("a", 1, "1.00"), ("b", 2, "2.00")]), src
    )
    ivm.agg_view_create(spark, src, view, ["grp"], LINEAR, partition_by="grp")
    snap.snapshot_append(
        _rows(spark, [("a", 3, "4.00"), ("b", 4, "8.00")]), src
    )

    real = ivm._commit_partition_state
    calls = {"n": 0}

    def crash_on_second(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("crash mid partition loop")
        return real(*a, **k)

    monkeypatch.setattr(ivm, "_commit_partition_state", crash_on_second)
    with pytest.raises(RuntimeError, match="mid partition"):
        ivm.agg_view_refresh(spark, view)
    monkeypatch.setattr(ivm, "_commit_partition_state", real)

    # stamp chain not advanced → re-run re-applies the same range; the
    # already-committed partition skips via its source-version marker
    r = ivm.agg_view_refresh(spark, view)
    assert r["path"] == "append" and r["touched_partitions"] == 2
    got = {row["grp"]: (row["n"], row["total"])
           for row in ivm.agg_view_read(spark, view).collect()}
    assert got == {"a": (2, Decimal("5.00")), "b": (2, Decimal("10.00"))}
    assert ivm.agg_view_verify(spark, view)["equal"]
    assert ivm.agg_view_refresh(spark, view)["path"] == "noop"


def test_partitioned_view_create_refuses_clobber(spark, tmp_path):
    """A partitioned view has no view-level manifest — the clobber guard
    must check its state chain too."""
    src = str(tmp_path / "gsrc")
    view = str(tmp_path / "gview")
    snap.snapshot_append(_rows(spark, [("a", 1, "1.00")]), src)
    ivm.agg_view_create(spark, src, view, ["grp"], LINEAR, partition_by="grp")
    with pytest.raises(IOError, match="refusing"):
        ivm.agg_view_create(spark, src, view, ["grp"], LINEAR,
                            partition_by="grp")
    with pytest.raises(IOError, match="refusing"):
        ivm.agg_view_create(spark, src, view, ["grp"], LINEAR)


def test_refresh_emits_feed_netting_to_view_diff(spark, tmp_path):
    """Every single-table refresh commit carries a CDF whose net equals
    the view's own version diff — the property that makes a view a
    changelog-bearing source for a downstream view."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    snap.snapshot_append(
        _rows(spark, [("a", 1, "1.00"), ("b", 2, "2.00"), ("c", 3, "3.00")]),
        src,
    )
    ivm.agg_view_create(spark, src, view, ["grp"], MIXED)
    snap.snapshot_append(_rows(spark, [("a", 4, "0.50"), ("d", 5, "4.00")]), src)
    ivm.agg_view_refresh(spark, view)  # append path
    snap.snapshot_delete(
        spark.createDataFrame([(2,), (3,)], "id long"), src, ["id"]
    )
    ivm.agg_view_refresh(spark, view)  # recompute path (min/max + deletes)
    ivm.agg_view_refresh(spark, view, mode="full")  # full path
    head = snap.current_version(spark, view)
    for v in range(2, head + 1):
        net = snap.snapshot_changes_net(spark, view, v - 1, v)
        diff = snap.snapshot_diff(spark, view, v - 1, v)
        cols = sorted(net.columns)
        assert (
            net.select(*cols).exceptAll(diff.select(*cols)).count() == 0
            and diff.select(*cols).exceptAll(net.select(*cols)).count() == 0
        ), v


def test_view_chain_daily_to_monthly(spark, tmp_path):
    """The composition: a monthly rollup view sourced from the DAILY
    view's changelog (expression aggs over upstream state columns),
    correct through append + keyed delete, each hop O(its delta)."""
    import datetime

    src = str(tmp_path / "src")
    daily = str(tmp_path / "daily")
    monthly = str(tmp_path / "monthly")
    rows = spark.createDataFrame(
        [
            (i, datetime.date(2024, 1 + (i % 3), 1 + (i % 25)), (i % 7) * 100)
            for i in range(60)
        ],
        "id long, day date, cents long",
    )
    snap.snapshot_overwrite(rows, src)
    ivm.agg_view_create(
        spark, src, daily, ["day"],
        [("n", "count", None), ("total", "sum", "cents")],
    )
    ivm.agg_view_create(
        spark, daily, monthly, ["month"],
        [("days", "count", None), ("rows_", "sum", "__ivm_n"),
         ("total", "sum", "__ivm_s_total")],
        key_exprs={"month": "CAST(date_trunc('MONTH', day) AS DATE)"},
    )
    assert ivm.agg_view_verify(spark, monthly)["equal"]

    def truth():
        return {
            r["month"]: (r["days"], r["rows_"], r["total"])
            for r in snap.read_snapshot(spark, src)
            .groupBy(F.expr("CAST(date_trunc('MONTH', day) AS DATE)").alias("month"))
            .agg(
                F.countDistinct("day").alias("days"),
                F.count(F.lit(1)).alias("rows_"),
                F.sum("cents").alias("total"),
            ).collect()
        }

    def got():
        return {
            r["month"]: (r["days"], r["rows_"], r["total"])
            for r in ivm.agg_view_read(spark, monthly).collect()
        }

    # append: new rows on existing + new days
    snap.snapshot_append(
        spark.createDataFrame(
            [(100, datetime.date(2024, 1, 2), 1000),
             (101, datetime.date(2024, 4, 9), 500)],
            "id long, day date, cents long",
        ),
        src,
    )
    # downstream before upstream: noop (upstream hasn't moved)
    assert ivm.agg_view_refresh(spark, monthly)["path"] == "noop"
    r_up = ivm.agg_view_refresh(spark, daily)
    assert r_up["path"] == "append"
    r_dn = ivm.agg_view_refresh(spark, monthly)
    # an existing day's state changed → upstream feed carries its
    # delete+insert pair → the downstream retracts algebraically
    assert r_dn["path"] == "retraction"
    assert got() == truth()
    assert ivm.agg_view_verify(spark, monthly)["equal"]

    # keyed delete upstream of the chain
    snap.snapshot_delete(
        spark.createDataFrame([(i,) for i in range(0, 60, 5)], "id long"),
        src, ["id"],
    )
    assert ivm.agg_view_refresh(spark, daily)["path"] == "retraction"
    assert ivm.agg_view_refresh(spark, monthly)["path"] == "retraction"
    assert got() == truth()
    assert ivm.agg_view_verify(spark, monthly)["equal"]


def test_maintenance_tick_orders_view_chain(spark, tmp_path):
    """A list of views in the maintenance targets refreshes
    upstream-first, and a downstream whose upstream is scheduled this
    tick is scheduled too (its 'behind' only materializes after the
    upstream refresh runs)."""
    from pwhl_data_engineering_pipeline_spark.operators import maintenance

    src = str(tmp_path / "src")
    up = str(tmp_path / "up")
    down = str(tmp_path / "down")
    snap.snapshot_append(
        _rows(spark, [("a", 1, "1.00"), ("b", 2, "2.00")]), src
    )
    ivm.agg_view_create(spark, src, up, ["grp"],
                        [("total", "sum", "val")])
    ivm.agg_view_create(
        spark, up, down, ["all_"],
        [("grand", "sum", "__ivm_s_total")],
        key_exprs={"all_": "'all'"},
    )
    snap.snapshot_append(_rows(spark, [("a", 3, "5.00")]), src)
    # down is NOT behind yet (up hasn't refreshed) — the plan must still
    # schedule it, after up
    plan = maintenance.maintenance_plan(
        spark, {"view": [down, up]}  # deliberately listed downstream-first
    )
    refreshes = [a for a in plan if a["action"] == "refresh"]
    assert [a["path"] for a in refreshes] == [up, down]
    assert refreshes[1]["reason"].get("upstream_refresh_scheduled") is True
    out = maintenance.maintenance_run(spark, plan)
    assert len(out["done"]) == 2 and not out["skipped"]
    assert ivm.agg_view_verify(spark, down)["equal"]
    got = ivm.agg_view_read(spark, down).collect()
    assert len(got) == 1 and got[0]["grand"] == Decimal("8.00")
    # caught up: next tick is empty
    assert not maintenance.maintenance_plan(spark, {"view": [down, up]})


def test_recompute_scan_bounded_by_zone_maps(spark, tmp_path):
    """Zone-map × IVM composition: when the group key is a declared
    stats column, the affected-group recompute opens only directories
    that can hold affected groups (reported in the refresh result).
    The case that matters is count_distinct over an APPEND-ONLY
    time-bucketed table — recompute fires on every append, and the
    rescan must skip the untouched buckets' directories (a keyed
    delete rewrites the table to one dir, where pruning is moot)."""
    import datetime

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    mk = lambda m, lo, n: spark.createDataFrame(
        [(m * 1000 + lo + i, datetime.date(2024, m, 1 + ((lo + i) % 25)),
          (lo + i) % 7) for i in range(n)],
        "id long, day date, bucket long",
    )
    snap.snapshot_append(mk(1, 0, 40), src, stats_cols=["day"])
    snap.snapshot_append(mk(2, 0, 40), src)
    snap.snapshot_append(mk(3, 0, 40), src)
    ivm.agg_view_create(
        spark, src, view, ["day"],
        [("n", "count", None), ("uniq", "count_distinct", "bucket")],
    )
    # append MARCH rows only → count_distinct recomputes affected days;
    # the rescan must skip the january and february directories
    snap.snapshot_append(mk(3, 100, 10), src)
    r = ivm.agg_view_refresh(spark, view)
    assert r["path"] == "recompute_groups"
    assert r["source_dirs_total"] == 4 and r["source_dirs_pruned"] == 2
    assert ivm.agg_view_verify(spark, view)["equal"]
    want = {
        row["day"]: (row["n"], row["uniq"])
        for row in snap.read_snapshot(spark, src)
        .groupBy("day").agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("bucket").alias("uniq"),
        ).collect()
    }
    got = {
        row["day"]: (row["n"], row["uniq"])
        for row in ivm.agg_view_read(spark, view).collect()
    }
    assert got == want


def test_approx_distinct_rides_algebraic_append_and_recomputes_on_delete(
    spark, tmp_path
):
    """approx_count_distinct: HLL sketch state merges on append-shaped
    refreshes (NO source rescan — the path stays 'append' even though
    exact count_distinct would force recompute), recomputes under
    deletes, and estimates within tolerance of the exact answer."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    mk = lambda lo, n: spark.createDataFrame(
        [(["a", "b"][i % 2], lo + i, (lo + i) % 40) for i in range(n)],
        "grp string, id long, val long",
    )
    snap.snapshot_overwrite(mk(0, 60), src)
    ivm.agg_view_create(
        spark, src, view, ["grp"],
        [("n", "count", None), ("uniq", "approx_count_distinct", "val")],
    )
    snap.snapshot_append(mk(1000, 60), src)
    r = ivm.agg_view_refresh(spark, view)
    assert r["path"] == "append"  # sketch union, no rescan
    assert ivm.agg_view_verify(spark, view)["equal"]
    exact = {
        row["grp"]: row["x"]
        for row in snap.read_snapshot(spark, src)
        .groupBy("grp").agg(F.countDistinct("val").alias("x")).collect()
    }
    got = {
        row["grp"]: row["uniq"]
        for row in ivm.agg_view_read(spark, view).collect()
    }
    for g, e in exact.items():
        assert abs(got[g] - e) <= max(1, 0.05 * e), (g, got[g], e)
    # deletes cannot retract a sketch → affected-group recompute
    snap.snapshot_delete(
        spark.createDataFrame([(i,) for i in range(0, 60, 2)], "id long"),
        src, ["id"],
    )
    r = ivm.agg_view_refresh(spark, view)
    assert r["path"] == "recompute_groups"
    assert ivm.agg_view_verify(spark, view)["equal"]


def test_sketch_chain_monthly_uniques_from_daily_sketches(spark, tmp_path):
    """The Druid rollup chain: a daily view sketches visitor ids;
    a monthly view UNIONS the daily sketches (approx_count_distinct_merge
    over the upstream's __ivm_h_* state) — monthly uniques without ever
    rescanning raw events."""
    import datetime

    src = str(tmp_path / "src")
    daily = str(tmp_path / "daily")
    monthly = str(tmp_path / "monthly")
    mk = lambda lo, n: spark.createDataFrame(
        [(lo + i, datetime.date(2024, 1 + ((lo + i) % 2), 1 + (i % 20)),
          (lo + i) % 33) for i in range(n)],
        "id long, day date, visitor long",
    )
    snap.snapshot_overwrite(mk(0, 80), src)
    ivm.agg_view_create(
        spark, src, daily, ["day"],
        [("uniq", "approx_count_distinct", "visitor")],
    )
    ivm.agg_view_create(
        spark, daily, monthly, ["month"],
        [("days", "count", None),
         ("uniq", "approx_count_distinct_merge", "__ivm_h_uniq")],
        key_exprs={"month": "CAST(date_trunc('MONTH', day) AS DATE)"},
    )
    snap.snapshot_append(mk(500, 40), src)
    assert ivm.agg_view_refresh(spark, daily)["path"] == "append"
    r = ivm.agg_view_refresh(spark, monthly)
    # upstream feed carries delete+insert pairs for changed days →
    # sketches can't retract → affected-month recompute (over the
    # DAILY STATE, never the raw events)
    assert r["path"] == "recompute_groups"
    assert ivm.agg_view_verify(spark, monthly)["equal"]
    exact = {
        row["m"]: row["x"]
        for row in snap.read_snapshot(spark, src)
        .groupBy(F.expr("CAST(date_trunc('MONTH', day) AS DATE)").alias("m"))
        .agg(F.countDistinct("visitor").alias("x")).collect()
    }
    got = {
        row["month"]: (row["days"], row["uniq"])
        for row in ivm.agg_view_read(spark, monthly).collect()
    }
    for m, e in exact.items():
        assert abs(got[m][1] - e) <= max(1, 0.05 * e), (m, got[m], e)
