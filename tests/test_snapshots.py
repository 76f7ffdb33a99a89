"""Snapshot-versioned tables (sources.snapshots): append/overwrite history,
time travel, non-destructive rollback, crash-orphan invisibility, vacuum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.sources import snapshots as S


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 10).alias("v"))


def test_append_overwrite_time_travel_rollback(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v1 = S.snapshot_append(_df(spark, 0, 5), path)
    v2 = S.snapshot_append(_df(spark, 5, 8), path)
    v3 = S.snapshot_overwrite(_df(spark, 100, 102), path)
    assert (v1, v2, v3) == (1, 2, 3)
    assert S.current_version(spark, path) == 3
    # time travel
    assert S.read_snapshot(spark, path, 1).count() == 5
    assert S.read_snapshot(spark, path, 2).count() == 8
    assert sorted(
        r["id"] for r in S.read_snapshot(spark, path).collect()
    ) == [100, 101]
    # rollback restores v2 as a NEW version; v3 stays in history
    v4 = S.snapshot_rollback(spark, path, 2)
    assert v4 == 4
    assert S.read_snapshot(spark, path).count() == 8
    ops = [m["op"] for m in S.snapshot_history(spark, path)]
    assert ops == ["append", "append", "overwrite", "rollback:2"]
    # appends still build on the rolled-back state
    S.snapshot_append(_df(spark, 8, 10), path)
    assert sorted(r["id"] for r in S.read_snapshot(spark, path).collect()) == list(range(10))


def test_crash_orphans_invisible_and_vacuumed(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    S.snapshot_append(_df(spark, 0, 4), path)
    # simulate a crashed writer: data landed, the manifest never committed
    _df(spark, 90, 95).write.parquet(f"{path}/data/orphandir")
    assert S.read_snapshot(spark, path).count() == 4  # orphan invisible
    got = S.vacuum(spark, path, keep_last=1, min_age_seconds=0)
    assert got["dirs_deleted"] == 1  # the orphan
    assert S.read_snapshot(spark, path).count() == 4  # table intact


def test_vacuum_drops_old_versions(spark, tmp_path):
    path = str(tmp_path / "tbl3")
    S.snapshot_overwrite(_df(spark, 0, 3), path)
    S.snapshot_overwrite(_df(spark, 3, 9), path)
    S.snapshot_overwrite(_df(spark, 9, 10), path)
    got = S.vacuum(spark, path, keep_last=1, min_age_seconds=0)
    assert got["manifests_deleted"] == 2 and got["dirs_deleted"] == 2
    # current still reads; history collapsed to the kept tail
    assert S.read_snapshot(spark, path).count() == 1
    assert [m["version"] for m in S.snapshot_history(spark, path)] == [3]
    with pytest.raises(FileNotFoundError):
        S.read_snapshot(spark, path, 1)
    with pytest.raises(ValueError):
        S.vacuum(spark, path, keep_last=0)


def test_fresh_path_errors(spark, tmp_path):
    path = str(tmp_path / "none")
    assert S.current_version(spark, path) is None
    with pytest.raises(FileNotFoundError):
        S.read_snapshot(spark, path)
    assert S.snapshot_history(spark, path) == []
    assert S.vacuum(spark, path) == {"manifests_deleted": 0, "dirs_deleted": 0}


def test_schema_recorded_and_plan_is_plain_parquet(spark, tmp_path):
    path = str(tmp_path / "tbl4")
    S.snapshot_append(_df(spark, 0, 50), path)
    m = S.read_manifest(spark, path, 1)
    assert '"id"' in m["schema"] and '"v"' in m["schema"]
    # reads stay plain parquet scans: filter pushdown survives
    plan = (
        S.read_snapshot(spark, path)
        .filter(F.col("id") > 40)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,40)]" in plan


def test_snapshot_merge_upserts(spark, tmp_path):
    path = str(tmp_path / "tbl5")
    S.snapshot_overwrite(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string"), path
    )
    S.snapshot_merge(
        spark.createDataFrame([(2, "B2"), (4, "d")], "k long, v string"), path, ["k"]
    )
    got = {r["k"]: r["v"] for r in S.read_snapshot(spark, path).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 4: "d"}
    # merge on a fresh path degrades to a plain write
    p2 = str(tmp_path / "tbl6")
    S.snapshot_merge(spark.createDataFrame([(1, "x")], "k long, v string"), p2, ["k"])
    assert S.read_snapshot(spark, p2).count() == 1
    # atomic-to-readers: pre-merge version still readable
    assert {r["k"] for r in S.read_snapshot(spark, path, 1).collect()} == {1, 2, 3}


def test_streaming_snapshot_sink_exactly_once(spark, tmp_path):
    """availableNow micro-batches commit epoch-stamped snapshots; a
    replayed epoch id (Spark's at-least-once foreachBatch redelivery) must
    be a no-op — the exactly-once upgrade."""
    src = str(tmp_path / "src")
    spark.range(0, 10).selectExpr("id", "id * 2 AS v").write.parquet(src)
    path = str(tmp_path / "sink_tbl")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema("id long, v long").parquet(src)
    q = S.streaming_snapshot_sink(stream, path, ckpt).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert S.read_snapshot(spark, path).count() == 10
    hist = S.snapshot_history(spark, path)
    assert all(m["op"] == "stream-append" for m in hist)
    epoch = hist[-1]["epoch_id"]
    before = S.current_version(spark, path)
    # replay the SAME (stream, epoch) directly against the commit protocol
    assert S.commit_stream_batch(spark.read.parquet(src), epoch, path, stream_id=ckpt) is None
    assert S.current_version(spark, path) == before  # duplicate skipped
    assert S.read_snapshot(spark, path).count() == 10
    # a NEW epoch of the same stream commits normally
    assert (
        S.commit_stream_batch(
            spark.range(1).selectExpr("id", "id AS v"), epoch + 1, path, stream_id=ckpt
        )
        == before + 1
    )
    assert S.read_snapshot(spark, path).count() == 11
    # a DIFFERENT stream restarting at epoch 0 is NOT a duplicate: epoch
    # ids are only unique per query, so dedup must key on (stream, epoch)
    assert (
        S.commit_stream_batch(
            spark.range(2).selectExpr("id", "id AS v"), 0, path, stream_id="other-ckpt"
        )
        == before + 2
    )
    assert S.read_snapshot(spark, path).count() == 13


def test_snapshot_diff_change_feed(spark, tmp_path):
    path = str(tmp_path / "tbl7")
    S.snapshot_overwrite(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string"), path
    )
    S.snapshot_merge(
        spark.createDataFrame([(2, "B2"), (4, "d")], "k long, v string"), path, ["k"]
    )
    diff = {
        (r["k"], r["v"], r["_change"])
        for r in S.snapshot_diff(spark, path, 1, 2).collect()
    }
    assert diff == {
        (2, "b", "delete"),   # update = delete + insert
        (2, "B2", "insert"),
        (4, "d", "insert"),
    }
    # identity diff is empty
    assert S.snapshot_diff(spark, path, 2, 2).count() == 0


def test_snapshot_read_with_schema_evolution(spark, tmp_path):
    path = str(tmp_path / "tbl8")
    S.snapshot_append(spark.createDataFrame([(1, "a")], "k long, v string"), path)
    S.snapshot_append(
        spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double"), path
    )
    merged = S.read_snapshot(spark, path, merge_schema=True)
    assert set(merged.columns) == {"k", "v", "score"}
    got = {r["k"]: r["score"] for r in merged.collect()}
    assert got[1] is None and got[2] == 9.5


def test_partitioned_merge_bounds_the_rewrite(spark, tmp_path):
    path = str(tmp_path / "ptbl")
    base = spark.createDataFrame(
        [(1, "d1", "a"), (2, "d1", "b"), (3, "d2", "c"), (4, "d2", "d")],
        "k long, day string, v string",
    )
    S.merge_partitioned(base, path, ["k"], "day")
    v_d2_before = S.current_version(spark, f"{path}/day=d2")
    # an update touching only d1
    got = S.merge_partitioned(
        spark.createDataFrame([(2, "d1", "B2"), (9, "d1", "z")], "k long, day string, v string"),
        path, ["k"], "day",
    )
    assert set(got) == {"d1"}
    # untouched partition: version unchanged (no rewrite at all)
    assert S.current_version(spark, f"{path}/day=d2") == v_d2_before
    allrows = {r["k"]: r["v"] for r in S.read_partitioned(spark, path, "day").collect()}
    assert allrows == {1: "a", 2: "B2", 3: "c", 4: "d", 9: "z"}
    # manifest-level partition pruning
    only_d2 = S.read_partitioned(spark, path, "day", values=["d2"])
    assert {r["k"] for r in only_d2.collect()} == {3, 4}
    import pytest

    with pytest.raises(FileNotFoundError):
        S.read_partitioned(spark, path, "day", values=["d9"])
    with pytest.raises(FileNotFoundError):
        S.read_partitioned(spark, str(tmp_path / "nope"), "day")


def test_partitioned_guards(spark, tmp_path):
    path = str(tmp_path / "ptbl2")
    S.merge_partitioned(
        spark.createDataFrame([(1, "d1", "a")], "k long, day string, v string"),
        path, ["k"], "day",
    )
    # NULL partition value: raise, don't silently drop the rows
    with pytest.raises(ValueError, match="NULL"):
        S.merge_partitioned(
            spark.createDataFrame([(2, None, "b")], "k long, day string, v string"),
            path, ["k"], "day",
        )
    # path-unsafe partition value: raise, don't collide 'a/b' with 'a_b'
    with pytest.raises(ValueError, match="path-safe"):
        S.merge_partitioned(
            spark.createDataFrame([(3, "a/b", "c")], "k long, day string, v string"),
            path, ["k"], "day",
        )
    # ANY missing requested partition raises, even when others match
    with pytest.raises(FileNotFoundError, match="d9"):
        S.read_partitioned(spark, path, "day", values=["d1", "d9"])


def test_merge_on_schema_evolved_table(spark, tmp_path):
    """MERGE over a table whose appends added a column must keep the added
    column (merge-schema read) and NULL-fill it for updates that lack it."""
    path = str(tmp_path / "tbl9")
    S.snapshot_append(spark.createDataFrame([(1, "a")], "k long, v string"), path)
    S.snapshot_append(
        spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double"), path
    )
    S.snapshot_merge(spark.createDataFrame([(1, "A2")], "k long, v string"), path, ["k"])
    got = {r["k"]: (r["v"], r["score"]) for r in S.read_snapshot(spark, path).collect()}
    assert got == {1: ("A2", None), 2: ("b", 9.5)}


def test_snapshot_optimize_compacts_and_preserves(spark, tmp_path):
    path = str(tmp_path / "tbl10")
    for lo in range(0, 50, 10):  # 5 small append snapshots -> 5 data dirs
        S.snapshot_append(_df(spark, lo, lo + 10), path)
    assert len(S.read_manifest(spark, path, 5)["dirs"]) == 5
    v = S.snapshot_optimize(spark, path, zorder_cols=["id", "v"], n_files=2)
    m = S.read_manifest(spark, path, v)
    assert m["op"] == "optimize:5" and len(m["dirs"]) == 1
    # contents identical, pre-optimize version still time-travels
    assert sorted(r["id"] for r in S.read_snapshot(spark, path).collect()) == list(range(50))
    assert S.read_snapshot(spark, path, 5).count() == 50
    # fragmented dirs reclaimed once vacuumed
    got = S.vacuum(spark, path, keep_last=1, min_age_seconds=0)
    assert got["dirs_deleted"] == 5
    assert S.read_snapshot(spark, path).count() == 50


def test_read_snapshot_changes_incremental(spark, tmp_path):
    path = str(tmp_path / "tbl11")
    S.snapshot_append(_df(spark, 0, 5), path)        # v1
    S.snapshot_append(_df(spark, 5, 8), path)        # v2
    S.snapshot_append(_df(spark, 8, 12), path)       # v3
    # new rows since v1 = v2+v3 appends only
    got = sorted(r["id"] for r in S.read_snapshot_changes(spark, path, 1).collect())
    assert got == list(range(5, 12))
    # bounded range
    assert sorted(
        r["id"] for r in S.read_snapshot_changes(spark, path, 1, to_version=2).collect()
    ) == list(range(5, 8))
    # since current -> empty frame with the table schema
    empty = S.read_snapshot_changes(spark, path, 3)
    assert empty.count() == 0 and set(empty.columns) == {"id", "v"}
    # an overwrite in the range breaks append shape -> explicit error
    S.snapshot_overwrite(_df(spark, 100, 101), path)  # v4
    with pytest.raises(ValueError, match="append-shaped"):
        S.read_snapshot_changes(spark, path, 2)
    # but ranges entirely before the overwrite still work
    assert S.read_snapshot_changes(spark, path, 2, to_version=3).count() == 4


def test_snapshot_stats(spark, tmp_path):
    path = str(tmp_path / "tbl12")
    S.snapshot_overwrite(_df(spark, 0, 10), path)    # v1 (becomes dead)
    S.snapshot_overwrite(_df(spark, 0, 20), path)    # v2 (live)
    stats = S.snapshot_stats(spark, path)
    assert stats["version"] == 2
    assert stats["live_dirs"] == 1 and stats["other_dirs"] == 1
    assert stats["live_files"] > 0 and stats["live_bytes"] > 0
    assert stats["reclaimable_bytes"] > 0
    S.vacuum(spark, path, keep_last=1, min_age_seconds=0)
    stats2 = S.snapshot_stats(spark, path)
    assert stats2["other_dirs"] == 0 and stats2["reclaimable_bytes"] == 0


def test_stream_dedup_survives_interleaved_commits(spark, tmp_path):
    """Exactly-once state must survive ANY intermediate commit: a batch
    append or an optimize between stream batches must not drop the
    stream_epochs map that replay-dedup reads from the parent manifest."""
    path = str(tmp_path / "tbl13")
    df = spark.range(3).selectExpr("id", "id AS v")
    assert S.commit_stream_batch(df, 0, path, stream_id="q1") == 1
    S.snapshot_append(df, path)                      # interleaved batch write
    S.snapshot_optimize(spark, path, n_files=1)      # and an optimize
    # replaying epoch 0 after both must STILL be a no-op
    before = S.current_version(spark, path)
    assert S.commit_stream_batch(df, 0, path, stream_id="q1") is None
    assert S.current_version(spark, path) == before
    # and the next epoch commits
    assert S.commit_stream_batch(df, 1, path, stream_id="q1") == before + 1


def test_changes_read_merges_evolved_schema(spark, tmp_path):
    path = str(tmp_path / "tbl14")
    S.snapshot_append(spark.createDataFrame([(1, "a")], "k long, v string"), path)
    S.snapshot_append(
        spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double"), path
    )
    ch = S.read_snapshot_changes(spark, path, 0)
    assert set(ch.columns) == {"k", "v", "score"}
    got = {r["k"]: r["score"] for r in ch.collect()}
    assert got == {1: None, 2: 9.5}


def test_concurrent_merges_both_land(spark, tmp_path, monkeypatch):
    """Two interleaved merges: writer B lands while writer A is mid-write
    (after A computed its merge from v1, before A commits). A's pinned-
    parent commit must CONFLICT — not silently clobber B — and with
    retries=2 A re-derives from B's version and lands on top, so the final
    table carries BOTH upserts."""
    path = str(tmp_path / "tblc")
    S.snapshot_overwrite(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string"),
        path,
    )
    upd_a = spark.createDataFrame([(2, "A2"), (5, "a5")], "k long, v string")
    upd_b = spark.createDataFrame([(3, "B3"), (6, "b6")], "k long, v string")

    # r14: the default merge path writes rewrite+feed through the fused
    # single-scan writer, so the race is injected there (same window:
    # after A computed its merge from v1, before A commits).
    orig_fused = S._write_rewrite_with_changes
    state = {"interleaved": False}

    def racing_fused(sp, p, base, key_rows, keys, inserts, rewrite):
        # Writer B sneaks a full merge in during A's data write — the
        # classic read-compute-commit race window.
        if not state["interleaved"]:
            state["interleaved"] = True
            S.snapshot_merge(upd_b, p, ["k"])
        return orig_fused(sp, p, base, key_rows, keys, inserts, rewrite)

    monkeypatch.setattr(S, "_write_rewrite_with_changes", racing_fused)
    v = S.snapshot_merge(upd_a, path, ["k"], retries=2)
    assert v == 3  # v1 base, v2 = B, v3 = A's retried commit
    got = {r["k"]: r["v"] for r in S.read_snapshot(spark, path).collect()}
    assert got == {1: "a", 2: "A2", 3: "B3", 5: "a5", 6: "b6"}


def test_concurrent_merge_without_retries_raises(spark, tmp_path, monkeypatch):
    """retries=0 (default): the conflicted writer gets a loud IOError —
    never a silent lost update."""
    import pytest as _pytest

    path = str(tmp_path / "tblc0")
    S.snapshot_overwrite(
        spark.createDataFrame([(1, "a")], "k long, v string"), path
    )
    orig_fused = S._write_rewrite_with_changes
    state = {"interleaved": False}

    def racing_fused(sp, p, base, key_rows, keys, inserts, rewrite):
        if not state["interleaved"]:
            state["interleaved"] = True
            S.snapshot_merge(
                spark.createDataFrame([(9, "z")], "k long, v string"), p, ["k"]
            )
        return orig_fused(sp, p, base, key_rows, keys, inserts, rewrite)

    monkeypatch.setattr(S, "_write_rewrite_with_changes", racing_fused)
    with _pytest.raises(IOError, match="conflict"):
        S.snapshot_merge(
            spark.createDataFrame([(1, "A1")], "k long, v string"), path, ["k"]
        )
    # B's merge survives untouched — nothing was clobbered
    got = {r["k"]: r["v"] for r in S.read_snapshot(spark, path).collect()}
    assert got == {1: "a", 9: "z"}


def test_snapshot_diff_releases_version_pins(spark, tmp_path):
    """ADVICE round 3: snapshot_diff must not leave the two version reads
    persisted after the call. Eager mode materializes the (small) diff and
    releases both version pins; lazy mode pins nothing."""
    path = str(tmp_path / "tbl_diff_pins")
    S.snapshot_overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), path
    )
    S.snapshot_merge(
        spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"), path, ["k"]
    )
    def n_cached(sc):
        return sc._jsc.sc().getPersistentRDDs().size()

    sc = spark.sparkContext
    before = n_cached(sc)
    diff = S.snapshot_diff(spark, path, 1, 2)
    got = {(r["k"], r["v"], r["_change"]) for r in diff.collect()}
    assert got == {
        (2, "B", "insert"), (3, "c", "insert"), (2, "b", "delete"),
    }
    # only the returned diff frame may still hold a cache entry
    after = n_cached(sc)
    assert after <= before + 1
    diff.unpersist()
    lazy = S.snapshot_diff(spark, path, 1, 2, eager=False)
    assert lazy.count() == 3
    assert n_cached(sc) <= before


def test_timestamp_time_travel(spark, tmp_path):
    """as_of_timestamp resolves the latest version committed at or before
    the instant (Delta-style); before-first-commit raises, mixing version
    and timestamp raises, and vacuumed manifests are skipped."""
    import time

    path = str(tmp_path / "ts_tbl")
    t0 = time.time()
    S.snapshot_append(_df(spark, 0, 5), path)       # v1
    t1 = time.time()
    time.sleep(0.05)
    S.snapshot_overwrite(_df(spark, 100, 103), path)  # v2
    t2 = time.time()

    assert S.version_at_timestamp(spark, path, t1) == 1
    assert S.version_at_timestamp(spark, path, t2) == 2
    assert S.read_snapshot(spark, path, as_of_timestamp=t1).count() == 5
    assert S.read_snapshot(spark, path, as_of_timestamp=t2).count() == 3
    with pytest.raises(FileNotFoundError):
        S.version_at_timestamp(spark, path, t0 - 10)
    with pytest.raises(ValueError):
        S.read_snapshot(spark, path, version=1, as_of_timestamp=t2)
    # vacuum away v1's manifest: the timestamp that used to resolve to v1
    # now has no surviving manifest at-or-before it → loud, not silent v2
    S.vacuum(spark, path, keep_last=1, min_age_seconds=0)
    with pytest.raises(FileNotFoundError):
        S.version_at_timestamp(spark, path, t1)
    assert S.version_at_timestamp(spark, path, t2) == 2


def test_snapshot_commits_on_connect_local(spark, tmp_path, monkeypatch):
    """VERDICT r7 #6: the full snapshot lifecycle — append, overwrite,
    time travel, rollback, MERGE, stream-batch exactly-once, partitioned
    merge/read — works on a Connect-like session (spark._jvm absent) over
    a LOCAL warehouse: every metadata op routes through fsutil's Python-IO
    fallbacks, including the atomic no-overwrite commit rename. A classic
    session then reads the same table unchanged (mixed-session store)."""
    path = str(tmp_path / "cx_tbl")

    # Patch fsutil's JVM gate (nulling spark._jvm itself trips PySpark's
    # internal call-origin assert): every fsutil call takes the Connect
    # fallback while data IO (parquet read/write — server-side under real
    # Connect) keeps working.
    from pwhl_data_engineering_pipeline_spark import fsutil as _fsu

    monkeypatch.setattr(_fsu, "_has_jvm", lambda s: False)

    v1 = S.snapshot_append(_df(spark, 0, 5), path)
    v2 = S.snapshot_append(_df(spark, 5, 8), path)
    v3 = S.snapshot_overwrite(_df(spark, 100, 102), path)
    assert (v1, v2, v3) == (1, 2, 3)
    assert S.current_version(spark, path) == 3
    assert S.read_snapshot(spark, path, 2).count() == 8
    v4 = S.snapshot_rollback(spark, path, 2)
    assert v4 == 4 and S.read_snapshot(spark, path).count() == 8

    # MERGE (upsert) — pins its parent via the fallback rename
    upd = spark.createDataFrame([(0, 999), (50, 500)], "id long, v long")
    S.snapshot_merge(upd, path, keys=["id"])
    got = {r["id"]: r["v"] for r in S.read_snapshot(spark, path).collect()}
    assert got[0] == 999 and got[50] == 500 and len(got) == 9

    # commit conflict is still explicit on the fallback rename: a writer
    # whose parent went stale (its target version already committed)
    # must raise, not clobber the interloper's manifest
    cur = S.current_version(spark, path)
    with pytest.raises(IOError, match="conflict"):
        S._commit(spark, path, [], "append", cur - 1, "{}")
    assert S.current_version(spark, path) == cur  # nothing clobbered

    # streaming epoch dedup: replayed epoch is a no-op on Connect too
    b = spark.createDataFrame([(1, "a")], "k long, s string")
    assert S.commit_stream_batch(b, 7, path + "_st", "sid") is not None
    assert S.commit_stream_batch(b, 7, path + "_st", "sid") is None

    # partitioned store: per-partition merge + pruned read via list_names
    pu = spark.createDataFrame(
        [(1, "d1", 10), (2, "d2", 20)], "id long, day string, v long"
    )
    S.merge_partitioned(pu, path + "_part", keys=["id"], part_col="day")
    assert S.read_partitioned(spark, path + "_part", "day", ["d1"]).count() == 1

    # maintenance ops on Connect-local too (r8): optimize commits a
    # compacted rewrite; stats walks files via the fallback; vacuum
    # age-gates on os.scandir mtimes and reclaims history + the conflict
    # attempt's orphan data dir
    v6 = S.snapshot_optimize(spark, path, n_files=2)
    assert v6 == 6 and S.read_snapshot(spark, path).count() == 9
    stats = S.snapshot_stats(spark, path)
    assert stats["version"] == 6 and stats["live_files"] > 0
    assert stats["other_dirs"] > 0
    vac = S.vacuum(spark, path, keep_last=1, min_age_seconds=0.0)
    assert vac["manifests_deleted"] > 0 and vac["dirs_deleted"] > 0
    stats2 = S.snapshot_stats(spark, path)
    assert stats2["other_dirs"] == 0 and stats2["reclaimable_bytes"] == 0
    got_after = {r["id"]: r["v"] for r in S.read_snapshot(spark, path).collect()}
    assert got_after == got  # maintenance preserved the table

    # classic session sees the identical table state
    monkeypatch.setattr(_fsu, "_has_jvm", lambda s: True)
    assert S.current_version(spark, path) == 6
    got2 = {r["id"]: r["v"] for r in S.read_snapshot(spark, path).collect()}
    assert got2 == got
    # and a classic commit on top of fallback-written history works
    S.snapshot_append(_df(spark, 200, 201), path)
    assert S.current_version(spark, path) == 7
