"""The maintenance tick (r13): one read-only plan over the index estate
— sync-lag, batch creep, deletion debt — with the sync-before-compact
ordering rule (a pending sync range suppresses compaction, which would
erase the resume's completion marker), and a runner that executes the
plan or refuses loudly on missing prerequisites."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import (
    dedup, maintenance, search, sync,
)
from pwhl_data_engineering_pipeline_spark.operators.search import _read_scalars
from pwhl_data_engineering_pipeline_spark.sources import snapshots as snap


def _docs(spark, ids, key=""):
    import hashlib

    def body(i):
        return " ".join(
            hashlib.md5(f"{key}-{i}-{j}".encode()).hexdigest() for j in range(8)
        )

    return spark.createDataFrame(
        [(int(i), body(i)) for i in ids], "doc_id long, text string"
    )


def test_plan_flags_lag_debt_and_runs_to_clean(spark, tmp_path):
    table = str(tmp_path / "t")
    bidx = str(tmp_path / "bm25")
    midx = str(tmp_path / "mh")
    snap.snapshot_overwrite(_docs(spark, range(40)), table)
    search.bm25_index_write(snap.read_snapshot(spark, table), bidx, n_buckets=8)
    dedup.minhash_index_write(
        snap.read_snapshot(spark, table), midx, num_hashes=32, num_bands=8
    )
    sync.sync_register(spark, bidx, table)
    sync.sync_register(spark, midx, table)

    # a clean, current estate plans NOTHING
    assert maintenance.maintenance_plan(
        spark, {"bm25": bidx, "minhash": midx}, table_path=table
    ) == []

    # table moves ahead; minhash also accrues deletion debt over the frac
    snap.snapshot_append(_docs(spark, range(100, 110)), table)
    dedup.minhash_index_delete(
        spark, midx, _docs(spark, range(15)).select("doc_id"), batch_id="gdpr"
    )
    plan = maintenance.maintenance_plan(
        spark, {"bm25": bidx, "minhash": midx}, table_path=table
    )
    actions = {(a["kind"], a["action"]) for a in plan}
    assert ("bm25", "sync") in actions
    assert ("minhash", "sync") in actions
    assert ("minhash", "compact") in actions  # 15/40 > 0.25 tombstone_frac
    # syncs ordered before compacts
    kinds = [a["action"] for a in plan]
    assert kinds.index("sync") < kinds.index("compact")

    # run without the minhash out_path: syncs done, compact skipped LOUDLY
    out = maintenance.maintenance_run(spark, plan, table_path=table)
    assert {(a["kind"], a["action"]) for a in out["done"]} == {
        ("bm25", "sync"), ("minhash", "sync")
    }
    assert out["skipped"] and out["skipped"][0]["missing"] == ["minhash_out"]

    # with the out_path the estate runs to clean
    plan2 = maintenance.maintenance_plan(
        spark, {"bm25": bidx, "minhash": midx}, table_path=table
    )
    assert {(a["kind"], a["action"]) for a in plan2} == {("minhash", "compact")}
    mh_out = str(tmp_path / "mh_purged")
    out2 = maintenance.maintenance_run(
        spark, plan2, table_path=table, minhash_out=mh_out
    )
    assert not out2["skipped"]
    assert _read_scalars(spark, mh_out)["tombstones"] == []
    # note: the purged copy lives at mh_out — the orchestration swaps
    # paths; the next plan over the NEW path is empty
    sync.sync_register(spark, mh_out, table)
    assert maintenance.maintenance_plan(
        spark, {"bm25": bidx, "minhash": mh_out}, table_path=table
    ) == []


def test_pending_sync_suppresses_compaction(spark, tmp_path, monkeypatch):
    """The ordering rule under test: an index mid-sync (crashed before
    stamp finalize) must plan resume_sync and NO compaction, even when
    its deletion debt is over the threshold."""
    table = str(tmp_path / "t2")
    bidx = str(tmp_path / "bm25p")
    snap.snapshot_overwrite(_docs(spark, range(20), key="p"), table)
    search.bm25_index_write(snap.read_snapshot(spark, table), bidx, n_buckets=8)
    sync.sync_register(spark, bidx, table)
    # deletion debt over the frac threshold (10/20), then a crashed sync
    search.bm25_delete(
        spark, bidx, _docs(spark, range(10), key="p").select("doc_id"),
        batch_id="d1",
    )
    snap.snapshot_append(_docs(spark, range(100, 103), key="p"), table)

    real = sync._write_state

    def crash_on_finalize(spark_, path_, stamp_):
        if "pending" not in stamp_:
            raise RuntimeError("crash before finalize")
        return real(spark_, path_, stamp_)

    monkeypatch.setattr(sync, "_write_state", crash_on_finalize)
    with pytest.raises(RuntimeError):
        sync.sync_bm25(spark, table, bidx)
    monkeypatch.setattr(sync, "_write_state", real)

    plan = maintenance.maintenance_plan(spark, {"bm25": bidx}, table_path=table)
    assert [a["action"] for a in plan] == ["resume_sync"]

    out = maintenance.maintenance_run(spark, plan, table_path=table)
    assert out["done"][0]["result"]["path"] in ("resumed_complete", "applied")
    # resumed: NOW the deletion debt is plannable again
    plan2 = maintenance.maintenance_plan(spark, {"bm25": bidx}, table_path=table)
    assert [(a["kind"], a["action"]) for a in plan2] == [("bm25", "compact")]
    out2 = maintenance.maintenance_run(spark, plan2, table_path=table)
    assert not out2["skipped"]
    assert not _read_scalars(spark, bidx).get("tombstones")


def test_untracked_index_still_gets_compaction_probes(spark, tmp_path):
    """An index that is not table-tracked (no sync stamp) still gets its
    deletion-debt probe — sync is optional, maintenance is not."""
    bidx = str(tmp_path / "bm25u")
    docs = _docs(spark, range(20), key="u")
    search.bm25_index_write(docs, bidx, n_buckets=8)
    search.bm25_delete(
        spark, bidx, docs.filter(F.col("doc_id") < 10).select("doc_id"),
        batch_id="d1",
    )
    plan = maintenance.maintenance_plan(spark, {"bm25": bidx})
    assert [(a["kind"], a["action"]) for a in plan] == [("bm25", "compact")]
    with pytest.raises(ValueError, match="unknown maintenance"):
        maintenance.maintenance_plan(spark, {"hnsw": bidx})


def test_views_join_the_tick(spark, tmp_path):
    """IVM views are estate members too: a view behind its source plans
    a refresh (idempotent, no pending state), ordered with the syncs."""
    from pwhl_data_engineering_pipeline_spark.operators import ivm

    table = str(tmp_path / "t3")
    view = str(tmp_path / "v3")
    snap.snapshot_overwrite(
        spark.createDataFrame([("a", 1), ("b", 2)], "grp string, x long"),
        table,
    )
    ivm.agg_view_create(spark, table, view, ["grp"], [("n", "count", None)])
    assert maintenance.maintenance_plan(spark, {"view": view}) == []
    snap.snapshot_append(
        spark.createDataFrame([("a", 3)], "grp string, x long"), table
    )
    plan = maintenance.maintenance_plan(spark, {"view": view})
    assert [(a["kind"], a["action"]) for a in plan] == [("view", "refresh")]
    out = maintenance.maintenance_run(spark, plan)
    assert out["done"][0]["result"]["path"] == "append"
    assert maintenance.maintenance_plan(spark, {"view": view}) == []
    assert ivm.agg_view_verify(spark, view)["equal"]


def test_view_vacuum_joins_the_tick(spark, tmp_path):
    """Refreshed views hoard superseded versions; the tick plans a vacuum
    past the retention threshold (counting RETAINED manifests — version
    numbers survive vacuum) and the runner reclaims them."""
    from pwhl_data_engineering_pipeline_spark.operators import ivm

    table = str(tmp_path / "t4")
    view = str(tmp_path / "v4")
    snap.snapshot_overwrite(
        spark.createDataFrame([("a", 1)], "grp string, x long"), table
    )
    ivm.agg_view_create(spark, table, view, ["grp"], [("n", "count", None)])
    for i in range(3):
        snap.snapshot_append(
            spark.createDataFrame([("a", 10 + i)], "grp string, x long"), table
        )
        ivm.agg_view_refresh(spark, view)
    assert ivm.agg_view_retained_versions(spark, view) == 4
    plan = maintenance.maintenance_plan(
        spark, {"view": view}, view_vacuum_after=3
    )
    assert [(a["kind"], a["action"]) for a in plan] == [("view", "vacuum")]
    out = maintenance.maintenance_run(spark, plan, reclaim_min_age_seconds=0)
    assert out["done"][0]["result"]["manifests_deleted"] > 0
    assert ivm.agg_view_retained_versions(spark, view) < 4
    assert ivm.agg_view_verify(spark, view)["equal"]  # current state intact
    assert maintenance.maintenance_plan(
        spark, {"view": view}, view_vacuum_after=3
    ) == []


def test_tables_join_the_tick_with_consumer_aware_vacuum(spark, tmp_path):
    """Snapshot tables are estate citizens too (r13): dir-count creep
    triggers optimize (whose empty CDF keeps consumers incremental),
    manifest hoarding triggers vacuum — with a keep_last floor that
    protects the laggiest consumer's stamped version (here a view still
    stamped on v1)."""
    from pwhl_data_engineering_pipeline_spark.operators import ivm

    table = str(tmp_path / "t")
    view = str(tmp_path / "v")
    snap.snapshot_overwrite(
        spark.createDataFrame(
            [(i, "g", i) for i in range(20)], "id long, grp string, x long"
        ),
        table,
    )
    ivm.agg_view_create(spark, table, view, ["grp"],
                        [("total", "sum", "x")])  # stamped at v1
    for k in range(3):
        snap.snapshot_append(
            spark.createDataFrame(
                [(100 + 10 * k + j, "g", j) for j in range(5)],
                "id long, grp string, x long",
            ),
            table,
        )
    # cur = 4; view floor = 1 → vacuum must keep v1..v4 (+1 for the
    # optimize landing first)
    plan = maintenance.maintenance_plan(
        spark, {"table": table, "view": view},
        table_optimize_after_dirs=3, table_vacuum_after=4,
    )
    acts = [(a["kind"], a["action"]) for a in plan]
    # the view is behind too (3 appends since its stamp)
    assert ("view", "refresh") in acts
    ti = [a for a in plan if a["kind"] == "table"]
    assert [a["action"] for a in ti] == ["optimize", "vacuum"]
    assert ti[1]["reason"]["consumer_floor"] == 1
    assert ti[1]["reason"]["keep_last"] == 5  # (4 - 1 + 1) + 1 optimize
    out = maintenance.maintenance_run(
        spark, plan, reclaim_min_age_seconds=0.0
    )
    assert not out["skipped"]
    cur = snap.current_version(spark, table)
    assert cur == 5  # optimize landed
    assert len(snap.read_manifest(spark, table, cur)["dirs"]) == 1
    # the view's stamped manifest survived the vacuum…
    snap.read_manifest(spark, table, 1)
    # …and the view (refreshed by the tick before the rewrite) verifies
    assert ivm.agg_view_verify(spark, view)["equal"]
    # clean estate: next tick proposes nothing for the table
    plan2 = maintenance.maintenance_plan(
        spark, {"table": table, "view": view},
        table_optimize_after_dirs=3, table_vacuum_after=99,
    )
    assert not [a for a in plan2 if a["kind"] == "table"]
