"""Index sync from the snapshot changelog (r13): every persisted index
follows its table exactly once — inserts append, deletes tombstone,
updates delete→purge→append (the order the re-append-while-tombstoned
contract forces) — with crash-resume via the pending-range stamp and
the append-commit completion marker."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import (
    dedup, pq, search, similarity, sync,
)
from pwhl_data_engineering_pipeline_spark.operators.search import _read_scalars
from pwhl_data_engineering_pipeline_spark.sources import snapshots as snap


def _docs(spark, ids, key=""):
    import hashlib

    def body(i):
        return " ".join(
            hashlib.md5(f"{key}-{i}-{j}".encode()).hexdigest() for j in range(10)
        )

    return spark.createDataFrame(
        [(int(i), body(i)) for i in ids], "doc_id long, text string"
    )


def _evolve_doc_table(spark, path):
    """v1: ids 0..29; v2: +100..109; v3: update text of 0..4; v4: delete
    10..14. Returns the expected current rows' id->text map."""
    snap.snapshot_overwrite(_docs(spark, range(30)), path)
    snap.snapshot_append(_docs(spark, range(100, 110)), path)
    snap.snapshot_merge(_docs(spark, range(5), key="v3"), path, ["doc_id"])
    snap.snapshot_delete(
        spark.createDataFrame([(i,) for i in range(10, 15)], "doc_id long"),
        path, ["doc_id"],
    )


def test_sync_bm25_follows_table_exactly(spark, tmp_path):
    table = str(tmp_path / "t")
    idx = str(tmp_path / "bm25")
    snap.snapshot_overwrite(_docs(spark, range(30)), table)
    search.bm25_index_write(
        snap.read_snapshot(spark, table), idx, n_buckets=8
    )
    sync.sync_register(spark, idx, table)
    # registration is idempotent at the same version, refuses a move
    assert sync.sync_register(spark, idx, table)["registered"] is False

    snap.snapshot_append(_docs(spark, range(100, 110)), table)
    snap.snapshot_merge(_docs(spark, range(5), key="v3"), table, ["doc_id"])
    snap.snapshot_delete(
        spark.createDataFrame([(i,) for i in range(10, 15)], "doc_id long"),
        table, ["doc_id"],
    )
    assert sync.sync_status(spark, idx)["behind"] == 3

    out = sync.sync_bm25(spark, table, idx, reclaim_min_age_seconds=0)
    assert out["path"] == "applied"
    assert (out["inserted"], out["deleted"], out["updated"]) == (10, 5, 5)
    assert out["purged"] is True  # updates forced the physical purge
    assert sync.sync_status(spark, idx)["behind"] == 0

    # the synced index probes IDENTICALLY to one-shot BM25 over the
    # table's current rows — stats included (the purge recomputed the
    # survivors'; the append added the additive rest)
    live = snap.read_snapshot(spark, table)
    qdf = spark.createDataFrame(
        [
            ("q1", live.filter("doc_id = 0").collect()[0]["text"][:40]),
            ("q2", live.filter("doc_id = 105").collect()[0]["text"][:40]),
            ("q3", live.filter("doc_id = 20").collect()[0]["text"][:40]),
        ],
        "query_id string, query_text string",
    )
    cols = ("query_id", "doc_id", "score", "rank")
    got = sorted(
        map(tuple, search.bm25_search_index(spark, idx, qdf, k=10)
            .select(*cols).collect())
    )
    want = sorted(
        map(tuple, search.bm25_topk(live, qdf, k=10).select(*cols).collect())
    )
    assert got == want
    meta = _read_scalars(spark, idx)
    assert meta["n_docs"] == live.count() and not meta.get("tombstones")

    # idempotent: nothing to do, stamp stays
    assert sync.sync_bm25(spark, table, idx)["path"] == "noop"


def test_sync_minhash_admission_semantics(spark, tmp_path):
    table = str(tmp_path / "t2")
    idx = str(tmp_path / "mh")
    snap.snapshot_overwrite(_docs(spark, range(30)), table)
    dedup.minhash_index_write(
        snap.read_snapshot(spark, table), idx, num_hashes=32, num_bands=8
    )
    sync.sync_register(spark, idx, table)
    _ = snap.snapshot_append(_docs(spark, range(100, 110)), table)
    snap.snapshot_merge(_docs(spark, range(5), key="v3"), table, ["doc_id"])
    snap.snapshot_delete(
        spark.createDataFrame([(i,) for i in range(10, 15)], "doc_id long"),
        table, ["doc_id"],
    )
    out = sync.sync_minhash(spark, table, idx)
    assert out["path"] == "applied" and out["purged"] is False

    probe = (
        _docs(spark, [0], key="v3")          # copy of UPDATED doc, new text
        .unionByName(_docs(spark, [1]))       # copy of updated doc, OLD text
        .unionByName(_docs(spark, [12]))      # copy of DELETED doc
        .unionByName(_docs(spark, [105]))     # copy of INSERTED doc
        .withColumn("doc_id", F.col("doc_id") + F.lit(5000))
    )
    surv = {
        r["doc_id"]
        for r in dedup.dedup_minhash_incremental(
            spark, probe, idx, num_hashes=32, num_bands=8,
            append_survivors=False,
        ).collect()
    }
    # new-version copy suppressed (appended buckets anchor), old-version
    # copy suppressed (history keeps anchoring — documented), inserted
    # copy suppressed; only the DELETED doc's copy is admitted
    assert surv == {5012}


def _emb_rows(spark, ids, seed=3, d=8):
    rng = np.random.RandomState(seed)
    vecs = {int(i): [float(x) for x in rng.randn(d)] for i in sorted(ids)}
    return spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )


def test_sync_vector_indexes_ivf_exact_pq_coverage(spark, tmp_path):
    table = str(tmp_path / "t3")
    vidx = str(tmp_path / "ivf")
    pidx = str(tmp_path / "pq")
    base = _emb_rows(spark, range(40), seed=3)
    snap.snapshot_overwrite(base, table)
    cent, assigned = similarity.ivf_index(base, n_centroids=5)
    similarity.ivf_write(assigned, vidx, cent)
    books = pq.pq_train_residual(base, assigned, cent, m=4, k=16, iters=4)
    pq.pq_write(
        pq.pq_encode_residual(base, assigned, cent, books), pidx, books, cent,
        vectors=base,
    )
    sync.sync_register(spark, vidx, table)
    sync.sync_register(spark, pidx, table)

    snap.snapshot_append(_emb_rows(spark, range(100, 110), seed=4), table)
    snap.snapshot_merge(_emb_rows(spark, range(5), seed=9), table, ["vec_id"])
    snap.snapshot_delete(
        spark.createDataFrame([(i,) for i in range(10, 15)], "vec_id long"),
        table, ["vec_id"],
    )
    out = sync.sync_indexes(
        spark, table, {"ivf": vidx, "pq": pidx}, vec_id_col="vec_id"
    )
    assert out["ivf"][0]["path"] == "applied" and out["ivf"][0]["purged"]
    assert out["pq"][0]["path"] == "applied" and out["pq"][0]["purged"]

    live = snap.read_snapshot(spark, table)
    q = live.filter(F.col("vec_id").isin(0, 20, 105)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # IVF stores raw embeddings: exhaustive probe over the synced index
    # must equal brute force over the table's current rows, exactly
    got = sorted(map(tuple, similarity.ivf_topk_pruned(
        spark, vidx, None, q, k=5, n_probe=16
    ).collect()))
    want = sorted(map(tuple, similarity.brute_force_topk(live, q, k=5).collect()))
    assert got == want

    # PQ is lossy: assert id coverage — probed candidates are exactly
    # drawn from live ids, updated/inserted ids reachable, deleted gone
    queries = [
        (int(r["query_id"]), [float(x) for x in r["embedding"]])
        for r in q.collect()
    ]
    rows = pq.ivf_adc_topk_pruned(
        spark, pidx, queries, k=40, n_probe=16
    ).collect()
    seen = {r["vec_id"] for r in rows}
    live_ids = {r["vec_id"] for r in live.collect()}
    assert seen <= live_ids
    assert not seen & set(range(10, 15))
    assert seen & set(range(100, 110))
    meta = _read_scalars(spark, pidx)
    assert not meta.get("tombstones")

    again = sync.sync_indexes(spark, table, {"ivf": vidx, "pq": pidx},
                              vec_id_col="vec_id")
    assert again["ivf"][0]["path"] == "noop"
    assert again["pq"][0]["path"] == "noop"


def test_sync_crash_before_finalize_resumes_exactly_once(
    spark, tmp_path, monkeypatch
):
    table = str(tmp_path / "t4")
    idx = str(tmp_path / "bm25c")
    snap.snapshot_overwrite(_docs(spark, range(20), key="c"), table)
    search.bm25_index_write(snap.read_snapshot(spark, table), idx, n_buckets=8)
    sync.sync_register(spark, idx, table)
    snap.snapshot_append(_docs(spark, range(100, 106), key="c"), table)
    snap.snapshot_delete(
        spark.createDataFrame([(3,)], "doc_id long"), table, ["doc_id"]
    )

    real = sync._write_state

    def crash_on_finalize(spark_, path_, stamp_):
        if "pending" not in stamp_:
            raise RuntimeError("crash before stamp finalize")
        return real(spark_, path_, stamp_)

    monkeypatch.setattr(sync, "_write_state", crash_on_finalize)
    with pytest.raises(RuntimeError, match="finalize"):
        sync.sync_bm25(spark, table, idx)
    monkeypatch.setattr(sync, "_write_state", real)

    # the table advances while the sync is down — the resume must apply
    # the PENDING range with its original batch ids first, then chase
    snap.snapshot_append(_docs(spark, range(200, 203), key="c"), table)
    rounds = sync.sync_indexes(spark, table, {"bm25": idx})["bm25"]
    assert rounds[0]["path"] == "resumed_complete"
    assert rounds[1]["path"] == "applied" and rounds[1]["inserted"] == 3

    live = snap.read_snapshot(spark, table)
    meta = _read_scalars(spark, idx)
    # exactly once, no double-apply: n_docs = live + the one tombstoned
    # doc (deletes mask now, stats stay stale until compact — the
    # documented Lucene posture; no update in the range meant no purge)
    assert meta["n_docs"] == live.count() + 1
    assert len(meta.get("tombstones") or []) == 1
    # after the purge the probe is byte-identical to one-shot BM25 over
    # the live rows (the compact theorem, composed with the resume)
    search.bm25_index_compact(spark, idx, reclaim_min_age_seconds=0)
    assert _read_scalars(spark, idx)["n_docs"] == live.count()
    qdf = spark.createDataFrame(
        [("q1", live.filter("doc_id = 201").collect()[0]["text"][:40])],
        "query_id string, query_text string",
    )
    cols = ("query_id", "doc_id", "score", "rank")
    got = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10)
                     .select(*cols).collect()))
    want = sorted(map(tuple, search.bm25_topk(live, qdf, k=10)
                      .select(*cols).collect()))
    assert got == want


def test_sync_crash_mid_apply_rerun_completes(spark, tmp_path, monkeypatch):
    """Crash between the delete and the append: the re-run re-applies the
    same range (delete skips as committed, append lands once)."""
    table = str(tmp_path / "t5")
    idx = str(tmp_path / "bm25m")
    snap.snapshot_overwrite(_docs(spark, range(20), key="m"), table)
    search.bm25_index_write(snap.read_snapshot(spark, table), idx, n_buckets=8)
    sync.sync_register(spark, idx, table)
    snap.snapshot_append(_docs(spark, range(100, 104), key="m"), table)
    snap.snapshot_delete(
        spark.createDataFrame([(7,)], "doc_id long"), table, ["doc_id"]
    )

    real_append = search.bm25_index_append

    def crash_append(*a, **k):
        raise RuntimeError("crash before append")

    monkeypatch.setattr(search, "bm25_index_append", crash_append)
    with pytest.raises(RuntimeError, match="before append"):
        sync.sync_bm25(spark, table, idx)
    monkeypatch.setattr(search, "bm25_index_append", real_append)

    out = sync.sync_bm25(spark, table, idx)
    assert out["path"] == "applied"
    live = snap.read_snapshot(spark, table)
    assert _read_scalars(spark, idx)["n_docs"] == live.count() + 1  # 7 masked, not purged
    # probe-visible docs = live docs exactly (tombstone masks 7)
    qdf = spark.createDataFrame(
        [("q1", live.filter("doc_id = 101").collect()[0]["text"][:40])],
        "query_id string, query_text string",
    )
    got = {r["doc_id"] for r in
           search.bm25_search_index(spark, idx, qdf, k=40).collect()}
    assert 7 not in got


def test_sync_guards(spark, tmp_path):
    table = str(tmp_path / "t6")
    other = str(tmp_path / "t6b")
    idx = str(tmp_path / "bm25g")
    snap.snapshot_overwrite(_docs(spark, range(5), key="g"), table)
    snap.snapshot_overwrite(_docs(spark, range(5), key="g2"), other)
    search.bm25_index_write(snap.read_snapshot(spark, table), idx, n_buckets=4)
    with pytest.raises(FileNotFoundError, match="not sync-registered"):
        sync.sync_bm25(spark, table, idx)
    sync.sync_register(spark, idx, table)
    with pytest.raises(IOError, match="refusing to"):
        sync.sync_register(spark, idx, other)
    with pytest.raises(ValueError, match="tracks"):
        sync.sync_bm25(spark, other, idx)
    with pytest.raises(ValueError, match="unknown sync target"):
        sync.sync_indexes(spark, table, {"hnsw": idx})
    # history rewritten under the index → loud
    snap.snapshot_append(_docs(spark, range(10, 12), key="g"), table)
    snap.snapshot_rollback(spark, table, 1)
    snap.vacuum(spark, table, keep_last=1, min_age_seconds=0)
    with pytest.raises((ValueError, FileNotFoundError)):
        sync.sync_bm25(spark, table, idx)


def test_changed_rows_fetch_is_broadcast_semi_join(spark, tmp_path):
    """Scale pin: the v1 row fetch for a changed-id set must plan a
    BROADCAST left-semi join (the id set is delta-sized; the table scan
    must not shuffle) — the plan shape that keeps sync O(delta) on the
    fetch side."""
    table = str(tmp_path / "t7")
    snap.snapshot_overwrite(_docs(spark, range(200), key="pl"), table)
    ids = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    df = sync._current_rows(spark, table, 1, ids, "doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_sync_follows_streaming_fed_table(spark, tmp_path):
    """Composition seam: the BM25 index follows a table fed by the
    exactly-once streaming snapshot sink. Stream-append commits are
    append-shaped and the sink's ids are fresh, so the sync classifies
    on the fast path (new data dirs only — assume_new_ids skips the
    collision guard); a replayed epoch (deduped by the sink) advances
    nothing and the follow-up sync is a noop."""
    from pwhl_data_engineering_pipeline_spark.sources import snapshots as S

    src = str(tmp_path / "ssrc")
    table = str(tmp_path / "stbl")
    ck = str(tmp_path / "sck")
    idx = str(tmp_path / "sbm25")

    def land(ids, key):
        _docs(spark, ids, key=key).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = S.streaming_snapshot_sink(stream, table, ck).trigger(
            availableNow=True
        ).start()
        q.awaitTermination(120)

    land(range(20), "s1")
    run()
    search.bm25_index_write(S.read_snapshot(spark, table), idx, n_buckets=8)
    sync.sync_register(spark, idx, table)

    land(range(100, 108), "s1")
    run()
    out = sync.sync_bm25(spark, table, idx, assume_new_ids=True)
    assert out["path"] == "applied" and out["inserted"] == 8
    assert out["deleted"] == 0 and out["updated"] == 0

    live = S.read_snapshot(spark, table)
    qdf = spark.createDataFrame(
        [("q1", live.filter("doc_id = 103").collect()[0]["text"][:40])],
        "query_id string, query_text string",
    )
    cols = ("query_id", "doc_id", "score", "rank")
    got = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10)
                     .select(*cols).collect()))
    want = sorted(map(tuple, search.bm25_topk(live, qdf, k=10)
                      .select(*cols).collect()))
    assert got == want

    # replayed epoch: the sink dedups, nothing advances, sync noops
    hist = S.snapshot_history(spark, table)
    epoch = hist[-1]["epoch_id"]
    assert S.commit_stream_batch(
        spark.read.parquet(src), epoch, table, stream_id=ck
    ) is None
    assert sync.sync_bm25(spark, table, idx)["path"] == "noop"


def test_append_shaped_id_collision_refuses(spark, tmp_path):
    """An append that re-lands an existing id leaves TWO rows per key in
    the table (an append cannot remove the old one) — a producer
    contract violation the sync must refuse to propagate into the
    indexes, not 'handle' by indexing both rows."""
    table = str(tmp_path / "t8")
    idx = str(tmp_path / "bm25d")
    snap.snapshot_overwrite(_docs(spark, range(10), key="dup"), table)
    search.bm25_index_write(snap.read_snapshot(spark, table), idx, n_buckets=4)
    sync.sync_register(spark, idx, table)
    # the producer misroutes an update as an APPEND: id 3 re-lands
    snap.snapshot_append(_docs(spark, [3], key="dup-v2"), table)
    with pytest.raises(IOError, match="keyed-contract violation"):
        sync.sync_bm25(spark, table, idx)
    # the pending range stays resumable: after the table is repaired
    # (keyed delete collapses to one row per key via the rewrite), the
    # re-run classifies through the content diff and applies cleanly
    snap.snapshot_merge(_docs(spark, [3], key="dup-v2"), table, ["doc_id"])
    out = sync.sync_bm25(spark, table, idx, reclaim_min_age_seconds=0)
    assert out["path"] == "applied" and out["updated"] == 1
    live = snap.read_snapshot(spark, table)
    assert live.count() == 10
    qdf = spark.createDataFrame(
        [("q1", live.filter("doc_id = 3").collect()[0]["text"][:40])],
        "query_id string, query_text string",
    )
    cols = ("query_id", "doc_id", "score", "rank")
    got = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10)
                     .select(*cols).collect()))
    want = sorted(map(tuple, search.bm25_topk(live, qdf, k=10)
                      .select(*cols).collect()))
    assert got == want


def test_changed_rows_fetch_bounded_by_zone_maps(spark, tmp_path):
    """Zone-map × sync composition: with stats declared on the id
    column and monotone append ids, the changed-row fetch for an
    append range opens only directories that can hold the new ids."""
    table = str(tmp_path / "t")
    mk = lambda lo, n: spark.createDataFrame(
        [(lo + i, f"text {lo + i}") for i in range(n)],
        "doc_id long, text string",
    )
    snap.snapshot_overwrite(mk(0, 30), table)
    # re-declare stats via an append (overwrite accepted it too, but
    # exercise stickiness)
    snap.snapshot_append(mk(100, 30), table, stats_cols=["doc_id"])
    snap.snapshot_append(mk(200, 30), table)
    v1 = snap.current_version(spark, table)
    new_ids = spark.createDataFrame(
        [(200 + i,) for i in range(30)], "doc_id long"
    )
    # the bound [200, 229] must prune the first two directories
    rep = snap.snapshot_prune_report(
        spark, table, {"doc_id": (200, 229)}, v1
    )
    assert rep["total_dirs"] == 3 and rep["kept_dirs"] == 1
    got = sorted(
        r.doc_id
        for r in sync._current_rows(spark, table, v1, new_ids, "doc_id").collect()
    )
    assert got == list(range(200, 230))
