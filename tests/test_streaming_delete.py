"""Deletion × streaming composition (r12, VERDICT r11 #3): interleave
erasure commits with running ingest streams — delete between epochs, a
delete racing an epoch's append commit, and a crash after the tombstone
commit but before the next epoch — and assert exactly-once ingest AND
mask correctness via the existing differential yardsticks.

These tests found a real composition bug on first contact: BM25's
``bm25_index_append._additive_meta`` rebuilt the manifest explicitly and
DROPPED the tombstone list, so the first append after a ``bm25_delete``
silently un-erased every deleted document (probes mask from the
manifest). Fixed in search.py; ``test_bm25_append_after_delete_keeps_mask``
is the regression."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import dedup, search, similarity
from pwhl_data_engineering_pipeline_spark.operators.search import _read_scalars
from pwhl_data_engineering_pipeline_spark.sources.snapshots import read_snapshot


def _soup(key, i):
    return " ".join(
        hashlib.md5(f"{key}-{i}-{j}".encode()).hexdigest() for j in range(10)
    )


def test_bm25_append_after_delete_keeps_mask(spark, tmp_path):
    """Erasure state must survive additive commits: delete, then append a
    new batch — the deleted docs stay masked, the manifest still lists
    the tombstone (plus its count), and the eventual compact purges
    against the UNION corpus correctly."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} spark join") for i in range(30)],
        "doc_id long, text string",
    )
    extra = spark.createDataFrame(
        [(i, f"alpha beta doc{i} spark join") for i in range(100, 110)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bm25_da")
    search.bm25_index_write(docs, idx, n_buckets=4)
    deleted = docs.filter(F.col("doc_id") % 2 != 0).select("doc_id")
    search.bm25_delete(spark, idx, deleted, batch_id="d1")

    out = search.bm25_index_append(extra, idx, batch_id="b1")
    assert out["skipped"] is False
    meta = _read_scalars(spark, idx)
    assert meta["tombstones"] == ["d1"]  # the r12 regression
    assert meta["tombstone_counts"] == {"d1": 15}

    qdf = spark.createDataFrame(
        [("q1", "alpha spark")], "query_id string, query_text string"
    )
    got_ids = {
        r["doc_id"]
        for r in search.bm25_search_index(spark, idx, qdf, k=50).collect()
    }
    assert got_ids and all(d % 2 == 0 or d >= 100 for d in got_ids)

    # compact purges against the union corpus; probe ≡ one-shot over the
    # survivors of (docs ∪ extra)
    search.bm25_index_compact(spark, idx, reclaim_min_age_seconds=0)
    survivors = docs.filter(F.col("doc_id") % 2 == 0).unionByName(extra)
    got = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=50)
            .select("query_id", "doc_id", "score", "rank")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            search.bm25_topk(survivors, qdf, k=50)
            .select("query_id", "doc_id", "score", "rank")
            .collect(),
        )
    )
    assert got == want


def _ivf_probe_diff(spark, index, table, deleted_ids):
    """(masked exhaustive probe, brute force over live snapshot rows)."""
    snap = read_snapshot(spark, table).select("vec_id", "embedding")
    live = snap.filter(~F.col("vec_id").isin(deleted_ids))
    qdf = snap.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n_cells = similarity.ivf_load_centroids(spark, index).count()
    got = similarity.ivf_topk_pruned(spark, index, None, qdf, k=5, n_probe=n_cells)
    want = similarity.brute_force_topk(live, qdf, k=5)
    return (
        sorted(map(tuple, got.select("query_id", "vec_id", "rank").collect())),
        sorted(map(tuple, want.select("query_id", "vec_id", "rank").collect())),
    )


def test_streaming_ivf_delete_interleaved(spark, tmp_path, monkeypatch):
    """Delete between epochs, then a crash AFTER a later epoch's index
    append but BEFORE its checkpoint commit while tombstones pend: the
    replay skips exactly-once, the tombstones survive every commit on
    the way, the masked exhaustive probe equals brute force over the
    live snapshot rows throughout, and the offline recompact purges."""
    from pwhl_data_engineering_pipeline_spark.streaming import ann as sann

    landing = str(tmp_path / "landing")
    index = str(tmp_path / "index")
    table = str(tmp_path / "table")
    ck = str(tmp_path / "ck")
    rng = np.random.RandomState(29)

    def land(id_base, n):
        rows = [(id_base + j, [float(x) for x in rng.randn(8)]) for j in range(n)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("append").parquet(landing)

    def run():
        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(landing)
        q = sann.streaming_ivf_ingest(
            stream, index, table, ck, n_centroids=4, stream_id="sd"
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass
        return q

    land(0, 40)
    assert run().exception() is None

    # ---- delete between epochs
    deleted = [i for i in range(40) if i % 2 != 0]
    out = similarity.ivf_delete(
        spark, index,
        spark.createDataFrame([(i,) for i in deleted], "vec_id long"),
        batch_id="d1",
    )
    assert out["skipped"] is False
    got, want = _ivf_probe_diff(spark, index, table, deleted)
    assert got == want

    # ---- next epoch appends while tombstones pend: both survive
    land(100, 20)
    assert run().exception() is None
    meta = _read_scalars(spark, index)
    assert meta["tombstones"] == ["d1"] and len(meta["batches"]) == 2
    got, want = _ivf_probe_diff(spark, index, table, deleted)
    assert got == want

    # ---- second delete commits, then the NEXT epoch's append crashes
    # after the index commit, before the checkpoint commit (the
    # crash-after-tombstone-commit-before-next-epoch cell)
    deleted2 = deleted + [100, 102, 104]
    similarity.ivf_delete(
        spark, index,
        spark.createDataFrame([(i,) for i in (100, 102, 104)], "vec_id long"),
        batch_id="d2",
    )
    land(200, 20)
    real_append = sann.ivf_append

    def append_then_die(*a, **k):
        real_append(*a, **k)
        raise RuntimeError("injected crash after ivf_append")

    monkeypatch.setattr(sann, "ivf_append", append_then_die)
    assert run().exception() is not None
    monkeypatch.undo()
    meta = _read_scalars(spark, index)
    assert sorted(meta["tombstones"]) == ["d1", "d2"]  # survived the append
    assert len(meta["batches"]) == 3  # landed once despite the crash
    assert run().exception() is None  # replay: exactly-once no-op
    meta = _read_scalars(spark, index)
    assert len(meta["batches"]) == 3
    assert sorted(meta["tombstones"]) == ["d1", "d2"]
    vis = spark.read.parquet(index).filter(F.col("batch").isin(meta["batches"]))
    assert vis.count() == 80  # rows land once; masking is probe-side
    got, want = _ivf_probe_diff(spark, index, table, deleted2)
    assert got == want

    # ---- offline recompact mid-lifecycle: the purge, stream continues
    obs = similarity.ivf_recompact(spark, index, refine_iterations=1)
    assert obs["n_vectors"] == 80 - len(deleted2)
    meta = _read_scalars(spark, index)
    assert not meta.get("tombstones")
    land(300, 10)
    assert run().exception() is None
    got, want = _ivf_probe_diff(spark, index, table, deleted2)
    assert got == want


def test_streaming_ivf_delete_races_epoch_append_commit(
    spark, tmp_path, monkeypatch
):
    """A rival erasure commits BETWEEN the epoch append's manifest read
    and its version commit: the append loses the rename explicitly,
    retries once from the fresh manifest, and BOTH land — the epoch
    batch is committed exactly-once AND the tombstone masks. (The
    version-race seam the verdict predicted; the retry carries the
    fresh manifest's tombstones because _meta_with copies every key.)"""
    from pwhl_data_engineering_pipeline_spark.streaming import ann as sann

    landing = str(tmp_path / "landing")
    index = str(tmp_path / "index")
    table = str(tmp_path / "table")
    ck = str(tmp_path / "ck")
    rng = np.random.RandomState(31)

    def land(id_base, n):
        rows = [(id_base + j, [float(x) for x in rng.randn(8)]) for j in range(n)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("append").parquet(landing)

    def run():
        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(landing)
        q = sann.streaming_ivf_ingest(
            stream, index, table, ck, n_centroids=4, stream_id="sr"
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass
        return q

    land(0, 40)
    assert run().exception() is None

    # epoch 1: a rival delete commits AFTER ivf_append has read the
    # manifest (inject at the assignment step, which runs between the
    # read and the commit) — the append must retry and keep BOTH
    deleted = [1, 3, 5, 7]
    real_assign = similarity.ivf_assign
    state = {"fired": False}

    def assign_with_rival_delete(*a, **k):
        if not state["fired"]:
            state["fired"] = True
            similarity.ivf_delete(
                spark, index,
                spark.createDataFrame([(i,) for i in deleted], "vec_id long"),
                batch_id="race",
            )
        return real_assign(*a, **k)

    monkeypatch.setattr(similarity, "ivf_assign", assign_with_rival_delete)
    land(100, 20)
    assert run().exception() is None
    monkeypatch.undo()
    assert state["fired"]
    meta = _read_scalars(spark, index)
    assert meta["tombstones"] == ["race"]
    assert len(meta["batches"]) == 2  # the raced epoch committed once
    assert meta["batch_counts"]["sr-e1"] == 20
    got, want = _ivf_probe_diff(spark, index, table, deleted)
    assert got == want


def test_streaming_bm25_delete_between_epochs(spark, tmp_path):
    """BM25 streaming sink with an erasure interleaved: delete between
    epochs, the next epoch's append (through the stream) keeps the
    tombstones, probes mask throughout, and the compact purge equals
    one-shot BM25 over the live admitted corpus."""
    from pwhl_data_engineering_pipeline_spark.streaming import search as ssearch

    landing = str(tmp_path / "landing")
    index = str(tmp_path / "index")
    table = str(tmp_path / "table")
    ck = str(tmp_path / "ck")

    def land(id_base, n):
        rows = [
            (id_base + j, f"alpha beta doc{id_base + j} spark join")
            for j in range(n)
        ]
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(landing)

    def run():
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            landing
        )
        q = ssearch.streaming_bm25_ingest(
            stream, index, table, ck, n_buckets=4, stream_id="sb"
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass
        return q

    land(0, 30)
    assert run().exception() is None
    deleted = [i for i in range(30) if i % 3 == 0]
    search.bm25_delete(
        spark, index,
        spark.createDataFrame([(i,) for i in deleted], "doc_id long"),
        batch_id="d1",
    )
    land(100, 10)
    assert run().exception() is None  # epoch append under pending erasure
    meta = _read_scalars(spark, index)
    assert meta["tombstones"] == ["d1"]
    qdf = spark.createDataFrame(
        [("q1", "alpha spark"), ("q2", "beta join")],
        "query_id string, query_text string",
    )
    got_ids = {
        r["doc_id"]
        for r in search.bm25_search_index(spark, index, qdf, k=50).collect()
    }
    assert got_ids and not (got_ids & set(deleted))

    search.bm25_index_compact(spark, index, reclaim_min_age_seconds=0)
    live = read_snapshot(spark, table).filter(~F.col("doc_id").isin(deleted))
    got = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, index, qdf, k=50)
            .select("query_id", "doc_id", "score", "rank")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            search.bm25_topk(live, qdf, k=50)
            .select("query_id", "doc_id", "score", "rank")
            .collect(),
        )
    )
    assert got == want


def test_streaming_neardup_delete_interleaved(spark, tmp_path):
    """MinHash erasure under the streaming near-dup sink: erase an
    admitted document between epochs; the next epoch ADMITS a fresh copy
    of it (the unanchoring semantics) while copies of undeleted docs
    stay suppressed, and the data side stays exactly-once."""
    from pwhl_data_engineering_pipeline_spark.streaming import dedup as sdedup

    landing = str(tmp_path / "landing")
    index = str(tmp_path / "index")
    table = str(tmp_path / "table")
    ck = str(tmp_path / "ck")

    def land(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(landing)

    def run():
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            landing
        )
        q = sdedup.streaming_neardup_ingest(
            stream, index, table, ck, num_hashes=32, num_bands=8,
            stream_id="nd",
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass
        return q

    land([(i, _soup("nd", i)) for i in range(20)])
    assert run().exception() is None
    assert read_snapshot(spark, table).count() == 20

    # erase doc 0 from the index between epochs
    out = dedup.minhash_index_delete(
        spark, index, spark.createDataFrame([(0,)], "doc_id long"),
        batch_id="gdpr",
    )
    assert out["skipped"] is False

    # next epoch: a copy of erased doc 0 (id 1000) and of live doc 1 (1001)
    land([(1000, _soup("nd", 0)), (1001, _soup("nd", 1))])
    assert run().exception() is None
    admitted = {r["doc_id"] for r in read_snapshot(spark, table).collect()}
    assert 1000 in admitted  # unanchored: the erased doc no longer suppresses
    assert 1001 not in admitted  # live doc still anchors suppression
    assert read_snapshot(spark, table).count() == 21

    # replayed rerun: nothing doubles
    assert run().exception() is None
    assert read_snapshot(spark, table).count() == 21

    # the streaming index_compact is the physical purge too (r12 fix:
    # a rewrite to a manifest-less path would RESURRECT erased docs —
    # the bm25_index_append un-erasure hole on the dedup index): the
    # purged copy holds no tombstoned rows, carries a clean committed
    # manifest, and a copy of the erased doc is STILL admitted there
    from pwhl_data_engineering_pipeline_spark.operators.search import (
        _read_scalars,
    )
    from pwhl_data_engineering_pipeline_spark.streaming.dedup import (
        index_compact,
    )

    purged = str(tmp_path / "index_purged")
    stats = index_compact(spark, index, purged)
    assert stats["tombstoned_purged"] > 0
    assert (
        spark.read.parquet(purged).filter(F.col("doc_id") == 0).count() == 0
    )
    assert _read_scalars(spark, purged)["tombstones"] == []
    cross, _ = dedup.minhash_incremental_pairs(
        spark,
        spark.createDataFrame([(2000, _soup("nd", 0))], "doc_id long, text string"),
        purged,
        num_hashes=32,
        num_bands=8,
    )
    anchors = {r["corpus_id"] for r in cross.collect()}
    # the erased doc 0's signature is GONE — but its legitimately
    # RE-ADMITTED copy (1000) now anchors suppression, as it should
    assert anchors == {1000}
