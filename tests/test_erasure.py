"""Cross-index erasure orchestration (r12: operators/erasure.py) — one
erasure request applied to every surface the corpus lives on, resumable
after partial failure under a shared erasure_id."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import (
    dedup,
    erasure,
    pq,
    search,
    similarity,
)
from pwhl_data_engineering_pipeline_spark.sources import snapshots


def _corpus(spark, n=40):
    def body(i):
        return " ".join(
            hashlib.md5(f"er-{i}-{j}".encode()).hexdigest() for j in range(10)
        )

    return spark.createDataFrame(
        [(i, body(i)) for i in range(n)], "doc_id long, text string"
    )


def _embs(spark, n=160, d=8, seed=23):
    rng = np.random.RandomState(seed)
    return spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(d)]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def _build_all(spark, tmp_path, docs, emb):
    paths = {
        "snapshot": str(tmp_path / "snap"),
        "bm25": str(tmp_path / "bm25"),
        "ivf": str(tmp_path / "ivf"),
        "pq": str(tmp_path / "pq"),
        "minhash": str(tmp_path / "mh"),
    }
    snapshots.snapshot_overwrite(docs, paths["snapshot"])
    search.bm25_index_write(docs, paths["bm25"], n_buckets=4)
    cent, assigned = similarity.ivf_index(emb, n_centroids=4)
    similarity.ivf_write(assigned, paths["ivf"], cent)
    books = pq.pq_train_residual(emb, assigned, cent, m=4, k=16, iters=3)
    pq.pq_write(
        pq.pq_encode_residual(emb, assigned, cent, books),
        paths["pq"], books, cent,
    )
    dedup.minhash_index_write(docs, paths["minhash"], num_hashes=32, num_bands=8)
    return paths


def test_erase_everywhere_masks_all_surfaces_and_is_idempotent(
    spark, tmp_path
):
    docs = _corpus(spark)
    emb = _embs(spark)
    paths = _build_all(spark, tmp_path, docs, emb)
    odd_docs = docs.filter(F.col("doc_id") % 2 != 0).select("doc_id")

    out = erasure.erase_everywhere(
        spark, odd_docs, paths, erasure_id="er1"
    )
    assert out["n_ids"] == 20
    assert set(out["results"]) == set(paths)
    assert all(
        not r.get("skipped") for k, r in out["results"].items() if k != "snapshot"
    )
    assert "snapshot:vacuum" in out["purge_pending"]

    # every surface masked
    snap = snapshots.read_snapshot(spark, paths["snapshot"])
    assert snap.filter(F.col("doc_id") % 2 != 0).count() == 0
    qdf = spark.createDataFrame(
        [("q1", docs.first()["text"].split()[0])],
        "query_id string, query_text string",
    )
    got = search.bm25_search_index(spark, paths["bm25"], qdf, k=40).collect()
    assert all(r["doc_id"] % 2 == 0 for r in got)
    vq = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf_ids = {
        r["vec_id"]
        for r in similarity.ivf_topk_pruned(
            spark, paths["ivf"], None, vq, k=5, n_probe=4
        ).collect()
    }
    # the request erased the odd DOC ids (0..39); odd vec_ids ≥ 40 were
    # never requested and stay live (doc and vec ids share a key space
    # by contract — the erasure is id-driven, not parity-driven)
    assert ivf_ids and all(i % 2 == 0 or i >= 40 for i in ivf_ids)
    copy = docs.filter(F.col("doc_id") == 1).withColumn(
        "doc_id", F.lit(1001).cast("long")
    )
    surv = dedup.dedup_minhash_incremental(
        spark, copy, paths["minhash"], num_hashes=32, num_bands=8,
        append_survivors=False,
    )
    assert surv.count() == 1  # erased doc 1 no longer anchors suppression

    # idempotent re-run under the same erasure_id: every index skips
    out2 = erasure.erase_everywhere(spark, odd_docs, paths, erasure_id="er1")
    assert all(
        r.get("skipped") for k, r in out2["results"].items() if k != "snapshot"
    )
    # snapshot delete is a no-op rewrite (still only evens)
    assert snapshots.read_snapshot(spark, paths["snapshot"]).count() == 20

    # a reused erasure_id with a DIFFERENT id set refuses (ADVICE r11
    # propagated through the orchestration)
    with pytest.raises(erasure.EraseSweepError, match="DIFFERENT id set"):
        erasure.erase_everywhere(
            spark, docs.filter(F.col("doc_id") == 2).select("doc_id"),
            paths, erasure_id="er1",
        )


def test_erase_everywhere_resumes_after_partial_failure(
    spark, tmp_path, monkeypatch
):
    docs = _corpus(spark, n=30)
    emb = _embs(spark, n=80)
    paths = _build_all(spark, tmp_path, docs, emb)
    ids = docs.filter(F.col("doc_id") < 6).select("doc_id")

    def boom(*a, **k):
        raise IOError("injected bm25 outage")

    monkeypatch.setattr(search, "bm25_delete", boom)
    with pytest.raises(erasure.EraseSweepError, match="failed at target 'bm25'") as ei:
        erasure.erase_everywhere(spark, ids, paths, erasure_id="er2")
    # snapshot + minhash committed before the failure
    assert set(ei.value.results) == {"snapshot", "minhash"}
    monkeypatch.undo()

    # resume with the SAME id: committed targets skip, the rest land
    out = erasure.erase_everywhere(spark, ids, paths, erasure_id="er2")
    assert out["results"]["minhash"]["skipped"] is True
    assert out["results"]["bm25"]["skipped"] is False
    assert out["results"]["ivf"]["skipped"] is False
    assert out["results"]["pq"]["skipped"] is False
    from pwhl_data_engineering_pipeline_spark.operators.search import (
        _read_scalars,
    )

    assert _read_scalars(spark, paths["bm25"])["tombstones"] == ["er2"]


def test_erase_everywhere_guards(spark, tmp_path):
    docs = _corpus(spark, n=10)
    with pytest.raises(ValueError, match="unknown erasure target"):
        erasure.erase_everywhere(
            spark, docs.select("doc_id"), {"elastic": "/nope"}
        )
    with pytest.raises(ValueError, match="batch_id"):
        erasure.erase_everywhere(
            spark, docs.select("doc_id"), {}, erasure_id="bad/id"
        )


def test_snapshot_delete_keyed_and_versioned(spark, tmp_path):
    docs = _corpus(spark, n=20)
    path = str(tmp_path / "snap_del")
    v1 = snapshots.snapshot_overwrite(docs, path)
    v2 = snapshots.snapshot_delete(
        docs.filter(F.col("doc_id") < 5).select("doc_id"), path, ["doc_id"]
    )
    assert v2 == v1 + 1
    assert snapshots.read_snapshot(spark, path).count() == 15
    # time travel still sees the pre-delete rows (the documented vacuum SLA)
    assert snapshots.read_snapshot(spark, path, v1).count() == 20
    # deleting absent keys is a clean no-op rewrite
    v3 = snapshots.snapshot_delete(
        docs.filter(F.col("doc_id") < 5).select("doc_id"), path, ["doc_id"]
    )
    assert v3 == v2 + 1
    assert snapshots.read_snapshot(spark, path).count() == 15
    with pytest.raises(FileNotFoundError):
        snapshots.snapshot_delete(
            docs.select("doc_id"), str(tmp_path / "missing"), ["doc_id"]
        )


def test_purge_everywhere_drops_bytes_and_verifies(spark, tmp_path):
    """The purge half of the SLA: after erase_everywhere +
    purge_everywhere, every manifest is clean, the erased bytes are gone
    from every tree, the snapshot's pre-delete versions are vacuumed,
    and the BM25 probe equals one-shot BM25 over the survivors. A purge
    that CANNOT run (minhash pending without minhash_out) raises with
    the completed purges attached rather than silently skipping an
    erasure obligation."""
    from pwhl_data_engineering_pipeline_spark.operators.search import (
        _read_scalars,
    )

    docs = _corpus(spark, n=30)
    emb = _embs(spark, n=80)
    paths = _build_all(spark, tmp_path, docs, emb)
    erased = docs.filter(F.col("doc_id") % 2 != 0).select("doc_id")
    erasure.erase_everywhere(spark, erased, paths, erasure_id="er3")

    # refusal path first: minhash has pending tombstones and no out path
    # — the precondition scan refuses BEFORE purging anything
    with pytest.raises(erasure.EraseSweepError, match="nothing was purged"):
        erasure.purge_everywhere(spark, paths, vectors=emb)
    from pwhl_data_engineering_pipeline_spark.operators.search import (
        _read_scalars as _rs,
    )

    assert _rs(spark, paths["bm25"])["tombstones"] == ["er3"]  # untouched

    mh_out = str(tmp_path / "mh_purged")
    out = erasure.purge_everywhere(
        spark, paths, vectors=emb, minhash_out=mh_out
    )
    assert out["still_pending"] == []
    for kind in ("bm25", "ivf", "pq"):
        assert not (_read_scalars(spark, paths[kind]).get("tombstones") or [])
    assert _read_scalars(spark, mh_out)["tombstones"] == []
    erased_ids = {r["doc_id"] for r in erased.collect()}
    assert (
        spark.read.parquet(f"{paths['bm25']}/postings")
        .filter(F.col("doc_id").isin(erased_ids))
        .count()
        == 0
    )
    assert spark.read.parquet(mh_out).filter(
        F.col("doc_id").isin(erased_ids)
    ).count() == 0
    # vectors: erased DOC ids purged from committed IVF batches (odd
    # vec_ids >= 30 were never requested and survive)
    meta = _read_scalars(spark, paths["ivf"])
    vis = spark.read.parquet(paths["ivf"]).filter(
        F.col("batch").isin(meta["batches"])
    )
    assert vis.filter(F.col("vec_id").isin(erased_ids)).count() == 0
    assert vis.count() == 80 - len(erased_ids)
    # snapshot: only the post-delete version remains; rows are evens
    from pwhl_data_engineering_pipeline_spark.sources import snapshots as snap

    assert len(snap.snapshot_history(spark, paths["snapshot"])) == 1
    assert snap.read_snapshot(spark, paths["snapshot"]).count() == 15
    # probe-level verification: champion-free BM25 probe == one-shot
    qdf = spark.createDataFrame(
        [("q1", docs.first()["text"].split()[0])],
        "query_id string, query_text string",
    )
    survivors = docs.filter(F.col("doc_id") % 2 == 0)
    got = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, paths["bm25"], qdf, k=30)
            .select("query_id", "doc_id", "score", "rank")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            search.bm25_topk(survivors, qdf, k=30)
            .select("query_id", "doc_id", "score", "rank")
            .collect(),
        )
    )
    assert got == want
    # purge is idempotent AFTER the orchestration-layer path swap (the
    # original minhash path keeps its tombstones until retired — by
    # design, the purged copy lives at minhash_out)
    out2 = erasure.purge_everywhere(
        spark, {**paths, "minhash": mh_out}, vectors=None
    )
    assert out2["results"]["pq"] == {"skipped": True, "reason": "no tombstones"}
    assert out2["results"]["minhash"]["skipped"] is True
