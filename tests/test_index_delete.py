"""Deletion support for the persisted ANN indexes (r11): logical
tombstones now, probe-side id masking, physical purge at recompact —
the right-to-be-forgotten path, with the same crash-consistency
machinery as appends (one-commit visibility, idempotent re-delete,
age-gated repair of crashed/retired tombstone tables)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import pq, similarity
from pwhl_data_engineering_pipeline_spark.operators.search import _read_scalars


def _emb(spark, n=160, seed=3, d=8):
    rng = np.random.RandomState(seed)
    return spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(d)]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def _probe_rows(spark, idx, q, n_probe):
    return sorted(
        map(
            tuple,
            similarity.ivf_topk_pruned(
                spark, idx, None, q, k=5, n_probe=n_probe
            ).collect(),
        )
    )


def test_ivf_delete_masks_probes_and_recompact_purges(spark, tmp_path):
    """(a) deleted ids vanish from probe results immediately (exhaustive
    probe ≡ brute force over survivors); (b) re-delete of a committed
    tombstone id is a no-op; (c) recompact excludes tombstoned rows,
    clears the tombstone list, and the re-routed index probes identical
    to a fresh build over the survivors; (d) repair sweeps the retired
    tombstone table and drops its stamp."""
    emb = _emb(spark)
    evens = emb.filter(F.col("vec_id") % 2 == 0)
    odds = emb.filter(F.col("vec_id") % 2 != 0)
    cent, assigned = similarity.ivf_index(emb, n_centroids=6)
    idx = str(tmp_path / "ivf_del")
    similarity.ivf_write(assigned, idx, cent)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    out = similarity.ivf_delete(spark, idx, odds.select("vec_id"), batch_id="d1")
    assert out["skipped"] is False and out["n_ids"] == odds.count()
    got = _probe_rows(spark, idx, q, 6)
    want = sorted(
        map(tuple, similarity.brute_force_topk(evens, q, k=5).collect())
    )
    assert got == want  # exhaustive probe over live rows ≡ BF over evens

    # (b) idempotent re-delete
    out2 = similarity.ivf_delete(spark, idx, odds.select("vec_id"), batch_id="d1")
    assert out2["skipped"] is True and out2["n_ids"] == 0
    assert _read_scalars(spark, idx)["tombstones"] == ["d1"]

    # (c) recompact = the physical purge
    obs = similarity.ivf_recompact(spark, idx, refine_iterations=1)
    meta = _read_scalars(spark, idx)
    assert "tombstones" not in meta or not meta["tombstones"]
    assert obs["n_vectors"] == evens.count()  # tombstoned rows excluded
    vis = spark.read.parquet(idx).filter(F.col("batch").isin(meta["batches"]))
    assert vis.count() == evens.count()
    assert vis.filter(F.col("vec_id") % 2 != 0).count() == 0  # bytes gone
    fresh_idx = str(tmp_path / "ivf_fresh")
    cent2 = similarity._train_centroids(evens, 6, "embedding", "vec_id", 42, 1)
    similarity.ivf_write(similarity.ivf_assign(evens, cent2), fresh_idx, cent2)
    assert _probe_rows(spark, idx, q, 6) == _probe_rows(spark, fresh_idx, q, 6)

    # (d) repair sweeps the retired tombstone dir and drops the stamp
    assert "d1" in meta["retired"]
    rep = similarity.ivf_index_repair(spark, idx, min_age_seconds=0)
    assert "d1" in rep["tombstones_swept"]
    meta2 = _read_scalars(spark, idx)
    assert "d1" not in (meta2.get("retired") or {})
    from pwhl_data_engineering_pipeline_spark import fsutil

    assert not fsutil.exists(spark, f"{idx}/_tombstones/d1")


def test_ivf_crashed_delete_invisible_and_repair_gates(spark, tmp_path):
    """A tombstone table written but never committed masks NOTHING;
    repair defers it young and reclaims it past the age gate."""
    emb = _emb(spark, seed=5)
    cent, assigned = similarity.ivf_index(emb, n_centroids=4)
    idx = str(tmp_path / "ivf_crashdel")
    similarity.ivf_write(assigned, idx, cent)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = _probe_rows(spark, idx, q, 4)
    # crash: dir lands, manifest never flips
    emb.filter(F.col("vec_id") < 50).select("vec_id").write.parquet(
        f"{idx}/_tombstones/crashed"
    )
    assert _probe_rows(spark, idx, q, 4) == before  # invisible
    rep = similarity.ivf_index_repair(spark, idx)
    assert "crashed" not in rep["tombstones_swept"]  # young: deferred
    rep0 = similarity.ivf_index_repair(spark, idx, min_age_seconds=0)
    assert rep0["tombstones_swept"] == ["crashed"]


def test_ivf_reappend_of_tombstoned_id_stays_masked(spark, tmp_path):
    """The documented contract: a tombstoned id re-appended BEFORE the
    purging recompact is still masked (delete-then-gone until the
    tombstones clear)."""
    emb = _emb(spark, seed=7)
    old = emb.filter(F.col("vec_id") < 140)
    cent, assigned = similarity.ivf_index(old, n_centroids=4)
    idx = str(tmp_path / "ivf_remask")
    similarity.ivf_write(assigned, idx, cent)
    similarity.ivf_delete(
        spark, idx, spark.createDataFrame([(0,)], "vec_id long"), batch_id="dz"
    )
    # re-append vec 0 (plus fresh rows) under a new batch
    similarity.ivf_append(
        emb.filter((F.col("vec_id") == 0) | (F.col("vec_id") >= 140)),
        idx,
        batch_id="re",
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {r["vec_id"] for r in similarity.ivf_topk_pruned(
        spark, idx, None, q, k=5, n_probe=4
    ).collect()}
    assert 0 not in got  # still masked
    # after the purge, a fresh append of the id is live again
    similarity.ivf_recompact(spark, idx, refine_iterations=1)
    similarity.ivf_append(emb.filter(F.col("vec_id") == 0), idx, batch_id="re2")
    got2 = {r["vec_id"] for r in similarity.ivf_topk_pruned(
        spark, idx, None, q, k=5, n_probe=4
    ).collect()}
    assert 0 in got2


def test_pq_delete_masks_and_recompact_guards(spark, tmp_path):
    """PQ twin: (a) masked probe ≡ full-encode index over survivors (the
    deterministic-encoding differential); (b) recompact refuses BOTH a
    wrong-sized corpus and an equal-sized corpus that smuggles
    tombstoned ids back in (the undelete guard); (c) recompact over the
    survivors purges and probes identical to a fresh build."""
    emb = _emb(spark, seed=11, d=16)
    evens = emb.filter(F.col("vec_id") % 2 == 0)
    odds = emb.filter(F.col("vec_id") % 2 != 0)
    cent, assigned = similarity.ivf_index(emb, n_centroids=4)
    books = pq.pq_train_residual(emb, assigned, cent, m=4, k=16, iters=5)
    idx = str(tmp_path / "pq_del")
    pq.pq_write(
        pq.pq_encode_residual(emb, assigned, cent, books), idx, books, cent,
        vectors=emb,
    )
    out = pq.pq_delete(spark, idx, odds.select("vec_id"), batch_id="d1")
    assert out["skipped"] is False

    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in sorted(
            emb.filter(F.col("vec_id") < 3).collect(), key=lambda r: r["vec_id"]
        )
    ]
    mirror = str(tmp_path / "pq_mirror")
    pq.pq_write(
        pq.pq_encode_residual(evens, similarity.ivf_assign(evens, cent), cent, books),
        mirror, books, cent,
    )

    def rows(path):
        return sorted(
            (r["query_id"], r["rank"], r["vec_id"], r["adc_dist"])
            for r in pq.ivf_adc_topk_pruned(
                spark, path, queries, k=5, n_probe=4
            ).collect()
        )

    assert rows(idx) == rows(mirror)

    # (b) guards
    with pytest.raises(RuntimeError, match="LIVE"):
        pq.pq_recompact(spark, idx, emb, iters=2)  # wrong size (includes dead)
    smuggled = evens.limit(evens.count() - 1).unionByName(
        odds.limit(1)
    )  # right size, wrong ids
    with pytest.raises(RuntimeError, match="TOMBSTONED"):
        pq.pq_recompact(spark, idx, smuggled, iters=2)

    # (c) purge + identity with a fresh build over survivors
    obs = pq.pq_recompact(spark, idx, evens, iters=5, refine_iterations=1)
    meta = _read_scalars(spark, idx)
    assert not meta.get("tombstones")
    assert obs["n_vectors"] == evens.count()
    cent2 = similarity._train_centroids(evens, 4, "embedding", "vec_id", 42, 1)
    assigned2 = similarity.ivf_assign(evens, cent2)
    books2 = pq.pq_train_residual(evens, assigned2, cent2, m=4, k=16, iters=5)
    fresh = str(tmp_path / "pq_fresh")
    pq.pq_write(
        pq.pq_encode_residual(evens, assigned2, cent2, books2), fresh, books2, cent2
    )
    assert rows(idx) == rows(fresh)
    rep = pq.pq_index_repair(spark, idx, min_age_seconds=0)
    assert "d1" in rep["tombstones_swept"]


def test_bm25_delete_masks_stale_stats_champion_guard_and_compact_purges(
    spark, tmp_path
):
    """BM25 deletion, the Lucene posture end-to-end: (a) masked probe
    drops the deleted docs while SURVIVORS keep their pre-delete scores
    exactly (stats/scalars stale by design); (b) champion probes refuse
    while deletions are pending; (c) compact purges physically and the
    probe becomes identical to one-shot BM25 over the survivors
    (df/n_docs/avg_len recomputed); (d) repair sweeps the retired
    tombstone table."""
    from pwhl_data_engineering_pipeline_spark.operators import search

    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} " + ("spark join " * (i % 3 + 1))) for i in range(40)],
        "doc_id long, text string",
    )
    survivors = docs.filter(F.col("doc_id") % 2 == 0)
    idx = str(tmp_path / "bm25_del")
    search.bm25_index_write(docs, idx, n_buckets=8)
    search.bm25_champions_write(spark, idx, m=5)
    qdf = spark.createDataFrame(
        [("q1", "alpha spark"), ("q2", "beta join")],
        "query_id string, query_text string",
    )
    before = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in search.bm25_search_index(spark, idx, qdf, k=40).collect()
    }

    out = search.bm25_delete(
        spark, idx, docs.filter(F.col("doc_id") % 2 != 0).select("doc_id"),
        batch_id="d1",
    )
    assert out["skipped"] is False and out["n_ids"] == 20

    # (a) deleted docs gone; survivor scores byte-identical (stale stats)
    masked = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in search.bm25_search_index(spark, idx, qdf, k=40).collect()
    }
    assert all(d % 2 == 0 for _, d in masked)
    assert masked == {k: v for k, v in before.items() if k[1] % 2 == 0}

    # (b) champion probes refuse while deletions pend
    with pytest.raises(RuntimeError, match="pending deletions"):
        search.bm25_search_index(spark, idx, qdf, k=5, champions_m=5)

    # (c) compact = the purge; probe ≡ one-shot BM25 over survivors
    obs = search.bm25_index_compact(spark, idx, reclaim_min_age_seconds=0)
    assert obs["tombstones_in"] == 1
    meta = _read_scalars(spark, idx)
    assert not meta.get("tombstones")
    assert meta["n_docs"] == survivors.count()
    got = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=10)
            .select("query_id", "doc_id", "score", "rank")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            search.bm25_topk(survivors, qdf, k=10)
            .select("query_id", "doc_id", "score", "rank")
            .collect(),
        )
    )
    assert got == want

    # deleted postings physically gone
    assert (
        spark.read.parquet(f"{idx}/postings")
        .filter(F.col("batch").isin(meta["batches"]))
        .filter(F.col("doc_id") % 2 != 0)
        .count()
        == 0
    )

    # (d) the compact's repair pass (reclaim 0) already swept the
    # tombstone dir and dropped its stamp
    from pwhl_data_engineering_pipeline_spark import fsutil

    assert not fsutil.exists(spark, f"{idx}/_tombstones/d1")
    assert "d1" not in (_read_scalars(spark, idx).get("retired") or {})

    # (e) stale (pre-delete) champion sidecar was NOT restamped fresh:
    # probing with it still refuses (batches moved on)
    with pytest.raises(RuntimeError, match="STALE|pending|unstamped|torn|no champion"):
        search.bm25_search_index(spark, idx, qdf, k=5, champions_m=5)
    # a rebuild over the compacted index restores champion probes
    search.bm25_champions_write(spark, idx, m=5)
    champ = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=5, champions_m=5)
            .select("query_id", "doc_id")
            .collect(),
        )
    )
    assert champ  # usable again


def test_delete_reuse_with_different_ids_refuses(spark, tmp_path):
    """ADVICE r11: the idempotent-skip path is only safe when the reused
    batch_id carries the SAME id set — a re-issued delete under a
    committed tombstone_id with DIFFERENT ids must refuse loudly, not
    return skipped:True while silently dropping those deletions (the
    erasure-path silent no-op). Same-ids re-delete still skips cleanly."""
    from pwhl_data_engineering_pipeline_spark.operators import search

    emb = _emb(spark, seed=13)
    cent, assigned = similarity.ivf_index(emb, n_centroids=4)
    idx = str(tmp_path / "ivf_reuse")
    similarity.ivf_write(assigned, idx, cent)
    first = emb.filter(F.col("vec_id") < 10).select("vec_id")
    similarity.ivf_delete(spark, idx, first, batch_id="dz")
    # same ids → clean metadata skip
    again = similarity.ivf_delete(spark, idx, first, batch_id="dz")
    assert again["skipped"] is True
    # different ids under the committed batch_id → loud refusal
    other = emb.filter(
        (F.col("vec_id") >= 10) & (F.col("vec_id") < 20)
    ).select("vec_id")
    with pytest.raises(ValueError, match="DIFFERENT id set"):
        similarity.ivf_delete(spark, idx, other, batch_id="dz")
    # superset/subset asymmetries refuse too (strict set equality)
    with pytest.raises(ValueError, match="DIFFERENT id set"):
        similarity.ivf_delete(
            spark, idx, emb.filter(F.col("vec_id") < 11).select("vec_id"),
            batch_id="dz",
        )

    # BM25 twin (shared helper, doc_id axis)
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i}") for i in range(30)],
        "doc_id long, text string",
    )
    bidx = str(tmp_path / "bm25_reuse")
    search.bm25_index_write(docs, bidx, n_buckets=4)
    d_first = docs.filter(F.col("doc_id") < 5).select("doc_id")
    search.bm25_delete(spark, bidx, d_first, batch_id="dz")
    assert search.bm25_delete(spark, bidx, d_first, batch_id="dz")["skipped"]
    with pytest.raises(ValueError, match="DIFFERENT id set"):
        search.bm25_delete(
            spark, bidx, docs.filter(F.col("doc_id") >= 25).select("doc_id"),
            batch_id="dz",
        )


def test_tombstone_frac_trips_schedulers(spark, tmp_path):
    """r12 (VERDICT r11 #2): the maintenance probes gain a deletion term.
    (a) search.needs_compaction trips when the tombstone mass reaches
    max_tombstone_frac of n_docs — metadata-only via the manifest's
    tombstone_counts; (b) ivf_needs_recompact reports tombstone_frac and
    trips on it even when assign-distance drift is absent; (c) the drift
    sample masks tombstones (ADVICE r11): deleting rows NEVER changes the
    reported assign-dist ratio of the survivors."""
    from pwhl_data_engineering_pipeline_spark.operators import search

    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} spark") for i in range(40)],
        "doc_id long, text string",
    )
    bidx = str(tmp_path / "bm25_frac")
    search.bm25_index_write(docs, bidx, n_buckets=4)
    assert search.needs_compaction(spark, bidx) is False
    search.bm25_delete(
        spark, bidx, docs.filter(F.col("doc_id") < 4).select("doc_id")
    )
    # 4/40 = 10% < 25% default
    assert search.needs_compaction(spark, bidx) is False
    search.bm25_delete(
        spark, bidx,
        docs.filter((F.col("doc_id") >= 4) & (F.col("doc_id") < 12)).select("doc_id"),
    )
    # 12/40 = 30% >= 25%
    assert search.needs_compaction(spark, bidx) is True
    assert search.needs_compaction(spark, bidx, max_tombstone_frac=None) is False
    meta = _read_scalars(spark, bidx)
    assert sum(meta["tombstone_counts"].values()) == 12
    # compact purges; the trigger resets
    search.bm25_index_compact(spark, bidx, reclaim_min_age_seconds=0)
    assert search.needs_compaction(spark, bidx) is False

    emb = _emb(spark, seed=17)
    cent, assigned = similarity.ivf_index(emb, n_centroids=4)
    idx = str(tmp_path / "ivf_frac")
    similarity.ivf_write(assigned, idx, cent)
    probe0 = similarity.ivf_needs_recompact(spark, idx)
    assert probe0["tombstone_frac"] == 0.0 and probe0["recompact"] is False
    similarity.ivf_delete(
        spark, idx, emb.filter(F.col("vec_id") < 48).select("vec_id")
    )
    probe1 = similarity.ivf_needs_recompact(spark, idx)
    # (c) masked drift sample: survivors' geometry did not move, so the
    # ratio must be computed over live rows only — it may shift from the
    # baseline's (full-sample) mix but stays far under the 1.25 drift
    # threshold; the trip below is the tombstone term, not drift
    assert probe1["tombstone_frac"] == pytest.approx(48 / 160)
    assert probe1["recompact"] is True  # 30% >= 25% default
    assert (
        similarity.ivf_needs_recompact(spark, idx, max_tombstone_frac=None)[
            "recompact"
        ]
        is False
    )
    # recompact purges; the term resets
    similarity.ivf_recompact(spark, idx, refine_iterations=1)
    probe2 = similarity.ivf_needs_recompact(spark, idx)
    assert probe2["tombstone_frac"] == 0.0 and probe2["recompact"] is False


# ---- MinHash dedup-index erasure (r12, VERDICT r11 #1) ---------------------


def _docs(spark, ids, key=""):
    # genuinely dissimilar bodies (hash soup): LSH collisions happen ONLY
    # between exact copies, so suppression provenance is unambiguous — a
    # shared-scaffold corpus would let a copy of an erased doc collide
    # with OTHER docs and mask the unanchoring under test
    import hashlib

    def body(i):
        return " ".join(
            hashlib.md5(f"{key}-{i}-{j}".encode()).hexdigest()
            for j in range(12)
        )

    rows = [(i, body(i)) for i in ids]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_delete_unanchors_and_compact_purges(spark, tmp_path):
    """The dedup-index erasure path: (a) a tombstoned document stops
    acting as a suppression anchor IMMEDIATELY — an exact copy of it in
    a later batch is admitted, while copies of surviving docs stay
    suppressed; (b) re-delete is idempotent, reused batch_id with
    different ids refuses; (c) compact(out_path) is the physical purge —
    rows gone, clean manifest, row-identical to a fresh build over the
    survivors; (d) masked probe ≡ purged probe."""
    from pwhl_data_engineering_pipeline_spark.operators import dedup
    from pwhl_data_engineering_pipeline_spark.operators.search import (
        _read_scalars,
    )

    corpus = _docs(spark, range(40))
    idx = str(tmp_path / "mh_idx")
    dedup.minhash_index_write(corpus, idx, num_hashes=32, num_bands=8)
    # batch: exact copies of every corpus doc, re-keyed
    batch = corpus.withColumn("doc_id", F.col("doc_id") + F.lit(1000))

    surv0 = dedup.dedup_minhash_incremental(
        spark, batch, idx, num_hashes=32, num_bands=8, append_survivors=False
    )
    assert surv0.count() == 0  # every copy suppressed by its original

    odds = corpus.filter(F.col("doc_id") % 2 != 0).select("doc_id")
    out = dedup.minhash_index_delete(spark, idx, odds, batch_id="d1")
    assert out["skipped"] is False and out["n_ids"] == 20

    surv1 = {
        r["doc_id"]
        for r in dedup.dedup_minhash_incremental(
            spark, batch, idx, num_hashes=32, num_bands=8,
            append_survivors=False,
        ).collect()
    }
    # (a) copies of erased odds are ADMITTED; copies of evens suppressed
    assert surv1 == {1000 + i for i in range(40) if i % 2 != 0}

    # (b) idempotent re-delete + strict reuse
    assert dedup.minhash_index_delete(spark, idx, odds, batch_id="d1")[
        "skipped"
    ] is True
    with pytest.raises(ValueError, match="DIFFERENT id set"):
        dedup.minhash_index_delete(
            spark, idx, corpus.filter(F.col("doc_id") < 3).select("doc_id"),
            batch_id="d1",
        )

    # (c) purge: compacted copy == fresh build over survivors, clean state
    purged = str(tmp_path / "mh_purged")
    dedup.minhash_index_compact(spark, idx, max_bucket=64, out_path=purged)
    assert (
        spark.read.parquet(purged)
        .filter(F.col("doc_id") % 2 != 0)
        .count()
        == 0
    )
    assert _read_scalars(spark, purged)["tombstones"] == []
    fresh = str(tmp_path / "mh_fresh")
    dedup.minhash_index_write(
        corpus.filter(F.col("doc_id") % 2 == 0), fresh,
        num_hashes=32, num_bands=8,
    )
    rows = lambda p: sorted(
        map(tuple, spark.read.parquet(p).select("doc_id", "band", "band_hash").collect())
    )
    assert rows(purged) == rows(fresh)

    # (d) masked probe ≡ purged probe (cross pairs identical)
    cross_masked, _ = dedup.minhash_incremental_pairs(
        spark, batch, idx, num_hashes=32, num_bands=8
    )
    cross_purged, _ = dedup.minhash_incremental_pairs(
        spark, batch, purged, num_hashes=32, num_bands=8
    )
    pairs = lambda df: sorted(map(tuple, df.collect()))
    assert pairs(cross_masked) == pairs(cross_purged)


def test_minhash_crashed_delete_invisible(spark, tmp_path):
    """A tombstone table written but never committed masks nothing —
    suppression still anchors on every indexed doc."""
    from pwhl_data_engineering_pipeline_spark.operators import dedup

    corpus = _docs(spark, range(20), key="crash")
    idx = str(tmp_path / "mh_crash")
    dedup.minhash_index_write(corpus, idx, num_hashes=32, num_bands=8)
    corpus.limit(10).select("doc_id").write.parquet(f"{idx}/_tombstones/crashed")
    batch = corpus.withColumn("doc_id", F.col("doc_id") + F.lit(1000))
    surv = dedup.dedup_minhash_incremental(
        spark, batch, idx, num_hashes=32, num_bands=8, append_survivors=False
    )
    assert surv.count() == 0  # uncommitted tombstone is invisible


def test_minhash_reappend_tombstoned_id_stays_masked(spark, tmp_path):
    """Delete-then-gone until the purge: re-appending a tombstoned id's
    buckets before the compact keeps it masked (a copy of the doc is
    still admitted); after the purging compact a fresh append anchors
    suppression again."""
    from pwhl_data_engineering_pipeline_spark.operators import dedup

    corpus = _docs(spark, range(12), key="remask")
    target = corpus.filter(F.col("doc_id") == 0)
    idx = str(tmp_path / "mh_remask")
    dedup.minhash_index_write(corpus, idx, num_hashes=32, num_bands=8)
    dedup.minhash_index_delete(
        spark, idx, target.select("doc_id"), batch_id="dz"
    )
    # re-ingest of the erased doc under the SAME id (redelivery)
    dedup.minhash_index_write(
        target, idx, num_hashes=32, num_bands=8, mode="append"
    )
    copy = target.withColumn("doc_id", F.col("doc_id") + F.lit(1000))
    surv = dedup.dedup_minhash_incremental(
        spark, copy, idx, num_hashes=32, num_bands=8, append_survivors=False
    )
    assert surv.count() == 1  # still masked: the copy is admitted

    # purge, then a fresh append of the id is live again
    purged = str(tmp_path / "mh_remask_purged")
    dedup.minhash_index_compact(spark, idx, out_path=purged)
    dedup.minhash_index_write(
        target, purged, num_hashes=32, num_bands=8, mode="append"
    )
    surv2 = dedup.dedup_minhash_incremental(
        spark, copy, purged, num_hashes=32, num_bands=8, append_survivors=False
    )
    assert surv2.count() == 0  # suppression anchors again


# ---- champion lists under deletion (r12, VERDICT r11 #5) -------------------


def test_champions_delete_merge_and_probe_gating(spark, tmp_path):
    """(a) a sidecar that does not account for pending tombstones refuses
    (the r11 posture, now scoped to the pathological case); (b)
    bm25_champions_refresh merges the mask in O(blast radius) — mode
    delete_merge — and its data is ROW-IDENTICAL to a full masked
    rebuild (the promotion case: m small enough that deleting a champion
    promotes a below-cutoff doc); (c) the refreshed champion probe never
    under-returns vs the masked full probe (equal when live df ≤ m);
    (d) noop on re-refresh; (e) the purging compact restamps the
    delete-covered sidecar and the probe keeps working with tombstones
    cleared."""
    from pwhl_data_engineering_pipeline_spark.operators import search

    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} " + ("spark join " * (i % 3 + 1))) for i in range(40)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bm25_champ_del")
    search.bm25_index_write(docs, idx, n_buckets=8)
    search.bm25_champions_write(spark, idx, m=3)
    qdf = spark.createDataFrame(
        [("q1", "alpha spark"), ("q2", "beta join")],
        "query_id string, query_text string",
    )
    odds = docs.filter(F.col("doc_id") % 2 != 0).select("doc_id")
    search.bm25_delete(spark, idx, odds, batch_id="d1")

    # (a) unrefreshed sidecar refuses
    with pytest.raises(RuntimeError, match="does not account for"):
        search.bm25_search_index(spark, idx, qdf, k=5, champions_m=3)
    from pwhl_data_engineering_pipeline_spark.operators.search import (
        champions_stale,
    )

    assert champions_stale(spark, idx) is True

    # (b) delete merge == full masked rebuild, row-identical
    out = search.bm25_champions_refresh(spark, idx, m=3)
    assert out["mode"] == "delete_merge" and out["new_tombstones"] == 1
    merged_rows = sorted(
        map(tuple, spark.read.parquet(f"{idx}/_champions/m=3/data").collect())
    )
    search.bm25_champions_write(spark, idx, m=3)  # full masked rebuild
    full_rows = sorted(
        map(tuple, spark.read.parquet(f"{idx}/_champions/m=3/data").collect())
    )
    assert merged_rows == full_rows
    assert champions_stale(spark, idx) is False

    # (c) champion probe with live df ≤ m equals the masked full probe
    search.bm25_champions_write(spark, idx, m=100)
    champ = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=40, champions_m=100)
            .select("query_id", "doc_id", "score", "rank")
            .collect(),
        )
    )
    full = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=40)
            .select("query_id", "doc_id", "score", "rank")
            .collect(),
        )
    )
    assert champ == full  # stale stats on BOTH sides — the Lucene posture

    # (d) noop on re-refresh
    assert search.bm25_champions_refresh(spark, idx, m=3)["mode"] == "noop"

    # (e) the purging compact restamps delete-covered sidecars (content
    # already equals the live top-m) and the probe works with a clean set
    obs = search.bm25_index_compact(spark, idx, reclaim_min_age_seconds=0)
    assert obs["champions_restamped"] == 2  # m=3 and m=100
    survivors = docs.filter(F.col("doc_id") % 2 == 0)
    champ2 = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=40, champions_m=100)
            .select("query_id", "doc_id", "score", "rank")
            .collect(),
        )
    )
    want2 = sorted(
        map(
            tuple,
            search.bm25_topk(survivors, qdf, k=40)
            .select("query_id", "doc_id", "score", "rank")
            .collect(),
        )
    )
    assert champ2 == want2


def test_champions_refresh_append_and_delete_axes(spark, tmp_path):
    """(a) the pure-append incremental merge masks a re-appended
    tombstoned id out of the lists (delete-then-gone); (b) both axes
    moved since the stamp → honest full rebuild (mode=rebuild), masked."""
    from pwhl_data_engineering_pipeline_spark.operators import search

    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} spark") for i in range(30)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bm25_champ_axes")
    search.bm25_index_write(docs, idx, n_buckets=4)
    search.bm25_champions_write(spark, idx, m=100)
    search.bm25_delete(
        spark, idx,
        spark.createDataFrame([(1,), (3,)], "doc_id long"),
        batch_id="d1",
    )
    out = search.bm25_champions_refresh(spark, idx, m=100)
    assert out["mode"] == "delete_merge"

    # (a) append re-delivers tombstoned doc 1 plus fresh docs
    extra = spark.createDataFrame(
        [(1, "alpha beta doc1 spark"), (200, "alpha beta doc200 spark")],
        "doc_id long, text string",
    )
    search.bm25_index_append(extra, idx, batch_id="b1")
    out = search.bm25_champions_refresh(spark, idx, m=100)
    assert out["mode"] == "incremental"
    side = spark.read.parquet(f"{idx}/_champions/m=100/data")
    assert side.filter(F.col("doc_id") == 1).count() == 0  # stays masked
    assert side.filter(F.col("doc_id") == 200).count() > 0

    # (b) both axes move before the next refresh → rebuild
    search.bm25_delete(
        spark, idx, spark.createDataFrame([(5,)], "doc_id long"), batch_id="d2"
    )
    search.bm25_index_append(
        spark.createDataFrame([(300, "alpha beta doc300 spark")],
                              "doc_id long, text string"),
        idx, batch_id="b2",
    )
    out = search.bm25_champions_refresh(spark, idx, m=100)
    assert out["mode"] == "rebuild"
    side = spark.read.parquet(f"{idx}/_champions/m=100/data")
    assert side.filter(F.col("doc_id").isin([1, 3, 5])).count() == 0
    qdf = spark.createDataFrame(
        [("q1", "alpha spark")], "query_id string, query_text string"
    )
    champ = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=50, champions_m=100)
            .select("query_id", "doc_id", "score", "rank")
            .collect(),
        )
    )
    full = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=50)
            .select("query_id", "doc_id", "score", "rank")
            .collect(),
        )
    )
    assert champ == full


def test_pq_and_minhash_tombstone_frac_probes(spark, tmp_path):
    """r12 parity: the PQ drift probe and the MinHash scheduler probe
    gain the same tombstone_frac term as BM25/IVF — metadata counts,
    trip at the default 0.25, reset at the purge."""
    from pwhl_data_engineering_pipeline_spark.operators import dedup, search

    emb = _emb(spark, seed=19, d=16)
    cent, assigned = similarity.ivf_index(emb, n_centroids=4)
    books = pq.pq_train_residual(emb, assigned, cent, m=4, k=16, iters=3)
    idx = str(tmp_path / "pq_frac")
    pq.pq_write(
        pq.pq_encode_residual(emb, assigned, cent, books), idx, books, cent,
        vectors=emb,
    )
    probe0 = pq.pq_needs_recompact(spark, idx, emb)
    assert probe0["tombstone_frac"] == 0.0 and probe0["recompact"] is False
    live = emb.filter(F.col("vec_id") >= 48)
    pq.pq_delete(spark, idx, emb.filter(F.col("vec_id") < 48).select("vec_id"))
    probe1 = pq.pq_needs_recompact(spark, idx, live)
    assert probe1["tombstone_frac"] == pytest.approx(48 / 160)
    assert probe1["recompact"] is True  # 30% >= 25%
    assert (
        pq.pq_needs_recompact(spark, idx, live, max_tombstone_frac=None)[
            "recompact"
        ]
        is False
    )
    pq.pq_recompact(spark, idx, live, iters=3)
    probe2 = pq.pq_needs_recompact(spark, idx, live)
    assert probe2["tombstone_frac"] == 0.0 and probe2["recompact"] is False

    # MinHash twin (manifest-less data: denominator is a distinct count)
    import hashlib

    docs = spark.createDataFrame(
        [
            (i, " ".join(hashlib.md5(f"tf-{i}-{j}".encode()).hexdigest()
                          for j in range(8)))
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    midx = str(tmp_path / "mh_frac")
    dedup.minhash_index_write(docs, midx, num_hashes=32, num_bands=8)
    assert dedup.minhash_needs_compact(spark, midx)["compact"] is False
    dedup.minhash_index_delete(
        spark, midx, docs.filter(F.col("doc_id") < 12).select("doc_id")
    )
    probe = dedup.minhash_needs_compact(spark, midx)
    assert probe["tombstone_frac"] == pytest.approx(12 / 40)
    assert probe["compact"] is True
    purged = str(tmp_path / "mh_frac_purged")
    dedup.minhash_index_compact(spark, midx, out_path=purged)
    after = dedup.minhash_needs_compact(spark, purged)
    assert after["compact"] is False and after["tombstone_frac"] == 0.0


def test_filtered_search_composes_with_deletion(spark, tmp_path):
    """r12 filtered ANN (allowed_ids): (a) brute_force_topk with an
    allow-list ≡ brute force over the pre-filtered corpus; (b) the IVF
    probe at exhaustive n_probe with allow-list + pending tombstones ≡
    brute force over (allowed ∩ survivors) — both masks compose; (c) the
    documented post-filtering trade: under a selective filter at small
    n_probe the probe may under-fill (≤ k rows), never wrongly fill."""
    emb = _emb(spark, seed=29)
    cent, assigned = similarity.ivf_index(emb, n_centroids=8)
    idx = str(tmp_path / "ivf_filt")
    similarity.ivf_write(assigned, idx, cent)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    allowed = emb.filter(F.col("vec_id") % 3 == 0).select("vec_id")

    # (a) brute force twins
    got = sorted(
        map(tuple, similarity.brute_force_topk(emb, q, k=5, allowed_ids=allowed).collect())
    )
    want = sorted(
        map(
            tuple,
            similarity.brute_force_topk(
                emb.filter(F.col("vec_id") % 3 == 0), q, k=5
            ).collect(),
        )
    )
    assert got == want

    # (b) filter × tombstone composition at exhaustive n_probe
    similarity.ivf_delete(
        spark, idx, emb.filter(F.col("vec_id") % 2 != 0).select("vec_id")
    )
    probed = sorted(
        map(
            tuple,
            similarity.ivf_topk_pruned(
                spark, idx, None, q, k=5, n_probe=8, allowed_ids=allowed
            ).collect(),
        )
    )
    exact = sorted(
        map(
            tuple,
            similarity.brute_force_topk(
                emb.filter(F.col("vec_id") % 6 == 0), q, k=5
            ).collect(),
        )
    )
    assert probed == exact

    # (c) selective filter at n_probe=1: may under-fill, never over-fill
    tiny_allowed = emb.filter(F.col("vec_id") % 40 == 0).select("vec_id")
    rows = similarity.ivf_topk_pruned(
        spark, idx, None, q, k=5, n_probe=1, allowed_ids=tiny_allowed
    ).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        assert r["vec_id"] % 40 == 0 and r["vec_id"] % 2 == 0
    assert all(len(v) <= 5 for v in per_q.values())


# ---------------------------------------------------------------------------
# r13: ADVICE r12 regressions
# ---------------------------------------------------------------------------


def test_minhash_purge_rerun_to_same_path_is_idempotent(spark, tmp_path):
    """ADVICE r12 (medium): a purge that crashes after the clean-manifest
    commit but before the orchestrator swaps paths must be re-runnable
    to the SAME out_path — previously the re-run's parent_version=0
    commit hit the existing v1 and raised IOError, contradicting the
    documented 'each compact is idempotent / re-run to resume'
    contract. Covers both purge sites: minhash_index_compact and the
    streaming index_compact."""
    from pwhl_data_engineering_pipeline_spark.operators import dedup
    from pwhl_data_engineering_pipeline_spark.operators.search import (
        _read_scalars,
    )
    from pwhl_data_engineering_pipeline_spark.streaming.dedup import (
        index_compact,
    )

    corpus = _docs(spark, range(30))
    idx = str(tmp_path / "mh_rerun")
    dedup.minhash_index_write(corpus, idx, num_hashes=32, num_bands=8)
    dedup.minhash_index_delete(
        spark, idx,
        corpus.filter(F.col("doc_id") < 10).select("doc_id"),
        batch_id="d1",
    )

    purged = str(tmp_path / "mh_rerun_out")
    dedup.minhash_index_compact(spark, idx, max_bucket=64, out_path=purged)
    rows1 = sorted(
        map(tuple, spark.read.parquet(purged).select(
            "doc_id", "band", "band_hash").collect())
    )
    # crash-after-commit simulation: the orchestrator never swapped, so
    # the SAME compact re-runs to the SAME out_path — must not raise
    dedup.minhash_index_compact(spark, idx, max_bucket=64, out_path=purged)
    meta = _read_scalars(spark, purged)
    assert meta["tombstones"] == []
    rows2 = sorted(
        map(tuple, spark.read.parquet(purged).select(
            "doc_id", "band", "band_hash").collect())
    )
    assert rows1 == rows2

    # streaming twin (same helper, same contract)
    spurge = str(tmp_path / "mh_rerun_sout")
    s1 = index_compact(spark, idx, spurge)
    s2 = index_compact(spark, idx, spurge)
    assert _read_scalars(spark, spurge)["tombstones"] == []
    assert s1["rows_out"] == s2["rows_out"]


def test_streaming_compact_purge_metric_excludes_duplicates(spark, tmp_path):
    """ADVICE r12: tombstoned_purged was measured against the
    PRE-distinct row count, conflating duplicate-row removal (the
    normal product of streaming at-least-once appends) with tombstone
    purging. With doubled bucket rows and 5 of 20 docs tombstoned, the
    metric must report the 5 docs' distinct bucket rows — not also the
    20 docs' worth of duplicates."""
    from pwhl_data_engineering_pipeline_spark.operators import dedup
    from pwhl_data_engineering_pipeline_spark.streaming.dedup import (
        index_compact,
    )

    corpus = _docs(spark, range(20), key="dupmetric")
    idx = str(tmp_path / "mh_dup")
    dedup.minhash_index_write(corpus, idx, num_hashes=32, num_bands=8)
    # an at-least-once replay: the same batch's bucket rows land twice
    dedup.minhash_index_write(
        corpus, idx, num_hashes=32, num_bands=8, mode="append"
    )
    tomb = corpus.filter(F.col("doc_id") < 5).select("doc_id")
    dedup.minhash_index_delete(spark, idx, tomb, batch_id="d1")

    distinct_tomb_rows = (
        spark.read.parquet(idx)
        .filter(F.col("doc_id") < 5)
        .distinct()
        .count()
    )
    stats = index_compact(spark, idx, str(tmp_path / "mh_dup_out"))
    assert stats["tombstoned_purged"] == distinct_tomb_rows
    # every distinct row landed exactly twice: rows_in is the doubled
    # total, rows_out the distinct survivors
    assert stats["rows_in"] == 2 * (
        stats["rows_out"] + stats["tombstoned_purged"]
    )
    # rows_out holds only survivors, once
    surv = spark.read.parquet(str(tmp_path / "mh_dup_out"))
    assert surv.filter(F.col("doc_id") < 5).count() == 0
    assert surv.count() == surv.distinct().count()


def test_tombstone_mass_is_distinct_across_overlapping_batches(
    spark, tmp_path
):
    """ADVICE r12: repeated erasure sweeps with overlapping id sets are
    the normal GDPR cadence — summing per-batch tombstone_counts
    overstated deletion debt and tripped the schedulers early. The
    multi-batch mass is the DISTINCT union."""
    from pwhl_data_engineering_pipeline_spark.operators import dedup
    from pwhl_data_engineering_pipeline_spark.operators.search import (
        _tombstone_mass,
    )

    corpus = _docs(spark, range(40), key="mass")
    idx = str(tmp_path / "mh_mass")
    dedup.minhash_index_write(corpus, idx, num_hashes=32, num_bands=8)
    dedup.minhash_index_delete(
        spark, idx, corpus.filter(F.col("doc_id") < 20).select("doc_id"),
        batch_id="a",
    )
    dedup.minhash_index_delete(
        spark, idx,
        corpus.filter(
            (F.col("doc_id") >= 10) & (F.col("doc_id") < 30)
        ).select("doc_id"),
        batch_id="b",
    )
    meta = dedup._minhash_meta(spark, idx)
    # per-batch counts sum to 40; the distinct union is 30
    assert sum(meta["tombstone_counts"].values()) == 40
    assert _tombstone_mass(spark, idx, meta) == 30
    probe = dedup.minhash_needs_compact(spark, idx, max_tombstone_frac=0.25)
    assert probe["n_tombstoned"] == 30
    assert probe["tombstone_frac"] == 30 / 40


def test_purge_everywhere_manifestless_pq_means_no_tombstones(
    spark, tmp_path
):
    """ADVICE r12: purge_everywhere's pq precondition read the manifest
    with _read_scalars, which raises FileNotFoundError on a pre-r11
    manifest-less PQ index — every other PQ reader treats that as 'no
    tombstones' via _pq_read_manifest. A manifest-less index must purge
    as a cheap no-op, not crash the sweep."""
    import shutil

    from pwhl_data_engineering_pipeline_spark.operators import erasure

    emb = _emb(spark, n=80, seed=7, d=8)
    cent, assigned = similarity.ivf_index(emb, n_centroids=3)
    books = pq.pq_train_residual(emb, assigned, cent, m=4, k=16, iters=3)
    idx = str(tmp_path / "pq_nomanifest")
    pq.pq_write(
        pq.pq_encode_residual(emb, assigned, cent, books), idx, books, cent,
        vectors=emb,
    )
    shutil.rmtree(f"{idx}/_scalars")  # manufacture the pre-r11 layout

    out = erasure.purge_everywhere(spark, {"pq": idx}, vectors=None)
    assert out["results"]["pq"] == {
        "skipped": True, "reason": "no tombstones",
    }
    assert out["still_pending"] == []


def test_minhash_delete_refresh_uncaps_survivor_cold_buckets(
    spark, tmp_path
):
    """ADVICE r12: a bucket hot only because of tombstoned members stayed
    capped on the sidecar probe path (scan mode recomputed masked heat,
    the cached sidecar did not), silently missing live-vs-live
    collisions until the purging compact. refresh_hot_sidecar is now
    survivor-relative, and minhash_index_delete(refresh_sidecar_max_
    bucket=...) runs it post-commit — after deleting the members that
    made the bucket hot, a probe collides with the survivors again on
    BOTH cap paths."""
    from pwhl_data_engineering_pipeline_spark.operators import dedup

    text = " ".join(f"tok{j}" for j in range(30))
    mk = lambda ids: spark.createDataFrame(
        [(int(i), text) for i in ids], "doc_id long, text string"
    )
    idx = str(tmp_path / "mh_hot")
    # 40 identical docs (bucket size 40 <= cap 64: stored), then 40 more
    # appended — accumulated 80 > 64, so the refreshed sidecar caps it
    dedup.minhash_index_write(mk(range(40)), idx, num_hashes=32, num_bands=8)
    dedup.minhash_index_write(
        mk(range(100, 140)), idx, num_hashes=32, num_bands=8, mode="append"
    )
    probe = mk([5000])
    pairs = lambda cap: sorted(
        r["corpus_id"]
        for r in dedup.minhash_incremental_pairs(
            spark, probe, idx, num_hashes=32, num_bands=8, probe_cap=cap
        )[0].collect()
    )
    assert pairs("sidecar") == []  # hot bucket: capped, no candidates

    # erase the appended 40; survivors (40) fit under the cap again
    out = dedup.minhash_index_delete(
        spark, idx, mk(range(100, 140)).select("doc_id"),
        batch_id="d1", refresh_sidecar_max_bucket=64,
    )
    assert out["skipped"] is False
    want = sorted(range(40))
    assert pairs("sidecar") == want  # sidecar heat is survivor-relative
    assert pairs("scan") == want     # and agrees with inline masked heat
