"""Persisted PQ (residual IVFADC) index lifecycle — r11: the same
batch-visibility machinery the IVF/BM25 indexes carry (crash-consistent
idempotent appends, age-gated repair, atomic retrain-and-flip recompact,
drift probe), with the PQ-specific wrinkle that codes are LOSSY, so the
drift probe and the recompact take raw vectors.

The load-bearing theorem: encoding is a deterministic per-vector function
of (centroids, codebooks), so build(A) + append(B) against a committed
set produces code-for-code what encoding A∪B against that set would —
probes over the two indexes are row-identical, no recall tolerance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark import fsutil, schemas
from pwhl_data_engineering_pipeline_spark.operators import pq, similarity

D, M, K = 16, 4, 16


def _corpus(spark, n=160, seed=5, shift=0.0, id_base=0, center_seed=None):
    """Gaussian-cluster corpus; ``center_seed`` defaults to ``seed`` —
    pass it explicitly to draw NEW points from the SAME distribution
    (stationary), or leave it to move the clusters too (drift)."""
    centers = (
        np.random.RandomState(seed if center_seed is None else center_seed)
        .randn(6, D) * 5.0 + shift
    )
    rng = np.random.RandomState(seed)
    X = np.concatenate(
        [c + rng.randn(max(n // 6, 1), D) * 0.4 for c in centers]
    )[:n]
    return spark.createDataFrame(
        [(id_base + i, [float(x) for x in X[i]], 0) for i in range(len(X))],
        schemas.EMBEDDINGS,
    )


def _probe_rows(spark, idx, queries, n_probe):
    return sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in pq.ivf_adc_topk_pruned(
            spark, idx, queries, k=5, n_probe=n_probe
        ).collect()
    )


def _queries(emb, n=3):
    rows = sorted(
        emb.filter(F.col("vec_id") < n).collect(), key=lambda r: r["vec_id"]
    )
    return [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows]


def test_pq_append_differential_equals_full_encode(spark, tmp_path):
    """build(evens) + append(odds) must probe ROW-IDENTICAL to encoding
    the full corpus against the same committed set — the differential
    that makes the append's crash machinery testable without recall
    tolerances. Also: the probe plan carries partition filters on BOTH
    partition levels (centroid_id pruning + batch visibility)."""
    emb = _corpus(spark)
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 != 0)
    cent, assigned_old = similarity.ivf_index(old, n_centroids=6)
    books = pq.pq_train_residual(old, assigned_old, cent, m=M, k=K, iters=8)

    inc = str(tmp_path / "pq_inc")
    pq.pq_write(
        pq.pq_encode_residual(old, assigned_old, cent, books), inc, books, cent
    )
    out = pq.pq_append(new, inc)
    assert out["skipped"] is False and out["n_vectors_added"] == new.count()

    full = str(tmp_path / "pq_full")
    assigned_all = similarity.ivf_assign(emb, cent)
    pq.pq_write(
        pq.pq_encode_residual(emb, assigned_all, cent, books), full, books, cent
    )

    queries = _queries(emb)
    assert _probe_rows(spark, inc, queries, 6) == _probe_rows(
        spark, full, queries, 6
    )

    import re as _re

    plan = (
        pq.ivf_adc_topk_pruned(spark, inc, queries, k=5, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    filters = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert filters and any("centroid_id" in f for f in filters), plan[:2000]
    assert any("batch" in f for f in filters), filters


def test_pq_append_crash_invisible_idempotent_and_repair(spark, tmp_path):
    """(a) files landed by an append whose manifest commit never happened
    are INVISIBLE to the probe; (b) repair defers the young orphan and
    reclaims it past the age gate; (c) re-appending the same batch id
    purges leftovers and rewrites (idempotent); (d) a committed
    re-append is a metadata no-op."""
    emb = _corpus(spark, seed=9)
    old = emb.filter(F.col("vec_id") < 120)
    new = emb.filter(F.col("vec_id") >= 120)
    cent, assigned = similarity.ivf_index(old, n_centroids=6)
    books = pq.pq_train_residual(old, assigned, cent, m=M, k=K, iters=8)
    idx = str(tmp_path / "pq_crash")
    pq.pq_write(pq.pq_encode_residual(old, assigned, cent, books), idx, books, cent)
    queries = _queries(emb)
    before = _probe_rows(spark, idx, queries, 6)

    # (a) crashed append: rows land, manifest never commits
    routed = similarity.ivf_assign(new, cent)
    pq.pq_encode_residual(new, routed, cent, books).withColumn(
        "batch", F.lit("late")
    ).write.mode("append").partitionBy("centroid_id", "batch").parquet(idx)
    assert spark.read.parquet(idx).count() == emb.count()  # on disk...
    assert _probe_rows(spark, idx, queries, 6) == before  # ...invisible

    # (b) repair: young orphan deferred, reclaimed past the gate
    rep = pq.pq_index_repair(spark, idx)
    assert rep["purged_batches"] == [] and rep["deferred_batches"] == ["late"]
    rep0 = pq.pq_index_repair(spark, idx, min_age_seconds=0)
    assert rep0["purged_batches"] == ["late"]
    assert spark.read.parquet(idx).count() == old.count()

    # (c) idempotent re-append over fresh half-landed leftovers
    pq.pq_encode_residual(new, routed, cent, books).withColumn(
        "batch", F.lit("late")
    ).write.mode("append").partitionBy("centroid_id", "batch").parquet(idx)
    out = pq.pq_append(new, idx, batch_id="late")
    assert out["skipped"] is False and out["n_vectors_added"] == new.count()
    vis = spark.read.parquet(idx).filter(F.col("batch").isin(["base", "late"]))
    assert vis.count() == emb.count()
    assert vis.select("vec_id").distinct().count() == emb.count()

    # (d) committed re-append no-ops
    out2 = pq.pq_append(new, idx, batch_id="late")
    assert out2["skipped"] is True and out2["n_vectors_added"] == 0
    assert fsutil.exists(spark, f"{idx}/_scalars")


def test_pq_recompact_identity_with_fresh_build(spark, tmp_path):
    """Recompact reuses a fresh build's exact deterministic recipes
    (similarity._train_centroids + pq_train_residual + encode), so
    recompacting build(A)+append(B) with vectors=A∪B must probe
    ROW-IDENTICAL to building from scratch over A∪B; the manifest flips
    to one batch + one meta set, old ids are retirement-stamped, and
    repair reclaims them after the gate. The drift probe reads ~1.0
    against the freshly-stamped baseline."""
    emb = _corpus(spark, seed=13)
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 != 0)
    cent, assigned = similarity.ivf_index(old, n_centroids=6)
    books = pq.pq_train_residual(old, assigned, cent, m=M, k=K, iters=8)
    idx = str(tmp_path / "pq_rc")
    pq.pq_write(
        pq.pq_encode_residual(old, assigned, cent, books), idx, books, cent,
        vectors=old,
    )
    pq.pq_append(new, idx)

    obs = pq.pq_recompact(spark, idx, emb, iters=8, refine_iterations=1)
    assert obs["mode"] == "recompact" and obs["n_vectors"] == emb.count()
    meta = pq._pq_read_manifest(spark, idx)
    assert meta["batches"] == [obs["batch_id"]]
    assert meta["meta"] == obs["batch_id"]
    assert set(meta["retired"]) >= {"base"}

    # fresh build over the same corpus with the same knobs
    cent2 = similarity._train_centroids(emb, 6, "embedding", "vec_id", 42, 1)
    assigned2 = similarity.ivf_assign(emb, cent2)
    books2 = pq.pq_train_residual(emb, assigned2, cent2, m=M, k=K, iters=8)
    fresh = str(tmp_path / "pq_fresh")
    pq.pq_write(
        pq.pq_encode_residual(emb, assigned2, cent2, books2), fresh, books2, cent2
    )
    queries = _queries(emb)
    assert _probe_rows(spark, idx, queries, 6) == _probe_rows(
        spark, fresh, queries, 6
    )

    # baseline is a 1/16 hash-sample estimate, the probe here measures the
    # FULL corpus — on 160 rows the sampling gap is ~1.23 (deterministic);
    # what matters is it reads far from the drift regime's 3-300×
    probe = pq.pq_needs_recompact(spark, idx, emb, threshold=1.5)
    assert probe["recompact"] is False
    assert probe["ratio"] < 1.5

    rep = pq.pq_index_repair(spark, idx, min_age_seconds=0)
    assert set(rep["purged_batches"]) >= {"base"}
    assert rep["meta_swept"] == ["base"]
    # stamps dropped for everything reclaimed
    meta2 = pq._pq_read_manifest(spark, idx)
    assert not (meta2.get("retired") or {})
    # probe still identical after reclamation
    assert _probe_rows(spark, idx, queries, 6) == _probe_rows(
        spark, fresh, queries, 6
    )


def test_pq_needs_recompact_fires_under_drift(spark, tmp_path):
    """Quantization error of a SHIFTED sample under the frozen set must
    trip the threshold while a stationary sample reads ~1.0 — the PQ
    analogue of the IVF assign-distance probe (SCALING.md drift study),
    measurable only from raw vectors because codes are lossy."""
    emb = _corpus(spark, n=240, seed=21)
    cent, assigned = similarity.ivf_index(emb, n_centroids=6)
    books = pq.pq_train_residual(emb, assigned, cent, m=M, k=K, iters=8)
    idx = str(tmp_path / "pq_drift")
    pq.pq_write(
        pq.pq_encode_residual(emb, assigned, cent, books), idx, books, cent,
        vectors=emb,
    )
    stationary = pq.pq_needs_recompact(
        spark, idx, _corpus(spark, n=80, seed=22, center_seed=21)
    )
    # same generating distribution (same centers, fresh points): near baseline
    assert stationary["ratio"] < 2.0, stationary
    drifted = pq.pq_needs_recompact(
        spark, idx, _corpus(spark, n=80, seed=23, shift=25.0, id_base=10_000)
    )
    assert drifted["recompact"] is True and drifted["ratio"] > 3.0, drifted

    # refuses without a baseline (index written without vectors=)
    bare = str(tmp_path / "pq_nobase")
    pq.pq_write(
        pq.pq_encode_residual(emb, assigned, cent, books), bare, books, cent
    )
    with pytest.raises(RuntimeError, match="quant_err_baseline"):
        pq.pq_needs_recompact(spark, bare, emb)


def test_pq_recompact_count_guard(spark, tmp_path):
    """Recompacting over a PARTIAL corpus would silently shrink the index
    under one atomic flip — the count guard refuses."""
    emb = _corpus(spark, seed=31)
    cent, assigned = similarity.ivf_index(emb, n_centroids=6)
    books = pq.pq_train_residual(emb, assigned, cent, m=M, k=K, iters=5)
    idx = str(tmp_path / "pq_guard")
    pq.pq_write(pq.pq_encode_residual(emb, assigned, cent, books), idx, books, cent)
    with pytest.raises(RuntimeError, match="committed index holds"):
        pq.pq_recompact(spark, idx, emb.filter(F.col("vec_id") < 50), iters=2)


def test_pq_append_aborts_when_recompact_flips_meta_mid_append(
    spark, tmp_path, monkeypatch
):
    """An append whose manifest commit loses the version race to a
    RECOMPACT must abort loudly instead of retrying: its rows were
    encoded with the OUTGOING books/centroids and would score garbage
    under the committed LUTs. (A race lost to a plain rival APPEND
    retries fine — additive visibility — covered by the ivf twin; here
    the meta id flips, the poison case.)"""
    from pwhl_data_engineering_pipeline_spark.operators import search as search_mod

    emb = _corpus(spark, seed=41)
    old = emb.filter(F.col("vec_id") < 120)
    new = emb.filter(F.col("vec_id") >= 120)
    cent, assigned = similarity.ivf_index(old, n_centroids=6)
    books = pq.pq_train_residual(old, assigned, cent, m=M, k=K, iters=5)
    idx = str(tmp_path / "pq_race")
    pq.pq_write(
        pq.pq_encode_residual(old, assigned, cent, books), idx, books, cent,
        vectors=old,
    )

    real_commit = search_mod._commit_scalars
    state = {"fired": False}

    def recompact_wins_first(spark_, path, meta, parent_version):
        if not state["fired"]:
            state["fired"] = True
            # the rival recompact lands BETWEEN this append's manifest
            # read and its commit: retrain + flip with the real machinery
            pq.pq_recompact(spark_, idx, old, iters=5)
            raise IOError("scalars commit conflict (simulated rival)")
        return real_commit(spark_, path, meta, parent_version)

    monkeypatch.setattr(search_mod, "_commit_scalars", recompact_wins_first)
    try:
        with pytest.raises(RuntimeError, match="recompacted while this append"):
            pq.pq_append(new, idx, batch_id="late")
    finally:
        monkeypatch.setattr(search_mod, "_commit_scalars", real_commit)

    # nothing half-visible: the committed corpus is exactly the recompact
    meta = pq._pq_read_manifest(spark, idx)
    assert len(meta["batches"]) == 1 and meta["batches"][0].startswith("rc")
    vis = spark.read.parquet(idx).filter(F.col("batch").isin(meta["batches"]))
    assert vis.count() == old.count()
    # the orphaned append rows are reclaimable
    rep = pq.pq_index_repair(spark, idx, min_age_seconds=0)
    assert "late" in rep["purged_batches"]


def test_pq_read_meta_refuses_legacy_layout(spark, tmp_path):
    """A pre-lifecycle index (no manifest) refuses loudly everywhere —
    a stale driver-side meta set would silently encode/route against
    books the committed probe no longer uses."""
    emb = _corpus(spark, n=60, seed=51)
    path = str(tmp_path / "legacy")
    emb.write.parquet(path)  # any manifest-less tree
    with pytest.raises(RuntimeError, match="rebuild with pq_write"):
        pq.pq_read_meta(spark, path)
    with pytest.raises(RuntimeError, match="rebuild with pq_write"):
        pq.pq_append(emb, path)
