"""Persisted IVF index: probes must partition-prune (scan only routed
centroid directories) and agree with the in-memory IVF search."""

from __future__ import annotations

from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark import schemas
from pwhl_data_engineering_pipeline_spark.operators import similarity


def test_ivf_pruned_probe(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = rng.randn(300, 8).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(300)], schemas.EMBEDDINGS
    )
    cent, assigned = similarity.ivf_index(emb, n_centroids=8)
    idx_path = str(tmp_path / "ivf")
    similarity.ivf_write(assigned, idx_path, cent)

    q = emb.filter(F.col("vec_id") < 2).select(F.col("vec_id").alias("query_id"), "embedding")
    pruned = similarity.ivf_topk_pruned(spark, idx_path, cent, q, k=5, n_probe=3)
    in_mem = similarity.ivf_topk(assigned, cent, q, k=5, n_probe=3)
    assert {(r["query_id"], r["vec_id"]) for r in pruned.collect()} == {
        (r["query_id"], r["vec_id"]) for r in in_mem.collect()
    }

    # the probe scan must carry partition filters on centroid_id — i.e. it
    # reads only the routed directories, not the whole index — and (r10)
    # on the committed-batch visibility column
    import re as _re

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    filters = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert filters and any("centroid_id" in f for f in filters), plan[:2000]
    assert any("batch" in f for f in filters), filters


def test_ivf_append_then_probe(spark, tmp_path):
    """Incremental append: new vectors routed to existing centroids land in
    the partition layout and are immediately probe-visible; an exact
    duplicate of a query vector must surface as its top hit."""
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(200, 8).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(200)], schemas.EMBEDDINGS
    )
    cent, assigned = similarity.ivf_index(emb, n_centroids=6)
    idx_path = str(tmp_path / "ivf_app")
    similarity.ivf_write(assigned, idx_path, cent)

    # append 20 new vectors; id 1000 is an exact copy of vector 0
    new_rows = [(1000, [float(x) for x in vecs[0]], 0)] + [
        (1001 + j, [float(x) for x in rng.randn(8).astype("float32")], 0)
        for j in range(19)
    ]
    new = spark.createDataFrame(new_rows, schemas.EMBEDDINGS)
    similarity.ivf_append(new, idx_path, cent)

    total = spark.read.parquet(idx_path).count()
    assert total == 220

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = similarity.ivf_topk_pruned(spark, idx_path, cent, q, k=3, n_probe=2)
    got = {r["vec_id"] for r in hits.collect()}
    assert 1000 in got and 0 in got  # the appended duplicate ranks with the original


def test_ivf_append_crash_invisible_and_idempotent(spark, tmp_path):
    """r10: the IVF index gets the same batch-visibility switch as BM25 —
    previously a bare parquet append that died mid-write left half-landed
    files VISIBLE to probes (torn index, no repair). Now: (a) files
    landed by an append whose manifest commit never happened are
    INVISIBLE to the probe; (b) re-appending the same batch id purges the
    leftovers and rewrites (idempotent repair) with probe results equal
    to a from-scratch build; (c) a re-append of a committed id is a
    metadata no-op; (d) ivf_index_repair reclaims the orphan age-gated."""
    import numpy as np

    from pwhl_data_engineering_pipeline_spark import fsutil
    from pwhl_data_engineering_pipeline_spark.operators.search import _read_scalars

    rng = np.random.RandomState(3)
    vecs = rng.randn(120, 8).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(120)], schemas.EMBEDDINGS
    )
    old = emb.filter(F.col("vec_id") < 100)
    new = emb.filter(F.col("vec_id") >= 100)
    cent, assigned = similarity.ivf_index(old, n_centroids=6)
    idx = str(tmp_path / "ivf_crash")
    similarity.ivf_write(assigned, idx, cent)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = sorted(
        map(tuple, similarity.ivf_topk_pruned(spark, idx, cent, q, k=5, n_probe=6).collect())
    )

    # ---- (a) simulate a crashed append: files land, manifest never commits
    routed = similarity.ivf_assign(new, cent)
    routed.withColumn("batch", F.lit("late")).write.mode("append").partitionBy(
        "centroid_id", "batch"
    ).parquet(idx)
    assert spark.read.parquet(idx).count() == 120  # files are on disk...
    after_crash = sorted(
        map(tuple, similarity.ivf_topk_pruned(spark, idx, cent, q, k=5, n_probe=6).collect())
    )
    assert after_crash == before  # ...but invisible to the probe

    # ---- (d) repair defers the young orphan, reclaims it past the gate
    rep = similarity.ivf_index_repair(spark, idx)
    assert rep["purged_batches"] == [] and rep["deferred_batches"] == ["late"]
    rep0 = similarity.ivf_index_repair(spark, idx, min_age_seconds=0)
    assert rep0["purged_batches"] == ["late"]
    assert spark.read.parquet(idx).count() == 100

    # ---- (b) idempotent re-append of the same id: purge + rewrite + commit
    routed.withColumn("batch", F.lit("late")).write.mode("append").partitionBy(
        "centroid_id", "batch"
    ).parquet(idx)  # half-landed leftovers again
    out = similarity.ivf_append(new, idx, cent, batch_id="late")
    assert out["skipped"] is False and out["n_vectors_added"] == 20
    meta = _read_scalars(spark, idx)
    assert meta["batches"] == ["base", "late"]
    # no doubled rows among committed batches
    vis = spark.read.parquet(idx).filter(F.col("batch").isin(meta["batches"]))
    assert vis.count() == 120
    assert vis.select("vec_id").distinct().count() == 120
    # probe ≡ from-scratch build over the union (exhaustive probe)
    want_idx = str(tmp_path / "ivf_crash_full")
    _, assigned_all = similarity.ivf_index(old, n_centroids=6)
    similarity.ivf_write(assigned_all, want_idx, cent)
    similarity.ivf_append(new, want_idx, cent, batch_id="fresh")
    want = sorted(
        map(tuple, similarity.ivf_topk_pruned(spark, want_idx, cent, q, k=5, n_probe=6).collect())
    )
    got = sorted(
        map(tuple, similarity.ivf_topk_pruned(spark, idx, cent, q, k=5, n_probe=6).collect())
    )
    assert got == want

    # ---- (c) committed re-append is a metadata no-op
    out2 = similarity.ivf_append(new, idx, cent, batch_id="late")
    assert out2["skipped"] is True and out2["n_vectors_added"] == 0
    assert fsutil.exists(spark, f"{idx}/_scalars")


def test_ivf_append_refuses_legacy_flat_index(spark, tmp_path):
    """A pre-stamping flat index (no manifest) still PROBES fine but
    refuses appends loudly — the same posture as bm25_index_append."""
    import numpy as np

    rng = np.random.RandomState(5)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(8).astype("float32")], 0) for i in range(60)],
        schemas.EMBEDDINGS,
    )
    cent, assigned = similarity.ivf_index(emb, n_centroids=4)
    idx = str(tmp_path / "ivf_legacy")
    # legacy layout: bare centroid_id partitions, no batch, no manifest
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(idx)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.ivf_topk_pruned(spark, idx, cent, q, k=5, n_probe=4)
    assert got.count() == 10  # legacy probe unchanged
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="predates batch stamping"):
        similarity.ivf_append(emb.limit(1), idx, cent)
    with _pytest.raises(RuntimeError, match="predates batch stamping"):
        similarity.ivf_index_repair(spark, idx)


def test_ivf_append_retry_reverifies_batch_dirs(spark, tmp_path, monkeypatch):
    """ADVICE r10 low: the append re-verifies its batch directories on the
    version-race RETRY path too — a concurrent ivf_index_repair with an
    undersized age gate can purge the still-uncommitted young batch
    between the first verification and the retry commit; committing a
    manifest that lists a dir-less batch would make probes silently miss
    those vectors forever. The retry must abort LOUDLY instead, leaving
    the index consistent (minus the batch) so a plain re-append recovers."""
    import numpy as np
    import pytest as _pytest

    from pwhl_data_engineering_pipeline_spark.operators import search as search_mod

    rng = np.random.RandomState(17)
    vecs = rng.randn(120, 8).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(120)], schemas.EMBEDDINGS
    )
    old = emb.filter(F.col("vec_id") < 100)
    new = emb.filter(F.col("vec_id") >= 100)
    cent, assigned = similarity.ivf_index(old, n_centroids=6)
    idx = str(tmp_path / "ivf_retry_purge")
    similarity.ivf_write(assigned, idx, cent)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = sorted(
        map(tuple, similarity.ivf_topk_pruned(spark, idx, cent, q, k=5, n_probe=6).collect())
    )

    real_commit = search_mod._commit_scalars
    state = {"fired": False}

    def lose_race_and_get_purged(spark_, path_, meta_, parent_version):
        if not state["fired"]:
            state["fired"] = True
            # the rogue repair reclaims the young batch, then this commit
            # loses the version rename to the rival committer
            similarity._ivf_purge_batch(spark_, path_, "late")
            raise IOError("scalars commit conflict (simulated rival)")
        return real_commit(spark_, path_, meta_, parent_version)

    monkeypatch.setattr(search_mod, "_commit_scalars", lose_race_and_get_purged)
    with _pytest.raises(IOError, match="retry commit"):
        similarity.ivf_append(new, idx, cent, batch_id="late")
    monkeypatch.setattr(search_mod, "_commit_scalars", real_commit)

    # nothing committed: manifest unchanged, probe results identical
    meta = search_mod._read_scalars(spark, idx)
    assert meta["batches"] == ["base"]
    after = sorted(
        map(tuple, similarity.ivf_topk_pruned(spark, idx, cent, q, k=5, n_probe=6).collect())
    )
    assert after == before

    # plain re-append recovers fully: the duplicate of vec 0 surfaces
    out = similarity.ivf_append(new, idx, cent, batch_id="late")
    assert out["skipped"] is False and out["n_vectors_added"] == 20
    assert search_mod._read_scalars(spark, idx)["batches"] == ["base", "late"]
