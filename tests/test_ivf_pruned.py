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
    # reads only the routed directories, not the whole index
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [centroid_id" in plan and "centroid_id#" in plan


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
