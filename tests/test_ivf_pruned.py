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
