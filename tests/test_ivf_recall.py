"""IVF ANN recall: published floor on clustered data, monotonicity in
n_probe, and agreement of the recall harness with exact brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark import schemas
from pwhl_data_engineering_pipeline_spark.operators import similarity


def _recall_at_k(emb, nq=20, k=10, n_centroids=16, n_probe=4):
    q = emb.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qv = [(r["query_id"], r["embedding"]) for r in q.collect()]
    bf = similarity.brute_force_topk_arrow(emb, qv, k=k)
    cent, assigned = similarity.ivf_index(emb, n_centroids=n_centroids)
    iv = similarity.ivf_topk(assigned, cent, q, k=k, n_probe=n_probe)
    bfs: dict = {}
    for r in bf.collect():
        bfs.setdefault(r["query_id"], set()).add(r["vec_id"])
    ivs: dict = {}
    for r in iv.collect():
        ivs.setdefault(r["query_id"], set()).add(r["vec_id"])
    recs = [len(bfs[q] & ivs.get(q, set())) / len(bfs[q]) for q in bfs]
    return sum(recs) / len(recs)


def _clustered_embeddings(spark, n_clusters=16, per_cluster=75, dim=16, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 5
    vecs = np.vstack([c + rng.randn(per_cluster, dim) for c in centers])
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(len(vecs))],
        schemas.EMBEDDINGS,
    )


def test_ivf_recall_floor_clustered(spark):
    """Published number (README): recall@10 ≥ 0.9 with 4/16 probes on
    clustered data. On the near-uniform testdata embeddings the measured
    recall is ~0.70 (probe 4/16) and ~0.83 (probe 8/16) at sf0.1 — uniform
    high-dim data is IVF's worst case and is documented as such."""
    emb = _clustered_embeddings(spark)
    assert _recall_at_k(emb, n_probe=4) >= 0.9


def test_ivf_recall_monotone_in_probes(spark):
    """With fixed centroids, probing more cells only grows each query's
    candidate set, so recall is non-decreasing in n_probe."""
    emb = _clustered_embeddings(spark, per_cluster=40, seed=9)
    r2 = _recall_at_k(emb, n_probe=2)
    r4 = _recall_at_k(emb, n_probe=4)
    r16 = _recall_at_k(emb, n_probe=16)
    assert r2 <= r4 <= r16
    # probing every cell IS brute force (same rounded-cosine order)
    assert r16 == 1.0
