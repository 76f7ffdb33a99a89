"""Product quantization (operators.pq, Jégou et al. 2011): codebook
determinism, lossless-reconstruction exactness vs brute force, recall on
clustered data, and the 32x compression arithmetic."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import pq

D, M, K = 16, 4, 8
DSUB = D // M


@pytest.fixture(scope="module")
def grid_corpus(spark):
    """Vectors that ARE concatenations of a small per-subspace value grid —
    PQ reconstructs them losslessly, so ADC == exact distance."""
    rng = np.random.default_rng(3)
    grid = rng.normal(size=(M, K, DSUB)).round(1)  # the "true" codebooks
    rows = []
    for i in range(120):
        vec = np.concatenate([grid[j][rng.integers(0, K)] for j in range(M)])
        rows.append((i, [float(x) for x in vec]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, rows


def test_train_is_deterministic(spark, grid_corpus):
    df, _ = grid_corpus
    a = pq.pq_train(df, m=M, k=K, iters=5)
    b = pq.pq_train(df, m=M, k=K, iters=5)
    assert a.shape == (M, K, DSUB)
    assert (a == b).all()


def test_lossless_grid_topk_equals_brute_force(spark, grid_corpus):
    """On grid vectors the codebooks converge to the grid itself, encoding
    is lossless, and ADC top-k must EQUAL the exact L2 top-k — a
    deterministic end-to-end check with no recall tolerance."""
    df, rows = grid_corpus
    books = pq.pq_train(df, m=M, k=K, iters=20)
    codes = pq.pq_encode(df, books)
    X = np.array([v for _, v in rows])
    # encoding must be lossless: reconstruction == original
    got_codes = {r["vec_id"]: r["codes"] for r in codes.collect()}
    for i, v in rows:
        rec = np.concatenate([books[j][got_codes[i][j]] for j in range(M)])
        assert np.abs(rec - np.array(v)).max() < 1e-9, i
    queries = [(100 + qi, [float(x) for x in X[qi]]) for qi in range(3)]
    topk = pq.pq_topk(codes, books, queries, k=5)
    got = {
        qid: [r["vec_id"] for r in rs]
        for qid, rs in __import__("itertools").groupby(
            sorted(topk.collect(), key=lambda r: (r["query_id"], r["rank"])),
            key=lambda r: r["query_id"],
        )
    }
    for qi in range(3):
        q = X[qi]
        d = ((X - q) ** 2).sum(1)
        d6 = np.floor(d * 1e6 + 0.5) / 1e6
        order = sorted(range(len(X)), key=lambda i: (d6[i], i))[:5]
        assert got[100 + qi] == order, qi


def test_recall_on_clustered_data(spark):
    """Realistic lossy case: gaussian clusters, m=4/k=128 over dim 16 —
    ADC top-10 must overlap the exact top-10 strongly (fixed rng, so the
    floor is deterministic; measured per-query recalls 0.6-0.9 — the
    published regime where PQ shortlists and exact re-ranking refines)."""
    rng = np.random.default_rng(11)
    centers = rng.normal(scale=5.0, size=(8, D))
    X = np.concatenate([c + rng.normal(scale=0.4, size=(40, D)) for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    books = pq.pq_train(df, m=M, k=128, iters=10)
    codes = pq.pq_encode(df, books)
    queries = [(1000 + qi, [float(x) for x in X[qi * 37]]) for qi in range(5)]
    topk = pq.pq_topk(codes, books, queries, k=10).collect()
    by_q: dict = {}
    for r in topk:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = []
    for qi in range(5):
        q = X[qi * 37]
        exact = set(np.argsort(((X - q) ** 2).sum(1))[:10].tolist())
        recalls.append(len(by_q[1000 + qi] & exact) / 10)
    assert min(recalls) >= 0.6 and sum(recalls) / len(recalls) >= 0.7, recalls


def test_compression_arithmetic_and_bad_dims(spark, grid_corpus):
    df, _ = grid_corpus
    books = pq.pq_train(df, m=M, k=K, iters=2)
    codes = pq.pq_encode(df, books)
    row = codes.first()
    assert len(row["codes"]) == M  # m codes per vector vs D floats
    with pytest.raises(ValueError):
        pq.pq_train(df, m=5, k=K)  # 16 % 5 != 0


def test_ivf_pq_exhaustive_probe_equals_flat_pq(spark):
    """IVF-PQ with n_probe = all cells must EQUAL flat PQ search exactly
    (the same exhaustive-equality theorem the IVF query uses), and with a
    narrow probe it returns k results per query from the probed scope."""
    from pwhl_data_engineering_pipeline_spark.operators import similarity

    rng = np.random.default_rng(5)
    centers = rng.normal(scale=5.0, size=(6, D))
    X = np.concatenate([c + rng.normal(scale=0.5, size=(50, D)) for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    books = pq.pq_train(df, m=M, k=64, iters=8)
    codes = pq.pq_encode(df, books)
    cent, assigned = similarity.ivf_index(df, n_centroids=6, refine_iterations=1)
    n_cells = cent.count()
    queries = [(900 + qi, [float(x) for x in X[qi * 29]]) for qi in range(4)]

    flat = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in pq.pq_topk(codes, books, queries, k=8).collect()
    )
    full_probe = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in pq.ivf_pq_topk(
            codes, assigned, cent, books, queries, k=8, n_probe=n_cells
        ).collect()
    )
    assert flat == full_probe

    narrow = pq.ivf_pq_topk(codes, assigned, cent, books, queries, k=8, n_probe=2)
    per_q = {r["query_id"] for r in narrow.collect()}
    assert per_q == {900, 901, 902, 903}
    counts = narrow.groupBy("query_id").count().collect()
    assert all(r["count"] == 8 for r in counts)
