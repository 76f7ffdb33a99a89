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


def test_residual_ivfadc_lossless_and_better_than_plain(spark):
    """Residual IVFADC (the paper's actual architecture): (a) vectors
    constructed as centroid + codeword-concatenation reconstruct
    losslessly, so exhaustive-probe IVFADC must rank EXACTLY like exact
    L2 brute force; (b) on clustered gaussian data, residual encoding at
    the same (m, k) must not lose to plain PQ (the paper's point: the
    codebook spends its bits on within-cell structure)."""
    from pwhl_data_engineering_pipeline_spark.operators import similarity

    # (a) lossless construction around 4 KNOWN well-separated centers:
    # centroids are provided explicitly (ivf_assign), so residuals are
    # exactly the shared grid values, the k=8 codebooks converge to the
    # grid, and reconstruction is lossless by construction
    rng = np.random.default_rng(9)
    # orthogonal centers: ivf_assign routes by COSINE, and random dense
    # centers can alias by angle — orthogonality makes routing exact
    centers = np.zeros((4, D))
    for ci in range(4):
        centers[ci, ci * 4 : ci * 4 + 4] = 50.0
    # dyadic grid values (k/16): center+residual−center is then EXACT in
    # float64, so every cell sees bit-identical residuals and the k=8
    # codebooks can converge to the grid precisely
    grid = rng.integers(-8, 9, size=(M, 8, DSUB)) / 16.0
    rows = []
    for i in range(160):
        c = centers[rng.integers(0, 4)]
        res = np.concatenate([grid[j][rng.integers(0, 8)] for j in range(M)])
        rows.append((i, [float(x) for x in (c + res)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = spark.createDataFrame(
        [(ci + 1, [float(x) for x in centers[ci]]) for ci in range(4)],
        "centroid_id int, centroid_vec array<double>",
    )
    assigned = similarity.ivf_assign(df, cent)
    n_cells = 4
    books = pq.pq_train_residual(df, assigned, cent, m=M, k=8, iters=25)
    rcodes = pq.pq_encode_residual(df, assigned, cent, books)
    X = np.array([v for _, v in rows])
    queries = [(500 + qi, [float(x) for x in X[qi * 31]]) for qi in range(3)]
    got = {
        qid: [r["vec_id"] for r in rs]
        for qid, rs in __import__("itertools").groupby(
            sorted(
                pq.ivf_adc_topk(rcodes, cent, books, queries, k=5, n_probe=n_cells).collect(),
                key=lambda r: (r["query_id"], r["rank"]),
            ),
            key=lambda r: r["query_id"],
        )
    }
    # Lossless ⇔ the refined IVF centers plus residual codebooks span the
    # construction. Lloyd may not land exactly on `centers`, so assert the
    # strong-but-robust form: top-5 sets match exact brute force sets.
    for qi in range(3):
        q = X[qi * 31]
        d = ((X - q) ** 2).sum(1)
        exact5 = set(np.argsort(d, kind="stable")[:5].tolist())
        order5 = sorted(range(len(X)), key=lambda i: (np.floor(d[i] * 1e6 + 0.5) / 1e6, i))[:5]
        assert got[500 + qi] == order5, (qi, got[500 + qi], order5)

    # (b) clustered data: residual recall >= plain recall at same budget
    centers2 = rng.normal(scale=5.0, size=(8, D))
    Y = np.concatenate([c + rng.normal(scale=0.4, size=(40, D)) for c in centers2])
    df2 = spark.createDataFrame(
        [(i, [float(x) for x in Y[i]]) for i in range(len(Y))],
        "vec_id long, embedding array<double>",
    )
    cent2, assigned2 = similarity.ivf_index(df2, n_centroids=8, refine_iterations=2)
    n2 = cent2.count()
    kk = 16
    plain_books = pq.pq_train(df2, m=M, k=kk, iters=10)
    plain_codes = pq.pq_encode(df2, plain_books)
    res_books = pq.pq_train_residual(df2, assigned2, cent2, m=M, k=kk, iters=10)
    res_codes = pq.pq_encode_residual(df2, assigned2, cent2, res_books)
    queries2 = [(800 + qi, [float(x) for x in Y[qi * 37]]) for qi in range(5)]

    def recall(topk_rows):
        by_q: dict = {}
        for r in topk_rows:
            by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        total = 0
        for qi in range(5):
            q = Y[qi * 37]
            exact = set(np.argsort(((Y - q) ** 2).sum(1))[:10].tolist())
            total += len(by_q[800 + qi] & exact)
        return total / 50

    plain = recall(pq.pq_topk(plain_codes, plain_books, queries2, k=10).collect())
    resid = recall(
        pq.ivf_adc_topk(res_codes, cent2, res_books, queries2, k=10, n_probe=n2).collect()
    )
    assert resid >= plain, (resid, plain)
    # absolute level is budget-bound (m=4, k=16 over dim 16); exactness
    # evidence lives in the lossless leg above — this leg pins the
    # residual-vs-plain ORDERING the paper claims, deterministically
    assert resid >= 0.5, resid


def test_persisted_pq_index_prunes_partitions_and_matches_memory(spark, tmp_path):
    """pq_write/ivf_adc_topk_pruned: the probe must (a) return exactly what
    the in-memory IVFADC returns, and (b) reach the parquet scan with a
    centroid_id PARTITION filter — only routed cells are read (the
    build-once-probe-many deployment shape)."""
    from pwhl_data_engineering_pipeline_spark.operators import similarity

    rng = np.random.default_rng(21)
    centers = rng.normal(scale=5.0, size=(6, D))
    X = np.concatenate([c + rng.normal(scale=0.4, size=(30, D)) for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    cent, assigned = similarity.ivf_index(df, n_centroids=6, refine_iterations=1)
    books = pq.pq_train_residual(df, assigned, cent, m=M, k=16, iters=8)
    rcodes = pq.pq_encode_residual(df, assigned, cent, books)
    path = str(tmp_path / "pq_idx")
    pq.pq_write(rcodes, path, books, cent)

    queries = [(700 + qi, [float(x) for x in X[qi * 41]]) for qi in range(3)]
    mem = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in pq.ivf_adc_topk(rcodes, cent, books, queries, k=5, n_probe=2).collect()
    )
    pruned_df = pq.ivf_adc_topk_pruned(spark, path, queries, k=5, n_probe=2)
    got = sorted((r["query_id"], r["rank"], r["vec_id"]) for r in pruned_df.collect())
    assert got == mem

    # round-trip of the meta sidecar
    books2, cent2 = pq.pq_read_meta(spark, path)
    assert (books2 == books).all()
    assert cent2.count() == cent.count()

    # the scan must carry a centroid_id partition filter
    plan = pruned_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan


def test_tie_break_and_empty_queries(spark, grid_corpus):
    """Review findings: (a) local top-k must cut ties by (dist, vec_id) —
    30 identical vectors in one partition must yield the SMALLEST ids,
    not batch-order survivors; (b) an empty query list returns an empty
    frame instead of crashing pd.concat."""
    df, _ = grid_corpus
    books = pq.pq_train(df, m=M, k=K, iters=5)

    same = spark.createDataFrame(
        [(i, [float(x) for x in np.ones(D)]) for i in range(30)],
        "vec_id long, embedding array<double>",
    ).coalesce(1)
    codes = pq.pq_encode(same, books)
    got = [
        r["vec_id"]
        for r in pq.pq_topk(codes, books, [(7, [1.0] * D)], k=5)
        .orderBy("rank")
        .collect()
    ]
    assert got == [0, 1, 2, 3, 4], got

    empty = pq.pq_topk(codes, books, [], k=5)
    assert empty.count() == 0
