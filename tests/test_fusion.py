"""Reciprocal Rank Fusion (operators/fusion.py, Cormack/Clarke/Büttcher
SIGIR 2009) and IVFADC exact re-ranking (pq.ivf_adc_topk_rerank, the "R"
refinement): arithmetic against hand-computed values, determinism of the
tie orders, and the exhaustive-rerank ≡ brute-force theorem the oracle
hashes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import fusion, pq, similarity


def test_rrf_fuse_hand_computed(spark):
    """score(q,d) = Σ 1/(60+rank): doc A ranked 1 and 2 must beat doc B
    ranked 1 in only one list; a doc in one list only gets one term;
    ties break by doc_id ascending."""
    sparse = spark.createDataFrame(
        [("q", 10, 1), ("q", 20, 2), ("q", 30, 3)],
        "query_id string, doc_id long, rank long",
    )
    dense = spark.createDataFrame(
        [("q", 10, 2), ("q", 40, 1)],
        "query_id string, doc_id long, rank long",
    )
    got = {
        r["doc_id"]: (r["rrf_score"], r["fused_rank"])
        for r in fusion.rrf_fuse([sparse, dense], k=10).collect()
    }
    def rr(*ranks):
        return sum(1.0 / (60.0 + r) for r in ranks)
    import math
    def fl9(x):
        return math.floor(x * 1e9 + 0.5) / 1e9
    assert got[10][0] == pytest.approx(fl9(rr(1, 2)), abs=0)
    assert got[40][0] == pytest.approx(fl9(rr(1)), abs=0)
    assert got[20][0] == pytest.approx(fl9(rr(2)), abs=0)
    assert got[30][0] == pytest.approx(fl9(rr(3)), abs=0)
    # doc 10 (two terms) first; 40 and 20 both have one rank-total but
    # 1/(61) > 1/(62); 30 last
    assert [d for d, (_, rk) in sorted(got.items(), key=lambda kv: kv[1][1])] == [
        10, 40, 20, 30
    ]


def test_rrf_fuse_tie_breaks_by_id_and_k_cut(spark):
    """Identical ranks in a single list ⇒ identical scores ⇒ doc_id
    ascending decides; k cuts after ranking."""
    r1 = spark.createDataFrame(
        [("q", d, 1) for d in (7, 3, 5)], "query_id string, doc_id long, rank long"
    )
    rows = fusion.rrf_fuse([r1], k=2).orderBy("fused_rank").collect()
    assert [(r["doc_id"], r["fused_rank"]) for r in rows] == [(3, 1), (5, 2)]
    with pytest.raises(ValueError):
        fusion.rrf_fuse([], k=2)


def test_adc_rerank_orders_by_exact_distance(spark, tmp_path):
    """A lossy-budget index whose ADC ordering is noisy: the re-ranked
    result must order by EXACT L2 (6dp, vec_id tiebreak) over whatever
    the shortlist admitted, and with an exhaustive probe + full-corpus
    shortlist it must EQUAL brute-force L2 top-k exactly (the oracle's
    theorem, asserted here at the operator level)."""
    rng = np.random.default_rng(7)
    D = 16
    centers = rng.normal(scale=5.0, size=(4, D))
    X = np.concatenate([c + rng.normal(scale=0.5, size=(60, D)) for c in centers])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    cent, assigned = similarity.ivf_index(emb, n_centroids=4)
    books = pq.pq_train_residual(emb, assigned, cent, m=4, k=8, iters=5)
    idx = str(tmp_path / "pq_rr")
    pq.pq_write(pq.pq_encode_residual(emb, assigned, cent, books), idx, books, cent)
    queries = [(1000 + qi, [float(x) for x in X[qi * 37]]) for qi in range(3)]

    got = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in pq.ivf_adc_topk_rerank(
            spark, idx, emb, queries, k=5, n_probe=4, shortlist=len(X)
        ).collect()
    )
    want = []
    for qid, qv in queries:
        q = np.array(qv)
        d = np.floor(((X - q) ** 2).sum(1) * 1e6 + 0.5) / 1e6
        order = sorted(range(len(X)), key=lambda i: (d[i], i))[:5]
        want.extend((qid, rk + 1, i) for rk, i in enumerate(order))
    assert got == sorted(want)

    # narrow shortlist: results are a subset of the ADC shortlist,
    # re-ordered by exact distance
    short = {
        (r["query_id"], r["vec_id"])
        for r in pq.ivf_adc_topk_pruned(
            spark, idx, queries, k=8, n_probe=2
        ).collect()
    }
    rr = pq.ivf_adc_topk_rerank(
        spark, idx, emb, queries, k=5, n_probe=2, shortlist=8
    ).collect()
    assert {(r["query_id"], r["vec_id"]) for r in rr} <= short
    by_q: dict = {}
    for r in rr:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["l2_dist"], r["vec_id"]))
    for qid, rows in by_q.items():
        rows.sort()
        dists = [(d, v) for _, d, v in rows]
        assert dists == sorted(dists), (qid, rows)  # exact-distance order


def test_retrieval_metrics_hand_computed(spark):
    """recall/precision/MRR/nDCG against hand arithmetic, including the
    edge queries: one with no relevant docs (all-zero row), one judged
    but never retrieved (recall 0, mrr 0), graded gains (2^rel - 1)."""
    import math

    from pwhl_data_engineering_pipeline_spark.operators import evaluation

    results = spark.createDataFrame(
        # qA: relevant at ranks 1 (rel 2) and 3 (rel 1); rank 2 unjudged
        # qB: nothing relevant retrieved
        [("qA", 1, 1), ("qA", 2, 2), ("qA", 3, 3),
         ("qB", 7, 1), ("qB", 8, 2)],
        "query_id string, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        # qA: three judged docs (one never retrieved)
        # qC: judged but the retriever returned nothing
        [("qA", 1, 2), ("qA", 3, 1), ("qA", 99, 1), ("qC", 5, 1)],
        "query_id string, doc_id long, relevance int",
    )
    got = {
        r["query_id"]: r.asDict()
        for r in evaluation.retrieval_metrics(results, qrels, k=10).collect()
    }

    def fl6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    a = got["qA"]
    assert a["n_retrieved"] == 3 and a["n_relevant"] == 3
    assert a["recall_at_k"] == fl6(2 / 3)
    assert a["precision_at_k"] == fl6(2 / 10)
    assert a["mrr"] == fl6(1.0)
    dcg = (2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(4)
    idcg = (2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(3) + (
        2**1 - 1
    ) / math.log2(4)
    assert a["ndcg_at_k"] == fl6(dcg / idcg)

    b = got["qB"]
    assert b["n_retrieved"] == 2 and b["n_relevant"] == 0
    assert (b["recall_at_k"], b["precision_at_k"], b["mrr"], b["ndcg_at_k"]) == (
        0.0, 0.0, 0.0, 0.0,
    )

    c = got["qC"]
    assert c["n_retrieved"] == 0 and c["n_relevant"] == 1
    assert (c["recall_at_k"], c["mrr"], c["ndcg_at_k"]) == (0.0, 0.0, 0.0)


def test_mmr_rerank_hand_computed(spark):
    """MMR greedy on a 2-D toy set where the arithmetic is checkable by
    hand: q-aligned axis docs vs a near-duplicate. rel scores chosen so
    pure relevance would pick the duplicate second; MMR at λ=0.5 defers
    it for the orthogonal doc."""
    from pwhl_data_engineering_pipeline_spark.operators import diversify

    # doc 1: e_x (rel .9); doc 2: e_x again (rel .8, a duplicate);
    # doc 3: e_y (rel .5, orthogonal)
    cand = spark.createDataFrame(
        [
            ("q", 1, 0.9, [1.0, 0.0]),
            ("q", 2, 0.8, [1.0, 0.0]),
            ("q", 3, 0.5, [0.0, 1.0]),
        ],
        "query_id string, doc_id long, rel_score double, embedding array<double>",
    )
    rows = (
        diversify.mmr_rerank(cand, k=3, lam=0.5)
        .orderBy("rank")
        .collect()
    )
    got = [(r["doc_id"], r["mmr_score"]) for r in rows]
    # step 1: obj = .5*rel -> doc 1 (0.45)
    # step 2: doc 2 = .5*.8 - .5*1 = -0.1 ; doc 3 = .5*.5 - .5*0 = 0.25 -> doc 3
    # step 3: doc 2 = -0.1 (sim to {1,3} max = 1)
    assert got == [(1, 0.45), (3, 0.25), (2, -0.1)], got

    # λ=1 ≡ relevance order (score ties broken by id)
    rel_order = [
        r["doc_id"]
        for r in diversify.mmr_rerank(cand, k=3, lam=1.0).orderBy("rank").collect()
    ]
    assert rel_order == [1, 2, 3]

    # k cut + λ bounds
    assert diversify.mmr_rerank(cand, k=2, lam=0.5).count() == 2
    with pytest.raises(ValueError):
        diversify.mmr_rerank(cand, k=3, lam=1.5)


def test_mmr_rerank_tie_breaks_by_id_and_multiquery(spark):
    """Equal objectives must select ascending ids (the 9dp-floored
    argmax with first-max semantics), independently per query group."""
    from pwhl_data_engineering_pipeline_spark.operators import diversify

    cand = spark.createDataFrame(
        [(q, d, 0.7, [1.0, 0.0]) for q in ("a", "b") for d in (9, 4, 6)],
        "query_id string, doc_id long, rel_score double, embedding array<double>",
    )
    out = diversify.mmr_rerank(cand, k=3, lam=1.0)
    for q in ("a", "b"):
        ids = [
            r["doc_id"]
            for r in out.filter(F.col("query_id") == q).orderBy("rank").collect()
        ]
        assert ids == [4, 6, 9], (q, ids)


def test_retrieval_metrics_grade_zero_qrels_rows(spark):
    """ADVICE r11: TREC-style qrels with EXPLICIT grade-0 (judged
    non-relevant) rows must not inflate n_relevant, deflate recall@k, or
    occupy ideal-DCG window slots — metrics with and without the grade-0
    rows are identical, and a query judged ONLY at grade 0 scores as if
    unjudged."""
    from pwhl_data_engineering_pipeline_spark.operators import evaluation

    results = spark.createDataFrame(
        [("qA", 1, 1), ("qA", 2, 2), ("qZ", 9, 1)],
        "query_id string, doc_id long, rank long",
    )
    positives = [("qA", 1, 2), ("qA", 3, 1)]
    zeros = [("qA", 2, 0), ("qA", 50, 0), ("qZ", 9, 0)]
    schema = "query_id string, doc_id long, relevance int"
    clean = evaluation.retrieval_metrics(
        results, spark.createDataFrame(positives, schema), k=2
    )
    trec = evaluation.retrieval_metrics(
        results, spark.createDataFrame(positives + zeros, schema), k=2
    )
    as_dict = lambda df: {r["query_id"]: r.asDict() for r in df.collect()}
    assert as_dict(clean) == as_dict(trec)
    z = as_dict(trec)["qZ"]
    assert z["n_relevant"] == 0 and z["recall_at_k"] == 0.0
    assert z["ndcg_at_k"] == 0.0 and z["mrr"] == 0.0
