"""Rank fusion for hybrid retrieval — combining sparse (BM25) and dense
(ANN) rankings over one corpus into a single result list.

Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009:
"Reciprocal rank fusion outperforms Condorcet and individual rank
learning methods"): ``score(q, d) = Σ_r 1/(k0 + rank_r(q, d))`` over the
rankings ``r`` that retrieved ``d`` for ``q``. RRF is the standard
hybrid combiner because it needs NO score calibration — BM25 scores and
cosine similarities live on incomparable scales, but ranks are ranks —
and the ``k0`` constant (60 in the paper, kept as the default) bounds
any single ranking's dominance.

Engine mapping: each input ranking is a DataFrame of
(query_id, id, rank) — the exact output shape of ``search.bm25_topk``,
``similarity.brute_force_topk`` / ``ivf_topk_pruned``, and
``pq.ivf_adc_topk_rerank`` — so fusion is a unionByName of per-ranking
1/(k0+rank) contributions, one groupBy sum, and a deterministic top-k
window: a single shuffle keyed by (query, id), map-side combinable, no
driver round-trip. At 100 TB the inputs are already k-bounded per query
(each retriever ships ≤ |Q|·k rows), so fusion cost is independent of
corpus size by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import portable_round
from .windows import top_k_per_group


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rank_out: str = "fused_rank",
) -> DataFrame:
    """Fuse ``rankings`` (each with ``query_col``, ``id_col``,
    ``rank_col``) by reciprocal-rank sum; returns
    (query_col, id_col, rrf_score, ``rank_out``) with the top-``k`` per
    query under the deterministic (score desc, id asc) total order.

    ``rrf_score`` is rounded to 9dp with the cross-engine floor formula
    so a SQL oracle lands on identical bytes. Float-sum order: each
    (query, id) receives at most one term per ranking; with two rankings
    the sum is a single IEEE addition (exactly commutative), which is
    the hybrid sparse+dense case the oracle hashes. With 3+ rankings the
    9dp rounding absorbs association-order noise (terms are ≥ 1/(k0 +
    k·rankings) ≈ 1e-3-scale; double-addition error is ~1e-19)."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(query_col),
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col).cast("double"))).alias(
                "__contrib"
            ),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    scored = u.groupBy(query_col, id_col).agg(
        portable_round(F.sum("__contrib"), 9).alias("rrf_score")
    )
    return top_k_per_group(
        scored,
        [query_col],
        [F.desc("rrf_score"), F.asc(id_col)],
        k,
        rank_col=rank_out,
    )
