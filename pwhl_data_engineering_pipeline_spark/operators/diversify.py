"""Result diversification — Maximal Marginal Relevance (Carbonell &
Goldstein, SIGIR 1998: "The use of MMR, diversity-based reranking for
reordering documents and producing summaries").

MMR greedily re-orders a retriever's shortlist to trade relevance
against redundancy: at each step pick

    argmax_{d ∉ S}  λ·rel(d) − (1−λ)·max_{s ∈ S} sim(d, s)

λ=1 is pure relevance order; λ=0 pure novelty. The standard last stage
of a retrieval pipeline feeding an LLM context window, where near-
duplicate passages waste tokens.

Engine mapping — the documented RIGHT place for a Python kernel: the
greedy loop is inherently sequential PER QUERY (each pick changes the
next step's objective), which no relational operator expresses, but
every query's candidate set is shortlist-bounded (≤ fetch_k rows) by
the retriever's contract. So: ``groupBy(query).applyInPandas`` with a
vectorized numpy kernel per group — O(k·n) cosine updates on an (n, d)
matrix per query, never a corpus-sized operation, and the shuffle is
the already-k-bounded candidate frame keyed by query. At 100 TB the
cost is |Q| × shortlist, independent of corpus size.

Determinism: the objective is floor-rounded to 9dp before argmax and
ties break on ascending id, so selection order is a pure function of
the input rows (the same total-order discipline as every top-k here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "rel_score",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy MMR selection of ``k`` results per query from
    ``candidates`` (``query_col``, ``id_col``, ``score_col``,
    ``vec_col``); similarity is cosine over ``vec_col``. Returns
    (query_col, id_col, mmr_score, rank) where ``mmr_score`` is the
    9dp-floored objective value at selection time (rank 1's score is
    λ·rel — the empty-set objective) and rank is the selection order.

    ``rel_score`` scale matters to the λ trade-off — normalize
    retriever scores (or use 1/rank) upstream; MMR is scale-aware by
    definition, unlike RRF."""
    import numpy as np
    import pandas as pd

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    in_fields = {f.name: f for f in candidates.schema.fields}
    out_schema = T.StructType(
        [
            in_fields[query_col],
            in_fields[id_col],
            T.StructField("mmr_score", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    lam_ = float(lam)
    k_ = int(k)

    def _select(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic input order: by id (argmax ties then fall to the
        # smallest id because np.argmax takes the first maximum)
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        Vn = V / np.maximum(norms, 1e-12)[:, None]
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        simmax = np.zeros(n)
        alive = np.ones(n, dtype=bool)
        picks: list[int] = []
        scores: list[float] = []
        for _ in range(min(k_, n)):
            obj = lam_ * rel - (1.0 - lam_) * simmax
            obj = np.floor(obj * 1e9 + 0.5) / 1e9
            obj[~alive] = -np.inf
            p = int(np.argmax(obj))
            picks.append(p)
            scores.append(float(obj[p]))
            alive[p] = False
            simmax = np.maximum(simmax, Vn @ Vn[p])
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[picks].values,
                id_col: pdf[id_col].iloc[picks].values,
                "mmr_score": scores,
                "rank": np.arange(1, len(picks) + 1, dtype=np.int32),
            }
        )

    return (
        candidates.select(query_col, id_col, score_col, vec_col)
        .groupBy(query_col)
        .applyInPandas(_select, schema=out_schema)
    )
