"""Retrieval evaluation — IR quality metrics computed in-engine over a
ranking frame and a relevance-judgment (qrels) frame.

The missing piece of the retrieval stack: the engine ships sparse
(BM25 + champions), dense (brute force / IVF / IVFADC / re-rank) and
hybrid (RRF) retrievers, and a 100 TB deployment tunes them by MEASURED
quality on held-out judgments, not vibes. Standard TREC-style metrics
(Manning/Raghavan/Schütze, "Introduction to Information Retrieval" §8):

- recall@k, precision@k — set overlap of the top-k with the judged-
  relevant set;
- MRR — 1 / rank of the first relevant result (0 when none);
- nDCG@k — graded: DCG = Σ (2^rel − 1) / log2(rank + 1) over the
  ranking, normalized by the ideal DCG of the query's best-possible
  top-k (qrels sorted by grade).

Engine mapping: one equi-join of the k-bounded ranking against qrels,
two per-query aggregates (observed DCG legs and the ideal-DCG window
over qrels), and a final join — every stage keyed by query_id, map-side
combinable, no driver round-trips. Inputs are ≤ |Q|·k and |qrels| rows,
so cost is independent of corpus size: evaluation is cheap enough to
run per index-maintenance cycle (the drift studies in SCALING.md are
exactly this loop, hand-rolled).

Cross-engine determinism: metrics are floor-rounded to 6dp
(``portable_round``). log2 is computed as ``ln(x)/ln(2)`` — JVM and
DuckDB ``ln`` may differ in the last ulp, but the 1e-6 grid leaves ~9
guard digits over that, the same tolerance argument every cosine/BM25
mirror in this repo already rests on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import portable_round


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "relevance",
) -> DataFrame:
    """Per-query metrics of ``results`` (``query_col``, ``id_col``,
    ``rank_col``; ranks 1-based, one row per retrieved doc) against
    ``qrels`` (``query_col``, ``id_col``, ``rel_col`` integer grades
    ≥ 1 — unjudged docs are grade 0 by omission). TREC-style qrels that
    carry EXPLICIT grade-0 rows (judged non-relevant) are handled: rows
    with ``rel_col <= 0`` are dropped up front, so they neither inflate
    ``n_relevant`` / deflate recall@k nor occupy ideal-DCG window slots
    (ADVICE r11 — previously the grades≥1 precondition was documented
    but unenforced). Grade-0 rows contribute nothing to the observed
    legs either way (their joined gain is 0, identical to the unjudged
    coalesce), so the filter changes exactly the two totals it should.
    Returns one row per query present in EITHER frame:
    (query_id, n_retrieved, n_relevant, recall_at_k, precision_at_k,
    mrr, ndcg_at_k), floats floored to 6dp. A query with no judged
    docs scores 0 across the board (nothing to find); a judged query
    the retriever returned nothing for likewise."""
    topk = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col), F.col(id_col), F.col(rank_col).cast("double").alias("__rank")
    )
    rels = qrels.select(
        F.col(query_col), F.col(id_col), F.col(rel_col).cast("double").alias("__rel")
    ).filter(F.col("__rel") > 0)
    ln2 = 0.6931471805599453
    gain = (F.pow(F.lit(2.0), F.col("__rel")) - F.lit(1.0))
    joined = topk.join(rels, [query_col, id_col], "left").withColumn(
        "__rel", F.coalesce("__rel", F.lit(0.0))
    )
    observed = joined.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_retrieved"),
        F.sum(F.when(F.col("__rel") > 0, 1).otherwise(0)).alias("__hits"),
        F.min(F.when(F.col("__rel") > 0, F.col("__rank"))).alias("__first_rel"),
        F.sum(gain / (F.log(F.col("__rank") + 1.0) / F.lit(ln2))).alias("__dcg"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("__rel").desc(), F.col(id_col).asc()
    )
    ideal = (
        rels.withColumn("__irank", F.row_number().over(w).cast("double"))
        .filter(F.col("__irank") <= k)
        .groupBy(query_col)
        .agg(
            F.sum(gain / (F.log(F.col("__irank") + 1.0) / F.lit(ln2))).alias("__idcg"),
        )
    )
    totals = rels.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_relevant"))
    out = (
        observed.join(ideal, query_col, "full")
        .join(totals, query_col, "full")
        .select(
            query_col,
            F.coalesce("n_retrieved", F.lit(0)).alias("n_retrieved"),
            F.coalesce("n_relevant", F.lit(0)).alias("n_relevant"),
            portable_round(
                F.when(
                    F.coalesce(F.col("n_relevant"), F.lit(0)) > 0,
                    F.coalesce(F.col("__hits"), F.lit(0))
                    / F.col("n_relevant").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("recall_at_k"),
            portable_round(
                F.coalesce(F.col("__hits"), F.lit(0)) / F.lit(float(k)), 6
            ).alias("precision_at_k"),
            portable_round(
                F.coalesce(F.lit(1.0) / F.col("__first_rel"), F.lit(0.0)), 6
            ).alias("mrr"),
            portable_round(
                F.when(
                    F.coalesce(F.col("__idcg"), F.lit(0.0)) > 0,
                    F.coalesce(F.col("__dcg"), F.lit(0.0)) / F.col("__idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg_at_k"),
        )
    )
    return out
