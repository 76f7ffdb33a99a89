"""Similarity search over embedding columns (north-star surface).

- Brute-force cosine top-k: the exact baseline. Query set × corpus as a
  broadcast nested-loop of the *small* query side against the distributed
  corpus, cosine via JVM array expressions, per-query top-k via window.
  Cost: O(|Q| · N) — correct tool when |Q| is small (evaluation, probing).
- IVF (inverted-file) ANN: corpus is bucketed by nearest centroid; queries
  probe ``n_probe`` nearest centroid buckets only — the scale path. Centroids
  come from a deterministic sample (no MLlib dependency), assignment and
  search are joins + windows, all shuffle-bounded by bucket size.
- Random-hyperplane LSH bucketing for near-dup blocking (cosine flavor).

The IVF structure follows the inverted-file design of Jégou/Douze/Schmid
("Product quantization for nearest neighbor search", TPAMI 2011 — IVF
without the PQ compression stage); random-hyperplane signatures follow
Charikar (STOC 2002).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import portable_round
from ..functions.vectors import cosine, random_hyperplane_signs
from .windows import top_k_per_group


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors. Returns (query_id, vec_id, cos_sim, rank).

    The query side is broadcast (small by contract); the corpus never
    shuffles until the final per-query top-k, which moves only k rows per
    query per partition (window over partial top-k would be the next
    refinement; row_number on (query, -cos) is already partial-agg friendly).
    Ties broken by corpus id for determinism.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(
        F.broadcast(q)
    ).select(
        query_id_col,
        id_col,
        portable_round(cosine(vec_col, "__qvec"), 6).alias("cos_sim"),
    )
    return top_k_per_group(
        scored,
        [query_id_col],
        [F.desc("cos_sim"), F.asc(id_col)],
        k,
        rank_col=rank_col,
    )


def brute_force_topk_arrow(
    corpus: DataFrame,
    query_vectors: list[tuple[int, list[float]]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rank_col: str = "rank",
    return_local: bool = False,
) -> DataFrame:
    """Exact cosine top-k with Arrow pre-reduction — the 100 TB shape.
    ``return_local=True`` returns the pre-merge local-top-k stage (for
    asserting the ≤ partitions × |Q| × k shuffle bound in tests).

    The expression-based :func:`brute_force_topk` shuffles |corpus|×|Q|
    scored rows into the final per-query window. Here each Arrow batch
    computes the full cosine block in numpy (BLAS matmul) and emits only its
    LOCAL top-k per query, so the shuffle carries ≤ partitions × |Q| × k
    rows — independent of corpus size. A final tiny window merges.

    ``query_vectors`` is a driver-side list (queries are small by contract);
    it ships to executors via closure capture, the moral equivalent of a
    broadcast variable.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qids = [int(q) for q, _ in query_vectors]
    qmat = np.array([v for _, v in query_vectors], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def local_topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            norms = np.linalg.norm(mat, axis=1)
            denom = np.outer(qnorm, norms)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (qmat @ mat.T) / denom  # (Q, batch)
            # Round BEFORE local selection so the local order is the exact
            # total order the final merge window uses (cos_sim desc, id asc).
            # Selecting on unrounded scores could locally evict a row that
            # ties at 1e-6 precision but wins the global id tie-break —
            # top-k-of-union == union-of-local-top-k only under one order.
            cos = np.floor(cos * 1e6 + 0.5) / 1e6
            kk = min(k, mat.shape[0])
            rows = []
            for qi in range(len(qids)):
                order = np.lexsort((ids, -cos[qi]))[:kk]
                for ci in order:
                    rows.append((qids[qi], int(ids[ci]), float(cos[qi, ci])))
            yield pd.DataFrame(rows, columns=["query_id", id_col, "cos_sim"])

    scored = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(local_topk, out_schema)
    if return_local:
        return scored
    return top_k_per_group(
        scored, ["query_id"], [F.desc("cos_sim"), F.asc(id_col)], k, rank_col=rank_col
    )


def lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane (cosine) LSH bucket key per row: (id, bucket).
    Rows sharing a bucket are near-dup/ANN candidates; use as the blocking
    stage for dedup_embedding_cosine or a bucketed ANN probe."""
    return df.select(
        F.col(id_col),
        random_hyperplane_signs(vec_col, n_planes, seed).alias("bucket"),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs sharing an LSH bucket (single-pass
    expansion — see dedup.pairs_from_buckets)."""
    from .dedup import pairs_from_buckets

    b = lsh_buckets(df, vec_col, id_col, n_planes, seed)
    return pairs_from_buckets(b, ["bucket"], id_col)


def ivf_index(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    refine_iterations: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Build an IVF index: (centroids, assigned corpus).

    Initial centroids are a deterministic hash-sample of corpus vectors
    (one pass, reproducible). ``refine_iterations`` > 0 runs that many Lloyd
    (k-means) steps — assign, then recenter each cell on its member mean via
    the Arrow partial-mean aggregator (operators.vector_agg) — which
    measurably tightens cells and raises probe recall; each iteration is one
    grouping shuffle of (centroid_id, vector) plus a broadcast. Centroids
    are collected per iteration (n_centroids × dim doubles — driver-tiny).
    Assignment: argmax cosine over broadcast centroids → one narrow pass.
    At 100 TB the assigned corpus would be *written bucketed by centroid_id*
    so probes do partition-pruned scans (see ivf_write/ivf_topk_pruned).
    """
    cent = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("__r", F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), 1_000_000))
        .orderBy("__r")
        .limit(n_centroids)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
    )

    def assign(centroids: DataFrame) -> DataFrame:
        return ivf_assign(corpus, centroids, vec_col=vec_col, id_col=id_col)

    for _ in range(refine_iterations):
        from .vector_agg import vector_mean_arrow

        members = assign(cent).select("centroid_id", vec_col)
        means = vector_mean_arrow(members, ["centroid_id"], vec_col)
        # collect + re-broadcast: empty cells simply drop out (standard Lloyd
        # degeneracy handling; cell count can shrink, never grow)
        rows = means.select("centroid_id", "centroid").collect()
        sess = corpus.sparkSession
        cent = sess.createDataFrame(
            [(int(r["centroid_id"]), [float(x) for x in r["centroid"]]) for r in rows],
            "centroid_id int, centroid_vec array<double>",
        )

    assigned = assign(cent)
    return cent, assigned


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Route each vector to its nearest centroid (argmax cosine over the
    broadcast centroid table) — one narrow pass, no shuffle of the vector
    side beyond the per-id top-1 window. Shared by index build, Lloyd
    refinement, and incremental append."""
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        "*", portable_round(cosine(vec_col, "centroid_vec"), 9).alias("__cs")
    )
    return (
        top_k_per_group(scored, [id_col], [F.desc("__cs"), F.asc("centroid_id")], 1)
        .drop("rn", "__cs", "centroid_vec")
    )


def ivf_append(
    new_vectors: DataFrame,
    index_path: str,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incrementally add vectors to a persisted IVF index: route to the
    EXISTING centroids and append into the centroid_id partition layout —
    new files land only in the touched partitions, nothing is rewritten.
    The build-once-probe-many contract survives ingestion: probes see the
    union immediately with the same partition pruning.

    Centroids deliberately do not move (the FAISS IVF convention): cell
    quality degrades only if the data distribution drifts — rebuild or
    Lloyd-refine offline when recall SLOs say so."""
    assigned = ivf_assign(new_vectors, centroids, vec_col=vec_col, id_col=id_col)
    assigned.write.mode("append").partitionBy("centroid_id").parquet(index_path)


def ivf_write(
    assigned: DataFrame,
    path: str,
    centroids: DataFrame,
    centroids_path: str | None = None,
) -> None:
    """Persist an IVF index with its physical layout: the assigned corpus
    written **partitioned by centroid_id**, so a probe that filters on the
    routed centroid ids scans only those directories (partition pruning —
    the on-disk analogue of an inverted file). At 100 TB this is the
    difference between touching n_probe/n_centroids of the data and all of
    it."""
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)
    if centroids_path:
        centroids.write.mode("overwrite").parquet(centroids_path)


def ivf_topk_pruned(
    spark,
    index_path: str,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe a persisted IVF index: route queries → centroid ids, then scan
    ONLY the matching partitions (the probe-id join key is a partition
    column, so Catalyst turns it into PartitionFilters via dynamic partition
    pruning / an IN-filter on the routed ids)."""
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
    routed = q.crossJoin(F.broadcast(centroids)).select(
        query_id_col,
        "__qvec",
        "centroid_id",
        portable_round(cosine("__qvec", "centroid_vec"), 9).alias("__cs"),
    )
    probes = top_k_per_group(
        routed, [query_id_col], [F.desc("__cs"), F.asc("centroid_id")], n_probe
    ).select(query_id_col, "__qvec", "centroid_id")

    probe_ids = [r["centroid_id"] for r in probes.select("centroid_id").distinct().collect()]
    index = spark.read.parquet(index_path).filter(F.col("centroid_id").isin(probe_ids))
    scored = index.join(F.broadcast(probes), "centroid_id").select(
        query_id_col,
        id_col,
        portable_round(cosine(vec_col, "__qvec"), 6).alias("cos_sim"),
    )
    return top_k_per_group(
        scored, [query_id_col], [F.desc("cos_sim"), F.asc(id_col)], k, rank_col="rank"
    )


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe-style ANN: route each query to its ``n_probe`` nearest centroids,
    scan only those buckets, take per-query top-k. Approximate (recall < 1
    when the true neighbor lives outside probed buckets) but the scan cost
    drops by ~n_centroids/n_probe versus brute force."""
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
    routed = (
        q.crossJoin(F.broadcast(centroids))
        .select(query_id_col, "__qvec", "centroid_id", portable_round(cosine("__qvec", "centroid_vec"), 9).alias("__cs"))
    )
    probes = top_k_per_group(
        routed, [query_id_col], [F.desc("__cs"), F.asc("centroid_id")], n_probe
    ).select(query_id_col, "__qvec", "centroid_id")
    scored = assigned.join(F.broadcast(probes), "centroid_id").select(
        query_id_col,
        id_col,
        portable_round(cosine(vec_col, "__qvec"), 6).alias("cos_sim"),
    )
    return top_k_per_group(
        scored, [query_id_col], [F.desc("cos_sim"), F.asc(id_col)], k, rank_col="rank"
    )


def hard_negatives(
    corpus: DataFrame,
    query_vecs: list[tuple],
    positives: DataFrame,
    k: int = 5,
    fetch_k: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training: for each
    query, the ``k`` highest-cosine corpus items that are NOT in its
    positive set — the standard contrastive-training negative sampler
    (in-batch negatives are easy; the informative ones are the near-misses
    an ANN/brute-force pass surfaces).

    ``positives``: (query_id, pos_id) — include the query's own id if
    self-matches must be excluded. Built on the Arrow pre-reduced top-k
    (shuffle ≤ partitions × |Q| × fetch_k), then an anti-join drops
    positives and a per-query re-rank keeps ``k``. ``fetch_k`` (default
    ``k + 8``) is the headroom: if a query has more than ``fetch_k - k``
    positives inside its top-``fetch_k``, fewer than ``k`` negatives come
    back — size it to the max positives per query.

    Output: (query_id, vec_id, cos_sim, neg_rank 1..k), deterministic
    (scores rounded before ranking upstream; (cos desc, id) tiebreak).
    """
    from pyspark.sql import Window

    fetch_k = fetch_k if fetch_k is not None else k + 8
    topk = brute_force_topk_arrow(
        corpus, query_vecs, k=fetch_k, vec_col=vec_col, id_col=id_col,
        rank_col="knn_rank",
    )
    pos = positives.select(
        F.col("query_id"), F.col("pos_id").alias(id_col)
    )
    negs = topk.join(pos, ["query_id", id_col], "left_anti")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        negs.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select("query_id", id_col, "cos_sim", "neg_rank")
    )
