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


def _ivf_read_manifest(spark, path: str) -> dict | None:
    """Committed-batches manifest of a persisted IVF index (the same
    versioned ``_scalars/`` layout and commit machinery as the BM25
    index — shared primitives from operators.search); None for a LEGACY
    index written before batch stamping (probe everything, append
    refuses)."""
    from .search import _read_scalars

    try:
        return _read_scalars(spark, path)
    except FileNotFoundError:
        return None


def _ivf_batch_dirs(spark, path: str) -> dict[str, float]:
    """Newest mtime (epoch ms) per on-disk batch id across the index's
    ``centroid_id=*/batch=*`` directories — metadata-only listings."""
    from ..fsutil import list_status

    newest: dict[str, float] = {}
    for c in list_status(spark, path):
        if not (c["is_dir"] and c["name"].startswith("centroid_id=")):
            continue
        for b in list_status(spark, f"{path}/{c['name']}"):
            if b["is_dir"] and b["name"].startswith("batch="):
                bid = b["name"][len("batch="):]
                newest[bid] = max(newest.get(bid, 0.0), b["mtime_ms"])
    return newest


def _ivf_purge_batch(spark, path: str, batch_id: str) -> int:
    """Delete every ``batch=<batch_id>`` directory under the index's
    centroid partitions; returns the number removed."""
    from ..fsutil import delete, list_names

    n = 0
    for c in list_names(spark, path):
        if c.startswith("centroid_id=") and delete(
            spark, f"{path}/{c}/batch={batch_id}", recursive=True
        ):
            n += 1
    return n


def ivf_append(
    new_vectors: DataFrame,
    index_path: str,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    batch_id: str | None = None,
) -> dict:
    """Incrementally add vectors to a persisted IVF index: route to the
    EXISTING centroids and append into the centroid_id partition layout —
    new files land only in the touched partitions, nothing is rewritten.
    The build-once-probe-many contract survives ingestion: probes see the
    union as soon as the batch COMMITS, with the same partition pruning.

    Crash consistency (r10 — the same batch-visibility switch as
    ``bm25_index_append``, which this previously lacked: a bare parquet
    append that died mid-write left half-landed files VISIBLE to every
    probe, a torn index with no repair path): rows land under a second
    partition level ``batch=<batch_id>``, probes read only batches the
    committed manifest lists, and the manifest version-commit (atomic
    rename) is the one visibility switch. A crash anywhere before the
    commit leaves invisible files; re-appending the SAME batch id purges
    its leftovers and rewrites (idempotent repair); a re-append of an
    already-committed id is a metadata no-op; losing a manifest version
    race to a concurrent appender retries once from the fresh manifest
    (the rows are already on disk and visibility is additive).
    ``ivf_index_repair`` reclaims crashed appends' orphans age-gated.

    Assumes batch vec_ids are disjoint from the indexed corpus (the same
    contract as every incremental index here). Centroids deliberately do
    not move (the FAISS IVF convention): cell quality degrades only if
    the data distribution drifts — rebuild or Lloyd-refine offline when
    recall SLOs say so.

    Raises RuntimeError on a legacy (pre-stamping) index — rebuild with
    :func:`ivf_write` to enable appends. Returns {"n_vectors_added",
    "version", "batch_id", "skipped"}.
    """
    import uuid as _uuid

    from .search import _check_batch_id, _commit_scalars, _read_scalars

    spark = new_vectors.sparkSession
    meta = _ivf_read_manifest(spark, index_path)
    if meta is None:
        raise RuntimeError(
            f"IVF index at {index_path} predates batch stamping (flat "
            "layout) — rebuild with ivf_write before appending"
        )
    if batch_id is None:
        batch_id = "b" + _uuid.uuid4().hex
    _check_batch_id(batch_id)
    if batch_id in (meta.get("batches") or []):
        return {
            "n_vectors_added": 0,
            "version": meta["_version"],
            "batch_id": batch_id,
            "skipped": True,
        }
    _ivf_purge_batch(spark, index_path, batch_id)  # crashed-attempt leftovers
    assigned = ivf_assign(new_vectors, centroids, vec_col=vec_col, id_col=id_col)
    assigned.withColumn("batch", F.lit(batch_id)).write.mode("append").partitionBy(
        "centroid_id", "batch"
    ).parquet(index_path)
    n_added = (
        spark.read.parquet(index_path).filter(F.col("batch") == batch_id).count()
    )
    if n_added > 0 and batch_id not in _ivf_batch_dirs(spark, index_path):
        raise IOError(
            f"ivf_append: batch={batch_id} directories at {index_path} were "
            "reclaimed before the manifest commit (concurrent repair with an "
            "undersized age gate?) — aborting; re-append the batch"
        )

    def _meta_with(base: dict) -> dict:
        return {"batches": [*(base.get("batches") or []), batch_id]}

    try:
        version = _commit_scalars(
            spark, index_path, _meta_with(meta), parent_version=meta["_version"]
        )
    except IOError:
        fresh = _read_scalars(spark, index_path)
        if batch_id in (fresh.get("batches") or []):
            return {
                "n_vectors_added": 0,
                "version": fresh["_version"],
                "batch_id": batch_id,
                "skipped": True,
            }
        # re-verify before the retry commit (ADVICE r10 low, mirroring
        # bm25_index_append): a concurrent ivf_index_repair with an
        # undersized age gate may have purged the still-uncommitted
        # young batch between the first verification and this retry —
        # committing a manifest for deleted files would silently drop
        # the batch from every probe
        if n_added > 0 and batch_id not in _ivf_batch_dirs(spark, index_path):
            raise IOError(
                f"ivf_append: batch={batch_id} directories at {index_path} "
                "were reclaimed before the manifest retry commit "
                "(concurrent repair with an undersized age gate?) — "
                "aborting; re-append the batch"
            )
        version = _commit_scalars(
            spark, index_path, _meta_with(fresh), parent_version=fresh["_version"]
        )
    return {
        "n_vectors_added": int(n_added),
        "version": version,
        "batch_id": batch_id,
        "skipped": False,
    }


def ivf_write(
    assigned: DataFrame,
    path: str,
    centroids: DataFrame,
    centroids_path: str | None = None,
    batch_id: str = "base",
) -> None:
    """Persist an IVF index with its physical layout: the assigned corpus
    written **partitioned by centroid_id**, so a probe that filters on the
    routed centroid ids scans only those directories (partition pruning —
    the on-disk analogue of an inverted file). At 100 TB this is the
    difference between touching n_probe/n_centroids of the data and all of
    it.

    r10: rows additionally partition by ``batch=<batch_id>`` with a
    committed-batches manifest (versioned atomic-rename commits — the
    BM25 pattern), which is what makes :func:`ivf_append` crash-
    consistent and :func:`ivf_index_repair` possible. Rebuild-over-
    existing deletes the old tree first and pins static partition
    overwrite (a session-global ``partitionOverwriteMode=dynamic`` must
    not leave stale committed-visible partitions), so a rebuild that
    crashes mid-write leaves a LOUD manifest-less index, never a silent
    mix of two corpora."""
    from ..fsutil import delete
    from .search import _check_batch_id, _commit_scalars

    _check_batch_id(batch_id)
    spark = assigned.sparkSession
    delete(spark, path, recursive=True)  # old data + old manifest lineage
    assigned.withColumn("batch", F.lit(batch_id)).write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("centroid_id", "batch").parquet(path)
    _commit_scalars(spark, path, {"batches": [batch_id]}, parent_version=0)
    if centroids_path:
        centroids.write.mode("overwrite").parquet(centroids_path)


def ivf_index_repair(
    spark, path: str, min_age_seconds: float | None = None
) -> dict:
    """Reclaim storage of IVF batch directories that are NOT in the
    committed manifest (crashed appends), once they are older than the
    age gate — young uncommitted directories are indistinguishable from
    an IN-FLIGHT append's files, so the gate (default: the shared
    ``search.DEFAULT_RECLAIM_MIN_AGE``) defers them exactly as
    ``bm25_index_repair`` does. Probes never see orphans (they filter to
    committed batches), so this is storage reclamation, not a
    correctness fix. Returns {"purged_batches", "deferred_batches"}."""
    import time as _time

    from .search import DEFAULT_RECLAIM_MIN_AGE

    if min_age_seconds is None:
        min_age_seconds = DEFAULT_RECLAIM_MIN_AGE
    meta = _ivf_read_manifest(spark, path)
    if meta is None:
        raise RuntimeError(
            f"IVF index at {path} predates batch stamping — rebuild with "
            "ivf_write to enable append repair"
        )
    committed = set(meta.get("batches") or [])
    now = _time.time()
    purged, deferred = [], []
    for b, mtime_ms in sorted(_ivf_batch_dirs(spark, path).items()):
        if b in committed:
            continue
        if now - mtime_ms / 1000.0 >= min_age_seconds:
            _ivf_purge_batch(spark, path, b)
            purged.append(b)
        else:
            deferred.append(b)
    return {"purged_batches": purged, "deferred_batches": deferred}


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
    pruning / an IN-filter on the routed ids). On a batch-stamped index
    (r10 ``ivf_write``) the scan additionally filters to COMMITTED batches
    — also a partition column, so a crashed ``ivf_append``'s half-landed
    files are invisible at directory level; a legacy flat index probes
    everything as before."""
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
    meta = _ivf_read_manifest(spark, index_path)
    if meta is not None:
        index = index.filter(F.col("batch").isin(meta.get("batches") or []))
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
