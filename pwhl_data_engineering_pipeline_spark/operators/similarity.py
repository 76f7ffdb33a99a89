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
from ..sources.readers import local_frame

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
    allowed_ids: DataFrame | None = None,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors. Returns (query_id, vec_id, cos_sim, rank).

    The query side is broadcast (small by contract); the corpus never
    shuffles until the final per-query top-k, which moves only k rows per
    query per partition (window over partial top-k would be the next
    refinement; row_number on (query, -cos) is already partial-agg friendly).
    Ties broken by corpus id for determinism.

    ``allowed_ids`` (r12, filtered search): restrict candidates to an
    id allow-list shared by the whole query batch — one equi-keyed
    semi-join before scoring (exact under any selectivity, since brute
    force scans everything anyway). Per-query filters are expressed by
    batching queries per filter set.
    """
    if allowed_ids is not None:
        corpus = corpus.join(
            allowed_ids.select(F.col(id_col)).distinct(), id_col, "left_semi"
        )
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


def _train_centroids(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    refine_iterations: int = 0,
) -> DataFrame:
    """Deterministic centroid training over ``corpus`` — shared by the
    initial :func:`ivf_index` build and :func:`ivf_recompact` (which
    retrains over the committed index, so recompact-of-a-corpus and
    build-over-the-same-corpus produce IDENTICAL centroids by
    construction — tested). Seeds are a hash-ordered sample of corpus
    vectors; ``refine_iterations`` Lloyd steps recenter each cell on its
    member mean via the Arrow partial-mean aggregator. Per-iteration
    collect is n_centroids × dim doubles — driver-tiny."""
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
        cent = local_frame(sess, 
            [(int(r["centroid_id"]), [float(x) for x in r["centroid"]]) for r in rows],
            "centroid_id int, centroid_vec array<double>",
        )
    return cent


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
    grouping shuffle of (centroid_id, vector) plus a broadcast.
    Assignment: argmax cosine over broadcast centroids → one narrow pass.
    At 100 TB the assigned corpus would be *written bucketed by centroid_id*
    so probes do partition-pruned scans (see ivf_write/ivf_topk_pruned).
    """
    cent = _train_centroids(
        corpus, n_centroids, vec_col, id_col, seed, refine_iterations
    )
    assigned = ivf_assign(corpus, cent, vec_col=vec_col, id_col=id_col)
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


def ivf_load_centroids(spark, index_path: str) -> DataFrame:
    """The committed centroid table of a persisted IVF index —
    ``{index_path}/_centroids/<id>`` for the id the manifest's
    ``centroids`` key names. Centroids became INDEX-RESIDENT and
    versioned in r11 (VERDICT r10 #1): :func:`ivf_recompact` retrains
    and flips them atomically with the data batches, so a prober or
    appender holding a stale driver-side centroid DataFrame would
    silently route against the wrong cells — loading them from the
    manifest is what keeps routing and layout consistent by
    construction. Raises on a pre-r11 index (no resident centroids):
    pass explicit centroids there, as before."""
    meta = _ivf_read_manifest(spark, index_path)
    if meta is None or not meta.get("centroids"):
        raise RuntimeError(
            f"IVF index at {index_path} has no resident centroids "
            "(pre-r11 layout) — pass the centroids DataFrame explicitly, "
            "or rebuild with ivf_write to enable recompaction"
        )
    return spark.read.parquet(f"{index_path}/_centroids/{meta['centroids']}")


def _ivf_mean_assign_dist(
    spark,
    index_path: str,
    centroids: DataFrame,
    batches: list[str],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int = 16,
    exclude_ids: DataFrame | None = None,
) -> float:
    """Mean angular distance (1 − cosine) of indexed vectors to their
    ASSIGNED centroid, over a deterministic 1/``sample_mod`` hash-sample
    of the committed rows (falls back to all rows when the sample is
    empty — tiny indexes). This is the cell-tightness statistic the
    drift probe compares against the build-time baseline: appends route
    by frozen centroids, so a shifted ingest distribution shows up as a
    rising mean assign-distance long before recall SLOs notice. One
    bounded scan, one-row collect."""
    rows = spark.read.parquet(index_path)
    if batches:
        rows = rows.filter(F.col("batch").isin(batches))
    if exclude_ids is not None:
        # mask pending tombstones (ADVICE r11): after large deletions the
        # drift ratio must be computed over LIVE rows only, matching the
        # probe-time masking — dead rows would otherwise mis-schedule
        # recompaction in either direction
        rows = rows.join(
            exclude_ids.select(F.col(id_col)).distinct(), id_col, "left_anti"
        )
    sampled = rows.filter(
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(sample_mod)) == 0
    )
    cent = F.broadcast(centroids.select("centroid_id", "centroid_vec"))

    def mean_dist(df: DataFrame):
        r = (
            df.join(cent, "centroid_id")
            .select((F.lit(1.0) - cosine(vec_col, "centroid_vec")).alias("d"))
            .agg(F.avg("d").alias("d"))
            .first()
        )
        return r["d"]

    d = mean_dist(sampled)
    if d is None:
        d = mean_dist(rows)
    return float(d if d is not None else 0.0)


def ivf_append(
    new_vectors: DataFrame,
    index_path: str,
    centroids: DataFrame | None = None,
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
    contract as every incremental index here). An append never moves
    centroids (the FAISS IVF convention), so cell quality degrades under
    ingest-distribution drift — :func:`ivf_needs_recompact` measures it
    and :func:`ivf_recompact` repairs it (VERDICT r10 #1). ``centroids``
    defaults to the index-RESIDENT committed set
    (:func:`ivf_load_centroids`) — pass them explicitly only for
    pre-r11 indexes without resident centroids; a stale explicit set
    routes new rows against cells the committed probe no longer uses.
    If a recompaction flips the centroid set mid-append, the version-
    race retry detects the flip and aborts LOUDLY (the landed rows were
    routed with the outgoing centroids) — re-append the batch.

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
    if centroids is None:
        centroids = ivf_load_centroids(spark, index_path)
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
        # carry every manifest key (centroids id, drift baseline, retired
        # stamps) — an append only extends the committed-batches list
        m = {k: v for k, v in base.items() if k != "_version"}
        m["batches"] = [*(base.get("batches") or []), batch_id]
        m["batch_counts"] = {
            **(base.get("batch_counts") or {}),
            batch_id: int(n_added),
        }
        return m

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
        if fresh.get("centroids") != meta.get("centroids"):
            raise RuntimeError(
                f"ivf_append: the centroid set at {index_path} was "
                "recompacted while this append was in flight — the landed "
                f"batch={batch_id} rows were routed with the OUTGOING "
                "centroids and would sit in cells the committed probe no "
                "longer routes to; aborting the commit (the rows are "
                "invisible orphans, repair reclaims them) — re-append the "
                "batch"
            )
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
    mix of two corpora.

    r11 (VERDICT r10 #1): the centroids become INDEX-RESIDENT at
    ``{path}/_centroids/<batch_id>`` with the manifest's ``centroids``
    key naming the committed set, and the manifest stores the
    build-time ``assign_dist_baseline`` (mean 1−cos of a hash-sample to
    its assigned centroid) — the yardstick :func:`ivf_needs_recompact`
    measures drift against and :func:`ivf_recompact` resets. Probes and
    appends default to the resident set, so a recompaction's new
    centroids are picked up automatically."""
    from ..fsutil import delete
    from .search import _check_batch_id, _commit_scalars

    _check_batch_id(batch_id)
    spark = assigned.sparkSession
    delete(spark, path, recursive=True)  # old data + old manifest lineage
    assigned.withColumn("batch", F.lit(batch_id)).write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("centroid_id", "batch").parquet(path)
    centroids.write.mode("overwrite").parquet(f"{path}/_centroids/{batch_id}")
    baseline = _ivf_mean_assign_dist(spark, path, centroids, [batch_id])
    n_rows = (
        spark.read.parquet(path).filter(F.col("batch") == batch_id).count()
    )
    _commit_scalars(
        spark,
        path,
        {
            "batches": [batch_id],
            "centroids": batch_id,
            "assign_dist_baseline": baseline,
            # per-batch row counts: keeps the tombstone_frac scheduler
            # term metadata-only (r12)
            "batch_counts": {batch_id: int(n_rows)},
        },
        parent_version=0,
    )
    if centroids_path:
        centroids.write.mode("overwrite").parquet(centroids_path)


def _ivf_tombstones(spark, path: str, meta: dict, id_col: str = "vec_id"):
    """Union of the COMMITTED tombstone id tables (manifest ``tombstones``
    list → ``_tombstones/<tid>`` parquet dirs), or None when the index
    has no deletions. One column named ``id_col``."""
    tids = meta.get("tombstones") or []
    if not tids:
        return None
    df = spark.read.parquet(*[f"{path}/_tombstones/{t}" for t in tids])
    return df.select(F.col(id_col)).distinct()


def ivf_delete(
    spark,
    path: str,
    ids: DataFrame,
    id_col: str = "vec_id",
    batch_id: str | None = None,
) -> dict:
    """Delete vectors from a persisted IVF index by id — the
    right-to-be-forgotten path (GDPR erasure over a training-data
    index). Deletion is LOGICAL first, physical later, the Lucene
    posture: the ids land as a committed TOMBSTONE batch
    (``_tombstones/<tid>``, listed in the manifest), every probe masks
    them with an anti-join after the committed-batch filter, and the
    next :func:`ivf_recompact` excludes them from the re-routed corpus
    and clears the tombstone list — that is the moment the bytes
    actually leave the index tree (erasure SLAs schedule a recompact,
    not a delete).

    Crash consistency — the ``ivf_append`` machinery on the tombstone
    axis: the id table lands invisible, ONE manifest version-commit
    flips it live, a re-delete of a committed tid is a metadata no-op,
    a crashed attempt purges and rewrites, a version race retries once
    from the fresh manifest. Masking is BY ID, independent of batch
    layout, so the retry is safe even across a concurrent recompact
    flip (rows that were live at recompact time re-routed into the new
    batch; the tombstone still masks them).

    Deleting ids not present is harmless (masks nothing). Contract
    note, loudly: re-APPENDING a tombstoned id before the purging
    recompact stays masked — ids are delete-then-gone until the
    tombstones clear; re-ingest after the recompact behaves normally.

    Returns {"n_ids", "version", "tombstone_id", "skipped"}."""
    import uuid as _uuid

    from ..fsutil import delete as _fs_delete, exists as _fs_exists
    from .search import (
        _check_batch_id,
        _commit_scalars,
        _read_scalars,
        _verify_tombstone_reuse,
    )

    meta = _ivf_read_manifest(spark, path)
    if meta is None:
        raise RuntimeError(
            f"IVF index at {path} predates batch stamping — rebuild with "
            "ivf_write before deleting"
        )
    if batch_id is None:
        batch_id = "t" + _uuid.uuid4().hex
    _check_batch_id(batch_id)
    tdir = f"{path}/_tombstones/{batch_id}"
    if batch_id in (meta.get("tombstones") or []):
        # ADVICE r11: the skip is only safe when the committed tombstone
        # holds the SAME ids — a reused batch_id with different ids would
        # silently drop those deletions
        _verify_tombstone_reuse(spark, tdir, ids, id_col, batch_id)
        return {
            "n_ids": 0,
            "version": meta["_version"],
            "tombstone_id": batch_id,
            "skipped": True,
        }
    _fs_delete(spark, tdir, recursive=True)  # crashed-attempt leftovers
    ids.select(F.col(id_col)).distinct().write.mode("overwrite").parquet(tdir)
    n_ids = spark.read.parquet(tdir).count()
    if n_ids > 0 and not _fs_exists(spark, tdir):
        raise IOError(
            f"ivf_delete: tombstone dir {tdir} was reclaimed before the "
            "manifest commit — aborting; re-delete the batch"
        )

    def _meta_with(base: dict) -> dict:
        m = {k: v for k, v in base.items() if k != "_version"}
        m["tombstones"] = [*(base.get("tombstones") or []), batch_id]
        # per-tombstone row counts ride in the manifest so the
        # tombstone_frac scheduler term stays metadata-only (r12)
        m["tombstone_counts"] = {
            **(base.get("tombstone_counts") or {}),
            batch_id: int(n_ids),
        }
        return m

    try:
        version = _commit_scalars(
            spark, path, _meta_with(meta), parent_version=meta["_version"]
        )
    except IOError:
        fresh = _read_scalars(spark, path)
        if batch_id in (fresh.get("tombstones") or []):
            return {
                "n_ids": 0,
                "version": fresh["_version"],
                "tombstone_id": batch_id,
                "skipped": True,
            }
        if n_ids > 0 and not _fs_exists(spark, tdir):
            raise IOError(
                f"ivf_delete: tombstone dir {tdir} was reclaimed before "
                "the manifest retry commit — aborting; re-delete the batch"
            )
        version = _commit_scalars(
            spark, path, _meta_with(fresh), parent_version=fresh["_version"]
        )
    return {
        "n_ids": int(n_ids),
        "version": version,
        "tombstone_id": batch_id,
        "skipped": False,
    }


def ivf_needs_recompact(
    spark,
    path: str,
    threshold: float = 1.25,
    sample_mod: int = 16,
    max_tombstone_frac: float | None = 0.25,
) -> dict:
    """Scheduler probe for centroid drift (VERDICT r10 #1): appends route
    by frozen centroids, so an ingest distribution that drifts away from
    the build-time one inflates the mean assign-distance (1 − cos to the
    assigned centroid) — recall decays with it (measured in SCALING.md's
    drift series). Compares the CURRENT committed index's mean
    assign-distance (deterministic 1/``sample_mod`` hash-sample, one
    bounded scan, one-row collect) against the manifest's build-time
    ``assign_dist_baseline``; ``recompact`` is True when the ratio
    exceeds ``threshold``. The twin of ``search.needs_compaction`` /
    ``champions_stale``: poll between ingest batches, answer True with
    :func:`ivf_recompact`.

    r12, the deletion axis: the drift sample MASKS pending tombstones
    (ADVICE r11 — dead rows would otherwise skew the ratio in either
    direction), and the probe additionally trips when the tombstone
    mass reaches ``max_tombstone_frac`` of the committed rows — every
    probe pays the anti-join against the accumulated tombstone tables
    until the recompact purges them (cost vs deleted fraction measured
    in SCALING.md's delete-drift study). Tombstone and batch row counts
    ride in the manifest (r12 writes), so the frac term is
    metadata-only; pre-counts manifests fall back to footer-stat
    counts. Pass ``max_tombstone_frac=None`` to disable the term.
    Returns {"recompact", "ratio", "current", "baseline", "n_batches",
    "tombstone_frac"}."""
    from .search import _tombstone_mass

    meta = _ivf_read_manifest(spark, path)
    if meta is None or not meta.get("centroids"):
        raise RuntimeError(
            f"IVF index at {path} has no resident centroids/baseline "
            "(pre-r11 layout) — rebuild with ivf_write to enable the "
            "drift probe"
        )
    committed = meta.get("batches") or []
    cent = ivf_load_centroids(spark, path)
    tomb = _ivf_tombstones(spark, path, meta)
    current = _ivf_mean_assign_dist(
        spark, path, cent, committed, sample_mod=sample_mod,
        exclude_ids=tomb,
    )
    baseline = float(meta.get("assign_dist_baseline") or 0.0)
    # a degenerate baseline (all-duplicate corpus → ~0) would make any
    # noise an infinite ratio; floor it at a visible angular distance
    ratio = current / max(baseline, 1e-9)
    counts = meta.get("batch_counts") or {}
    if committed and all(b in counts for b in committed):
        n_rows = sum(int(counts[b]) for b in committed)
    else:  # pre-r12 manifest: one footer-stat count over committed rows
        rows = spark.read.parquet(path)
        n_rows = rows.filter(F.col("batch").isin(committed)).count()
    mass = _tombstone_mass(spark, path, meta)
    tombstone_frac = mass / max(n_rows, 1)
    trip_tomb = (
        max_tombstone_frac is not None and tombstone_frac >= max_tombstone_frac
    )
    return {
        "recompact": bool(ratio > threshold or trip_tomb),
        "ratio": float(ratio),
        "current": current,
        "baseline": baseline,
        "n_batches": len(committed),
        "tombstone_frac": float(tombstone_frac),
    }


def ivf_recompact(
    spark,
    path: str,
    n_centroids: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    refine_iterations: int = 0,
    reclaim_min_age_seconds: float | None = None,
) -> dict:
    """Retrain the centroid set over the COMMITTED index and re-route
    every row — the drift repair (VERDICT r10 #1, closing the hole
    ``ivf_append``'s frozen-centroid convention opens: under ingest
    drift, appended vectors crowd into cells whose centroid no longer
    describes them, and probe recall decays with no repair path short
    of an offline rebuild).

    Training reuses :func:`ivf_index`'s exact deterministic recipe
    (:func:`_train_centroids`: hash-ordered seed sample + Lloyd steps)
    over the committed rows, so recompacting an index equals building
    fresh over the same corpus — centroids, assignment, and probe
    results are IDENTICAL by construction (tested row-identical).

    Crash consistency — the in-place ``bm25_index_compact`` pattern,
    one visibility switch for data AND centroids: the new centroid
    table lands at ``_centroids/<cid>`` and the re-routed corpus under
    ``batch=<cid>`` partitions (both invisible to probes planning
    against the current manifest), then ONE scalars commit flips
    ``batches`` to ``[cid]`` and ``centroids`` to ``cid`` and resets
    ``assign_dist_baseline`` — a probe routes with the old centroids
    over the old batches or the new over the new, never a mix. The
    replaced batches (and the outgoing centroid table, which shares
    their ids) are retirement-stamped and reclaimed age-gated by
    :func:`ivf_index_repair` — in-flight probes that planned against
    the pre-flip manifest get the same grace period as BM25 compaction.
    Losing the version rename to a concurrent appender aborts LOUDLY
    (that batch was routed with the outgoing centroids; re-run the
    recompact in a quiesced window — single-writer maintenance, the
    same contract as ``bm25_index_compact``).

    ``n_centroids`` defaults to the committed centroid count. Returns
    {"mode", "batch_id", "n_vectors", "n_centroids", "baseline",
    "version", "purged_batches"}.
    """
    import time as _time
    import uuid as _uuid

    from .search import _check_batch_id, _commit_scalars

    meta = _ivf_read_manifest(spark, path)
    if meta is None:
        raise RuntimeError(
            f"IVF index at {path} predates batch stamping (flat layout) — "
            "rebuild with ivf_write before recompacting"
        )
    committed = meta.get("batches") or []
    if n_centroids is None:
        n_centroids = ivf_load_centroids(spark, path).count()
    corpus = (
        spark.read.parquet(path)
        .filter(F.col("batch").isin(committed))
        .select(F.col(id_col), F.col(vec_col))
    )
    tomb = _ivf_tombstones(spark, path, meta, id_col)
    if tomb is not None:
        # the purge moment for logical deletes: tombstoned rows are
        # excluded from the re-route, the flipped manifest clears the
        # tombstone list, and repair reclaims the retired id tables —
        # after this commit the deleted bytes are gone from the tree
        corpus = corpus.join(tomb, id_col, "left_anti")
    cent = _train_centroids(
        corpus, int(n_centroids), vec_col, id_col, seed, refine_iterations
    )
    cid = "rc" + _uuid.uuid4().hex[:16]
    _check_batch_id(cid)
    cent.write.mode("overwrite").parquet(f"{path}/_centroids/{cid}")
    assigned = ivf_assign(corpus, cent, vec_col=vec_col, id_col=id_col)
    assigned.withColumn("batch", F.lit(cid)).write.mode("append").partitionBy(
        "centroid_id", "batch"
    ).parquet(path)
    n_rows = (
        spark.read.parquet(path).filter(F.col("batch") == cid).count()
    )
    if n_rows > 0 and cid not in _ivf_batch_dirs(spark, path):
        raise IOError(
            f"ivf_recompact: batch={cid} directories at {path} were "
            "reclaimed before the manifest commit (concurrent repair with "
            "an undersized age gate?) — aborting; re-run the recompact"
        )
    baseline = _ivf_mean_assign_dist(spark, path, cent, [cid])
    now = _time.time()
    retired = dict(meta.get("retired") or {})
    for b in committed:
        retired[b] = now
    for t in meta.get("tombstones") or []:
        retired[t] = now  # purged logically here; repair sweeps the dirs
    try:
        version = _commit_scalars(
            spark,
            path,
            {
                "batches": [cid],
                "centroids": cid,
                "assign_dist_baseline": baseline,
                "batch_counts": {cid: int(n_rows)},
                "retired": retired,
            },
            parent_version=meta["_version"],
        )
    except IOError as e:
        raise RuntimeError(
            f"ivf_recompact at {path} lost the manifest version race (a "
            "concurrent appender committed mid-recompact — its batch was "
            "routed with the OUTGOING centroids and is not in the "
            "recompacted corpus). Nothing flipped: probes still see the "
            "old index; the staged batch+centroids are unreferenced "
            "orphans repair reclaims age-gated. Re-run in a quiesced "
            "maintenance window (single-writer contract)"
        ) from e
    # count the PERSISTED centroid table, and do it BEFORE repair: the
    # lazy `cent` plan reads the tombstone parquet through the corpus
    # anti-join, and an immediate-reclaim repair (reclaim 0 in a
    # quiesced purge window) deletes those files — re-executing the
    # training plan after that fails with FAILED_READ_FILE (latent
    # until r12's purge_everywhere passed reclaim 0 with tombstones
    # pending; age-gated callers never re-read soon enough to see it)
    n_cent_out = spark.read.parquet(f"{path}/_centroids/{cid}").count()
    rep = ivf_index_repair(
        spark, path, min_age_seconds=reclaim_min_age_seconds
    )
    return {
        "mode": "recompact",
        "batch_id": cid,
        "n_vectors": int(n_rows),
        "n_centroids": int(n_cent_out),
        "baseline": baseline,
        "version": version,
        "purged_batches": len(rep["purged_batches"]),
    }


def ivf_index_repair(
    spark, path: str, min_age_seconds: float | None = None
) -> dict:
    """Reclaim storage of IVF batch directories that are NOT in the
    committed manifest, once they are safely old (the
    ``bm25_index_repair`` posture):

    - **Crashed appends/recompacts** (on disk, never committed, not in
      ``retired``): reclaimed when their newest directory mtime is older
      than the age gate — young uncommitted directories are
      indistinguishable from an IN-FLIGHT writer's files, so the gate
      (default: the shared ``search.DEFAULT_RECLAIM_MIN_AGE``) defers
      them.
    - **Retired batches** (replaced by :func:`ivf_recompact`, stamped
      with a retirement time in the manifest's ``retired`` map):
      reclaimed ``min_age_seconds`` after RETIREMENT, not after their
      old file mtimes — a probe that planned against the pre-flip
      manifest may still be scanning them. Reclaimed ids drop from
      ``retired`` via a fresh manifest version.
    - **Centroid tables** (``_centroids/<id>`` — ids shared with the
      batch that introduced them): any non-committed table is swept
      under the same age decision as its batch id (retirement-stamped
      or mtime-gated), so the outgoing centroids of a recompaction and
      the staged centroids of a crashed one are both reclaimed.

    Probes never see any of this (they filter to committed batches and
    route with the committed centroid id), so repair is storage
    reclamation, not a correctness fix. Returns {"purged_batches",
    "deferred_batches", "centroids_swept"}."""
    import time as _time

    from ..fsutil import delete, list_status
    from .search import (
        DEFAULT_RECLAIM_MIN_AGE,
        _drop_retired_entries,
        _tree_max_mtime_ms,
    )

    if min_age_seconds is None:
        min_age_seconds = DEFAULT_RECLAIM_MIN_AGE
    meta = _ivf_read_manifest(spark, path)
    if meta is None:
        raise RuntimeError(
            f"IVF index at {path} predates batch stamping — rebuild with "
            "ivf_write to enable append repair"
        )
    committed = set(meta.get("batches") or [])
    retired = meta.get("retired") or {}
    now = _time.time()
    mtimes = _ivf_batch_dirs(spark, path)
    purged, deferred = [], []
    for b in sorted(set(mtimes) - committed):
        age = now - (retired[b] if b in retired else mtimes[b] / 1000.0)
        if age >= min_age_seconds:
            _ivf_purge_batch(spark, path, b)
            purged.append(b)
        else:
            deferred.append(b)
    # centroid tables ride their introducing batch id's age decision
    centroids_swept: list[str] = []
    live_cid = meta.get("centroids")
    for st in list_status(spark, f"{path}/_centroids"):
        cid = st["name"]
        if not st["is_dir"] or cid == live_cid:
            continue
        if cid in deferred:
            continue
        age = now - (
            retired[cid] if cid in retired else
            (_tree_max_mtime_ms(spark, f"{path}/_centroids/{cid}") or st["mtime_ms"])
            / 1000.0
        )
        if age >= min_age_seconds and delete(
            spark, f"{path}/_centroids/{cid}", recursive=True
        ):
            centroids_swept.append(cid)
    # tombstone id tables (r11 ivf_delete): any ``_tombstones/<tid>`` dir
    # NOT in the committed tombstone list is either a crashed delete
    # (mtime-gated) or one a recompact retired when it purged the ids
    # physically (retirement-stamped) — same age decision as batches
    tombstones_swept: list[str] = []
    committed_t = set(meta.get("tombstones") or [])
    tdirs: dict[str, dict] = {}
    for st in list_status(spark, f"{path}/_tombstones"):
        if st["is_dir"]:
            tdirs[st["name"]] = st
    for tid in sorted(set(tdirs) - committed_t):
        age = now - (
            retired[tid] if tid in retired else
            (_tree_max_mtime_ms(spark, f"{path}/_tombstones/{tid}")
             or tdirs[tid]["mtime_ms"]) / 1000.0
        )
        if age >= min_age_seconds and delete(
            spark, f"{path}/_tombstones/{tid}", recursive=True
        ):
            tombstones_swept.append(tid)
    # drop stamps for reclaimed batches AND for retired ids whose
    # directories are already gone (a prior repair lost the stamp-drop
    # commit to a version conflict) — same hygiene as bm25_index_repair
    droppable = [
        b for b in retired
        if b in purged
        or b in tombstones_swept
        or (b not in mtimes and b not in committed and b not in tdirs)
    ]
    if droppable:
        _drop_retired_entries(spark, path, droppable)
    return {
        "purged_batches": purged,
        "deferred_batches": deferred,
        "centroids_swept": centroids_swept,
        "tombstones_swept": tombstones_swept,
    }


def ivf_topk_pruned(
    spark,
    index_path: str,
    centroids: DataFrame | None,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    allowed_ids: DataFrame | None = None,
) -> DataFrame:
    """Probe a persisted IVF index: route queries → centroid ids, then scan
    ONLY the matching partitions (the probe-id join key is a partition
    column, so Catalyst turns it into PartitionFilters via dynamic partition
    pruning / an IN-filter on the routed ids). On a batch-stamped index
    (r10 ``ivf_write``) the scan additionally filters to COMMITTED batches
    — also a partition column, so a crashed ``ivf_append``'s half-landed
    files are invisible at directory level; a legacy flat index probes
    everything as before.

    ``centroids=None`` (r11) routes with the index-RESIDENT committed
    centroid set (:func:`ivf_load_centroids`) — the recompact-safe
    default: after :func:`ivf_recompact` flips the set, a probe holding
    the outgoing driver-side table would route against cells the
    committed batches are no longer laid out by. Pass explicit
    centroids only for pre-r11 indexes (no resident set).

    ``allowed_ids`` (r12, filtered search — the metadata-constrained ANN
    query every vector deployment needs): restrict candidates to an id
    allow-list shared by the query batch, applied as an equi-keyed
    semi-join AFTER the partition-pruned scan and the tombstone mask —
    cost ∝ routed-cell rows, never the corpus. This is POST-filtering
    (the standard IVF approach): under a selective filter the routed
    ``n_probe`` cells may hold fewer than k allowed survivors, so raise
    ``n_probe`` with filter selectivity — at exhaustive
    ``n_probe = n_centroids`` the filtered probe is EXACT (≡ brute
    force over the allowed survivors, the oracle's theorem). Per-query
    filters: batch queries per filter set."""
    if centroids is None:
        centroids = ivf_load_centroids(spark, index_path)
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

    # ONE execution of the routing subtree: the probe table is broadcast-
    # small by contract (|Q| × n_probe — it feeds F.broadcast below), so
    # collect it once and rebuild it as a local frame. Previously the
    # distinct-ids collect AND the broadcast build each re-ran the
    # route+rank plan; now the collect feeds both.
    probe_rows = probes.collect()
    probes = local_frame(spark, probe_rows, probes.schema)
    probe_ids = sorted({r["centroid_id"] for r in probe_rows})
    index = spark.read.parquet(index_path).filter(F.col("centroid_id").isin(probe_ids))
    meta = _ivf_read_manifest(spark, index_path)
    if meta is not None:
        index = index.filter(F.col("batch").isin(meta.get("batches") or []))
        tomb = _ivf_tombstones(spark, index_path, meta, id_col)
        if tomb is not None:
            # logical deletes (ivf_delete): masked AFTER the pruned scan,
            # keyed by id — the anti-join touches only routed-cell rows
            index = index.join(tomb, id_col, "left_anti")
    if allowed_ids is not None:
        # filtered search (r12): same post-scan shape as the tombstone
        # mask, allow-list instead of deny-list
        index = index.join(
            allowed_ids.select(F.col(id_col)).distinct(), id_col, "left_semi"
        )
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
