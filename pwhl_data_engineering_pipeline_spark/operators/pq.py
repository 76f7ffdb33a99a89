"""Product quantization for billion-scale ANN (Jégou, Douze, Schmid,
"Product quantization for nearest neighbor search", TPAMI 2011).

The compression stage of the IVF-PQ architecture (operators/similarity.py
ships the IVF inverted file): split each D-dim vector into ``m``
subvectors, vector-quantize every subspace against its own ``k``-entry
codebook, and store ``m`` small codes per vector — dim-64 float32 (256 B)
becomes 8 bytes at m=8/k=256, a 32× corpus shrink that is the difference
between RAM-resident and disk-bound search at 100 TB. Search uses
Asymmetric Distance Computation (ADC): per query, one (m × k) lookup
table of exact subspace distances to every codebook entry, then each
stored vector scores as ``m`` table lookups — no float math per corpus
vector.

Engine mapping:
- **Training** is a bounded-sample driver computation (deterministic
  hash-ordered sample, default 50k vectors — MBs at any corpus size),
  running seeded Lloyd k-means per subspace in numpy via the
  ``‖x‖² + ‖c‖² − 2·x·cᵀ`` identity (the (n, k, dsub) broadcast form
  would transiently cost ~GBs at the defaults).
- **Encoding** is one Arrow-batched pass (`mapInPandas`): per batch, an
  argmin over each subspace's codebook — no shuffle, codes append to the
  corpus row.
- **ADC search** mirrors brute_force_topk_arrow's pre-reduction: every
  batch scores its rows against the broadcast LUTs (numpy gather + sum)
  and emits only its LOCAL top-k per query, selected under the SAME
  (adc_dist, vec_id) total order the global merge uses (ties are
  pervasive — equal code tuples give equal distances — so a plain
  argsort cut would drop the wrong rows at the k boundary). The shuffle
  carries ≤ partitions × |Q| × k rows regardless of corpus size.
- **Cell routing is cosine**, matching ``similarity.ivf_assign`` exactly
  (same 9dp rounding, same centroid-id tiebreak): probing with a
  different metric than the one that stored the vectors can miss even
  exact-duplicate neighbors on unnormalized embeddings.

Exactness property used by the tests: a vector that IS a concatenation of
codebook entries reconstructs losslessly, so ADC distances equal exact
distances and PQ top-k equals brute force — a deterministic end-to-end
check that needs no recall tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .windows import top_k_per_group


def _sq_dists(S, C):
    """(n, dsub) × (k, dsub) → (n, k) squared L2 via the matmul identity —
    peak temporary is (n, k), not (n, k, dsub)."""
    import numpy as np

    d2 = (S * S).sum(1)[:, None] + (C * C).sum(1)[None, :] - 2.0 * (S @ C.T)
    return np.maximum(d2, 0.0)  # identity can go epsilon-negative


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    k: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 50_000,
    iters: int = 10,
    seed: int = 42,
):
    """Train per-subspace codebooks → numpy array (m, k, D/m).

    Deterministic: the training sample is hash-ordered (a pure function of
    ids and ``seed``) and k-means initializes from the first k distinct
    sample rows per subspace, so identical inputs give identical
    codebooks on any cluster layout."""
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .withColumn("__r", F.pmod(F.xxhash64(F.col("__id").cast("string"), F.lit(seed)), 1_000_000_000))
        .orderBy("__r", "__id")
        .limit(sample)
        .select("__v")
        .collect()
    )
    X = np.array([r["__v"] for r in rows], dtype=np.float64)
    n, d = X.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    k_eff = min(k, n)
    books = np.empty((m, k_eff, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        # init: first k distinct rows in the (hash-ordered) sample
        _, first_idx = np.unique(S, axis=0, return_index=True)
        init = S[np.sort(first_idx)[:k_eff]]
        if len(init) < k_eff:  # fewer distinct subvectors than k: pad by cycling
            init = np.concatenate([init, S[: k_eff - len(init)]])
        C = init.copy()
        for _ in range(iters):
            assign = _sq_dists(S, C).argmin(1)
            for c in range(k_eff):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(0)
        books[j] = C
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every vector to its m subspace code indices →
    (id, codes: array<int>). One Arrow pass, no shuffle."""
    import numpy as np

    m, k_eff, dsub = codebooks.shape
    books = codebooks  # captured; broadcast with the task closure (KBs)
    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def _enc(pdfs):
        import pandas as pd

        for pdf in pdfs:
            if pdf.empty:
                continue
            X = np.array(pdf["__v"].tolist(), dtype=np.float64)
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                codes[:, j] = _sq_dists(S, books[j]).argmin(1)
            yield pd.DataFrame(
                {"vec_id": pdf["__id"].values, "codes": list(codes.tolist())}
            )

    return (
        corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .mapInPandas(_enc, schema=out_schema)
        .withColumnRenamed("vec_id", id_col)
    )


# -- shared ADC search kernels ----------------------------------------------

_ADC_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("adc_dist", T.DoubleType()),
    ]
)


def _build_lut(codebooks, vec):
    """(m, k) squared-L2 lookup table of ``vec`` against every codebook
    entry — the per-query (or per query-cell residual) ADC table."""
    import numpy as np

    m, k_eff, dsub = codebooks.shape
    q = np.asarray(vec, dtype=np.float64)
    lut = np.empty((m, k_eff))
    for j in range(m):
        lut[j] = ((codebooks[j] - q[j * dsub : (j + 1) * dsub]) ** 2).sum(-1)
    return lut


def _adc_local_topk(lut, codes, ids, qid, k):
    """Score one group against its LUT and keep the local top-k under the
    SAME (adc_dist asc, vec_id asc) total order as the global merge —
    ties are the norm in ADC (equal code tuples ⇒ equal distances), and a
    bare argsort cut at the k boundary would keep arbitrary join-order
    rows the global window would have evicted."""
    import numpy as np
    import pandas as pd

    m = lut.shape[0]
    dist = lut[np.arange(m)[None, :], codes].sum(1)
    dist = np.floor(dist * 1e6 + 0.5) / 1e6
    top = np.lexsort((ids, dist))[:k]
    return pd.DataFrame(
        {"query_id": qid, "vec_id": ids[top], "adc_dist": dist[top]}
    )


def _rank_global(local: DataFrame, k: int) -> DataFrame:
    return top_k_per_group(
        local,
        ["query_id"],
        [F.col("adc_dist").asc(), F.col("vec_id").asc()],
        k,
        rank_col="rank",
    )


def _route_cells(centroids_np, cids_np, vec, n_probe):
    """Query → its n_probe cells by COSINE — the same metric, 9dp
    rounding, and centroid-id tiebreak as similarity.ivf_assign, so a
    probe always lands where assignment stored the neighbors."""
    import numpy as np

    q = np.asarray(vec, dtype=np.float64)
    qn = np.sqrt((q * q).sum())
    cn = np.sqrt((centroids_np * centroids_np).sum(1))
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.where(cn * qn > 0, centroids_np @ q / (cn * qn), -np.inf)
    cos9 = np.floor(cos * 1e9 + 0.5) / 1e9
    order = np.lexsort((cids_np, -cos9))
    return [int(c) for c in cids_np[order[:n_probe]]]


def _collect_centroids(centroids: DataFrame):
    import numpy as np

    rows = centroids.collect()
    cids = np.array([int(r["centroid_id"]) for r in rows])
    C = np.array([list(r["centroid_vec"]) for r in rows], dtype=np.float64)
    return cids, C


def pq_topk(
    codes_df: DataFrame,
    codebooks,
    queries,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Flat ADC top-k: ``queries`` is a list of (query_id, vector); every
    row scores against every query's LUT. Returns
    (query_id, vec_id, adc_dist, rank) — squared-L2 ADC distances rounded
    to 6dp before ranking, (dist asc, vec_id) tiebreak."""
    import numpy as np

    luts = [(qid, _build_lut(codebooks, vec)) for qid, vec in queries]

    def _score(pdfs):
        import pandas as pd

        for pdf in pdfs:
            if pdf.empty:
                continue
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
            ids = pdf["__id"].values
            frames = [_adc_local_topk(lut, codes, ids, qid, k) for qid, lut in luts]
            if frames:
                yield pd.concat(frames, ignore_index=True)

    local = codes_df.select(
        F.col(id_col).alias("__id"), F.col("codes")
    ).mapInPandas(_score, schema=_ADC_SCHEMA)
    return _rank_global(local, k)


def pq_topk_scoped(
    scoped_codes: DataFrame,
    codebooks,
    queries,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over PRE-SCOPED (query_id, vec_id, codes) rows — each row
    is scored against exactly its query's LUT (the IVF-PQ inner loop,
    where every query sees only its probed cells)."""
    import numpy as np

    luts = {qid: _build_lut(codebooks, vec) for qid, vec in queries}

    def _score(pdfs):
        import pandas as pd

        for pdf in pdfs:
            if pdf.empty:
                continue
            frames = []
            for qid, grp in pdf.groupby("query_id"):
                lut = luts.get(qid)
                if lut is None:
                    continue
                codes = np.array(grp["codes"].tolist(), dtype=np.int64)
                frames.append(_adc_local_topk(lut, codes, grp["__id"].values, qid, k))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    local = scoped_codes.select(
        "query_id", F.col(id_col).alias("__id"), "codes"
    ).mapInPandas(_score, schema=_ADC_SCHEMA)
    return _rank_global(local, k)


def ivf_pq_topk(
    codes_df: DataFrame,
    assigned: DataFrame,
    centroids: DataFrame,
    codebooks,
    queries,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ over FLAT codes: each query probes its ``n_probe`` cells
    (cosine routing — the assignment metric) and ADC-scores only those
    cells' codes. ``assigned`` is ivf_index/ivf_assign's
    (vec_id, centroid_id) output; at warehouse scale both it and
    ``codes_df`` are the same centroid_id-partitioned table, so the scope
    join becomes a partition-pruned scan. With n_probe = #cells the scope
    is the whole corpus and the result EQUALS :func:`pq_topk` exactly
    (tested)."""
    cids, C = _collect_centroids(centroids)
    probes = [
        (qid, cid)
        for qid, vec in queries
        for cid in _route_cells(C, cids, vec, n_probe)
    ]
    spark = codes_df.sparkSession
    probe_df = spark.createDataFrame(probes, "query_id long, centroid_id int")
    scoped = (
        assigned.select(id_col, "centroid_id")
        .join(F.broadcast(probe_df), "centroid_id")
        .join(codes_df, id_col)
        .select("query_id", id_col, "codes")
    )
    return pq_topk_scoped(scoped, codebooks, queries, k, id_col)


# -- residual IVFADC (the paper's full architecture) ------------------------


def _residuals(
    corpus: DataFrame,
    assigned: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, centroid_id, residual) — each vector minus its IVF cell center
    (broadcast centroid join + zip_with, map-side)."""
    cent = centroids.select("centroid_id", F.col("centroid_vec").alias("__c"))
    return (
        corpus.select(F.col(id_col), F.col(vec_col).alias("__x"))
        .join(assigned.select(id_col, "centroid_id"), id_col)
        .join(F.broadcast(cent), "centroid_id")
        .select(
            id_col,
            "centroid_id",
            F.zip_with("__x", "__c", lambda a, b: a.cast("double") - b).alias("residual"),
        )
    )


def pq_train_residual(
    corpus: DataFrame,
    assigned: DataFrame,
    centroids: DataFrame,
    m: int = 8,
    k: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    **kw,
):
    """Codebooks over IVF RESIDUALS — the paper's IVFADC: quantizing
    x − centroid(cell(x)) spends the codebook's resolution on the
    within-cell structure the coarse quantizer already localized, which
    is where the neighbors live."""
    res = _residuals(corpus, assigned, centroids, vec_col, id_col)
    return pq_train(res, m=m, k=k, vec_col="residual", id_col=id_col, **kw)


def pq_encode_residual(
    corpus: DataFrame,
    assigned: DataFrame,
    centroids: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, centroid_id, codes) — residual codes plus the cell id the ADC
    search needs to pick the right per-(query, cell) lookup table."""
    res = _residuals(corpus, assigned, centroids, vec_col, id_col)
    codes = pq_encode(res, codebooks, vec_col="residual", id_col=id_col)
    return codes.join(assigned.select(id_col, "centroid_id"), id_col)


def _residual_probes(centroids: DataFrame, codebooks, queries, n_probe):
    """Shared routing for the residual searchers: per (query, probed cell),
    the LUT built from the query's residual against that cell's center.
    Returns (probe pairs, {(qid, cid): lut}). m·k·n_probe driver-side
    distances per query — tiny."""
    import numpy as np

    cids, C = _collect_centroids(centroids)
    by_cid = {int(c): i for i, c in enumerate(cids)}
    probes = []
    luts = {}
    for qid, vec in queries:
        q = np.asarray(vec, dtype=np.float64)
        for cid in _route_cells(C, cids, vec, n_probe):
            probes.append((qid, cid))
            luts[(qid, cid)] = _build_lut(codebooks, q - C[by_cid[cid]])
    return probes, luts


def ivf_adc_topk(
    res_codes: DataFrame,
    centroids: DataFrame,
    codebooks,
    queries,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    _probes_luts=None,
) -> DataFrame:
    """Residual IVFADC search: every (query, probed cell) gets its OWN
    lookup table built from the query's residual against that cell's
    center; each scoped row scores as m gathers from its (query, cell)
    LUT. Returns (query_id, vec_id, adc_dist, rank)."""
    import numpy as np

    probes, luts = (
        _probes_luts
        if _probes_luts is not None
        else _residual_probes(centroids, codebooks, queries, n_probe)
    )

    def _score(pdfs):
        import pandas as pd

        for pdf in pdfs:
            if pdf.empty:
                continue
            frames = []
            for (qid, cid), grp in pdf.groupby(["query_id", "centroid_id"]):
                lut = luts.get((qid, int(cid)))
                if lut is None:
                    continue
                codes = np.array(grp["codes"].tolist(), dtype=np.int64)
                frames.append(_adc_local_topk(lut, codes, grp["__id"].values, qid, k))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    spark = res_codes.sparkSession
    probe_df = spark.createDataFrame(probes, "query_id long, centroid_id int")
    scoped = res_codes.join(F.broadcast(probe_df), "centroid_id").select(
        "query_id", "centroid_id", F.col(id_col).alias("__id"), "codes"
    )
    local = scoped.mapInPandas(_score, schema=_ADC_SCHEMA)
    return _rank_global(local, k)


# -- persisted index --------------------------------------------------------


def pq_write(
    res_codes: DataFrame,
    path: str,
    codebooks,
    centroids: DataFrame,
) -> None:
    """Persist a residual-PQ index with its physical layout: codes written
    **partitioned by centroid_id** (the on-disk inverted file — probes
    scan only routed cells, same as similarity.ivf_write) plus a
    ``_pq_meta`` sidecar holding the codebooks and centroid table
    (underscore dir: invisible to data discovery). At 100 TB the data
    dirs hold m bytes per vector; the sidecar is KBs."""
    spark = res_codes.sparkSession
    res_codes.write.mode("overwrite").partitionBy("centroid_id").parquet(path)
    m, k_eff, dsub = codebooks.shape
    flat = [
        (int(j), int(c), [float(x) for x in codebooks[j, c]])
        for j in range(m)
        for c in range(k_eff)
    ]
    spark.createDataFrame(
        flat, "subspace int, code int, entry array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(path.rstrip("/") + "/_pq_meta/books")
    centroids.coalesce(1).write.mode("overwrite").parquet(
        path.rstrip("/") + "/_pq_meta/centroids"
    )


def pq_read_meta(spark, path: str):
    """(codebooks ndarray, centroids DataFrame) from a pq_write index."""
    import numpy as np

    rows = spark.read.parquet(path.rstrip("/") + "/_pq_meta/books").collect()
    m = max(r["subspace"] for r in rows) + 1
    k_eff = max(r["code"] for r in rows) + 1
    dsub = len(rows[0]["entry"])
    books = np.empty((m, k_eff, dsub))
    for r in rows:
        books[r["subspace"], r["code"]] = r["entry"]
    cent = spark.read.parquet(path.rstrip("/") + "/_pq_meta/centroids")
    return books, cent


def ivf_adc_topk_pruned(
    spark,
    path: str,
    queries,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Residual IVFADC against a PERSISTED pq_write index: routes each
    query ONCE (the same probes/LUTs feed both the partition filter and
    the scoring pass) and scans only the routed cells — centroid_id
    reaches the parquet scan as a partition filter, the
    build-once-probe-many deployment shape."""
    books, cent = pq_read_meta(spark, path)
    probes, luts = _residual_probes(cent, books, queries, n_probe)
    needed = sorted({cid for _, cid in probes})
    codes = spark.read.parquet(path).filter(
        F.col("centroid_id").isin(needed)  # partition-pruned scan
    )
    return ivf_adc_topk(
        codes, cent, books, queries, k, n_probe, id_col,
        _probes_luts=(probes, luts),
    )
