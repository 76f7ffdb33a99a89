"""Product quantization for billion-scale ANN (Jégou, Douze, Schmid,
"Product quantization for nearest neighbor search", TPAMI 2011).

The missing compression stage of the IVF-PQ architecture (operators/
similarity.py ships the IVF inverted file): split each D-dim vector into
``m`` subvectors, vector-quantize every subspace against its own
``k``-entry codebook, and store ``m`` small codes per vector — dim-64
float32 (256 B) becomes 8 bytes at m=8/k=256, a 32× corpus shrink that is
the difference between RAM-resident and disk-bound search at 100 TB.
Search uses Asymmetric Distance Computation (ADC): per query, one
(m × k) lookup table of exact subspace distances to every codebook entry,
then each stored vector scores as ``m`` table lookups — no float math per
corpus vector.

Engine mapping:
- **Training** is a bounded-sample driver computation (deterministic
  hash-ordered sample, default 50k vectors — MBs at any corpus size),
  running seeded Lloyd k-means per subspace in numpy. Same cost envelope
  as the IVF centroid collect; the codebooks are m·k·(D/m) doubles.
- **Encoding** is one Arrow-batched pass (`mapInPandas`): per batch, an
  argmin over each subspace's codebook — no shuffle, codes append to the
  corpus row.
- **ADC search** mirrors brute_force_topk_arrow's pre-reduction: every
  batch scores its rows against the broadcast LUTs (pure numpy gather +
  sum) and emits only its LOCAL top-k per query, so the shuffle carries
  ≤ partitions × |Q| × k rows regardless of corpus size.

Exactness property used by the tests: a vector that IS a concatenation of
codebook entries reconstructs losslessly, so ADC distances equal exact
distances and PQ top-k equals brute force — a deterministic end-to-end
check that needs no recall tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
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
                d2 = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
                codes[:, j] = d2.argmin(1)
            yield pd.DataFrame(
                {"vec_id": pdf["__id"].values, "codes": list(codes.tolist())}
            )

    return (
        corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .mapInPandas(_enc, schema=out_schema)
        .withColumnRenamed("vec_id", id_col)
    )


def pq_topk(
    codes_df: DataFrame,
    codebooks,
    queries,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: ``queries`` is a list of (query_id, vector). Per batch,
    distances are m table lookups per row (numpy gather + sum over the
    per-query LUTs); each batch emits only its local top-k per query, the
    global merge is a tiny TakeOrdered. Returns
    (query_id, vec_id, adc_dist, rank) — squared-L2 ADC distances rounded
    to 6dp before ranking, (dist asc, vec_id) tiebreak."""
    import numpy as np

    m, k_eff, dsub = codebooks.shape
    luts = []  # (query_id, (m, k_eff) float64)
    for qid, vec in queries:
        q = np.asarray(vec, dtype=np.float64)
        lut = np.empty((m, k_eff))
        for j in range(m):
            lut[j] = ((codebooks[j] - q[j * dsub : (j + 1) * dsub]) ** 2).sum(-1)
        luts.append((qid, lut))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("adc_dist", T.DoubleType()),
        ]
    )

    def _score(pdfs):
        import pandas as pd

        for pdf in pdfs:
            if pdf.empty:
                continue
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
            ids = pdf["__id"].values
            frames = []
            for qid, lut in luts:
                # gather: dist[i] = sum_j lut[j, codes[i, j]]
                dist = lut[np.arange(m)[None, :], codes].sum(1)
                dist = np.floor(dist * 1e6 + 0.5) / 1e6
                top = np.argsort(dist, kind="stable")[:k]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "vec_id": ids[top],
                            "adc_dist": dist[top],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    local = codes_df.select(
        F.col(id_col).alias("__id"), F.col("codes")
    ).mapInPandas(_score, schema=out_schema)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pq_topk_scoped(
    scoped_codes: DataFrame,
    codebooks,
    queries,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over PRE-SCOPED (query_id, vec_id, codes) rows — each row
    is scored against exactly its query's LUT (the IVF-PQ inner loop,
    where every query sees only its probed cells). Same local-top-k
    pre-reduction as :func:`pq_topk`."""
    import numpy as np

    m, k_eff, dsub = codebooks.shape
    luts = {}
    for qid, vec in queries:
        q = np.asarray(vec, dtype=np.float64)
        lut = np.empty((m, k_eff))
        for j in range(m):
            lut[j] = ((codebooks[j] - q[j * dsub : (j + 1) * dsub]) ** 2).sum(-1)
        luts[qid] = lut

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("adc_dist", T.DoubleType()),
        ]
    )

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
                dist = lut[np.arange(m)[None, :], codes].sum(1)
                dist = np.floor(dist * 1e6 + 0.5) / 1e6
                top = np.argsort(dist, kind="stable")[:k]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "vec_id": grp["__id"].values[top],
                            "adc_dist": dist[top],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    local = scoped_codes.select(
        "query_id", F.col(id_col).alias("__id"), "codes"
    ).mapInPandas(_score, schema=out_schema)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return local.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


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
    """IVF-PQ: the full Jégou et al. architecture — each query probes its
    ``n_probe`` nearest IVF cells (L2 over the collected, driver-tiny
    centroid table) and ADC-scores ONLY the PQ codes of those cells.
    ``assigned`` is ivf_index/ivf_assign's (vec_id, centroid_id) output;
    at warehouse scale both it and ``codes_df`` are the same
    centroid_id-partitioned table, so the scope join becomes a
    partition-pruned scan. With n_probe = #cells the scope is the whole
    corpus and the result EQUALS :func:`pq_topk` exactly (tested)."""
    import numpy as np

    cent_rows = centroids.collect()
    cids = np.array([int(r["centroid_id"]) for r in cent_rows])
    C = np.array([list(r["centroid_vec"]) for r in cent_rows], dtype=np.float64)
    probes = []
    for qid, vec in queries:
        d = ((C - np.asarray(vec, dtype=np.float64)) ** 2).sum(1)
        for i in np.argsort(d, kind="stable")[:n_probe]:
            probes.append((qid, int(cids[i])))
    spark = codes_df.sparkSession
    probe_df = spark.createDataFrame(probes, "query_id long, centroid_id int")
    scoped = (
        assigned.select(id_col, "centroid_id")
        .join(F.broadcast(probe_df), "centroid_id")
        .join(codes_df, id_col)
        .select("query_id", id_col, "codes")
    )
    return pq_topk_scoped(scoped, codebooks, queries, k, id_col)


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


def ivf_adc_topk(
    res_codes: DataFrame,
    centroids: DataFrame,
    codebooks,
    queries,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Residual IVFADC search: every (query, probed cell) gets its OWN
    lookup table built from the query's residual against that cell's
    center — m·k·n_probe distances per query, driver-tiny — and each
    scoped row scores as m gathers from its (query, cell) LUT. Returns
    (query_id, vec_id, adc_dist, rank)."""
    import numpy as np

    m, k_eff, dsub = codebooks.shape
    cent_rows = centroids.collect()
    cids = np.array([int(r["centroid_id"]) for r in cent_rows])
    C = np.array([list(r["centroid_vec"]) for r in cent_rows], dtype=np.float64)
    luts = {}  # (query_id, centroid_id) -> (m, k_eff)
    probes = []
    for qid, vec in queries:
        q = np.asarray(vec, dtype=np.float64)
        d = ((C - q) ** 2).sum(1)
        for i in np.argsort(d, kind="stable")[:n_probe]:
            cid = int(cids[i])
            probes.append((qid, cid))
            r = q - C[i]  # query residual against THIS cell's center
            lut = np.empty((m, k_eff))
            for j in range(m):
                lut[j] = ((codebooks[j] - r[j * dsub : (j + 1) * dsub]) ** 2).sum(-1)
            luts[(qid, cid)] = lut

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("adc_dist", T.DoubleType()),
        ]
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
                dist = lut[np.arange(m)[None, :], codes].sum(1)
                dist = np.floor(dist * 1e6 + 0.5) / 1e6
                top = np.argsort(dist, kind="stable")[:k]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "vec_id": grp["__id"].values[top],
                            "adc_dist": dist[top],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    spark = res_codes.sparkSession
    probe_df = spark.createDataFrame(probes, "query_id long, centroid_id int")
    scoped = (
        res_codes.join(F.broadcast(probe_df), "centroid_id")
        .select("query_id", "centroid_id", F.col(id_col).alias("__id"), "codes")
    )
    local = scoped.mapInPandas(_score, schema=out_schema)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return local.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


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
    query to its n_probe cells and scans ONLY those partitions (the
    centroid_id filter reaches the parquet scan as a partition filter —
    the build-once-probe-many deployment shape). Returns
    (query_id, vec_id, adc_dist, rank)."""
    books, cent = pq_read_meta(spark, path)
    import numpy as np

    cent_rows = cent.collect()
    cids = np.array([int(r["centroid_id"]) for r in cent_rows])
    C = np.array([list(r["centroid_vec"]) for r in cent_rows], dtype=np.float64)
    needed = set()
    for _, vec in queries:
        d = ((C - np.asarray(vec, dtype=np.float64)) ** 2).sum(1)
        for i in np.argsort(d, kind="stable")[:n_probe]:
            needed.add(int(cids[i]))
    codes = spark.read.parquet(path).filter(
        F.col("centroid_id").isin(sorted(needed))  # partition-pruned scan
    )
    cent_needed = cent.filter(F.col("centroid_id").isin(sorted(needed)))
    return ivf_adc_topk(codes, cent_needed, books, queries, k, n_probe, id_col)
