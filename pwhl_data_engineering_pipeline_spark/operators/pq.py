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
from ..sources.readers import local_frame

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

    sample_df = (
        corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .withColumn("__r", F.pmod(F.xxhash64(F.col("__id").cast("string"), F.lit(seed)), 1_000_000_000))
        .orderBy("__r", "__id")
        .limit(sample)
        .select("__v")
    )
    try:
        # Arrow collect: the sample is up to 50k × D float64 — the pickled
        # row path spends ~0.3 s serializing what Arrow moves in one
        # columnar batch (guide §6: Arrow for driver transfers). Same rows,
        # same float64 bits.
        vecs = sample_df.toArrow().column("__v").to_pylist()
        X = np.array(vecs, dtype=np.float64)
    except Exception:  # Arrow unavailable: classic collect
        X = np.array([r["__v"] for r in sample_df.collect()], dtype=np.float64)
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
    probe_df = local_frame(spark, probes, "query_id long, centroid_id int")
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
    probe_df = local_frame(spark, probes, "query_id long, centroid_id int")
    scoped = res_codes.join(F.broadcast(probe_df), "centroid_id").select(
        "query_id", "centroid_id", F.col(id_col).alias("__id"), "codes"
    )
    local = scoped.mapInPandas(_score, schema=_ADC_SCHEMA)
    return _rank_global(local, k)


# -- persisted index --------------------------------------------------------
#
# r11 (the residue VERDICT r10 named: "PQ has no deep decade" was the
# measurement half; this is the lifecycle half): the persisted IVFADC
# index gets the SAME batch-visibility machinery the IVF and BM25
# indexes carry — batch=<id> partitions under each centroid_id, a
# versioned committed-batches manifest (operators.search's atomic-rename
# scalars), crash-consistent idempotent appends, age-gated repair, and
# an in-place recompact that retrains the coarse centroids AND the
# residual codebooks and flips data+meta in one commit. One PQ-specific
# wrinkle shapes two APIs here: PQ codes are LOSSY, so neither the drift
# probe nor the recompact can work from the index alone — both take the
# original vectors (the ingest path has them in hand; the snapshot table
# the streaming sinks maintain is the system-of-record at rest).


def _pq_read_manifest(spark, path: str) -> dict | None:
    """Committed manifest of a persisted PQ index (the shared versioned
    ``_scalars/`` machinery from operators.search); None for an index
    that predates the r11 lifecycle layout."""
    from .search import _read_scalars

    try:
        return _read_scalars(spark, path)
    except FileNotFoundError:
        return None


def _pq_batch_dirs(spark, path: str) -> dict[str, float]:
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


def _pq_purge_batch(spark, path: str, batch_id: str) -> int:
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


def _pq_mean_quant_err(
    vectors: DataFrame,
    centroids: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int = 16,
) -> float:
    """Mean residual quantization error — Σ_j min_c ‖r_j − c_{j,c}‖² per
    vector, averaged over a deterministic 1/``sample_mod`` hash-sample
    (all rows when the sample is empty or ``sample_mod <= 1``). This is
    the PQ analogue of the IVF drift probe's assign-distance: under
    ingest drift the residual distribution escapes what the frozen
    codebooks were trained on, ADC distances degrade, and the error
    rises — measurable ONLY from raw vectors (codes are lossy), which is
    why every caller here takes a vectors DataFrame. One Arrow pass
    emitting per-batch (sum, count) partials, one two-row-ish agg."""
    import numpy as np

    bks = codebooks

    def _err(pdfs):
        import pandas as pd

        m = bks.shape[0]
        dsub = bks.shape[2]
        for pdf in pdfs:
            if pdf.empty:
                continue
            R = np.array(pdf["residual"].tolist(), dtype=np.float64)
            tot = np.zeros(len(R))
            for j in range(m):
                tot += _sq_dists(R[:, j * dsub:(j + 1) * dsub], bks[j]).min(axis=1)
            yield pd.DataFrame({"s": [float(tot.sum())], "n": [len(R)]})

    from .similarity import ivf_assign

    def mean_over(df: DataFrame) -> float | None:
        assigned = ivf_assign(df, centroids, vec_col=vec_col, id_col=id_col)
        res = _residuals(df, assigned, centroids, vec_col, id_col)
        r = (
            res.select("residual")
            .mapInPandas(_err, schema="s double, n long")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .first()
        )
        return None if not r["n"] else float(r["s"]) / float(r["n"])

    if sample_mod > 1:
        sampled = vectors.filter(
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(sample_mod)) == 0
        )
        d = mean_over(sampled)
        if d is not None:
            return d
    d = mean_over(vectors)
    return float(d if d is not None else 0.0)


def pq_write(
    res_codes: DataFrame,
    path: str,
    codebooks,
    centroids: DataFrame,
    batch_id: str = "base",
    vectors: DataFrame | None = None,
    baseline_sample_mod: int = 1,
) -> None:
    """Persist a residual-PQ index with its physical layout: codes written
    **partitioned by centroid_id** (the on-disk inverted file — probes
    scan only routed cells, same as similarity.ivf_write) plus a
    versioned ``_pq_meta/<id>`` sidecar holding the codebooks and
    centroid table (underscore dir: invisible to data discovery). At
    100 TB the data dirs hold m bytes per vector; the sidecar is KBs.

    r11: rows additionally partition by ``batch=<batch_id>`` under a
    committed-batches manifest (the BM25/IVF atomic-rename scalars), and
    the codebooks+centroids become INDEX-RESIDENT and versioned — the
    manifest's ``meta`` key names the committed ``_pq_meta/<id>`` set,
    so :func:`pq_append` routes/encodes with exactly what the committed
    probe uses and :func:`pq_recompact`'s retrained set flips atomically
    with its re-encoded rows. Rebuild-over-existing deletes the old tree
    first and pins static partition overwrite, so a crashed rebuild is a
    LOUD manifest-less index, never a silent mix of two corpora.

    Pass ``vectors`` (the original embeddings the codes came from) to
    stamp the manifest with a ``quant_err_baseline`` — the yardstick
    :func:`pq_needs_recompact` measures codebook drift against. Optional
    because codes alone can't yield it (PQ is lossy); without it the
    drift probe refuses rather than inventing a baseline.

    ``baseline_sample_mod`` defaults to 1 — full-corpus baseline —
    because the probe side computes its current error over the FULL
    caller sample (``sample_mod=1``); stamping from a 1/16 hash-sample
    while comparing against a full-sample current reading put
    asymmetric sampling noise on the two sides of the ratio, enough to
    flip the 1.25 threshold on small or skewed corpora (ADVICE r11).
    On corpora too large for one extra full pass at build time, raise
    it and apply the SAME mod to the probe's sample — symmetry is the
    requirement, not any particular mod."""
    from ..fsutil import delete
    from .search import _check_batch_id, _commit_scalars

    _check_batch_id(batch_id)
    spark = res_codes.sparkSession
    delete(spark, path, recursive=True)  # old data + old manifest lineage
    res_codes.withColumn("batch", F.lit(batch_id)).write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("centroid_id", "batch").parquet(path)
    _pq_meta_write(spark, path, batch_id, codebooks, centroids)
    n_rows = (
        spark.read.parquet(path).filter(F.col("batch") == batch_id).count()
    )
    meta: dict = {
        "batches": [batch_id],
        "meta": batch_id,
        # per-batch row counts: keeps the tombstone_frac scheduler term
        # metadata-only (r12)
        "batch_counts": {batch_id: int(n_rows)},
    }
    if vectors is not None:
        meta["quant_err_baseline"] = _pq_mean_quant_err(
            vectors, centroids, codebooks, sample_mod=baseline_sample_mod
        )
    _commit_scalars(spark, path, meta, parent_version=0)


def _pq_meta_write(spark, path: str, set_id: str, codebooks, centroids) -> None:
    m, k_eff, dsub = codebooks.shape
    flat = [
        (int(j), int(c), [float(x) for x in codebooks[j, c]])
        for j in range(m)
        for c in range(k_eff)
    ]
    root = path.rstrip("/") + f"/_pq_meta/{set_id}"
    local_frame(spark, 
        flat, "subspace int, code int, entry array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{root}/books")
    centroids.coalesce(1).write.mode("overwrite").parquet(f"{root}/centroids")


def pq_read_meta(spark, path: str):
    """(codebooks ndarray, centroids DataFrame) — the COMMITTED set the
    manifest's ``meta`` key names. Raises on a pre-r11 index (no
    manifest): rebuild with pq_write — a stale driver-side set would
    silently encode/route against books the committed probe no longer
    uses (the same reasoning as similarity.ivf_load_centroids)."""
    import numpy as np

    meta = _pq_read_manifest(spark, path)
    if meta is None or not meta.get("meta"):
        raise RuntimeError(
            f"PQ index at {path} predates the lifecycle layout (no "
            "committed _pq_meta set) — rebuild with pq_write"
        )
    root = path.rstrip("/") + f"/_pq_meta/{meta['meta']}"
    rows = spark.read.parquet(f"{root}/books").collect()
    m = max(r["subspace"] for r in rows) + 1
    k_eff = max(r["code"] for r in rows) + 1
    dsub = len(rows[0]["entry"])
    books = np.empty((m, k_eff, dsub))
    for r in rows:
        books[r["subspace"], r["code"]] = r["entry"]
    cent = spark.read.parquet(f"{root}/centroids")
    return books, cent


def pq_append(
    new_vectors: DataFrame,
    index_path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    batch_id: str | None = None,
) -> dict:
    """Incrementally add vectors to a persisted PQ index: route to the
    COMMITTED coarse centroids, encode residuals with the COMMITTED
    codebooks, and append into the centroid_id partition layout — new
    files land only in touched partitions, nothing re-encodes. Because
    encoding is a deterministic per-vector function of (centroids,
    codebooks), build(A) + append(B) produces code-for-code what
    build-encoding A∪B against the same set would — the differential
    the tests pin and the ns_ann_pq_indexed oracle value-hashes.

    Crash consistency — the ivf_append batch-visibility switch verbatim:
    rows land under ``batch=<batch_id>`` invisible to probes, the
    manifest version-commit is the one visibility flip, a re-append of a
    crashed id purges and rewrites (idempotent), of a committed id is a
    metadata no-op, and a manifest version race retries once from the
    fresh manifest after re-verifying the batch directories still exist
    (ADVICE r10: a concurrent repair with an undersized age gate could
    purge the young batch between verify and retry). If a
    :func:`pq_recompact` flipped the meta set mid-append, the retry
    aborts LOUDLY — the landed rows were encoded with the OUTGOING
    books/centroids and would score garbage under the committed LUTs;
    they stay invisible orphans for repair, re-append the batch.

    Assumes batch ids are disjoint from the indexed corpus (the shared
    incremental-index contract). Frozen-set encoding quality decays
    under ingest drift: poll :func:`pq_needs_recompact` with a raw
    sample of recent ingest, answer with :func:`pq_recompact`."""
    import uuid as _uuid

    from .search import _check_batch_id, _commit_scalars, _read_scalars

    spark = new_vectors.sparkSession
    meta = _pq_read_manifest(spark, index_path)
    if meta is None or not meta.get("meta"):
        raise RuntimeError(
            f"PQ index at {index_path} predates the lifecycle layout — "
            "rebuild with pq_write before appending"
        )
    books, cent = pq_read_meta(spark, index_path)
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
    _pq_purge_batch(spark, index_path, batch_id)  # crashed-attempt leftovers
    from .similarity import ivf_assign

    assigned = ivf_assign(new_vectors, cent, vec_col=vec_col, id_col=id_col)
    rcodes = pq_encode_residual(
        new_vectors, assigned, cent, books, vec_col=vec_col, id_col=id_col
    )
    rcodes.withColumn("batch", F.lit(batch_id)).write.mode("append").partitionBy(
        "centroid_id", "batch"
    ).parquet(index_path)
    n_added = (
        spark.read.parquet(index_path).filter(F.col("batch") == batch_id).count()
    )
    if n_added > 0 and batch_id not in _pq_batch_dirs(spark, index_path):
        raise IOError(
            f"pq_append: batch={batch_id} directories at {index_path} were "
            "reclaimed before the manifest commit (concurrent repair with an "
            "undersized age gate?) — aborting; re-append the batch"
        )

    def _meta_with(base: dict) -> dict:
        m2 = {k: v for k, v in base.items() if k != "_version"}
        m2["batches"] = [*(base.get("batches") or []), batch_id]
        m2["batch_counts"] = {
            **(base.get("batch_counts") or {}),
            batch_id: int(n_added),
        }
        return m2

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
        if fresh.get("meta") != meta.get("meta"):
            raise RuntimeError(
                f"pq_append: the codebook/centroid set at {index_path} was "
                "recompacted while this append was in flight — the landed "
                f"batch={batch_id} rows were encoded with the OUTGOING set "
                "and would score garbage under the committed LUTs; aborting "
                "the commit (the rows are invisible orphans, repair reclaims "
                "them) — re-append the batch"
            )
        if n_added > 0 and batch_id not in _pq_batch_dirs(spark, index_path):
            raise IOError(
                f"pq_append: batch={batch_id} directories at {index_path} "
                "were reclaimed before the manifest retry commit — "
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


def _pq_tombstones(spark, path: str, meta: dict, id_col: str = "vec_id"):
    """Union of committed tombstone id tables (``_tombstones/<tid>``),
    or None when the index has no deletions — the IVF twin."""
    tids = meta.get("tombstones") or []
    if not tids:
        return None
    df = spark.read.parquet(*[f"{path.rstrip('/')}/_tombstones/{t}" for t in tids])
    return df.select(F.col(id_col)).distinct()


def pq_delete(
    spark,
    path: str,
    ids: DataFrame,
    id_col: str = "vec_id",
    batch_id: str | None = None,
) -> dict:
    """Delete vectors from a persisted PQ index by id — identical
    semantics and machinery to :func:`similarity.ivf_delete` (logical
    tombstone batch now, probes mask by id, the next
    :func:`pq_recompact` is the physical purge and clears the list;
    crash-consistent one-commit visibility, idempotent re-delete,
    version-race retry safe across a meta flip because masking is
    id-keyed). See the IVF twin's docstring for the full contract,
    including the re-append-while-tombstoned caveat."""
    import uuid as _uuid

    from ..fsutil import delete as _fs_delete, exists as _fs_exists
    from .search import (
        _check_batch_id,
        _commit_scalars,
        _read_scalars,
        _verify_tombstone_reuse,
    )

    meta = _pq_read_manifest(spark, path)
    if meta is None or not meta.get("meta"):
        raise RuntimeError(
            f"PQ index at {path} predates the lifecycle layout — rebuild "
            "with pq_write before deleting"
        )
    if batch_id is None:
        batch_id = "t" + _uuid.uuid4().hex
    _check_batch_id(batch_id)
    tdir = f"{path.rstrip('/')}/_tombstones/{batch_id}"
    if batch_id in (meta.get("tombstones") or []):
        # ADVICE r11: reused batch_id with a different id set must refuse,
        # not silently skip those deletions
        _verify_tombstone_reuse(spark, tdir, ids, id_col, batch_id)
        return {
            "n_ids": 0,
            "version": meta["_version"],
            "tombstone_id": batch_id,
            "skipped": True,
        }
    _fs_delete(spark, tdir, recursive=True)
    ids.select(F.col(id_col)).distinct().write.mode("overwrite").parquet(tdir)
    n_ids = spark.read.parquet(tdir).count()
    if n_ids > 0 and not _fs_exists(spark, tdir):
        raise IOError(
            f"pq_delete: tombstone dir {tdir} was reclaimed before the "
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
            _verify_tombstone_reuse(spark, tdir, ids, id_col, batch_id)
            return {
                "n_ids": 0,
                "version": fresh["_version"],
                "tombstone_id": batch_id,
                "skipped": True,
            }
        if n_ids > 0 and not _fs_exists(spark, tdir):
            raise IOError(
                f"pq_delete: tombstone dir {tdir} was reclaimed before "
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


def pq_needs_recompact(
    spark,
    path: str,
    sample_vectors: DataFrame,
    threshold: float = 1.25,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_tombstone_frac: float | None = 0.25,
) -> dict:
    """Scheduler probe for codebook drift: appends encode with frozen
    centroids AND codebooks, so an ingest distribution that escapes the
    training one inflates the residual quantization error — ADC
    shortlists degrade with it. Compares ``sample_vectors``' mean
    quantization error under the COMMITTED set against the manifest's
    build-time ``quant_err_baseline``. The sample must be RAW vectors
    (recent ingest, or a hash-sample of the snapshot table) — the index
    alone can't measure this, codes are lossy. Refuses on an index
    written without a baseline (pq_write's ``vectors=`` arg). Returns
    {"recompact", "ratio", "current", "baseline", "n_batches",
    "tombstone_frac"} — the frac term (r12) trips the probe at
    ``max_tombstone_frac`` deleted mass, the needs_compaction twin."""
    meta = _pq_read_manifest(spark, path)
    if meta is None or not meta.get("meta"):
        raise RuntimeError(
            f"PQ index at {path} predates the lifecycle layout — rebuild "
            "with pq_write to enable the drift probe"
        )
    baseline = meta.get("quant_err_baseline")
    if baseline is None:
        raise RuntimeError(
            f"PQ index at {path} has no quant_err_baseline — rebuild or "
            "recompact with vectors= to stamp one"
        )
    books, cent = pq_read_meta(spark, path)
    current = _pq_mean_quant_err(
        sample_vectors, cent, books, vec_col, id_col, sample_mod=1
    )
    ratio = current / max(float(baseline), 1e-12)
    # r12: the deletion term (the needs_compaction/ivf_needs_recompact
    # twin) — probes pay the tombstone anti-join until the recompact
    # purges, and the manifest's batch/tombstone counts keep the check
    # metadata-only (pre-r12 manifests fall back to footer-stat counts)
    from .search import _tombstone_mass

    committed = meta.get("batches") or []
    counts = meta.get("batch_counts") or {}
    if committed and all(b in counts for b in committed):
        n_rows = sum(int(counts[b]) for b in committed)
    else:
        n_rows = (
            spark.read.parquet(path)
            .filter(F.col("batch").isin(committed))
            .count()
        )
    mass = _tombstone_mass(spark, path, meta)
    tombstone_frac = mass / max(n_rows, 1)
    trip_tomb = (
        max_tombstone_frac is not None and tombstone_frac >= max_tombstone_frac
    )
    return {
        "recompact": bool(ratio > threshold or trip_tomb),
        "ratio": float(ratio),
        "current": current,
        "baseline": float(baseline),
        "n_batches": len(committed),
        "tombstone_frac": float(tombstone_frac),
    }


def pq_recompact(
    spark,
    path: str,
    vectors: DataFrame,
    n_centroids: int | None = None,
    m: int | None = None,
    k: int | None = None,
    iters: int = 10,
    seed: int = 42,
    refine_iterations: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    reclaim_min_age_seconds: float | None = None,
    baseline_sample_mod: int = 1,
) -> dict:
    """Retrain the coarse centroids AND the residual codebooks and
    re-encode every row — the PQ drift repair, the lossy-index twin of
    ``similarity.ivf_recompact``. Because codes can't be decoded back to
    training data, the caller supplies ``vectors``: the ORIGINAL
    embeddings of exactly the committed corpus (the snapshot table the
    streaming sinks maintain is the natural source). Guarded by a count
    check — recompacting over a partial corpus would silently shrink
    the index under one atomic flip.

    Training reuses the exact deterministic recipes of a fresh build
    (``similarity._train_centroids`` + :func:`pq_train_residual`), so
    recompact ≡ build-from-scratch over the same corpus — codes, meta,
    and probe results identical by construction (tested row-identical).

    Crash consistency — one visibility switch for data AND meta: the new
    ``_pq_meta/<cid>`` set and the re-encoded rows under ``batch=<cid>``
    both land invisible, then ONE scalars commit flips ``batches`` to
    ``[cid]``, ``meta`` to ``cid``, and resets ``quant_err_baseline``;
    old batches (and the outgoing meta set, which shares their ids) are
    retirement-stamped and reclaimed age-gated by
    :func:`pq_index_repair`. Losing the version rename to a concurrent
    appender aborts LOUDLY (its batch was encoded with the outgoing
    set) — single-writer maintenance, the shared contract."""
    import time as _time
    import uuid as _uuid

    from .search import _check_batch_id, _commit_scalars
    from .similarity import _train_centroids, ivf_assign

    meta = _pq_read_manifest(spark, path)
    if meta is None or not meta.get("meta"):
        raise RuntimeError(
            f"PQ index at {path} predates the lifecycle layout — rebuild "
            "with pq_write before recompacting"
        )
    committed = meta.get("batches") or []
    live = spark.read.parquet(path).filter(F.col("batch").isin(committed))
    tomb = _pq_tombstones(spark, path, meta, id_col)
    if tomb is not None:
        live = live.join(tomb, id_col, "left_anti")
    n_index = live.count()
    n_vec = vectors.count()
    if n_vec != n_index:
        raise RuntimeError(
            f"pq_recompact: vectors= holds {n_vec} rows but the committed "
            f"index holds {n_index} LIVE (non-tombstoned) rows — "
            "recompaction re-encodes the whole live corpus from its "
            "original vectors (codes are lossy); pass exactly the live "
            "corpus (e.g. the snapshot table minus deleted ids)"
        )
    if tomb is not None:
        n_dead = vectors.join(tomb, id_col, "left_semi").count()
        if n_dead:
            raise RuntimeError(
                f"pq_recompact: vectors= contains {n_dead} TOMBSTONED ids — "
                "recompacting them back in would undelete them (the erasure "
                "guarantee); exclude the deleted ids from the source corpus"
            )
    old_books, _ = pq_read_meta(spark, path)
    if m is None:
        m = int(old_books.shape[0])
    if k is None:
        k = int(old_books.shape[1])
    if n_centroids is None:
        n_centroids = int(
            spark.read.parquet(
                path.rstrip("/") + f"/_pq_meta/{meta['meta']}/centroids"
            ).count()
        )
    cent = _train_centroids(
        vectors, int(n_centroids), vec_col, id_col, seed, refine_iterations
    )
    assigned = ivf_assign(vectors, cent, vec_col=vec_col, id_col=id_col)
    books = pq_train_residual(
        vectors, assigned, cent, m=m, k=k, vec_col=vec_col, id_col=id_col,
        iters=iters,
    )
    rcodes = pq_encode_residual(
        vectors, assigned, cent, books, vec_col=vec_col, id_col=id_col
    )
    cid = "rc" + _uuid.uuid4().hex[:16]
    _check_batch_id(cid)
    _pq_meta_write(spark, path, cid, books, cent)
    rcodes.withColumn("batch", F.lit(cid)).write.mode("append").partitionBy(
        "centroid_id", "batch"
    ).parquet(path)
    n_rows = spark.read.parquet(path).filter(F.col("batch") == cid).count()
    if n_rows > 0 and cid not in _pq_batch_dirs(spark, path):
        raise IOError(
            f"pq_recompact: batch={cid} directories at {path} were "
            "reclaimed before the manifest commit — aborting; re-run"
        )
    # sample_mod symmetry with pq_needs_recompact's full-sample current
    # reading (ADVICE r11): the freshly-stamped baseline must carry the
    # same sampling policy as the probe side or noise flips the ratio
    baseline = _pq_mean_quant_err(
        vectors, cent, books, vec_col, id_col,
        sample_mod=baseline_sample_mod,
    )
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
                "meta": cid,
                "quant_err_baseline": baseline,
                "batch_counts": {cid: int(n_rows)},
                "retired": retired,
            },
            parent_version=meta["_version"],
        )
    except IOError as e:
        raise RuntimeError(
            f"pq_recompact at {path} lost the manifest version race (a "
            "concurrent appender committed mid-recompact — its batch was "
            "encoded with the OUTGOING meta set and is not in the "
            "recompacted corpus). Nothing flipped: probes still see the "
            "old index; the staged batch+meta are unreferenced orphans "
            "repair reclaims age-gated. Re-run in a quiesced maintenance "
            "window (single-writer contract)"
        ) from e
    rep = pq_index_repair(spark, path, min_age_seconds=reclaim_min_age_seconds)
    return {
        "mode": "recompact",
        "batch_id": cid,
        "n_vectors": int(n_rows),
        "n_centroids": int(n_centroids),
        "m": int(m),
        "k": int(k),
        "baseline": baseline,
        "version": version,
        "purged_batches": len(rep["purged_batches"]),
    }


def pq_index_repair(
    spark, path: str, min_age_seconds: float | None = None
) -> dict:
    """Reclaim storage of PQ batch directories and ``_pq_meta`` sets that
    are NOT committed, once safely old — the ``ivf_index_repair``
    posture verbatim: crashed appends/recompacts gate on their newest
    directory mtime (young uncommitted dirs are indistinguishable from
    an in-flight writer's), retirement-stamped batches gate on the
    stamped retirement time (in-flight probes that planned against the
    pre-flip manifest get the grace period), meta sets ride their
    introducing batch id's age decision, and reclaimed ids drop from
    ``retired``. Probes never see any of this (they filter to committed
    batches and read the committed meta set) — repair is storage
    reclamation, not a correctness fix. Returns {"purged_batches",
    "deferred_batches", "meta_swept"}."""
    import time as _time

    from ..fsutil import delete, list_status
    from .search import (
        DEFAULT_RECLAIM_MIN_AGE,
        _drop_retired_entries,
        _tree_max_mtime_ms,
    )

    if min_age_seconds is None:
        min_age_seconds = DEFAULT_RECLAIM_MIN_AGE
    meta = _pq_read_manifest(spark, path)
    if meta is None:
        raise RuntimeError(
            f"PQ index at {path} predates the lifecycle layout — rebuild "
            "with pq_write to enable repair"
        )
    committed = set(meta.get("batches") or [])
    retired = meta.get("retired") or {}
    now = _time.time()
    mtimes = _pq_batch_dirs(spark, path)
    purged, deferred = [], []
    for b in sorted(set(mtimes) - committed):
        age = now - (retired[b] if b in retired else mtimes[b] / 1000.0)
        if age >= min_age_seconds:
            _pq_purge_batch(spark, path, b)
            purged.append(b)
        else:
            deferred.append(b)
    meta_swept: list[str] = []
    live = meta.get("meta")
    for st in list_status(spark, path.rstrip("/") + "/_pq_meta"):
        sid = st["name"]
        if not st["is_dir"] or sid == live:
            continue
        if sid in deferred:
            continue
        age = now - (
            retired[sid] if sid in retired else
            (_tree_max_mtime_ms(spark, path.rstrip("/") + f"/_pq_meta/{sid}")
             or st["mtime_ms"]) / 1000.0
        )
        if age >= min_age_seconds and delete(
            spark, path.rstrip("/") + f"/_pq_meta/{sid}", recursive=True
        ):
            meta_swept.append(sid)
    # tombstone id tables (r11 pq_delete) — crashed deletes mtime-gated,
    # recompact-retired ones stamp-gated, same as the IVF twin
    tombstones_swept: list[str] = []
    committed_t = set(meta.get("tombstones") or [])
    tdirs: dict[str, dict] = {}
    for st in list_status(spark, path.rstrip("/") + "/_tombstones"):
        if st["is_dir"]:
            tdirs[st["name"]] = st
    for tid in sorted(set(tdirs) - committed_t):
        age = now - (
            retired[tid] if tid in retired else
            (_tree_max_mtime_ms(spark, path.rstrip("/") + f"/_tombstones/{tid}")
             or tdirs[tid]["mtime_ms"]) / 1000.0
        )
        if age >= min_age_seconds and delete(
            spark, path.rstrip("/") + f"/_tombstones/{tid}", recursive=True
        ):
            tombstones_swept.append(tid)
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
        "meta_swept": meta_swept,
        "tombstones_swept": tombstones_swept,
    }


def ivf_adc_topk_pruned(
    spark,
    path: str,
    queries,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    allowed_ids: DataFrame | None = None,
) -> DataFrame:
    """Residual IVFADC against a PERSISTED pq_write index: routes each
    query ONCE (the same probes/LUTs feed both the partition filter and
    the scoring pass) and scans only the routed cells — centroid_id
    reaches the parquet scan as a partition filter, the
    build-once-probe-many deployment shape. r11: reads only batches the
    committed manifest lists (the batch-visibility contract — half-landed
    appends and staged recompacts are invisible) with the COMMITTED
    codebook/centroid set.

    ``allowed_ids`` (r12, filtered search): allow-list semi-join after
    the pruned scan and the tombstone mask — the similarity.ivf twin's
    shape, same post-filtering trade (selective filters under-fill at
    small ``n_probe``/``k``; exhaustive settings are exact)."""
    books, cent = pq_read_meta(spark, path)
    meta = _pq_read_manifest(spark, path)
    probes, luts = _residual_probes(cent, books, queries, n_probe)
    needed = sorted({cid for _, cid in probes})
    codes = spark.read.parquet(path).filter(
        F.col("centroid_id").isin(needed)  # partition-pruned scan
        & F.col("batch").isin(meta.get("batches") or [])
    )
    tomb = _pq_tombstones(spark, path, meta, id_col)
    if tomb is not None:
        # logical deletes (pq_delete): masked after the pruned scan,
        # keyed by id — only routed-cell rows reach the anti-join
        codes = codes.join(tomb, id_col, "left_anti")
    if allowed_ids is not None:
        # filtered search (r12): allow-list twin of the tombstone mask
        codes = codes.join(
            allowed_ids.select(F.col(id_col)).distinct(), id_col, "left_semi"
        )
    return ivf_adc_topk(
        codes, cent, books, queries, k, n_probe, id_col,
        _probes_luts=(probes, luts),
    )


def ivf_adc_topk_rerank(
    spark,
    path: str,
    vectors: DataFrame,
    queries,
    k: int = 10,
    n_probe: int = 4,
    shortlist: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    allowed_ids: DataFrame | None = None,
) -> DataFrame:
    """IVFADC with exact re-ranking — the "R" refinement of the IVFADC
    paper (Jégou, Douze, Schmid 2011 §V.D: ADC orders a shortlist, exact
    distances on the raw vectors of just those candidates fix the final
    ordering). The r11 drift study (SCALING.md) is the motivation in
    numbers: ADC distances are quantization-noisy even in-distribution
    (recall@10 ≈ 0.43 at the m=8/k=64 budget), and re-ranking is the
    standard cheap fix for everything EXCEPT candidates ADC missed
    entirely (those need n_probe/shortlist/budget growth).

    Cost shape at 100 TB: the ADC pass is the same routed-cell
    partition-pruned scan as :func:`ivf_adc_topk_pruned` (m gathers per
    row, local-top-``shortlist`` pre-reduction); the exact pass touches
    only |Q| × shortlist rows — the semi-join against the raw-vector
    table (``vectors``: the snapshot table / system-of-record the PQ
    deployment keeps anyway, since codes are lossy) moves the shortlist
    ids, not the corpus, and the per-row exact L2 is a single zip_with
    fold. Returns (query_id, vec_id, l2_dist, rank) under the
    deterministic (l2_dist 6dp, vec_id) total order.

    Exactness theorem the oracle hashes: with ``n_probe`` = all cells
    and ``shortlist`` ≥ the corpus size, the shortlist IS the committed
    corpus, so the result EQUALS exact L2 brute-force top-k — making
    the whole chain (committed-batch visibility, routing, ADC ordering
    feeding the shortlist, the raw-vector join, the exact re-rank)
    SQL-mirrorable despite PQ's lossiness."""
    from ..functions.scalars import portable_round

    short = ivf_adc_topk_pruned(
        spark, path, queries, k=shortlist, n_probe=n_probe, id_col=id_col,
        allowed_ids=allowed_ids,
    ).select("query_id", F.col("vec_id").alias(id_col))
    qdf = local_frame(spark, 
        [(int(q), [float(x) for x in v]) for q, v in queries],
        "query_id long, __qv array<double>",
    )
    l2 = F.aggregate(
        F.zip_with(
            vec_col, "__qv",
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        short.join(vectors.select(F.col(id_col), F.col(vec_col)), id_col)
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", id_col, portable_round(l2, 6).alias("l2_dist"))
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.asc("l2_dist"), F.asc(id_col)],
        k,
        rank_col="rank",
    )
