#!/usr/bin/env python
"""Measure the RELATIONAL headline queries' wall-clock scaling one decade
up (default 10x of sf0.1 ~= sf1), the same harness that produced
SCALING.md's north-star 10x table.

The replica re-keys each copy so the scaled tables are valid TPC-H-ish
data, not degenerate duplicates:

- lineitem/orders: ``*_orderkey + i * 10_000_000`` per copy i — foreign
  keys stay consistent, order grain grows 10x over the same dimensions
  (the realistic shape: more facts, same customers/parts/suppliers).
- events: ``user_id + i * 10_000_000`` and re-keyed event ids — each copy
  is an independent user population, so sessionization's per-user gap
  structure is preserved (un-keyed replication would stack 10 identical
  events on every timestamp and CHANGE the session count, measuring a
  different query).
- dimensions (region/nation/customer/supplier/part) and
  documents/embeddings copy unchanged.

Timing protocol mirrors bench.py: warm every query at sf0.001 first
(codegen + parquet footers + the Arrow worker pool), then min-of-2 at
each scale through the noop sink.

Usage: python tools/scale_bench.py [--factor 10] [--base /root/testdata/sf0.1]
           [--out /tmp/sf1_replica] [--queries q1,q2,...]
           [--mode relational|docs|bm25-probe|bm25-append|cc-converged]
           [--perturb suffix|translate]

Modes: ``relational`` (default) builds the re-keyed fact replica and
times the headline queries; ``docs`` builds perturbed documents/
embeddings replicas for north-star ops (pick --perturb per operator
family — see build_docs_replica); ``bm25-probe`` times ONLY the probe
against persisted BM25 indexes built untimed at both scales;
``bm25-append`` measures bm25_index_append along BOTH scaling axes
(VERDICT r7 #4: cost must track BATCH size and stay flat in CORPUS
size); ``cc-converged`` measures the connected-components converged
short-circuit (re-invocation on a stable round log must cost a manifest
read + input fingerprint, never a star round); ``champions-refresh``
measures bm25_champions_refresh along the same two axes as bm25-append
(VERDICT r9 #1: flat in corpus size, linear in batch size, vs the
O(corpus) full rebuild); ``cc-decade`` measures the distributed
connected-components fixpoint — simhash-pair edges on the perturbed
replica (round counts from the round log) PLUS a synthetic chain series
whose diameter grows with n, the shape that actually drives the
O(log² n) round bound (replica dup clusters have constant diameter, so
their round count is flat by construction — the chains make round
growth observable).

Every mode stamps ``driver_mem`` into its JSON (VERDICT r9 #5: 24g-heap
sessions run sf0.1 bases 2-4× slower than 8g ones, so scale ratios are
only meaningful against an in-session same-heap base — which is what
every mode here measures; the stamp makes cross-record comparisons
auditable).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q18",
    "flagship_priority_revenue",
    "a_stats_kit",
    "w_sessionization",
    "s_snapshot_kit",
]

COPY_AS_IS = ["region", "nation", "customer", "supplier", "part", "documents", "embeddings"]


def _op_queries() -> dict:
    """Operator-level callables for scale rows whose extended_queries()
    entries are deliberately id-bounded (they cap pair-join inputs so the
    ORACLE sweep stays cheap): the scale measurement must consume the
    FULL replica, so it calls the operator directly — same parameters as
    the north-star 10× table rows."""
    from pyspark.sql import functions as F

    from pwhl_data_engineering_pipeline_spark.operators import dedup
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    def ngram_jaccard_auto(spark, sf_dir):
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        docs = read_testdata(spark, sf_dir, "documents").repartition(n_part)
        return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_gram_df="auto")

    def minhash_pairs(spark, sf_dir):
        # same parameters as bench.py's BENCH_ONLY ns_minhash_pairs stage
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        docs = read_testdata(spark, sf_dir, "documents").repartition(n_part)
        return dedup.minhash_candidate_pairs(docs, num_hashes=64, num_bands=8)

    def simhash_pairs(spark, sf_dir):
        # same parameters as bench.py's BENCH_ONLY ns_simhash_pairs stage
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        docs = read_testdata(spark, sf_dir, "documents").repartition(n_part)
        return dedup.simhash_near_pairs(
            docs, max_hamming=12, n_bands=4, method="arrow"
        )

    def vector_mean_arrow(spark, sf_dir):
        # the 100 TB centroid path (partial means, no ×dim explode) — the
        # oracle-exact long form ns_vector_centroids measures the
        # documented anti-pattern instead (5.9× at 10×, see SCALING.md)
        from pwhl_data_engineering_pipeline_spark.operators import vector_agg

        emb = read_testdata(spark, sf_dir, "embeddings")
        return vector_agg.vector_mean_arrow(emb, ["label"], "embedding")

    return {
        "op_ngram_jaccard_auto": ngram_jaccard_auto,
        "op_minhash_pairs": minhash_pairs,
        "op_simhash_pairs": simhash_pairs,
        "op_vector_mean_arrow": vector_mean_arrow,
    }


def build_replica(spark, base: str, out: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    os.makedirs(out, exist_ok=True)
    for t in COPY_AS_IS:
        read_testdata(spark, base, t).write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    orders = read_testdata(spark, base, "orders")
    lineitem = read_testdata(spark, base, "lineitem")
    events = read_testdata(spark, base, "events")
    o_parts, l_parts, e_parts = [], [], []
    for i in range(factor):
        okey = i * 10_000_000
        o_parts.append(orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(okey)))
        l_parts.append(lineitem.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(okey)))
        e_parts.append(
            events.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
            .withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
        )

    def union_all(parts):
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    union_all(o_parts).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    union_all(l_parts).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    union_all(e_parts).write.mode("overwrite").parquet(f"{out}/events.parquet")


def build_docs_replica(
    spark, base: str, out: str, factor: int, perturb: str = "suffix"
) -> None:
    """Documents/embeddings replica for north-star ops, re-id'd and
    text-perturbed. The perturbation choice decides WHAT a 10x run
    measures, so pick it per operator family:

    - ``suffix``: one per-copy tag token appended. Copies share ~all their
      vocabulary and shingles — the right scale model for TERM-STATS ops
      (BM25 df, LM counts: real 10x corpora mostly reuse vocabulary), but
      it makes every doc part of a 10-member NEAR-DUP cluster, so for
      similarity ops it measures 10x duplicate DENSITY, not 10x scale.
    - ``translate``: copy i>0 applies a Caesar-rotated alphabet
      (``F.translate``, a character bijection) — within-copy Jaccard is
      EXACTLY the original's (for both char shingles and word n-grams)
      while cross-copy shingle overlap is ~zero: a 10x corpus at the
      ORIGINAL duplicate density, the right scale model for
      dedup/similarity ops. (A per-word tag suffix does NOT achieve
      this for char shingles: a tagged word still shares most of its
      5-char shingles with its original, giving every cross-copy pair
      Jaccard ~0.4 and flooding banded LSH with sub-threshold
      candidates — measured round 6, see SCALING.md.)

    ``translate`` at factor > 26: the alphabet admits only 26 distinct
    rotations, so copies i and i+26 are byte-identical texts — a
    factor-100 replica carries ~4-member exact-duplicate clusters
    (≈ 3 duplicate partners per doc). That is a REALISTIC shape for a
    100× crawl (true duplicates exist at scale and are exactly what
    dedup is for), and the extra candidate/verify volume is linear in
    the corpus (clusters are size-4, never quadratic); the 100× rows in
    SCALING.md note it. The embedding rotation has period dim (e.g. 64),
    with the same reading.

    - ``permute``: copy i>0 applies an INDEPENDENT seeded uniform
      alphabet permutation (``random.Random(i)``) — still a character
      bijection, so within-copy Jaccard is exactly preserved, but the
      permutation space is 26! (and dim! for the embedding analog), so
      distinct copies essentially never collide at ANY factor. This is
      the honest pure-scale model for the THIRD decade (factor 1000),
      where ``translate``'s period 26 would make ~38-member exact-dup
      clusters and the measurement would track verified-pair OUTPUT
      growth instead of corpus scale (VERDICT r8 #4).
    """
    from pyspark.sql import functions as F

    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    os.makedirs(out, exist_ok=True)
    docs = read_testdata(spark, base, "documents")
    emb = read_testdata(spark, base, "embeddings")
    # one dim lookup for ALL copies (inside the loop it would be one
    # Spark job per copy — 1000 jobs at the third decade)
    dim = (
        len(emb.select("embedding").first()["embedding"])
        if perturb in ("translate", "permute")
        else 0
    )
    d_parts, e_parts = [], []
    for i in range(factor):
        if perturb == "translate" and i > 0:
            import string

            alpha = string.ascii_lowercase
            text = F.translate(F.col("text"), alpha, alpha[i % 26:] + alpha[:i % 26])
        elif perturb == "permute" and i > 0:
            import random
            import string

            alpha = string.ascii_lowercase
            perm = list(alpha)
            random.Random(i).shuffle(perm)
            text = F.translate(F.col("text"), alpha, "".join(perm))
        else:
            text = F.concat(F.col("text"), F.lit(f" copytag{i}"))
        # offset 1e9 per copy: several queries PLANT duplicates re-keyed
        # +10_000_000 (_PLANT_OFFSET), so a 10M replica offset would make
        # planted ids collide with copy ids — two different documents
        # sharing one doc_id poisons every id-keyed join downstream
        d_parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000))
            .withColumn("text", text)
        )
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000_000))
        if perturb == "permute" and i > 0:
            # embedding analog of the seeded alphabet permutation: a
            # seeded DIMENSION permutation per copy (orthogonal, so norms
            # and within-copy cosines are exactly preserved) — period
            # dim! instead of the rotation's dim, so no exact-dup vector
            # clusters at factor ≫ dim
            import random

            perm = list(range(dim))
            random.Random(i).shuffle(perm)
            e = e.withColumn(
                "embedding", F.array(*[F.col("embedding")[j] for j in perm])
            )
        elif perturb == "translate" and i > 0:
            # vector analog of the alphabet bijection: ROTATE dimensions by
            # i — norms and all within-copy pairwise cosines are exactly
            # preserved (a coordinate permutation is orthogonal), while a
            # copy's vector is no longer identical to its original, so
            # ANN/semantic-dedup measure 10x scale, not 10x exact-dup
            # density (un-perturbed replication makes every vector a
            # 10-member exact-dup cluster)
            r = i % dim
            e = e.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", r + 1, dim - r),
                    F.slice("embedding", 1, r),
                ),
            )
        e_parts.append(e)

    def union_all(parts):
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    union_all(d_parts).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    union_all(e_parts).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def bm25_probe_timer(spark, sf_dir: str, workdir: str):
    """Build the persisted BM25 index for ``sf_dir`` once (untimed), return
    a thunk timing ONLY the probe — the steady-state cost the partition-
    pruned layout is designed to bound."""
    from pyspark.sql import functions as F  # noqa: F401

    import __spark_entry__ as em
    from pwhl_data_engineering_pipeline_spark.operators import search
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    idx = f"{workdir}/bm25_idx_{os.path.basename(sf_dir.rstrip('/'))}"
    t0 = time.monotonic()
    search.bm25_index_write(read_testdata(spark, sf_dir, "documents"), idx, n_buckets=64)
    build_sec = round(time.monotonic() - t0, 3)
    # fresh-build layout observability (VERDICT r8 #1: repartition('bucket')
    # before the dynamic-partition write should land ~one file per
    # occupied bucket, bounding writer-side sorter memory)
    n_files = (
        spark.read.parquet(f"{idx}/postings")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    qdf = spark.createDataFrame(em._BM25_QUERIES, "query_id string, query_text string")

    def probe() -> float:
        t0 = time.monotonic()
        search.bm25_search_index(spark, idx, qdf, k=10).collect()
        return time.monotonic() - t0

    probe.build_sec = build_sec
    probe.n_posting_files = n_files
    return probe


def _rekey_docs(docs, offset: int):
    """Disjoint-id copy of a docs frame (append batches must not collide
    with indexed ids — the operator contract)."""
    from pyspark.sql import functions as F

    return docs.withColumn("doc_id", F.col("doc_id") + F.lit(offset))


def bm25_append_bench(spark, base: str, big: str, factor: int) -> dict:
    """VERDICT r7 #4 axis measurements for bm25_index_append.

    - batch axis (same corpus): appending a factor-times-bigger batch to
      the BASE index should cost ~factor× (append work is tokenize +
      write of the batch itself).
    - corpus axis (same batch): appending the SAME batch to the base
      index vs the ``factor``× index should be ~flat — the append never
      re-reads or re-tokenizes the corpus; only the scalars version and
      the per-bucket directory metadata differ.

    Indexes build untimed; each timing is min-of-2 with a fresh batch_id
    per run (idempotence would no-op a reused id). Batches re-key with
    disjoint offsets per run so df additivity's disjoint-ids contract
    holds throughout.
    """
    import tempfile

    from pwhl_data_engineering_pipeline_spark.operators import search
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    base_docs = read_testdata(spark, base, "documents")
    big_docs = read_testdata(spark, big, "documents")
    small_batch = _rekey_docs(base_docs, 7_000_000_000)          # |base| docs
    big_batch_parts = [
        _rekey_docs(base_docs, 7_000_000_000 + i * 10_000_000)
        for i in range(factor)
    ]
    big_batch = big_batch_parts[0]
    for p in big_batch_parts[1:]:
        big_batch = big_batch.unionByName(p)
    big_batch = big_batch.localCheckpoint()                      # factor×|base|
    small_batch = small_batch.localCheckpoint()

    idx_base = tempfile.mkdtemp(prefix="sb_bm25_base_")
    idx_big = tempfile.mkdtemp(prefix="sb_bm25_big_")
    search.bm25_index_write(base_docs, idx_base, n_buckets=64)
    search.bm25_index_write(big_docs, idx_big, n_buckets=64)

    run_i = [0]

    def t_append(batch, idx) -> float:
        run_i[0] += 1
        # fresh ids per run: disjoint from the index AND from prior runs
        b = _rekey_docs(batch, run_i[0] * 100_000_000)
        t0 = time.monotonic()
        search.bm25_index_append(b, idx, batch_id=f"sb{run_i[0]}")
        return time.monotonic() - t0

    t_append(small_batch, idx_base)  # warm (codegen, worker pool)
    small_on_base = round(min(t_append(small_batch, idx_base) for _ in range(2)), 3)
    big_on_base = round(min(t_append(big_batch, idx_base) for _ in range(2)), 3)
    small_on_big = round(min(t_append(small_batch, idx_big) for _ in range(2)), 3)
    return {
        "mode": "bm25-append",
        "factor": factor,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
        "batch_axis": {
            "small_batch_sec": small_on_base,
            f"x{factor}_batch_sec": big_on_base,
            "ratio": round(big_on_base / small_on_base, 2),
        },
        "corpus_axis": {
            "base_corpus_sec": small_on_base,
            f"x{factor}_corpus_sec": small_on_big,
            "ratio": round(small_on_big / small_on_base, 2),
        },
    }


def champions_refresh_bench(spark, base: str, big: str, factor: int) -> dict:
    """VERDICT r9 #1 axis measurements for bm25_champions_refresh (m=1000,
    matching champ1000.json):

    - corpus axis: appending the SAME |base|-docs batch to the base index
      vs the ``factor``× index, then refreshing the sidecar — refresh
      reads the old sidecar (≤ m rows/term) + ONLY the new batch's
      partitions, so it should be ~flat while the full rebuild it
      replaces is O(corpus) (rebuild times recorded for the comparison).
    - batch axis: refresh after a 1× batch vs a 10× batch on the base
      index — should track batch size.

    Each refresh timing is min-of-2 with a FRESH append before every run
    (a refresh consumes its staleness; a second call is a noop). Batches
    re-key with disjoint offsets (the append contract).
    """
    import tempfile

    from pwhl_data_engineering_pipeline_spark.operators import search
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    m = 1000
    base_docs = read_testdata(spark, base, "documents")
    batch10 = _rekey_docs(base_docs, 7_000_000_000)
    for i in range(1, 10):
        batch10 = batch10.unionByName(
            _rekey_docs(base_docs, 7_000_000_000 + i * 10_000_000)
        )

    run_i = [0]

    def timed_refresh(idx, batch) -> float:
        run_i[0] += 1
        b = _rekey_docs(batch, run_i[0] * 100_000_000)
        search.bm25_index_append(b, idx, batch_id=f"cr{run_i[0]}")
        t0 = time.monotonic()
        obs = search.bm25_champions_refresh(spark, idx, m=m)
        dt = time.monotonic() - t0
        assert obs["mode"] == "incremental", obs
        return dt

    out = {"mode": "champions-refresh", "factor": factor, "m": m,
           "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g")}
    for label, d in [("base", base), (f"x{factor}", big)]:
        idx = tempfile.mkdtemp(prefix=f"sb_champ_{label}_")
        docs = read_testdata(spark, d, "documents")
        t0 = time.monotonic()
        search.bm25_index_write(docs, idx, n_buckets=64)
        build_sec = time.monotonic() - t0
        t0 = time.monotonic()
        search.bm25_champions_write(spark, idx, m=m)
        rebuild_sec = time.monotonic() - t0
        timed_refresh(idx, base_docs)  # warm
        refresh_sec = min(timed_refresh(idx, base_docs) for _ in range(2))
        out[label] = {
            "index_build_sec": round(build_sec, 3),
            "sidecar_full_rebuild_sec": round(rebuild_sec, 3),
            "refresh_1x_batch_sec": round(refresh_sec, 3),
        }
        if label == "base":
            out[label]["refresh_10x_batch_sec"] = round(
                min(timed_refresh(idx, batch10) for _ in range(2)), 3
            )
    out["corpus_axis_ratio"] = round(
        out[f"x{factor}"]["refresh_1x_batch_sec"] / out["base"]["refresh_1x_batch_sec"], 2
    )
    out["batch_axis_ratio"] = round(
        out["base"]["refresh_10x_batch_sec"] / out["base"]["refresh_1x_batch_sec"], 2
    )
    out["rebuild_vs_refresh_at_big"] = round(
        out[f"x{factor}"]["sidecar_full_rebuild_sec"]
        / out[f"x{factor}"]["refresh_1x_batch_sec"], 1
    )
    return out


def ivf_append_bench(spark, base: str, big: str, factor: int) -> dict:
    """r10 axis measurements for the crash-consistent ``ivf_append``
    (same protocol as ``bm25_append_bench``): batch axis — appending a
    10× batch to the base index should cost ~10× the small batch (route
    + write the batch only); corpus axis — appending the SAME batch to
    the base index vs the ``factor``× index should be ~flat (the corpus
    is never re-read; only the manifest version and directory counts
    differ). Indexes build untimed; min-of-2 with fresh batch ids."""
    import tempfile

    from pwhl_data_engineering_pipeline_spark.operators import similarity
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    from pyspark.sql import functions as F

    def _rekey(emb, offset):
        return emb.withColumn("vec_id", F.col("vec_id") + F.lit(offset))

    base_emb = read_testdata(spark, base, "embeddings")
    big_emb = read_testdata(spark, big, "embeddings")
    small_batch = _rekey(base_emb, 7_000_000_000).localCheckpoint()
    big_batch = small_batch
    for i in range(1, 10):
        big_batch = big_batch.unionByName(
            _rekey(base_emb, 7_000_000_000 + i * 10_000_000)
        )
    big_batch = big_batch.localCheckpoint()

    cent, assigned_base = similarity.ivf_index(base_emb, n_centroids=16)
    idx_base = tempfile.mkdtemp(prefix="sb_ivf_base_") + "/index"
    similarity.ivf_write(assigned_base, idx_base, cent)
    assigned_big = similarity.ivf_assign(big_emb, cent)
    idx_big = tempfile.mkdtemp(prefix="sb_ivf_big_") + "/index"
    similarity.ivf_write(assigned_big, idx_big, cent)

    run_i = [0]

    def t_append(batch, idx) -> float:
        run_i[0] += 1
        b = _rekey(batch, run_i[0] * 100_000_000)
        t0 = time.monotonic()
        similarity.ivf_append(b, idx, cent, batch_id=f"ia{run_i[0]}")
        return time.monotonic() - t0

    t_append(small_batch, idx_base)  # warm
    small_on_base = round(min(t_append(small_batch, idx_base) for _ in range(2)), 3)
    big_on_base = round(min(t_append(big_batch, idx_base) for _ in range(2)), 3)
    small_on_big = round(min(t_append(small_batch, idx_big) for _ in range(2)), 3)
    return {
        "mode": "ivf-append",
        "factor": factor,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
        "batch_axis": {
            "small_batch_sec": small_on_base,
            "x10_batch_sec": big_on_base,
            "ratio": round(big_on_base / small_on_base, 2),
        },
        "corpus_axis": {
            "base_corpus_sec": small_on_base,
            f"x{factor}_corpus_sec": small_on_big,
            "ratio": round(small_on_big / small_on_base, 2),
        },
    }


def _gmm_batch(spark, n: int, dim: int, n_clusters: int, centers, noise: float,
               seed: int, id_base: int):
    """Synthetic GMM vectors as a DataFrame (vec_id, embedding, label=0):
    row i belongs to cluster i % n_clusters around ``centers[cluster]``
    (a driver-side ndarray list) with ``noise``·N(0,I) jitter. Generated
    distributed via mapInPandas (per-slice seeded RNG — a measurement
    corpus, not an oracle input, so partition-layout determinism is not
    required). Centers ship by closure — n_clusters × dim doubles."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cmat = np.asarray(centers, dtype=np.float64)

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
        T.StructField("label", T.IntegerType()),
    ])

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            rng = np.random.RandomState((seed * 1_000_003 + int(ids[0])) % (2**31))
            cl = ids % n_clusters
            vecs = cmat[cl] + noise * rng.randn(len(ids), dim)
            yield pd.DataFrame({
                "vec_id": ids + id_base,
                "embedding": [list(map(float, v)) for v in vecs],
                "label": np.zeros(len(ids), dtype=np.int32),
            })

    return spark.range(n, numPartitions=16).mapInPandas(gen, schema)


def ivf_drift_bench(spark, n_base: int = 100_000, n_batch: int = 25_000,
                    n_batches: int = 8, dim: int = 32, n_clusters: int = 16,
                    n_centroids: int = 64, n_probe: int = 8,
                    drift_step: float = 0.5) -> dict:
    """VERDICT r10 #1(a): recall@k decay under distribution-shifted appends,
    and what ivf_recompact buys back.

    Two append series over the same base index (synthetic GMM, the
    cc-decade chain-probe pattern — the testdata embeddings are too small
    and stationary to exercise drift):

    - ``stationary``: batches drawn from the BUILD-TIME distribution —
      the control; recall should hold flat.
    - ``drifted``: batch b's cluster means migrate by ``b·drift_step·σ_c``
      along a fixed per-cluster direction (σ_c = the centers' own scale),
      so later batches straddle/escape the frozen build-time cells.

    After each append: recall@10 of 32 FRESH-distribution queries (the
    realistic probe workload — new queries match new data) via the pruned
    probe at fixed n_probe/n_centroids fraction, against brute-force
    truth over the committed corpus (Arrow pre-reduced); plus the
    ivf_needs_recompact assign-distance ratio — the series SCALING.md
    plots. Then the repair: ivf_recompact (timed) vs a from-scratch
    build+write (timed) at the final corpus, and recall re-measured.
    Recompact is O(corpus) like the rebuild — its value is the IN-PLACE
    atomic flip (no probe downtime, no path migration, baseline reset),
    not asymptotics; the JSON reports both walls honestly."""
    import tempfile

    import numpy as np

    from pwhl_data_engineering_pipeline_spark.operators import similarity

    from pyspark.sql import functions as F

    rng = np.random.RandomState(101)
    centers = rng.randn(n_clusters, dim) * 3.0
    scale = float(np.linalg.norm(centers, axis=1).mean())
    directions = rng.randn(n_clusters, dim)
    directions /= np.linalg.norm(directions, axis=1, keepdims=True)

    def series(kind: str) -> dict:
        base = _gmm_batch(spark, n_base, dim, n_clusters, centers, 0.3, 7, 0)
        cent, assigned = similarity.ivf_index(
            base, n_centroids=n_centroids, refine_iterations=2
        )
        idx = tempfile.mkdtemp(prefix=f"sb_ivfdrift_{kind}_") + "/index"
        t0 = time.monotonic()
        similarity.ivf_write(assigned, idx, cent)
        build_sec = round(time.monotonic() - t0, 3)

        def batch_centers(b: int):
            if kind == "stationary" or b < 0:
                return centers
            if kind == "novel":
                # brand-new cluster centers every batch — new topics
                # appearing between the frozen centroids, the shift shape
                # migration (each cluster drifting along its own ray)
                # does NOT produce: novel mass straddles frozen-cell
                # boundaries, so neighbors scatter across more cells
                # than a migrated (still-tight) cluster's do
                return np.random.RandomState(500 + b).randn(n_clusters, dim) * 3.0
            return centers + (b + 1) * drift_step * scale * directions

        def recall_and_ratio(b: int) -> dict:
            qrng = np.random.RandomState(9000 + b)
            bc = batch_centers(b)
            qvecs = [
                (90_000_000 + j,
                 list(map(float, bc[j % n_clusters] + 0.3 * qrng.randn(dim))))
                for j in range(32)
            ]
            committed = spark.read.parquet(idx)
            meta = similarity._ivf_read_manifest(spark, idx)
            committed = committed.filter(F.col("batch").isin(meta["batches"]))
            truth = {
                (r["query_id"], r["vec_id"])
                for r in similarity.brute_force_topk_arrow(
                    committed, qvecs, k=10
                ).collect()
            }
            qdf = spark.createDataFrame(
                [(q, v) for q, v in qvecs], "query_id long, embedding array<double>"
            )
            got = {
                (r["query_id"], r["vec_id"])
                for r in similarity.ivf_topk_pruned(
                    spark, idx, None, qdf, k=10, n_probe=n_probe
                ).collect()
            }
            probe = similarity.ivf_needs_recompact(spark, idx)
            # Pruning efficiency — the metric that ACTUALLY decays when
            # queries drift in lockstep with the data (recall can hold at
            # 1.0 because routing and assignment share the same frozen
            # centroids, while the drifted mass collapses onto a few
            # cells and every probe scans a growing corpus fraction).
            # Driver-side: centroid table is n_centroids rows, cell
            # sizes are one metadata-sized aggregate.
            cent_rows = similarity.ivf_load_centroids(spark, idx).collect()
            cmat = np.array([r["centroid_vec"] for r in cent_rows])
            cids = np.array([r["centroid_id"] for r in cent_rows])
            cnorm = cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)
            sizes = {
                r["centroid_id"]: r["n"]
                for r in committed.groupBy("centroid_id")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            total = sum(sizes.values())
            fracs = []
            for _, v in qvecs:
                qv = np.array(v)
                qv = qv / max(np.linalg.norm(qv), 1e-12)
                order = np.argsort(-(cnorm @ qv))[:n_probe]
                fracs.append(sum(sizes.get(int(cids[i]), 0) for i in order) / total)
            return {
                "recall_at_10": round(len(got & truth) / len(truth), 4),
                "assign_dist_ratio": round(probe["ratio"], 3),
                "probed_frac": round(float(np.mean(fracs)), 4),
                "max_cell_frac": round(max(sizes.values()) / total, 4),
            }

        steps = [{"batch": 0, **recall_and_ratio(-1)}]
        append_secs = []
        for b in range(n_batches):
            batch = _gmm_batch(
                spark, n_batch, dim, n_clusters, batch_centers(b), 0.3,
                11 + b, 1_000_000 * (b + 1),
            )
            t0 = time.monotonic()
            similarity.ivf_append(batch, idx, batch_id=f"d{b}")
            append_secs.append(round(time.monotonic() - t0, 3))
            steps.append({"batch": b + 1, **recall_and_ratio(b)})
        # the repair vs the alternative it replaces
        t0 = time.monotonic()
        obs = similarity.ivf_recompact(
            spark, idx, n_centroids=n_centroids, refine_iterations=2
        )
        recompact_sec = round(time.monotonic() - t0, 3)
        after = recall_and_ratio(n_batches - 1)
        full = spark.read.parquet(idx).filter(
            F.col("batch") == obs["batch_id"]
        ).select("vec_id", "embedding")
        t0 = time.monotonic()
        cent2, assigned2 = similarity.ivf_index(
            full, n_centroids=n_centroids, refine_iterations=2
        )
        rebuild_idx = tempfile.mkdtemp(prefix=f"sb_ivfrb_{kind}_") + "/index"
        similarity.ivf_write(assigned2, rebuild_idx, cent2)
        rebuild_sec = round(time.monotonic() - t0, 3)
        return {
            "build_sec": build_sec,
            "append_secs": append_secs,
            "series": steps,
            "recompact_sec": recompact_sec,
            "rebuild_sec": rebuild_sec,
            "after_recompact": after,
        }

    return {
        "mode": "ivf-drift",
        "n_base": n_base,
        "n_batch": n_batch,
        "n_batches": n_batches,
        "dim": dim,
        "n_clusters": n_clusters,
        "n_centroids": n_centroids,
        "n_probe": n_probe,
        "drift_step": drift_step,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
        "stationary": series("stationary"),
        "drifted": series("drifted"),
        "novel": series("novel"),
    }


def pq_drift_bench(spark, n_base: int = 50_000, n_batch: int = 12_500,
                   n_batches: int = 8, dim: int = 32, n_clusters: int = 16,
                   n_centroids: int = 64, m: int = 8, k_codes: int = 64,
                   n_probe: int = 8, drift_step: float = 0.5) -> dict:
    """r11: codebook/centroid drift for the persisted PQ index — the lossy
    twin of ``ivf_drift_bench``, over the same three GMM append regimes
    (stationary control / migrating means / novel topics). What differs
    from IVF, and what this measures:

    - PQ has TWO frozen trained artifacts (coarse centroids AND residual
      codebooks), so drift degrades both routing and in-cell distance
      fidelity; expect recall to move earlier than IVF's.
    - The scheduler probe (``pq_needs_recompact``) takes RAW vectors —
      here each step probes with the batch just appended, exactly the
      sample an ingest pipeline has in hand (codes are lossy; the index
      alone cannot measure quantization error).
    - Truth is exact L2 top-10 (ADC approximates L2), computed with a
      Spark expression leg (zip_with square-sum + per-query window) over
      the RAW corpus table the bench maintains alongside the index — the
      same system-of-record shape ``streaming_pq_ingest`` keeps, and the
      input ``pq_recompact`` requires.
    - The repair: ``pq_recompact`` (timed, full retrain + re-encode +
      one-commit flip) vs a from-scratch build+write (timed); recall and
      probe ratio re-measured after."""
    import tempfile

    import numpy as np

    from pwhl_data_engineering_pipeline_spark.operators import pq as pqm
    from pwhl_data_engineering_pipeline_spark.operators import similarity

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rng = np.random.RandomState(101)
    centers = rng.randn(n_clusters, dim) * 3.0
    scale = float(np.linalg.norm(centers, axis=1).mean())
    directions = rng.randn(n_clusters, dim)
    directions /= np.linalg.norm(directions, axis=1, keepdims=True)

    def l2_truth(corpus, qvecs, k):
        qdf = spark.createDataFrame(
            [(q, v) for q, v in qvecs], "query_id long, qvec array<double>"
        )
        d = F.aggregate(
            F.zip_with(
                "embedding", "qvec",
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.col("d").asc(), F.col("vec_id").asc()
        )
        return {
            (r["query_id"], r["vec_id"])
            for r in corpus.crossJoin(F.broadcast(qdf))
            .select("query_id", "vec_id", d.alias("d"))
            .withColumn("r", F.row_number().over(wq))
            .filter(F.col("r") <= k)
            .select("query_id", "vec_id")
            .collect()
        }

    def series(kind: str) -> dict:
        work = tempfile.mkdtemp(prefix=f"sb_pqdrift_{kind}_")
        corpus_dir, idx = f"{work}/corpus", f"{work}/index"
        _gmm_batch(spark, n_base, dim, n_clusters, centers, 0.3, 7, 0).select(
            "vec_id", "embedding"
        ).write.mode("overwrite").parquet(corpus_dir)
        base_df = spark.read.parquet(corpus_dir)
        t0 = time.monotonic()
        cent, assigned = similarity.ivf_index(
            base_df, n_centroids=n_centroids, refine_iterations=2
        )
        books = pqm.pq_train_residual(
            base_df, assigned, cent, m=m, k=k_codes, iters=5
        )
        pqm.pq_write(
            pqm.pq_encode_residual(base_df, assigned, cent, books),
            idx, books, cent, vectors=base_df,
        )
        build_sec = round(time.monotonic() - t0, 3)

        def batch_centers(b: int):
            if kind == "stationary" or b < 0:
                return centers
            if kind == "novel":
                return np.random.RandomState(500 + b).randn(n_clusters, dim) * 3.0
            return centers + (b + 1) * drift_step * scale * directions

        def step(b: int, sample_df) -> dict:
            qrng = np.random.RandomState(9000 + b)
            bc = batch_centers(b)
            qvecs = [
                (90_000_000 + j,
                 list(map(float, bc[j % n_clusters] + 0.3 * qrng.randn(dim))))
                for j in range(32)
            ]
            corpus = spark.read.parquet(corpus_dir)
            truth = l2_truth(corpus, qvecs, 10)
            got = {
                (r["query_id"], r["vec_id"])
                for r in pqm.ivf_adc_topk_pruned(
                    spark, idx, qvecs, k=10, n_probe=n_probe
                ).collect()
            }
            probe = pqm.pq_needs_recompact(spark, idx, sample_df)
            return {
                "recall_at_10": round(len(got & truth) / len(truth), 4),
                "quant_err_ratio": round(probe["ratio"], 3),
            }

        steps = [{"batch": 0, **step(-1, base_df)}]
        append_secs = []
        for b in range(n_batches):
            batch = _gmm_batch(
                spark, n_batch, dim, n_clusters, batch_centers(b), 0.3,
                11 + b, 1_000_000 * (b + 1),
            ).select("vec_id", "embedding")
            batch.write.mode("append").parquet(corpus_dir)
            t0 = time.monotonic()
            pqm.pq_append(spark.read.parquet(corpus_dir).filter(
                F.col("vec_id") >= 1_000_000 * (b + 1)
            ).filter(F.col("vec_id") < 1_000_000 * (b + 1) + n_batch), idx,
                batch_id=f"d{b}")
            append_secs.append(round(time.monotonic() - t0, 3))
            steps.append({"batch": b + 1, **step(b, spark.read.parquet(
                corpus_dir).filter(F.col("vec_id") >= 1_000_000 * (b + 1)))})
        full = spark.read.parquet(corpus_dir)
        t0 = time.monotonic()
        obs = pqm.pq_recompact(
            spark, idx, full, iters=5, refine_iterations=2
        )
        recompact_sec = round(time.monotonic() - t0, 3)
        after = step(n_batches - 1, full)
        t0 = time.monotonic()
        cent2, assigned2 = similarity.ivf_index(
            full, n_centroids=n_centroids, refine_iterations=2
        )
        books2 = pqm.pq_train_residual(full, assigned2, cent2, m=m, k=k_codes, iters=5)
        rebuild_idx = tempfile.mkdtemp(prefix=f"sb_pqrb_{kind}_") + "/index"
        pqm.pq_write(
            pqm.pq_encode_residual(full, assigned2, cent2, books2),
            rebuild_idx, books2, cent2, vectors=full,
        )
        rebuild_sec = round(time.monotonic() - t0, 3)
        assert obs["mode"] == "recompact", obs
        return {
            "build_sec": build_sec,
            "append_secs": append_secs,
            "series": steps,
            "recompact_sec": recompact_sec,
            "rebuild_sec": rebuild_sec,
            "after_recompact": after,
        }

    return {
        "mode": "pq-drift",
        "n_base": n_base,
        "n_batch": n_batch,
        "n_batches": n_batches,
        "dim": dim,
        "n_clusters": n_clusters,
        "n_centroids": n_centroids,
        "m": m,
        "k": k_codes,
        "n_probe": n_probe,
        "drift_step": drift_step,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
        "stationary": series("stationary"),
        "drifted": series("drifted"),
        "novel": series("novel"),
    }


def pq_decade_bench(spark, base: str, big: str, factor: int) -> dict:
    """VERDICT r10 #3: the deep decade for residual IVFADC (operators.pq),
    the last ANN family member without 100×/1000× rows. Three axes per
    scale, timed separately on the permute replica (the honest pure-scale
    model — no cross-copy duplicate structure):

    - ``coarse+train``: IVF centroid build (16 cells) plus
      pq_train_residual — training collects a BOUNDED hash-ordered
      sample (50k cap), so past the cap only the sample-selection scan
      (a TakeOrdered over the corpus) grows; expected mildly linear in
      scan, flat in k-means.
    - ``encode+write``: pq_encode_residual over the FULL corpus (one
      Arrow pass, no shuffle) + pq_write partitioned by centroid_id —
      the honestly-linear axis (every vector is touched once).
    - ``probe``: ivf_adc_topk_pruned, 8 queries, k=10, n_probe=4 —
      routed-cell partition-pruned scan + per-batch ADC local-top-k, so
      the shuffle is ≤ partitions × |Q| × k rows at any corpus size;
      expected to match or beat brute-force ANN's measured 8×-at-1000×
      shape (the scan is 4/16 of the corpus and each row is m gathers,
      not a dim-wide dot product). Min-of-2 after a warm probe.
    """
    import tempfile

    from pwhl_data_engineering_pipeline_spark.operators import pq as pqm
    from pwhl_data_engineering_pipeline_spark.operators import similarity
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    from pyspark.sql import functions as F

    base_emb = read_testdata(spark, base, "embeddings")
    q_rows = sorted(
        base_emb.filter(F.col("vec_id") < 8).collect(), key=lambda r: r["vec_id"]
    )
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in q_rows]

    def at_scale(sf_dir: str) -> dict:
        emb = read_testdata(spark, sf_dir, "embeddings")
        n = emb.count()
        t0 = time.monotonic()
        cent, assigned = similarity.ivf_index(emb, n_centroids=16)
        books = pqm.pq_train_residual(emb, assigned, cent, m=8, k=64, iters=5)
        train_sec = round(time.monotonic() - t0, 3)
        idx = tempfile.mkdtemp(prefix="sb_pq_") + "/index"
        t0 = time.monotonic()
        res_codes = pqm.pq_encode_residual(emb, assigned, cent, books)
        pqm.pq_write(res_codes, idx, books, cent)
        encode_sec = round(time.monotonic() - t0, 3)

        def probe() -> float:
            t0 = time.monotonic()
            pqm.ivf_adc_topk_pruned(spark, idx, queries, k=10, n_probe=4).collect()
            return time.monotonic() - t0

        probe()  # warm
        probe_sec = round(min(probe() for _ in range(2)), 3)
        return {
            "n_vectors": n,
            "coarse_train_sec": train_sec,
            "encode_write_sec": encode_sec,
            "probe_sec": probe_sec,
        }

    out = {
        "mode": "pq-decade",
        "factor": factor,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
        "base": at_scale(base),
        f"x{factor}": at_scale(big),
    }
    for ax in ("coarse_train_sec", "encode_write_sec", "probe_sec"):
        out[f"{ax}_ratio"] = round(out[f"x{factor}"][ax] / max(out["base"][ax], 1e-9), 2)
    return out


def streaming_ingest_bench(
    spark, base: str, big: str, factor: int, n_epochs: int = 8
) -> dict:
    """VERDICT r10 #6: measured ingest rate for the composed
    near-dup→BM25 streaming sink (`streaming_neardup_bm25_ingest`) at
    two corpus scales — the exactly-once proofs exist, this puts a
    docs/sec number next to them.

    Protocol per scale: repartition the documents table into
    ``n_epochs`` parquet files in a landing dir, stream it with
    ``maxFilesPerTrigger=1`` + ``availableNow`` so the sink sees exactly
    ``n_epochs`` micro-batches of ~equal size, and collect the sink's
    own per-epoch seam metrics (``on_epoch_metrics``): near-dup protocol
    wall (probe + exactly-once commit + MinHash append) vs BM25-append
    wall. The replica is ``permute``-perturbed — original duplicate
    density, so survivors ≈ corpus and the BM25 leg indexes the full
    stream (the honest steady-state shape; a dup-heavy stream would
    flatter the BM25 leg).

    Reported per scale: total stream wall (start→awaitTermination),
    docs/sec against the INPUT count, Σ neardup_sec, Σ bm25_sec, and the
    per-epoch series (epoch 0 bootstraps both indexes; later epochs pay
    the growing MinHash probe — the series shape shows whether per-epoch
    cost is flat in corpus-so-far, which is the 100 TB question)."""
    import shutil
    import tempfile

    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata
    from pwhl_data_engineering_pipeline_spark.streaming import (
        dedup as sdedup,
    )

    def at_scale(label: str, sf_dir: str) -> dict:
        docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")
        n = docs.count()
        work = tempfile.mkdtemp(prefix=f"sb_singest_{label}_")
        landing = f"{work}/landing"
        docs.repartition(n_epochs).write.parquet(landing)
        epochs: list[dict] = []
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        t0 = time.monotonic()
        q = sdedup.streaming_neardup_bm25_ingest(
            stream,
            minhash_index_path=f"{work}/mh_index",
            bm25_index_path=f"{work}/bm25_index",
            table_path=f"{work}/table",
            checkpoint_dir=f"{work}/ckpt",
            trigger_once=True,
            on_epoch_metrics=epochs.append,
        )
        q.awaitTermination()
        wall = time.monotonic() - t0
        out = {
            "n_docs_in": n,
            "n_epochs": len(epochs),
            "n_admitted": sum(e["n_admitted"] for e in epochs),
            "wall_sec": round(wall, 3),
            "docs_per_sec": round(n / wall, 1),
            "neardup_sec_total": round(sum(e["neardup_sec"] for e in epochs), 3),
            "bm25_sec_total": round(sum(e["bm25_sec"] for e in epochs), 3),
            "epochs": epochs,
        }
        shutil.rmtree(work, ignore_errors=True)
        return out

    out = {
        "mode": "streaming-ingest",
        "factor": factor,
        "n_epochs": n_epochs,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
        "base": at_scale("base", base),
        f"x{factor}": at_scale(f"x{factor}", big),
    }
    out["docs_per_sec_ratio"] = round(
        out[f"x{factor}"]["docs_per_sec"] / max(out["base"]["docs_per_sec"], 1e-9), 2
    )
    return out


def ngram_hot_bench(spark, df_hot: int = 10_000, chunk_size: int = 512) -> dict:
    """VERDICT r10 #4 follow-through: the permute-replica 1000× decade is
    the WRONG regime for posting-list chunking (measured r11: max gram
    df = 357 there — per-gram df stays at base level because corpus
    growth adds disjoint gram spaces — so chunk_size=1024 never fires
    and the run prices pure plumbing). The regime chunking exists for is
    a HOT gram below the stop-gram cutoff but far above chunk_size: the
    unchunked SMJ buffers its whole df-row posting group in ONE task and
    enumerates df²/2 pairs serially inside it, while the chunked plan
    spreads the same pairs over B(B+1)/2 bounded tasks.

    Synthetic corpus pinning exactly that: ``df_hot`` docs share one
    3-gram (every doc starts with the same three words) and are unique
    elsewhere; ``max_gram_df=None`` (the cap is the FIRST-line defense —
    this measures the second line, for corpora whose Σ df² budget admits
    a skewed gram). Pair OUTPUT is identical by the differential
    guarantee; walls and the unchunked run's single-task serialization
    are what differ. Reported: wall unchunked vs chunked, the pair
    count (must equal C(df_hot, 2) candidate intersections ≥ threshold
    → here 0 survivors, the burst is intermediate), and the ratio."""
    import pandas as pd

    from pwhl_data_engineering_pipeline_spark.operators import dedup

    def gen(it):
        for pdf in it:
            ids = pdf["id"].values
            yield pd.DataFrame({
                "doc_id": ids,
                # shared leading 3-gram "hotgram alpha beta"; unique tail
                # long enough that no cross-doc pair clears threshold
                "text": [
                    "hotgram alpha beta "
                    + " ".join(f"u{int(i)}w{j}" for j in range(12))
                    for i in ids
                ],
            })

    docs = (
        spark.range(df_hot, numPartitions=32)
        .withColumnRenamed("id", "id")
        .mapInPandas(gen, schema="doc_id long, text string")
    )
    docs = docs.localCheckpoint()  # freeze the corpus; time only the join

    def run(cs):
        t0 = time.monotonic()
        n = dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.2, max_gram_df=None, chunk_size=cs
        ).count()
        return round(time.monotonic() - t0, 3), n

    unchunked_wall, n1 = run(None)
    chunked_wall, n2 = run(chunk_size)
    assert n1 == n2, (n1, n2)
    return {
        "mode": "ngram-hot",
        "df_hot": df_hot,
        "chunk_size": chunk_size,
        "n_pairs": n1,
        "unchunked_wall_sec": unchunked_wall,
        "chunked_wall_sec": chunked_wall,
        "speedup": round(unchunked_wall / max(chunked_wall, 1e-9), 2),
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
    }


def delete_drift_bench(spark, base: str, workdir: str, factor: int = 10) -> dict:
    """VERDICT r11 #2: what deletion COSTS, measured — the study that
    justifies the tombstone_frac terms in needs_compaction /
    ivf_needs_recompact (r12). Two indexes, two corpus scales each,
    cumulative deleted fractions 5% → 50%:

    - **BM25** (sf0.1 documents, and a ×``factor`` suffix replica): per
      fraction, the MASKED probe wall (every probe pays the doc-id
      anti-join against the accumulated tombstone tables) and the score
      cost of the documented Lucene stale-stats posture — recall@k of
      the masked probe vs a fresh build over the survivors, plus the
      mean relative score bias on common docs (stale df/N/avgdl score
      with the PRE-delete corpus statistics). Then the repair:
      bm25_index_compact wall and the post-compact probe (bias must be
      exactly 0 — the purge theorem).
    - **IVF** (synthetic GMM at two sizes): per fraction, the masked
      pruned-probe wall, recall@10 vs Arrow brute force over the
      survivors, and the ivf_needs_recompact observables
      (assign-ratio over the tombstone-masked sample + tombstone_frac).
      Then ivf_recompact wall and the post-purge probe.

    The scheduler question this answers: at what deleted fraction do
    the probe tax and the stats bias justify paying the compact? The
    JSON reports the raw curves; SCALING.md reads the threshold off
    them."""
    import tempfile

    import numpy as np

    import __spark_entry__ as em
    from pwhl_data_engineering_pipeline_spark.operators import search, similarity
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    from pyspark.sql import functions as F

    fracs = [0.05, 0.10, 0.20, 0.35, 0.50]
    qdf = spark.createDataFrame(
        em._BM25_QUERIES, "query_id string, query_text string"
    )
    K = 20

    def bm25_series(docs, label: str) -> dict:
        docs = docs.select("doc_id", "text").localCheckpoint()
        n_docs = docs.count()
        idx = f"{workdir}/deldrift_bm25_{label}"
        t0 = time.monotonic()
        search.bm25_index_write(docs, idx, n_buckets=64)
        build = round(time.monotonic() - t0, 3)

        def probe():
            t0 = time.monotonic()
            rows = search.bm25_search_index(spark, idx, qdf, k=K).collect()
            return time.monotonic() - t0, {
                (r["query_id"], r["doc_id"]): r["score"] for r in rows
            }

        base_wall, _ = probe()
        slice_col = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(1000)) / 1000.0
        points, prev = [], 0.0
        for f in fracs:
            delta = docs.filter((slice_col >= prev) & (slice_col < f)).select(
                "doc_id"
            )
            t0 = time.monotonic()
            search.bm25_delete(spark, idx, delta)
            delete_wall = round(time.monotonic() - t0, 3)
            prev = f
            wall, masked = probe()
            survivors = docs.filter(slice_col >= f)
            truth = {
                (r["query_id"], r["doc_id"]): r["score"]
                for r in search.bm25_topk(survivors, qdf, k=K).collect()
            }
            per_q_truth = {}
            for (q, d) in truth:
                per_q_truth.setdefault(q, set()).add(d)
            per_q_masked = {}
            for (q, d) in masked:
                per_q_masked.setdefault(q, set()).add(d)
            recalls = [
                len(per_q_masked.get(q, set()) & ds) / len(ds)
                for q, ds in per_q_truth.items()
                if ds
            ]
            common = set(masked) & set(truth)
            bias = (
                float(
                    np.mean(
                        [
                            (masked[k_] - truth[k_]) / abs(truth[k_])
                            for k_ in common
                            if truth[k_]
                        ]
                    )
                )
                if common
                else 0.0
            )
            meta = search._read_scalars(spark, idx)
            mass = search._tombstone_mass(spark, idx, meta)
            points.append(
                {
                    "frac": f,
                    "delete_wall_sec": delete_wall,
                    "probe_wall_sec": round(wall, 3),
                    "recall_at_k": round(float(np.mean(recalls)), 4),
                    "mean_rel_score_bias": round(bias, 6),
                    "tombstone_frac": round(mass / max(meta["n_docs"], 1), 4),
                    "needs_compaction": search.needs_compaction(spark, idx),
                }
            )
        t0 = time.monotonic()
        search.bm25_index_compact(spark, idx, reclaim_min_age_seconds=0)
        compact_wall = round(time.monotonic() - t0, 3)
        post_wall, post = probe()
        survivors = docs.filter(slice_col >= fracs[-1])
        truth = {
            (r["query_id"], r["doc_id"]): r["score"]
            for r in search.bm25_topk(survivors, qdf, k=K).collect()
        }
        return {
            "n_docs": n_docs,
            "build_sec": build,
            "baseline_probe_sec": round(base_wall, 3),
            "points": points,
            "compact_sec": compact_wall,
            "post_compact_probe_sec": round(post_wall, 3),
            "post_compact_exact": post == truth,
        }

    def ivf_series(n: int, label: str, dim: int = 32, n_clusters: int = 16,
                   n_centroids: int = 64, n_probe: int = 8) -> dict:
        rng = np.random.RandomState(211)
        centers = rng.randn(n_clusters, dim) * 3.0
        corpus = _gmm_batch(spark, n, dim, n_clusters, centers, 0.3, 17, 0)
        corpus = corpus.select("vec_id", "embedding").localCheckpoint()
        idx = f"{workdir}/deldrift_ivf_{label}"
        t0 = time.monotonic()
        cent, assigned = similarity.ivf_index(
            corpus, n_centroids=n_centroids, refine_iterations=1
        )
        similarity.ivf_write(assigned, idx, cent)
        build = round(time.monotonic() - t0, 3)
        qv = [
            (100_000_000 + i, [float(x) for x in centers[i % n_clusters]
                               + 0.3 * rng.randn(dim)])
            for i in range(16)
        ]
        qdf_v = spark.createDataFrame(
            [(q, v) for q, v in qv], "query_id long, embedding array<double>"
        )

        def probe():
            t0 = time.monotonic()
            rows = similarity.ivf_topk_pruned(
                spark, idx, None, qdf_v, k=10, n_probe=n_probe
            ).collect()
            got = {}
            for r in rows:
                got.setdefault(r["query_id"], set()).add(r["vec_id"])
            return time.monotonic() - t0, got

        def truth_over(df):
            want = {}
            for r in similarity.brute_force_topk_arrow(df, qv, k=10).collect():
                want.setdefault(r["query_id"], set()).add(r["vec_id"])
            return want

        base_wall, base_got = probe()
        base_truth = truth_over(corpus)
        base_recall = float(
            np.mean([len(base_got.get(q, set()) & d) / len(d)
                     for q, d in base_truth.items()])
        )
        slice_col = F.pmod(F.xxhash64(F.col("vec_id").cast("string")), F.lit(1000)) / 1000.0
        points, prev = [], 0.0
        for f in fracs:
            delta = corpus.filter((slice_col >= prev) & (slice_col < f)).select(
                "vec_id"
            )
            t0 = time.monotonic()
            similarity.ivf_delete(spark, idx, delta)
            delete_wall = round(time.monotonic() - t0, 3)
            prev = f
            wall, got = probe()
            truth = truth_over(corpus.filter(slice_col >= f))
            recall = float(
                np.mean([len(got.get(q, set()) & d) / len(d)
                         for q, d in truth.items()])
            )
            nr = similarity.ivf_needs_recompact(spark, idx)
            points.append(
                {
                    "frac": f,
                    "delete_wall_sec": delete_wall,
                    "probe_wall_sec": round(wall, 3),
                    "recall_at_10": round(recall, 4),
                    "assign_ratio": round(nr["ratio"], 4),
                    "tombstone_frac": round(nr["tombstone_frac"], 4),
                    "recompact_flag": nr["recompact"],
                }
            )
        t0 = time.monotonic()
        similarity.ivf_recompact(
            spark, idx, refine_iterations=1, reclaim_min_age_seconds=0
        )
        recompact_wall = round(time.monotonic() - t0, 3)
        post_wall, post_got = probe()
        post_truth = truth_over(corpus.filter(slice_col >= fracs[-1]))
        post_recall = float(
            np.mean([len(post_got.get(q, set()) & d) / len(d)
                     for q, d in post_truth.items()])
        )
        return {
            "n_vectors": n,
            "build_sec": build,
            "baseline_probe_sec": round(base_wall, 3),
            "baseline_recall_at_10": round(base_recall, 4),
            "points": points,
            "recompact_sec": recompact_wall,
            "post_recompact_probe_sec": round(post_wall, 3),
            "post_recompact_recall_at_10": round(post_recall, 4),
        }

    docs_base = read_testdata(spark, base, "documents")
    big_parts = [docs_base]
    for i in range(1, factor):
        big_parts.append(
            _rekey_docs(docs_base, i * 10_000_000).withColumn(
                "text", F.concat(F.col("text"), F.lit(f" rep{i}tag"))
            )
        )
    import functools

    docs_big = functools.reduce(lambda a, b: a.unionByName(b),
                                [p.select("doc_id", "text") for p in big_parts])
    out = {
        "mode": "delete-drift",
        "fracs": fracs,
        "bm25": {
            "base": bm25_series(docs_base.select("doc_id", "text"), "base"),
            "x%d" % factor: bm25_series(docs_big, "big"),
        },
        "ivf": {
            "n25k": ivf_series(25_000, "n25k"),
            "n250k": ivf_series(250_000, "n250k"),
        },
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
    }
    return out


def champions_delete_bench(spark, base: str, workdir: str, factor: int = 10) -> dict:
    """r12 follow-on to the delete-drift study: is the champion sidecar's
    delete merge actually O(blast radius)? Per corpus scale (sf0.1 docs
    and a ×factor suffix replica) and per deletion blast radius (10
    docs, 1%, 10%): wall of `bm25_champions_refresh`'s delete_merge vs
    a full masked `bm25_champions_write`, plus the merge's affected-term
    count (the radius the cost should track). Fresh index+sidecar per
    radius so walls attribute cleanly. The claim being tested: merge
    wall grows with the radius while the rebuild wall is flat in it
    (both grow with corpus)."""
    import __spark_entry__ as em
    from pwhl_data_engineering_pipeline_spark.operators import search
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    from pyspark.sql import functions as F

    docs_base = read_testdata(spark, base, "documents").select("doc_id", "text")
    parts = [docs_base]
    for i in range(1, factor):
        parts.append(
            _rekey_docs(docs_base, i * 10_000_000).withColumn(
                "text", F.concat(F.col("text"), F.lit(f" rep{i}tag"))
            )
        )
    import functools

    docs_big = functools.reduce(lambda a, b: a.unionByName(b), parts)

    def series(docs, label: str) -> dict:
        docs = docs.localCheckpoint()
        n_docs = docs.count()
        out = {"n_docs": n_docs, "radii": []}
        for radius_label, n_del in (
            ("10_docs", 10),
            ("1pct", max(1, n_docs // 100)),
            ("10pct", max(1, n_docs // 10)),
        ):
            idx = f"{workdir}/champ_del_{label}_{radius_label}"
            search.bm25_index_write(docs, idx, n_buckets=64)
            search.bm25_champions_write(spark, idx, m=100)
            sl = (
                docs.orderBy(F.pmod(F.xxhash64(F.col("doc_id")), F.lit(997)), "doc_id")
                .limit(n_del)
                .select("doc_id")
            )
            search.bm25_delete(spark, idx, sl)
            # input-volume observability (the quantity that scales): the
            # merge reads the m-bounded sidecar + ONLY the affected
            # terms' postings; the rebuild reads every posting row
            side = spark.read.parquet(f"{idx}/_champions/m=100/data")
            tomb = sl
            affected = side.join(tomb, "doc_id", "left_semi").select(
                "term"
            ).distinct()
            postings = spark.read.parquet(f"{idx}/postings")
            merge_rows = int(side.count()) + int(
                postings.join(affected, "term", "left_semi").count()
            )
            rebuild_rows = int(postings.count())
            n_affected = int(affected.count())
            t0 = time.monotonic()
            ref = search.bm25_champions_refresh(spark, idx, m=100)
            merge_wall = round(time.monotonic() - t0, 3)
            assert ref["mode"] == "delete_merge", ref
            t0 = time.monotonic()
            search.bm25_champions_write(spark, idx, m=100)
            rebuild_wall = round(time.monotonic() - t0, 3)
            out["radii"].append(
                {
                    "radius": radius_label,
                    "n_deleted": int(n_del),
                    "affected_terms": n_affected,
                    "merge_input_rows": merge_rows,
                    "rebuild_input_rows": rebuild_rows,
                    "delete_merge_sec": merge_wall,
                    "full_rebuild_sec": rebuild_wall,
                }
            )
        return out

    return {
        "mode": "champions-delete",
        "base": series(docs_base, "base"),
        "x%d" % factor: series(docs_big, "big"),
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
    }


def cc_decade_bench(spark, base: str, big: str, factor: int, workdir: str) -> dict:
    """VERDICT r9 #2: the deep decade for the distributed connected-
    components fixpoint, two complementary probes:

    - ``replica``: simhash-pair edges over the perturbed documents
      replica (same pair parameters as the north-star table), CC forced
      distributed (driver_threshold=0) with a parquet round log so the
      round count is observable. NOTE the expected shape: a permute
      replica's duplicate clusters are COPY-LOCAL (constant size/
      diameter), so edges grow ~linearly but rounds should stay FLAT —
      that IS the O(log² n) story for this graph family (rounds track
      component diameter, not corpus size).
    - ``chain``: synthetic path graphs of length L (diameter = L), the
      adversarial family where rounds must actually GROW — large-star/
      small-star halves the depth per round, so rounds ~ log₂ L.
      Measured at three L decades to expose the growth curve.

    Pair-gen and CC are timed separately; edges materialize to parquet
    (NOT a data-sized localCheckpoint — the r9 memory lesson) so the CC
    timing starts from a disk-backed edge list at every scale.
    """
    from pyspark.sql import functions as F

    from pwhl_data_engineering_pipeline_spark.operators import dedup, graph
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    out = {"mode": "cc-decade", "factor": factor,
           "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
           "replica": {}, "chain": {}}
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def rounds_in(ck: str) -> int:
        # round_0000 is the canonicalized input; star rounds start at 0001
        return len([n for n in os.listdir(ck) if n.startswith("round_")]) - 1

    for label, d in [("base", base), (f"x{factor}", big)]:
        docs = read_testdata(spark, d, "documents").repartition(n_part)
        edges_path = f"{workdir}/cc_edges_{label}"
        t0 = time.monotonic()
        dedup.simhash_near_pairs(
            docs, max_hamming=12, n_bands=4, method="arrow"
        ).write.mode("overwrite").parquet(edges_path)
        pairs_sec = time.monotonic() - t0
        edges = spark.read.parquet(edges_path)
        ck = f"{workdir}/cc_rounds_{label}"
        if os.path.exists(ck):
            import shutil

            shutil.rmtree(ck)
        t0 = time.monotonic()
        graph.connected_components(
            edges, checkpoint_dir=ck, driver_threshold=0
        ).write.format("noop").mode("overwrite").save()
        cc_sec = time.monotonic() - t0
        out["replica"][label] = {
            "n_docs": docs.count(),
            "n_edges": edges.count(),
            "pairs_sec": round(pairs_sec, 3),
            "cc_sec": round(cc_sec, 3),
            "star_rounds": rounds_in(ck),
        }

    for L in (10_000, 100_000, 1_000_000):
        chain = spark.range(L - 1).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        ).repartition(n_part)
        chain_path = f"{workdir}/cc_chain_{L}"
        chain.write.mode("overwrite").parquet(chain_path)
        edges = spark.read.parquet(chain_path)
        ck = f"{workdir}/cc_chain_rounds_{L}"
        if os.path.exists(ck):
            import shutil

            shutil.rmtree(ck)
        t0 = time.monotonic()
        graph.connected_components(
            edges, checkpoint_dir=ck, driver_threshold=0
        ).write.format("noop").mode("overwrite").save()
        out["chain"][f"L{L}"] = {
            "cc_sec": round(time.monotonic() - t0, 3),
            "star_rounds": rounds_in(ck),
        }
    return out


def cc_converged_bench(spark, base: str, big: str) -> dict:
    """Converged short-circuit cost (VERDICT r7 #4): on a 10× edge set
    with a persisted round log, the first call pays the fixpoint rounds;
    a re-invocation on the unchanged input must pay only the input
    fingerprint + manifest read + recorded-round signature check — one
    small job per signature, NO star round. Edges are a deterministic
    function of the replica's doc ids (star-of-5 leaves + a bridge
    between odd/even cluster roots = size-10, depth-2 components — the
    shallow-cluster shape near-dup pair generators emit), so the edge
    count scales 1:1 with the corpus (organic exact-dup pairs are too
    sparse at these SFs to exercise rounds). driver_threshold=0 forces
    the distributed fixpoint at both scales."""
    import tempfile

    from pyspark.sql import functions as F

    from pwhl_data_engineering_pipeline_spark.operators import graph
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    def edges_for(sf_dir):
        ids = read_testdata(spark, sf_dir, "documents").select("doc_id")
        leaf = ids.filter(F.col("doc_id") % 5 != 0).select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") - F.col("doc_id") % 5).alias("id_b"),
        )
        bridge = ids.filter(F.col("doc_id") % 10 == 5).select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") - 5).alias("id_b"),
        )
        return leaf.unionByName(bridge)

    out = {
        "mode": "cc-converged",
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
    }
    for label, d in [("base", base), ("x10", big)]:
        e = edges_for(d).localCheckpoint()
        ck = tempfile.mkdtemp(prefix=f"sb_cc_{label}_")
        t0 = time.monotonic()
        graph.connected_components(
            e, checkpoint_dir=ck, driver_threshold=0
        ).write.format("noop").mode("overwrite").save()
        first = time.monotonic() - t0
        reinvokes = []
        for _ in range(2):
            t0 = time.monotonic()
            graph.connected_components(
                e, checkpoint_dir=ck, driver_threshold=0
            ).write.format("noop").mode("overwrite").save()
            reinvokes.append(time.monotonic() - t0)
        n_rounds = len(
            [n for n in os.listdir(ck) if n.startswith("round_")]
        )
        out[label] = {
            "n_edges": e.count(),
            "first_sec": round(first, 3),
            "reinvoke_sec": round(min(reinvokes), 3),
            "speedup": round(first / min(reinvokes), 2),
            "rounds_on_disk": n_rounds,
        }
    return out


def ivm_bench(spark, base: str, workdir: str, factor: int = 10) -> dict:
    """r13: what incremental view maintenance BUYS, measured — the study
    behind SCALING.md's IVM section. A groupBy(o_custkey) money rollup
    over orders at two corpus scales (sf0.1 and a ×factor re-keyed
    replica; group count fixed — the realistic dashboard regime: facts
    grow, entities don't). Three views follow the same table:

    - ``lin`` (count/sum/avg, exact long cents), refreshed
      incrementally — the ALGEBRAIC paths (append delta, signed
      retraction);
    - ``mix`` (adds min/max), whose deletes must take the
      affected-group RECOMPUTE path;
    - ``full`` (same spec as lin), refreshed with mode='full' — the
      recompute-from-scratch yardstick every step.

    Per append fraction (0.1% → 20%) and one 5% keyed delete: refresh
    walls, paths taken, touched groups, and the full-recompute wall on
    the same delta. Plus the SYNC classification cost (table_net_changes)
    on an append-shaped vs a rewrite-shaped range — the finding that
    prices keeping corpus tables append-shaped. Equivalence is asserted
    (agg_view_verify) so every timed number is a CORRECT refresh."""
    import tempfile

    from pwhl_data_engineering_pipeline_spark.operators import ivm, sync
    from pwhl_data_engineering_pipeline_spark.sources import snapshots as snap
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    from pyspark.sql import functions as F

    LIN = [("n", "count", None), ("total", "sum", "cents"),
           ("mean", "avg", "cents")]
    MIX = LIN + [("lo", "min", "cents"), ("hi", "max", "cents")]
    base_rows = (
        read_testdata(spark, base, "orders")
        .select(
            F.col("o_custkey").alias("grp"),
            F.col("o_orderkey").alias("id"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        )
        .localCheckpoint()
    )

    def corpus_at(f: int):
        parts = [
            base_rows.withColumn("id", F.col("id") + F.lit(i * 10_000_000))
            for i in range(f)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def series(label: str, f: int) -> dict:
        corpus = corpus_at(f).localCheckpoint()
        n = corpus.count()
        src = f"{workdir}/ivm_src_{label}"
        snap.snapshot_overwrite(corpus, src)
        views = {}
        t0 = time.monotonic()
        views["lin"] = f"{workdir}/ivm_lin_{label}"
        create = ivm.agg_view_create(spark, src, views["lin"], ["grp"], LIN)
        create_sec = round(time.monotonic() - t0, 3)
        views["full"] = f"{workdir}/ivm_full_{label}"
        ivm.agg_view_create(spark, src, views["full"], ["grp"], LIN)
        views["mix"] = f"{workdir}/ivm_mix_{label}"
        ivm.agg_view_create(spark, src, views["mix"], ["grp"], MIX)

        def timed_refresh(view, **kw):
            t = time.monotonic()
            r = ivm.agg_view_refresh(spark, view, **kw)
            r["sec"] = round(time.monotonic() - t, 3)
            return r

        steps = []
        for step, frac in enumerate([0.001, 0.01, 0.05, 0.20]):
            mod = max(int(round(1 / frac)), 1)
            batch = corpus.filter(F.col("id") % mod == 0).withColumn(
                "id", F.col("id") + F.lit((step + 1) * 100_000_000)
            )
            d = batch.count()
            snap.snapshot_append(batch, src)
            lin = timed_refresh(views["lin"])
            mix = timed_refresh(views["mix"])
            full = timed_refresh(views["full"], mode="full")
            steps.append({
                "kind": "append", "frac": frac, "delta_rows": d,
                "lin_sec": lin["sec"], "lin_path": lin["path"],
                "mix_sec": mix["sec"], "mix_path": mix["path"],
                "full_sec": full["sec"],
                "touched_groups": lin["touched_groups"],
            })
        # one keyed delete: ~5% of rows leave; lin retracts, mix recomputes
        append_range = (snap.current_version(spark, src) - 1,
                        snap.current_version(spark, src))
        dele = snap.read_snapshot(spark, src).filter(
            F.col("id") % 20 == 7
        ).select("id")
        d = dele.count()
        snap.snapshot_delete(dele, src, ["id"])
        lin = timed_refresh(views["lin"])
        mix = timed_refresh(views["mix"])
        full = timed_refresh(views["full"], mode="full")
        steps.append({
            "kind": "delete", "frac": 0.05, "delta_rows": d,
            "lin_sec": lin["sec"], "lin_path": lin["path"],
            "mix_sec": mix["sec"], "mix_path": mix["path"],
            "full_sec": full["sec"],
            "touched_groups": mix["touched_groups"],
        })
        # sync classification: append-shaped range reads only new dirs;
        # the delete (rewrite) range pays the content diff
        v = snap.current_version(spark, src)
        t = time.monotonic()
        ch = sync.table_net_changes(spark, src, *append_range, "id")
        _ = sum(x.count() for x in ch.values() if x is not None)
        classify_append = round(time.monotonic() - t, 3)
        t = time.monotonic()
        ch = sync.table_net_changes(spark, src, v - 1, v, "id")
        _ = sum(x.count() for x in ch.values() if x is not None)
        classify_diff = round(time.monotonic() - t, 3)
        return {
            "rows": n, "groups": create["groups"], "create_sec": create_sec,
            "steps": steps,
            "classify_sec": {"append_shaped": classify_append,
                             "rewrite_diff": classify_diff},
            "verify": {
                "lin": ivm.agg_view_verify(spark, views["lin"])["equal"],
                "mix": ivm.agg_view_verify(spark, views["mix"])["equal"],
            },
        }

    return {
        "mode": "ivm", "factor": factor,
        "scales": {
            "base": series("base", 1),
            f"x{factor}": series(f"x{factor}", factor),
        },
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
    }


def cdf_bench(spark, base: str, workdir: str, factor: int = 10) -> dict:
    """r13 follow-up: what the write-time CHANGE DATA FEED buys and
    costs, A/B-measured. The r13 IVM study found the retraction pole:
    a keyed delete on a feed-less table pays snapshot_diff's exceptAll
    over BOTH full versions (30.8 s at 15M rows vs 1.8 s full
    recompute). The CDF moves that work to write time, where the delta
    is already known. Same corpus (orders money rollup, ×factor
    replica), two tables through an identical merge(2%) + delete(5%)
    history — one emitting the feed (default), one with
    emit_changes=False — measuring:

    - commit walls (merge/delete): the emission's write-time price
      (one extra column-complete semi-join scan of the base);
    - IVM linear-view refresh walls after each commit: O(delta) feed
      vs O(corpus) exceptAll;
    - sync classification wall (table_net_changes) on the rewrite
      ranges.

    Equivalence asserted throughout (agg_view_verify; classification
    counts equal across arms), so every timed number is a CORRECT
    refresh."""
    import tempfile

    from pwhl_data_engineering_pipeline_spark.operators import ivm, sync
    from pwhl_data_engineering_pipeline_spark.sources import snapshots as snap
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    from pyspark.sql import functions as F

    LIN = [("n", "count", None), ("total", "sum", "cents"),
           ("mean", "avg", "cents")]
    base_rows = (
        read_testdata(spark, base, "orders")
        .select(
            F.col("o_custkey").alias("grp"),
            F.col("o_orderkey").alias("id"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        )
        .localCheckpoint()
    )

    def corpus_at(f: int):
        parts = [
            base_rows.withColumn("id", F.col("id") + F.lit(i * 10_000_000))
            for i in range(f)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def series(label: str, f: int) -> dict:
        corpus = corpus_at(f).localCheckpoint()
        n = corpus.count()
        upd = corpus.filter(F.col("id") % 50 == 3).withColumn(
            "cents", F.col("cents") + 7
        ).localCheckpoint()
        dele = corpus.filter(F.col("id") % 20 == 7).select("id").localCheckpoint()
        arms = {}
        for arm, emit in (("feed", True), ("diff", False)):
            src = f"{workdir}/cdf_{arm}_{label}"
            view = f"{workdir}/cdf_{arm}_view_{label}"
            snap.snapshot_overwrite(corpus, src)
            ivm.agg_view_create(spark, src, view, ["grp"], LIN)
            out = {"rows": n, "upd_rows": upd.count(), "del_rows": dele.count()}
            t = time.monotonic()
            snap.snapshot_merge(upd, src, ["id"], emit_changes=emit)
            out["merge_commit_sec"] = round(time.monotonic() - t, 3)
            t = time.monotonic()
            r = ivm.agg_view_refresh(spark, view)
            out["merge_refresh_sec"] = round(time.monotonic() - t, 3)
            out["merge_refresh_path"] = r["path"]
            t = time.monotonic()
            snap.snapshot_delete(dele, src, ["id"], emit_changes=emit)
            out["delete_commit_sec"] = round(time.monotonic() - t, 3)
            t = time.monotonic()
            r = ivm.agg_view_refresh(spark, view)
            out["delete_refresh_sec"] = round(time.monotonic() - t, 3)
            out["delete_refresh_path"] = r["path"]
            v = snap.current_version(spark, src)
            t = time.monotonic()
            ch = sync.table_net_changes(spark, src, v - 2, v, "id")
            counts = {k: (x.count() if x is not None else 0)
                      for k, x in ch.items()}
            out["classify_sec"] = round(time.monotonic() - t, 3)
            out["classify_counts"] = counts
            assert ivm.agg_view_verify(spark, view)["equal"], (arm, label)
            arms[arm] = out
        assert arms["feed"]["classify_counts"] == arms["diff"]["classify_counts"]
        # PAIRED same-table emission cost: the cross-arm commit walls
        # above compare two different tables in different cache states
        # (first run showed a 1.9 s 15M-row rewrite vs a 27.8 s one —
        # state noise, not emission). Alternate no-emit/emit merges on
        # ONE table, plus the feed construction timed alone.
        src = f"{workdir}/cdf_feed_{label}"
        paired = {}
        for tag, emit, mod in (("merge_noemit", False, 61),
                               ("merge_emit", True, 63),
                               ("merge_noemit2", False, 67),
                               ("merge_emit2", True, 69)):
            u = (snap.read_snapshot(spark, src)
                 .filter(F.col("id") % mod == 3)
                 .withColumn("cents", F.col("cents") + 1).localCheckpoint())
            u.count()
            t = time.monotonic()
            snap.snapshot_merge(u, src, ["id"], emit_changes=emit)
            paired[tag] = round(time.monotonic() - t, 3)
        b = snap.read_snapshot(spark, src)
        u = (b.filter(F.col("id") % 71 == 3)
             .withColumn("cents", F.col("cents") + 1).localCheckpoint())
        u.count()
        t = time.monotonic()
        feed = (
            snap._conform(
                b.join(u.select("id"), ["id"], "left_semi"), b.columns
            ).withColumn("_change", F.lit("delete"))
            .unionByName(
                snap._conform(u, b.columns).withColumn("_change", F.lit("insert"))
            )
        )
        snap._write_changes(feed, src)
        paired["feed_write_alone"] = round(time.monotonic() - t, 3)
        return {**arms, "emission_paired": paired}

    return {
        "mode": "cdf", "factor": factor,
        "scales": {
            "base": series("base", 1),
            f"x{factor}": series(f"x{factor}", factor),
        },
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
    }


def zonemap_bench(spark, base: str, workdir: str, factor: int = 10) -> dict:
    """r13: what manifest zone maps buy on a time-appended table — the
    deployment shape where a 100 TB fact accretes one directory per
    ingest window and dashboard queries hit a recent slice. Orders
    (×factor) land as 12 month-bucketed appends with stats on the date
    column; we time the same one-month aggregate three ways:

    - ``bounds``: read_snapshot(bounds=...) — manifest prunes 11/12
      dirs before any listing/footers;
    - ``filter``: plain read + the same filter — parquet row-group
      pruning only (every footer still opened, every dir listed);
    - ``full``: unfiltered aggregate (the yardstick).

    Result identity bounds-vs-filter is asserted, so the timed numbers
    are the same correct query."""
    from pwhl_data_engineering_pipeline_spark.sources import snapshots as snap
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    from pyspark.sql import functions as F

    base_rows = (
        read_testdata(spark, base, "orders")
        .select(
            F.col("o_orderkey").alias("id"),
            F.col("o_orderdate").cast("date").alias("day"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        )
        .localCheckpoint()
    )

    def series(label: str, f: int) -> dict:
        parts = [
            base_rows.withColumn("id", F.col("id") + F.lit(i * 10_000_000))
            for i in range(f)
        ]
        corpus = parts[0]
        for pp in parts[1:]:
            corpus = corpus.unionByName(pp)
        # bucket by YEAR — contiguous, disjoint date ranges per dir (a
        # month(day) bucketing mixes every year into every dir and
        # prunes nothing; the first run proved it, kept for the record)
        corpus = corpus.withColumn(
            "yr", F.year("day")
        ).localCheckpoint()
        p = f"{workdir}/zm_{label}"
        years = sorted(
            r[0] for r in corpus.select("yr").distinct().collect()
        )
        for i, yv in enumerate(years):
            snap.snapshot_append(
                corpus.filter(F.col("yr") == yv).drop("yr"), p,
                stats_cols=["day"] if i == 0 else None,
            )
        n = corpus.count()
        import datetime

        lo, hi = datetime.date(1997, 3, 1), datetime.date(1997, 3, 31)
        rep = snap.snapshot_prune_report(spark, p, {"day": (lo, hi)})

        def agg(df):
            return df.groupBy(F.trunc("day", "mm").alias("m")).agg(
                F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c")
            )

        def run(df):
            t = time.monotonic()
            rows = agg(df).collect()
            return round(time.monotonic() - t, 3), sorted(map(tuple, rows))

        out = {}
        for name, df in (
            ("bounds", snap.read_snapshot(spark, p, bounds={"day": (lo, hi)})),
            ("filter", snap.read_snapshot(spark, p).filter(
                (F.col("day") >= lo) & (F.col("day") <= hi))),
            ("full", snap.read_snapshot(spark, p)),
        ):
            walls = []
            for _ in range(3):
                w, rows = run(df)
                walls.append(w)
            out[name] = {"sec_min": min(walls), "sec_all": walls}
            if name in ("bounds", "filter"):
                out[name]["rows"] = rows
        assert out["bounds"].pop("rows") == out["filter"].pop("rows")
        return {"rows": n, "dirs": rep["total_dirs"],
                "kept_dirs": rep["kept_dirs"], **out}

    return {
        "mode": "zonemap", "factor": factor,
        "scales": {"base": series("base", 1),
                   f"x{factor}": series(f"x{factor}", factor)},
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
    }


def ivm_partitioned_bench(spark, base: str, workdir: str, factor: int = 10) -> dict:
    """r13: what partition-bounded refresh buys — a (month, customer)
    rollup (~80 month buckets x per-month customers; the view itself is
    LARGE, which is the regime where rewriting it per refresh hurts)
    maintained two ways over the same corpus: an UNPARTITIONED view
    (every refresh rewrites ALL group rows) vs a month-PARTITIONED view
    (refresh rewrites only touched buckets' rows). The delta is the
    realistic shape: new rows landing in ONE month. Create cost is
    reported too — the partitioned store pays one sequential commit per
    bucket up front, the refresh savings amortize it. (A first cut of
    this bench grouped by month alone: an 80-row view whose full
    rewrite is free — measuring only commit overhead. The view size,
    not the bucket count, is what partitioning protects.)"""
    from pwhl_data_engineering_pipeline_spark.operators import ivm
    from pwhl_data_engineering_pipeline_spark.sources import snapshots as snap
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    from pyspark.sql import functions as F

    AGGS = [("n", "count", None), ("total", "sum", "cents")]
    KE = {"month": "CAST(date_trunc('MONTH', odate) AS DATE)"}
    KEYS = ["month", "grp"]
    base_rows = (
        read_testdata(spark, base, "orders")
        .select(
            F.col("o_orderkey").alias("id"),
            F.col("o_custkey").alias("grp"),
            F.col("o_orderdate").alias("odate"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        )
        .localCheckpoint()
    )

    def series(label: str, f: int) -> dict:
        parts = [
            base_rows.withColumn("id", F.col("id") + F.lit(i * 10_000_000))
            for i in range(f)
        ]
        corpus = parts[0]
        for p in parts[1:]:
            corpus = corpus.unionByName(p)
        corpus = corpus.localCheckpoint()
        n = corpus.count()
        src = f"{workdir}/ivmp_src_{label}"
        snap.snapshot_overwrite(corpus, src)
        out = {"rows": n}
        views = {}
        for kind, part_by in [("flat", None), ("bucketed", "month")]:
            v = f"{workdir}/ivmp_{kind}_{label}"
            views[kind] = v
            t0 = time.monotonic()
            c = ivm.agg_view_create(
                spark, src, v, KEYS, AGGS, key_exprs=KE,
                partition_by=part_by,
            )
            out[f"{kind}_create_sec"] = round(time.monotonic() - t0, 3)
            out["groups"] = c["groups"]
        # one-month delta: the continuous-aggregate ingest shape
        one_month = corpus.filter(
            F.expr("date_trunc('MONTH', odate) = DATE '1995-06-01'")
        ).withColumn("id", F.col("id") + F.lit(900_000_000))
        out["delta_rows"] = one_month.count()
        snap.snapshot_append(one_month, src)
        for kind in ("flat", "bucketed"):
            t0 = time.monotonic()
            r = ivm.agg_view_refresh(spark, views[kind])
            out[f"{kind}_refresh_sec"] = round(time.monotonic() - t0, 3)
            out[f"{kind}_refresh"] = {
                k: r[k] for k in ("path", "touched_groups") if k in r
            }
            if "touched_partitions" in r:
                out[f"{kind}_refresh"]["touched_partitions"] = r["touched_partitions"]
            assert ivm.agg_view_verify(spark, views[kind])["equal"]
        return out

    return {
        "mode": "ivm-partitioned", "factor": factor,
        "scales": {
            "base": series("base", 1),
            f"x{factor}": series(f"x{factor}", factor),
        },
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1_replica")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument(
        "--mode",
        choices=[
            "relational", "docs", "bm25-probe", "bm25-append",
            "cc-converged", "champions-refresh", "cc-decade", "ivf-append",
            "ivf-drift", "pq-decade", "pq-drift", "streaming-ingest",
            "ngram-hot", "delete-drift", "champions-delete", "ivm",
            "ivm-partitioned", "cdf", "zonemap",
        ],
        default="relational",
        help="relational: re-keyed fact tables; docs: perturbed documents/"
        "embeddings replicas; bm25-probe: probe-only timing against "
        "persisted indexes built untimed at both scales; bm25-append: "
        "append cost along batch-size and corpus-size axes; cc-converged: "
        "connected-components re-invocation cost on a stable round log",
    )
    ap.add_argument(
        "--perturb",
        choices=["suffix", "translate", "permute"],
        default="suffix",
        help="docs-replica text perturbation: suffix = shared vocabulary "
        "(term-stats ops), translate = disjoint shingles across copies "
        "(dedup/similarity ops; period 26 — dup clusters at factor > 26), "
        "permute = independent seeded alphabet permutation per copy "
        "(pure scale at any factor; see build_docs_replica docstring)",
    )
    args = ap.parse_args()

    from pwhl_data_engineering_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    queries = em.extended_queries()
    queries.update(_op_queries())
    names = [q for q in args.queries.split(",") if q]

    if args.mode == "bm25-probe":
        os.makedirs(args.out, exist_ok=True)
        if not args.skip_build:
            build_docs_replica(spark, args.base, args.out, args.factor, args.perturb)
        results, layout = {}, {}
        for label, d in [("base", args.base), (f"x{args.factor}", args.out)]:
            probe = bm25_probe_timer(spark, d, args.out)
            probe()  # warm
            results[label] = round(min(probe() for _ in range(2)), 3)
            layout[label] = {
                "build_sec": probe.build_sec,
                "n_posting_files": probe.n_posting_files,
            }
        results["ratio"] = round(results[f"x{args.factor}"] / results["base"], 2)
        print(json.dumps({
            "mode": "bm25-probe", "factor": args.factor, "results": results,
            "layout": layout,
            "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
        }))
        return

    if args.mode == "bm25-append":
        os.makedirs(args.out, exist_ok=True)
        if not args.skip_build:
            build_docs_replica(spark, args.base, args.out, args.factor, args.perturb)
        print(json.dumps(bm25_append_bench(spark, args.base, args.out, args.factor)))
        return

    if args.mode == "cc-converged":
        os.makedirs(args.out, exist_ok=True)
        if not args.skip_build:
            build_docs_replica(spark, args.base, args.out, args.factor, args.perturb)
        print(json.dumps(cc_converged_bench(spark, args.base, args.out)))
        return

    if args.mode == "ivf-drift":
        print(json.dumps(ivf_drift_bench(spark)))
        return

    if args.mode == "delete-drift":
        os.makedirs(args.out, exist_ok=True)
        print(json.dumps(delete_drift_bench(spark, args.base, args.out, args.factor)))
        return

    if args.mode == "champions-delete":
        os.makedirs(args.out, exist_ok=True)
        print(json.dumps(champions_delete_bench(spark, args.base, args.out, args.factor)))
        return

    if args.mode == "ivm":
        os.makedirs(args.out, exist_ok=True)
        print(json.dumps(ivm_bench(spark, args.base, args.out, args.factor)))
        return

    if args.mode == "cdf":
        os.makedirs(args.out, exist_ok=True)
        print(json.dumps(cdf_bench(spark, args.base, args.out, args.factor)))
        return

    if args.mode == "zonemap":
        os.makedirs(args.out, exist_ok=True)
        print(json.dumps(zonemap_bench(spark, args.base, args.out, args.factor)))
        return

    if args.mode == "ivm-partitioned":
        os.makedirs(args.out, exist_ok=True)
        print(json.dumps(ivm_partitioned_bench(spark, args.base, args.out, args.factor)))
        return

    if args.mode == "ngram-hot":
        print(json.dumps(ngram_hot_bench(spark)))
        return

    if args.mode == "pq-drift":
        print(json.dumps(pq_drift_bench(spark)))
        return

    if args.mode == "streaming-ingest":
        os.makedirs(args.out, exist_ok=True)
        if not args.skip_build:
            build_docs_replica(spark, args.base, args.out, args.factor, args.perturb)
        print(json.dumps(streaming_ingest_bench(spark, args.base, args.out, args.factor)))
        return

    if args.mode == "pq-decade":
        os.makedirs(args.out, exist_ok=True)
        if not args.skip_build:
            build_docs_replica(spark, args.base, args.out, args.factor, args.perturb)
        print(json.dumps(pq_decade_bench(spark, args.base, args.out, args.factor)))
        return

    if args.mode == "ivf-append":
        os.makedirs(args.out, exist_ok=True)
        if not args.skip_build:
            build_docs_replica(spark, args.base, args.out, args.factor, args.perturb)
        print(json.dumps(ivf_append_bench(spark, args.base, args.out, args.factor)))
        return

    if args.mode == "champions-refresh":
        os.makedirs(args.out, exist_ok=True)
        if not args.skip_build:
            build_docs_replica(spark, args.base, args.out, args.factor, args.perturb)
        print(json.dumps(champions_refresh_bench(spark, args.base, args.out, args.factor)))
        return

    if args.mode == "cc-decade":
        os.makedirs(args.out, exist_ok=True)
        if not args.skip_build:
            build_docs_replica(spark, args.base, args.out, args.factor, args.perturb)
        print(json.dumps(cc_decade_bench(spark, args.base, args.out, args.factor, args.out)))
        return

    if not args.skip_build:
        t0 = time.monotonic()
        if args.mode == "docs":
            build_docs_replica(spark, args.base, args.out, args.factor, args.perturb)
        else:
            build_replica(spark, args.base, args.out, args.factor)
        print(f"replica built in {time.monotonic() - t0:.1f}s -> {args.out}", file=sys.stderr)

    def run_once(name: str, sf_dir: str) -> float:
        t0 = time.monotonic()
        df = queries[name](spark, sf_dir)
        try:
            df.write.format("noop").mode("overwrite").save()
        except Exception:
            df.collect()
        return time.monotonic() - t0

    for name in names:  # warm: codegen, footers, worker pool
        run_once(name, "/root/testdata/sf0.001")

    results = {}
    for name in names:
        base_t = min(run_once(name, args.base) for _ in range(2))
        big_t = min(run_once(name, args.out) for _ in range(2))
        results[name] = {
            "base_sec": round(base_t, 3),
            f"x{args.factor}_sec": round(big_t, 3),
            "ratio": round(big_t / base_t, 2),
        }
        print(name, results[name], file=sys.stderr)

    print(json.dumps({
        "factor": args.factor,
        "base": args.base,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
        "results": results,
    }))


if __name__ == "__main__":
    main()
