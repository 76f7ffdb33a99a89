"""Operator unit tests: dedup actually finds planted near-dups, similarity
matches a numpy oracle, windows are deterministic, sources/writers round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark import schemas
from pwhl_data_engineering_pipeline_spark.operators import (
    dedup,
    multimodal,
    relational,
    similarity,
    windows,
)
from pwhl_data_engineering_pipeline_spark.functions import text
from pwhl_data_engineering_pipeline_spark.sources import readers, writers

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays a merry "
    "tune in the old town square and everyone claps along happily tonight"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE, "en"),
        (1, BASE + " extra", "en"),                      # near-dup of 0
        (2, BASE.replace("brown", "red"), "en"),          # near-dup of 0
        (3, "completely different text about spark engines and parquet files", "en"),
        (4, "  THE   quick brown fox jumps over the lazy dog while the band plays a merry "
            "tune in the old town square and everyone claps along happily tonight ", "en"),  # exact after norm
        (5, "another unrelated document mentioning windows aggregations and joins", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dedup_exact_normalized(docs):
    kept = sorted(r["doc_id"] for r in dedup.dedup_exact(docs).collect())
    # doc 4 is doc 0 after case/whitespace normalization → dropped
    assert kept == [0, 1, 2, 3, 5]


def test_minhash_finds_planted_neardups(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_candidate_pairs(docs, num_hashes=32, num_bands=8).collect()
    }
    assert (0, 4) in pairs  # exact dup always collides
    assert (0, 1) in pairs or (0, 2) in pairs  # near-dups collide
    kept = sorted(r["doc_id"] for r in dedup.dedup_minhash(
        docs, jaccard_threshold=0.8, num_hashes=32, num_bands=8
    ).collect())
    assert 0 in kept and 3 in kept and 5 in kept
    assert 4 not in kept  # exact dup suppressed


def test_simhash_hamming(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(docs, max_hamming=6).collect()
    }
    assert pairs.get((0, 4)) == 0  # identical after lower/trim → same signature
    assert (0, 1) in pairs or (0, 2) in pairs


def test_simhash_arrow_matches_expr_semantics(docs):
    """The Arrow twin uses a different hash family, so signatures differ —
    but Hamming SEMANTICS must hold: identical-after-normalization docs at
    distance 0, planted near-dups detected, unrelated docs not."""
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(docs, max_hamming=6, method="arrow").collect()
    }
    assert pairs.get((0, 4)) == 0
    assert (0, 1) in pairs or (0, 2) in pairs
    assert (3, 5) not in pairs
    # single ArrowEvalPython stage: the signature must not be recomputed
    # per band (signatures travel inside the bucket structs)
    plan = (
        dedup.simhash_near_pairs(docs, max_hamming=6, method="arrow")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan


def test_ngram_jaccard(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert pairs[(0, 4)] == pytest.approx(1.0)
    assert (0, 1) in pairs


def test_ngram_contamination(docs):
    # eval = doc 0; docs 1/2/4 share 4-grams with it, 3/5 are clean
    evalset = docs.filter(F.col("doc_id") == 0)
    corpus = docs.filter(F.col("doc_id") != 0)
    hits = {
        r["doc_id"]: (r["shared_grams"], r["n_eval_docs"], r["first_eval_id"])
        for r in dedup.ngram_contamination(corpus, evalset, n=4).collect()
    }
    assert set(hits) == {1, 2, 4}
    assert all(v[1] == 1 and v[2] == 0 for v in hits.values())
    # doc 4 is doc 0 after normalization → shares ALL of doc 0's 4-grams
    n_eval_grams = evalset.select(
        F.explode(text.word_ngrams("text", 4))
    ).distinct().count()
    assert hits[4][0] == n_eval_grams
    # eval side must broadcast: the corpus side never shuffles pre-agg
    plan = (
        dedup.ngram_contamination(corpus, evalset, n=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_ngram_containment_asymmetric(spark):
    """A short doc quoted inside a long one: containment fires in the
    short→long direction only; Jaccard at the same bar would miss it."""
    short = "the quick brown fox jumps over the lazy dog"
    longd = (
        "opening remarks about data engineering pipelines and spark "
        + short
        + " closing remarks about watermarks state stores and parquet files"
    )
    df = spark.createDataFrame(
        [(1, short), (2, longd), (3, "entirely unrelated text about nothing shared")],
        "doc_id long, text string",
    )
    rows = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in dedup.ngram_containment_pairs(df, n=3, threshold=0.8).collect()
    }
    assert set(rows) == {(1, 2)}
    assert rows[(1, 2)] == 1.0  # every 3-gram of the short doc is in the long one
    # resemblance misses it: jaccard for this pair is far below 0.8
    j = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.0).filter(
        "id_a = 1 AND id_b = 2"
    ).collect()[0]["jaccard"]
    assert j < 0.5


def test_minhash_incremental_dedup(spark, docs, tmp_path):
    """Index a corpus once, then dedup an incoming batch against it:
    corpus collisions drop, within-batch pairs keep the min id, novel docs
    survive and (appended) catch tomorrow's copies."""
    idx = str(tmp_path / "mh_idx")
    dedup.minhash_index_write(docs, idx)

    new = spark.createDataFrame(
        [
            (100, BASE + " slightly extended tail", "en"),      # ~corpus near-dup
            (101, "a wholly novel document about streaming watermarks and state stores", "en"),
            (102, "a wholly novel document about streaming watermarks and state stores!!", "en"),  # ~dup of 101
            (103, "entirely distinct content regarding z-order layouts and bloom filters", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    survivors = dedup.dedup_minhash_incremental(spark, new, idx)
    kept = sorted(r["doc_id"] for r in survivors.collect())
    assert kept == [101, 103]  # 100 collides with corpus, 102 loses to 101

    # survivors were appended: a copy of 101 arriving tomorrow is dropped
    tomorrow = spark.createDataFrame(
        [(200, "a wholly novel document about streaming watermarks and state stores", "en")],
        "doc_id long, text string, lang string",
    )
    survivors2 = dedup.dedup_minhash_incremental(spark, tomorrow, idx, append_survivors=False)
    assert survivors2.count() == 0


def test_minhash_incremental_probe_caps_accumulated_hot_bucket(spark, tmp_path):
    """The write-time cap is per-append-batch: a bucket that stays under
    the cap in every batch can still accumulate across appends. The probe
    must re-cap the INDEX side, or one boilerplate bucket fans every future
    batch out quadratically."""
    idx = str(tmp_path / "mh_idx_hot")
    boiler = "identical boilerplate body repeated across daily batches forever"
    cap = 8
    # 5 appends x 4 identical docs: each batch passes max_bucket=8, but the
    # accumulated index bucket holds 20 ids — over the cap.
    for day in range(5):
        batch = spark.createDataFrame(
            [(day * 10 + i, boiler) for i in range(4)], "doc_id long, text string"
        )
        dedup.minhash_index_write(batch, idx, max_bucket=cap, mode="append")
    probe = spark.createDataFrame([(999, boiler)], "doc_id long, text string")
    cross, within = dedup.minhash_incremental_pairs(spark, probe, idx, max_bucket=cap)
    # the accumulated hot bucket is dropped at probe time -> no fanout
    assert cross.count() == 0
    # a healthy (under-cap) bucket still probes fine
    small_idx = str(tmp_path / "mh_idx_ok")
    dedup.minhash_index_write(
        spark.createDataFrame([(1, boiler)], "doc_id long, text string"),
        small_idx, max_bucket=cap,
    )
    cross2, _ = dedup.minhash_incremental_pairs(spark, probe, small_idx, max_bucket=cap)
    assert cross2.select("corpus_id").distinct().count() == 1


def test_int8_quantization_null_and_zero_vectors(spark):
    """Zero vectors (NULL scale) and NULL elements must quantize to 0, not
    clamp to -127 (least/greatest skip NULL inputs — the clamp must see a
    coalesced value)."""
    from pwhl_data_engineering_pipeline_spark.functions import vectors as V

    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [0.5, None, -1.0]), (2, [])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["s"], r["q8"])
        for r in df.select(
            "vec_id",
            V.quantize_scale("embedding").alias("s"),
            V.quantize_int8("embedding").alias("q8"),
        ).collect()
    }
    assert got[0] == (None, [0, 0, 0])  # zero vector -> zeros, not [-127]*3
    s, q8 = got[1]
    assert q8 == [64, 0, -127] and abs(s - 1.0 / 127.0) < 1e-12
    assert got[2] == (None, [])


def test_int8_quantization_roundtrip_and_recall(spark):
    """Quantize→dequantize must preserve cosine to ~1e-2 and brute-force
    top-10 on the compressed column must overlap ≥9/10 with full precision —
    the compressed-retrieval contract."""
    import numpy as np

    from pwhl_data_engineering_pipeline_spark.functions import vectors as V

    rng = np.random.RandomState(3)
    mat = rng.randn(200, 16).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    q = emb.select(
        "vec_id",
        V.quantize_scale("embedding").alias("scale"),
        V.quantize_int8("embedding").alias("q8"),
    ).withColumn("deq", V.dequantize("q8", F.col("scale")))
    # schema really is tinyint (the 4x storage claim)
    assert dict(q.dtypes)["q8"] == "array<tinyint>"
    # per-vector cosine(original, dequantized) ≈ 1
    joined = emb.join(q, "vec_id").select(V.cosine("embedding", "deq").alias("c"))
    assert joined.agg(F.min("c")).collect()[0][0] > 0.995

    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    full = (
        emb.crossJoin(query)
        .select("vec_id", V.cosine("embedding", "qv").alias("c"))
        .orderBy(F.desc("c")).limit(10).collect()
    )
    approx = (
        q.crossJoin(query)
        .select("vec_id", V.cosine("deq", "qv").alias("c"))
        .orderBy(F.desc("c")).limit(10).collect()
    )
    overlap = {r["vec_id"] for r in full} & {r["vec_id"] for r in approx}
    assert len(overlap) >= 9


def test_brute_force_topk_vs_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(50, 8).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(50)], schemas.EMBEDDINGS
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in similarity.brute_force_topk(emb, q, k=5).orderBy("rank").collect()
    ]
    v = vecs.astype("float64")
    cos = (v @ v[0]) / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
    top = sorted(range(50), key=lambda i: (-cos[i], i))[:5]
    assert [g[0] for g in got] == top
    for (_, c), i in zip(got, top):
        assert c == pytest.approx(cos[i], abs=2e-6)


def test_brute_force_arrow_matches_expression(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    vecs = rng.randn(120, 8).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(120)], schemas.EMBEDDINGS
    ).repartition(4)
    qv = [(i, [float(x) for x in vecs[i]]) for i in range(3)]
    q = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    a = {(r["query_id"], r["vec_id"]) for r in similarity.brute_force_topk_arrow(emb, qv, k=7).collect()}
    b = {(r["query_id"], r["vec_id"]) for r in similarity.brute_force_topk(emb, q, k=7).collect()}
    assert a == b and len(a) == 21


def test_ivf_topk_recall(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    vecs = rng.randn(200, 8).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(200)], schemas.EMBEDDINGS
    )
    cent, assigned = similarity.ivf_index(emb, n_centroids=8)
    assert assigned.count() == 200  # every vector lands in exactly one bucket
    q = emb.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = similarity.brute_force_topk(emb, q, k=5)
    approx = similarity.ivf_topk(assigned, cent, q, k=5, n_probe=4)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    # probe-ANN recall over half with 4/8 buckets probed
    assert len(e & a) / len(e) >= 0.5


def test_lsh_candidate_pairs_selfmatch(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0], 0), (1, [1.0, 0.001, 0.0, 0.0], 0),
         (2, [-1.0, 0.0, 0.0, 0.0], 0)],
        schemas.EMBEDDINGS,
    )
    pairs = {(r["id_a"], r["id_b"]) for r in similarity.lsh_candidate_pairs(emb, n_planes=8).collect()}
    assert (0, 1) in pairs       # nearly identical vectors share every plane sign
    assert (0, 2) not in pairs   # antipodal vectors share none


def test_embedding_neardup_drop(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.999, 0.01], 0), (2, [0.0, 1.0], 0)],
        schemas.EMBEDDINGS,
    )
    pairs = spark.createDataFrame([(0, 1), (0, 2)], "id_a long, id_b long")
    kept = sorted(
        r["vec_id"] for r in dedup.dedup_embedding_cosine(emb, pairs, threshold=0.98).collect()
    )
    assert kept == [0, 2]


def test_windows_dedup_rank_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "a", 3), (1, "b", 3), (1, "c", 1), (2, "d", 9)],
        "k long, v string, score long",
    )
    out = {
        r["k"]: r["v"]
        for r in windows.dedup_rank(df, ["k"], [F.desc("score"), F.asc("v")]).collect()
    }
    assert out == {1: "a", 2: "d"}  # tie on score=3 broken by v asc


def test_window_requires_partition(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="partition"):
        windows.ranked(df, [], [F.asc("x")])


def test_multimodal_plumbing(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"fake-image-bytes")), (2, bytearray(b""))],
        "media_id long, content binary",
    )
    media = multimodal.attach_meta(media)
    meta = {r["media_id"]: r["meta"] for r in media.collect()}
    assert meta[1]["size_bytes"] == 16 and meta[1]["media_type"] == "image"
    feats = multimodal.extract_features(media, dim=4)
    rows = {r["media_id"]: r["features"] for r in feats.collect()}
    assert len(rows) == 2 and len(rows[1]) == 4
    # deterministic fake: same bytes → same features
    feats2 = {r["media_id"]: r["features"] for r in multimodal.extract_features(media, dim=4).collect()}
    assert rows == feats2
    with pytest.raises(NotImplementedError):
        multimodal.extract_features(media, real_decoder="require")


def test_conform_schema(spark):
    df = spark.createDataFrame([("x", "7")], "a string, b string")
    import pyspark.sql.types as T

    target = T.StructType(
        [T.StructField("b", T.LongType()), T.StructField("a", T.StringType()),
         T.StructField("missing", T.DoubleType())]
    )
    out = relational.conform_schema(df, target)
    assert [f.name for f in out.schema.fields] == ["b", "a", "missing"]
    row = out.collect()[0]
    assert row["b"] == 7 and row["a"] == "x" and row["missing"] is None


def test_sources_struct_of_arrays(spark):
    import pyspark.sql.types as T

    payload = {"time": ["2025-01-01T00:00", "2025-01-01T01:00"], "temp": [1.5, 2.5]}
    schema = T.StructType(
        [T.StructField("time", T.StringType()), T.StructField("temp", T.DoubleType())]
    )
    df = readers.columns_from_struct_of_arrays(spark, payload, schema)
    assert df.count() == 2
    # distributed variant via arrays_zip/explode
    nested = spark.createDataFrame(
        [("m1", ["a", "b"], [1.0, 2.0])], "mkt string, t array<string>, v array<double>"
    )
    flat = readers.explode_struct_of_arrays(nested, ["t", "v"])
    assert [(r["mkt"], r["t"], r["v"]) for r in flat.collect()] == [("m1", "a", 1.0), ("m1", "b", 2.0)]


def test_rest_source_stamping(spark):
    import pyspark.sql.types as T

    schema = T.StructType([T.StructField("x", T.LongType())])
    fetched = readers.rest_source(
        spark,
        [{"market": "A"}, {"market": "B"}],
        lambda req: {"x": [1, 2]},
        schema,
        stamp_cols=["market"],
    )
    rows = {(r["market"], r["x"]) for r in fetched.collect()}
    assert rows == {("A", 1), ("A", 2), ("B", 1), ("B", 2)}


def test_partitioned_writer_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("2025-01-01", "A", 1.0), ("2025-01-02", "B", 2.0)],
        "event_date string, market string, v double",
    ).withColumn("event_date", F.to_date("event_date"))
    out = str(tmp_path / "fact")
    writers.write_parquet_partitioned(df, out, ("event_date",), ("market",))
    back = spark.read.parquet(out)
    assert back.count() == 2
    # partition pruning: filter on event_date reads one partition only
    plan = back.filter(F.col("event_date") == "2025-01-01")._jdf.queryExecution().executedPlan().toString()
    assert back.filter(F.col("event_date") == "2025-01-01").count() == 1
    # dynamic partition overwrite: rewriting one day leaves the other intact
    day2 = spark.createDataFrame([("2025-01-02", "C", 9.9)], "event_date string, market string, v double").withColumn("event_date", F.to_date("event_date"))
    writers.write_parquet_partitioned(day2, out, ("event_date",), ("market",))
    after = {(r["event_date"].isoformat(), r["market"]) for r in spark.read.parquet(out).collect()}
    assert after == {("2025-01-01", "A"), ("2025-01-02", "C")}


def test_asof_null_payload_from_matched_row(spark):
    """ASOF parity edge: a matched right row carrying NULL payload must yield
    NULL (not reach back to an older non-null row), and multiple payload
    columns must come from the SAME matched right row."""
    from pwhl_data_engineering_pipeline_spark.operators import asof

    left = spark.createDataFrame(
        [(1, 5, "e1"), (1, 15, "e2"), (1, 25, "e3")],
        "user_id long, ts long, event string",
    )
    right = spark.createDataFrame(
        [(1, 1, 100.0, "a"), (1, 10, None, "b"), (1, 20, 300.0, None)],
        "user_id long, ts long, px double, tag string",
    )
    out = {
        r["event"]: (r["px"], r["tag"])
        for r in asof.asof_join(
            left, right, keys=["user_id"], left_ts="ts", right_ts="ts",
            right_payload=["px", "tag"],
        ).collect()
    }
    assert out["e1"] == (100.0, "a")
    # matched row (ts=10) has NULL px: must NOT carry 100.0 from ts=1
    assert out["e2"] == (None, "b")
    # matched row (ts=20): px from it AND tag (NULL) from it, not "b" from ts=10
    assert out["e3"] == (300.0, None)


def test_pairs_from_buckets_hot_bucket_capped(spark):
    """A degenerate bucket above the cap contributes NO pairs and the cap is
    enforced before the list aggregation (no unbounded collect state)."""
    rows = [(i, "hot") for i in range(500)] + [(1000, "cold"), (1001, "cold")]
    buckets = spark.createDataFrame(rows, "doc_id long, bucket string")
    pairs = dedup.pairs_from_buckets(buckets, ["bucket"], "doc_id", max_bucket=64).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1000, 1001)}
    stats = {r["bucket"]: (r["bucket_size"], r["dropped"])
             for r in dedup.bucket_skew_stats(buckets, ["bucket"], max_bucket=64).collect()}
    assert stats["hot"] == (500, True) and stats["cold"] == (2, False)


def test_minhash_identical_text_bucket_capped(spark):
    """Thousands of byte-identical docs (the boilerplate pathology): every
    band bucket holds all of them; with the cap the candidate stage completes
    without quadratic pair expansion."""
    n = 3000
    rows = [(i, BASE) for i in range(n)] + [(n, "something else entirely here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_candidate_pairs(docs, num_hashes=32, num_bands=8)
    # all identical-doc buckets exceed the cap → dropped; nothing pairs with
    # the singleton → empty result, and it returns promptly (not C(3000,2))
    assert pairs.count() == 0


def test_simhash_hot_bucket_capped(spark):
    n = 2000
    rows = [(i, BASE) for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup.simhash_near_pairs(docs, max_hamming=3).count() == 0
    # raising the cap beyond the bucket size restores the pairs
    some = dedup.simhash_near_pairs(
        docs.filter(F.col("doc_id") < 5), max_hamming=3, max_bucket=64
    )
    assert some.count() == 10  # C(5,2) identical docs


def test_ngram_stop_gram_cutoff(spark):
    """Grams above the df cutoff are excluded from the inverted index: a pair
    sharing ONLY stop-grams is never a candidate, while true near-dups keep
    their exact Jaccard (denominators stay uncapped)."""
    stock = "all rights reserved contact us for terms"
    rows = (
        [(i, f"unique document number {i} about topic {i * 7} . " + stock) for i in range(40)]
        + [(100, BASE), (101, BASE + " extra")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # cutoff below the boilerplate df (40) but above the near-dup grams' df (2)
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.1, max_gram_df=10).collect()
    }
    assert (100, 101) in pairs
    assert all(a >= 100 for a, _ in pairs), "boilerplate-only pairs must be pruned"
    # the surviving pair's jaccard is the exact uncapped value
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs.filter(F.col("doc_id") >= 100), n=3, threshold=0.1, max_gram_df=None
        ).collect()
    }
    assert pairs[(100, 101)] == pytest.approx(exact[(100, 101)])


def test_vector_mean_long_matches_arrow(spark):
    """The oracle-able long-format centroid and the Arrow partial-mean scale
    path agree (to the long form's rounding)."""
    import numpy as np

    from pwhl_data_engineering_pipeline_spark.operators import vector_agg

    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 6).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], int(i % 3)) for i in range(60)],
        schemas.EMBEDDINGS,
    )
    long = {
        (r["label"], r["dim"]): (r["mean_v"], r["n_vectors"])
        for r in vector_agg.vector_mean_long(emb, ["label"], "embedding").collect()
    }
    arrow = {
        r["label"]: (r["centroid"], r["n_vectors"])
        for r in vector_agg.vector_mean_arrow(emb, ["label"], "embedding").collect()
    }
    assert len(long) == 3 * 6 and len(arrow) == 3
    for (lbl, dim), (mv, n) in long.items():
        cent, n2 = arrow[lbl]
        assert n == n2 == 20
        assert mv == pytest.approx(cent[dim - 1], abs=2e-6)
    # numpy ground truth
    for lbl in range(3):
        truth = vecs[np.arange(60) % 3 == lbl].astype("float64").mean(axis=0)
        for d in range(6):
            assert long[(lbl, d + 1)][0] == pytest.approx(truth[d], abs=2e-6)


def test_corpus_pipeline_end_to_end(spark):
    """plans.corpus: quality filter -> exact dedup -> minhash near-dedup ->
    PII redact -> chunk -> stats, orchestrated and lazily planned."""
    from pwhl_data_engineering_pipeline_spark.plans import corpus

    rows = [
        (0, BASE, "en", "web"),
        (1, BASE + " extra", "en", "web"),                   # near-dup of 0
        (2, "  THE   " + BASE[4:], "en", "web"),             # exact-normalized dup of 0
        (3, "reach me at someone@example.com for the offer and the terms "
            "of the deal with the partners", "en", "mail"),
        (4, "@@@@ ####", "en", "junk"),                       # low quality
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    res = corpus.run_corpus_pipeline(docs, near_dup_jaccard=0.7)

    kept = {r["doc_id"]: r["text"] for r in res.cleaned.collect()}
    assert 4 not in kept          # quality-filtered
    assert 2 not in kept          # exact dup suppressed
    assert 1 not in kept          # near dup suppressed (jaccard >= 0.7)
    assert 0 in kept and 3 in kept
    assert "<EMAIL>" in kept[3]   # redacted

    stages = [s.name for s in res.orchestrator.results]
    assert stages == ["quality_filter", "dedup_exact", "dedup_minhash", "redact_pii", "chunk", "stats"]

    chunks = res.chunks.collect()
    assert all(len(c["chunk_text"]) <= 512 for c in chunks)
    assert {c["doc_id"] for c in chunks} == {0, 3}

    stats = {(r["source"], r["lang"]): r["n_docs"] for r in res.stats.collect()}
    assert stats == {("web", "en"): 1, ("mail", "en"): 1}


def test_ivf_refined_centroids_improve_or_match_recall(spark):
    """Lloyd refinement (assign → recenter via the Arrow partial-mean agg)
    must not hurt recall on clustered data — and typically raises it."""
    import numpy as np

    rng = np.random.RandomState(9)
    # 8 well-separated cluster centers + noise: k-means territory
    centers = rng.randn(8, 8) * 4
    vecs = np.vstack([centers[i % 8] + rng.randn(8) * 0.4 for i in range(240)]).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(240)], schemas.EMBEDDINGS
    )
    q = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r["query_id"], r["vec_id"]) for r in similarity.brute_force_topk(emb, q, k=5).collect()}

    def recall(refine):
        cent, assigned = similarity.ivf_index(emb, n_centroids=8, refine_iterations=refine)
        assert assigned.count() == 240
        approx = {
            (r["query_id"], r["vec_id"])
            for r in similarity.ivf_topk(assigned, cent, q, k=5, n_probe=2).collect()
        }
        return len(exact & approx) / len(exact)

    base, refined = recall(0), recall(2)
    assert refined >= base
    assert refined >= 0.6


def test_resample_ffill(spark):
    """Gap filling: irregular per-key observations land on an hourly grid,
    holes forward-filled from the latest prior observation (struct carry:
    NULL observed values are carried as NULL, not skipped)."""
    from pyspark.sql import functions as F

    from pwhl_data_engineering_pipeline_spark.operators import resample

    rows = [
        ("a", "2025-01-01 00:10:00", 1.0, "x"),
        ("a", "2025-01-01 00:50:00", 2.0, "y"),   # same hour → latest wins
        ("a", "2025-01-01 03:05:00", None, "z"),  # NULL value observation
        ("a", "2025-01-01 04:20:00", 5.0, None),
        ("b", "2025-01-01 01:00:00", 10.0, "q"),
        ("b", "2025-01-01 02:59:00", 20.0, "r"),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double, tag string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = resample.resample_ffill(df, ["k"], "ts", ["v", "tag"], step_seconds=3600)
    got = {
        (r["k"], r["grid_ts"].isoformat()): (r["v"], r["tag"], r["is_observed"])
        for r in out.collect()
    }
    # key a: grid 00..04 (5 cells)
    assert got[("a", "2025-01-01T00:00:00")] == (2.0, "y", True)    # latest in hour
    assert got[("a", "2025-01-01T01:00:00")] == (2.0, "y", False)   # filled
    assert got[("a", "2025-01-01T02:00:00")] == (2.0, "y", False)
    assert got[("a", "2025-01-01T03:00:00")] == (None, "z", True)   # NULL carried, not skipped
    assert got[("a", "2025-01-01T04:00:00")] == (5.0, None, True)
    # key b: grid 01..02
    assert got[("b", "2025-01-01T01:00:00")] == (10.0, "q", True)
    assert got[("b", "2025-01-01T02:00:00")] == (20.0, "r", True)
    assert len(got) == 7


def test_distributed_percentiles_match_builtin(spark):
    """The distributed two-pass exact percentile equals Spark's holistic
    builtin percentile() (linear interpolation) on real data, without
    gathering a group onto one task."""
    from pwhl_data_engineering_pipeline_spark.operators import aggregates
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    li = read_testdata(spark, "/root/testdata/sf0.001", "lineitem")
    ps = [0.25, 0.5, 0.95]
    got = {
        (r["l_returnflag"], r["percentile"]): r["value"]
        for r in aggregates.exact_percentiles_distributed(
            li, "l_returnflag", "l_extendedprice", ps, n_partitions=8
        ).collect()
    }
    ref_rows = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.95))").alias("q")
    ).collect()
    for r in ref_rows:
        for p, expect in zip(ps, r["q"]):
            assert got[(r["l_returnflag"], p)] == pytest.approx(expect, rel=1e-12), (
                r["l_returnflag"], p)


def test_distributed_percentiles_int_group_key(spark):
    from pwhl_data_engineering_pipeline_spark.operators import aggregates

    df = spark.range(1001).selectExpr("id % 2 AS g", "CAST(id AS DOUBLE) AS v")
    got = {
        (r["g"], r["percentile"]): r["value"]
        for r in aggregates.exact_percentiles_distributed(df, "g", "v", [0.5], n_partitions=4).collect()
    }
    ref = {
        r["g"]: r["m"]
        for r in df.groupBy("g").agg(F.expr("percentile(v, 0.5)").alias("m")).collect()
    }
    assert got[(0, 0.5)] == pytest.approx(ref[0], rel=1e-12)
    assert got[(1, 0.5)] == pytest.approx(ref[1], rel=1e-12)


def test_distributed_percentiles_null_group(spark):
    """NULL group keys survive groupBy, so they must survive the internal
    offset/target joins too (null-safe equality) — matching the builtin."""
    from pwhl_data_engineering_pipeline_spark.operators import aggregates

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 10.0), (None, 20.0), (None, 30.0), ("b", 7.0)],
        "g string, v double",
    )
    got = {
        (r["g"], r["percentile"]): r["value"]
        for r in aggregates.exact_percentiles_distributed(df, "g", "v", [0.5, 0.9], n_partitions=3).collect()
    }
    ref = {
        r["g"]: r["q"]
        for r in df.groupBy("g").agg(F.expr("percentile(v, array(0.5, 0.9))").alias("q")).collect()
    }
    for g in ("a", "b", None):
        for p, expect in zip([0.5, 0.9], ref[g]):
            assert got[(g, p)] == pytest.approx(expect, rel=1e-12), (g, p)


def test_minhash_incremental_append_equals_index_write_of_survivors(spark, tmp_path):
    """The survivor-append optimization (reusing batch buckets) must write
    EXACTLY what minhash_index_write(survivors) would: capped over the
    survivor rows, not the batch rows — a bucket hot in the batch can be
    under-cap among survivors and must still be indexed."""
    idx = str(tmp_path / "mh_idx_eq")
    base = spark.createDataFrame(
        [(1, "seed corpus document about parquet file compaction strategies", "en")],
        "doc_id long, text string, lang string",
    )
    dedup.minhash_index_write(base, idx, max_bucket=4)
    before = {tuple(r) for r in spark.read.parquet(idx).collect()}
    batch = spark.createDataFrame(
        [(10 + i, f"novel text number {i} on watermark state store sizing", "en") for i in range(6)]
        + [(50, "seed corpus document about parquet file compaction strategies!", "en")],
        "doc_id long, text string, lang string",
    )
    survivors = dedup.dedup_minhash_incremental(spark, batch, idx, max_bucket=4)
    after = {tuple(r) for r in spark.read.parquet(idx).collect()}
    appended = after - before
    expected_df = dedup._cap_buckets(
        dedup.minhash_buckets(survivors, "text", "doc_id"), 4
    ).select("doc_id", "band", "band_hash")
    expected = {tuple(r) for r in expected_df.collect()}
    # parquet partitioning reorders columns; compare as (id, band, hash) sets
    cols = spark.read.parquet(idx).columns
    appended_norm = {
        (dict(zip(cols, r))["doc_id"], dict(zip(cols, r))["band"], dict(zip(cols, r))["band_hash"])
        for r in appended
    }
    assert appended_norm == expected


def test_ngram_auto_cap_tiny_corpus_lossless(spark):
    """Default max_gram_df="auto" = max(64, 2·√n_docs): on a small corpus
    the 64 floor exceeds every df, so results equal the uncapped run."""
    rows = [(i, f"shared prefix words here document {i} tail {i*3}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    auto = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.05).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.05, max_gram_df=None
        ).collect()
    }
    assert auto == exact and auto


def test_ngram_auto_cap_engages_on_hot_corpus(spark):
    """On a degenerate high-overlap corpus (every doc shares the same
    grams), the auto cap prunes the hot grams — the 14×-at-10× failure mode
    from round 3 — while a pinned max_gram_df above the df would not."""
    n_docs = 300  # df of every gram = 300 > 2·√300 ≈ 35
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(n_docs)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    auto_pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.1).count()
    assert auto_pairs == 0  # all grams hot → no candidates materialized
    uncapped = dedup.ngram_jaccard_pairs(
        docs.filter(F.col("doc_id") < 50), n=3, threshold=0.1, max_gram_df=None
    ).count()
    assert uncapped == 50 * 49 / 2  # the quadratic blow-up the cap prevents


def test_ngram_sum_df2_budget_raises(spark):
    """sum_df2_budget is a fail-fast guard: when the surviving posting lists
    would still materialize more than the budget, raise BEFORE the join."""
    rows = [(i, "common words everywhere same text") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="Σ df²|sum_df2_budget"):
        dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.1, max_gram_df=None, sum_df2_budget=1000
        ).count()
    # generous budget: runs fine
    assert (
        dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.9, max_gram_df=None, sum_df2_budget=10**9
        ).count()
        == 100 * 99 / 2
    )


def test_ngram_prefix_variant_matches_uncapped(spark):
    """ngram_jaccard_pairs_prefix is exact: identical pair set AND jaccard
    values to the uncapped inverted-index join, including boilerplate-heavy
    docs where the stop-gram cutoff would prune."""
    stock = "all rights reserved contact us for terms"
    rows = (
        [(i, f"unique document number {i} about topic {i * 7} . " + stock) for i in range(40)]
        + [(100, BASE), (101, BASE + " extra"), (102, "")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.1, max_gram_df=None
        ).collect()
    }
    pref = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in dedup.ngram_jaccard_pairs_prefix(
            docs, n=3, threshold=0.1
        ).collect()
    }
    assert pref == exact and (100, 101) in pref


def test_minhash_hot_sidecar_probe_is_scan_free_and_compact_prunes(spark, tmp_path):
    """ADVICE round 3: the probe no longer rescans the index for hot
    buckets — it anti-joins the _hot_buckets sidecar maintained at
    write/append time. Sidecar, scan, and compacted-index probes must all
    agree; compaction to a new path leaves an empty sidecar."""
    import os

    idx = str(tmp_path / "mh_idx_side")
    boiler = "identical boilerplate body repeated across daily batches forever"
    cap = 8
    for day in range(5):
        batch = spark.createDataFrame(
            [(day * 10 + i, boiler) for i in range(4)]
            + [(day * 10 + 7, f"healthy unique document for day {day} nothing shared")],
            "doc_id long, text string",
        )
        dedup.minhash_index_write(batch, idx, max_bucket=cap, mode="append")
    assert os.path.isdir(os.path.join(idx, "_hot_buckets"))
    probe = spark.createDataFrame([(999, boiler)], "doc_id long, text string")
    for mode in ("sidecar", "scan"):
        cross, _ = dedup.minhash_incremental_pairs(
            spark, probe, idx, max_bucket=cap, probe_cap=mode
        )
        assert cross.count() == 0, mode
    # trust-write-time-caps mode sees the accumulated bucket (by design)
    cross_none, _ = dedup.minhash_incremental_pairs(
        spark, probe, idx, max_bucket=cap, probe_cap=None
    )
    assert cross_none.count() == 20
    # compact to a fresh path: hot rows pruned, sidecar empty, probe clean
    out = str(tmp_path / "mh_idx_compacted")
    n_hot = dedup.minhash_index_compact(spark, idx, max_bucket=cap, out_path=out)
    assert n_hot > 0
    # the healthy docs' bucket rows survive; every boilerplate row is gone
    compacted = spark.read.parquet(out)
    assert compacted.count() > 0
    assert compacted.filter(F.col("doc_id") % 10 != 7).count() == 0
    cross_c, _ = dedup.minhash_incremental_pairs(
        spark, probe, out, max_bucket=cap, probe_cap=None
    )
    assert cross_c.count() == 0


def test_random_projection_matches_numpy_and_preserves_distance(spark):
    """functions.vectors.random_project: (a) components equal a numpy
    reference computing the same md5-parity sign matrix (independent of
    both the Spark fold and the SQL mirror); (b) the JL property holds on
    random data — mean pairwise-distance distortion stays small at 64→16;
    (c) the projection is a pure function of (seed, dims): re-running and
    re-deriving the matrix give identical output."""
    import numpy as np

    from pwhl_data_engineering_pipeline_spark.functions import vectors as V

    rng = np.random.default_rng(7)
    X = rng.normal(size=(40, 64))
    signs = V.projection_signs(64, 16, seed="jl")
    S = np.array(signs, dtype=np.float64)  # (16, 64)
    expected = (X @ S.T) / np.sqrt(16.0)

    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    got_rows = (
        df.select("vec_id", V.random_project("embedding", signs).alias("p"))
        .orderBy("vec_id")
        .collect()
    )
    got = np.array([r["p"] for r in got_rows])
    assert np.abs(got - expected).max() < 1e-9

    # JL distance preservation (loose, deterministic given the fixed rng)
    def pdists(M):
        d = M[:, None, :] - M[None, :, :]
        return np.sqrt((d * d).sum(-1))[np.triu_indices(len(M), 1)]

    ratio = pdists(got) / pdists(X)
    assert abs(float(ratio.mean()) - 1.0) < 0.15
    assert float(ratio.std()) < 0.25

    # determinism: sign matrix is regenerated, not sampled
    signs2 = V.projection_signs(64, 16, seed="jl")
    assert signs2 == signs
    # and a different seed yields a different matrix (sanity)
    assert V.projection_signs(64, 16, seed="other") != signs


def test_minhash_missing_sidecar_warns_and_probes_uncapped(spark, tmp_path, caplog):
    """ADVICE round 5: an index written WITHOUT a _hot_buckets sidecar
    (pre-sidecar layout) must fall back to uncapped probing — loudly. The
    warning names refresh_hot_sidecar; pairs still come back (the fallback
    degrades protection, never results)."""
    import logging
    import shutil

    idx = str(tmp_path / "mh_idx_nosidecar")
    boiler = "identical boilerplate body repeated across daily batches forever"
    cap = 8
    for day in range(3):
        batch = spark.createDataFrame(
            [(day * 10 + i, boiler) for i in range(4)], "doc_id long, text string"
        )
        dedup.minhash_index_write(batch, idx, max_bucket=cap, mode="append")
    shutil.rmtree(str(tmp_path / "mh_idx_nosidecar" / "_hot_buckets"))
    probe = spark.createDataFrame([(999, boiler)], "doc_id long, text string")
    with caplog.at_level(logging.WARNING, logger="pwhl_data_engineering_pipeline_spark.operators.dedup"):
        cross, _ = dedup.minhash_incremental_pairs(
            spark, probe, idx, max_bucket=cap, probe_cap="sidecar"
        )
        n = cross.count()
    assert n == 12  # uncapped: every accumulated corpus id matches the probe
    warnings = [r for r in caplog.records if "UNCAPPED" in r.getMessage()]
    assert warnings and "refresh_hot_sidecar" in warnings[0].getMessage()
    # refresh_hot_sidecar restores the capped behavior
    assert dedup.refresh_hot_sidecar(spark, idx, max_bucket=cap) > 0
    cross2, _ = dedup.minhash_incremental_pairs(
        spark, probe, idx, max_bucket=cap, probe_cap="sidecar"
    )
    assert cross2.count() == 0


def test_banding_for_threshold_midpoints():
    """The helper picks the divisor pair whose S-curve midpoint is nearest
    the verification threshold (MMDS banding rule)."""
    assert dedup.banding_for_threshold(64, 0.8) == (8, 8)  # (1/8)^(1/8)=0.771
    b, r = dedup.banding_for_threshold(64, 0.9)
    assert (b, r) == (4, 16)  # (1/4)^(1/16)=0.917
    b, r = dedup.banding_for_threshold(32, 0.5)
    assert b * r == 32 and abs((1 / b) ** (1 / r) - 0.5) < 0.12
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.banding_for_threshold(0, 0.5)
    with _pytest.raises(ValueError):
        dedup.banding_for_threshold(64, 1.0)


def test_minhash_verified_pairs_prunes_before_shingles(spark):
    """Round-6 scale fix: shingle arrays are built only for candidate docs.
    Results must be identical to the unpruned semantics, and the plan must
    show the semi-join BEFORE the shingle projection."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
         (3, "totally different words here nothing shared with others"),
         (4, "another unrelated document about streaming state stores"),
         (5, "alpha beta gamma delta epsilon eta")],   # near-dup of 1
        "doc_id long, text string",
    )
    ver = dedup.minhash_verified_pairs(docs, jaccard_threshold=0.5, num_hashes=64, num_bands=8)
    got = {(r["id_a"], r["id_b"]) for r in ver.collect()}
    assert (1, 2) in got                      # exact dup always verifies
    assert all(3 not in p and 4 not in p for p in got)
    plan = ver._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    # survivors via dedup_minhash agree and expose the pin for cleanup
    kept = dedup.dedup_minhash(docs, jaccard_threshold=0.5, num_hashes=64, num_bands=8)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4]
    assert getattr(kept, "_spark_graft_pins", [])
    dedup.unpersist_pins(kept)


def test_minhash_auto_banding_resolves_from_threshold(spark):
    """num_bands='auto' picks the MMDS banding for the call's threshold;
    exact duplicates still verify at any banding (they collide in every
    band regardless)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "nothing shared with the others at all here")],
        "doc_id long, text string",
    )
    ver = dedup.minhash_verified_pairs(
        docs, jaccard_threshold=0.9, num_hashes=64, num_bands="auto"
    )
    got = {(r["id_a"], r["id_b"]) for r in ver.collect()}
    assert got == {(1, 2)}
    explicit = dedup.minhash_verified_pairs(
        docs, jaccard_threshold=0.9, num_hashes=64,
        num_bands=dedup.banding_for_threshold(64, 0.9)[0],
    )
    assert {(r["id_a"], r["id_b"]) for r in explicit.collect()} == got


@pytest.mark.parametrize("num_hashes", [16, 32, 64, 128])
def test_banding_for_threshold_is_minimal_over_divisors(num_hashes):
    """Property: the returned (b, r) has the minimal |midpoint - t| among
    ALL divisor pairs of num_hashes, across a threshold grid."""
    for t10 in range(1, 10):
        t = t10 / 10
        b, r = dedup.banding_for_threshold(num_hashes, t)
        assert b * r == num_hashes
        best = min(
            abs((1.0 / bb) ** (1.0 / (num_hashes // bb)) - t)
            for bb in range(1, num_hashes + 1)
            if num_hashes % bb == 0
        )
        assert abs((1.0 / b) ** (1.0 / r) - t) == best


def test_minhash_incremental_on_connect_local(spark, docs, tmp_path, monkeypatch):
    """r8: the incremental probe's index/sidecar existence checks route
    through fsutil, so the whole index→probe→append cycle (including the
    day-one bootstrap path) works on a Connect-like session over a local
    index path."""
    from pwhl_data_engineering_pipeline_spark import fsutil as _fsu

    monkeypatch.setattr(_fsu, "_has_jvm", lambda s: False)
    idx = str(tmp_path / "mh_idx_cx")

    # day-one bootstrap: missing index is not an error; batch dedups
    # within itself and its survivors CREATE the index
    batch1 = spark.createDataFrame(
        [(1, "a wholly novel document about streaming watermarks", "en"),
         (2, "a wholly novel document about streaming watermarks", "en")],
        "doc_id long, text string, lang string",
    )
    s1 = dedup.dedup_minhash_incremental(spark, batch1, idx)
    assert sorted(r["doc_id"] for r in s1.collect()) == [1]

    # tomorrow's copy probes the fallback-checked sidecar path and drops
    batch2 = spark.createDataFrame(
        [(3, "a wholly novel document about streaming watermarks", "en"),
         (4, "entirely distinct content regarding bloom filters", "en")],
        "doc_id long, text string, lang string",
    )
    s2 = dedup.dedup_minhash_incremental(spark, batch2, idx)
    assert sorted(r["doc_id"] for r in s2.collect()) == [4]
    monkeypatch.setattr(_fsu, "_has_jvm", lambda s: True)


def test_ngram_hash_gram_key_matches_text(spark):
    """gram_key="hash" (8-byte xxhash64 SMJ keys — the VERDICT r9 #3
    spill lever) returns the identical pair set and jaccard values as the
    default gram_key="text" across the cap modes (auto, pinned, None):
    the hash substitutes 1:1 for the gram string in the df histogram, the
    stop-gram anti-join, and the self-join, so only a 64-bit collision
    between distinct grams (≈ G²/2⁶⁵) could diverge — absent here."""
    rows = (
        [(i, f"shared prefix words here document {i} tail {i * 3}") for i in range(40)]
        + [(100, "the quick brown fox jumps over the lazy dog"),
           (101, "the quick brown fox jumps over the lazy cat"),
           (102, "")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for cap in ("auto", 10, None):
        text_pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(
                docs, n=3, threshold=0.05, max_gram_df=cap
            ).collect()
        }
        hash_pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(
                docs, n=3, threshold=0.05, max_gram_df=cap, gram_key="hash"
            ).collect()
        }
        assert hash_pairs == text_pairs and hash_pairs
    with pytest.raises(ValueError, match="gram_key"):
        dedup.ngram_jaccard_pairs(docs, gram_key="sha").count()


def test_ngram_chunked_pairs_match_unchunked(spark):
    """chunk_size (the VERDICT r10 #4 structural lever) re-partitions the
    hot-gram pair enumeration into a triangle of bounded chunk tasks; the
    output must be identical to the classic gram-keyed self-join. The
    corpus mixes genuinely hot grams (df 40 ≫ chunk_size 4 → 10 chunks,
    within- AND cross-chunk pairs) with cold grams (df ≤ chunk_size → the
    degenerate B=1 path) and an empty doc, across cap modes and both
    detectors (jaccard + containment)."""
    rows = (
        [(i, f"alpha beta gamma delta doc {i} tail {i * 7}") for i in range(40)]
        + [(100, "the quick brown fox jumps over the lazy dog"),
           (101, "the quick brown fox jumps over the lazy cat"),
           (102, "")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for cap in ("auto", None):
        plain = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(
                docs, n=3, threshold=0.05, max_gram_df=cap
            ).collect()
        }
        for cs in (4, 1, 10_000):  # heavy chunking, pathological, all-cold
            chunked = {
                (r["id_a"], r["id_b"]): r["jaccard"]
                for r in dedup.ngram_jaccard_pairs(
                    docs, n=3, threshold=0.05, max_gram_df=cap, chunk_size=cs
                ).collect()
            }
            assert chunked == plain and chunked
    # composes with gram_key="hash" (both deep-decade levers together)
    both = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.05, gram_key="hash", chunk_size=4
        ).collect()
    }
    base = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.05).collect()
    }
    assert both == base
    cont_plain = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in dedup.ngram_containment_pairs(docs, n=3, threshold=0.3).collect()
    }
    cont_chunked = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in dedup.ngram_containment_pairs(
            docs, n=3, threshold=0.3, chunk_size=4
        ).collect()
    }
    assert cont_chunked == cont_plain and cont_chunked
