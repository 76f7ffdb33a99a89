"""operators/sampling: deterministic splits and weighted corpus mixing.

The contract under test is row-autonomy: a document's split label and
keep/drop decision depend only on (seed, key), never on other rows,
row order, or the partition layout — the property that makes membership
reproducible on any cluster size and stable as the corpus grows.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import sampling


def _expected_bucket(seed: str, key: object) -> int:
    digest = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()
    return int(digest[:8], 16) % 10_000


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hash_split_matches_reference_md5(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    out = sampling.hash_split(df, "k", (("a", 0.5), ("b", 0.5)), seed="s1")
    for row in out.collect():
        want = "a" if _expected_bucket("s1", row["k"]) < 5000 else "b"
        assert row["split"] == want


def test_split_total_and_deterministic(docs):
    out = sampling.hash_split(docs, "doc_id", seed="split42")
    n = docs.count()
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # every row gets exactly one label
    assert set(counts) <= {"train", "val", "test"}
    # roughly 80/10/10 (loose tolerance; small SF)
    assert counts["train"] / n == pytest.approx(0.8, abs=0.05)
    # second run identical — no RNG state anywhere
    again = {r["split"]: r["n"] for r in sampling.hash_split(docs, "doc_id", seed="split42")
             .groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert again == counts


def test_split_stable_under_growth_and_layout(docs):
    """Appending rows or repartitioning must never reassign a document."""
    base = sampling.hash_split(docs.filter(F.col("doc_id") < 200), "doc_id").select("doc_id", "split")
    grown = sampling.hash_split(docs.repartition(17), "doc_id").select("doc_id", "split")
    joined = base.alias("a").join(grown.alias("b"), "doc_id")
    assert joined.filter(F.col("a.split") != F.col("b.split")).count() == 0


def test_split_weight_validation(docs):
    with pytest.raises(ValueError):
        sampling.hash_split(docs, "doc_id", (("a", 0.5), ("b", 0.2)))


def test_weighted_sample_rates_and_flag_parity(docs):
    rates = {"src0": 1.0, "src1": 0.5}
    kept = sampling.weighted_sample(docs, "doc_id", "source", rates, default_rate=0.0, seed="m")
    flagged = sampling.weighted_sample(
        docs, "doc_id", "source", rates, default_rate=0.0, seed="m", flag_col="keep"
    )
    # filter mode == flag mode
    assert kept.count() == flagged.filter("keep").count()
    per_src = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    totals = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per_src.get("src0", 0) == totals["src0"]  # rate 1.0 keeps everything
    for src in totals:  # default_rate 0.0 drops unlisted slices entirely
        if src not in rates:
            assert src not in per_src
    # rate accuracy needs a sample bigger than one 25-doc slice: apply 0.5
    # to every row via default_rate and check the global keep fraction
    n = docs.count()
    half = sampling.weighted_sample(docs, "doc_id", "source", {}, default_rate=0.5, seed="m")
    assert half.count() / n == pytest.approx(0.5, abs=0.05)


def test_weighted_sample_rate_validation(docs):
    with pytest.raises(ValueError):
        sampling.weighted_sample(docs, "doc_id", "source", {"src0": 1.5})
    with pytest.raises(ValueError):
        sampling.weighted_sample(docs, "doc_id", "source", {}, default_rate=-0.1)


def test_split_is_map_side_only(docs):
    """The split/keep columns are pure projections: the physical plan has no
    exchange, so at 100 TB membership is computed where the row already is."""
    out = sampling.weighted_sample(
        sampling.hash_split(docs, "doc_id"), "doc_id", "source", {"src0": 0.5}, flag_col="keep"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_sql_mirrors_match_spark(docs):
    """split_sql / keep_sql (the oracle recipes) agree row-for-row with the
    DataFrame implementation — the diff-testability contract."""
    import duckdb

    weights = (("train", 0.7), ("rest", 0.3))
    rates = {"src0": 0.4}
    spark_out = sampling.weighted_sample(
        sampling.hash_split(docs, "doc_id", weights, seed="zz"),
        "doc_id", "source", rates, default_rate=0.2, seed="kk", flag_col="keep",
    ).select("doc_id", "split", "keep")
    pdf = docs.select("doc_id", "source").toPandas()
    con = duckdb.connect()
    con.register("d", pdf)
    split_e = sampling.split_sql("doc_id", weights, "zz")
    keep_e = sampling.keep_sql("doc_id", "source", rates, 0.2, "kk")
    duck = con.execute(
        f"SELECT doc_id, {split_e} AS split, {keep_e} AS keep FROM d ORDER BY doc_id"
    ).fetchall()
    got = [(r["doc_id"], r["split"], r["keep"]) for r in spark_out.orderBy("doc_id").collect()]
    assert got == [(a, b, bool(c)) for a, b, c in duck]


def test_sample_k_per_group_exact_and_deterministic(spark):
    from pwhl_data_engineering_pipeline_spark.operators import sampling

    rows = [(i, "big" if i < 50 else "small") for i in range(56)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.sample_k_per_group(df, ["source"], "doc_id", 10)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert counts == {"big": 10, "small": 6}  # min(k, group size), exactly
    # pure function of (seed, key): identical set under different partitioning
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in sampling.sample_k_per_group(
        df.repartition(7), ["source"], "doc_id", 10).collect()}
    assert a == b
    # different seed → different (almost surely) selection of the big group
    c = {r["doc_id"] for r in sampling.sample_k_per_group(
        df, ["source"], "doc_id", 10, seed="other").collect()}
    assert c != a


# ---- leakage-safe split / token budget / hard negatives (r3 additions) ----

from pwhl_data_engineering_pipeline_spark.operators import similarity as _sim


def test_leakage_safe_split_keeps_duplicates_together(spark):
    rows = []
    for i in range(300):
        # 100 clusters of 3 byte-identical (after normalization) copies
        rows.append((i, f"Document  number {i % 100} content"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sampling.leakage_safe_split(df, "text", "doc_id").collect()
    by_text = {}
    for r in out:
        key = " ".join(r["text"].lower().split())
        by_text.setdefault(key, set()).add(r["split"])
    # every duplicate cluster lives in exactly one split
    assert all(len(s) == 1 for s in by_text.values())
    # and the split is not degenerate (multiple labels used across clusters)
    assert len({next(iter(s)) for s in by_text.values()}) >= 2


def test_leakage_safe_split_cluster_col_variant(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 20)],
        "doc_id long, text string, cluster long",
    )
    out = sampling.leakage_safe_split(
        df, "text", "doc_id", cluster_col="cluster"
    ).collect()
    splits = {r["doc_id"]: r["split"] for r in out}
    assert splits[1] == splits[2]  # same near-dup cluster → same split


def test_select_token_budget_exact_prefix(spark):
    df = spark.createDataFrame(
        [(1, 100, 0.9), (2, 100, 0.8), (3, 100, 0.7), (4, 100, 0.6)],
        "doc_id long, n_tokens int, q double",
    )
    kept = sampling.select_token_budget(df, "n_tokens", "q", "doc_id", budget=250)
    assert {r["doc_id"] for r in kept.collect()} == {1, 2}  # 3rd would hit 300
    # boundary exactly met is kept
    kept2 = sampling.select_token_budget(df, "n_tokens", "q", "doc_id", budget=300)
    assert {r["doc_id"] for r in kept2.collect()} == {1, 2, 3}
    # first doc alone over budget -> empty
    assert sampling.select_token_budget(df, "n_tokens", "q", "doc_id", budget=50).count() == 0


def test_hard_negatives_excludes_positives(spark):
    # 1-d directions in 2-d space: cosine ordering is fully controlled
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.99, 0.14]),   # nearest to 0
        (2, [0.9, 0.43]),
        (3, [0.7, 0.71]),
        (4, [0.0, 1.0]),
    ]
    corpus = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qvecs = [(0, [1.0, 0.0])]
    positives = spark.createDataFrame(
        [(0, 0), (0, 1)], "query_id long, pos_id long"
    )
    out = _sim.hard_negatives(corpus, qvecs, positives, k=2, fetch_k=5)
    rows = sorted(
        ((r["neg_rank"], r["vec_id"]) for r in out.collect())
    )
    # positives 0 (self) and 1 (nearest) excluded; negatives are 2 then 3
    assert rows == [(1, 2), (2, 3)]


def test_hard_negatives_headroom_shortfall_documented(spark):
    """With fetch_k too small to cover the positive set, fewer than k
    negatives return (the documented contract, not silent wrongness)."""
    vecs = [(i, [1.0, i * 0.1]) for i in range(6)]
    corpus = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qvecs = [(0, [1.0, 0.0])]
    positives = spark.createDataFrame(
        [(0, i) for i in range(4)], "query_id long, pos_id long"
    )
    out = _sim.hard_negatives(corpus, qvecs, positives, k=3, fetch_k=5)
    assert out.count() == 1  # only one non-positive inside the fetch window


def test_corpus_pipeline_v2_stages_and_integrity(spark, sf_dir):
    from pwhl_data_engineering_pipeline_spark.plans.corpus import run_corpus_pipeline_v2
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    docs = read_testdata(spark, sf_dir, "documents")
    res = run_corpus_pipeline_v2(docs)
    names = [s.name for s in res.orchestrator.results]
    assert names == [
        "quality_filter", "lm_gate", "dedup_exact",
        "leakage_safe_split", "temperature_mix_train", "stats",
    ]
    # holdout is untouched by the mix: every val/test doc surviving dedup is
    # present (mix applies to train only)
    hold = res.holdout.groupBy("split").count().collect()
    assert {r["split"] for r in hold} <= {"val", "test"}
    # no doc appears in two splits
    train_ids = {r["doc_id"] for r in res.train.select("doc_id").collect()}
    hold_ids = {r["doc_id"] for r in res.holdout.select("doc_id").collect()}
    assert not (train_ids & hold_ids)
    # lm gate skip path degrades to quality-only
    res2 = run_corpus_pipeline_v2(docs, lm_floor=None)
    assert [s.name for s in res2.orchestrator.results if s.skipped] == ["lm_gate"]


def _es_key_ref(seed: str, key: object, w: float) -> int:
    """Pure-python reference of es_sample_key: md5 -> u in (0,1] -> floored
    ln(u)/w nanos. Independent of both the Spark column and the SQL mirror."""
    import math

    v = int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:13], 16)
    u = (v + 1) / 2**52
    return math.floor(math.log(u) / w * 1e9)


def test_weighted_sample_k_matches_reference(spark):
    """A-ES selection equals a pure-python reference on (key, ordering,
    selected ids): weight-proportional without-replacement sampling is
    row-autonomous and engine-portable."""
    rows = [(i, float(1 + (i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sampling.weighted_sample_k(df, 25, "w", key_out="es")
    got_rows = {r["doc_id"]: r["es"] for r in got.collect()}
    ref = sorted(
        ((_es_key_ref("wsk", i, w), -i) for i, w in rows), reverse=True
    )[:25]
    ref_ids = {-neg_i for _, neg_i in ref}
    assert set(got_rows) == ref_ids
    for i, w in rows:
        if i in got_rows:
            assert got_rows[i] == _es_key_ref("wsk", i, w)


def test_weighted_sample_k_sql_mirror_agrees(spark):
    """es_sample_key_sql (the oracle recipe) computes the identical key."""
    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(100)], "doc_id long, w double"
    )
    spark_keys = {
        r["doc_id"]: r["es"]
        for r in df.select(
            "doc_id", sampling.es_sample_key("doc_id", "w").alias("es")
        ).collect()
    }
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, w DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, float(1 + i % 7)) for i in range(100)])
    sql_keys = dict(
        con.sql(
            f"SELECT doc_id, {sampling.es_sample_key_sql('doc_id', 'w')} FROM t"
        ).fetchall()
    )
    assert spark_keys == sql_keys


def test_weighted_sample_k_statistics_and_guards(spark):
    """A 1000x-weight row must win k=1 for (almost) any seed; zero/NULL
    weights are excluded; k<=0 raises."""
    rows = [(0, 1000.0)] + [(i, 1.0) for i in range(1, 30)] + [(99, 0.0), (98, None)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    wins = sum(
        sampling.weighted_sample_k(df, 1, "w", seed=f"s{j}").collect()[0]["doc_id"] == 0
        for j in range(12)
    )
    assert wins >= 11  # P(miss) ~ 1/1000 per seed
    ids = {r["doc_id"] for r in sampling.weighted_sample_k(df, 40, "w").collect()}
    assert 99 not in ids and 98 not in ids and len(ids) == 30
    with pytest.raises(ValueError):
        sampling.weighted_sample_k(df, 0, "w")


def test_weighted_sample_k_plan_is_take_ordered(spark):
    """Global selection must be TakeOrderedAndProject (per-partition top-k
    + k-row driver merge), never a full sort shuffle."""
    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 17 + 1).cast("double").alias("w")
    )
    out = sampling.weighted_sample_k(df, 10, "w")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_k_grouped(spark):
    """group_cols: exactly k per group, each group's picks equal the
    reference restricted to that group."""
    rows = [(i, ["en", "fr"][i % 2], float(1 + (i * 3) % 5)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    got = sampling.weighted_sample_k(df, 7, "w", group_cols=["lang"])
    by_lang: dict[str, set] = {}
    for r in got.collect():
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert sorted(len(v) for v in by_lang.values()) == [7, 7]
    for lang, ids in by_lang.items():
        ref = sorted(
            ((_es_key_ref("wsk", i, w), -i) for i, lg, w in rows if lg == lang),
            reverse=True,
        )[:7]
        assert ids == {-n for _, n in ref}, lang
