"""Unit tests: dedup.semantic_pairs / semantic_dedup (SemDeDup) and
sampling.temperature_sample."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import dedup, sampling


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb) if na and nb else 0.0


# Three tight groups of near-identical vectors plus singletons: the
# clustering should isolate groups; within-group cosines are ~1.
def _vectors():
    import random

    rnd = random.Random(7)
    base = {
        "a": [1.0, 0.0, 0.0, 0.0],
        "b": [0.0, 1.0, 0.0, 0.0],
        "c": [0.0, 0.0, 1.0, 0.0],
    }
    rows = []
    vid = 0
    groups = {}
    for g, v in base.items():
        for _ in range(5):
            jitter = [x + rnd.uniform(-0.01, 0.01) for x in v]
            rows.append((vid, jitter))
            groups.setdefault(g, []).append(vid)
            vid += 1
    # far-away singletons
    rows.append((vid, [1.0, 1.0, 1.0, 1.0])); vid += 1
    rows.append((vid, [-1.0, 0.5, -0.5, 0.2])); vid += 1
    return rows, groups


@pytest.fixture(scope="module")
def emb(spark):
    rows, _ = _vectors()
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_pairs_exact_within_cluster(spark, emb):
    """With a single cluster the pair stage IS brute force: verify against a
    driver-side exact computation."""
    assigned = emb.withColumn("centroid_id", F.lit(1))
    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in dedup.semantic_pairs(assigned, threshold=0.99).collect()
    }
    rows, _ = _vectors()
    want = {}
    for i, (ia, va) in enumerate(rows):
        for ib, vb in rows[i + 1:]:
            c = _cos(va, vb)
            if c >= 0.99:
                want[(min(ia, ib), max(ia, ib))] = c
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_semantic_dedup_survivor_properties(spark, emb):
    survivors, pairs = dedup.semantic_dedup(
        emb, n_centroids=6, threshold=0.99, refine_iterations=2
    )
    surv = {r["vec_id"] for r in survivors.select("vec_id").collect()}
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    dropped = all_ids - surv
    edge_rows = pairs.collect()
    edges = {(r["id_a"], r["id_b"]) for r in edge_rows}
    # every dropped row is justified by at least one near-dup edge
    in_pairs = {i for e in edges for i in e}
    assert dropped <= in_pairs
    # survivors are pairwise non-duplicate under the discovered edges:
    # two members of one component can't both survive
    assert not any(a in surv and b in surv for a, b in edges)
    # each component keeps exactly its min id
    parent = {i: i for i in in_pairs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for i in in_pairs:
        comps.setdefault(find(i), set()).add(i)
    for members in comps.values():
        assert min(members) in surv
        assert all(m not in surv for m in members if m != min(members))


def test_semantic_dedup_deterministic(spark, emb):
    s1, _ = dedup.semantic_dedup(emb, n_centroids=6, threshold=0.99)
    s2, _ = dedup.semantic_dedup(emb, n_centroids=6, threshold=0.99)
    assert sorted(r["vec_id"] for r in s1.collect()) == sorted(
        r["vec_id"] for r in s2.collect()
    )


def test_semantic_pairs_max_cluster_cap(spark, emb):
    """A collapsed clustering (every vector one cell) over the cap yields
    zero pairs instead of a quadratic join."""
    assigned = emb.withColumn("centroid_id", F.lit(1))
    assert dedup.semantic_pairs(assigned, threshold=0.5, max_cluster=5).count() == 0


# ------------------------------------------------------- temperature mix ---

def test_temperature_sample_targets(spark):
    rows = (
        [(i, "en") for i in range(100)]
        + [(i + 100, "fr") for i in range(25)]
        + [(i + 200, "de") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = sampling.temperature_sample(df, "lang", "doc_id", temperature=2.0)
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # k_s = floor(sqrt(n_s * n_min) + 0.5) at T=2
    assert counts["de"] == 4                       # smallest slice kept whole
    assert counts["fr"] == int(math.sqrt(25 * 4) + 0.5)    # 10
    assert counts["en"] == int(math.sqrt(100 * 4) + 0.5)   # 20


def test_temperature_one_is_identity(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    assert sampling.temperature_sample(df, "lang", "doc_id", temperature=1.0).count() == 30


def test_temperature_sample_deterministic_and_stable(spark):
    """Kept set is identical across runs AND under different partitioning —
    membership is a pure function of (seed, key)."""
    rows = [(i, f"s{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = {r["doc_id"] for r in sampling.temperature_sample(df, "lang", "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in sampling.temperature_sample(df.repartition(7), "lang", "doc_id").collect()
    }
    assert a == b


def test_temperature_sample_null_slice_survives(spark):
    rows = [(1, None), (2, None), (3, "x"), (4, "x"), (5, "x"), (6, "x")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = sampling.temperature_sample(df, "lang", "doc_id", temperature=2.0)
    langs = [r["lang"] for r in kept.collect()]
    assert langs.count(None) == 2  # NULL slice is smallest → kept whole


def test_temperature_rejects_below_one(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        sampling.temperature_sample(df, "lang", "doc_id", temperature=0.5)


# ------------------------------------------------------- epoch upsampling --

def _bucket(seed: str, key) -> int:
    import hashlib

    return int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:8], 16) % 10_000


def test_upsample_epochs_exact_multiset(spark):
    rows = [(i, "a" if i < 60 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.upsample_epochs(
        df, "doc_id", "source", {"a": 2.5, "b": 0.25}, seed="epoch"
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["epoch"])
    for i in range(60):  # slice a: 2 copies + 1 more when bucket < 5000
        n = 2 + (_bucket("epoch", i) < 5000)
        assert sorted(got[i]) == list(range(n)), i
    for i in range(60, 100):  # slice b: one copy for 25% of rows
        n = 1 if _bucket("epoch", i) < 2500 else 0
        assert sorted(got.get(i, [])) == list(range(n)), i


def test_upsample_epochs_default_factor(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, source string")
    out = sampling.upsample_epochs(df, "doc_id", "source", {}, default_factor=2.0)
    assert out.count() == 4
    assert {r["epoch"] for r in out.collect()} == {0, 1}


def test_upsample_epochs_rejects_negative(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, source string")
    with pytest.raises(ValueError):
        sampling.upsample_epochs(df, "doc_id", "source", {"x": -1.0})


def test_semantic_dedup_auto_centroids(spark):
    """n_centroids='auto' sizes cells from the corpus count: exact
    duplicates still collapse (identical vectors share a cell under any
    centroid set), and the cell count tracks count/target_cell."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    base = spark.range(0, 300).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.rand(seed=7 + i) * 2 - 1) for i in range(8)]).alias("embedding"),
    ).localCheckpoint()
    dup = base.filter(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1000)
    )
    corpus = base.unionByName(dup)
    survivors, pairs = dedup.semantic_dedup(
        corpus, n_centroids="auto", threshold=0.99, target_cell=50
    )
    kept = {r["vec_id"] for r in survivors.collect()}
    # every planted exact dup (higher id) was dropped
    assert all(v < 1000 for v in kept)
    assert len(kept) == 300
    with _pytest.raises(ValueError):
        dedup.semantic_dedup(corpus, n_centroids="bogus")
