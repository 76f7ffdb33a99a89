"""operators/packing + text.dup_ngram_fraction: sequence packing and
repetition signals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.functions import text
from pwhl_data_engineering_pipeline_spark.operators import packing


def _packed(spark, rows, bin_size=10, parts=()):
    df = spark.createDataFrame(rows, "stream string, doc_id long, n long")
    return packing.pack_greedy(
        df, "n", bin_size, order_cols=["doc_id"], part_cols=parts, offset_col="off"
    )


def test_pack_matches_sequential_concat(spark):
    """Bin ids must equal what a single-threaded concat-and-chunk loop
    produces: doc starts in bin floor(cum_before / bin)."""
    rows = [("a", i, n) for i, n in enumerate([4, 4, 4, 9, 1, 12, 2])]
    got = {r["doc_id"]: (r["pack_id"], r["off"]) for r in _packed(spark, rows).collect()}
    # cum_before: 0,4,8,12,21,22,34
    assert got == {0: (0, 0), 1: (0, 4), 2: (0, 8), 3: (1, 2), 4: (2, 1),
                   5: (2, 2), 6: (3, 4)}


def test_pack_streams_are_independent(spark):
    rows = [("a", 1, 7), ("b", 2, 7), ("a", 3, 7), ("b", 4, 7)]
    got = {(r["stream"], r["doc_id"]): r["pack_id"]
           for r in _packed(spark, rows, parts=["stream"]).collect()}
    assert got == {("a", 1): 0, ("a", 3): 0, ("b", 2): 0, ("b", 4): 0}
    # same rows without partitioning: one stream, later docs spill to bin 1+
    merged = {r["doc_id"]: r["pack_id"] for r in _packed(spark, rows).collect()}
    assert merged[4] == 2


def test_pack_layout_independent(spark):
    rows = [("s", i, (i * 7) % 13 + 1) for i in range(200)]
    a = {r["doc_id"]: r["pack_id"] for r in _packed(spark, rows, parts=["stream"]).collect()}
    df = spark.createDataFrame(rows, "stream string, doc_id long, n long").repartition(11)
    b = {
        r["doc_id"]: r["pack_id"]
        for r in packing.pack_greedy(
            df, "n", 10, order_cols=["doc_id"], part_cols=["stream"], offset_col="off"
        ).collect()
    }
    assert a == b


def test_pack_validation(spark):
    with pytest.raises(ValueError):
        _packed(spark, [("a", 1, 1)], bin_size=0)


def test_pack_sql_mirror(spark):
    import duckdb

    rows = [("a", i, (i * 5) % 17 + 1) for i in range(100)] + [
        ("b", i, (i * 3) % 11 + 1) for i in range(100, 150)
    ]
    sdf = _packed(spark, rows, bin_size=16, parts=["stream"])
    got = sorted((r["stream"], r["doc_id"], r["pack_id"]) for r in sdf.collect())
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(rows, columns=["stream", "doc_id", "n"]))
    expr = packing.pack_sql("n", 16, order_cols=["doc_id"], part_cols=["stream"])
    want = sorted(map(tuple, con.execute(
        f"SELECT stream, doc_id, {expr} AS pack_id FROM t"
    ).fetchall()))
    assert got == want


def test_dup_ngram_fraction_edges(spark):
    df = spark.createDataFrame(
        [
            ("", 0.0),                       # empty → 0
            ("one two three four", 0.0),     # fewer than n tokens → 0
            ("a b c d e", 0.0),              # exactly one 5-gram → no dups
            ("a b c d e a b c d e a b c d e", None),  # repeated phrase
        ],
        "text string, want double",
    )
    out = df.select("text", "want", text.dup_ngram_fraction(F.col("text"), 5).alias("f")).collect()
    for r in out[:3]:
        assert r["f"] == r["want"], r["text"]
    # 15 tokens → 11 grams, 5 distinct (cyclic) → 6/11 duplicated
    assert out[3]["f"] == pytest.approx(1 - 5 / 11, abs=1e-6)


def test_pack_plan_single_window_exchange(spark):
    """The packing plan must contain exactly one exchange (the window
    partitioning) — no extra shuffle, no global sort."""
    rows = [("s", i, 5) for i in range(50)]
    df = spark.createDataFrame(rows, "stream string, doc_id long, n long")
    out = packing.pack_greedy(df, "n", 10, order_cols=["doc_id"], part_cols=["stream"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_shard_assign_deterministic_balanced_and_ordered(spark):
    from pwhl_data_engineering_pipeline_spark.operators.packing import shard_assign

    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    a = shard_assign(docs, 8, seed="e0")
    rows = a.collect()
    # total partition: every row in [0, 8), shard_pos 1..|shard| contiguous
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    assert set(by_shard) == set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # near-balanced (hash uniformity): no shard over 2x the mean
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) < 2 * (2000 / 8)
    # deterministic: identical rerun, different seed reshuffles
    b = {(r["doc_id"], r["shard"], r["shard_pos"]) for r in shard_assign(docs, 8, seed="e0").collect()}
    assert b == {(r["doc_id"], r["shard"], r["shard_pos"]) for r in rows}
    c = {r["doc_id"]: r["shard"] for r in shard_assign(docs, 8, seed="e1").collect()}
    moved = sum(1 for r in rows if c[r["doc_id"]] != r["shard"])
    assert moved > 1000  # a new seed is a real epoch reshuffle
