"""Python UDTF: row→rows table function, DataFrame and SQL-lateral usage."""

from __future__ import annotations

from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import udtf as udtf_mod


def test_sentence_split_udtf(spark):
    out = udtf_mod.SentenceSplit(F.lit("One two. Three four! Five?")).collect()
    assert [(r["sentence_idx"], r["sentence"]) for r in out] == [
        (0, "One two."),
        (1, "Three four!"),
        (2, "Five?"),
    ]


def test_sentence_split_sql_lateral(spark):
    udtf_mod.register(spark)
    spark.createDataFrame(
        [(1, "Hello there. How are you?"), (2, ""), (3, "Single")],
        "doc_id long, text string",
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence
        FROM udtf_docs d, LATERAL sentence_split(d.text) s
        """
    ).collect()
    got = {(r["doc_id"], r["sentence_idx"]): r["sentence"] for r in rows}
    assert got == {
        (1, 0): "Hello there.",
        (1, 1): "How are you?",
        (3, 0): "Single",
    }  # empty doc yields no rows
