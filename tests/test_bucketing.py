"""Bucketed co-located joins: writing both sides bucketed by the join key
must remove the shuffle (no Exchange above the scans) — the 100 TB strategy
for repeated big-big joins (SURVEY.md 'Partitioning & shuffle')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable needs a warehouse; the session fixture already set one up
    # under the default spark-warehouse dir — use unique table names instead.
    yield
    for t in ["b_orders", "b_lineitem"]:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    orders = spark.createDataFrame(
        [(i, f"P{i % 3}") for i in range(200)], "o_key long, prio string"
    )
    lineitem = spark.createDataFrame(
        [(i % 200, float(i)) for i in range(1000)], "l_key long, amount double"
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_key")
        .sortBy("o_key")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_key")
        .sortBy("l_key")
        .saveAsTable("b_lineitem")
    )
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    # disable broadcast so the join would otherwise need a full shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_key == bl.l_key).groupBy("prio").agg(
            F.sum("amount").alias("total")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: SortMergeJoin directly over bucketed scans,
        # no Exchange between scan and join
        join_section = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_key" not in plan
        assert "Exchange hashpartitioning(l_key" not in plan
        # correctness unchanged
        totals = {r["prio"]: r["total"] for r in joined.collect()}
        expected = {f"P{p}": sum(float(i) for i in range(1000) if (i % 200) % 3 == p) for p in range(3)}
        assert totals == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
