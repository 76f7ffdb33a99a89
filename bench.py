#!/usr/bin/env python
"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query executes via the noop sink (full plan execution, no driver
collect bottleneck) except tiny results, which are collected.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pwhl_data_engineering_pipeline_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    queries = em.queries()

    # Headline set: covers scan+join+agg (flagship, j1), rollup (a1),
    # windows (w_topk), text (ns_token_counts, ns_dedup_exact), similarity
    # (ns_ann_bruteforce), near-dup (ns_minhash_pairs), filter/project scan
    # (p1), topk (o3).
    headline = [
        "tpch_q1",
        "tpch_q3",
        "tpch_q6",
        "flagship_priority_revenue",
        "p1_p5_filter_project",
        "j1_broadcast_enrich",
        "j_asof_join",
        "a1_daily_rollup",
        "a8_corr",
        "a_percentiles",
        "o3_topk",
        "w_topk_per_group",
        "w_sessionization",
        "ns_dedup_exact",
        "ns_token_counts",
        "ns_minhash_pairs",
        "ns_ann_bruteforce",
        "ns_corpus_clean",
    ]

    # Warm the JVM/code paths (parquet reader, codegen, Arrow, broadcast)
    # at the smallest SF so JIT/classloading doesn't land in the first timed
    # query.
    queries["flagship_priority_revenue"](spark, "/root/testdata/sf0.001").collect()

    timings: dict[str, float] = {}
    for name in headline:
        fn = queries[name]
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        try:
            df.write.format("noop").mode("overwrite").save()
        except Exception:
            df.collect()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
