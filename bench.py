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

    queries = dict(em.queries())

    # ns_minhash_pairs: kept as a bench-only callable (the queries() entry is
    # now the end-to-end ns_minhash_dedup) so r1→r2 timings stay comparable.
    def _minhash_pairs(spark, sf_dir):
        from pwhl_data_engineering_pipeline_spark.operators import dedup
        from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        docs = read_testdata(spark, sf_dir, "documents").repartition(n_part)
        return dedup.minhash_candidate_pairs(docs, num_hashes=64, num_bands=8)

    queries["ns_minhash_pairs"] = _minhash_pairs

    # Headline set: covers scan+join+agg (flagship, j1), rollup (a1),
    # windows (w_rank_kit), stats (a_stats_kit = r1's a8_corr+a_percentiles
    # merged), text (ns_text_signals = r1's ns_token_counts+quality merged,
    # ns_dedup_exact), similarity (ns_ann_bruteforce, now Arrow pre-reduced),
    # near-dup (ns_minhash_pairs), filter/project scan (p1), topk (o3).
    headline = [
        "tpch_q1",
        "tpch_q3",
        "tpch_q6",
        "flagship_priority_revenue",
        "p1_p5_filter_project",
        "j1_broadcast_enrich",
        "j_asof_join",
        "a1_daily_rollup",
        "a_stats_kit",
        "o3_topk",
        "w_rank_kit",
        "w_sessionization",
        "ns_dedup_exact",
        "ns_text_signals",
        "ns_minhash_pairs",
        "ns_ann_bruteforce",
        "ns_vector_centroids",
        "ns_corpus_clean",
    ]

    # Warm the JVM/code paths (parquet reader, codegen, Arrow + Python
    # workers, regex/text expression compilation, broadcast) at the smallest
    # SF so JIT/classloading doesn't land in the timed queries — the bench
    # measures the engine, not first-compile latency.
    warm = "/root/testdata/sf0.001"
    queries["flagship_priority_revenue"](spark, warm).collect()
    queries["ns_corpus_clean"](spark, warm).collect()
    queries["ns_minhash_pairs"](spark, warm).collect()
    queries["ns_ann_bruteforce"](spark, warm).collect()

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
