#!/usr/bin/env python
"""Time a subset of headline queries with the bench protocol (warm at
sf0.001, N runs at target SF, min + all runs printed). Usage:
  python tools/qtime.py name [name ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, QTIME_RUNS (default 3)."""
from __future__ import annotations
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("QTIME_RUNS", "3"))
    from pwhl_data_engineering_pipeline_spark.session import get_spark
    extra = dict(
        kv.split("=", 1) for kv in os.environ.get("QTIME_EXTRA_CONF", "").split(";") if kv
    )
    spark = get_spark(
        "qtime", master=f"local[{cpus}]", shuffle_partitions=int(cpus),
        extra_conf=extra or None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench
    import __spark_entry__ as em
    queries = dict(em.extended_queries()); queries.update(bench.BENCH_ONLY_CALLABLES)
    def run_once(fn, d):
        df = fn(spark, d)
        try: df.write.format("noop").mode("overwrite").save()
        except Exception: df.collect()
    for name in names:
        run_once(queries[name], "/root/testdata/sf0.001")
    if "ivf_topk_pruned" in names:
        run_once(queries["ivf_topk_pruned"], sf_dir)
    out = {}
    for name in names:
        vals = []
        for _ in range(n_runs):
            t0 = time.monotonic(); run_once(queries[name], sf_dir)
            vals.append(round(time.monotonic() - t0, 3))
        out[name] = {"min": min(vals), "runs": vals}
    print(json.dumps(out))
    spark.stop()

if __name__ == "__main__":
    main()
