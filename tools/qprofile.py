#!/usr/bin/env python
"""Per-query job/stage profile via the local Spark UI REST API.

For each named headline query: run once (noop sink) after a warm pass,
then report #jobs, #stages, total task time, and the top stages by task
time. Separates distributed compute from driver/job-count overhead.
Usage: python tools/qprofile.py name [name ...]"""
from __future__ import annotations
import json, os, sys, time, urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pwhl_data_engineering_pipeline_spark.session import get_spark
    spark = get_spark("qprofile", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def rest(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
            return json.load(r)

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

    for name in names:
        jobs_before = {j["jobId"] for j in rest("jobs")}
        t0 = time.monotonic()
        run_once(queries[name], sf_dir)
        wall = time.monotonic() - t0
        jobs = [j for j in rest("jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = rest("stages")
        mine = [s for s in stages if s["stageId"] in stage_ids and s["status"] != "SKIPPED"]
        tot_task = sum(s.get("executorRunTime", 0) for s in mine) / 1000.0
        print(f"\n=== {name}: wall={wall:.3f}s jobs={len(jobs)} stages={len(mine)} "
              f"task_time_total={tot_task:.2f}s (/{cpus} cores = {tot_task/int(cpus):.3f}s)")
        top = sorted(mine, key=lambda s: -s.get("executorRunTime", 0))[:8]
        for s in top:
            print(f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
                  f"runtime={s['executorRunTime']/1000:6.2f}s "
                  f"shufR={s.get('shuffleReadBytes',0)>>10}K shufW={s.get('shuffleWriteBytes',0)>>10}K  "
                  f"{(s.get('name') or '')[:70]}")
    spark.stop()


if __name__ == "__main__":
    main()
