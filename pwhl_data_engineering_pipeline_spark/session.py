"""SparkSession factory with engine defaults tuned for both local testing and
large-cluster execution.

The reference has no engine at all (eager pandas, ``run_pipeline.py:58``); all
physical decisions here are ours. The configs below are chosen so the same
logical plans scale from local[32] test runs to a 1000-executor cluster:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting,
  broadcast conversion) — the single most important 100 TB knob.
- Non-ANSI mode: failed casts and x/0 yield NULL, matching the reference's
  ``errors="coerce"`` (scripts/integrate_weather_sales.py:33-40) and BigQuery
  ``SAFE_DIVIDE`` (sql/02_create_dims_and_facts.sql:106-108).
- Arrow enabled for any pandas-UDF path (similarity / multimodal operators).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Engine-level defaults. Values that depend on cluster size (shuffle
# partitions, broadcast threshold) are intentionally modest here and expected
# to be overridden per-deployment; AQE coalescing makes the shuffle-partition
# number a ceiling rather than a hard choice.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # AQE's coalescing floor: the 1 MB default serializes any post-shuffle
    # stage under ~32 MB onto a single task slot (parallelismFirst only
    # protects parallelism down to minPartitionSize), which single-threads
    # window/sort stages over small-but-CPU-heavy data. 256 KB keeps those
    # stages spread across the cores without shattering small shuffles
    # into per-task-overhead-dominated fragments (A/B over an 11-query
    # slice at sf0.1: 1m → 10.3-12.8 s, 64k → 10.3-10.5 s, 256k →
    # 9.3-10.1 s; sessionization/SCD2 windows alone 0.81/0.85 s →
    # 0.43/0.43 s). Stages past the advisory size are untouched, so this
    # is size-adaptive, not a core-count tune.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "256k",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Runtime row-level Bloom-filter pruning: a filtered dim side injects a
    # Bloom filter into the fact scan — complements partition-level DPP for
    # non-partition join keys at 100 TB.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Files: pack small files, split big ones, to keep task sizes even at scale.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # groupByOrdinal must stay on: reference SQL uses GROUP BY 1,2,3
    # (sql/02_create_dims_and_facts.sql:110).
    "spark.sql.groupByOrdinal": "true",
    # Testdata events.parquet carries TIMESTAMP(NANOS); Spark has no nanos
    # timestamp type — read as long and convert at the source boundary
    # (sources.readers.read_testdata).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(
    app_name: str = "pwhl_data_engineering_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) when
    no cluster master is configured — on a real cluster pass ``None`` with
    ``spark.master`` already set, or an explicit value.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(ENGINE_CONF)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if master and (master == "local" or master.startswith("local[")):
        # NOT local-cluster[...]: there the executors are separate JVMs and
        # the big-driver-heap rationale below does not hold.
        # In local mode the driver JVM IS the executor; Spark's 1g default
        # heap starves 32 concurrent task slots (GC thrash, OOM on wide
        # shuffles). Only honored at JVM launch — the first session in the
        # process decides. Override with SPARK_GRAFT_DRIVER_MEM.
        conf.setdefault(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
