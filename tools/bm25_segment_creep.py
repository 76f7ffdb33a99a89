"""Probe-cost creep vs append segment count, and what compaction reclaims.

Evidence for SCALING.md: repeated bm25_index_append grows per-bucket file
counts and df segments; the probe pays that in listing/footer/scan overhead
until bm25_index_compact resets the layout. sf0.1 documents, 40 appends of
125 re-keyed docs each, min-of-2 warm probes.
"""
import sys, time, json, tempfile
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from pwhl_data_engineering_pipeline_spark.session import get_spark
from pwhl_data_engineering_pipeline_spark.operators import search
from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata
from pyspark.sql import functions as F

spark = get_spark("bm25-seg", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
docs = read_testdata(spark, "/root/testdata/sf0.1", "documents")
qdf = spark.createDataFrame(
    [("q_spark", "spark window agg"), ("q_join", "hash join table"),
     ("q_stream", "stream batch merge")],
    "query_id string, query_text string")

idx = tempfile.mkdtemp(prefix="bm25_seg_")
search.bm25_index_write(docs, idx, n_buckets=64)

def probe():
    t0 = time.monotonic()
    search.bm25_search_index(spark, idx, qdf, k=10).collect()
    return time.monotonic() - t0

probe()  # warm
fresh = round(min(probe() for _ in range(3)), 3)

batch_src = docs.limit(1000).localCheckpoint()
for i in range(40):
    b = batch_src.withColumn("doc_id", F.col("doc_id") + F.lit(7_000_000_000 + i * 10_000_000)).limit(125)
    search.bm25_index_append(b, idx, batch_id=f"seg{i}")
appended = round(min(probe() for _ in range(3)), 3)
committed = search._read_scalars(spark, idx)["batches"]
nseg = len(committed)

# VERDICT r8 #7: at 41 segments the probe must STILL prune at directory
# grain — bucket AND the committed-batch isin both inside
# PartitionFilters (also pinned in pytest:
# test_bm25_probe_batch_pruning_at_40_segments)
import re
spark.conf.set("spark.sql.maxMetadataStringLength", "100000")  # un-truncate INSET
plan = (search.bm25_search_index(spark, idx, qdf, k=10)
        ._jdf.queryExecution().executedPlan().toString())
filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
batch_filters = [f for f in filters if "batch" in f]
pruned = bool(
    filters and any("bucket" in f for f in filters) and batch_filters
    and all(all(b in f for b in committed) for f in batch_filters)
)
assert pruned, plan[:3000]

# in-place compact (the shipped maintenance path): min_age 0 is correct
# here — single-writer window, no probe in flight
obs = search.bm25_index_compact(spark, idx, reclaim_min_age_seconds=0)
probe()  # warm new layout
compacted = round(min(probe() for _ in range(3)), 3)
print(json.dumps({
    "mode": "bm25-segment-creep",
    "probe_fresh_sec": fresh,
    "probe_40_segments_sec": appended,
    "probe_compacted_sec": compacted,
    "n_batches": nseg,
    "pruned_at_41_segments": pruned,
    "compact_obs": obs,
}))
