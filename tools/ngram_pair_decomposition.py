#!/usr/bin/env python
"""Verified-pair counts for ngram_jaccard_pairs(auto) across scale replicas —
the decomposition behind SCALING.md's 100x second-decade explanation (the
translate replica's period-26 exact-dup clusters multiply verification
OUTPUT ~320x while wall grows 17.8x, so per-pair cost falls).

Usage: python tools/ngram_pair_decomposition.py [label=dir ...]
       (default: base=/root/testdata/sf0.1; build replicas first with
        tools/scale_bench.py --mode docs --perturb translate)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pwhl_data_engineering_pipeline_spark.operators import dedup
from pwhl_data_engineering_pipeline_spark.session import get_spark
from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

targets = [a.split("=", 1) for a in sys.argv[1:]] or [("base", "/root/testdata/sf0.1")]
spark = get_spark("ngram-counts", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
out = {}
for label, d in targets:
    docs = read_testdata(spark, d, "documents").repartition(32)
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_gram_df="auto")
    out[label] = {"n_docs": docs.count(), "verified_pairs": pairs.count()}
print(json.dumps({"mode": "ngram-pair-decomposition", **out}))
