#!/usr/bin/env python
"""Measure ONE n-gram Jaccard configuration at a deep decade, with spill
bytes reported from the Spark status API (VERDICT r9 #3: the 1000× point
was disk-bound at ~70 GB of gram-SMJ spill — measure the cheap levers).

One configuration per PROCESS on purpose: ``spark.io.compression.codec``
must be set before the session starts, and the JVM's codec/JIT state
should not bleed between configurations. Drive it three times from a
shell (same replica on disk):

    python tools/ngram_spill_bench.py --sf-dir /tmp/sf1000_docs \
        --gram-key text --codec lz4      # r9 baseline, instrumented
    python tools/ngram_spill_bench.py ... --gram-key text --codec zstd
    python tools/ngram_spill_bench.py ... --gram-key hash --codec lz4

Prints one JSON line: wall seconds, pair count (the output-volume
invariant the permute replica keeps exactly linear), and the summed
shuffle-write / memory-spill / disk-spill bytes across completed stages.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_totals(spark) -> dict:
    """Sum shuffle/spill bytes over completed stages via the UI REST API
    (the same numbers the Spark UI's stage table shows)."""
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return {}
    try:
        apps = json.loads(
            urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10).read()
        )
        app_id = apps[0]["id"]
        stages = json.loads(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=30,
            ).read()
        )
    except Exception as e:  # UI disabled or API shape drift: report, don't die
        return {"error": repr(e)}
    out = {"shuffle_write_bytes": 0, "memory_spill_bytes": 0, "disk_spill_bytes": 0}
    for st in stages:
        out["shuffle_write_bytes"] += st.get("shuffleWriteBytes", 0)
        out["memory_spill_bytes"] += st.get("memoryBytesSpilled", 0)
        out["disk_spill_bytes"] += st.get("diskBytesSpilled", 0)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--gram-key", choices=["text", "hash"], default="text")
    ap.add_argument("--codec", choices=["lz4", "zstd", "snappy"], default="lz4")
    ap.add_argument("--warm-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--chunk-size",
        type=int,
        default=None,
        help="posting-list chunking for the gram self-join (VERDICT r10 #4 "
        "structural lever; None = classic gram-keyed join)",
    )
    args = ap.parse_args()

    from pwhl_data_engineering_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name=f"ngram-spill-{args.gram_key}-{args.codec}",
        extra_conf={"spark.io.compression.codec": args.codec},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pwhl_data_engineering_pipeline_spark.operators import dedup
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def run(sf_dir: str) -> tuple[float, int]:
        docs = read_testdata(spark, sf_dir, "documents").repartition(n_part)
        t0 = time.monotonic()
        n_pairs = dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.2, max_gram_df="auto", gram_key=args.gram_key,
            chunk_size=args.chunk_size,
        ).count()
        return time.monotonic() - t0, n_pairs

    run(args.warm_dir)  # codegen + worker pool, negligible spill
    pre = _stage_totals(spark)
    wall, n_pairs = run(args.sf_dir)
    post = _stage_totals(spark)
    delta = {
        k: post.get(k, 0) - pre.get(k, 0)
        for k in ("shuffle_write_bytes", "memory_spill_bytes", "disk_spill_bytes")
        if not isinstance(post.get(k), str)
    }
    print(json.dumps({
        "mode": "ngram-spill",
        "sf_dir": args.sf_dir,
        "gram_key": args.gram_key,
        "codec": args.codec,
        "chunk_size": args.chunk_size,
        "wall_sec": round(wall, 1),
        "n_pairs": n_pairs,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "default-8g"),
        **{k: int(v) for k, v in delta.items()},
    }))


if __name__ == "__main__":
    main()
