#!/usr/bin/env python
"""Capture .explain("formatted") for headline bench queries into plans/$PLAN_ROUND/ (default r14).

Usage:
  python tools/plan_capture.py before [name ...]   # default: all headline
  python tools/plan_capture.py after  [name ...]

Writes plans/<round>/<query>_<tag>.txt. Uses the same session shape as bench.py
(get_spark, shuffle_partitions = SPARK_GRAFT_CPUS) so the captured plans are
the plans the bench actually runs. Untimed — safe to run on a busy box.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pwhl_data_engineering_pipeline_spark.session import get_spark

    spark = get_spark(
        "plan_capture", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    import __spark_entry__ as em

    queries = dict(em.extended_queries())
    queries.update(bench.BENCH_ONLY_CALLABLES)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", os.environ.get("PLAN_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)

    names = [n for n in bench.HEADLINE if not only or n in only]
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure instead of dying
            text = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
