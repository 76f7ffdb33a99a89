"""Range / interval joins — the second point-in-time operator Spark lacks
natively (operators.asof covers backward as-of; this covers overlap and
point-in-interval semantics: "which maintenance window was active when the
event fired", IP-range lookups, session-interval enrichment).

Naive formulation — a join on an inequality condition — degenerates to
BroadcastNestedLoopJoin/cartesian in Spark: O(|L|·|R|) per key. The standard
scale rewrite implemented here is BUCKETIZATION: quantize the range dimension
into fixed-width buckets, explode each interval to the buckets it spans,
equi-join on (keys, bucket) — a plain shuffled hash join — and post-filter
the true predicate. Each overlapping pair shares ≥1 bucket, and the
"canonical bucket" filter (keep the match only in the bucket containing the
overlap start) emits every pair EXACTLY once with no distinct pass.

Cost: join input inflates by (interval_length / bucket_width) per row; pick
``bucket_width`` near the typical interval length (the default measures it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_num(c) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("double")


#: Rows sampled when estimating the default bucket width. ``limit(N)`` makes
#: the estimation job incremental (CollectLimit reads one partition, then a
#: handful more only if needed) — it never scans the full table.
_AUTO_WIDTH_SAMPLE_ROWS = 10_000


def _auto_width(df: DataFrame, start: str, end: str) -> float:
    """Default bucket width: mean interval length over the first
    ``_AUTO_WIDTH_SAMPLE_ROWS`` rows. Within ~2× of optimal for
    non-pathological length distributions.

    NOTE: this runs one small eager Spark job (bounded by ``limit``, so at
    100 TB it reads a partition or two, not the table). Pass an explicit
    ``bucket_width`` to skip the job entirely."""
    row = (
        df.select((_as_num(end) - _as_num(start)).alias("__len"))
        .limit(_AUTO_WIDTH_SAMPLE_ROWS)
        .agg(F.avg("__len").alias("w"))
        .collect()[0]
    )
    return max(float(row["w"] or 1.0), 1e-9)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float | None = None,
) -> DataFrame:
    """Inner join on interval overlap within ``keys``:
    ``l.start <= r.end AND r.start <= l.end`` (closed intervals).

    Both sides explode to spanned buckets; the equi-join on (keys, bucket)
    is an ordinary shuffled hash join, and the canonical-bucket filter
    (bucket == bucket(overlap start)) deduplicates without a distinct."""
    clash = (set(left.columns) & set(right.columns)) - set(keys)
    if clash:
        raise ValueError(f"rename overlapping non-key columns first: {sorted(clash)}")
    w = bucket_width if bucket_width is not None else _auto_width(left, left_start, left_end)
    lb = left.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(_as_num(left_start) / w), F.floor(_as_num(left_end) / w)
            )
        ),
    )
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(_as_num(right_start) / w), F.floor(_as_num(right_end) / w)
            )
        ),
    )
    joined = lb.join(rb, [*keys, "__b"]).filter(
        (_as_num(left_start) <= _as_num(right_end))
        & (_as_num(right_start) <= _as_num(left_end))
    )
    canonical = F.floor(
        F.greatest(_as_num(left_start), _as_num(right_start)) / w
    )
    return joined.filter(F.col("__b") == canonical).drop("__b")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    point_col: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
    bucket_width: float | None = None,
) -> DataFrame:
    """Join each point row to the interval rows containing it
    (``start <= point <= end``, within ``keys``).

    Points land in exactly one bucket so no canonical-bucket dedup is
    needed; only the interval side explodes. ``how="left"`` keeps unmatched
    points (NULL interval columns)."""
    clash = (set(points.columns) & set(intervals.columns)) - set(keys)
    if clash:
        raise ValueError(f"rename overlapping non-key columns first: {sorted(clash)}")
    w = bucket_width if bucket_width is not None else _auto_width(intervals, start_col, end_col)
    pb = points.withColumn("__b", F.floor(_as_num(point_col) / w))
    ib = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(F.floor(_as_num(start_col) / w), F.floor(_as_num(end_col) / w))
        ),
    )
    if how == "inner":
        return (
            pb.join(ib, [*keys, "__b"])
            .filter(
                (_as_num(start_col) <= _as_num(point_col))
                & (_as_num(point_col) <= _as_num(end_col))
            )
            .drop("__b")
        )
    if how == "left":
        # Every interval containing a point explodes into that point's
        # bucket, so a single bucketed LEFT join with the range predicate in
        # the ON clause IS left-join semantics: each point row appears once
        # in pb (points land in exactly one bucket) and gets either its
        # matching interval rows or one NULL-extended row. One pass, no
        # matched/unmatched bookkeeping — which also avoids any reliance on
        # a nondeterministic row id evaluated twice (a previous version
        # anti-joined on monotonically_increasing_id; under shuffle-order
        # nondeterminism the two evaluations could disagree and duplicate or
        # drop points).
        ibr = ib
        for k in [*keys, "__b"]:
            ibr = ibr.withColumnRenamed(k, f"__i_{k}")
        cond = (F.col("__b") == F.col("__i___b"))
        for k in keys:
            cond = cond & (F.col(k) == F.col(f"__i_{k}"))
        cond = (
            cond
            & (_as_num(start_col) <= _as_num(point_col))
            & (_as_num(point_col) <= _as_num(end_col))
        )
        return pb.join(ibr, cond, "left").drop(
            "__b", *[f"__i_{k}" for k in [*keys, "__b"]]
        )
    raise ValueError(f"unsupported how={how!r}")
