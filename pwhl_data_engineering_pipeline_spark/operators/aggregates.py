"""Aggregation operators — SURVEY.md §2.4 A1-A10.

All are single hash-aggregations: Catalyst plans partial (map-side) + final
stages automatically, so each costs one shuffle on its grouping key. The
named-agg style mirrors the reference's pandas named aggregations
(scripts/transform_weather.py:124-139) while keeping plans declarative.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..sources.readers import local_frame


def daily_rollup(
    df: DataFrame,
    time_col: str,
    keys: Sequence[str],
    aggs: dict[str, Column],
    date_col: str = "event_date",
) -> DataFrame:
    """A1: calendar-day rollup (transform_weather.py:117-142): derive the
    date from a timestamp, group by (date, keys), apply named aggregates."""
    return (
        df.withColumn(date_col, F.to_date(F.col(time_col)))
        .groupBy(date_col, *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )


def grain_rollup(df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]) -> DataFrame:
    """A2/A3/A6: hash-agg to a grain with named aggregates
    (integrate_weather_sales.py:111-119; sql/02_create_dims_and_facts.sql:100-110)."""
    return df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def weighted_avg(num: str | Column, den: str | Column) -> Column:
    """A3's weighted price: SAFE_DIVIDE(SUM(num), NULLIF(SUM(den),0))
    (sql/02_create_dims_and_facts.sql:106-108)."""
    n = F.col(num) if isinstance(num, str) else num
    d = F.col(den) if isinstance(den, str) else den
    return F.try_divide(F.sum(n), F.nullif(F.sum(d), F.lit(0)))


def distinct_dim(df: DataFrame, cols: Sequence[str], not_null: str | None = None) -> DataFrame:
    """A4: SELECT DISTINCT dimension extraction with optional NOT NULL key
    filter (sql/02_create_dims_and_facts.sql:21-37)."""
    out = df.select(*cols)
    if not_null:
        out = out.filter(F.col(not_null).isNotNull())
    return out.distinct()


#: Target bytes per range partition for the percentile sort — the guide's
#: 100 MB-1 GB post-shuffle sizing band (spark_optimization_guide §2.2),
#: aligned with AQE's advisory default rather than the core count.
_RANGE_PARTITION_TARGET_BYTES = 64 * 1024 * 1024

#: Ceiling on the derived range-partition count: 2^20 × 64 MB slices
#: ≈ 64 TB of sort input per job — far past any single range sort here,
#: and comfortably under Java Int.MaxValue so the py4j call can't
#: overflow on a garbage size estimate.
_RANGE_PARTITION_MAX = 1 << 20


def _range_partition_count(df: DataFrame) -> int:
    """Scale-adaptive partition count for an explicit range shuffle:
    ``max(defaultParallelism / 4, ceil(estimated bytes / 64 MB))``. The
    estimate is Catalyst's optimized-plan sizeInBytes of the
    (column-pruned) input. Two regimes, one formula:

    - small inputs: the parallelism floor keeps the sort spread over
      SOME of the cluster's cores without paying 1-task-per-core fixed
      overhead (measured at sf0.1: 1 partition = 2.9 s single-task sort;
      r14 sweep 32 → 1.60-2.00 s, 8 → 1.28-1.43 s);
    - 100 TB inputs: the size term takes over and yields ~64 MB sorted
      slices regardless of how the session's ``spark.sql.shuffle
      .partitions`` constant was tuned — an explicit repartitionByRange
      is NOT rewritten by AQE coalescing, so a flat conf value would
      either starve (too few huge slices: spill) or shatter (M×R tiny
      shuffle blocks) the range sort at scale.

    Falls back to the shuffle-partition conf when the plan has no usable
    estimate — including the Long.MaxValue "unknown" sentinel that
    RDD-backed plans (plain createDataFrame, localCheckpointed frames)
    report (ADVICE r13 high: the sentinel divided to ~1.4e11 partitions
    and repartitionByRange overflowed Java int). Implausible estimates
    (<= 0 or >= 2^60) are treated as unavailable, and the result is
    clamped to a ceiling well under Int.MaxValue."""
    sess = df.sparkSession
    par = sess.sparkContext.defaultParallelism
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # estimate unavailable (e.g. Connect, foreign plan nodes)
        est = -1
    if est <= 0 or est >= 1 << 60:
        return max(par, int(sess.conf.get("spark.sql.shuffle.partitions", "32")))
    # Parallelism floor cores/4, not the full core count (r14): the sort's
    # small-input stages are per-task-overhead bound — interleaved width
    # sweep on the sf0.1 lineitem percentile pass: 32 → 1.60-2.00 s,
    # 16 → 1.30-1.60 s, 8 → 1.28-1.43 s, 4 → 1.47-1.70 s. The size term
    # takes over on real inputs, so slices stay ~64 MB at scale.
    return min(
        _RANGE_PARTITION_MAX,
        max(2, par // 4, -(-est // _RANGE_PARTITION_TARGET_BYTES)),
    )


def exact_percentiles_distributed(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: Sequence[float],
    n_partitions: int | None = None,
) -> DataFrame:
    """Exact linear-interpolation percentiles WITHOUT gathering each group
    onto one task — the scale path for low-cardinality groups over huge data.

    Spark's builtin ``percentile()`` is holistic: every value of a group
    lands in one aggregation buffer, so 3 groups over 10^12 rows = 3 tasks
    doing all the work. This implementation keeps everything distributed:

    1. Range-shuffle on (group, value): partition i's (group, value) range
       precedes partition i+1's, which is all the cross-partition order the
       rank math needs — no in-partition sort.
    2. Tiny per-(partition, group) counts → driver computes cumulative
       offsets (numPartitions × groups rows) and from them the EXACT
       (partition, group, local rank) address of every bracketing rank.
    3. Ranking pass pruned to target slices only: a broadcast left-semi
       drops every (partition, group) slice holding no bracket map-side
       (no shuffle for dropped rows); the row_number window then ranks
       just the surviving slices and an inner broadcast join picks the
       bracket rows.
    4. Interpolate driver-side (same ``lo + frac·(hi−lo)`` formula as the
       builtin).

    The sorted frame is persisted (memory-and-disk) between the counting and
    ranking passes and unpersisted before returning. Returns
    (group_col, percentile, value). Results match ``percentile()`` exactly
    (equivalence-tested)."""
    sess = df.sparkSession
    gtype = df.schema[group_col].dataType.simpleString()
    base = df.select(F.col(group_col), F.col(value_col).cast("double").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    n_parts = n_partitions or _range_partition_count(base)
    # Range-partitioned but NOT pre-sorted: the global order the rank math
    # needs comes from the range boundaries alone (partition i's (group,
    # value) range precedes partition i+1's); within-partition order is
    # established later by the row_number window — and only for the pruned
    # bracket slices, so a full in-partition sort here would be wasted work.
    sorted_df = (
        base.repartitionByRange(n_parts, group_col, "__v")
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    try:
        counts = (
            sorted_df.groupBy("__pid", group_col).agg(F.count(F.lit(1)).alias("c")).collect()
        )
        totals: dict = {}
        for r in sorted(counts, key=lambda r: r["__pid"]):
            g = r[group_col]
            totals.setdefault(g, []).append((r["__pid"], r["c"]))
        offsets = []  # (pid, group, offset)
        group_n = {}
        for g, lst in totals.items():
            acc = 0
            for pid, c in lst:
                offsets.append((pid, g, acc))
                acc += c
            group_n[g] = acc
        targets = set()  # (group, global rank) to fetch
        specs = []  # (group, p, lo_rank, hi_rank, frac)
        for g, n in group_n.items():
            for p in percentiles:
                pos = (n - 1) * float(p)
                lo = int(pos) + 1  # 1-based rank
                hi = min(lo + 1, n)
                frac = pos - int(pos)
                specs.append((g, float(p), lo, hi, frac))
                targets.add((g, lo))
                targets.add((g, hi))
        # The driver already knows, from the per-(partition, group) counts,
        # WHICH partition holds each bracketing rank and at what LOCAL
        # offset — so the ranking pass prunes to just those (partition,
        # group) slices instead of window-ranking the whole frame. The
        # pruning join is a broadcast LEFT SEMI (map-side filter over the
        # persisted sort, no shuffle for dropped rows); only surviving
        # slices enter the row_number exchange.
        run_starts: dict = {}  # group -> [(pid, global_start_rank_0based)]
        for pid, g, off in offsets:
            run_starts.setdefault(g, []).append((pid, off))
        local_to_global: dict = {}  # (pid, group, local_rank) -> (group, rank)
        for g, rank in targets:
            runs = run_starts[g]  # sorted by pid (offsets built in pid order)
            pid, off = next(
                (p, o)
                for (p, o), nxt in zip(
                    runs, [o for _, o in runs[1:]] + [group_n[g]]
                )
                if o < rank <= nxt
            )
            local_to_global[(pid, g, rank - off)] = (g, rank)
        # eqNullSafe joins keep a NULL group key matching (a plain equi-join
        # drops it and KeyErrors at picked[(None, lo)])
        tgt_df = local_frame(sess, 
            sorted(
                local_to_global,
                key=lambda t: (t[0], t[1] is not None, t[1], t[2]),
            ),
            f"__tpid int, __tg {gtype}, __tlrank long",
        )
        prune_df = tgt_df.select("__tpid", "__tg").distinct()
        pruned = sorted_df.join(
            F.broadcast(prune_df),
            (F.col("__pid") == F.col("__tpid"))
            & F.col(group_col).eqNullSafe(F.col("__tg")),
            "left_semi",
        )
        wloc = Window.partitionBy("__pid", group_col).orderBy(F.col("__v").asc())
        hits = (
            pruned.withColumn("__rn", F.row_number().over(wloc))
            .join(
                F.broadcast(tgt_df),
                (F.col("__pid") == F.col("__tpid"))
                & F.col(group_col).eqNullSafe(F.col("__tg"))
                & (F.col("__rn") == F.col("__tlrank")),
            )
            .select("__pid", group_col, "__rn", "__v")
            .collect()
        )
        picked = {
            local_to_global[(r["__pid"], r[group_col], r["__rn"])]: r["__v"]
            for r in hits
        }
    finally:
        sorted_df.unpersist()
    rows = []
    for g, p, lo, hi, frac in specs:
        vlo, vhi = picked[(g, lo)], picked[(g, hi)]
        rows.append((g, p, vlo + frac * (vhi - vlo)))
    return local_frame(sess, rows, f"{group_col} {gtype}, percentile double, value double")


def count_if(cond: Column) -> Column:
    """A7: COUNTIF (sql/10_eda_queries.sql:128-136)."""
    return F.count_if(cond)


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """A10: duplicate-key detection (clean_ticket_sales.py:116-119) —
    groups appearing more than once, with their multiplicities."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )
