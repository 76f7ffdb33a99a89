"""Incremental day-partition loading — streaming → warehouse upsert.

The reference reloads the whole fact with WRITE_TRUNCATE on every run
(scripts/load_to_bq.py:38); at 100 TB the correct pattern is incremental:
stream (or batch-discover) new files, aggregate the affected days, and
dynamically overwrite ONLY those day partitions. ``foreachBatch`` bridges
Structured Streaming to the partitioned-parquet writer; the streaming
checkpoint is the ledger of processed input files.

Semantics, stated up front: without a ``merge`` function the refresh is
REPLACE-per-partition — a day partition is rewritten with the aggregate of
the *current batch's* rows for that day, so late data arriving in a later
batch replaces (not merges with) what an earlier batch loaded for the same
day. That is the right semantics when a day's files always arrive together;
for late-data sources pass ``merge`` to get read-combine-write per affected
partition.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.writers import write_parquet_partitioned


def incremental_daily_load(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    aggregate: Callable[[DataFrame], DataFrame],
    ts_col: str = "ts",
    partition_col: str = "event_date",
    merge: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
):
    """Start an availableNow run: read new files from ``landing_dir``,
    aggregate each micro-batch to day grain with ``aggregate`` (must emit a
    ``partition_col`` date column), and dynamic-overwrite only the day
    partitions present in the batch.

    ``merge(existing_day_rows, new_day_rows) -> DataFrame``: when given, the
    upsert reads the CURRENT contents of the affected day partitions and
    writes ``merge``'s result instead of the batch aggregate alone — e.g.
    combine partial counts/sums so a day whose files span several batches
    accumulates instead of being replaced. Only the affected partitions are
    read (partition pruning on ``partition_col``), so the extra cost tracks
    the batch's days, not the warehouse size.

    Restartability: the checkpoint tracks consumed files, so a rerun after
    failure reprocesses only unconsumed input. Replace mode is idempotent
    per partition; merge mode is idempotent only per *completed* batch (a
    batch replayed after a crash mid-write may double-merge — at that point
    you want a transactional table format underneath).
    """
    stream = spark.readStream.schema(schema).parquet(landing_dir)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        day_rows = aggregate(batch_df)
        out = day_rows
        if merge is not None:
            sess = batch_df.sparkSession
            days = [r[0] for r in day_rows.select(partition_col).distinct().collect()]
            try:
                existing = sess.read.parquet(out_dir)
            except Exception:  # first load: no dataset at out_dir yet
                existing = None
            if existing is not None:
                affected = existing.filter(F.col(partition_col).isin(days))
                # localCheckpoint truncates lineage so the write below does
                # not read from the path it overwrites (Spark refuses
                # same-path read+overwrite plans); day-grain aggregates are
                # small, executor-local storage is fine.
                out = merge(affected, day_rows).localCheckpoint(eager=True)
        write_parquet_partitioned(out, out_dir, (partition_col,), mode="overwrite")

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
