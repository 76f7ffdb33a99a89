"""Sinks — SURVEY.md §2.1 S8-S13 + §1.4 physical layout.

The reference's one deliberate physical design is the warehouse layout:
day-partitioned fact clustered by (market, venue_id, section)
(scripts/load_to_bq.py:99-102) with idempotent WRITE_TRUNCATE loads
(scripts/load_to_bq.py:38). In Spark that is ``partitionBy`` +
``sortWithinPartitions`` (row-group stat pruning ≈ clustering) +
``mode("overwrite")`` with dynamic partition overwrite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_csv_single(df: DataFrame, path: str, header: bool = True) -> None:
    """Single-file CSV sink (S8 parity: ``df.to_csv(index=False)``).

    ``coalesce(1)`` is correct only for dimension-sized outputs; large tables
    must use :func:`write_parquet_partitioned` — a single CSV file is a
    single-task bottleneck by definition.
    """
    df.coalesce(1).write.mode("overwrite").option("header", header).csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Plain Parquet sink (S9 staging parity)."""
    df.write.mode(mode).parquet(path)


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = ("event_date",),
    cluster_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Warehouse-layout sink (S10): day-partitioned + clustered.

    ``sortWithinPartitions(cluster_by)`` orders rows inside each file so
    Parquet row-group min/max stats make point lookups on the cluster keys
    prune — the Spark analogue of BigQuery clustering
    (scripts/load_to_bq.py:99-102). Partition overwrite is dynamic so an
    incremental day-load replaces only the days present in ``df``.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out = df
        if cluster_by:
            out = out.sortWithinPartitions(*cluster_by)
        (
            out.write.mode(mode)
            .partitionBy(*partition_by)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def save_as_table(
    df: DataFrame,
    name: str,
    partition_by: Sequence[str] = (),
    cluster_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Catalog-table sink (S10/S12 CTAS parity)."""
    out = df.sortWithinPartitions(*cluster_by) if cluster_by else df
    writer = out.write.mode(mode).format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(name)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: Sequence[str] = (),
    cluster_by: Sequence[str] = (),
) -> int:
    """Compact a parquet dataset's small files: read, coalesce to
    ``ceil(total_bytes / target_file_bytes)`` files, rewrite via a staging
    directory with a rename-aside swap.

    Small files are the classic slow killer of a 100 TB lake (per-file open
    cost, tiny row groups defeat min/max pruning, driver file-listing blowup)
    — streaming/incremental sinks produce them continuously, so compaction is
    a first-class maintenance operator. Returns the output file count.

    Swap order is crash-safe for the data (path → path__old, staging → path,
    drop __old): at no point is there *no* complete copy on disk, and a crash
    mid-swap is recoverable by renaming ``__old`` back. It is NOT atomic for
    concurrent readers — a reader can list the directory during the rename
    window and see a missing path; true reader isolation needs a
    transactional table format (Delta/Iceberg) or a catalog pointer swap.
    """
    import math

    from py4j.java_gateway import java_import

    df = spark.read.parquet(path)
    jvm = spark.sparkContext._jvm
    java_import(jvm, "org.apache.hadoop.fs.Path")
    fs = jvm.Path(path).getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jvm.Path(path)).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))

    staging = path.rstrip("/") + "__compact_staging"
    out = df.repartition(n_files)
    if cluster_by:
        out = out.sortWithinPartitions(*cluster_by)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    old = path.rstrip("/") + "__compact_old"
    fs.delete(jvm.Path(old), True)  # leftover from a previous crashed swap
    fs.rename(jvm.Path(path), jvm.Path(old))
    fs.rename(jvm.Path(staging), jvm.Path(path))
    fs.delete(jvm.Path(old), True)
    return n_files


def create_database(spark: SparkSession, name: str, location: str | None = None) -> None:
    """S11: ``CREATE SCHEMA IF NOT EXISTS`` (sql/01_create_dataset.sql:7-11).

    The reference's ``OPTIONS(location='US', default_table_expiration_days=
    ...)`` maps as follows: ``location`` (a BigQuery *region*) has no Spark
    analogue — the closest physical control is the warehouse LOCATION,
    supported here; ``default_table_expiration_days`` (TTL auto-drop) has no
    Spark/parquet counterpart at all and is intentionally dropped — retention
    belongs to a table-format policy (Delta/Iceberg) or an external janitor,
    not the catalog. Documented deviation, see sql_dialect._SCHEMA_RE."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}{loc}")


def create_view(df: DataFrame, name: str) -> None:
    """S13: register a view; view-on-view stacking works via the session
    catalog in dependency order (sql/03_create_views.sql:62)."""
    df.createOrReplaceTempView(name)
