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


def create_database(spark: SparkSession, name: str) -> None:
    """S11: ``CREATE SCHEMA IF NOT EXISTS`` (sql/01_create_dataset.sql:7-11)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def create_view(df: DataFrame, name: str) -> None:
    """S13: register a view; view-on-view stacking works via the session
    catalog in dependency order (sql/03_create_views.sql:62)."""
    df.createOrReplaceTempView(name)
