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


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
) -> None:
    """ORC sink with the same layout contract as the parquet writer:
    optional day/key partitioning plus sortWithinPartitions so stripe-level
    min/max stats stay tight on the cluster keys."""
    out = df
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


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

    from ..fsutil import delete, rename, walk_files

    df = spark.read.parquet(path)
    _nf, total = walk_files(spark, path)
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
    delete(spark, old, recursive=True)  # leftover from a previous crashed swap
    rename(spark, path.rstrip("/"), old)
    rename(spark, staging, path.rstrip("/"))
    delete(spark, old, recursive=True)
    return n_files


def create_database(
    spark: SparkSession,
    name: str,
    location: str | None = None,
    default_table_expiration_days: int | None = None,
) -> None:
    """S11: ``CREATE SCHEMA IF NOT EXISTS`` (sql/01_create_dataset.sql:7-11).

    The reference's ``OPTIONS(location='US', default_table_expiration_days=
    ...)`` maps as follows: ``location`` (a BigQuery *region*) has no Spark
    analogue — the closest physical control is the warehouse LOCATION,
    supported here. ``default_table_expiration_days`` (BigQuery auto-drops
    tables past the TTL server-side) is stored as a database property and
    enforced by :func:`vacuum_expired` — Spark has no server to expire
    tables for you, so retention is an explicit janitor pass you schedule."""
    loc = f" LOCATION '{location}'" if location else ""
    props = (
        f" WITH DBPROPERTIES ('default_table_expiration_days'="
        f"'{int(default_table_expiration_days)}')"
        if default_table_expiration_days is not None
        else ""
    )
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}{loc}{props}")


def stamp_created(
    spark: SparkSession,
    table: str,
    created_at_epoch: int,
    expiration_days: int | None = None,
) -> None:
    """Stamp a table's creation epoch (and optional per-table TTL override)
    as TBLPROPERTIES — the explicit timestamps :func:`vacuum_expired` trusts
    first. Callers that create tables outside the helpers here can stamp
    after the fact; unstamped tables fall back to the catalog's Created
    Time, and tables with neither are never dropped."""
    props = [f"'created_at_epoch'='{int(created_at_epoch)}'"]
    if expiration_days is not None:
        props.append(f"'expiration_days'='{int(expiration_days)}'")
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({', '.join(props)})")


def _db_property(spark: SparkSession, db: str, key: str) -> str | None:
    import re

    for r in spark.sql(f"DESCRIBE DATABASE EXTENDED {db}").collect():
        if r["info_name"].strip().lower() == "properties":
            m = re.search(rf"\(\s*{re.escape(key)}\s*,\s*([^)]*)\)", r["info_value"])
            if m:
                return m.group(1).strip()
    return None


def _table_created_epoch(spark: SparkSession, db: str, table: str) -> int | None:
    """Creation time for vacuum: explicit 'created_at_epoch' TBLPROPERTY
    first, else the catalog's Created Time line from DESCRIBE EXTENDED."""
    import calendar
    import time

    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {db}.{table}").collect()
    }
    if "created_at_epoch" in props:
        return int(props["created_at_epoch"])
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {db}.{table}").collect():
        if (r["col_name"] or "").strip() == "Created Time":
            try:  # ctime-style: 'Wed Aug 13 12:00:00 UTC 2026'
                return calendar.timegm(
                    time.strptime(r["data_type"].strip(), "%a %b %d %H:%M:%S %Z %Y")
                )
            except ValueError:
                return None
    return None


def vacuum_expired(
    spark: SparkSession, db: str, as_of_epoch: int | None = None
) -> dict:
    """Enforce the dataset TTL (runtime counterpart of BigQuery's
    ``default_table_expiration_days``): drop every table in ``db`` whose age
    exceeds its TTL. Per-table TBLPROPERTIES override the database default:
    ``expiration_days`` (relative) and ``expires_at_epoch`` (absolute).
    Tables whose creation time cannot be determined are NEVER dropped.

    Catalog-only operation (a few list/describe calls + drops) — no data
    scan, so it is safe to run as a scheduled janitor at any warehouse
    size. Returns {'dropped': [...], 'kept': [...]}."""
    import time

    now = int(as_of_epoch if as_of_epoch is not None else time.time())
    default_days = _db_property(spark, db, "default_table_expiration_days")
    dropped, kept = [], []
    for t in spark.sql(f"SHOW TABLES IN {db}").collect():
        if t["isTemporary"]:
            continue
        name = t["tableName"]
        props = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {db}.{name}").collect()
        }
        expires_at: int | None = None
        if "expires_at_epoch" in props:
            expires_at = int(props["expires_at_epoch"])
        else:
            days = props.get("expiration_days", default_days)
            if days is not None:
                created = _table_created_epoch(spark, db, name)
                if created is not None:
                    expires_at = created + int(days) * 86400
        if expires_at is not None and expires_at <= now:
            spark.sql(f"DROP TABLE {db}.{name}")
            dropped.append(name)
        else:
            kept.append(name)
    return {"dropped": dropped, "kept": kept}


def create_view(df: DataFrame, name: str) -> None:
    """S13: register a view; view-on-view stacking works via the session
    catalog in dependency order (sql/03_create_views.sql:62)."""
    df.createOrReplaceTempView(name)
