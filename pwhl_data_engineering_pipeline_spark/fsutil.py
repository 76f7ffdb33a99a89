"""Shared Hadoop-FileSystem access for metadata operations.

Several components need driver-side filesystem metadata ops against
whatever FS the warehouse lives on (local, HDFS, S3A...): the snapshot
table format reads/writes manifest JSON, the compactor sizes output
files from `getContentSummary`, and the minhash incremental index checks
for its `_hot_buckets` sidecar. They all go through the JVM's
`org.apache.hadoop.fs.FileSystem` so the behavior is identical to what
Spark's own writers see (same `hadoopConfiguration`, same scheme
resolution) — a Python `os.path` check would silently disagree on
`s3a://` paths.

This helper centralizes the `jvm / Path / getFileSystem` idiom (ADVICE
r5: it was re-derived inline in three modules) and fails LOUD on
sessions without a JVM handle: `spark._jvm` / `spark._jsc` are classic
py4j attributes absent under Spark Connect, where driver-side Hadoop FS
access is not available at all — callers must run on a classic session
(documented requirement), and an `AttributeError` deep inside py4j is a
worse failure than a named error here.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """Resolve ``path`` against the session's Hadoop configuration.

    Returns ``(fs, hpath, jvm)`` — the `FileSystem` owning the path's
    scheme, the path as a `org.apache.hadoop.fs.Path`, and the py4j JVM
    view (for callers needing extra classes, e.g. `IOUtils`).

    Raises ``RuntimeError`` on Spark Connect sessions (no `_jvm`).
    """
    if not hasattr(spark, "_jvm") or spark._jvm is None:
        raise RuntimeError(
            "driver-side Hadoop FileSystem access requires a classic "
            "(non-Connect) SparkSession: spark._jvm is unavailable. "
            "Snapshot tables, compaction, and incremental-index sidecars "
            "need a classic session."
        )
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """Write a small UTF-8 text file (manifest-sized) through the Hadoop FS
    — works on any scheme Spark's writers reach, unlike Python ``open``."""
    fs, hpath, _ = hadoop_fs(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str | None:
    """Read a small UTF-8 text file through the Hadoop FS; None if absent."""
    fs, hpath, jvm = hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, True)
    return bytes(baos.toByteArray()).decode("utf-8")
