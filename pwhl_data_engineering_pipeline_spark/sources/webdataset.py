"""WebDataset-style tar-shard export/import for training-data delivery.

Training loaders (WebDataset, torchdata, NVIDIA DALI) stream `.tar` shards
whose members share a basename per sample — `{key}.txt`, `{key}.json`,
`{key}.jpg` — and shard-level sequential reads are the only IO pattern that
feeds GPUs from object storage at full bandwidth. This module turns a
DataFrame of (shard, key, named payloads) into exactly that layout, and
reads it back:

- ``write_webdataset``: shards are co-located one-task-per-shard-set
  (repartition on the shard id + mapInPandas, accumulating the whole
  partition before tarring — Arrow batch boundaries must never split a
  shard; pair with ``operators.packing.shard_assign`` for deterministic,
  size-balanced shards), building each tar IN MEMORY (a shard is a few
  hundred MB by design — the knob is your shard count) and
  committing via write-to-temp + atomic ``os.rename``. Task retries and
  speculative attempts each write a unique temp file; the rename is
  last-wins atomic, so a shard file is always one complete attempt's
  bytes, never interleaved.
- ``read_webdataset``: binaryFile scan of the shards + a stdlib-``tarfile``
  member expander in ``mapInPandas`` — each task streams whole shards,
  preserving the sequential-read property on the way back in.

Filesystem contract: the output path must be task-visible POSIX (local
disk, NFS, or a fuse/alluxio mount of object storage). Executors have no
JVM gateway, so the Hadoop FS API is driver-only; at warehouse scale
either mount the store or swap the two ``open``/``rename`` calls for an
fsspec filesystem — the commit protocol is unchanged.

Members are ordered (key asc, member asc) inside every shard, and tar
metadata (mtime/uid/gid) is zeroed — byte-identical shards for identical
input, rerun-stable checksums.
"""

from __future__ import annotations

import io
import os
import tarfile
import uuid
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from .readers import local_frame

_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("path", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_members", T.LongType()),
        T.StructField("bytes", T.LongType()),
    ]
)


def write_webdataset(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    key_col: str = "key",
    member_cols: Sequence[str] | None = None,
    name_template: str = "shard-{shard:05d}.tar",
) -> DataFrame:
    """Write one tar per distinct ``shard_col`` value; each row becomes one
    sample whose members are the non-null ``member_cols`` (column name =
    member extension: a ``txt`` string column → ``{key}.txt``, a ``jpg``
    binary column → ``{key}.jpg``). Returns the per-shard manifest
    (shard, path, n_samples, n_members, bytes) — an eager action; the
    files exist when this returns."""
    members = list(member_cols) if member_cols is not None else [
        c for c in df.columns if c not in (shard_col, key_col)
    ]
    if not members:
        raise ValueError("no member columns to write")
    os.makedirs(os.path.join(path, "_tmp"), exist_ok=True)

    def _write(pdfs: Iterator) -> Iterator:
        import pandas as pd

        # Accumulate the WHOLE partition before tarring: mapInPandas feeds
        # Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch,
        # default 10k rows), so one shard's rows can arrive as several
        # pdfs — tarring per batch would rename the same shard file
        # repeatedly, last-wins, silently dropping every earlier batch's
        # samples. The partition's rows are one-or-more complete shards by
        # construction (repartition on the shard column), and a shard is
        # sized to fit a task by design, so this holds shard-count × shard
        # bytes — the same envelope the tar build needs anyway.
        parts = [pdf for pdf in pdfs if not pdf.empty]
        if not parts:
            return
        whole = pd.concat(parts, ignore_index=True).sort_values(key_col)
        for shard, grp in whole.groupby(shard_col):
            buf = io.BytesIO()
            n_members = 0
            with tarfile.open(fileobj=buf, mode="w") as tar:
                for _, row in grp.iterrows():
                    for ext in sorted(members):  # member asc within key
                        payload = row[ext]
                        if payload is None:
                            continue
                        data = (
                            payload.encode("utf-8")
                            if isinstance(payload, str)
                            else bytes(payload)
                        )
                        info = tarfile.TarInfo(name=f"{row[key_col]}.{ext}")
                        info.size = len(data)
                        info.mtime = 0  # rerun-stable bytes
                        tar.addfile(info, io.BytesIO(data))
                        n_members += 1
            blob = buf.getvalue()
            fname = name_template.format(shard=int(shard))
            tmp = os.path.join(path, "_tmp", f"{fname}.{uuid.uuid4().hex}")
            with open(tmp, "wb") as fh:
                fh.write(blob)
            final = os.path.join(path, fname)
            os.rename(tmp, final)  # atomic last-wins commit
            yield pd.DataFrame(
                [
                    {
                        "shard": int(shard),
                        "path": final,
                        "n_samples": len(grp),
                        "n_members": n_members,
                        "bytes": len(blob),
                    }
                ]
            )

    manifest = (
        df.repartition(F.col(shard_col))
        .mapInPandas(_write, schema=_MANIFEST_SCHEMA)
        .collect()  # eager: files are on disk when we return
    )
    return local_frame(df.sparkSession, manifest, _MANIFEST_SCHEMA)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Read tar shards back as (shard_path, key, ext, payload binary) rows —
    a binaryFile scan (whole shards per task, sequential IO) expanded by
    stdlib tarfile in mapInPandas."""
    out_schema = T.StructType(
        [
            T.StructField("shard_path", T.StringType()),
            T.StructField("key", T.StringType()),
            T.StructField("ext", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _expand(pdfs: Iterator) -> Iterator:
        import pandas as pd

        for pdf in pdfs:
            # yield per TAR FILE: a batch can hold several few-hundred-MB
            # shards, and accumulating all their expanded members alongside
            # the raw tar bytes would double-buffer the whole batch
            for _, r in pdf.iterrows():
                rows = []
                with tarfile.open(fileobj=io.BytesIO(bytes(r["content"]))) as tar:
                    for m in tar.getmembers():
                        if not m.isfile():
                            continue
                        stem, _, ext = m.name.rpartition(".")
                        rows.append(
                            {
                                "shard_path": r["path"],
                                "key": stem,
                                "ext": ext,
                                "payload": tar.extractfile(m).read(),
                            }
                        )
                if rows:
                    yield pd.DataFrame(rows)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
        .mapInPandas(_expand, schema=out_schema)
    )
