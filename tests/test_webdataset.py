"""WebDataset tar-shard export/import (sources.webdataset): round-trip,
byte-determinism, atomic commit, external-tool readability."""

from __future__ import annotations

import glob
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.sources import webdataset as wd


@pytest.fixture()
def samples(spark):
    rows = [
        (i % 3, f"{i:06d}", f"text of sample {i}", bytes([i % 251, 1, 2, i % 7]))
        for i in range(30)
    ]
    return spark.createDataFrame(
        rows, "shard long, key string, txt string, jpg binary"
    )

def test_roundtrip_and_layout(spark, tmp_path, samples):
    out = str(tmp_path / "wds")
    manifest = wd.write_webdataset(samples, out)
    m = {r["shard"]: r for r in manifest.collect()}
    assert set(m) == {0, 1, 2}
    assert all(r["n_samples"] == 10 and r["n_members"] == 20 for r in m.values())
    # stdlib tarfile (the proxy for any external loader) reads the shards
    files = sorted(glob.glob(f"{out}/*.tar"))
    assert [os.path.basename(f) for f in files] == [
        "shard-00000.tar", "shard-00001.tar", "shard-00002.tar"
    ]
    with tarfile.open(files[0]) as tar:
        names = tar.getnames()
    # members grouped per key, ordered, extension per column
    assert names[0].endswith(".jpg") or names[0].endswith(".txt")
    assert len(names) == 20
    assert names == sorted(names)
    # spark round-trip: every (key, ext, payload) survives
    back = wd.read_webdataset(spark, out)
    got = {(r["key"], r["ext"]): r["payload"] for r in back.collect()}
    src = samples.collect()
    assert len(got) == 60
    for r in src:
        assert got[(r["key"], "txt")] == r["txt"].encode()
        assert bytes(got[(r["key"], "jpg")]) == bytes(r["jpg"])


def test_rerun_is_byte_identical_and_tmp_clean(spark, tmp_path, samples):
    out = str(tmp_path / "wds2")
    wd.write_webdataset(samples, out)
    first = {
        os.path.basename(p): open(p, "rb").read()
        for p in glob.glob(f"{out}/*.tar")
    }
    wd.write_webdataset(samples, out)  # overwrite in place (atomic rename)
    second = {
        os.path.basename(p): open(p, "rb").read()
        for p in glob.glob(f"{out}/*.tar")
    }
    assert first == second  # zeroed mtimes + sorted members → stable bytes
    assert os.listdir(f"{out}/_tmp") == []  # every temp renamed away


def test_null_members_skipped_and_no_members_rejected(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, "a", "hello", None), (0, "b", None, b"\x01")],
        "shard long, key string, txt string, jpg binary",
    )
    out = str(tmp_path / "wds3")
    manifest = wd.write_webdataset(df, out).collect()
    assert manifest[0]["n_samples"] == 2 and manifest[0]["n_members"] == 2
    back = {(r["key"], r["ext"]) for r in wd.read_webdataset(spark, out).collect()}
    assert back == {("a", "txt"), ("b", "jpg")}
    with pytest.raises(ValueError):
        wd.write_webdataset(df.select("shard", "key"), str(tmp_path / "wds4"))


def test_packing_shard_assign_composes(spark, tmp_path, sf_dir):
    """The intended pipeline: packing.shard_assign picks deterministic
    shards, webdataset writes them — documents land as {doc_id}.txt
    members in balanced tar shards."""
    from pwhl_data_engineering_pipeline_spark.operators import packing
    from pwhl_data_engineering_pipeline_spark.sources.readers import read_testdata

    docs = read_testdata(spark, sf_dir, "documents").limit(200)
    sharded = packing.shard_assign(docs, n_shards=4).select(
        "shard",
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("key"),
        F.col("text").alias("txt"),
    )
    out = str(tmp_path / "wds_docs")
    manifest = wd.write_webdataset(sharded, out)
    assert manifest.count() == 4
    assert wd.read_webdataset(spark, out).count() == 200


def test_shard_spanning_multiple_arrow_batches_not_truncated(spark, tmp_path):
    """Regression (review finding): mapInPandas delivers a partition as
    MULTIPLE Arrow batches once rows exceed maxRecordsPerBatch — tarring
    per batch renamed the same shard file repeatedly (last-wins) and
    silently dropped every earlier batch's samples. Force 50-row batches
    against a 300-row shard: all samples must land, once, in one tar."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        df = spark.createDataFrame(
            [(0, f"{i:06d}", f"sample {i}") for i in range(300)],
            "shard long, key string, txt string",
        )
        out = str(tmp_path / "wds_big")
        manifest = wd.write_webdataset(df, out).collect()
        assert len(manifest) == 1
        assert manifest[0]["n_samples"] == 300 and manifest[0]["n_members"] == 300
        back = wd.read_webdataset(spark, out)
        assert back.count() == 300
        assert back.select("key").distinct().count() == 300
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
