"""Readers — SURVEY.md §2.1 S1-S7.

Every reader takes an explicit schema (never ``inferSchema`` in production:
SURVEY.md §1.3). Drivers for small config-side inputs (YAML, REST) build the
rows driver-side and ``createDataFrame`` them — they are dimension-sized by
construction (8 markets, config/markets.yml). Large inputs go through Spark's
distributed file sources so scans parallelize and push filters down.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


# -- S3/S4/S5: CSV scans ----------------------------------------------------

def read_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """CSV scan with explicit schema (S3/S4). ``path`` may contain a glob —
    multi-file union (S5, integrate_weather_sales.py:61-67) is just a glob
    path; Spark lists and splits files in parallel."""
    return (
        spark.read.option("header", header)
        .option("mode", "PERMISSIVE")
        .schema(schema)
        .csv(path)
    )


def read_parquet(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Parquet scan — schema comes from the file footer; vectorized reader,
    predicate pushdown and column pruning apply (S9 read-side)."""
    if isinstance(path, list):
        return spark.read.parquet(*path)
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as parquet
    (PushedFilters + ReadSchema reach the scan; ORC carries file/stripe
    min-max stats), included so warehouses standardized on ORC read
    natively instead of converting. Accepts a glob or an explicit list."""
    if isinstance(path, list):
        return spark.read.orc(*path)
    return spark.read.orc(path)


def read_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md).

    ``events.ts`` is TIMESTAMP(NANOS) in the parquet footer; Spark reads it
    as long under ``spark.sql.legacy.parquet.nanosAsLong`` — convert to a
    microsecond timestamp here so downstream plans see TimestampType.
    """
    if table == "events":
        # Defensive: the caller's session may not carry the engine conf.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            # integer `div`, NOT `/1000` + cast: double division rounds to
            # the nearest representable (ulp 0.25 at µs-epoch magnitude) and
            # can round UP, while nanos→µs must truncate.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """Small driver-side frame as a true LocalRelation.

    ``spark.createDataFrame(list)`` parallelizes into
    ``defaultParallelism`` Python-RDD slices — an 8-row frame becomes a
    32-task stage whose every task round-trips a Python worker to
    deserialize a mostly-empty slice (measured 0.4-0.6 s per ACTION at
    local[32], and broadcast-heavy plans re-pay it per broadcast build).
    Routing the rows through a ``pyarrow.Table`` instead yields a
    LocalRelation the driver evaluates in-process: zero tasks, zero
    Python workers, ~10× faster per action — and at cluster scale a
    LocalRelation is what these dimension-sized frames should have been
    all along (broadcast builds read it driver-side instead of running a
    32-task job). Works on a vanilla session (no Arrow conf needed — the
    Arrow path here is driver-local). Falls back to the classic
    ``createDataFrame`` on any conversion surprise, so exotic types can
    never change values — only speed."""
    rows = list(rows)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        if isinstance(schema, str):
            struct = T._parse_datatype_string(schema)
        else:
            struct = schema
        names = [f.name for f in struct.fields]
        # dict(zip(...)) would silently NULL-pad short rows and drop extra
        # trailing values where classic createDataFrame raises (ADVICE r13
        # low) — reject length mismatches up front so malformed caller
        # input fails loudly on the classic path below.
        if any(len(r) != len(names) for r in rows):
            raise ValueError("row length != schema length")
        tbl = pa.Table.from_pylist(
            [dict(zip(names, r)) for r in rows], schema=to_arrow_schema(struct)
        )
        return spark.createDataFrame(tbl, struct)
    except Exception:
        return spark.createDataFrame(rows, schema)


# -- S6/S7: config sources --------------------------------------------------

def dataframe_from_config(
    spark: SparkSession,
    rows: Sequence[dict[str, Any]],
    schema: T.StructType,
) -> DataFrame:
    """Materialize driver-side config (YAML/JSON list-of-dicts) as a small
    dimension DataFrame (S6; transform_weather.py:28-42,
    materialize_dim_market.py:10-14). Nested dicts are flattened with dotted
    keys (S7 json_normalize parity)."""

    def _flatten(d: dict[str, Any], prefix: str = "") -> dict[str, Any]:
        out: dict[str, Any] = {}
        for k, v in d.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                out.update(_flatten(v, f"{key}."))
            else:
                out[key] = v
        return out

    flat = [_flatten(r) for r in rows]
    data = [tuple(r.get(f.name) for f in schema.fields) for r in flat]
    return spark.createDataFrame(data, schema)


def read_settings_yaml(path: str) -> dict[str, Any]:
    """Parse the reference's ``config/settings.yml`` (S6/EP1 parity:
    scripts/ingest_weather.py:43 loads it for the weather API window/params;
    scripts/load_to_bq.py for the warehouse block). Handles the file's UTF-8
    BOM and interpolates ``${ENV_VAR}`` placeholders from the environment
    (missing vars resolve to None, matching "configure before use").

    Returns the raw nested dict; :func:`weather_requests_from_settings`
    turns the weather block + market dimension into REST request
    descriptors for :func:`rest_source`."""
    import os
    import re

    try:
        import yaml  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("pyyaml not available") from e
    with open(path, encoding="utf-8-sig") as f:
        cfg = yaml.safe_load(f)

    env_re = re.compile(r"^\$\{(\w+)\}$")

    def _interp(v):
        if isinstance(v, dict):
            return {k: _interp(x) for k, x in v.items()}
        if isinstance(v, list):
            return [_interp(x) for x in v]
        if isinstance(v, str):
            m = env_re.match(v.strip())
            if m:
                return os.environ.get(m.group(1))
        return v

    return _interp(cfg)


def weather_requests_from_settings(
    settings: dict[str, Any], markets: Sequence[dict[str, Any]]
) -> list[dict[str, Any]]:
    """Thread settings.yml's weather block into per-market REST request
    descriptors (ingest_weather.py:86-93: one fetch per market with the
    configured window/vars). Each descriptor carries the market stamp
    columns plus the query params ``rest_source``'s fetch fn needs."""
    w = settings["weather"]
    return [
        {
            **m,
            "base_url": w["base_url"],
            "start_date": str(w["start_date"]),
            "end_date": str(w["end_date"]),
            "hourly": w["hourly"],
            "timeout_seconds": w.get("timeout_seconds", 60),
        }
        for m in markets
    ]


def read_markets_yaml(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """YAML market config → dimension DataFrame (S6,
    materialize_dim_market.py:10-26). Gated import: yaml may be absent."""
    try:
        import yaml  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("pyyaml not available; pass rows directly") from e
    with open(path) as f:
        cfg = yaml.safe_load(f)
    rows = cfg.get("markets", cfg) if isinstance(cfg, dict) else cfg
    return dataframe_from_config(spark, rows, schema)


# -- S2: JSON struct-of-arrays → rows ---------------------------------------

def columns_from_struct_of_arrays(
    spark: SparkSession,
    payload: dict[str, list[Any]],
    schema: T.StructType,
) -> DataFrame:
    """Rectangularize a ``{"col": [v0, v1, ...]}`` JSON payload into rows
    (S2; ingest_weather.py:47-48 does ``pd.DataFrame(j["hourly"])``)."""
    names = [f.name for f in schema.fields]
    cols = [payload[n] for n in names]
    return spark.createDataFrame(list(zip(*cols)), schema)


def explode_struct_of_arrays(df: DataFrame, array_cols: Sequence[str]) -> DataFrame:
    """Distributed variant of S2 for payloads already in a DataFrame: zip the
    array columns positionally and explode — one shuffle-free narrow op."""
    zipped = F.arrays_zip(*[F.col(c) for c in array_cols])
    exploded = df.withColumn("__z", F.explode(zipped))
    out = df.columns
    return exploded.select(
        *[c for c in out if c not in array_cols],
        *[F.col(f"__z.{c}").alias(c) for c in array_cols],
    )


# -- S1: REST API source ----------------------------------------------------

def rest_source(
    spark: SparkSession,
    requests_list: Sequence[dict[str, Any]],
    fetch: Callable[[dict[str, Any]], dict[str, list[Any]]],
    schema: T.StructType,
    stamp_cols: Sequence[str] = (),
) -> DataFrame:
    """REST ingestion (S1; ingest_weather.py:26-48,92-93,103).

    ``fetch`` maps one request descriptor to a struct-of-arrays payload;
    per-request frames are stamped with request attributes (market/venue) and
    unioned. The reference fetches 8 markets serially driver-side; at scale
    the same ``fetch`` runs *distributed* via :func:`rest_source_distributed`.
    """
    frames = []
    for req in requests_list:
        payload = fetch(req)
        df = columns_from_struct_of_arrays(spark, payload, schema)
        for c in stamp_cols:
            df = df.withColumn(c, F.lit(req[c]))
        frames.append(df)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def rest_source_distributed(
    spark: SparkSession,
    requests_list: Sequence[dict[str, Any]],
    fetch_json: Callable[[dict[str, Any]], str],
    out_schema: T.StructType,
) -> DataFrame:
    """Scale path for S1: distribute request descriptors as a DataFrame and
    fetch inside ``mapInPandas`` so thousands of endpoints are pulled in
    parallel by executors (Spark-4 PySpark DataSource spirit without the
    registration ceremony). ``fetch_json`` returns a JSON string per request
    shaped ``{"col": [values...]}``.
    """
    import pandas as pd  # noqa: PLC0415

    req_df = spark.createDataFrame(
        [(json.dumps(r),) for r in requests_list], "request_json string"
    ).repartition(max(1, len(requests_list)))
    names = [f.name for f in out_schema.fields]

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            for raw in pdf["request_json"]:
                payload = json.loads(fetch_json(json.loads(raw)))
                yield pd.DataFrame({n: payload[n] for n in names})

    return req_df.mapInPandas(run, out_schema)
