"""BM25 keyword search: sparse lexical retrieval over a document corpus.

The lexical complement to operators.similarity's dense ANN — a training-data
platform needs both ("find documents about X" for curation/evals, dense
cosine for dedup/retrieval). Okapi BM25 with the standard parameters::

    idf(t)        = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(q, d)   = Σ_{t ∈ q}  idf(t) · tf_{t,d}·(k1+1)
                                / (tf_{t,d} + k1·(1 - b + b·len_d/avglen))

Execution shape (the part that must survive 100 TB):

- The corpus tokenizes map-side into (doc, term, tf) postings — one explode
  inside the scan stage, no Python.
- Document frequency is one groupBy(term) over DISTINCT (doc, term) — the
  only corpus-sized shuffle, and it is the inverted index you would persist
  and reuse across queries (see ``build_index`` / ``bm25_score``).
- The query side is tiny by nature (a handful of probe strings), so query
  terms BROADCAST onto the postings: scoring is a map-side hash-join probe
  of the corpus, shuffling only (query, doc, partial score) for the final
  per-query sum — rows bounded by |matched postings|, never all-pairs.
- Global N and avglen are a 1-row aggregate broadcast via crossJoin — the
  same scalar-subquery shape Catalyst plans for an uncorrelated subquery.
- Scores round to 6 dp BEFORE top-k selection with a (score desc, doc_id)
  deterministic tiebreak, so ranking is stable across engines and partition
  layouts (the same order-stability trick as similarity.brute_force_topk).

No counterpart in the reference; part of the engine's training-data
extension. Oracle-checked end to end (`ns_bm25_search`): DuckDB reproduces
the identical top-k because every step above is portable SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..sources.readers import local_frame

from ..functions.text import tokens as _text_tokens

#: Default age gate (seconds) before an uncommitted batch directory is
#: reclaimed as an orphan — the same grace-period pattern as
#: ``snapshots.vacuum``. Young uncommitted directories are
#: indistinguishable from an IN-FLIGHT append's files, and batches
#: freshly retired by an in-place compaction may still be scanned by a
#: probe that planned against the pre-compaction scalars; both races
#: close once the directories are older than this gate.
DEFAULT_RECLAIM_MIN_AGE = 3600.0


def _tokens(col):
    """Lowercased terms via functions.text.tokens — ONE canonical tokenizer,
    so search terms agree with text-analysis terms by construction (blank
    text → empty array, so blank docs/queries emit no postings)."""
    return _text_tokens(F.lower(col))


def build_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Corpus → (postings, stats).

    ``postings``: (doc_id, term, tf, doc_len) — persist this (partitioned by
    a hash of term at scale) to amortize tokenization across query batches.
    ``stats``: (term, df) document frequencies. Both are plain DataFrames;
    writing them is the caller's choice (one-shot search composes them
    lazily and Catalyst pipelines the whole thing).

    ``checkpoint=True`` pins postings with a lazy localCheckpoint before
    stats derive from it — for one-shot consumers that fan postings out to
    several branches (bm25_topk uses it for corpus scalars + stats + the
    scored join), so the corpus tokenize+aggregate runs once, not once per
    branch. Off by default: persisted-index pipelines already materialize.
    """
    # ONE exchange instead of two (spark_optimization_guide §2.4): hash-
    # distribute the DOCUMENTS by doc_id before tokenizing. The resulting
    # hashpartitioning(doc_id) survives the project/explode/filter chain
    # and satisfies BOTH the (doc_id, term) grouping's clustered
    # distribution (equal pairs share a doc_id, so they share a partition)
    # and the doc_len window's partitionBy(doc_id) — so the tf aggregation
    # and the window run with NO further shuffle, where grouping first
    # would shuffle the postings a second time just to attach doc_len.
    # Shuffling doc text ≈ shuffling the token stream byte-wise, but the
    # tokenize now runs at shuffle parallelism even when the input is a
    # single-split file (a one-task regexp stage was the measured wall
    # here). No explicit partition count, so AQE is free to coalesce.
    toks = (
        docs.repartition(F.col(id_col))
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    postings = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "doc_len", F.sum("tf").over(Window.partitionBy("doc_id"))
        )
    )
    if checkpoint:
        postings = postings.localCheckpoint(eager=False)
    stats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return postings, stats


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id: str = "query_id",
    query_text: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    Returns (query_id, doc_id, score, rank), rank 1..k, score rounded to
    6 dp before selection. Queries are distinct-termed (a term repeated in
    the query counts once — standard BM25 query semantics).
    """
    postings, _stats = build_index(docs, text_col, id_col, checkpoint=True)

    # 1-row corpus scalars; crossJoin of a 1-row frame broadcasts. Kept
    # LAZY deliberately (r14): an eager driver collect into literals (the
    # lm/dsir move) was tried and REVERTED — it serialized a broadcast
    # build that previously ran concurrently with the others, measured
    # +0.15 s (and a constant-key equi-join folds back to a nested-loop
    # plan, so there is no lazy hash-join spelling). Single pass over
    # postings: n_docs = distinct doc count, avg_len = Σtf / n_docs
    # (doc_len sums each doc's tf, so the per-doc average IS the global
    # token count over the doc count — exact in float64 up to 2^53
    # tokens).
    scalars = postings.agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.sum("tf").alias("__total_tf"),
    ).select(
        "n_docs", (F.col("__total_tf") / F.col("n_docs")).alias("avg_len")
    )

    qterms = (
        queries.select(
            F.col(query_id).alias("query_id"),
            F.explode(F.array_distinct(_tokens(F.col(query_text)))).alias("term"),
        )
        .filter(F.col("term") != "")
    )

    # Reduce the df aggregation to the query vocabulary BEFORE its exchange
    # (r14, guide §2.3/§3.2): a broadcast semi-join on the distinct query
    # terms drops non-query postings map-side, so the stats exchange
    # carries partial counts for the query's terms only instead of the
    # full vocabulary. Per-term df values are unchanged (filtering by term
    # never changes that term's count). The tiny (query, term, df) frame
    # then broadcasts onto postings: the corpus-sized posting stream joins
    # only against broadcasts.
    # no .distinct() on the semi side: a LeftSemi build-side hash table
    # dedupes keys itself, and the distinct would add an exchange
    qset = qterms.select("term")
    qdf = (
        postings.join(F.broadcast(qset), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    qstats = qdf.join(F.broadcast(qterms), "term")
    scored = (
        postings.join(F.broadcast(qstats), "term")
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.col("avg_len"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("part").alias("raw"))
        # floor-round BEFORE ranking: local float noise must not reorder
        # ties; the exact floor(x*1e6+0.5)/1e6 form is what the SQL mirror
        # computes, so the doubles are bit-identical across engines
        .withColumn("score", F.floor(F.col("raw") * 1e6 + F.lit(0.5)) / 1e6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def bm25_sql(
    *,
    docs_from: str,
    queries_values: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """ANSI/DuckDB SQL mirror of :func:`bm25_topk`, kept beside the
    implementation so the two recipes cannot drift. ``docs_from`` is a
    FROM-able relation with (doc_id, text); ``queries_values`` a VALUES
    list ``(query_id, query_text)``."""
    return f"""
        WITH q(query_id, query_text) AS (VALUES {queries_values}),
        qterms AS (
          SELECT DISTINCT query_id, term FROM (
            SELECT query_id,
                   unnest(string_split_regex(lower(trim(query_text)), '\\s+')) AS term
            FROM q
          ) WHERE term <> ''
        ),
        toks AS (
          SELECT doc_id, term FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
            FROM {docs_from}
          ) WHERE term <> ''
        ),
        postings AS (
          SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
        ),
        lens AS (
          SELECT doc_id, sum(tf) AS doc_len FROM postings GROUP BY doc_id
        ),
        stats AS (
          SELECT term, count(*) AS df FROM postings GROUP BY term
        ),
        scalars AS (
          SELECT count(*) AS n_docs, avg(doc_len) AS avg_len FROM lens
        ),
        scored AS (
          SELECT qt.query_id, p.doc_id,
                 floor(sum(
                   ln(1.0 + (s.n_docs - st.df + 0.5) / (st.df + 0.5))
                   * (p.tf * {k1 + 1.0!r})
                   / (p.tf + {k1!r} * ({1.0 - b!r} + {b!r} * l.doc_len / s.avg_len))
                 ) * 1e6 + 0.5) / 1e6 AS score
          FROM postings p
          JOIN qterms qt USING (term)
          JOIN stats st USING (term)
          JOIN lens l USING (doc_id)
          CROSS JOIN scalars s
          GROUP BY qt.query_id, p.doc_id
        )
        SELECT query_id, doc_id, score, rank FROM (
          SELECT query_id, doc_id, score,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, doc_id) AS rank
          FROM scored
        ) WHERE rank <= {k}
    """


def _read_scalars(spark, path: str) -> dict:
    """Current corpus scalars for a persisted BM25 index: the highest
    committed version under ``{path}/_scalars/`` (the append-capable
    layout), falling back to the legacy single-file ``_scalars.json``
    (treated as version 0). The returned dict carries ``_version`` so an
    appender can commit version+1 with an explicit-conflict rename."""
    import json as _json
    import re as _re

    from ..fsutil import list_names, read_text

    best_v, best_name = -1, None
    for name in list_names(spark, f"{path}/_scalars"):
        m = _re.match(r"^v(\d{8})\.json$", name)
        if m and int(m.group(1)) > best_v:
            best_v, best_name = int(m.group(1)), name
    if best_name is not None:
        meta = _json.loads(read_text(spark, f"{path}/_scalars/{best_name}"))
        meta["_version"] = best_v
        return meta
    txt = read_text(spark, f"{path}/_scalars.json")
    if txt is None:
        raise FileNotFoundError(f"no BM25 index scalars at {path}")
    meta = _json.loads(txt)
    meta["_version"] = 0
    return meta


def _commit_scalars(spark, path: str, meta: dict, parent_version: int) -> int:
    """Atomically commit a new scalars version (the snapshot-table commit
    pattern: temp write + rename-to-new-path IS the commit — readers see
    the old or the new scalars, never a torn file, and two racing
    appenders conflict explicitly on the rename)."""
    import json as _json
    import uuid as _uuid

    from ..fsutil import delete, rename_no_overwrite, write_text

    version = parent_version + 1
    tmp = f"{path}/_scalars/.v{version:08d}.{_uuid.uuid4().hex}.tmp"
    write_text(spark, tmp, _json.dumps({k: v for k, v in meta.items() if k != "_version"}))
    if not rename_no_overwrite(spark, tmp, f"{path}/_scalars/v{version:08d}.json"):
        delete(spark, tmp)
        raise IOError(
            f"BM25 scalars v{version} commit conflict at {path} "
            "(concurrent appender?) — retry from the new current version"
        )
    return version


def _read_stamp(spark, stamp_path: str) -> dict | None:
    """A champion sidecar's stamp, or None when it is missing OR
    unparseable. A torn stamp — a crash mid-publish on a filesystem
    whose ``create`` is not atomic, or a pre-r11 in-place restamp read
    mid-write — must land on the documented graceful posture
    (probe refuses as unstamped, refresh rebuilds, repair sweeps),
    never a raw ``JSONDecodeError`` that leaves recovery manual
    (ADVICE r10 medium: every reader previously called ``json.loads``
    unguarded, and ``bm25_index_repair`` only swept ``txt is None``)."""
    import json as _json

    from ..fsutil import read_text

    txt = read_text(spark, stamp_path)
    if txt is None:
        return None
    try:
        stamp = _json.loads(txt)
    except ValueError:
        return None
    return stamp if isinstance(stamp, dict) else None


def _write_stamp(spark, stamp_path: str, stamp: dict) -> None:
    """Publish a champion-sidecar stamp atomically: temp write + delete +
    no-overwrite rename — the ``_commit_scalars`` pattern (ADVICE r10
    medium: the previous plain create-overwrite could be read torn
    mid-write, and the compaction restamp rewrote a LIVE stamp in place
    under concurrent probes). Between the delete and the rename a
    reader sees no stamp at all — the graceful 'unstamped' refusal —
    and after the rename it sees the whole new stamp; never torn JSON.
    A lost rename race (two maintainers stamping the same sidecar —
    outside the single-writer contract) raises loudly."""
    import json as _json
    import uuid as _uuid

    from ..fsutil import delete, rename_no_overwrite, write_text

    tmp = f"{stamp_path}.{_uuid.uuid4().hex}.tmp"
    write_text(spark, tmp, _json.dumps(stamp))
    delete(spark, stamp_path)
    if not rename_no_overwrite(spark, tmp, stamp_path):
        delete(spark, tmp)
        raise IOError(
            f"champion stamp publish conflict at {stamp_path} (concurrent "
            "rebuild/refresh of the same sidecar — outside the single-"
            "writer maintenance contract) — the sidecar may be unstamped; "
            "re-run the refresh (it will rebuild)"
        )


def _sweep_refresh_staging(spark, root: str) -> None:
    """Delete leftover ``.refresh.*``/stamp-temp staging entries under a
    champion sidecar root (ADVICE r10 low: a refresh that crashed after
    its data-dir delete but before the swap rename leaves a staging dir
    behind, and once the next rebuild re-stamps the root FRESH, repair
    never sweeps inside it again — so crashed-refresh staging would
    accumulate forever). Safe by construction: staging entries are only
    ever renamed away by the maintainer that created them, and
    maintenance is single-writer by contract, so anything still present
    when a new rebuild/refresh starts belongs to a dead writer."""
    from ..fsutil import delete, list_names

    for name in list_names(spark, root):
        if name.startswith(".refresh.") or (
            name.startswith("stamp.json.") and name.endswith(".tmp")
        ):
            delete(spark, f"{root}/{name}", recursive=True)


def _salt_width(df, n_buckets: int, target_bytes: int = 1 << 20, cap: int = 32) -> int:
    """Sub-bucket salt width K for index writes: split each (bucket,
    batch) partition into K size-bounded files. One file per bucket (the
    first r9 layout) bounds writer fan-out but COLLAPSES probe-side read
    parallelism once buckets grow past a task's worth of data — measured
    at the 1000× decade, where hot-term buckets reached ~50 MB single
    files and the probe went from flat to 11×. K scales with the INPUT's
    plan-stat size (no extra scan: file sources know their bytes), so
    small corpora keep one file per bucket and big ones get
    size-bounded slices a probe fans out over; writer fan-out stays
    bounded at n_buckets × K one-sorter tasks. Unknown sizes (the
    Long.MaxValue sentinel non-file sources report, e.g. streaming
    micro-batches) fall back to 1 — epoch batches are small and a wide
    salt would explode their file counts."""
    try:
        bytes_in = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return 1
    if bytes_in <= 0 or bytes_in >= (1 << 60):
        return 1
    import math as _math

    return max(1, min(cap, _math.ceil(bytes_in / (n_buckets * target_bytes))))


def bm25_index_write(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    batch_id: str = "base",
) -> None:
    """Persist the inverted index for build-once / probe-many search — the
    production shape: tokenizing 100 TB once per QUERY BATCH (what
    ``bm25_topk`` does) is the cost ceiling; tokenizing once per CORPUS
    VERSION and probing a layout-optimized index is the floor.

    Layout: ``postings/`` (doc_id, term, tf, doc_len) and ``stats/``
    (term, df), both written PARTITIONED BY ``bucket =
    pmod(xxhash64(term), n_buckets)`` — a probe computes its query terms'
    buckets driver-side and reads ONLY those partitions (directory-level
    pruning, no footer reads for the rest of the corpus — the same
    partition-pruned-probe design as the IVF centroid index) — and, one
    level below, by ``batch``: every write stamps its rows with a batch
    id recorded in the scalars' committed-``batches`` list, which is what
    makes :func:`bm25_index_append` idempotent and crash-repairable
    (VERDICT r7 #3 — probes read only committed batches, so a crashed
    append's half-landed files are invisible, and re-appending the same
    batch id purges + rewrites them). Corpus scalars (n_docs, len_sum —
    exact dyadic-safe sums, not a float avg) commit as ``_scalars/``
    versions so probes pay zero corpus-sized work.

    Rebuild-over-existing is explicitly supported (the repair story says
    "rebuild with bm25_index_write"), so the previous index's trees are
    DELETED up front and both partitioned writes pin
    ``partitionOverwriteMode=static`` (ADVICE r9 medium: under a session-
    global ``spark.sql.sources.partitionOverwriteMode=dynamic``, a bare
    ``mode('overwrite').partitionBy`` keeps any ``bucket=/batch=``
    partition the new corpus doesn't touch — stale postings silently
    inflate the read-back-derived df/n_docs/len_sum, and with the default
    ``batch_id='base'`` the survivors are even committed-visible). The
    stats/scalars derivation additionally filters the read-back to THIS
    write's batch id as defense in depth. Deleting the old scalars first
    also narrows the crash window: a rebuild that dies mid-write now
    leaves a LOUD missing-scalars index, never old scalars silently
    pointing at half-rewritten postings. Rebuilds are therefore not
    atomic-to-probes — use :func:`bm25_index_compact` with ``out_path``
    (plus a path swap) when probes must stay live.
    """
    _check_batch_id(batch_id)
    # tokenize ONCE into the posting store; stats and scalars then derive
    # from the WRITTEN parquet instead of a pinned localCheckpoint of the
    # postings (VERDICT r8 #1, second half: at the 1000× decade a ~200M-row
    # checkpoint held storage memory the concurrent sort/write tasks
    # needed as execution memory — disk-backed re-scans of columns we
    # just wrote are the bounded-memory shape a 1000-executor build has)
    spark = docs.sparkSession
    # clear the previous index FIRST (trees + scalars): overwrite-mode
    # alone is not a clean slate under partitionOverwriteMode=dynamic
    # (ADVICE r9 medium), and old scalars surviving a mid-write crash
    # would point at half-rewritten postings — absent scalars fail loud.
    from ..fsutil import delete

    for stale in (
        f"{path}/postings",
        f"{path}/stats",
        f"{path}/_scalars",
        f"{path}/_scalars.json",
    ):
        delete(spark, stale, recursive=True)
    postings, _ = build_index(docs, text_col, id_col, checkpoint=False)
    bucket = F.pmod(F.xxhash64(F.col("term")), F.lit(n_buckets)).alias("bucket")
    batch = F.lit(batch_id).alias("batch")
    # repartition on (bucket, size-bounded salt) BEFORE the dynamic-
    # partition write (VERDICT r8 #1): each task holds one bucket slice,
    # so it runs ONE parquet sorter and writes ONE size-bounded file —
    # without it, every one of the 32 write tasks held rows of up to
    # n_buckets partitions, which is what exhausted the shared 8g local
    # pool on the 1000× build (SCALING.md); a bare repartition("bucket")
    # overshot the other way (ONE giant file per bucket — probe
    # parallelism collapsed at the 1000× decade, see _salt_width).
    k = _salt_width(docs, n_buckets)
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(k))
    postings.select("doc_id", "term", "tf", "doc_len", bucket, batch).repartition(
        F.col("bucket"), salt
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("bucket", "batch").parquet(
        f"{path}/postings"
    )
    written = spark.read.parquet(f"{path}/postings").filter(
        F.col("batch") == batch_id
    )
    # df per term from the written postings (column-pruned scan of term +
    # the bucket partition value — no re-tokenization, no pinned memory)
    written.groupBy("bucket", "term").agg(
        F.count(F.lit(1)).alias("df")
    ).select("term", "df", "bucket", F.lit(batch_id).alias("batch")).repartition(
        "bucket"
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("bucket", "batch").parquet(f"{path}/stats")
    row = (
        written.select("doc_id", "doc_len")
        .distinct()
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_len").alias("len_sum"),
        )
        .first()
    )
    # scalars history was cleared before the rebuild's writes, so this
    # commit is v1 of a fresh lineage (a stale higher version must not win)
    _commit_scalars(
        spark,
        path,
        {
            "n_docs": int(row["n_docs"] or 0),
            "len_sum": int(row["len_sum"] or 0),
            "n_buckets": n_buckets,
            "batches": [batch_id],
        },
        parent_version=0,
    )


def _check_batch_id(batch_id: str) -> str:
    """Batch ids become partition DIRECTORY names (``batch=<id>``) that the
    purge/repair paths reconstruct verbatim; Spark URL-escapes special
    characters at write time but the reconstruction does not, so an id
    containing e.g. ``=`` or ``/`` would write one name and purge another
    — restrict to filesystem-literal characters instead of escaping."""
    import re as _re

    if not _re.fullmatch(r"[A-Za-z0-9_\-]{1,64}", batch_id or ""):
        raise ValueError(
            f"batch_id must match [A-Za-z0-9_-]{{1,64}}: {batch_id!r}"
        )
    return batch_id


def _verify_tombstone_reuse(
    spark, tdir: str, ids, id_col: str, batch_id: str
) -> None:
    """Guard for the delete functions' idempotent-skip path (ADVICE r11):
    a re-issued delete whose ``batch_id`` is already committed is only a
    safe metadata no-op when it carries the SAME id set as the committed
    tombstone — a caller reusing an explicit batch_id with a DIFFERENT
    id set would otherwise get ``skipped: True`` while those deletions
    silently never happen (an erasure-path silent no-op, the worst kind).
    Compares the request against the on-disk tombstone table with two
    anti-join counts (both frames are erasure-request-sized, never
    corpus-sized) and raises on any asymmetry. A committed tombstone
    whose table is missing on disk raises too — that index needs repair,
    not a shrug."""
    from ..fsutil import exists as _fs_exists

    if not _fs_exists(spark, tdir):
        raise IOError(
            f"tombstone batch {batch_id!r} is committed but its id table "
            f"{tdir} is missing on disk — the skip path cannot verify the "
            "request matches; repair the index before re-deleting"
        )
    req = ids.select(F.col(id_col)).distinct()
    disk = spark.read.parquet(tdir).select(F.col(id_col)).distinct()
    missing = req.join(disk, id_col, "left_anti").count()
    extra = disk.join(req, id_col, "left_anti").count()
    if missing or extra:
        raise ValueError(
            f"delete batch_id {batch_id!r} is already committed with a "
            f"DIFFERENT id set ({missing} requested ids not in the "
            f"committed tombstone, {extra} committed ids not in this "
            "request) — refusing the silent skip. Re-issue the new ids "
            "under a fresh batch_id (or omit batch_id for an auto id)"
        )


def _batch_dirs_present(spark, path: str) -> set[str]:
    """Batch ids that have at least one partition directory on disk under
    ``postings/`` or ``stats/`` — the physical side of the ledger whose
    logical side is the scalars' committed-``batches`` list."""
    from ..fsutil import list_names

    present: set[str] = set()
    for sub in ("postings", "stats"):
        for b in list_names(spark, f"{path}/{sub}"):
            if b.startswith("bucket="):
                for c in list_names(spark, f"{path}/{sub}/{b}"):
                    if c.startswith("batch="):
                        present.add(c[len("batch="):])
    return present


def _verify_batch_dirs(spark, path: str, batch_id: str) -> None:
    """Fail LOUDLY when an in-flight append's batch directories vanished
    between its file writes and its scalars commit (ADVICE r9 low: a
    concurrent ``bm25_index_repair`` whose ``min_age_seconds`` is shorter
    than the append's write phase — plausible at the 1000× decade, where
    a write can outlast the default 1h gate — reclaims the young
    uncommitted dirs as orphans; committing scalars afterwards would
    reference deleted files and probes would silently score a corpus the
    committed n_docs no longer describes). Metadata-only (one listing
    sweep); raising here leaves the index exactly as the repair left it —
    consistent, minus this batch — so the recovery is a plain re-append."""
    if batch_id not in _batch_dirs_present(spark, path):
        raise IOError(
            f"bm25_index_append: batch={batch_id} directories at {path} were "
            "reclaimed before the scalars commit (concurrent "
            "bm25_index_repair/compact with min_age_seconds shorter than "
            "this append's write phase?) — aborting the commit; re-append "
            "the batch, and size the repair age gate above the worst-case "
            "append duration"
        )


def _batch_dir_mtimes(spark, path: str) -> dict[str, float]:
    """Newest modification time (epoch ms) per batch id across its
    ``batch=`` partition directories — what the age-gated reclaim in
    :func:`bm25_index_repair` compares against. Metadata-only (one
    listing per bucket directory, via the Connect-local-capable
    ``fsutil.list_status``)."""
    from ..fsutil import list_status

    newest: dict[str, float] = {}
    for sub in ("postings", "stats"):
        for b in list_status(spark, f"{path}/{sub}"):
            if not (b["is_dir"] and b["name"].startswith("bucket=")):
                continue
            for c in list_status(spark, f"{path}/{sub}/{b['name']}"):
                if c["is_dir"] and c["name"].startswith("batch="):
                    bid = c["name"][len("batch="):]
                    newest[bid] = max(newest.get(bid, 0.0), c["mtime_ms"])
    return newest


def _tree_max_mtime_ms(spark, path: str) -> float | None:
    """Newest mtime (epoch ms) of any entry under ``path``, recursively;
    None when the tree is absent or empty — the age probe for sweeping
    ``_compact_staging`` leftovers."""
    from ..fsutil import list_status

    best: float | None = None
    stack = [path]
    while stack:
        p = stack.pop()
        for st in list_status(spark, p):
            best = st["mtime_ms"] if best is None else max(best, st["mtime_ms"])
            if st["is_dir"]:
                stack.append(f"{p}/{st['name']}")
    return best


def _purge_batch_dirs(spark, path: str, batch_id: str) -> int:
    """Delete every ``batch=<batch_id>`` partition directory under both
    index components. Metadata-only (one listing + one delete per bucket
    that holds the batch); returns the number of directories removed."""
    from ..fsutil import delete, list_names

    n = 0
    for sub in ("postings", "stats"):
        for b in list_names(spark, f"{path}/{sub}"):
            if b.startswith("bucket=") and delete(
                spark, f"{path}/{sub}/{b}/batch={batch_id}", recursive=True
            ):
                n += 1
    return n


def _drop_retired_entries(spark, path: str, purged: list[str]) -> bool:
    """Remove reclaimed batch ids from the scalars' ``retired`` map (a
    new scalars version). Re-reads the CURRENT scalars each attempt so a
    concurrent appender's batches are never clobbered; gives up quietly
    after a few conflicts — a stale ``retired`` entry is harmless (its
    directories are already gone; the next repair drops it)."""
    for _ in range(3):
        meta = _read_scalars(spark, path)
        retired = dict(meta.get("retired") or {})
        drop = [b for b in purged if b in retired]
        if not drop:
            return True
        for b in drop:
            retired.pop(b)
        new = {k: v for k, v in meta.items() if k not in ("_version", "retired")}
        if retired:
            new["retired"] = retired
        try:
            _commit_scalars(spark, path, new, meta["_version"])
            return True
        except IOError:
            continue  # concurrent appender won the version — retry fresh
    return False


def bm25_index_repair(
    spark,
    path: str,
    min_age_seconds: float = DEFAULT_RECLAIM_MIN_AGE,
    sweep_stale_champions: bool = False,
) -> dict:
    """Reclaim storage of batches that are NOT in the scalars' committed
    ``batches`` list, once they are safely old:

    - **Crashed appends** (on disk, never committed, not in ``retired``):
      reclaimed when their newest directory mtime is older than
      ``min_age_seconds``. The age gate is what makes repair safe to run
      at ANY time — an IN-FLIGHT append's young directories are
      indistinguishable from a crash's, and the gate defers both until
      the append has either committed (no longer an orphan) or died.
    - **Retired batches** (replaced by an in-place
      :func:`bm25_index_compact`, stamped with a retirement time in the
      scalars' ``retired`` map): reclaimed ``min_age_seconds`` after
      retirement, NOT after their (old) file mtimes — a probe that
      planned against the pre-compaction scalars may still be scanning
      them, and the grace period lets it finish. Reclaimed ids are
      dropped from ``retired`` via a fresh scalars version.
    - **Compaction staging leftovers** (``_compact_staging/`` from a
      compactor that crashed before its move phase): swept under the
      same age gate (ADVICE r8 — repair previously left them for the
      next compact call).
    - **Champion sidecars** (VERDICT r9 #7 / ADVICE r9 low — abandoned
      ``_champions/m=*`` trees previously lived forever): UNSTAMPED
      trees (a crashed :func:`bm25_champions_write`/``_refresh`` — no
      probe can ever use them) are swept under the same age gate (young
      unstamped trees are an in-flight rebuild's). STALE-stamped trees
      are swept only with ``sweep_stale_champions=True``, because the
      default posture is that they are REFRESHABLE — an O(new batch)
      :func:`bm25_champions_refresh` beats deleting and rebuilding; pass
      the flag when a sidecar's m value is abandoned for good.

    The age gate has a named sizing rule (ADVICE r9 low):
    ``min_age_seconds`` MUST exceed the worst-case append write phase —
    an append whose file writes outlast the gate can have its young
    uncommitted directories reclaimed mid-flight. The append defends
    itself (it re-verifies its directories immediately before the
    scalars commit and aborts LOUDLY if they were purged — see
    ``_verify_batch_dirs``), so the failure is a retriable append error,
    never silently wrong probes; but sizing the gate right avoids the
    wasted work. At the measured 1000× decade an append's write phase is
    minutes, not hours — the 1h default leaves wide margin; re-derive it
    if batches grow beyond that scale.

    Probes never see any of this data (they filter to committed
    batches), so repair is storage reclamation, not a correctness fix;
    a re-append of the same batch id still purges its own leftovers
    immediately (ownership of the id makes that safe at any age).
    Pass ``min_age_seconds=0`` only when no append, compact, or probe
    can be in flight (e.g. tests, single-writer maintenance windows).

    Returns ``{"purged_batches": [...], "deferred_batches": [...],
    "staging_swept": bool, "champions_swept": [...]}``.
    """
    import time as _time

    from ..fsutil import delete

    meta = _read_scalars(spark, path)
    committed = set(meta.get("batches") or [])
    if not committed:
        raise RuntimeError(
            f"BM25 index at {path} predates batch stamping — rebuild with "
            "bm25_index_write to enable append repair"
        )
    retired = meta.get("retired") or {}
    now = _time.time()
    mtimes = _batch_dir_mtimes(spark, path)
    purged, deferred = [], []
    for b in sorted(set(mtimes) - committed):
        age = now - (retired[b] if b in retired else mtimes[b] / 1000.0)
        if age >= min_age_seconds:
            _purge_batch_dirs(spark, path, b)
            purged.append(b)
        else:
            deferred.append(b)
    staging_swept = False
    staging = f"{path}/_compact_staging"
    stage_mt = _tree_max_mtime_ms(spark, staging)
    if stage_mt is not None and now - stage_mt / 1000.0 >= min_age_seconds:
        staging_swept = delete(spark, staging, recursive=True)
    # champion sidecars: unstamped (or torn-stamped — _read_stamp folds a
    # crash-truncated stamp into the same posture) = unusable, sweep once
    # old enough; stale-stamped = refreshable (sweep only on the flag)
    from ..fsutil import list_names

    champions_swept: list[str] = []
    for name in list_names(spark, f"{path}/_champions"):
        if not name.startswith("m="):
            continue
        root = f"{path}/_champions/{name}"
        stamp = _read_stamp(spark, f"{root}/stamp.json")
        if stamp is None:
            sweep = True  # crashed rebuild/refresh — no probe can use it
        elif sweep_stale_champions:
            sweep = stamp.get("batches") != (meta.get("batches") or [])
        else:
            sweep = False
        if not sweep:
            continue
        tree_mt = _tree_max_mtime_ms(spark, root)
        if tree_mt is not None and now - tree_mt / 1000.0 >= min_age_seconds:
            if delete(spark, root, recursive=True):
                champions_swept.append(name)
    # tombstone doc-id tables (r11 bm25_delete): crashed deletes gate on
    # mtime, compaction-retired ones on the retirement stamp — the ANN
    # twins' sweep on the lexical index
    tombstones_swept: list[str] = []
    committed_t = set(meta.get("tombstones") or [])
    tdirs: dict[str, dict] = {}
    from ..fsutil import list_status as _list_status_fs

    for st in _list_status_fs(spark, f"{path}/_tombstones"):
        if st["is_dir"]:
            tdirs[st["name"]] = st
    for tid in sorted(set(tdirs) - committed_t):
        age = now - (
            retired[tid] if tid in retired else
            (_tree_max_mtime_ms(spark, f"{path}/_tombstones/{tid}")
             or tdirs[tid]["mtime_ms"]) / 1000.0
        )
        if age >= min_age_seconds and delete(
            spark, f"{path}/_tombstones/{tid}", recursive=True
        ):
            tombstones_swept.append(tid)
    # drop stamps for what we just purged AND for retired batches whose
    # directories are already gone (a prior repair purged them but lost
    # the stamp-drop commit to version conflicts) — without the second
    # set a dir-less stamp would survive every future repair
    droppable = [
        b for b in retired
        if b in purged
        or b in tombstones_swept
        or (b not in mtimes and b not in committed and b not in tdirs)
    ]
    if droppable:
        _drop_retired_entries(spark, path, droppable)
    return {
        "purged_batches": purged,
        "deferred_batches": deferred,
        "staging_swept": staging_swept,
        "champions_swept": champions_swept,
        "tombstones_swept": tombstones_swept,
    }


def _tombstone_mass(spark, path: str, meta: dict) -> int:
    """Total DISTINCT tombstoned ids across the manifest's committed
    tombstone batches. A single batch is metadata-only (the manifest's
    ``tombstone_counts`` stamp; every r12+ delete writes one) with a
    footer-stat parquet count as the pre-counts fallback. Multiple
    batches may share ids — repeated ``erase_everywhere`` sweeps with
    overlapping id sets are the normal GDPR cadence — so summing
    per-batch counts would overstate deletion debt and trip
    ``needs_compaction`` / ``*_needs_recompact`` early (ADVICE r12):
    the multi-batch path counts the distinct union instead (one
    aggregate over erasure-sized tables — bounded, and only paid by
    scheduler polls on multiply-deleted indexes, never by probes)."""
    tids = meta.get("tombstones") or []
    if not tids:
        return 0
    counts = meta.get("tombstone_counts") or {}
    if len(tids) == 1:
        t = tids[0]
        if t in counts:
            return int(counts[t])
        return spark.read.parquet(f"{path}/_tombstones/{t}").count()
    df = spark.read.parquet(*[f"{path}/_tombstones/{t}" for t in tids])
    return df.select(df.columns[0]).distinct().count()


def needs_compaction(
    spark,
    path: str,
    max_batches: int = 32,
    max_tombstone_frac: float = 0.25,
) -> bool:
    """Machine-readable compaction trigger (VERDICT r8 #3): True when the
    committed-``batches`` list has reached ``max_batches`` — the point
    where append-segment creep (probe file counts, df segment rows, the
    probe's ``batch IN (...)`` list) is worth resetting — OR (r12) when
    the tombstone mass has reached ``max_tombstone_frac`` of the
    committed corpus. Deletions cost on two axes that both grow with
    tombstone mass: every probe pays the doc-id anti-join against the
    accumulated tombstone tables, and the corpus statistics (df, n_docs,
    avg_len) keep counting the deleted docs until compaction recomputes
    them (the documented Lucene posture — score bias measured vs deleted
    fraction in SCALING.md's delete-drift study, which is where the 0.25
    default comes from). Metadata-only (one scalars read; r12 delete
    manifests carry per-tombstone row counts). Schedulers poll this
    between appends/deletes, or pass ``autocompact_after`` to
    :func:`bm25_index_append` to close the loop in-line. Pass
    ``max_tombstone_frac=None`` to disable the deletion term."""
    meta = _read_scalars(spark, path)
    if len(meta.get("batches") or []) >= max_batches:
        return True
    if max_tombstone_frac is not None and (meta.get("tombstones") or []):
        mass = _tombstone_mass(spark, path, meta)
        frac = mass / max(int(meta.get("n_docs") or 0), 1)
        if frac >= max_tombstone_frac:
            return True
    return False


def bm25_index_append(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_id: str | None = None,
    autocompact_after: int | None = None,
    reclaim_min_age_seconds: float = DEFAULT_RECLAIM_MIN_AGE,
    refresh_champions: bool = False,
) -> dict:
    """Append a new-docs batch to a persisted BM25 index WITHOUT
    re-tokenizing the corpus (VERDICT r6 #5) — the incremental-ingest
    twin of ``minhash_index_write(mode='append')``.

    Mechanics, in commit order:

    1. Any on-disk leftovers of THIS batch id are purged (metadata-only
       directory deletes) — the self-repair that makes a re-run of a
       crashed append safe.
    2. The batch tokenizes once; its postings land as new
       ``batch=<batch_id>`` partition directories under the existing
       ``bucket=`` directories (existing files untouched — probe-side
       bucket pruning is unchanged).
    3. Its per-term document frequencies land as NEW SEGMENT ROWS in
       ``stats/`` (same batch stamping) — df is additive across disjoint
       doc batches, and the probe sums segments per term after pruning
       to the query buckets, so stats stay append-only (no
       read-modify-write of corpus data).
    4. Corpus scalars (n_docs, len_sum — both additive) plus the
       committed-``batches`` list commit as a new version under
       ``_scalars/`` via the snapshot-table pattern (temp write + atomic
       rename): readers see old or new scalars, never torn; racing
       appenders conflict explicitly.

    Delivery semantics (VERDICT r7 #3 — the batch stamp closes the r7
    crash window): the scalars commit is the ONE visibility switch.
    Probes read only batches the current scalars list, so a crash
    anywhere before (4) leaves files that are INVISIBLE to every probe —
    scores stay exactly consistent with the committed corpus, never
    stale. The repair is idempotent re-append of the SAME batch id (purge
    + rewrite + commit; no corpus re-tokenization) or
    :func:`bm25_index_repair` to just reclaim the orphan files; a
    re-append of an already-COMMITTED batch id is a metadata no-op.
    Assumes batch doc ids are disjoint from the indexed corpus (the same
    contract as the MinHash incremental index); df and n_docs additivity
    both rely on it.

    Differential guarantee (tested): build(A) then append(B) returns
    IDENTICAL probe results to build(A ∪ B).

    ``autocompact_after=N`` runs :func:`bm25_index_compact` (in-place,
    age-gated reclaim) right after the commit whenever the committed
    batch count reaches N — the threshold trigger that resets probe-cost
    creep without a separate scheduler (VERDICT r8 #3). Safe relative to
    THIS appender by ordering (the append has committed); other racers
    are covered by the age gate.

    ``refresh_champions=True`` additionally runs
    :func:`bm25_champions_refresh` for every published champion sidecar
    under ``{path}/_champions`` right after the commit — O(new batch)
    per sidecar (VERDICT r9 #1), so one append call keeps the postings,
    the stats, AND the champion sidecars probe-fresh. It runs BEFORE any
    autocompaction on purpose: the incremental merge needs the appended
    batch ids to still be the committed list; compaction then re-stamps
    the (now fresh) sidecars for free.

    Failure posture around the scalars commit (ADVICE r9 lows): the
    batch's directories are re-verified on disk immediately before the
    commit (a concurrent repair with too small an age gate could have
    reclaimed them — committing would publish scalars for purged files,
    so the append aborts LOUDLY instead), and a version-rename conflict
    with a racing committer is retried ONCE from the fresh scalars (the
    batch files are already on disk; only the additive metadata commit
    re-runs). A second consecutive conflict surfaces as IOError.

    Returns {"n_docs_added", "version", "batch_id", "skipped",
    "compacted"} (+ ``compact_obs`` when a compaction ran, ``champions``
    per-m refresh results when ``refresh_champions``).
    """
    import uuid as _uuid

    spark = new_docs.sparkSession
    meta = _read_scalars(spark, path)
    committed = meta.get("batches")
    if committed is None:
        raise RuntimeError(
            f"BM25 index at {path} predates batch stamping (flat layout) — "
            "rebuild with bm25_index_write before appending"
        )
    if batch_id is None:
        # 'b' prefix keeps partition-value type inference at string even
        # for an (astronomically unlikely) all-digit hex draw
        batch_id = "b" + _uuid.uuid4().hex
    _check_batch_id(batch_id)
    if batch_id in committed:
        return {
            "n_docs_added": 0,
            "version": meta["_version"],
            "batch_id": batch_id,
            "skipped": True,
            "compacted": False,
        }
    _purge_batch_dirs(spark, path, batch_id)  # crashed-attempt leftovers
    n_buckets = meta["n_buckets"]
    # tokenize once into the posting store; stats/scalars derive from the
    # WRITTEN batch partition (directory-pruned re-scan) instead of a
    # pinned localCheckpoint — same bounded-memory rule as
    # bm25_index_write (VERDICT r8 #1, second half)
    postings, _ = build_index(new_docs, text_col, id_col, checkpoint=False)
    bucket = F.pmod(F.xxhash64(F.col("term")), F.lit(n_buckets)).alias("bucket")
    batch = F.lit(batch_id).alias("batch")
    # one task per (bucket, size-bounded salt) slice before the dynamic-
    # partition write — same sorter-memory/file-count/probe-parallelism
    # rule as bm25_index_write (VERDICT r8 #1, see _salt_width); the
    # shuffle moves only the BATCH, never the corpus
    k = _salt_width(new_docs, n_buckets)
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(k))
    postings.select("doc_id", "term", "tf", "doc_len", bucket, batch).repartition(
        F.col("bucket"), salt
    ).write.mode("append").partitionBy("bucket", "batch").parquet(
        f"{path}/postings"
    )
    written = spark.read.parquet(f"{path}/postings").filter(
        F.col("batch") == batch_id
    )
    written.groupBy("bucket", "term").agg(F.count(F.lit(1)).alias("df")).select(
        "term", "df", "bucket", F.lit(batch_id).alias("batch")
    ).repartition("bucket").write.mode("append").partitionBy(
        "bucket", "batch"
    ).parquet(f"{path}/stats")
    row = (
        written.select("doc_id", "doc_len")
        .distinct()
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_len").alias("len_sum"),
        )
        .first()
    )
    n_added = int(row["n_docs"] or 0)
    len_added = int(row["len_sum"] or 0)

    def _additive_meta(base: dict) -> dict:
        m = {
            "n_docs": base["n_docs"] + n_added,
            "len_sum": base["len_sum"] + len_added,
            "n_buckets": n_buckets,
            "batches": [*(base.get("batches") or []), batch_id],
        }
        if base.get("retired"):  # carry stamps until repair drops them
            m["retired"] = base["retired"]
        # carry pending deletions (r12 bug fix, found by the delete ×
        # append composition tests): this explicit dict previously DROPPED
        # the tombstone list, so the first append after a bm25_delete
        # silently un-erased every deleted doc (probes mask from the
        # manifest; a manifest without the list masks nothing) while the
        # orphaned tombstone tables sat on disk. Erasure state must
        # survive every additive commit; only the purging compact may
        # clear it.
        if base.get("tombstones"):
            m["tombstones"] = base["tombstones"]
        if base.get("tombstone_counts"):
            m["tombstone_counts"] = base["tombstone_counts"]
        return m

    # the batch's directories must still exist at commit time — a
    # concurrent repair with an undersized age gate may have reclaimed
    # them, and committing scalars for purged files would corrupt every
    # future probe (ADVICE r9 low). A zero-row batch wrote no dirs;
    # nothing to verify (its commit is a pure batch-id registration).
    if n_added > 0:
        _verify_batch_dirs(spark, path, batch_id)
    try:
        version = _commit_scalars(
            spark, path, _additive_meta(meta), parent_version=meta["_version"]
        )
    except IOError:
        # a racing committer (appender or compactor) won the version
        # rename — the batch files are on disk and additive, so retry
        # ONCE from the fresh scalars (ADVICE r9 low). A rival re-append
        # of this same batch id may have committed it already.
        fresh = _read_scalars(spark, path)
        if batch_id in (fresh.get("batches") or []):
            return {
                "n_docs_added": 0,
                "version": fresh["_version"],
                "batch_id": batch_id,
                "skipped": True,
                "compacted": False,
            }
        if n_added > 0:
            _verify_batch_dirs(spark, path, batch_id)
        version = _commit_scalars(
            spark, path, _additive_meta(fresh), parent_version=fresh["_version"]
        )
    out = {
        "n_docs_added": n_added,
        "version": version,
        "batch_id": batch_id,
        "skipped": False,
        "compacted": False,
    }
    if refresh_champions:
        # BEFORE autocompact: the incremental merge identifies the delta
        # by batch id, which compaction would relabel (forcing a full
        # rebuild); compaction re-stamps fresh sidecars afterwards.
        from ..fsutil import list_names

        champs = {}
        for name in list_names(spark, f"{path}/_champions"):
            if name.startswith("m="):
                try:
                    m_val = int(name[len("m="):])
                except ValueError:
                    continue
                champs[m_val] = bm25_champions_refresh(spark, path, m=m_val)
        out["champions"] = champs
    if autocompact_after is not None and len(
        _read_scalars(spark, path).get("batches") or []
    ) >= autocompact_after:
        out["compact_obs"] = bm25_index_compact(
            spark, path, reclaim_min_age_seconds=reclaim_min_age_seconds
        )
        out["compacted"] = True
    return out


def _bm25_tombstones(spark, path: str, meta: dict):
    """Union of committed tombstone doc_id tables (``_tombstones/<tid>``),
    or None when the index has no pending deletions — the ANN twins'
    helper, on the doc axis."""
    tids = meta.get("tombstones") or []
    if not tids:
        return None
    df = spark.read.parquet(*[f"{path}/_tombstones/{t}" for t in tids])
    return df.select("doc_id").distinct()


def bm25_delete(
    spark,
    path: str,
    doc_ids: DataFrame,
    batch_id: str | None = None,
) -> dict:
    """Delete documents from a persisted BM25 index by doc_id — the
    right-to-be-forgotten path on the lexical index, the LUCENE posture
    end to end: deletion is logical first (a committed tombstone batch;
    probes mask the deleted docs' postings with an anti-join), and the
    deleted documents keep influencing the CORPUS STATISTICS — df,
    n_docs, avg_len — until the next :func:`bm25_index_compact`, exactly
    as Lucene's deleted docs stay in segment stats until merge. The
    compact is the physical purge: it drops the tombstoned postings,
    RECOMPUTES df and the corpus scalars from the survivors, and clears
    the tombstone list — from that commit the probe is byte-identical to
    an index built over the surviving corpus (the oracle's theorem).

    Champion-sidecar probes REFUSE while deletions are pending
    (``bm25_search_index(champions_m=...)`` raises): an m-bounded list
    minus masked docs can under-return and the true top-m may have
    shifted — compact first, then rebuild/refresh the sidecar.

    Crash consistency: the shared one-commit machinery (idempotent
    re-delete, crashed-attempt purge+rewrite, one version-race retry).
    Returns {"n_ids", "version", "tombstone_id", "skipped"}."""
    import uuid as _uuid

    from ..fsutil import delete as _fs_delete, exists as _fs_exists

    meta = _read_scalars(spark, path)
    if meta.get("batches") is None:
        raise RuntimeError(
            f"BM25 index at {path} predates batch stamping — rebuild with "
            "bm25_index_write before deleting"
        )
    if batch_id is None:
        batch_id = "t" + _uuid.uuid4().hex
    _check_batch_id(batch_id)
    tdir = f"{path}/_tombstones/{batch_id}"
    if batch_id in (meta.get("tombstones") or []):
        _verify_tombstone_reuse(spark, tdir, doc_ids, "doc_id", batch_id)
        return {
            "n_ids": 0,
            "version": meta["_version"],
            "tombstone_id": batch_id,
            "skipped": True,
        }
    _fs_delete(spark, tdir, recursive=True)
    doc_ids.select("doc_id").distinct().write.mode("overwrite").parquet(tdir)
    n_ids = spark.read.parquet(tdir).count()
    if n_ids > 0 and not _fs_exists(spark, tdir):
        raise IOError(
            f"bm25_delete: tombstone dir {tdir} was reclaimed before the "
            "manifest commit — aborting; re-delete the batch"
        )

    def _meta_with(base: dict) -> dict:
        m = {k: v for k, v in base.items() if k != "_version"}
        m["tombstones"] = [*(base.get("tombstones") or []), batch_id]
        # per-tombstone row counts ride in the manifest so the
        # tombstone_frac scheduler term stays metadata-only (r12)
        m["tombstone_counts"] = {
            **(base.get("tombstone_counts") or {}),
            batch_id: int(n_ids),
        }
        return m

    try:
        version = _commit_scalars(
            spark, path, _meta_with(meta), parent_version=meta["_version"]
        )
    except IOError:
        fresh = _read_scalars(spark, path)
        if batch_id in (fresh.get("tombstones") or []):
            _verify_tombstone_reuse(spark, tdir, doc_ids, "doc_id", batch_id)
            return {
                "n_ids": 0,
                "version": fresh["_version"],
                "tombstone_id": batch_id,
                "skipped": True,
            }
        if n_ids > 0 and not _fs_exists(spark, tdir):
            raise IOError(
                f"bm25_delete: tombstone dir {tdir} was reclaimed before "
                "the manifest retry commit — aborting; re-delete the batch"
            )
        version = _commit_scalars(
            spark, path, _meta_with(fresh), parent_version=fresh["_version"]
        )
    return {
        "n_ids": int(n_ids),
        "version": version,
        "tombstone_id": batch_id,
        "skipped": False,
    }


def bm25_index_compact(
    spark,
    path: str,
    out_path: str | None = None,
    reclaim_min_age_seconds: float = DEFAULT_RECLAIM_MIN_AGE,
) -> dict:
    """Rewrite an appended index in its one-batch form (VERDICT r7 #2 —
    the append path's missing half): per-bucket posting files merge, df
    segments collapse back to ONE row per (bucket, term), and the
    committed-``batches`` list collapses to the single compacted batch.
    Probe results are IDENTICAL pre/post (differential-tested): postings
    rows are per (doc, term) and batches hold disjoint docs, so merging
    never needs arithmetic; stats sums exactly what the probe's per-term
    segment sum computes on the fly.

    Repeated ``bm25_index_append`` grows per-bucket file counts and
    per-term df segments without bound — probe cost creeps with segment
    count until compaction resets it (measured in SCALING.md). Uncommitted
    (crashed-append) batches are EXCLUDED, so compaction doubles as
    repair.

    Two modes:

    - ``out_path=None`` (default) — IN-PLACE, atomic-to-probes via the
      batch visibility switch: the compacted data stages under
      ``_compact_staging/`` as a NEW batch id, its per-bucket directories
      move into the live tree with metadata renames (invisible — the id
      is not committed), then ONE scalars commit flips ``batches`` to
      just the compacted id (a probe reads entirely-old or entirely-new,
      never a mix). The replaced batches are stamped into the scalars'
      ``retired`` map IN THE SAME COMMIT and reclaimed by the age-gated
      :func:`bm25_index_repair` — under the default
      ``reclaim_min_age_seconds`` a probe that planned against the OLD
      scalars keeps its directories on disk for the full grace period,
      and an in-flight append's young uncommitted directories survive
      too, so compaction is safe to run under live probes AND appends
      (an append racing the scalars flip loses the version rename
      EXPLICITLY — ``bm25_index_append`` then retries its metadata
      commit once from the fresh scalars, and a second consecutive
      conflict surfaces as IOError to ITS caller; inside
      ``streaming_bm25_ingest`` that fails the micro-batch, and the
      stream's restart replays it idempotently — never silent). A crash
      before the commit leaves invisible staging/moved dirs (repair
      sweeps them, age-gated); a crash after it leaves retirement-
      stamped orphans — never a torn index. Champion sidecars whose
      stamp matches the pre-compaction committed list are RE-STAMPED to
      the compacted batch in place (compaction rewrites the same (doc,
      term, tf, doc_len) rows under a new batch id, so the sidecar's
      content-level top-m is untouched — an O(1) metadata refresh
      instead of a forced rebuild); already-stale sidecars are left for
      :func:`bm25_champions_refresh` / repair. Pass
      ``reclaim_min_age_seconds=0`` to reclaim immediately when nothing
      else can be in flight.
    - ``out_path=<new root>`` — writes a fresh self-contained index
      (scalars v1) like ``minhash_index_compact``; swap paths at the
      orchestration layer.

    Returns file/segment observability counts (file counts are the
    PROBE-VISIBLE slices — committed batches in, the compacted batch
    out — so deferred-reclaim orphans don't inflate them).
    """
    import uuid as _uuid

    from ..fsutil import delete, list_names, rename

    meta = _read_scalars(spark, path)
    committed = meta.get("batches")
    if committed is None:
        raise RuntimeError(
            f"BM25 index at {path} predates batch stamping (flat layout) — "
            "rebuild with bm25_index_write instead of compacting"
        )

    def _nfiles(p, batches):
        return (
            spark.read.parquet(p)
            .filter(F.col("batch").isin(batches))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("batch").isin(committed)
    )
    stats = spark.read.parquet(f"{path}/stats").filter(
        F.col("batch").isin(committed)
    )
    # pending deletions (bm25_delete): the compact is the PHYSICAL purge —
    # tombstoned docs' postings drop here, and df + corpus scalars are
    # recomputed from the SURVIVORS below, so the compacted index equals
    # a fresh build over the surviving corpus (until now the deleted docs
    # kept influencing the stats, the documented Lucene posture)
    tombstones = meta.get("tombstones") or []
    tomb = _bm25_tombstones(spark, path, meta)
    if tomb is not None:
        postings = postings.join(tomb, "doc_id", "left_anti")
    obs = {
        "posting_files_in": _nfiles(f"{path}/postings", committed),
        "stats_rows_in": stats.count(),
        "batches_in": len(committed),
        "tombstones_in": len(tombstones),
    }

    in_place = out_path is None
    cid = "c" + _uuid.uuid4().hex if in_place else "base"
    target = f"{path}/_compact_staging" if in_place else out_path
    if in_place:
        delete(spark, target, recursive=True)  # crashed-compaction leftovers
    else:
        # a reused out_path must start clean — under a session-global
        # partitionOverwriteMode=dynamic the overwrite below would keep
        # its stale partitions (same hazard as bm25_index_write), and a
        # leftover scalars lineage would conflict with the v1 commit
        for stale in (
            f"{out_path}/postings",
            f"{out_path}/stats",
            f"{out_path}/_scalars",
            f"{out_path}/_scalars.json",
        ):
            delete(spark, stale, recursive=True)
    batch = F.lit(cid).alias("batch")
    # coalesce each bucket to K size-bounded files (K from the committed
    # postings' plan-stat bytes — file-backed, so known): many tiny
    # append files are exactly the creep being reclaimed, but ONE giant
    # file per bucket collapses probe parallelism on big corpora (see
    # _salt_width)
    k = _salt_width(postings, meta["n_buckets"])
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(k))
    postings.select(
        "doc_id", "term", "tf", "doc_len", "bucket", batch
    ).repartition(F.col("bucket"), salt).write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy(
        "bucket", "batch"
    ).parquet(f"{target}/postings")
    if tombstones:
        # df must be RECOMPUTED from surviving postings (one row per
        # (doc, term) → count = df): summing the old batch segments would
        # keep counting deleted docs. Equivalent to the segment sum when
        # nothing was deleted; only taken when something was, to keep the
        # no-deletion compact byte-cheap over the tiny stats tables.
        stats_out = postings.groupBy("bucket", "term").agg(
            F.count(F.lit(1)).alias("df")
        )
    else:
        stats_out = stats.groupBy("bucket", "term").agg(F.sum("df").alias("df"))
    stats_out.select(
        "term", "df", "bucket", batch
    ).repartition("bucket").write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy(
        "bucket", "batch"
    ).parquet(f"{target}/stats")
    if tombstones:
        row = (
            postings.select("doc_id", "doc_len")
            .distinct()
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("doc_len").alias("len_sum"),
            )
            .first()
        )
        scalars_out = {
            "n_docs": int(row["n_docs"] or 0),
            "len_sum": int(row["len_sum"] or 0),
        }
    else:
        scalars_out = {"n_docs": meta["n_docs"], "len_sum": meta["len_sum"]}

    if in_place:
        # metadata moves into the live tree: the staged batch id is not
        # committed, so nothing is visible until the scalars flip below.
        # A False rename is a DROPPED bucket — abort BEFORE the scalars
        # flip (ADVICE r8 medium: committing after a silent False would
        # make the partial compacted batch the only visible data, i.e.
        # permanent loss for the unmoved buckets; aborting leaves the old
        # batches committed and the staged id invisible).
        for sub in ("postings", "stats"):
            for b in list_names(spark, f"{target}/{sub}"):
                if b.startswith("bucket="):
                    src = f"{target}/{sub}/{b}/batch={cid}"
                    dst = f"{path}/{sub}/{b}/batch={cid}"
                    if not rename(spark, src, dst):
                        raise IOError(
                            f"bm25_index_compact: staging move failed for "
                            f"{src} -> {dst}; aborting before the scalars "
                            "flip (old batches remain committed; repair "
                            "will sweep the staged leftovers)"
                        )
        delete(spark, target, recursive=True)
        import time as _time

        now = _time.time()
        retired = dict(meta.get("retired") or {})
        retired.update({b: now for b in committed})
        retired.update({t: now for t in tombstones})  # purged; repair sweeps
        new_version = _commit_scalars(
            spark,
            path,
            {
                **scalars_out,
                "n_buckets": meta["n_buckets"],
                "batches": [cid],
                "retired": retired,
            },
            parent_version=meta["_version"],
        )
        # champion sidecars that were FRESH at flip time (stamp matches
        # the pre-compaction committed list) stay content-exact — the
        # compacted batch holds the identical (doc, term, tf, doc_len)
        # rows — so re-stamping them to [cid] keeps them probe-usable
        # for free (VERDICT r9 #1 wiring: one compact/autocompact call
        # keeps postings AND sidecars fresh). Stale sidecars are left
        # stamped as-is (refresh or repair handles them). The restamp
        # publishes via _write_stamp (ADVICE r10 medium): a concurrent
        # probe sees the old stamp, a brief unstamped window (graceful
        # refusal), or the new stamp — never a torn half-written one.
        from ..fsutil import list_names as _list_names

        restamped = 0
        for name in _list_names(spark, f"{path}/_champions"):
            if not name.startswith("m="):
                continue
            stamp_path = f"{path}/_champions/{name}/stamp.json"
            stamp = _read_stamp(spark, stamp_path)
            if stamp is None:
                continue
            # a deletion-purging compact changes the POSTINGS (drops
            # tombstoned rows, recomputes df) — but a sidecar whose
            # stamp covers exactly the purged tombstone set already
            # holds the live top-m (its lists were selected over masked
            # postings), so its content survives the purge and it
            # restamps to the compacted batch with a clean tombstone
            # set. Sidecars that do NOT cover the purged set are left
            # stale for refresh/repair.
            if stamp.get("batches") == committed and sorted(
                stamp.get("tombstones") or []
            ) == sorted(tombstones):
                stamp["batches"] = [cid]
                stamp["tombstones"] = []
                stamp["scalars_version"] = new_version
                _write_stamp(spark, stamp_path, stamp)
                restamped += 1
        obs["champions_restamped"] = restamped
        # old committed batches are retirement-stamped orphans now; the
        # age-gated repair reclaims the ones past the grace period (all
        # of them when the caller passes 0 in a quiesced window)
        rep = bm25_index_repair(
            spark, path, min_age_seconds=reclaim_min_age_seconds
        )
        obs["purged_batches"] = len(rep["purged_batches"])
        obs["retired_batches"] = len(committed)
        final = path
    else:
        _commit_scalars(
            spark,
            out_path,
            {
                **scalars_out,
                "n_buckets": meta["n_buckets"],
                "batches": [cid],
            },
            parent_version=0,
        )
        final = out_path
    obs["posting_files_out"] = _nfiles(f"{final}/postings", [cid])
    obs["stats_rows_out"] = (
        spark.read.parquet(f"{final}/stats").filter(F.col("batch") == cid).count()
    )
    return obs


def _champions_topm(postings_df: DataFrame, m: int) -> DataFrame:
    """Two-phase skew-safe top-``m`` per term by static impact
    ``tf/doc_len`` (ties → doc_id asc): per-slice windows bound a hot
    term's rows to one pass per input slice, then a global window ranks
    the ≤ m-per-slice survivors — the selection shared by the full
    build, the append merge, and the delete-axis re-top-up (the global
    top-m is a subset of the union of per-slice top-ms)."""
    impact = F.col("tf").cast("double") / F.col("doc_len")
    w_local = Window.partitionBy("term", "__slice").orderBy(
        impact.desc(), F.col("doc_id").asc()
    )
    survivors = (
        postings_df.withColumn("__slice", F.spark_partition_id())
        .withColumn("__r", F.row_number().over(w_local))
        .filter(F.col("__r") <= m)
        .drop("__slice", "__r")
    )
    w_global = Window.partitionBy("term").orderBy(
        impact.desc(), F.col("doc_id").asc()
    )
    return (
        survivors.withColumn("__r", F.row_number().over(w_global))
        .filter(F.col("__r") <= m)
        .select("doc_id", "term", "tf", "doc_len", "bucket")
    )


def bm25_champions_write(spark, path: str, m: int = 1000) -> dict:
    """Impact-ordered champion lists (Manning/Raghavan/Schütze,
    *Introduction to Information Retrieval* §7.1.3) — the scale path for
    COMMON-TERM probes. Directory pruning bounds which bucket dirs a
    probe LISTS, but the matched-candidate volume is linear in corpus
    size for shared-vocabulary terms (measured: 34.8M scored posting
    rows at the 1000× decade — SCALING.md r9). The champion sidecar caps
    it: for each term, the top-``m`` postings by static impact
    ``tf/doc_len`` (ties → doc_id asc) are copied WITH their (tf,
    doc_len) under ``{path}/_champions/m=<m>/``, bucket-partitioned, so
    a champion probe (``bm25_search_index(..., champions_m=m)``) reads
    ONLY the sidecar plus the (tiny) stats/scalars — probe scan volume
    is ≤ m rows per matched term at ANY corpus size.

    Semantics — the standard champion-list approximation, deterministic
    and oracle-mirrored (:func:`bm25_champions_sql`): candidates are
    docs inside at least one matched term's champion list, and a
    candidate's score sums only its champion-ranked term contributions.
    IDENTICAL to the full probe whenever every matched term's df ≤ m
    (tested); below that it is the documented recall trade. Selection is
    cross-engine deterministic: correctly-rounded IEEE division is
    monotone in the exact rational tf/doc_len, so Spark and the SQL
    mirror rank identically, with doc_id breaking equal-impact ties.

    Skew-safe selection: top-m runs in TWO bounded phases — per-slice
    top-m over ``(term, slice)`` windows, then global top-m over the
    ≤ m-per-slice survivors — so a hot term's postings never serialize
    through one window partition (the global top-m is a subset of the
    union of per-slice top-ms).

    Staleness contract: the sidecar stamps the committed-``batches``
    list it derived from, and the champion probe REFUSES an index whose
    batches have since changed (append or compaction) — rebuild the
    sidecar in the same maintenance window. The stamp publishes AFTER
    the parquet write, so a crashed rebuild leaves no stamp (probe
    refuses loudly) and a re-run is an idempotent overwrite.

    r12, the deletion axis: pending ``bm25_delete`` tombstones are
    anti-joined out of the postings BEFORE the top-m selection, and the
    stamp records the tombstone set the sidecar accounts for — the
    champion probe accepts the sidecar while the index's tombstone set
    matches the stamp (the lists are the true top-m over LIVE docs;
    corpus stats stay stale, the same Lucene posture as the full masked
    probe), so a small deletion no longer forces compact-before-
    champions. The purging compact restamps a delete-covered sidecar to
    the compacted batch (its content already equals the live top-m).
    """
    from ..fsutil import delete

    meta = _read_scalars(spark, path)
    committed = meta.get("batches")
    tombstones = sorted(meta.get("tombstones") or [])
    root = f"{path}/_champions/m={int(m)}"
    _sweep_refresh_staging(spark, root)  # dead writers' leftovers (ADVICE r10)
    delete(spark, f"{root}/stamp.json")  # unpublish before the rewrite
    # clean slate for the bucket-partitioned overwrite: under a session-
    # global partitionOverwriteMode=dynamic, buckets the new top-m does
    # not touch would otherwise survive from the previous sidecar (same
    # hazard as bm25_index_write — ADVICE r9 medium)
    delete(spark, f"{root}/data", recursive=True)
    postings = spark.read.parquet(f"{path}/postings")
    if committed:
        postings = postings.filter(F.col("batch").isin(committed))
    tomb = _bm25_tombstones(spark, path, meta)
    if tomb is not None:
        # the top-m must be over LIVE docs: a tombstoned doc left in a
        # champion list would occupy a slot the probe then masks away,
        # under-returning vs the full masked probe
        postings = postings.join(tomb, "doc_id", "left_anti")
    (
        _champions_topm(postings, m)
        .repartition("bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("bucket")
        .parquet(f"{root}/data")
    )
    n = spark.read.parquet(f"{root}/data").count()
    _write_stamp(
        spark,
        f"{root}/stamp.json",
        {
            "m": int(m),
            "batches": committed or [],
            "tombstones": tombstones,
            "scalars_version": meta["_version"],
        },
    )
    return {"m": int(m), "rows": int(n), "version": meta["_version"], "mode": "full"}


def bm25_champions_refresh(spark, path: str, m: int = 1000) -> dict:
    """O(new-batch) maintenance of a champion sidecar after appends
    (VERDICT r9 #1 — previously ANY append invalidated the sidecar and
    the only recovery was a full O(corpus) :func:`bm25_champions_write`,
    45.2s at the 1000× decade).

    The merge is PROVABLY the true top-m: per term, the corpus-wide
    top-m over (old batches ∪ new batches) is a subset of (the old
    sidecar's top-m) ∪ (every new-batch posting) — an old-batch row that
    ranks ≤ m globally ranks ≤ m among old-batch rows alone, so it is
    already in the sidecar, and batches hold disjoint docs so old rows'
    (tf, doc_len) never change. Union → re-rank by the same
    ``tf/doc_len`` impact (doc_id tiebreak) → truncate to m therefore
    reproduces :func:`bm25_champions_write` exactly (asserted row-
    identical in tests). Cost: the old sidecar (≤ m rows/term) plus ONLY
    the new batches' postings partitions (``batch`` is a partition
    column — directory-pruned), flat in corpus size, linear in batch
    size (measured in SCALING.md).

    Modes (in the returned ``mode`` field):

    - ``incremental`` — the stamp's batches are a strict subset of the
      committed list (pure appends since the sidecar was built): the
      O(new batch) merge above. Crash-consistent the same way as the
      full rebuild: the stamp unpublishes first (probes refuse), the
      merged data stages beside the live tree and swaps in with one
      directory rename, and the stamp republishes last — a crash at any
      point leaves an unstamped sidecar that the next refresh rebuilds.
    - ``noop`` — the stamp already matches the committed list.
    - ``rebuild`` — no incremental path exists (missing stamp after a
      crashed rebuild, or a compaction relabelled the batches since the
      stamp): falls back to a full :func:`bm25_champions_write`. Note
      :func:`bm25_index_compact` re-stamps FRESH sidecars itself, so
      this branch only fires when the sidecar was already stale at
      compaction time.
    """
    import uuid as _uuid

    from ..fsutil import delete, rename, write_text

    meta = _read_scalars(spark, path)
    committed = meta.get("batches") or []
    root = f"{path}/_champions/m={int(m)}"
    _sweep_refresh_staging(spark, root)  # dead writers' leftovers (ADVICE r10)
    stamp = _read_stamp(spark, f"{root}/stamp.json")
    if stamp is None:
        out = bm25_champions_write(spark, path, m=m)
        out["mode"] = "rebuild"
        return out
    old_batches = stamp.get("batches") or []
    cur_tombs = sorted(meta.get("tombstones") or [])
    old_tombs = sorted(stamp.get("tombstones") or [])
    if old_batches == committed and old_tombs == cur_tombs:
        return {
            "m": int(m),
            "rows": int(spark.read.parquet(f"{root}/data").count()),
            "version": meta["_version"],
            "mode": "noop",
        }
    if set(old_tombs) - set(cur_tombs):
        # the sidecar accounts for tombstones the manifest no longer
        # lists (a purging compact cleared them while the sidecar missed
        # its restamp window) — no identifiable delta; rebuild masked
        out = bm25_champions_write(spark, path, m=m)
        out["mode"] = "rebuild"
        return out
    if old_batches == committed and old_tombs != cur_tombs:
        return _champions_delete_merge(
            spark, path, m, root, meta, committed, old_tombs, cur_tombs
        )
    if old_batches != committed and old_tombs != cur_tombs:
        # both axes moved since the stamp (appends AND deletions): the
        # pure-append merge and the delete-axis re-top-up each assume the
        # other axis is stationary; composing them in one pass would need
        # per-term case analysis that a full masked rebuild does anyway —
        # the pragmatic composition (pure-append and pure-delete stay
        # O(delta))
        out = bm25_champions_write(spark, path, m=m)
        out["mode"] = "rebuild"
        return out
    if set(old_batches) - set(committed):
        # batches the sidecar derived from are no longer committed (a
        # compaction relabelled them, or a repair after one) — the delta
        # is not identifiable by batch id, so rebuild from the corpus
        out = bm25_champions_write(spark, path, m=m)
        out["mode"] = "rebuild"
        return out
    new_batches = [b for b in committed if b not in set(old_batches)]
    # Stake the staging dir BEFORE unpublishing the stamp (ADVICE r10
    # low): between the stamp delete and the staged write's first file,
    # the root would otherwise look like an old UNSTAMPED orphan whose
    # tree mtime is past the age gate, and a concurrent
    # bm25_index_repair could delete {root}/data out from under the
    # (lazy) merge read. The fresh marker makes the root's newest mtime
    # NOW, so the gate defers it for a full min_age_seconds window.
    tmp = f"{root}/.refresh.{_uuid.uuid4().hex}"
    write_text(spark, f"{tmp}/_INPROGRESS", "")
    # unpublish next: from here to the final stamp write, probes refuse
    # loudly and a crash leaves an unstamped sidecar (next refresh
    # rebuilds) — same protocol as bm25_champions_write
    delete(spark, f"{root}/stamp.json")
    old = spark.read.parquet(f"{root}/data").select(
        "doc_id", "term", "tf", "doc_len", "bucket"
    )
    new = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("batch").isin(new_batches))
        .select("doc_id", "term", "tf", "doc_len", "bucket")
    )
    tomb = _bm25_tombstones(spark, path, meta)
    if tomb is not None:
        # stamp and manifest agree on the tombstone set here (checked
        # above), so the OLD sidecar already excludes them — but a new
        # batch may re-append a tombstoned id (stays masked until the
        # purge, the documented contract); keep it out of the lists too
        new = new.join(tomb, "doc_id", "left_anti")
    merged = old.unionByName(new)
    # same two-phase skew-safe top-m as the full build
    final = _champions_topm(merged, m)
    # the merge READS {root}/data, so it cannot overwrite it in place —
    # stage beside it (into the already-staked marker dir; the overwrite
    # replaces the _INPROGRESS marker with the data, keeping the tree
    # mtime fresh throughout) and swap with one metadata rename
    final.repartition("bucket").write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("bucket").parquet(tmp)
    delete(spark, f"{root}/data", recursive=True)
    if not rename(spark, tmp, f"{root}/data"):
        raise IOError(
            f"bm25_champions_refresh: staged-sidecar swap failed for {tmp} "
            f"-> {root}/data (concurrent rebuild of the same m?) — the "
            "sidecar is unstamped; re-run the refresh (it will rebuild)"
        )
    n = spark.read.parquet(f"{root}/data").count()
    _write_stamp(
        spark,
        f"{root}/stamp.json",
        {
            "m": int(m),
            "batches": committed,
            "tombstones": cur_tombs,
            "scalars_version": meta["_version"],
        },
    )
    return {
        "m": int(m),
        "rows": int(n),
        "version": meta["_version"],
        "mode": "incremental",
        "new_batches": len(new_batches),
    }


def _champions_delete_merge(
    spark,
    path: str,
    m: int,
    root: str,
    meta: dict,
    committed: list[str],
    old_tombs: list[str],
    cur_tombs: list[str],
) -> dict:
    """The delete axis of :func:`bm25_champions_refresh` (VERDICT r11
    #5): merge NEW tombstones into a stamped sidecar without the full
    O(corpus) rebuild, so a small deletion no longer forces
    compact-before-champions.

    Provably the true live top-m, term by term: a term whose champion
    list contains NO newly-tombstoned doc keeps its list unchanged (all
    its rows are live, and a deletion elsewhere can only remove
    competitors BELOW the cutoff — they were never in the list); a term
    whose list DOES lose a row may promote a posting from below the
    cutoff that the sidecar never stored, so exactly those AFFECTED
    terms re-select from their pruned postings (committed batches,
    masked by the FULL current tombstone set). Cost: the sidecar scan
    (≤ m rows/term) + the affected terms' postings — proportional to
    the deletion's blast radius, not the corpus.

    Crash posture: the staged-write + one-rename swap + unpublish/
    republish stamp protocol of the append merge — a crash anywhere
    leaves an unstamped sidecar the next refresh rebuilds."""
    import uuid as _uuid

    from ..fsutil import delete, rename, write_text

    new_tids = [t for t in cur_tombs if t not in set(old_tombs)]
    new_tomb = (
        spark.read.parquet(*[f"{path}/_tombstones/{t}" for t in new_tids])
        .select("doc_id")
        .distinct()
    )
    all_tomb = _bm25_tombstones(spark, path, meta)
    tmp = f"{root}/.refresh.{_uuid.uuid4().hex}"
    write_text(spark, f"{tmp}/_INPROGRESS", "")  # stake before unpublish
    delete(spark, f"{root}/stamp.json")
    old = spark.read.parquet(f"{root}/data").select(
        "doc_id", "term", "tf", "doc_len", "bucket"
    )
    affected = (
        old.join(new_tomb, "doc_id", "left_semi").select("term").distinct()
    )
    keep = old.join(affected, "term", "left_anti")
    recomputed = _champions_topm(
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("batch").isin(committed))
        .select("doc_id", "term", "tf", "doc_len", "bucket")
        .join(affected, "term", "left_semi")
        .join(all_tomb, "doc_id", "left_anti"),
        m,
    )
    # pin the column order (the anti-join moved the term key first):
    # sidecar files must keep one schema across full builds and merges
    final = keep.unionByName(recomputed).select(
        "doc_id", "term", "tf", "doc_len", "bucket"
    )
    final.repartition("bucket").write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("bucket").parquet(tmp)
    delete(spark, f"{root}/data", recursive=True)
    if not rename(spark, tmp, f"{root}/data"):
        raise IOError(
            f"bm25_champions_refresh (delete merge): staged-sidecar swap "
            f"failed for {tmp} -> {root}/data (concurrent rebuild of the "
            "same m?) — the sidecar is unstamped; re-run the refresh"
        )
    n = spark.read.parquet(f"{root}/data").count()
    _write_stamp(
        spark,
        f"{root}/stamp.json",
        {
            "m": int(m),
            "batches": committed,
            "tombstones": cur_tombs,
            "scalars_version": meta["_version"],
        },
    )
    return {
        "m": int(m),
        "rows": int(n),
        "version": meta["_version"],
        "mode": "delete_merge",
        "new_tombstones": len(new_tids),
    }


def champions_stale(spark, path: str) -> bool:
    """True when ANY champion sidecar under ``{path}/_champions`` is not
    probe-usable against the CURRENT committed batches — unstamped
    (crashed rebuild) or stamped for a different batch list (appends or
    an already-stale-at-compaction sidecar). The scheduler-facing twin of
    :func:`needs_compaction` (VERDICT r9 #1): poll both between ingest
    batches, answering staleness with :func:`bm25_champions_refresh`.
    Metadata-only (one scalars read + one stamp read per sidecar); False
    when no sidecars exist. A torn stamp reads as unstamped (stale) —
    the refresh it triggers rebuilds the sidecar."""
    from ..fsutil import list_names

    meta = _read_scalars(spark, path)
    committed = meta.get("batches") or []
    cur_tombs = sorted(meta.get("tombstones") or [])
    for name in list_names(spark, f"{path}/_champions"):
        if not name.startswith("m="):
            continue
        stamp = _read_stamp(spark, f"{path}/_champions/{name}/stamp.json")
        if stamp is None or stamp.get("batches") != committed:
            return True
        # r12 delete axis: a sidecar whose stamped tombstone set trails
        # the manifest's is stale the same way (refresh answers with the
        # O(blast-radius) delete merge)
        if sorted(stamp.get("tombstones") or []) != cur_tombs:
            return True
    return False


def bm25_champions_sql(
    *,
    docs_from: str,
    queries_values: str,
    m: int,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """ANSI/DuckDB mirror of the champion-list probe
    (:func:`bm25_champions_write` + ``bm25_search_index(champions_m=m)``),
    kept beside the implementation so the two recipes cannot drift: the
    same top-m-by-``tf/doc_len`` selection (doc_id tiebreak) restricts
    the scored postings; df/n_docs/avg_len stay corpus-wide."""
    return f"""
        WITH q(query_id, query_text) AS (VALUES {queries_values}),
        qterms AS (
          SELECT DISTINCT query_id, term FROM (
            SELECT query_id,
                   unnest(string_split_regex(lower(trim(query_text)), '\\s+')) AS term
            FROM q
          ) WHERE term <> ''
        ),
        toks AS (
          SELECT doc_id, term FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
            FROM {docs_from}
          ) WHERE term <> ''
        ),
        postings AS (
          SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
        ),
        lens AS (
          SELECT doc_id, sum(tf) AS doc_len FROM postings GROUP BY doc_id
        ),
        stats AS (
          SELECT term, count(*) AS df FROM postings GROUP BY term
        ),
        scalars AS (
          SELECT count(*) AS n_docs, avg(doc_len) AS avg_len FROM lens
        ),
        champions AS (
          SELECT doc_id, term, tf FROM (
            SELECT p.doc_id, p.term, p.tf,
                   row_number() OVER (
                     PARTITION BY p.term
                     ORDER BY CAST(p.tf AS DOUBLE) / l.doc_len DESC, p.doc_id
                   ) AS r
            FROM postings p JOIN lens l USING (doc_id)
          ) WHERE r <= {int(m)}
        ),
        scored AS (
          SELECT qt.query_id, p.doc_id,
                 floor(sum(
                   ln(1.0 + (s.n_docs - st.df + 0.5) / (st.df + 0.5))
                   * (p.tf * {k1 + 1.0!r})
                   / (p.tf + {k1!r} * ({1.0 - b!r} + {b!r} * l.doc_len / s.avg_len))
                 ) * 1e6 + 0.5) / 1e6 AS score
          FROM champions p
          JOIN qterms qt USING (term)
          JOIN stats st USING (term)
          JOIN lens l USING (doc_id)
          CROSS JOIN scalars s
          GROUP BY qt.query_id, p.doc_id
        )
        SELECT query_id, doc_id, score, rank FROM (
          SELECT query_id, doc_id, score,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, doc_id) AS rank
          FROM scored
        ) WHERE rank <= {k}
    """


def bm25_search_index(
    spark,
    path: str,
    queries: DataFrame,
    *,
    query_id: str = "query_id",
    query_text: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    champions_m: int | None = None,
) -> DataFrame:
    """Top-``k`` per query against a :func:`bm25_index_write` index.

    Identical scores/ranks to ``bm25_topk`` on the same corpus (asserted
    in tests): same idf/tf formula, same floor-to-6dp-before-ranking, same
    (score desc, doc_id) tiebreak. The probe's cost profile is what
    changes: query terms and their xxhash64 buckets are computed from the
    (tiny, driver-collectable) query set, and BOTH index reads carry
    ``bucket IN (...)`` filters that prune at the PARTITION level — the
    scan touches |query-term buckets| directories out of ``n_buckets``,
    independent of corpus size (plan-asserted in tests). Everything the
    posting stream joins against is a broadcast; the only shuffle is the
    (query, doc) partial-score sum, bounded by matched postings.
    """
    meta = _read_scalars(spark, path)
    n_docs, avg_len = meta["n_docs"], meta["len_sum"] / meta["n_docs"]
    n_buckets = meta["n_buckets"]
    # committed-batch visibility (VERDICT r7 #3): only batches the current
    # scalars list are scored, so a crashed append's half-landed files are
    # invisible and scores always match the committed n_docs/avg_len.
    # `batch` is a partition column — the isin prunes at directory level,
    # same as bucket. None = legacy flat layout (no batch dirs to filter).
    committed = meta.get("batches")

    def _vis(df):
        return df.filter(F.col("batch").isin(committed)) if committed else df

    qterms = (
        queries.select(
            F.col(query_id).alias("query_id"),
            F.explode(F.array_distinct(_tokens(F.col(query_text)))).alias("term"),
        )
        .filter(F.col("term") != "")
        .withColumn("bucket", F.pmod(F.xxhash64(F.col("term")), F.lit(n_buckets)))
    )
    buckets = sorted({r["bucket"] for r in qterms.select("bucket").distinct().collect()})
    if not buckets:
        # Empty-result schema must match the normal path's exactly
        # (ADVICE r6 low: a hardcoded 'doc_id long' diverges on string/int
        # corpora and breaks unions/joins downstream): doc_id's type comes
        # from the index's postings schema (footer-only read), query_id's
        # from the caller's query frame.
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("query_id", queries.schema[query_id].dataType),
                T.StructField(
                    "doc_id",
                    spark.read.parquet(f"{path}/postings").schema["doc_id"].dataType,
                ),
                T.StructField("score", T.DoubleType()),
                # row_number() is non-nullable on the normal path
                T.StructField("rank", T.IntegerType(), nullable=False),
            ]
        )
        return local_frame(spark, [], schema)

    # Sum df across append SEGMENTS per term (bm25_index_append writes
    # new stats rows instead of rewriting; df is additive over disjoint
    # batches). Runs over the bucket-pruned slice only — on a never-
    # appended index it's a no-op aggregation over one row per term.
    stats = (
        _vis(spark.read.parquet(f"{path}/stats"))
        .filter(F.col("bucket").isin(buckets))
        .groupBy("term", "bucket")
        .agg(F.sum("df").alias("df"))
    )
    tomb = _bm25_tombstones(spark, path, meta)
    if champions_m is not None:
        # champion-list probe (see bm25_champions_write): scan ONLY the
        # m-bounded sidecar — flat in corpus size; df/n_docs/avg_len stay
        # corpus-wide from stats/scalars. The stamp pins the committed-
        # batches list the sidecar derived from; anything newer refuses.
        root = f"{path}/_champions/m={int(champions_m)}"
        stamp = _read_stamp(spark, f"{root}/stamp.json")
        if stamp is None:
            raise RuntimeError(
                f"no champion sidecar m={champions_m} at {path} (missing "
                "or torn stamp) — run bm25_champions_write/refresh "
                "(spark, path, m) first"
            )
        # r12 (VERDICT r11 #5): deletions no longer refuse outright — a
        # sidecar whose stamped tombstone set MATCHES the manifest's was
        # built/refreshed over live docs (its lists are the true live
        # top-m; corpus stats stay stale, the same Lucene posture as the
        # full masked probe). The refusal stays for the pathological
        # case: tombstones the sidecar does not account for, where an
        # m-bounded list minus masked docs can under-return.
        if sorted(stamp.get("tombstones") or []) != sorted(
            meta.get("tombstones") or []
        ):
            raise RuntimeError(
                f"BM25 index at {path} has pending deletions the champion "
                f"sidecar m={champions_m} does not account for — run "
                "bm25_champions_refresh (O(blast-radius) delete merge) or "
                "bm25_index_compact first; probing an unrefreshed "
                "m-bounded list under a mask can under-return"
            )
        if stamp["batches"] != (committed or []):
            raise RuntimeError(
                f"champion sidecar m={champions_m} at {path} is STALE: the "
                "index's committed batches changed since bm25_champions_write "
                "(append or compaction) — rebuild the sidecar, or probe "
                "without champions_m"
            )
        postings = spark.read.parquet(f"{root}/data").filter(
            F.col("bucket").isin(buckets)
        )
    else:
        postings = _vis(spark.read.parquet(f"{path}/postings")).filter(
            F.col("bucket").isin(buckets)
        )
        if tomb is not None:
            # logical deletes (bm25_delete): deleted docs' postings are
            # masked after the bucket-pruned scan; df/n_docs/avg_len stay
            # the committed (pre-delete) corpus statistics until the next
            # compact recomputes them — the Lucene deleted-docs posture
            postings = postings.join(tomb, "doc_id", "left_anti")
    qstats = stats.join(F.broadcast(qterms), ["term", "bucket"]).select(
        "query_id", "term", "df"
    )
    scored = (
        postings.join(F.broadcast(qstats), "term")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(n_docs) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.lit(avg_len))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("part").alias("raw"))
        .withColumn("score", F.floor(F.col("raw") * 1e6 + F.lit(0.5)) / 1e6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
