"""DSIR-style importance resampling — select raw-corpus documents that
look like a TARGET domain (Xie et al., "Data Selection for Language Models
via Importance Resampling", NeurIPS 2023).

The published method fits hashed bag-of-ngram models on a small target
corpus and the raw pool, weights every raw document by the importance
ratio, and resamples:

    features(x)  = unigrams ∪ bigrams of x, hashed into B buckets
    log w(x)     = Σ_f c_f(x) · ( ln p_target(f) − ln p_raw(f) )
    selection    = top-k by log w (the deterministic limit of Gumbel
                   resampling as temperature → 0)

Engine mapping — everything is hashed-count arithmetic, no model binary:

- The gram stream is a map-side explode inside the scan (unigrams plus
  ``zip_with`` bigrams, zero Python).
- The feature hash is the repo's portable md5 bucket
  (``conv(substr(md5(gram),1,8),16,10) % B`` — bit-identical in DuckDB,
  so the oracle can mirror it; see operators/sampling.py for the
  provenance of the trick).
- Bucket counts are ONE shuffle each for target and raw, partial-
  aggregated map-side and bounded by B distinct keys regardless of
  corpus size.
- The λ(f) = ln p_t(f) − ln p_r(f) table is ≤ B rows and BROADCASTS;
  scoring is a map-side join of the raw gram stream against it, then a
  single doc_id aggregation. Add-α smoothing keeps λ defined for
  target-unseen buckets.
- Top-k is TakeOrderedAndProject on (rounded score desc, doc_id) — the
  floor-rounding-before-rank pattern from operators/search.py keeps the
  cross-engine order deterministic.

At 100 TB: two bounded-key shuffles + one broadcast + one doc_id
aggregation — the same shape as the unigram-LM scorer (operators/lm.py),
which this module deliberately parallels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens as _text_tokens
from .dedup import pin_handles

#: fixed hash-seed prefix so Spark and the SQL mirror bucket identically
_SEED = "dsir"


def _bucket_arrays(docs: DataFrame, text_col: str, id_col: str, n_buckets: int) -> DataFrame:
    """(doc_id, bs: array<bigint>) — the hashed buckets of the document's
    unigrams ∪ '_'-joined bigrams, ONE array row per document.

    Kept as arrays (not exploded here) deliberately: higher-order
    functions are interpreted, and Catalyst collapses a deterministic
    projection into the Generate input, so exploding the HOF expression
    directly re-evaluates it per OUTPUT row (the 24× pitfall measured in
    SCALING.md). Hashing happens INSIDE the array too, so the md5 runs
    once per gram — not once per downstream consumer — and the persisted
    cache holds 8-byte buckets instead of gram strings. Callers persist
    THIS frame, then explode the materialized arrays inside codegen."""
    toks = _text_tokens(F.lower(F.col(text_col)))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda x, y: F.concat(x, F.lit("_"), y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.filter(F.concat(toks, bigrams), lambda g: g != "")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(grams, lambda g: _bucket(g, n_buckets)).alias("bs"),
    )


def _bucket(gram, n_buckets: int):
    digest = F.md5(F.concat(F.lit(_SEED + ":"), gram))
    return (F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint") % n_buckets)


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document log importance weight of every raw document against
    the target domain → (doc_id, n_grams, score).

    score = Σ over the doc's hashed grams of
            ln((c_t + α) / (T_t + αB)) − ln((c_r + α) / (T_r + αB)).

    Documents with no tokens produce no grams and are absent (they carry
    no evidence either way — filter them with the quality gates first).

    The per-doc BUCKET arrays are persisted (one row per doc, 8-byte
    elements): the stream is consumed twice (bucket counts, then scoring)
    and the gram/hash HOFs must not collapse into the Generate
    (SCALING.md, 24× pitfall). Cache lifetime rides the returned frame
    via dedup.pin_handles — release with ``dedup.unpersist_pins(result)``
    when looping corpora."""
    from ..sources.readers import local_frame

    raw_arr = _bucket_arrays(raw, text_col, id_col, n_buckets).persist()
    tgt_arr = _bucket_arrays(target, text_col, id_col, n_buckets).persist()
    raw_buckets = raw_arr.select("doc_id", F.explode("bs").alias("bucket"))
    tgt_buckets = tgt_arr.select("doc_id", F.explode("bs").alias("bucket"))
    # r14 (guide §5 / VERDICT r13 #5): the λ table is ≤ n_buckets rows by
    # construction and was always driver-collected (that is what the
    # broadcast build does) — but as one broadcast job nesting two more
    # (the two total aggregates), re-run per action. Collect the two
    # bounded count tables once, derive the totals driver-side (exact:
    # integer sums of the same longs), and rebuild λ as a LocalRelation —
    # the log arithmetic stays a JVM expression, so scores are
    # bit-identical to the previous plan and the SQL mirror.
    combo = (
        raw_buckets.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit("r").alias("leg"), "bucket", "cnt")
        .unionByName(
            tgt_buckets.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit("t").alias("leg"), "bucket", "cnt")
        )
        .collect()
    )
    r_rows = [r for r in combo if r["leg"] == "r"]
    t_rows = [r for r in combo if r["leg"] == "t"]
    t_total = sum(r["cnt"] for r in t_rows)
    r_total = sum(r["cnt"] for r in r_rows)
    t_by_bucket = {r["bucket"]: r["cnt"] for r in t_rows}
    # every scored bucket occurs in raw by construction → drive from the
    # raw counts; target-unseen buckets take the α floor
    lam = local_frame(
        raw.sparkSession,
        [(r["bucket"], r["cnt"], t_by_bucket.get(r["bucket"])) for r in r_rows],
        "bucket bigint, c_r long, c_t long",
    ).select(
        "bucket",
        (
            F.log((F.coalesce("c_t", F.lit(0)) + alpha) / (F.lit(t_total) + alpha * n_buckets))
            - F.log((F.col("c_r") + alpha) / (F.lit(r_total) + alpha * n_buckets))
        ).alias("lam"),
    )
    out = (
        raw_buckets.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"), F.sum("lam").alias("score"))
    )
    return pin_handles(out, raw_arr, tgt_arr)


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    round_dp: int = 6,
) -> DataFrame:
    """Top-``k`` raw documents by importance weight (deterministic DSIR).
    Scores are floor-rounded to ``round_dp`` BEFORE ranking and tie-broken
    by doc_id so the cross-engine order is exact."""
    scored = dsir_scores(raw, target, text_col, id_col, n_buckets, alpha)
    scale = float(10 ** round_dp)
    rounded = scored.withColumn(
        "score", F.floor(F.col("score") * scale + F.lit(0.5)) / scale
    )
    return rounded.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)


def dsir_select_sql(
    *,
    raw_from: str,
    target_from: str,
    k: int,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    round_dp: int = 6,
) -> str:
    """DuckDB mirror of :func:`dsir_select` (adjacent so the two recipes
    cannot drift). ``raw_from`` / ``target_from`` are FROM-clause fragments
    (table names or parenthesized subqueries) exposing doc_id + text."""
    scale = f"1e{round_dp}"
    ab = f"{alpha} * {n_buckets}"

    def grams(src: str, name: str) -> str:
        return f"""
        {name}_toks AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS a
          FROM {src} WHERE trim(text) <> ''
        ),
        {name}_grams AS (
          SELECT doc_id, unnest(a) AS gram FROM {name}_toks
          UNION ALL
          SELECT doc_id,
                 unnest(list_transform(range(1, len(a)),
                                       i -> a[i] || '_' || a[i + 1])) AS gram
          FROM {name}_toks WHERE len(a) >= 2
        ),
        {name}_buckets AS (
          SELECT doc_id,
                 ('0x' || substr(md5('{_SEED}:' || gram), 1, 8))::BIGINT
                   % {n_buckets} AS bucket
          FROM {name}_grams WHERE gram <> ''
        )"""

    return f"""
        WITH {grams(raw_from, "r")},
        {grams(target_from, "t")},
        rc AS (SELECT bucket, count(*) AS c_r FROM r_buckets GROUP BY bucket),
        tc AS (SELECT bucket, count(*) AS c_t FROM t_buckets GROUP BY bucket),
        lam AS (
          SELECT rc.bucket,
                 ln((coalesce(tc.c_t, 0) + {alpha})
                    / ((SELECT sum(c_t) FROM tc) + {ab}))
                 - ln((rc.c_r + {alpha})
                      / ((SELECT sum(c_r) FROM rc) + {ab})) AS lam
          FROM rc LEFT JOIN tc USING (bucket)
        )
        SELECT doc_id,
               count(*) AS n_grams,
               floor(sum(lam) * {scale} + 0.5) / {scale} AS score
        FROM r_buckets JOIN lam USING (bucket)
        GROUP BY doc_id
        ORDER BY score DESC, doc_id
        LIMIT {k}
    """
