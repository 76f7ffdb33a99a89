"""Fuzzy (approximate-string) matching: blocked edit-distance joins.

Entity resolution over dirty catalogs — "Acme Corp" vs "Acme Corp." vs
"ACME corp" — needs a similarity join, and the naive formulation (filter
``levenshtein(a, b) <= d`` over a cross join) is O(n²) rows through a
non-equi condition: Spark plans it as BroadcastNestedLoopJoin and it dies
at any real cardinality.

The scale rewrite here is BLOCKING, the standard entity-resolution move:
derive one or more cheap deterministic block keys per row, equi-join on the
block key (ordinary shuffled hash join), and run the expensive verifier
(``levenshtein``) only inside blocks. Two exact prefilters cut the verifier
calls further:

- length filter: ``levenshtein(a,b) <= d`` implies ``|len(a)-len(b)| <= d``
  (each edit changes length by at most 1) — an integer comparison that
  runs before the O(len²) distance;
- identical strings short-circuit to distance 0 (dedup'd upstream here).

Blocking trades recall for tractability: a pair is found only if it shares
a block key. The default single-pass key (first character of the
normalized string) misses pairs whose edit touches position 0; callers
needing higher recall run multiple passes with different ``block_exprs``
(e.g. first char + last char + a phonetic key) and union the results —
each pass stays an equi-join. This recall contract is explicit and
mirrored exactly by the DuckDB oracle (`ns_fuzzy_match`), so reported
pairs are diff-testable, not "approximately right".

At 100 TB: the block key is a map-side projection (no extra pass); the
self-join shuffles on the block key; hottest-block skew is bounded by
``max_block`` which drops oversized blocks (reported via
``block_skew_stats``-style accounting in the caller) the same way the
MinHash hot-bucket cap does — a block of b rows costs b² verifier calls,
and an unbounded hot block (every name starting with "t") is the
quadratic failure mode.

No counterpart in the reference (its joins are exact-key); this extends
the engine's join family alongside operators.asof and operators.rangejoin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_name(col: Column) -> Column:
    """Canonical matching form: lowercase, collapse every whitespace run to
    one space, then trim. Collapse BEFORE trim — ``trim`` only strips
    spaces, so a leading tab would otherwise survive as a leading space and
    poison both the block key and the length. This exact order is what the
    SQL mirror computes: ``lower(trim(regexp_replace(x, '\\s+', ' ', 'g')))``."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fuzzy_self_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 2,
    *,
    block_expr: Column | None = None,
    max_block: int | None = 10_000,
) -> DataFrame:
    """Pairs of rows whose normalized ``text_col`` values are within
    ``max_dist`` Levenshtein edits, found via single-key blocking.

    Returns ``(id_a, id_b, dist)`` with ``id_a < id_b``; identical
    normalized strings are matched too (dist 0). ``block_expr`` defaults to
    the first character of the normalized string; pass a different
    expression (e.g. ``F.substring(normalize_name(F.col(c)), -1, 1)`` for a
    suffix pass) and union runs for multi-pass recall.

    ``max_block`` drops blocks with more rows than the cap BEFORE the
    self-join (window count on the block key — same partitioning as the
    join, no extra exchange): blocks cost O(rows²) verifier calls, so one
    degenerate block must not own the job. ``None`` disables the cap.
    """
    norm = normalize_name(F.col(text_col))
    blk = block_expr if block_expr is not None else F.substring(norm, 1, 1)
    side = df.select(
        F.col(id_col).alias("__id"),
        norm.alias("__txt"),
        blk.alias("__blk"),
        F.length(norm).alias("__len"),
    )
    if max_block is not None:
        side = side.withColumn(
            "__bn", F.count(F.lit(1)).over(Window.partitionBy("__blk"))
        ).filter(F.col("__bn") <= max_block).drop("__bn")
    a = side.select(
        F.col("__id").alias("id_a"),
        F.col("__txt").alias("txt_a"),
        F.col("__blk").alias("__blk"),
        F.col("__len").alias("len_a"),
    )
    b = side.select(
        F.col("__id").alias("id_b"),
        F.col("__txt").alias("txt_b"),
        F.col("__blk").alias("__blk"),
        F.col("__len").alias("len_b"),
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        # exact prefilter: an edit changes length by <= 1, so a length gap
        # beyond max_dist can never verify — integer compare before O(len²)
        .filter(F.abs(F.col("len_a") - F.col("len_b")) <= max_dist)
        .withColumn("dist", F.levenshtein("txt_a", "txt_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def fuzzy_lookup_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_text: str,
    dim_text: str,
    max_dist: int = 2,
    *,
    fact_id: str | None = None,
    keep_best: bool = True,
) -> DataFrame:
    """Approximate-key enrichment: join ``facts`` to a SMALL dimension on
    fuzzy name equality (normalized Levenshtein <= ``max_dist``).

    The dimension broadcasts (it is small by contract — a reference list,
    a canonical catalog), so the "cross" shape is a broadcast nested-loop
    over a few thousand rows per task, not a shuffle: the standard
    dirty-key → canonical-key repair. With ``keep_best`` each fact row
    keeps only its minimum-distance match (ties broken by the dimension
    name for determinism).

    For dim sides too large to broadcast, use :func:`fuzzy_self_pairs`
    blocking on the union of both sides instead.
    """
    fn = normalize_name(F.col(fact_text))
    dn = normalize_name(F.col(dim_text))
    f = facts.withColumn("__ftxt", fn)
    if fact_id is None and keep_best:
        # Scope the best-match rank to one fact ROW even without a caller
        # key. The synthetic id never influences WHICH match wins (ordering
        # is dist, then dim name), only the partition boundary, so
        # monotonically_increasing_id's retry nondeterminism is harmless.
        fact_id = "__frow"
        f = f.withColumn("__frow", F.monotonically_increasing_id())
    d = F.broadcast(dim.withColumn("__dtxt", dn))
    # Join on the cheap integer length prefilter ONLY, then compute the
    # O(len²) distance once per candidate and filter — putting levenshtein
    # in the join predicate would evaluate it a second time for the dist
    # projection (no CSE across condition and projection).
    joined = (
        f.join(
            d,
            F.abs(F.length("__ftxt") - F.length("__dtxt")) <= max_dist,
            "inner",
        )
        .withColumn("dist", F.levenshtein(F.col("__ftxt"), F.col("__dtxt")))
        .filter(F.col("dist") <= max_dist)
    )
    if keep_best:
        w = Window.partitionBy(fact_id).orderBy(
            F.col("dist").asc(), F.col("__dtxt").asc()
        )
        joined = joined.withColumn("__rk", F.row_number().over(w)).filter(
            F.col("__rk") == 1
        ).drop("__rk")
    return joined.drop("__ftxt", "__dtxt", "__frow")
