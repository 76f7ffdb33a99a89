"""Deterministic corpus sampling: hash splits and weighted slice mixing.

Training-data pipelines need reproducible dataset membership: the same
document must land in the same train/val/test split on every run, on any
cluster size, even as the corpus grows (a doc's assignment may depend only
on the doc itself, never on other rows, row order, or partition layout).
Seeded RNG sampling (``df.sample``) violates all of that — partition-level
RNG state changes whenever the layout does.

Both operators here derive membership from ``md5(seed ':' key)`` truncated
to 32 bits: a pure per-row projection with

- **no shuffle** — the predicate/label is map-side and survives pushdown,
  so a split filter prunes at the scan like any other filter;
- **engine portability** — md5 is bit-identical everywhere, so the DuckDB
  oracle (and any other engine auditing the pipeline) reproduces the exact
  membership, making splits *diff-testable* rather than just "about 80%";
- **stability under growth** — appending documents never reassigns an
  existing one, unlike ntile/row_number schemes.

At 100 TB this is the only shape that works: membership is computed where
the row already is, with zero coordination.

No counterpart in the reference (its pipeline has no ML-split stage); this
is part of the engine's training-data extension alongside operators.dedup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..sources.readers import local_frame

# Denominator for hash bucketing: rates are resolved to integer
# per-ten-thousand thresholds so the boundary comparison is exact integer
# arithmetic (no float rounding can flip a row between engines).
_BUCKETS = 10_000


def _split_factor(f: float) -> tuple[int, int]:
    """Epoch factor → (whole copies, fractional-copy bucket threshold).
    Shared by upsample_epochs and its SQL mirror so the rounding rule
    cannot drift between the two recipes."""
    whole = int(f)
    return whole, int(round((f - whole) * _BUCKETS))


def _hash_bucket(key: Column, seed: str) -> Column:
    """Deterministic bucket in [0, 10000): first 8 hex chars of
    md5('<seed>:<key>') parsed as a 32-bit int, mod 10000. Uniform enough
    for split/sampling purposes and trivially portable (md5 + substring +
    base-16 parse exist in every SQL engine)."""
    digest = F.md5(F.concat(F.lit(seed + ":"), key.cast("string")))
    return (F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint") % _BUCKETS)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Sequence[tuple[str, float]] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    *,
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label.

    ``weights`` is an ordered (label, fraction) sequence summing to ~1.0;
    fractions are resolved to cumulative integer thresholds out of 10000
    (exact boundaries — 0.8 → bucket < 8000). The label is a pure function
    of (seed, row key): stable across runs, engines, partitionings, and
    corpus growth.
    """
    total = sum(w for _, w in weights)
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    bucket = _hash_bucket(F.col(key_col), seed)
    expr = None
    cum = 0
    for label, w in weights:
        cum = min(_BUCKETS, cum + int(round(w * _BUCKETS)))
        cond = bucket < F.lit(cum)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    # Rounding guard: anything past the last cumulative threshold takes the
    # final label so the assignment is total.
    expr = expr.otherwise(F.lit(weights[-1][0]))
    return df.withColumn(out_col, expr)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    slice_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
    seed: str = "mix",
    flag_col: str | None = None,
) -> DataFrame:
    """Deterministic per-slice sampling (corpus mixing).

    Each slice value (e.g. a source/domain column) gets a keep-rate; a row
    is kept iff its hash bucket < rate*10000. With ``flag_col`` set, the
    keep decision is added as a boolean column instead of filtering —
    useful for accounting queries that report kept/total per slice.

    This is the standard "data mixture" knob for training corpora:
    up-weight high-quality sources by keeping all of them, down-sample
    boilerplate-heavy ones, reproducibly — re-running the pipeline (or
    re-auditing it in another engine) selects the identical document set.
    """
    for name, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    bucket = _hash_bucket(F.col(key_col), seed)
    threshold = None
    for name in sorted(rates):
        cond = F.col(slice_col) == F.lit(name)
        t = F.lit(int(round(rates[name] * _BUCKETS)))
        threshold = F.when(cond, t) if threshold is None else threshold.when(cond, t)
    threshold = (
        threshold.otherwise(F.lit(int(round(default_rate * _BUCKETS))))
        if threshold is not None
        else F.lit(int(round(default_rate * _BUCKETS)))
    )
    keep = bucket < threshold
    if flag_col is not None:
        return df.withColumn(flag_col, keep)
    return df.filter(keep)


def es_sample_key(id_col: str, weight_col: str, seed: str = "wsk") -> Column:
    """Efraimidis–Spirakis A-ES selection key for weight-proportional
    sampling WITHOUT replacement (Efraimidis & Spirakis, IPL 2006): each
    row draws u ~ U(0,1] and is ranked by u^(1/w) — the k largest keys are
    a without-replacement sample where inclusion probability tracks weight.
    Ranking by u^(1/w) is equivalent to ranking by ln(u)/w (monotone), so
    the key is computed in log space (u^(1/w) underflows for tiny u/w).

    Determinism & portability: u derives from md5('<seed>:<id>') — 13 hex
    chars = 52 bits, (v+1)/2^52 ∈ (0,1], both EXACT in float64 — so the
    same row draws the same u in any engine. The returned key is floored
    to 9 decimals as exact integer micro-nanos: cross-engine ln() agrees
    far beyond 9dp, so ordering (and the DuckDB oracle) is reproducible,
    while a raw float key could flip near-ties on the last ULP.
    """
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("bigint")
    u = (v.cast("double") + F.lit(1.0)) / F.lit(float(2**52))
    return F.floor(F.log(u) / F.col(weight_col).cast("double") * F.lit(1e9)).cast(
        "bigint"
    )


def es_sample_key_sql(id_expr: str, weight_expr: str, seed: str = "wsk") -> str:
    """ANSI-SQL mirror of :func:`es_sample_key` (adjacent so the recipes
    cannot drift). DuckDB ``ln`` == Spark single-arg ``log`` (natural)."""
    u = (
        f"((('0x' || substr(md5('{seed}:' || CAST({id_expr} AS VARCHAR)), 1, 13))"
        f"::BIGINT + 1) / {float(2**52)!r})"
    )
    return f"CAST(floor(ln({u}) / ({weight_expr}) * 1e9) AS BIGINT)"


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "wsk",
    group_cols: Sequence[str] = (),
    key_out: str | None = None,
) -> DataFrame:
    """Exactly-k weight-proportional sample WITHOUT replacement (A-ES).

    ``weighted_sample`` mixes by per-SLICE rates; this picks an exact-size
    sample where each ROW's chance tracks its own weight (quality score,
    token count, dedup-cluster size...) — the standard primitive for
    "select N documents, preferring high-quality ones, reproducibly".

    Scale shape: the key is a pure per-row projection (map-side, zero
    coordination); global selection is ``orderBy(key desc).limit(k)`` —
    Spark's TakeOrderedAndProject, a per-partition top-k followed by a
    k-row merge on the driver, NEVER a full sort shuffle (plan-asserted in
    tests). With ``group_cols``, selection is a window rank per group: one
    shuffle on the group key, state bounded by k per group.

    Rows with weight <= 0 or NULL are excluded (they have zero selection
    probability in the A-ES scheme; a NULL weight silently winning ties
    would be a correctness bug, not a feature). Ties (identical floored
    keys) break by ``id_col`` for rerun stability.
    """
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    key = es_sample_key(id_col, weight_col, seed)
    out_col = key_out or "__es_key"
    cand = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn(out_col, key)
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(
            F.col(out_col).desc(), F.col(id_col)
        )
        cand = (
            cand.withColumn("__es_rn", F.row_number().over(w))
            .filter(F.col("__es_rn") <= k)
            .drop("__es_rn")
        )
    else:
        cand = cand.orderBy(F.col(out_col).desc(), F.col(id_col)).limit(k)
    return cand if key_out else cand.drop(out_col)


def sample_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int,
    *,
    seed: str = "sample",
) -> DataFrame:
    """Exactly ``min(k, group size)`` rows per group, chosen by a
    deterministic pseudo-random order: rows ranked by (md5 hash of
    seed:key, key) within each group, keep rank ≤ k.

    The balanced-subsample knob (k docs per domain/language for evals or
    mixture floors) with reservoir-sampling semantics but none of its
    statefulness: the selection is a pure function of (seed, keys), stable
    under reruns, engines, and partitioning — and SQL-mirrorable, so it is
    driver-oracle-checked. One hash shuffle on ``group_cols``; the window
    keeps per-group state only."""
    order = _hash_bucket(F.col(key_col), seed)
    w = Window.partitionBy(*group_cols).orderBy(order.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def temperature_sample(
    df: DataFrame,
    slice_col: str,
    key_col: str,
    *,
    temperature: float = 2.0,
    seed: str = "temp",
) -> DataFrame:
    """Temperature-flattened corpus mixing: subsample every slice (language,
    source, domain) so kept counts are proportional to ``n_s^(1/T)`` — the
    standard multilingual-training reweighting (T=1 keeps the natural
    distribution, T→∞ equalizes slices) realized by *dropping* rows only:

        k_s = floor(n_s^(1/T) · n_min^(1 - 1/T) + 0.5)

    The smallest slice is kept whole (k_min = n_min) and every larger slice
    is cut toward it, so the output distribution follows the temperature law
    without upsampling/duplication. WHICH rows survive is the deterministic
    md5 rank of :func:`sample_k_per_group` — rerun-, engine-, and
    partition-stable, so the selection is oracle-diff-testable.

    Driver action: per-slice counts are collected (one tiny aggregate —
    #slices rows, metadata-sized by definition) and the k_s targets are
    computed in Python, entering the plan as literals via a broadcast map.
    One data shuffle total: the per-slice rank window.
    """
    if temperature < 1.0:
        raise ValueError(f"temperature must be >= 1.0, got {temperature}")
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(slice_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:
        return df
    n_min = min(counts.values())
    inv_t = 1.0 / temperature
    targets = {
        s: int((n**inv_t) * (n_min ** (1.0 - inv_t)) + 0.5) for s, n in counts.items()
    }
    spark = df.sparkSession
    slice_type = df.schema[slice_col].dataType.simpleString()
    kdf = local_frame(spark, 
        [(s, k) for s, k in targets.items()], f"{slice_col} {slice_type}, __k long"
    )
    order = _hash_bucket(F.col(key_col), seed)
    w = Window.partitionBy(slice_col).orderBy(order.asc(), F.col(key_col).asc())
    ranked = df.withColumn("__rk", F.row_number().over(w))
    # eqNullSafe: a NULL slice is a real slice (groupBy kept it); a plain
    # equi-join would silently drop those rows.
    kdf = F.broadcast(kdf.withColumnRenamed(slice_col, "__slice"))
    return (
        ranked.join(kdf, ranked[slice_col].eqNullSafe(kdf["__slice"]))
        .filter(F.col("__rk") <= F.col("__k"))
        .drop("__rk", "__k", "__slice")
    )


def upsample_epochs(
    df: DataFrame,
    key_col: str,
    slice_col: str,
    factors: dict[str, float],
    *,
    default_factor: float = 1.0,
    seed: str = "epoch",
    copy_col: str = "epoch",
) -> DataFrame:
    """Fractional-epoch repetition — the up-weighting half of corpus mixing
    (temperature_sample/weighted_sample only drop rows). A slice with factor
    2.5 emits every row 2 times plus a deterministic 50% of rows a 3rd time,
    so the slice contributes exactly ~2.5 epochs; factor 0.25 keeps a 25%
    subset once (fractional factors < 1 degrade to weighted_sample
    semantics). Emitted copies carry ``copy_col`` = 0..n-1 so downstream
    shuffling/packing can treat copies as distinct training rows.

    Which rows get the extra (or the surviving) copy is the same
    md5(seed:key) bucket as every sampler here: a pure per-row projection —
    no shuffle, stable under reruns, engines, partition layout, and corpus
    growth. The explode is map-side; output size is Σ n_s·f_s, the number a
    mixture spec already budgets for.
    """
    for name, f in factors.items():
        if f < 0:
            raise ValueError(f"factor for {name!r} must be >= 0, got {f}")
    if default_factor < 0:
        raise ValueError(f"default_factor must be >= 0, got {default_factor}")

    whole_expr, thr_expr = None, None
    for name in sorted(factors):
        cond = F.col(slice_col) == F.lit(name)
        w, t = _split_factor(factors[name])
        whole_expr = (
            F.when(cond, w) if whole_expr is None else whole_expr.when(cond, w)
        )
        thr_expr = F.when(cond, t) if thr_expr is None else thr_expr.when(cond, t)
    dw, dt = _split_factor(default_factor)
    whole_expr = whole_expr.otherwise(dw) if whole_expr is not None else F.lit(dw)
    thr_expr = thr_expr.otherwise(dt) if thr_expr is not None else F.lit(dt)

    bucket = _hash_bucket(F.col(key_col), seed)
    n = (whole_expr + (bucket < thr_expr).cast("int")).cast("long")
    copies = F.when(n > 0, F.sequence(F.lit(0).cast("long"), n - 1)).otherwise(
        F.array().cast("array<long>")
    )
    return df.withColumn(copy_col, F.explode(copies))


def epoch_n_sql(
    key_expr: str,
    slice_expr: str,
    factors: dict[str, float],
    default_factor: float,
    seed: str,
) -> str:
    """ANSI-SQL expression for the per-row copy count of
    :func:`upsample_epochs` (mirror; `unnest(range(0, n))` reproduces the
    copies — range(0,0) is empty, dropping factor-0 rows like the empty
    explode does)."""
    bucket = (
        f"(('0x' || substr(md5('{seed}:' || CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {_BUCKETS})"
    )
    whole_arms = " ".join(
        f"WHEN {slice_expr} = '{name}' THEN {_split_factor(factors[name])[0]}"
        for name in sorted(factors)
    )
    thr_arms = " ".join(
        f"WHEN {slice_expr} = '{name}' THEN {_split_factor(factors[name])[1]}"
        for name in sorted(factors)
    )
    dw, dt = _split_factor(default_factor)
    whole = f"CASE {whole_arms} ELSE {dw} END"
    thr = f"CASE {thr_arms} ELSE {dt} END"
    return f"({whole} + CASE WHEN {bucket} < {thr} THEN 1 ELSE 0 END)"


def temperature_targets_sql(slice_expr: str, temperature: float, from_relation: str) -> str:
    """SQL CTE body computing the same per-slice keep targets as
    :func:`temperature_sample` (kept adjacent so the two formulas cannot
    drift). Yields columns (slice, n_s, k_s). Both engines evaluate
    ``pow`` through the platform's libm on identical doubles, and the
    Python-side mirror uses the same libm — the floor(+0.5) boundary would
    need a half-integer within 1 ulp to diverge."""
    inv_t = 1.0 / temperature
    return f"""
        SELECT {slice_expr} AS s, count(*) AS n_s,
               CAST(floor(pow(count(*), {inv_t!r})
                          * pow((SELECT min(n) FROM (
                                  SELECT count(*) AS n FROM {from_relation} GROUP BY {slice_expr})),
                                {1.0 - inv_t!r}) + 0.5) AS BIGINT) AS k_s
        FROM {from_relation} GROUP BY {slice_expr}
    """


def sample_k_order_sql(key_expr: str, seed: str) -> str:
    """ANSI-SQL ORDER BY operand mirroring sample_k_per_group's hash order
    (kept next to the implementation so the recipes cannot drift)."""
    return (
        f"(('0x' || substr(md5('{seed}:' || CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {_BUCKETS})"
    )


def split_sql(key_expr: str, weights: Sequence[tuple[str, float]], seed: str) -> str:
    """ANSI-SQL CASE expression mirroring hash_split — used by oracle
    queries and kept next to the implementation so the two recipes cannot
    drift apart."""
    bucket = (
        f"(('0x' || substr(md5('{seed}:' || CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {_BUCKETS})"
    )
    arms = []
    cum = 0
    for label, w in weights:
        cum = min(_BUCKETS, cum + int(round(w * _BUCKETS)))
        arms.append(f"WHEN {bucket} < {cum} THEN '{label}'")
    return "CASE " + " ".join(arms) + f" ELSE '{weights[-1][0]}' END"


def keep_sql(
    key_expr: str,
    slice_expr: str,
    rates: dict[str, float],
    default_rate: float,
    seed: str,
) -> str:
    """ANSI-SQL boolean expression mirroring weighted_sample."""
    bucket = (
        f"(('0x' || substr(md5('{seed}:' || CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {_BUCKETS})"
    )
    arms = " ".join(
        f"WHEN {slice_expr} = '{name}' THEN {int(round(rates[name] * _BUCKETS))}"
        for name in sorted(rates)
    )
    thr = f"CASE {arms} ELSE {int(round(default_rate * _BUCKETS))} END"
    return f"({bucket} < {thr})"


def leakage_safe_split(
    df: DataFrame,
    text_col: str,
    key_col: str,
    weights: Sequence[tuple[str, float]] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    *,
    seed: str = "split",
    out_col: str = "split",
    cluster_col: str | None = None,
) -> DataFrame:
    """Train/val/test split that cannot leak exact duplicates across
    splits: the split key is the DUPLICATE-CLUSTER id (md5 of the
    normalized text — every byte-identical-after-normalization copy shares
    it), not the row id, so all copies of a document land in the same
    split. The eval-integrity guard every training pipeline needs and
    per-row hash splits silently lack.

    Near-duplicate-safe variant: pass ``cluster_col`` (a label from
    ``graph.dedup_clusters`` over MinHash/SimHash pairs) and it is used as
    the split key instead — same mechanics, transitive-closure clusters.

    Pure map-side like :func:`hash_split` (the cluster key is a projection
    of the row), same deterministic md5 bucketing, SQL-mirrorable.
    """
    if cluster_col is not None:
        cluster_key = F.col(cluster_col).cast("string")
    else:
        # collapse-before-trim normalization (fuzzy.normalize_name order):
        # trim only strips spaces, so collapsing first is what makes leading
        # tabs normalize away — and what the SQL mirror computes.
        from .fuzzy import normalize_name

        cluster_key = F.md5(normalize_name(F.col(text_col)))
    # Delegate the bucketing/validation to hash_split on a temp key column
    # so the two split semantics can never drift.
    tmp = "__cluster_key"
    return hash_split(
        df.withColumn(tmp, cluster_key), tmp, weights, seed=seed, out_col=out_col
    ).drop(tmp)


def select_token_budget(
    df: DataFrame,
    token_col: str,
    quality_col: str,
    key_col: str,
    budget: int,
) -> DataFrame:
    """Greedy quality-first corpus selection under a token budget: rank all
    rows by (quality desc, key asc) and keep the maximal prefix whose
    cumulative token count stays ≤ ``budget`` — "spend the token budget on
    the best documents first", the curation step between scoring and
    training.

    The running sum is a single global-ordering window: correct and
    oracle-mirrorable, but the cumulative pass is inherently sequential —
    ONE task owns the ordering at the boundary. At warehouse scale don't
    run this over 100 TB directly: find the quality CUTOFF on a sample or
    via ``aggregates.exact_percentiles_distributed`` (budget/total_tokens
    quantile), filter map-side, and use this exact form to trim the
    boundary stratum only. (The same exact/approximate split as percentiles
    — both paths shipped, this is the exact one.)
    """
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.col(quality_col).desc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("__cum", F.sum(token_col).over(w))
        .filter(F.col("__cum") <= budget)
        .drop("__cum")
    )
