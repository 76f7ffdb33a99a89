"""Dense-vector expressions over ``array<float>`` columns — pure JVM-side
higher-order functions (``zip_with`` / ``aggregate``), no UDFs.

Used by ``operators.similarity`` (brute-force and LSH-bucketed ANN) and
``operators.dedup`` (embedding-cosine near-dup). At 100 TB the dot products
run inside whole-stage codegen over Parquet-backed float arrays; Python never
sees a vector.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .scalars import ColumnOrName, _col


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Dot product of two equal-length float arrays."""
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: ColumnOrName) -> Column:
    """L2 norm."""
    return F.sqrt(
        F.aggregate(
            _col(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def l2_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Euclidean distance."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                _col(a),
                _col(b),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def normalize(a: ColumnOrName) -> Column:
    """Unit-normalize a vector (NULL-safe: zero vector stays as-is)."""
    n = norm(a)
    return F.when(
        n > 0, F.transform(_col(a), lambda v: (v.cast("double") / n))
    ).otherwise(F.transform(_col(a), lambda v: v.cast("double")))


def random_hyperplane_signs(a: ColumnOrName, n_planes: int, seed: int = 42) -> Column:
    """SimHash/LSH bit signature: sign of the projection onto ``n_planes``
    pseudo-random hyperplanes, packed as a bigint.

    The "hyperplanes" are deterministic hash-derived ±1 component weights
    (hash(seed, plane, dim_index) parity) so the signature is reproducible
    across runs and engines without materializing a weight matrix — a
    standard trick for cheap LSH at scale.
    """
    vec = _col(a)
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda v, i: v.cast("double")
                * F.when(F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), 2) == 0, 1.0).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def projection_signs(in_dim: int, out_dim: int, seed: str = "jl") -> list[list[int]]:
    """Deterministic Achlioptas ±1 sign matrix (out_dim × in_dim) for
    sparse-sign Johnson-Lindenstrauss projection: sign[j][i] derives from
    md5 parity of '{seed}:{j}:{i}', so ANY engine (Spark expression
    literals, the DuckDB oracle, a numpy reference) regenerates the exact
    same matrix from the three scalars — no weight artifact to ship."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[:8], 16) % 2 == 0 else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_project(a: ColumnOrName, signs: list[list[int]]) -> Column:
    """Sparse-sign JL projection to ``len(signs)`` dims:
    out_j = (1/√out_dim) Σ_i v_i · sign[j][i] → array<double>.

    Pure JVM expression (one zip_with+aggregate fold per output dim, sign
    rows embedded as literals) — the standard dimensionality-reduction
    lever before ANN on a 100 TB embedding corpus: distances are
    preserved within ~ε with out_dim = O(ln n / ε²), and a 64→16 cut is
    4× less shuffle/scan in every downstream similarity pass. The
    ascending-i fold order is bit-reproducible in DuckDB's left-to-right
    term chain, so projections are oracle-exact before any rounding."""
    import math

    vec = _col(a)
    scale = 1.0 / math.sqrt(len(signs))
    comps = []
    for row in signs:
        weights = F.array(*[F.lit(float(s)) for s in row])
        comps.append(
            F.aggregate(
                F.zip_with(vec, weights, lambda x, w: x.cast("double") * w),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            * F.lit(scale)
        )
    return F.array(*comps)


def random_project_sql(vec_expr: str, signs: list[list[int]]) -> list[str]:
    """DuckDB mirror of :func:`random_project` (adjacent so the recipes
    cannot drift): one expression string per output dimension, same
    ascending-i term order and the same 1/√out_dim scale."""
    import math

    scale = 1.0 / math.sqrt(len(signs))
    out = []
    for row in signs:
        terms = " + ".join(
            f"CAST({vec_expr}[{i + 1}] AS DOUBLE) * {float(s)}"
            for i, s in enumerate(row)
        )
        out.append(f"(({terms}) * {scale!r})")
    return out


def quantize_scale(a: ColumnOrName) -> Column:
    """Per-vector int8 quantization scale: max|x| / 127 (symmetric range).
    NULL for empty/all-NULL vectors."""
    mx = F.array_max(F.transform(_col(a), lambda x: F.abs(x.cast("double"))))
    return F.try_divide(F.nullif(mx, F.lit(0.0)), F.lit(127.0))


def quantize_int8(a: ColumnOrName, scale: Column | None = None) -> Column:
    """Symmetric per-vector int8 quantization: round(x / scale) clamped to
    [-127, 127] as array<tinyint> — 4× smaller than float32 at rest, the
    standard storage/IO lever for a 100 TB embedding corpus. Pair with
    ``quantize_scale`` (store one double per vector) for dequantization;
    cosine on dequantized vectors matches full precision to ~1e-2 (tested),
    so candidate retrieval can run on the compressed column and re-rank the
    short list at full precision."""
    s = scale if scale is not None else quantize_scale(a)
    # floor(x + 0.5), not round(): the portable-round convention (see
    # scalars.portable_round) — bit-identical across engines, so the
    # quantizer is oracle-checkable.
    # NULL quantized values (zero/empty vector → NULL scale, or a NULL
    # element) must be handled BEFORE the clamp: least/greatest skip NULL
    # inputs, so greatest(-127, NULL) would be -127 and a zero vector would
    # silently quantize to the maximum-magnitude int8 vector. They map to 0
    # (a zero vector stores as zeros; dequantize(0)*scale == 0).
    def _q(x: Column) -> Column:
        q = F.floor(F.try_divide(x.cast("double"), s) + F.lit(0.5)).cast("double")
        return (
            F.when(q.isNull(), F.lit(0.0))
            .otherwise(F.least(F.lit(127.0), F.greatest(F.lit(-127.0), q)))
            .cast("tinyint")
        )

    return F.transform(_col(a), _q)


def dequantize(q: ColumnOrName, scale: ColumnOrName) -> Column:
    """Inverse of quantize_int8: q * scale → array<double>."""
    s = _col(scale) if isinstance(scale, str) else scale
    return F.transform(_col(q), lambda x: x.cast("double") * s)
