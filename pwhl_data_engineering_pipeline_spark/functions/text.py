"""Text-analysis expressions for large-scale training-data pipelines.

All pure Column builders (JVM-side, codegen-friendly) — the hot path of a
100 TB document sweep must not drop into Python. These extend the reference
surface per BASELINE.json's north star (the reference itself has no text ops
beyond cleanup; scripts/clean_ticket_sales.py:38-41).

Operators built on these live in ``operators.dedup`` and
``plans``-level queries: language ID, quality scoring, token counting,
fingerprinting, shingling for MinHash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .scalars import ColumnOrName, _col, portable_round

# Tiny per-language stopword marker sets for the n-gram language heuristic.
# Deliberately small and deterministic (no external models in-container).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with"],
    "es": ["el", "la", "de", "que", "los", "una"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "les", "des", "est", "une"],
    "zh": ["的", "是", "了", "在", "我", "有"],
}


def tokens(c: ColumnOrName) -> Column:
    """Whitespace tokenization → array<string> (empty array for blank text)."""
    trimmed = F.trim(_col(c).cast("string"))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(c: ColumnOrName) -> Column:
    """Whitespace token count."""
    return F.size(tokens(c)).cast("long")


def bpe_ish_token_count(c: ColumnOrName) -> Column:
    """BPE-ish token estimate: count word-piece-like regex matches
    (letter runs, digit runs, single punctuation). Approximates subword
    tokenizer counts without shipping a vocab."""
    return F.size(
        F.regexp_extract_all(
            _col(c).cast("string"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
        )
    ).cast("long")


def stopword_hits(c: ColumnOrName, lang: str = "en") -> Column:
    """Number of tokens that are stopword markers for ``lang``."""
    markers = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
    return F.size(F.array_intersect(tokens(F.lower(_col(c))), markers)).cast("long")


def lang_score(c: ColumnOrName, lang: str) -> Column:
    """Marker-hit count used by the language-ID heuristic (distinct markers
    present; cheap, set-based, JVM-side)."""
    return stopword_hits(c, lang)


def lang_id(c: ColumnOrName) -> Column:
    """Heuristic language ID: the language whose marker set overlaps the
    token set most; 'und' when nothing matches.

    Built as a single JVM expression: score each candidate language, take the
    argmax via a sorted struct array (score desc, lang asc for determinism).
    """
    scored = F.array(
        *[
            F.struct(lang_score(c, lang).alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(_LANG_MARKERS)
        ]
    )
    best = F.array_sort(
        scored,
        lambda a, b: F.when(a["score"] > b["score"], F.lit(-1))
        .when(a["score"] < b["score"], F.lit(1))
        .when(a["lang"] < b["lang"], F.lit(-1))
        .when(a["lang"] > b["lang"], F.lit(1))
        .otherwise(F.lit(0)),
    )[0]
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(c: ColumnOrName) -> dict[str, Column]:
    """Document quality signals: length, mean word length, punctuation ratio,
    digit ratio, stopword ratio, uppercase ratio. Compose into scores or
    filters downstream."""
    col = _col(c).cast("string")
    n_chars = F.length(col).cast("double")
    n_tokens = token_count(col).cast("double")
    non_alnum = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    digits = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    uppers = F.length(F.regexp_replace(col, r"[^A-Z]", ""))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_token_len": F.try_divide(n_chars - (n_tokens - 1), n_tokens),
        "punct_ratio": F.try_divide(non_alnum.cast("double"), n_chars),
        "digit_ratio": F.try_divide(digits.cast("double"), n_chars),
        "upper_ratio": F.try_divide(uppers.cast("double"), n_chars),
        "stopword_ratio": F.try_divide(stopword_hits(col).cast("double"), n_tokens),
    }


def quality_score(c: ColumnOrName) -> Column:
    """Scalar [0,1] quality score from heuristic signals — higher is
    better-formed prose. Deterministic linear blend; tune weights per-corpus."""
    q = quality_features(c)
    score = (
        F.lit(0.25) * F.least(q["n_tokens"].cast("double") / F.lit(64.0), F.lit(1.0))
        + F.lit(0.25) * F.least(F.coalesce(q["stopword_ratio"], F.lit(0.0)) * 4, F.lit(1.0))
        + F.lit(0.25) * (F.lit(1.0) - F.least(F.coalesce(q["punct_ratio"], F.lit(1.0)) * 4, F.lit(1.0)))
        + F.lit(0.25) * (F.lit(1.0) - F.least(F.coalesce(q["digit_ratio"], F.lit(1.0)) * 4, F.lit(1.0)))
    )
    return portable_round(score, 6)


def dup_ngram_fraction(c: ColumnOrName, n: int = 5) -> Column:
    """Duplicate word-n-gram fraction: 1 − distinct_ngrams / total_ngrams,
    0.0 when the document has fewer than ``n`` tokens.

    The standard repetition signal for corpus filtering (high values flag
    boilerplate / looping generations — cf. the Gopher and RefinedWeb
    repetition rules). Pure JVM array expressions: no explode, no shuffle —
    a per-row projection that survives at any scale."""
    toks = tokens(F.lower(_col(c)))
    total = (F.size(toks) - F.lit(n - 1)).cast("double")
    distinct_n = F.size(word_ngrams(c, n)).cast("double")
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        portable_round(F.lit(1.0) - distinct_n / total, 6)
    )


def char_shingles(c: ColumnOrName, k: int = 5) -> Column:
    """k-character shingle set (distinct) → array<string>. Feed MinHash.

    Expressed with ``sequence`` + ``transform`` + ``substring`` so shingling
    stays JVM-side even for multi-GB partitions.
    """
    col = F.lower(F.regexp_replace(_col(c).cast("string"), r"\s+", " "))
    n = F.length(col)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(col, i, k)))


def word_ngrams(c: ColumnOrName, n: int = 3) -> Column:
    """Word n-gram set → array<string> (distinct), for Jaccard similarity.

    The tokens array is LET-BOUND via ``transform(array(toks), t -> ...)[0]``
    (the binding trick minhash_bands already uses): referencing ``toks``
    directly inside the per-gram lambda would re-evaluate the whole
    trim/lower/split tokenization once per SLICE REFERENCE per gram —
    interpreted HOF lambdas get no common-subexpression lifting, so the
    inlined form retokenizes the document O(grams) times (measured: the
    gram build was the dominant CPU of every n-gram query)."""
    toks = tokens(F.lower(_col(c)))

    def build(t: Column) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(F.size(t) - F.lit(n), F.lit(0)))
        return F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)))
        )

    return F.transform(F.array(toks), build)[0]


REDACTION_PATTERNS = {
    # order matters: emails before bare numbers so the local-part digits
    # don't get partially rewritten first
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
    "number_long": (r"\b\d{6,}\b", "<NUM>"),
}


def redact_pii(c: ColumnOrName) -> Column:
    """Pattern-based PII redaction (emails, phone-like numbers, long digit
    runs) — the standard pre-training scrub pass, pure regexp_replace chain
    so it runs JVM-side at scan speed. Pattern list is deliberately
    conservative and extensible via REDACTION_PATTERNS."""
    col = _col(c).cast("string")
    for pattern, token in REDACTION_PATTERNS.values():
        col = F.regexp_replace(col, pattern, token)
    return col


#: (pattern, replacement) steps of the HTML stripper, in order. Module-level
#: so the DuckDB oracle mirror (html_strip_sql) is generated from the SAME
#: table — the two engines cannot drift. Every pattern is RE2-compatible
#: (DuckDB) as well as java.util.regex-compatible (Spark): (?is) flags and
#: non-greedy repetition are in both; no backreferences or lookaround.
HTML_STRIP_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),   # script bodies
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),     # style bodies
    (r"(?s)<!--.*?-->", " "),                        # comments
    (r"(?i)<(?:br|hr)\s*/?>", "\n"),                 # hard breaks
    (r"(?i)</(?:p|div|li|tr|h[1-6]|blockquote)\s*>", "\n"),  # block ends
    (r"(?s)<[^>]*>", " "),                           # any remaining tag
    # Entity decode. &amp; must resolve LAST or double-escaped entities
    # double-decode ('&amp;lt;' means the literal text '&lt;'), yet the
    # undecoded-entity blanking must not eat '&amp;' first — so &amp; is
    # parked on a \x02 sentinel (cannot occur in text: stripped below if
    # it somehow did), unknown entities are blanked, then the sentinel
    # becomes the literal ampersand. RE2 has no lookahead, hence the
    # sentinel rather than a (?!amp;) guard.
    (r"\x02", " "),                                  # reserve the sentinel
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&apos;", "'"),
    (r"&amp;", "\x02"),
    (r"&[A-Za-z]{2,10};|&#[0-9]{1,7};", " "),        # undecoded entities
    (r"\x02", "&"),
    (r"[ \t\f\x0b]+", " "),                          # collapse spaces
    (r" ?\n ?", "\n"),                               # trim around breaks
    (r"\n{2,}", "\n"),                               # collapse blank lines
    # edge trim INCLUDING newlines (both engines' trim() strips spaces only)
    (r"^\s+|\s+$", ""),
]


def strip_html(c: ColumnOrName) -> Column:
    """Markup → text: drop script/style/comment bodies, convert block-level
    closers to newlines, strip every remaining tag, decode the common
    named entities, blank undecoded ones, and normalize whitespace — the
    text-extraction step of a web-crawl corpus as a pure JVM
    regexp_replace chain (a DOM-aware extractor is an external artifact;
    this is the distributable core that runs at scan speed). Finish with
    ``trim``; the step table is shared verbatim with the SQL mirror."""
    col = _col(c).cast("string")
    for pattern, repl in HTML_STRIP_STEPS:
        col = F.regexp_replace(col, pattern, repl)
    return F.trim(col)


def html_strip_sql(expr: str) -> str:
    """DuckDB mirror of :func:`strip_html`, generated from the SAME step
    table (regexp_replace with the 'g' flag; same order, same patterns).
    Newline replacements go through chr(10) — DuckDB's plain string
    literals do not interpret backslash escapes."""
    out = expr
    for pattern, repl in HTML_STRIP_STEPS:
        p = pattern.replace("'", "''")
        if repl in ("\n", "\x02"):  # control chars: chr(), not a literal
            r = f"chr({ord(repl)})"
        else:
            assert all(ch >= " " for ch in repl), repl
            r = "'" + repl.replace("'", "''") + "'"
        out = f"regexp_replace({out}, '{p}', {r}, 'g')"
    return f"trim({out})"


def chunk_text(
    c: ColumnOrName, chunk_chars: int = 512, overlap: int = 64
) -> Column:
    """Overlapping fixed-width character chunks → array<struct<chunk_idx,
    chunk_text>> — context-window preparation for training pipelines.

    Pure JVM expression (sequence + substring), so chunking a 100 TB corpus
    is a narrow map with no Python in the loop; explode the result to get
    one row per chunk. Stride = chunk_chars - overlap; the final partial
    chunk is kept (standard tokenizer-window behavior).
    """
    col = _col(c).cast("string")
    stride = chunk_chars - overlap
    n = F.length(col)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return F.transform(
        idx,
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.substring(col, i * stride + 1, chunk_chars).alias("chunk_text"),
        ),
    )


def fingerprint(c: ColumnOrName) -> Column:
    """Document fingerprint: xxhash64 of the whitespace/case-normalized text.
    A content-defined rolling-hash analogue that is exact-normalized-dup
    stable; near-dup detection belongs to MinHash/SimHash operators."""
    normed = F.lower(F.regexp_replace(F.trim(_col(c).cast("string")), r"\s+", " "))
    return F.xxhash64(normed)
