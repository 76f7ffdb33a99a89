"""Distributed BPE tokenizer training + encoding (Sennrich et al., ACL 2016).

The reference pipeline has no subword tokenizer (its text handling is
pandas cleanup, scripts/clean_ticket_sales.py:38-41); this module is part of
the engine's training-data extensions — the real merge-learning algorithm
behind ``text.bpe_ish_token_count``'s regex estimate.

Scale design (100 TB corpus)
----------------------------
Training touches the corpus exactly once:

1. ``word_counts`` — one pass: whitespace tokenize, explode, groupBy word.
   Map-side partial aggregation collapses repeats before the shuffle, so
   the exchange carries distinct (word, partial-count) pairs per task, and
   the result is the distinct-word frequency table — orders of magnitude
   smaller than the corpus (Heaps' law: |V| ~ O(N^0.5)).
2. ``bpe_train`` — the merge loop runs over that word table ONLY. Each
   iteration: adjacent symbol pairs per word type (JVM ``slice`` +
   ``arrays_zip``, zero Python), count-weighted groupBy-sum, top-1 pair via
   a deterministic TakeOrdered (count desc, pair asc — rerun-stable), then
   a pure JVM ``aggregate()`` fold rewrites every symbol array replacing
   that pair left-to-right, non-overlapping (the classic merge semantics).
   Cost per merge = one shuffle of pair rows from the word table; the
   corpus is never re-read. Lineage is truncated with ``localCheckpoint``
   every ``checkpoint_every`` merges so k merges don't stack k nested
   fold expressions into one unanalyzable plan.
3. ``bpe_encode`` — the learned merges broadcast as a rank dict (tiny:
   ``num_merges`` entries); an Arrow-batched pandas UDF applies the
   classic lowest-rank-first merge loop per DISTINCT word in the batch
   (per-executor word cache), so Python cost scales with distinct words
   seen, not total tokens. This is the standard GPT-2-style encode loop;
   because training merges all occurrences of the chosen pair with the
   same left-to-right scan, encode reproduces the training segmentation
   exactly (differential-tested in tests/test_bpe.py).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..functions import text


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table: one corpus pass, (word, count) out.

    The single corpus-sized shuffle of the whole training procedure; the
    merge loop never re-reads ``df``.
    """
    return (
        df.select(F.explode(text.tokens(text_col)).alias("word"))
        # Java split yields a leading "" element for tab/newline-leading
        # text (trim strips spaces only) — an empty "word" would otherwise
        # reach _chars as ['',''] (sequence(1,0) runs DESCENDING) and train
        # garbage ('','') merges that no real word can ever use.
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _chars(col: Column) -> Column:
    """word → array of single-character symbols (JVM, no Python). Guarded
    for the empty string: sequence(1, 0) is a descending [1, 0] in Spark,
    not an empty array."""
    return F.when(F.length(col) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(col)), lambda i: F.substr(col, i, F.lit(1))
        )
    )


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Replace adjacent (a, b) with a+b, left-to-right non-overlapping.

    A fold reproduces the classic scan exactly: after emitting the merged
    token the accumulator's tail is a+b (≠ a since b is non-empty), so the
    very next symbol cannot re-merge into it — identical to the scan
    skipping past a consumed pair. Overlap case (a == b, "aaaa"): fold
    yields [aa, aa], matching the non-overlapping scan.
    """
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(a)) & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    words: DataFrame,
    num_merges: int = 100,
    word_col: str = "word",
    count_col: str = "count",
    min_count: int = 1,
    checkpoint_every: int = 8,
    return_counts: bool = False,
) -> list[tuple[str, str]] | list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from a (word, count) table.

    Driver loop by design — BPE is inherently sequential in its merge
    decisions; what's distributed is each iteration's pair count (a
    groupBy-sum over the word-type table) and the symbol-array rewrite.
    Only the single best (pair, count) row crosses to the driver per
    merge. Stops early when the best pair's count falls below
    ``min_count`` or no pair remains.

    Determinism: ties broken by (count desc, first asc, second asc), so
    reruns and engine ports pick the same merge sequence.

    ``return_counts=True`` yields (a, b, n) triples — the selected pair's
    count-weighted frequency at selection time. That exposes the whole
    per-iteration aggregation to value-level differential checks (the
    extended oracle mirrors the train loop in SQL), not just the argmax.
    """
    syms_df = words.select(
        _chars(F.col(word_col).cast("string")).alias("syms"),
        F.col(count_col).cast("long").alias("count"),
    ).filter(F.size("syms") >= 2)
    syms_df = syms_df.localCheckpoint(eager=False)

    merges: list = []
    for i in range(num_merges):
        pairs = (
            syms_df.select(
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("a"),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("b"),
                    )
                ).alias("p"),
                F.col("count"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("count").alias("n"))
        )
        top = pairs.orderBy(F.col("n").desc(), F.col("a"), F.col("b")).take(1)
        if not top or top[0]["n"] < min_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b, int(top[0]["n"])) if return_counts else (a, b))
        syms_df = syms_df.select(
            _merge_fold(F.col("syms"), a, b).alias("syms"), "count"
        ).filter(F.size("syms") >= 2)
        if (i + 1) % checkpoint_every == 0:
            syms_df = syms_df.localCheckpoint(eager=False)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic lowest-rank-first BPE encode of one word (driver/test twin
    of the executor-side loop — same function object is shipped in the
    UDF closure, so the differential is definitionally in sync)."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col``: array<string> of BPE tokens for ``text_col``.

    The merge table broadcasts in the UDF closure (num_merges entries —
    bytes, not data). Per-batch distinct-word cache: Python cost scales
    with word types per batch, not token count. Word boundaries use the
    same ASCII-whitespace split as the Spark-side training tokenization
    (Java ``\\s+``) — NOT Python's ``str.split()``, which also breaks on
    Unicode whitespace and would segment differently than training did.
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # Mirror the TRAINING tokenization exactly: Spark splits on Java \s+
    # (ASCII whitespace only), while Python str.split() also breaks on
    # Unicode whitespace (NBSP, U+2028, ...) — a word like 'foo\xa0bar'
    # must stay ONE word at encode time because it trained as one.
    import re

    _ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @F.pandas_udf(ArrayType(StringType()))
    def _encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(t) -> list[str]:
            if t is None:
                return []
            out: list[str] = []
            for w in _ws.split(str(t)):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(enc)

    return df.withColumn(out_col, _encode(F.col(text_col)))


def bpe_vocab(
    merges: Iterable[tuple[str, str]], base: Iterable[str] = ()
) -> list[str]:
    """Vocabulary implied by a merge list: base symbols + one new token per
    merge, in merge order (id assignment for an embedding table)."""
    return list(dict.fromkeys(list(base) + [a + b for a, b in merges]))
