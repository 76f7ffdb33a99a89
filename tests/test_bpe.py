"""Distributed BPE (operators.bpe): differential vs a driver-side reference
implementation of Sennrich et al.'s algorithm, merge-fold equivalence, and
encode invariants."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import bpe


# --- driver-side reference (classic Sennrich train loop) -------------------


def scan_merge(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_train(word_counts: dict[str, int], num_merges: int, min_count: int = 1):
    vocab = {w: list(w) for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for w, c in word_counts.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best, n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append(best)
        vocab = {w: scan_merge(s, *best) for w, s in vocab.items()}
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "widest lowest lowest newest low",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")


def py_word_counts(corpus) -> dict[str, int]:
    c: Counter = Counter()
    for t in corpus:
        c.update(t.split())
    return dict(c)


def test_word_counts_matches_python(spark, docs):
    got = {r["word"]: r["count"] for r in bpe.word_counts(docs).collect()}
    assert got == py_word_counts(CORPUS)


def test_train_differential(spark, docs):
    wc = bpe.word_counts(docs)
    got = bpe.bpe_train(wc, num_merges=12, checkpoint_every=3)
    want = ref_train(py_word_counts(CORPUS), 12)
    assert got == want
    # classic corpus: first merges build "newest" fragments ("es" wins: 8 occurrences)
    assert got[0] == ("e", "s")


def test_train_min_count_stops_early(spark, docs):
    wc = bpe.word_counts(docs)
    merges = bpe.bpe_train(wc, num_merges=500, min_count=3)
    ref = ref_train(py_word_counts(CORPUS), 500, min_count=3)
    assert merges == ref
    assert len(merges) < 500


def test_encode_matches_driver_loop(spark, docs):
    wc = bpe.word_counts(docs)
    merges = bpe.bpe_train(wc, num_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    out = bpe.bpe_encode(docs, merges).select("doc_id", "bpe_tokens").collect()
    for row in out:
        text = CORPUS[row["doc_id"]]
        want = [t for w in text.split() for t in bpe.encode_word(w, ranks)]
        assert row["bpe_tokens"] == want
        # lossless: concatenating tokens reconstructs the text sans spaces
        assert "".join(row["bpe_tokens"]) == text.replace(" ", "")


def test_encode_on_testdata(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    wc = bpe.word_counts(docs)
    merges = bpe.bpe_train(wc, num_merges=8, checkpoint_every=4)
    assert len(merges) == 8
    enc = bpe.bpe_encode(docs, merges, out_col="toks")
    rows = enc.select("text", "toks").collect()
    assert rows
    for r in rows:
        assert "".join(r["toks"]) == "".join(str(r["text"]).split())
    # merged tokens actually appear (compression happened)
    assert any(len(t) > 1 for r in rows for t in r["toks"])


def test_vocab():
    merges = [("l", "o"), ("lo", "w"), ("e", "s")]
    assert bpe.bpe_vocab(merges, base=["l", "o", "w", "e", "s"]) == [
        "l", "o", "w", "e", "s", "lo", "low", "es",
    ]


@settings(max_examples=8, deadline=None)
@given(
    words=st.lists(st.text(alphabet="ab", min_size=2, max_size=12), min_size=1, max_size=20),
    a=st.sampled_from(["a", "b", "ab", "ba"]),
    b=st.sampled_from(["a", "b", "ab", "ba"]),
)
def test_merge_fold_equals_scan(spark, words, a, b):
    """The JVM aggregate() fold must equal the classic left-to-right
    non-overlapping scan — including the a == b overlap cases."""
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)], "i long, w string")
    got = {
        r["i"]: r["m"]
        for r in df.select(
            "i", bpe._merge_fold(bpe._chars(F.col("w")), a, b).alias("m")
        ).collect()
    }
    for i, w in enumerate(words):
        assert got[i] == scan_merge(list(w), a, b), (w, a, b)


def test_no_empty_word_from_tab_leading_text(spark):
    """Tab/newline-leading text must not inject a '' word (Java split yields
    a leading empty element; sequence(1,0) is DESCENDING so _chars('')
    would be ['','']) — and training must never learn a ('','') merge."""
    docs = spark.createDataFrame(
        [(0, "\tlow low"), (1, "low\nlow"), (2, " low low ")],
        "doc_id long, text string",
    )
    wc = {r["word"]: r["count"] for r in bpe.word_counts(docs).collect()}
    assert wc == {"low": 6}
    merges = bpe.bpe_train(bpe.word_counts(docs), num_merges=5)
    assert all(a and b for a, b in merges)
    ref = ref_train({"low": 6}, 5)
    assert merges == ref


def test_encode_ascii_whitespace_parity(spark):
    """Encode must split on ASCII whitespace only (Java \\s+ parity): a word
    containing NBSP trained as ONE word and must encode as one."""
    docs = spark.createDataFrame([(0, "foo bar foo bar")], "doc_id long, text string")
    wc = {r["word"]: r["count"] for r in bpe.word_counts(docs).collect()}
    assert wc == {"foo bar": 2}
    merges = bpe.bpe_train(bpe.word_counts(docs), num_merges=6)
    out = bpe.bpe_encode(docs, merges).collect()[0]["bpe_tokens"]
    ranks = {p: i for i, p in enumerate(merges)}
    assert out == 2 * bpe.encode_word("foo bar", ranks)
