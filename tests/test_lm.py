"""Unit tests: operators.lm (unigram-LM perplexity-proxy quality scoring)."""

from __future__ import annotations

import math

import pytest

from pwhl_data_engineering_pipeline_spark.operators import lm

DOCS = [
    (1, "the the the cat"),
    (2, "the cat sat"),
    (3, "zqxj vvvv"),          # rare tokens only → worst score
    (4, "the the the the"),    # most common token only → best score
]
# corpus counts: the=8, cat=2, sat=1, zqxj=1, vvvv=1  (total 13)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _expected(top_v):
    counts = {"the": 8, "cat": 2, "sat": 1, "zqxj": 1, "vvvv": 1}
    total = sum(counts.values())
    vocab = sorted(counts, key=lambda t: (-counts[t], t))[:top_v]
    out = {}
    for d, txt in DOCS:
        toks = txt.split()
        lps = [
            math.log(counts[t] / total) if t in vocab else math.log(1 / total)
            for t in toks
        ]
        oov = sum(1 for t in toks if t not in vocab)
        out[d] = (len(toks), oov, sum(lps) / len(lps))
    return out


def test_scores_match_hand_computation(spark, docs_df):
    got = {
        r["doc_id"]: (r["n_tokens"], r["oov_tokens"], r["avg_logprob"])
        for r in lm.unigram_logprob_scores(docs_df, top_v=100).collect()
    }
    want = _expected(100)
    assert set(got) == set(want)
    for d, (n, oov, avg) in want.items():
        assert got[d][0] == n
        assert got[d][1] == oov  # top_v covers everything → zero OOV
        assert got[d][2] == pytest.approx(avg, abs=1e-12)


def test_oov_floor_applies_beyond_top_v(spark, docs_df):
    """top_v=2 keeps {the, cat}; every other token scores at ln(1/total)."""
    got = {
        r["doc_id"]: (r["oov_tokens"], r["avg_logprob"])
        for r in lm.unigram_logprob_scores(docs_df, top_v=2).collect()
    }
    want = _expected(2)
    for d, (_, oov, avg) in want.items():
        assert got[d][0] == oov
        assert got[d][1] == pytest.approx(avg, abs=1e-12)
    assert got[3][0] == 2  # both tokens of doc 3 are OOV


def test_rarest_doc_scores_worst(spark, docs_df):
    rows = lm.unigram_logprob_scores(docs_df, top_v=100).collect()
    by_score = sorted(rows, key=lambda r: r["avg_logprob"])
    assert by_score[0]["doc_id"] == 3
    assert by_score[-1]["doc_id"] == 4


def test_quality_gate_drops_tail(spark, docs_df):
    scores = {
        r["doc_id"]: r["avg_logprob"]
        for r in lm.unigram_logprob_scores(docs_df, top_v=100).collect()
    }
    thr = (scores[3] + scores[2]) / 2  # between worst and second-worst
    kept = lm.lm_quality_gate(
        docs_df, top_v=100, min_avg_logprob=thr
    )
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 4}
    # original columns survive the semi-join
    assert kept.columns == docs_df.columns


def test_blank_docs_emit_no_row(spark):
    df = spark.createDataFrame(
        [(1, "the cat"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    ids = {r["doc_id"] for r in lm.unigram_logprob_scores(df).collect()}
    assert ids == {1}


def test_vocab_tiebreak_deterministic(spark):
    """Equal-count tokens at the top_v boundary resolve by token order, not
    partition luck: with counts {aa:2, bb:2, cc:2} and top_v=2, 'cc' is
    always the one out."""
    df = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa bb cc"), (3, "cc aa bb")][:2]
        + [(3, "aa bb cc")],
        "doc_id long, text string",
    )
    for _ in range(3):
        rows = lm.unigram_logprob_scores(df, top_v=2).collect()
        # every doc has exactly one OOV token (cc) under the deterministic cut
        assert all(r["oov_tokens"] == 1 for r in rows)


def test_bigram_backoff_matches_hand_model(spark):
    """bigram_backoff_scores vs a from-scratch Python Stupid-Backoff model:
    first-token unigram, bigram MLE on hits, α·unigram on misses, OOV
    floor — small caps force every path live."""
    import math

    docs = [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "the dog"),
        (4, "zq zq"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    TOP_V, TOP_B, ALPHA = 3, 2, 0.4

    counts: dict = {}
    big: dict = {}
    for _, t in docs:
        toks = t.split()
        for w in toks:
            counts[w] = counts.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    total = sum(counts.values())
    vocab = sorted(counts, key=lambda w: (-counts[w], w))[:TOP_V]
    bmodel = dict(
        sorted(big.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:TOP_B]
    )

    def uni(w):
        return math.log(counts[w] / total) if w in vocab else math.log(1 / total)

    exp = {}
    for d, t in docs:
        toks = t.split()
        lps = [uni(toks[0])]
        hits = 0
        for a, b in zip(toks, toks[1:]):
            if (a, b) in bmodel:
                lps.append(math.log(bmodel[(a, b)] / counts[a]))
                hits += 1
            else:
                lps.append(math.log(ALPHA) + uni(b))
        exp[d] = (len(toks), hits, sum(lps) / len(lps))

    got = {
        r.doc_id: (r.n_tokens, r.bigram_hits, r.avg_logscore)
        for r in lm.bigram_backoff_scores(
            df, top_v=TOP_V, top_b=TOP_B, alpha=ALPHA
        ).collect()
    }
    assert set(got) == set(exp)
    for d in exp:
        assert got[d][0] == exp[d][0] and got[d][1] == exp[d][1], d
        assert abs(got[d][2] - exp[d][2]) < 1e-9, d
