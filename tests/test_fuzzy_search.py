"""Unit tests: operators.fuzzy (blocked edit-distance joins) and
operators.search (BM25 lexical retrieval)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import fuzzy, search


# ---------------------------------------------------------------- fuzzy ----

NAMES = [
    (1, "Acme Corp"),
    (2, "acme  corp"),        # normalizes identical to 1 → dist 0
    (3, "Acme Corp."),        # one insertion → dist 1
    (4, "Acme Crop"),         # transposition = 2 single-char edits
    (5, "Bcme Corp"),         # first-char edit: blocked away (recall contract)
    (6, "Zenith Ltd"),        # unrelated
    (7, "Zenith Ltd International"),  # same block, length gap > max_dist
]


@pytest.fixture(scope="module")
def names_df(spark):
    return spark.createDataFrame(NAMES, "id long, name string")


def test_fuzzy_self_pairs_finds_expected(names_df):
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy.fuzzy_self_pairs(names_df, "name", "id", max_dist=2).collect()
    }
    assert got[(1, 2)] == 0        # whitespace/case normalize to equality
    assert got[(1, 3)] == 1
    assert got[(2, 3)] == 1
    assert got[(1, 4)] == 2
    # first-char block: (1,5) is a true dist-1 pair but lands in block 'b'
    # vs 'a' — the documented single-pass blocking miss
    assert (1, 5) not in got
    # length prefilter: gap 14 > max_dist, never verified
    assert (6, 7) not in got
    assert all(a < b for a, b in got)


def test_fuzzy_first_char_miss_recovered_by_second_pass(names_df):
    """Multi-pass blocking recovers first-char edits: union a suffix-block
    pass and the (1,5) pair appears."""
    norm = fuzzy.normalize_name(F.col("name"))
    suffix = fuzzy.fuzzy_self_pairs(
        names_df, "name", "id", max_dist=2, block_expr=F.substring(norm, -1, 1)
    )
    prefix = fuzzy.fuzzy_self_pairs(names_df, "name", "id", max_dist=2)
    both = prefix.unionByName(suffix).distinct()
    pairs = {(r["id_a"], r["id_b"]) for r in both.collect()}
    assert (1, 5) in pairs


def test_fuzzy_matches_brute_force_within_block(spark, names_df):
    """Inside a block the result is exact: equals the brute-force O(n²)
    answer restricted to pairs sharing a first character."""
    rows = [(i, " ".join(n.lower().split())) for i, n in NAMES]
    brute = set()
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1:]:
            if ta[0] == tb[0] and _lev(ta, tb) <= 2:
                brute.add((min(ia, ib), max(ia, ib)))
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy.fuzzy_self_pairs(names_df, "name", "id", max_dist=2).collect()
    }
    assert got == brute


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_max_block_drops_degenerate_block(spark):
    """A block over the cap contributes no pairs (the quadratic guard);
    other blocks are untouched."""
    rows = [(i, f"same name {i % 3}") for i in range(50)] + [
        (100, "zeta one"),
        (101, "zeta ones"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    pairs = fuzzy.fuzzy_self_pairs(df, "name", "id", max_dist=2, max_block=10)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(100, 101)}  # the 's' block (50 rows) was dropped


def test_fuzzy_lookup_join_best_match(spark):
    facts = spark.createDataFrame(
        [(1, "ACME corp"), (2, "acme  crop"), (3, "zenith ltd"), (4, "ACME corp")],
        "fid long, vendor string",
    )
    dim = spark.createDataFrame(
        [("Acme Corp", "A1"), ("Zenith Ltd", "Z1"), ("Acme Group", "A2")],
        "canonical string, code string",
    )
    out = fuzzy.fuzzy_lookup_join(
        facts, dim, "vendor", "canonical", max_dist=2, fact_id="fid"
    )
    rows = {r["fid"]: (r["code"], r["dist"]) for r in out.collect()}
    assert rows[1] == ("A1", 0)
    assert rows[2] == ("A1", 2)
    assert rows[3] == ("Z1", 0)
    # duplicate fact names each keep their own row
    assert rows[4] == ("A1", 0)
    assert len(rows) == 4


def test_fuzzy_lookup_join_no_fact_id_keeps_duplicate_rows(spark):
    facts = spark.createDataFrame(
        [("ACME corp",), ("ACME corp",)], "vendor string"
    )
    dim = spark.createDataFrame([("Acme Corp", "A1")], "canonical string, code string")
    out = fuzzy.fuzzy_lookup_join(facts, dim, "vendor", "canonical", max_dist=1)
    assert out.count() == 2


# ---------------------------------------------------------------- BM25 -----

DOCS = [
    (1, "spark shuffle join"),
    (2, "spark spark spark window"),
    (3, "window agg rollup"),
    (4, "totally unrelated words here"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _bm25_reference(docs, query_terms, k1=1.2, b=0.75):
    """Independent driver-side BM25 for the hand-check."""
    toks = {d: t.split() for d, t in docs}
    n = len(toks)
    avg = sum(len(v) for v in toks.values()) / n
    df_ = {}
    for terms in toks.values():
        for t in set(terms):
            df_[t] = df_.get(t, 0) + 1
    scores = {}
    for d, terms in toks.items():
        s = 0.0
        for t in set(query_terms):
            tf = terms.count(t)
            if tf == 0 or t not in df_:
                continue
            idf = math.log(1 + (n - df_[t] + 0.5) / (df_[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(terms) / avg))
        if s > 0:
            scores[d] = math.floor(s * 1e6 + 0.5) / 1e6
    return scores


def test_bm25_matches_reference(spark, docs_df):
    qdf = spark.createDataFrame(
        [("q1", "spark window")], "query_id string, query_text string"
    )
    got = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in search.bm25_topk(docs_df, qdf, k=10).collect()
    }
    want = _bm25_reference(DOCS, ["spark", "window"])
    assert set(got) == set(want)
    for d, expected in want.items():
        assert got[d][0] == pytest.approx(expected, abs=1e-9)
    # ranks follow (score desc, doc_id asc)
    ordered = sorted(got.items(), key=lambda kv: (-kv[1][0], kv[0]))
    assert [rank for _, (_, rank) in ordered] == list(range(1, len(ordered) + 1))


def test_bm25_repeated_query_term_counts_once(spark, docs_df):
    q1 = spark.createDataFrame([("q", "spark")], "query_id string, query_text string")
    q2 = spark.createDataFrame(
        [("q", "spark spark spark")], "query_id string, query_text string"
    )
    s1 = {r["doc_id"]: r["score"] for r in search.bm25_topk(docs_df, q1).collect()}
    s2 = {r["doc_id"]: r["score"] for r in search.bm25_topk(docs_df, q2).collect()}
    assert s1 == s2


def test_bm25_k_truncates(spark, docs_df):
    qdf = spark.createDataFrame(
        [("q", "spark window agg join")], "query_id string, query_text string"
    )
    out = search.bm25_topk(docs_df, qdf, k=2).collect()
    assert len(out) == 2
    assert {r["rank"] for r in out} == {1, 2}


def test_bm25_no_cartesian_in_plan(spark, docs_df):
    """The query side must broadcast onto postings — never a nested-loop
    over the corpus."""
    qdf = spark.createDataFrame(
        [("q", "spark window")], "query_id string, query_text string"
    )
    plan = search.bm25_topk(docs_df, qdf)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # exactly one nested-loop is allowed: the 1-row corpus-scalars
    # crossJoin (the scalar-subquery shape); the term join must be a hash join
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------- duplicate spans ------

from pwhl_data_engineering_pipeline_spark.operators import dedup as _dedup


def test_duplicate_spans_planted(spark):
    """A verbatim 12-token passage shared by two docs is reported in both,
    at the right positions, by the un-winnowed exact index."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    docs = [
        (1, "x1 x2 x3 " + shared + " y1 y2"),
        (2, shared + " z1 z2 z3"),
        (3, "completely different words with no overlap at all here okay"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = _dedup.duplicate_spans(df, n=10, winnow_w=None)
    rows = {(r["doc_id"], r["pos"]) for r in out.collect()}
    # doc1: shared starts at token 3 -> window starts 3,4,5 (12-10+1=3 windows)
    # doc2: shared starts at 0 -> windows 0,1,2
    assert rows == {(1, 3), (1, 4), (1, 5), (2, 0), (2, 1), (2, 2)}
    assert 3 not in {d for d, _ in rows}


def test_duplicate_spans_winnow_guarantee(spark):
    """Winnowing thins the index but any shared span of n + w - 1 tokens
    must still collide on >= 1 selected fingerprint (the winnowing coverage
    guarantee) — checked over several randomized corpora."""
    import random

    n, w = 5, 4
    for seed in range(5):
        rnd = random.Random(seed)
        vocab = [f"t{i}" for i in range(50)]
        span = " ".join(rnd.choices(vocab, k=n + w - 1))  # minimal guaranteed span
        mk = lambda: " ".join(rnd.choices(vocab, k=30))
        docs = [
            (1, mk() + " " + span + " " + mk()),
            (2, mk() + " " + span),
            (3, mk()),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = _dedup.duplicate_spans(df, n=n, winnow_w=w)
        hit_docs = {r["doc_id"] for r in out.collect()}
        assert {1, 2} <= hit_docs, f"seed {seed}: winnow missed the planted span"


def test_winnow_thins_but_covers(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(200)))], "doc_id long, text string"
    )
    wins = _dedup._window_grams(df, "text", "doc_id", 5)
    full = wins.count()
    sel = _dedup.winnow(wins, w=4)
    positions = sorted(r["pos"] for r in sel.collect())
    assert len(positions) < full  # actually thinned
    # coverage: no gap of w consecutive unselected windows
    gaps = [b - a for a, b in zip(positions, positions[1:])]
    assert max(gaps) <= 4


def test_duplicate_spans_no_false_positives(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"a{i}" for i in range(40))),
         (2, " ".join(f"b{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    assert _dedup.duplicate_spans(df, n=10, winnow_w=None).count() == 0


def test_bm25_persisted_index_probe_equals_oneshot(spark, docs_df, tmp_path):
    """bm25_search_index against a bm25_index_write index returns the
    IDENTICAL (query, doc, score, rank) rows as the one-shot bm25_topk —
    same formula, same floor-to-6dp-before-rank, same tiebreak."""
    idx = str(tmp_path / "bm25_idx")
    search.bm25_index_write(docs_df, idx, n_buckets=16)
    qdf = spark.createDataFrame(
        [("q1", "spark shuffle join"), ("q2", "window aggregate state")],
        "query_id string, query_text string",
    )
    oneshot = sorted(map(tuple, search.bm25_topk(docs_df, qdf, k=10).collect()))
    probed = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect()))
    assert probed == oneshot and len(probed) > 0


def test_bm25_index_probe_is_partition_pruned(spark, docs_df, tmp_path):
    """The probe's posting scan must prune at the PARTITION level: the
    bucket IN (...) filter reaches the scan as a PartitionFilter, so only
    |query-term buckets| of the n_buckets directories are read."""
    idx = str(tmp_path / "bm25_idx_prune")
    search.bm25_index_write(docs_df, idx, n_buckets=16)
    qdf = spark.createDataFrame([("q1", "spark")], "query_id string, query_text string")
    out = search.bm25_search_index(spark, idx, qdf, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert filters and any("bucket" in f for f in filters), plan[:2000]


def test_bm25_index_probe_empty_query_terms(spark, docs_df, tmp_path):
    idx = str(tmp_path / "bm25_idx_empty")
    search.bm25_index_write(docs_df, idx, n_buckets=8)
    qdf = spark.createDataFrame([("q1", "   ")], "query_id string, query_text string")
    assert search.bm25_search_index(spark, idx, qdf).count() == 0

def test_bm25_index_empty_probe_schema_matches_normal_path(spark, tmp_path):
    """ADVICE r6 low: the empty-query-terms early return must inherit the
    index's doc_id type (and the caller's query_id type), not hardcode
    'doc_id long' — on a string-id corpus the two paths previously
    returned different schemas, breaking unions of probe results."""
    docs = spark.createDataFrame(
        [("doc-a", "spark window functions and aggregates"),
         ("doc-b", "parquet column pruning at the scan")],
        "doc_id string, text string",
    )
    idx = str(tmp_path / "bm25_idx_strid")
    search.bm25_index_write(docs, idx, n_buckets=8)
    normal = search.bm25_search_index(
        spark,
        idx,
        spark.createDataFrame(
            [("q1", "spark window")], "query_id string, query_text string"
        ),
    )
    empty = search.bm25_search_index(
        spark,
        idx,
        spark.createDataFrame(
            [("q2", "   ")], "query_id string, query_text string"
        ),
    )
    assert empty.schema == normal.schema
    assert empty.count() == 0
    # the union a downstream consumer would build now works
    assert normal.unionByName(empty).count() == normal.count()
    # int query ids follow the caller's type the same way
    empty_int = search.bm25_search_index(
        spark,
        idx,
        spark.createDataFrame([(7, "   ")], "query_id int, query_text string"),
    )
    assert empty_int.schema["query_id"].dataType.simpleString() == "int"

def test_bm25_index_append_differential(spark, docs_df, tmp_path):
    """VERDICT r6 #5: build(A) + append(B) must return IDENTICAL probe
    results to build(A ∪ B) — postings append per bucket, df segments sum
    per term, scalars (n_docs/len_sum) are additive and commit as a new
    atomic version. Also: the probe stays partition-pruned after an
    append, and a second append (three segments) still agrees."""
    rows = docs_df.collect()
    half = len(rows) // 2
    a = spark.createDataFrame(rows[:half], docs_df.schema)
    b = spark.createDataFrame(rows[half:], docs_df.schema)
    qdf = spark.createDataFrame(
        [("q1", "spark shuffle join"), ("q2", "window aggregate state")],
        "query_id string, query_text string",
    )

    full_idx = str(tmp_path / "bm25_full")
    search.bm25_index_write(docs_df, full_idx, n_buckets=16)
    want = sorted(map(tuple, search.bm25_search_index(spark, full_idx, qdf, k=10).collect()))
    assert want  # fixture produces hits

    inc_idx = str(tmp_path / "bm25_inc")
    search.bm25_index_write(a, inc_idx, n_buckets=16)
    stats = search.bm25_index_append(b, inc_idx)
    assert stats["n_docs_added"] == len(rows) - half
    assert stats["version"] == 2
    got = sorted(map(tuple, search.bm25_search_index(spark, inc_idx, qdf, k=10).collect()))
    assert got == want

    # probe cost shape unchanged: partition pruning still reaches the scan
    plan = (
        search.bm25_search_index(spark, inc_idx, qdf, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re as _re
    filters = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert filters and any("bucket" in f for f in filters), plan[:2000]

    # a term present in BOTH halves now has two stats segments; the probe
    # must see the SUMMED df (already proven by `got == want`, but assert
    # the segmentation is real so this test can't pass vacuously)
    seg = (
        spark.read.parquet(f"{inc_idx}/stats")
        .groupBy("term").count().filter(F.col("count") > 1).count()
    )
    assert seg > 0

    # three segments: append in two pieces ≡ one piece
    rows_b = b.collect()
    b1 = spark.createDataFrame(rows_b[:1], docs_df.schema)
    b2 = spark.createDataFrame(rows_b[1:], docs_df.schema)
    inc2 = str(tmp_path / "bm25_inc2")
    search.bm25_index_write(a, inc2, n_buckets=16)
    search.bm25_index_append(b1, inc2)
    stats2 = search.bm25_index_append(b2, inc2)
    assert stats2["version"] == 3
    got2 = sorted(map(tuple, search.bm25_search_index(spark, inc2, qdf, k=10).collect()))
    assert got2 == want


def test_bm25_index_rebuild_clears_scalars_history(spark, docs_df, tmp_path):
    """A full bm25_index_write over an appended index must not leave a
    stale higher scalars version winning over the rebuild's v1."""
    idx = str(tmp_path / "bm25_rebuild")
    rows = docs_df.collect()
    a = spark.createDataFrame(rows[:2], docs_df.schema)
    search.bm25_index_write(a, idx, n_buckets=8)
    search.bm25_index_append(spark.createDataFrame(rows[2:], docs_df.schema), idx)
    # rebuild from scratch over only `a`
    search.bm25_index_write(a, idx, n_buckets=8)
    meta = search._read_scalars(spark, idx)
    assert meta["_version"] == 1
    assert meta["n_docs"] == 2


def test_bm25_append_idempotent_and_crash_repair(spark, docs_df, tmp_path, monkeypatch):
    """VERDICT r7 #3: batch-id-stamped appends. (a) A crash between the
    batch's file writes and its scalars commit leaves the probe EXACTLY
    at the pre-append state (committed-batch filtering — not merely
    'slightly stale' as in r7); (b) re-appending the SAME batch id after
    the crash repairs in place without re-tokenizing the corpus and
    matches the full rebuild; (c) re-appending an already-COMMITTED batch
    id is a metadata no-op; (d) bm25_index_repair reclaims orphan batch
    dirs; (e) a legacy flat index refuses append with a named error."""
    rows = docs_df.collect()
    half = len(rows) // 2
    a = spark.createDataFrame(rows[:half], docs_df.schema)
    b = spark.createDataFrame(rows[half:], docs_df.schema)
    qdf = spark.createDataFrame(
        [("q1", "spark shuffle join"), ("q2", "window aggregate state")],
        "query_id string, query_text string",
    )
    idx = str(tmp_path / "bm25_crash")
    search.bm25_index_write(a, idx, n_buckets=16)
    before = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect()))

    # ---- (a) crash injection: files land, scalars commit dies
    real_commit = search._commit_scalars

    def boom(*args, **kwargs):
        raise RuntimeError("injected crash before scalars commit")

    monkeypatch.setattr(search, "_commit_scalars", boom)
    with pytest.raises(RuntimeError, match="injected"):
        search.bm25_index_append(b, idx, batch_id="bcrash")
    monkeypatch.setattr(search, "_commit_scalars", real_commit)
    # the half-landed batch is INVISIBLE: probe identical to pre-append
    assert sorted(
        map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect())
    ) == before
    assert "bcrash" in search._batch_dirs_present(spark, idx)

    # ---- (b) re-append the SAME batch id: purge + rewrite + commit
    out = search.bm25_index_append(b, idx, batch_id="bcrash")
    assert out["skipped"] is False and out["n_docs_added"] == len(rows) - half
    full_idx = str(tmp_path / "bm25_crash_full")
    search.bm25_index_write(docs_df, full_idx, n_buckets=16)
    want = sorted(map(tuple, search.bm25_search_index(spark, full_idx, qdf, k=10).collect()))
    got = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect()))
    assert got == want
    # no doubled postings from the pre-crash attempt
    p = spark.read.parquet(f"{idx}/postings")
    assert p.count() == p.select("doc_id", "term").distinct().count()

    # ---- (c) committed batch id re-append: no-op
    out2 = search.bm25_index_append(b, idx, batch_id="bcrash")
    assert out2["skipped"] is True and out2["n_docs_added"] == 0
    assert out2["version"] == out["version"]
    assert sorted(
        map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect())
    ) == want

    # ---- (d) repair reclaims a different orphan batch's dirs
    monkeypatch.setattr(search, "_commit_scalars", boom)
    with pytest.raises(RuntimeError, match="injected"):
        search.bm25_index_append(
            spark.createDataFrame(rows[:1], docs_df.schema), idx, batch_id="borphan"
        )
    monkeypatch.setattr(search, "_commit_scalars", real_commit)
    # default age gate DEFERS the young orphan (it could be an in-flight
    # append); min_age_seconds=0 forces reclaim in this quiesced test
    gated = search.bm25_index_repair(spark, idx)
    assert gated["purged_batches"] == [] and gated["deferred_batches"] == ["borphan"]
    assert "borphan" in search._batch_dirs_present(spark, idx)
    forced = search.bm25_index_repair(spark, idx, min_age_seconds=0)
    assert forced["purged_batches"] == ["borphan"]
    assert "borphan" not in search._batch_dirs_present(spark, idx)
    assert sorted(
        map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect())
    ) == want

    # ---- (e) legacy flat index (no batches in scalars): loud refusal
    legacy = str(tmp_path / "bm25_legacy")
    search.bm25_index_write(a, legacy, n_buckets=8)
    import json, os
    sdir = f"{legacy}/_scalars"
    vname = sorted(os.listdir(sdir))[-1]
    meta = json.loads(open(f"{sdir}/{vname}").read())
    meta.pop("batches")
    open(f"{sdir}/{vname}", "w").write(json.dumps(meta))
    crc = f"{sdir}/.{vname}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(RuntimeError, match="batch stamping"):
        search.bm25_index_append(b, legacy)
    with pytest.raises(RuntimeError, match="batch stamping"):
        search.bm25_index_compact(spark, legacy, str(tmp_path / "x"))


def test_bm25_index_compact_differential_and_growth(spark, docs_df, tmp_path):
    """VERDICT r7 #2: bm25_index_compact. Appends N batches (file count
    and df segment rows grow), compacts, and asserts (a) probe results
    IDENTICAL pre/post, (b) posting files and stats segment rows
    measurably reduced — one df row per (bucket, term), ≤1 posting file
    per bucket, single scalars version listing only 'base', (c) probe
    plans stay partition-pruned on bucket through the whole append
    history AND after compaction."""
    import re as _re

    rows = docs_df.collect()
    qdf = spark.createDataFrame(
        [("q1", "spark shuffle join"), ("q2", "window aggregate state")],
        "query_id string, query_text string",
    )
    idx = str(tmp_path / "bm25_grow")
    search.bm25_index_write(
        spark.createDataFrame(rows[:2], docs_df.schema), idx, n_buckets=16
    )

    def probe_plan():
        return (
            search.bm25_search_index(spark, idx, qdf, k=10)
            ._jdf.queryExecution().executedPlan().toString()
        )

    # grow: one append per remaining doc → N batches, N df segments for
    # shared terms; the probe must stay bucket-pruned at every step
    for i, r in enumerate(rows[2:]):
        search.bm25_index_append(
            spark.createDataFrame([r], docs_df.schema), idx, batch_id=f"seg{i}"
        )
        filters = _re.findall(r"PartitionFilters: \[([^\]]*)\]", probe_plan())
        assert filters and any("bucket" in f for f in filters)
        # committed-batch visibility prunes at the same directory grain
        assert any("batch" in f for f in filters)

    want = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect()))
    meta = search._read_scalars(spark, idx)
    assert len(meta["batches"]) == len(rows) - 1

    out_idx = str(tmp_path / "bm25_compacted")
    obs = search.bm25_index_compact(spark, idx, out_idx)
    # (b) measurable reduction + canonical one-row-per-(bucket,term)
    assert obs["posting_files_out"] < obs["posting_files_in"]
    assert obs["stats_rows_out"] < obs["stats_rows_in"]
    st = spark.read.parquet(f"{out_idx}/stats")
    assert st.count() == st.select("bucket", "term").distinct().count()
    cmeta = search._read_scalars(spark, out_idx)
    assert cmeta["batches"] == ["base"] and cmeta["_version"] == 1
    assert cmeta["n_docs"] == meta["n_docs"] and cmeta["len_sum"] == meta["len_sum"]
    # (a) probe identity through compaction
    got = sorted(
        map(tuple, search.bm25_search_index(spark, out_idx, qdf, k=10).collect())
    )
    assert got == want
    # (c) compacted probe still bucket-pruned
    plan = (
        search.bm25_search_index(spark, out_idx, qdf, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    filters = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert filters and any("bucket" in f for f in filters)
    # compacting the compact index is a plain idempotent rewrite
    out2 = str(tmp_path / "bm25_compacted2")
    obs2 = search.bm25_index_compact(spark, out_idx, out2)
    assert obs2["stats_rows_out"] == obs["stats_rows_out"]
    assert sorted(
        map(tuple, search.bm25_search_index(spark, out2, qdf, k=10).collect())
    ) == want


def test_bm25_concurrent_append_conflict_is_explicit(spark, docs_df, tmp_path):
    """Two appenders racing from the same parent scalars version must
    conflict EXPLICITLY on the version rename (the loser raises IOError
    and retries from the new current version) — never silently clobber
    the winner's committed batches list."""
    rows = docs_df.collect()
    idx = str(tmp_path / "bm25_race")
    search.bm25_index_write(
        spark.createDataFrame(rows[:2], docs_df.schema), idx, n_buckets=8
    )
    meta = search._read_scalars(spark, idx)  # both appenders read v1

    # appender A lands v2
    search.bm25_index_append(
        spark.createDataFrame(rows[2:3], docs_df.schema), idx, batch_id="bA"
    )
    # appender B, still holding the v1 meta, tries to commit v2 too
    with pytest.raises(IOError, match="conflict"):
        search._commit_scalars(
            spark, idx,
            {k: v for k, v in meta.items() if k != "_version"},
            parent_version=meta["_version"],
        )
    # the winner's commit is intact
    cur = search._read_scalars(spark, idx)
    assert cur["_version"] == 2 and "bA" in cur["batches"]


def test_bm25_batch_id_validation(spark, docs_df, tmp_path):
    """Batch ids become literal partition directory names the purge/repair
    paths reconstruct verbatim — characters Spark would URL-escape at
    write time ('=', '/', spaces) must be refused up front, not written
    under one name and purged under another."""
    idx = str(tmp_path / "bm25_valid")
    rows = docs_df.collect()
    search.bm25_index_write(
        spark.createDataFrame(rows[:2], docs_df.schema), idx, n_buckets=8
    )
    b = spark.createDataFrame(rows[2:3], docs_df.schema)
    for bad in ("a=b", "a/b", "a b", "", "x" * 65):
        with pytest.raises(ValueError, match="batch_id"):
            search.bm25_index_append(b, idx, batch_id=bad)
    with pytest.raises(ValueError, match="batch_id"):
        search.bm25_index_write(b, str(tmp_path / "w"), batch_id="a=b")
    # auto-generated ids pass their own validation
    assert search.bm25_index_append(b, idx)["skipped"] is False


def test_bm25_index_compact_in_place_atomic(spark, docs_df, tmp_path, monkeypatch):
    """In-place compaction (out_path=None) is atomic-to-probes via the
    batch visibility switch: (a) probe identity pre/post; (b) a crash
    BEFORE the scalars flip leaves the probe exactly at the appended
    state with only invisible staged dirs (repair sweeps them); (c) a
    crash AFTER the flip but before reclamation leaves a compacted probe
    plus reclaimable orphans; (d) counts collapse as in the new-path
    mode."""
    rows = docs_df.collect()
    qdf = spark.createDataFrame(
        [("q1", "spark shuffle join"), ("q2", "window aggregate state")],
        "query_id string, query_text string",
    )
    idx = str(tmp_path / "bm25_inplace")
    search.bm25_index_write(
        spark.createDataFrame(rows[:2], docs_df.schema), idx, n_buckets=8
    )
    for i, r in enumerate(rows[2:]):
        search.bm25_index_append(
            spark.createDataFrame([r], docs_df.schema), idx, batch_id=f"seg{i}"
        )
    want = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect()))
    meta0 = search._read_scalars(spark, idx)

    # ---- (b) crash before the scalars flip
    real_commit = search._commit_scalars

    def boom(*a, **k):
        raise RuntimeError("injected crash before compaction commit")

    monkeypatch.setattr(search, "_commit_scalars", boom)
    with pytest.raises(RuntimeError, match="injected"):
        search.bm25_index_compact(spark, idx)
    monkeypatch.setattr(search, "_commit_scalars", real_commit)
    assert search._read_scalars(spark, idx)["_version"] == meta0["_version"]
    assert sorted(
        map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect())
    ) == want
    # the staged-then-moved compacted batch is an invisible orphan
    orphans = search._batch_dirs_present(spark, idx) - set(meta0["batches"])
    assert orphans and all(o.startswith("c") for o in orphans)
    search.bm25_index_repair(spark, idx, min_age_seconds=0)

    # ---- (c) crash after the flip, before reclamation
    real_repair = search.bm25_index_repair
    monkeypatch.setattr(
        search, "bm25_index_repair",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("injected post-flip")),
    )
    with pytest.raises(RuntimeError, match="post-flip"):
        search.bm25_index_compact(spark, idx)
    monkeypatch.setattr(search, "bm25_index_repair", real_repair)
    meta1 = search._read_scalars(spark, idx)
    assert len(meta1["batches"]) == 1 and meta1["batches"][0].startswith("c")
    assert meta1["n_docs"] == meta0["n_docs"]
    # probe already fully compacted; old batches are reclaimable orphans
    assert sorted(
        map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect())
    ) == want
    # retirement-stamped by the flip: the default gate defers them (a
    # probe planned against the old scalars may still be scanning)...
    assert set(search._read_scalars(spark, idx).get("retired", {})) == set(
        meta0["batches"]
    )
    assert search.bm25_index_repair(spark, idx)["purged_batches"] == []
    # ...and min_age 0 reclaims them and drops the retirement stamps
    purged = search.bm25_index_repair(spark, idx, min_age_seconds=0)["purged_batches"]
    assert set(purged) == set(meta0["batches"])
    assert search._read_scalars(spark, idx).get("retired", {}) == {}

    # ---- (a)+(d) clean in-place compaction on a re-grown index
    for i, r in enumerate(rows[:2]):
        search.bm25_index_append(
            spark.createDataFrame([r], docs_df.schema).withColumn(
                "doc_id", F.col("doc_id") + F.lit(1000)
            ),
            idx, batch_id=f"re{i}",
        )
    want2 = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect()))
    obs = search.bm25_index_compact(spark, idx, reclaim_min_age_seconds=0)
    assert obs["posting_files_out"] < obs["posting_files_in"]
    assert obs["stats_rows_out"] <= obs["stats_rows_in"]
    assert obs["purged_batches"] == 3  # cid + re0 + re1 collapsed to one
    assert obs["retired_batches"] == 3
    got = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect()))
    assert got == want2
    st = spark.read.parquet(f"{idx}/stats")
    assert st.count() == st.select("bucket", "term").distinct().count()
    import os
    assert not os.path.exists(f"{idx}/_compact_staging")


def test_bm25_age_gate_protects_inflight_append(spark, docs_df, tmp_path, monkeypatch):
    """VERDICT r8 #2: compaction/repair are safe to run WHILE an append is
    in flight — by the age-gate mechanism, not by the (now dropped)
    don't-run-concurrently discipline clause. An append's files are on
    disk but its scalars commit hasn't happened; at exactly that moment
    (a) a default-gate repair must DEFER the young batch (it is
    indistinguishable from a crash until it ages), and the append then
    commits successfully in the same call; (b) a default-gate in-place
    compact must likewise leave the young batch's directories untouched
    — the racing append loses the scalars version rename EXPLICITLY and
    (ADVICE r9 low) retries its metadata commit ONCE from the fresh
    post-compaction scalars inside the same call (the batch files are
    already on disk), landing with probe results identical to a full
    rebuild."""
    rows = docs_df.collect()
    qdf = spark.createDataFrame(
        [("q1", "spark shuffle join"), ("q2", "window aggregate state")],
        "query_id string, query_text string",
    )
    idx = str(tmp_path / "bm25_gate")
    search.bm25_index_write(
        spark.createDataFrame(rows[:2], docs_df.schema), idx, n_buckets=8
    )
    real_commit = search._commit_scalars

    # ---- (a) repair races the in-flight append's commit window
    obs_a = {}

    def repair_mid_append(spark_, path_, meta_, parent_version):
        if "ran" not in obs_a:
            obs_a["ran"] = True
            obs_a["repair"] = search.bm25_index_repair(spark, idx)  # default gate
            obs_a["survives"] = "inflight_a" in search._batch_dirs_present(spark, idx)
        return real_commit(spark_, path_, meta_, parent_version)

    monkeypatch.setattr(search, "_commit_scalars", repair_mid_append)
    out = search.bm25_index_append(
        spark.createDataFrame(rows[2:3], docs_df.schema), idx, batch_id="inflight_a"
    )
    monkeypatch.setattr(search, "_commit_scalars", real_commit)
    assert obs_a["repair"]["purged_batches"] == []
    assert obs_a["repair"]["deferred_batches"] == ["inflight_a"]
    assert obs_a["survives"] is True
    assert out["skipped"] is False and out["n_docs_added"] == 1
    assert "inflight_a" in search._read_scalars(spark, idx)["batches"]

    # ---- (b) in-place compact races the in-flight append's commit window
    obs_b = {}

    def compact_mid_append(spark_, path_, meta_, parent_version):
        if "ran" not in obs_b:
            obs_b["ran"] = True
            # default reclaim gate: retired batches get stamped, nothing
            # young is deleted; compact's own internal commits land for
            # real through this same hook (flag already set)
            obs_b["compact"] = search.bm25_index_compact(spark, idx)
            obs_b["survives"] = "inflight_b" in search._batch_dirs_present(spark, idx)
        return real_commit(spark_, path_, meta_, parent_version)

    monkeypatch.setattr(search, "_commit_scalars", compact_mid_append)
    out_b = search.bm25_index_append(
        spark.createDataFrame(rows[3:4], docs_df.schema), idx,
        batch_id="inflight_b",
    )
    monkeypatch.setattr(search, "_commit_scalars", real_commit)
    assert obs_b["survives"] is True
    assert obs_b["compact"]["purged_batches"] == 0  # all deferred by the gate
    assert obs_b["compact"]["retired_batches"] == 2  # base + inflight_a
    # the loser lost the first rename to the compactor's flip and RETRIED
    # internally from the fresh scalars — same call, no error surfaced
    assert out_b["skipped"] is False and out_b["n_docs_added"] == 1
    assert "inflight_b" in search._read_scalars(spark, idx)["batches"]
    # a manual re-append of the committed batch id is a metadata no-op
    out2 = search.bm25_index_append(
        spark.createDataFrame(rows[3:4], docs_df.schema), idx, batch_id="inflight_b"
    )
    assert out2["skipped"] is True and out2["n_docs_added"] == 0
    want_idx = str(tmp_path / "bm25_gate_full")
    search.bm25_index_write(docs_df, want_idx, n_buckets=8)
    want = sorted(
        map(tuple, search.bm25_search_index(spark, want_idx, qdf, k=10).collect())
    )
    got = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect()))
    assert got == want
    # no doubled postings from the raced first attempt
    p = spark.read.parquet(f"{idx}/postings")
    meta = search._read_scalars(spark, idx)
    vis = p.filter(F.col("batch").isin(meta["batches"]))
    assert vis.count() == vis.select("doc_id", "term").distinct().count()


def test_bm25_autocompact_threshold_resets_creep(spark, docs_df, tmp_path):
    """VERDICT r8 #3: the threshold-triggered compaction hint.
    needs_compaction flips True exactly when the committed-batches list
    reaches max_batches; bm25_index_append(autocompact_after=N) fires the
    in-place compact at N and resets the creep — batches list back to
    one, posting file count back to the fresh-build level — with probe
    results identical to a one-shot build throughout."""
    docs = [
        (1, "spark shuffle join"),
        (2, "spark spark spark window"),
        (3, "window agg rollup"),
        (4, "totally unrelated words here"),
        (101, "shuffle join broadcast hints"),
        (102, "window state store checkpoint"),
        (103, "agg rollup cube grouping"),
    ]
    schema = "doc_id long, text string"
    qdf = spark.createDataFrame(
        [("q1", "spark shuffle join"), ("q2", "window aggregate state")],
        "query_id string, query_text string",
    )
    idx = str(tmp_path / "bm25_auto")
    spark_docs = spark.createDataFrame(docs, schema)
    search.bm25_index_write(
        spark.createDataFrame(docs[:1], schema), idx, n_buckets=8
    )
    N = 4
    fired = 0
    for i, d in enumerate(docs[1:]):
        before = len(search._read_scalars(spark, idx)["batches"])
        # the scheduler-facing poll agrees with what the append will do
        assert search.needs_compaction(spark, idx, max_batches=N) is (before >= N)
        out = search.bm25_index_append(
            spark.createDataFrame([d], schema), idx, batch_id=f"s{i}",
            autocompact_after=N, reclaim_min_age_seconds=0,
        )
        after_meta = search._read_scalars(spark, idx)
        if before + 1 >= N:
            assert out["compacted"] is True and "compact_obs" in out
            assert len(after_meta["batches"]) == 1  # creep reset
            assert after_meta["batches"][0].startswith("c")
            fired += 1
        else:
            assert out["compacted"] is False
            assert len(after_meta["batches"]) == before + 1
        # the in-line trigger keeps the index below the poll threshold
        assert search.needs_compaction(spark, idx, max_batches=N) is False
    assert fired == 2  # 2,3,4->compact(1), 2,3,4->compact(1)

    def nfiles(p, batches):
        return (
            spark.read.parquet(p)
            .filter(F.col("batch").isin(batches))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    # probe cost back to fresh-build level: same visible file count as a
    # one-shot build of the same corpus (one file per occupied bucket —
    # the repartition('bucket') layout rule), and identical probe results
    fresh = str(tmp_path / "bm25_auto_fresh")
    search.bm25_index_write(spark_docs, fresh, n_buckets=8)
    got_files = nfiles(
        f"{idx}/postings", search._read_scalars(spark, idx)["batches"]
    )
    want_files = nfiles(f"{fresh}/postings", ["base"])
    assert got_files == want_files
    got = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect()))
    want = sorted(
        map(tuple, search.bm25_search_index(spark, fresh, qdf, k=10).collect())
    )
    assert got == want
    # corpus scalars survived the two compactions intact
    meta = search._read_scalars(spark, idx)
    assert meta["n_docs"] == len(docs)
    assert meta.get("retired", {}) == {}  # min_age=0 reclaim dropped stamps


def test_bm25_probe_batch_pruning_at_40_segments(spark, docs_df, tmp_path):
    """VERDICT r8 #7: the probe's committed-batch visibility must stay
    DIRECTORY-grain partition pruning at the segment counts where it
    matters — the small-case plan assertion in the growth test can't see
    a planner fallback (e.g. isin collapsing out of PartitionFilters)
    that only shows up with a long committed list. 40 one-doc appends →
    41 committed batches; the probe plan must carry BOTH bucket and
    batch in PartitionFilters, every committed batch id must appear in
    the scan's partition filter text, and results must equal a one-shot
    rebuild over the same docs."""
    import re as _re

    rows = docs_df.collect()
    qdf = spark.createDataFrame(
        [("q1", "spark shuffle join"), ("q2", "window aggregate state")],
        "query_id string, query_text string",
    )
    idx = str(tmp_path / "bm25_seg40")
    search.bm25_index_write(docs_df, idx, n_buckets=8)
    batch_src = spark.createDataFrame(rows[:1], docs_df.schema)
    for i in range(40):
        search.bm25_index_append(
            batch_src.withColumn(
                "doc_id", F.col("doc_id") + F.lit(1000 + i)
            ),
            idx, batch_id=f"seg{i:02d}",
        )
    committed = search._read_scalars(spark, idx)["batches"]
    assert len(committed) == 41

    # the default metadata string cap (100 chars) truncates a 41-entry
    # INSET out of the rendered plan — raise it so the assertion sees
    # the full PartitionFilters text
    prev_len = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        plan = (
            search.bm25_search_index(spark, idx, qdf, k=10)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev_len)
    filters = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert filters and any("bucket" in f for f in filters), plan[:2000]
    batch_filters = [f for f in filters if "batch" in f]
    assert batch_filters, plan[:2000]
    # every committed id is in the pruning predicate (directory grain),
    # and the uncommitted-future id obviously is not
    assert all(
        all(b in f for b in committed) for f in batch_filters
    ), batch_filters[0][:2000]

    # correctness at 41 segments: identical to the one-shot rebuild
    full = docs_df
    for i in range(40):
        full = full.unionByName(
            batch_src.withColumn("doc_id", F.col("doc_id") + F.lit(1000 + i))
        )
    ref = str(tmp_path / "bm25_seg40_ref")
    search.bm25_index_write(full, ref, n_buckets=8)
    got = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect()))
    want = sorted(map(tuple, search.bm25_search_index(spark, ref, qdf, k=10).collect()))
    assert got == want


def test_bm25_repair_drops_dirless_retired_stamps(spark, docs_df, tmp_path):
    """A retired stamp whose batch directories are already gone (a prior
    repair purged them but lost the stamp-drop commit to a version
    conflict) must be dropped by the next repair — not survive forever
    because only just-purged batches used to be eligible."""
    rows = docs_df.collect()
    idx = str(tmp_path / "bm25_stale_stamp")
    search.bm25_index_write(
        spark.createDataFrame(rows[:2], docs_df.schema), idx, n_buckets=8
    )
    meta = search._read_scalars(spark, idx)
    stale = {k: v for k, v in meta.items() if k != "_version"}
    stale["retired"] = {"ghost": 12345.0}  # ancient stamp, no dirs anywhere
    search._commit_scalars(spark, idx, stale, meta["_version"])
    rep = search.bm25_index_repair(spark, idx)  # default gate is fine: no dirs
    assert rep["purged_batches"] == [] and rep["deferred_batches"] == []
    assert search._read_scalars(spark, idx).get("retired", {}) == {}


def test_bm25_champions_probe(spark, docs_df, tmp_path):
    """Champion-list probe (r9): (a) with m ≥ every matched term's df the
    champion probe is IDENTICAL to the full probe; (b) m=1 keeps exactly
    each term's single highest-impact posting (tf/doc_len, doc_id
    tiebreak) and the probe scores only those; (c) the champion probe's
    scan reads ONLY the sidecar (no postings files in the plan) and
    stays bucket-pruned; (d) an append after the sidecar build makes the
    champion probe refuse LOUDLY until the sidecar is rebuilt; (e) a
    missing sidecar refuses with a named error."""
    import re as _re

    rows = docs_df.collect()
    qdf = spark.createDataFrame(
        [("q1", "spark shuffle join"), ("q2", "window aggregate state")],
        "query_id string, query_text string",
    )
    idx = str(tmp_path / "bm25_champ")
    search.bm25_index_write(docs_df, idx, n_buckets=8)

    # ---- (e) no sidecar yet
    with pytest.raises(RuntimeError, match="no champion sidecar"):
        search.bm25_search_index(spark, idx, qdf, k=10, champions_m=5).collect()

    # ---- (a) m ≥ max df → identity with the full probe
    obs = search.bm25_champions_write(spark, idx, m=100)
    assert obs["rows"] > 0
    full = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect()))
    champ = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=10, champions_m=100).collect(),
        )
    )
    assert champ == full

    # ---- (b) m=1: sidecar holds exactly one (highest-impact) posting per
    # term, matching a transparent single-window recomputation
    search.bm25_champions_write(spark, idx, m=1)
    side = spark.read.parquet(f"{idx}/_champions/m=1/data")
    assert side.count() == side.select("term").distinct().count()
    from pyspark.sql import Window as W

    want_best = {
        (r["term"], r["doc_id"])
        for r in (
            spark.read.parquet(f"{idx}/postings")
            .withColumn(
                "r",
                F.row_number().over(
                    W.partitionBy("term").orderBy(
                        (F.col("tf").cast("double") / F.col("doc_len")).desc(),
                        F.col("doc_id").asc(),
                    )
                ),
            )
            .filter(F.col("r") == 1)
            .collect()
        )
    }
    got_best = {(r["term"], r["doc_id"]) for r in side.collect()}
    assert got_best == want_best
    got_m1 = search.bm25_search_index(spark, idx, qdf, k=10, champions_m=1)
    assert got_m1.count() > 0  # scores exist, truncated semantics

    # ---- (c) plan reads only the sidecar, bucket-pruned
    plan = (
        search.bm25_search_index(spark, idx, qdf, k=10, champions_m=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    scans = _re.findall(r"Location: [^\n]*", plan)
    assert any("_champions" in s for s in scans), plan[:2000]
    assert not any("/postings" in s for s in scans), scans
    filters = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert filters and any("bucket" in f for f in filters)

    # ---- (d) staleness: append → refuse → rebuild → identity again
    search.bm25_index_append(
        spark.createDataFrame(rows[:1], docs_df.schema).withColumn(
            "doc_id", F.col("doc_id") + F.lit(500)
        ),
        idx, batch_id="late",
    )
    with pytest.raises(RuntimeError, match="STALE"):
        search.bm25_search_index(spark, idx, qdf, k=10, champions_m=100).collect()
    search.bm25_champions_write(spark, idx, m=100)
    full2 = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect()))
    champ2 = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=10, champions_m=100).collect(),
        )
    )
    assert champ2 == full2 and full2 != full


def test_bm25_compact_under_live_probe_thread(spark, docs_df, tmp_path):
    """ADVICE r8 medium, exercised LIVE rather than by directory-survival
    assertions: a probe thread hammers the index while the main thread
    runs an in-place compaction at the default age gate. In-place
    compaction preserves probe results exactly, so every concurrent
    probe must return EXACTLY the reference rows — never an exception
    (FileNotFoundException on a reclaimed dir) and never empty/partial
    scores. With the age gate, the batches a pre-flip probe planned
    against stay on disk for the grace period, so both sides of the
    scalars flip read a complete index."""
    import threading

    rows = docs_df.collect()
    qdf = spark.createDataFrame(
        [("q1", "spark shuffle join"), ("q2", "window aggregate state")],
        "query_id string, query_text string",
    )
    idx = str(tmp_path / "bm25_liveprobe")
    search.bm25_index_write(
        spark.createDataFrame(rows[:2], docs_df.schema), idx, n_buckets=8
    )
    for i, r in enumerate(rows[2:]):
        search.bm25_index_append(
            spark.createDataFrame([r], docs_df.schema), idx, batch_id=f"seg{i}"
        )
    want = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect()))

    stop = threading.Event()
    results, errors = [], []

    def prober():
        while not stop.is_set():
            try:
                got = sorted(
                    map(
                        tuple,
                        search.bm25_search_index(spark, idx, qdf, k=10).collect(),
                    )
                )
                results.append(got)
            except Exception as e:  # noqa: BLE001 - the assertion IS "no exception"
                errors.append(repr(e))
                break

    t = threading.Thread(target=prober, daemon=True)
    t.start()
    try:
        # a couple of probes land before, during, and after the flip
        obs = search.bm25_index_compact(spark, idx)  # default age gate
        # and a repair pass too — also claimed safe under live probes
        search.bm25_index_repair(spark, idx)
        # let the prober observe the post-flip state as well
        for _ in range(2):
            if stop.is_set():
                break
            search.bm25_search_index(spark, idx, qdf, k=10).collect()
    finally:
        stop.set()
        t.join(timeout=60)
    assert not errors, errors
    assert len(results) >= 2  # the thread really probed concurrently
    assert all(got == want for got in results), (results[-1], want)
    assert obs["retired_batches"] == 3  # the flip really happened mid-probing
    # post-compaction probe unchanged
    assert sorted(
        map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect())
    ) == want


# ------------------------------------------- r10: maintenance hardening ----


def test_bm25_rebuild_under_dynamic_partition_overwrite(spark, docs_df, tmp_path):
    """ADVICE r9 medium: a rebuild over an existing index must not inherit
    stale partitions when the SESSION globally sets
    spark.sql.sources.partitionOverwriteMode=dynamic. Worst case is the
    default batch_id ('base'): dynamic overwrite keeps every bucket=/
    batch=base directory the smaller new corpus doesn't touch, and since
    'base' is committed those stale postings become PROBE-VISIBLE and the
    read-back-derived df/n_docs/len_sum silently inflate. The fix deletes
    the old trees up front and pins static overwrite, so the rebuilt
    index must equal a from-scratch build exactly."""
    rows = docs_df.collect()
    qdf = spark.createDataFrame(
        [("q1", "spark shuffle join"), ("q2", "window aggregate state")],
        "query_id string, query_text string",
    )
    idx = str(tmp_path / "bm25_dyn")
    search.bm25_index_write(docs_df, idx, n_buckets=8)  # full corpus, 'base'
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        small = spark.createDataFrame(rows[:2], docs_df.schema)
        search.bm25_index_write(small, idx, n_buckets=8)  # same 'base' id
    finally:
        if old_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    meta = search._read_scalars(spark, idx)
    assert meta["n_docs"] == 2 and meta["batches"] == ["base"]
    # on-disk: nothing but the rebuild's own postings (no stale survivors)
    assert (
        spark.read.parquet(f"{idx}/postings").select("doc_id").distinct().count()
        == 2
    )
    want_idx = str(tmp_path / "bm25_dyn_fresh")
    search.bm25_index_write(spark.createDataFrame(rows[:2], docs_df.schema),
                            want_idx, n_buckets=8)
    want = sorted(
        map(tuple, search.bm25_search_index(spark, want_idx, qdf, k=10).collect())
    )
    got = sorted(map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect()))
    assert got == want


def test_bm25_append_aborts_when_batch_dirs_purged_mid_commit(
    spark, docs_df, tmp_path, monkeypatch
):
    """ADVICE r9 low: an append whose write phase outlasts a concurrent
    repair's age gate can have its young uncommitted directories
    reclaimed; committing scalars afterwards would publish metadata for
    purged files (probes then silently score a corpus the committed
    n_docs no longer describes). The append re-verifies its directories
    immediately before the scalars commit and must abort LOUDLY, leaving
    the index consistent (minus the batch) so a plain re-append
    recovers."""
    rows = docs_df.collect()
    idx = str(tmp_path / "bm25_purged")
    search.bm25_index_write(
        spark.createDataFrame(rows[:3], docs_df.schema), idx, n_buckets=8
    )
    real_verify = search._verify_batch_dirs

    def purge_then_verify(spark_, path_, batch_id_):
        # a rogue repair (undersized age gate) reclaims the batch right
        # before the pre-commit verification runs
        search._purge_batch_dirs(spark_, path_, batch_id_)
        return real_verify(spark_, path_, batch_id_)

    monkeypatch.setattr(search, "_verify_batch_dirs", purge_then_verify)
    with pytest.raises(IOError, match="reclaimed before the scalars commit"):
        search.bm25_index_append(
            spark.createDataFrame(rows[3:], docs_df.schema), idx, batch_id="late"
        )
    monkeypatch.setattr(search, "_verify_batch_dirs", real_verify)
    # nothing committed: scalars unchanged, index still probe-consistent
    meta = search._read_scalars(spark, idx)
    assert meta["batches"] == ["base"] and meta["n_docs"] == 3
    # plain re-append recovers fully
    out = search.bm25_index_append(
        spark.createDataFrame(rows[3:], docs_df.schema), idx, batch_id="late"
    )
    assert out["skipped"] is False and out["n_docs_added"] == 1
    qdf = spark.createDataFrame([("q", "spark window")],
                                "query_id string, query_text string")
    want_idx = str(tmp_path / "bm25_purged_full")
    search.bm25_index_write(docs_df, want_idx, n_buckets=8)
    assert sorted(
        map(tuple, search.bm25_search_index(spark, idx, qdf, k=10).collect())
    ) == sorted(
        map(tuple, search.bm25_search_index(spark, want_idx, qdf, k=10).collect())
    )


def test_bm25_append_retries_scalars_conflict_against_rival_appender(
    spark, docs_df, tmp_path, monkeypatch
):
    """ADVICE r9 low: a racing appender winning the version rename must
    not fail THIS append — the batch files are already on disk, so the
    metadata commit retries once from the fresh scalars, and the final
    version carries BOTH appends' additive contributions."""
    rows = docs_df.collect()
    idx = str(tmp_path / "bm25_rival")
    search.bm25_index_write(
        spark.createDataFrame(rows[:2], docs_df.schema), idx, n_buckets=8
    )
    base = search._read_scalars(spark, idx)
    real_commit = search._commit_scalars
    state = {"raced": False}

    def rival_wins_first(spark_, path_, meta_, parent_version):
        if not state["raced"]:
            state["raced"] = True
            cur = search._read_scalars(spark_, path_)
            rival = {k: v for k, v in cur.items() if k != "_version"}
            rival["n_docs"] += 7
            rival["len_sum"] += 70
            rival["batches"] = [*rival["batches"], "rival"]
            real_commit(spark_, path_, rival, cur["_version"])
        return real_commit(spark_, path_, meta_, parent_version)

    monkeypatch.setattr(search, "_commit_scalars", rival_wins_first)
    out = search.bm25_index_append(
        spark.createDataFrame(rows[2:3], docs_df.schema), idx, batch_id="mine"
    )
    monkeypatch.setattr(search, "_commit_scalars", real_commit)
    assert out["skipped"] is False and out["n_docs_added"] == 1
    meta = search._read_scalars(spark, idx)
    assert set(meta["batches"]) == {"base", "rival", "mine"}
    # additive over the RIVAL's committed state, not the stale snapshot
    assert meta["n_docs"] == base["n_docs"] + 7 + 1
    assert meta["len_sum"] == base["len_sum"] + 70 + 3  # doc 3 has 3 tokens
    assert meta["_version"] == base["_version"] + 2


# --------------------------------- r10: champion-sidecar maintenance -------

CHAMP_DOCS_OLD = [
    (1, "alpha alpha beta"),
    (2, "alpha gamma gamma"),
    (3, "alpha beta beta beta"),
]
CHAMP_DOCS_NEW = [
    (4, "alpha"),              # impact 1.0 — displaces doc 2 from alpha's top-2
    (5, "alpha delta"),
]


def test_bm25_champions_incremental_refresh_identity(spark, tmp_path):
    """VERDICT r9 #1: append → champion probe refuses → O(new batch)
    bm25_champions_refresh → sidecar rows AND probe results IDENTICAL to
    a from-scratch bm25_champions_write; champions_stale tracks the
    transitions. m=2 with alpha's df=5 makes the truncation real, and
    doc 4 (impact 1.0) must DISPLACE an old champion — the merge is
    union → re-rank → truncate, not append-only."""
    schema = "doc_id long, text string"
    old_df = spark.createDataFrame(CHAMP_DOCS_OLD, schema)
    qdf = spark.createDataFrame(
        [("q1", "alpha beta"), ("q2", "gamma delta")],
        "query_id string, query_text string",
    )
    idx = str(tmp_path / "bm25_champ_refresh")
    search.bm25_index_write(old_df, idx, n_buckets=8)
    search.bm25_champions_write(spark, idx, m=2)
    assert search.champions_stale(spark, idx) is False

    search.bm25_index_append(
        spark.createDataFrame(CHAMP_DOCS_NEW[:1], schema), idx, batch_id="n1"
    )
    search.bm25_index_append(
        spark.createDataFrame(CHAMP_DOCS_NEW[1:], schema), idx, batch_id="n2"
    )
    assert search.champions_stale(spark, idx) is True
    with pytest.raises(RuntimeError, match="STALE"):
        search.bm25_search_index(spark, idx, qdf, k=10, champions_m=2).collect()

    obs = search.bm25_champions_refresh(spark, idx, m=2)
    assert obs["mode"] == "incremental" and obs["new_batches"] == 2
    assert search.champions_stale(spark, idx) is False
    got_side = sorted(
        map(tuple, spark.read.parquet(f"{idx}/_champions/m=2/data").collect())
    )
    got_probe = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=10, champions_m=2).collect(),
        )
    )
    # displacement really happened: doc 4 in, doc 2 out of alpha's list
    alpha = {
        r["doc_id"]
        for r in spark.read.parquet(f"{idx}/_champions/m=2/data")
        .filter(F.col("term") == "alpha")
        .collect()
    }
    assert alpha == {4, 1}

    # from-scratch rebuild must produce the identical sidecar and probe
    search.bm25_champions_write(spark, idx, m=2)
    want_side = sorted(
        map(tuple, spark.read.parquet(f"{idx}/_champions/m=2/data").collect())
    )
    want_probe = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=10, champions_m=2).collect(),
        )
    )
    assert got_side == want_side
    assert got_probe == want_probe
    # a second refresh is a metadata no-op
    assert search.bm25_champions_refresh(spark, idx, m=2)["mode"] == "noop"


def test_bm25_champions_refresh_rebuild_fallbacks(spark, tmp_path):
    """bm25_champions_refresh falls back to a full rebuild exactly when no
    incremental path exists: (a) missing stamp (crashed rebuild), (b) a
    compaction relabelled batches while the sidecar was ALREADY stale —
    and the fallback still lands a correct, probe-usable sidecar."""
    from pwhl_data_engineering_pipeline_spark import fsutil

    schema = "doc_id long, text string"
    old_df = spark.createDataFrame(CHAMP_DOCS_OLD, schema)
    qdf = spark.createDataFrame(
        [("q1", "alpha beta")], "query_id string, query_text string"
    )
    idx = str(tmp_path / "bm25_champ_fallback")
    search.bm25_index_write(old_df, idx, n_buckets=8)
    search.bm25_champions_write(spark, idx, m=2)

    # (a) crashed rebuild: stamp gone → rebuild
    fsutil.delete(spark, f"{idx}/_champions/m=2/stamp.json")
    assert search.champions_stale(spark, idx) is True
    obs = search.bm25_champions_refresh(spark, idx, m=2)
    assert obs["mode"] == "rebuild"
    assert search.champions_stale(spark, idx) is False

    # (b) stale sidecar + compaction: batch ids relabelled → rebuild
    search.bm25_index_append(
        spark.createDataFrame(CHAMP_DOCS_NEW, schema), idx, batch_id="late"
    )  # sidecar now stale (stamp = ['base'])
    search.bm25_index_compact(spark, idx, reclaim_min_age_seconds=0)
    obs2 = search.bm25_champions_refresh(spark, idx, m=2)
    assert obs2["mode"] == "rebuild"
    got = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=10, champions_m=2).collect(),
        )
    )
    # oracle: champions over the full corpus from scratch at a fresh path
    want_idx = str(tmp_path / "bm25_champ_fallback_fresh")
    search.bm25_index_write(
        spark.createDataFrame(CHAMP_DOCS_OLD + CHAMP_DOCS_NEW, schema),
        want_idx, n_buckets=8,
    )
    search.bm25_champions_write(spark, want_idx, m=2)
    want = sorted(
        map(
            tuple,
            search.bm25_search_index(
                spark, want_idx, qdf, k=10, champions_m=2
            ).collect(),
        )
    )
    assert got == want


def test_bm25_compact_restamps_fresh_champions(spark, tmp_path):
    """A sidecar that is FRESH at compaction time survives the compaction
    probe-usable: compaction rewrites the same content rows under a new
    batch id, so bm25_index_compact re-stamps the sidecar in place (O(1)
    metadata) instead of forcing a rebuild."""
    schema = "doc_id long, text string"
    qdf = spark.createDataFrame(
        [("q1", "alpha beta")], "query_id string, query_text string"
    )
    idx = str(tmp_path / "bm25_champ_restamp")
    search.bm25_index_write(
        spark.createDataFrame(CHAMP_DOCS_OLD, schema), idx, n_buckets=8
    )
    search.bm25_index_append(
        spark.createDataFrame(CHAMP_DOCS_NEW, schema), idx, batch_id="late"
    )
    search.bm25_champions_write(spark, idx, m=2)  # fresh: covers both batches
    before = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=10, champions_m=2).collect(),
        )
    )
    obs = search.bm25_index_compact(spark, idx, reclaim_min_age_seconds=0)
    assert obs["champions_restamped"] == 1
    assert search.champions_stale(spark, idx) is False
    after = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=10, champions_m=2).collect(),
        )
    )
    assert after == before


def test_bm25_append_refresh_champions_one_call(spark, tmp_path):
    """VERDICT r9 #1 wiring: ONE bm25_index_append call with
    refresh_champions=True (+ autocompact) keeps postings, stats, AND
    every champion sidecar probe-fresh — refresh runs BEFORE the
    autocompaction (batch-id delta still identifiable), compaction then
    re-stamps the freshened sidecars."""
    schema = "doc_id long, text string"
    qdf = spark.createDataFrame(
        [("q1", "alpha beta"), ("q2", "gamma delta")],
        "query_id string, query_text string",
    )
    idx = str(tmp_path / "bm25_champ_onecall")
    search.bm25_index_write(
        spark.createDataFrame(CHAMP_DOCS_OLD, schema), idx, n_buckets=8
    )
    search.bm25_champions_write(spark, idx, m=2)
    out = search.bm25_index_append(
        spark.createDataFrame(CHAMP_DOCS_NEW, schema),
        idx,
        batch_id="late",
        refresh_champions=True,
        autocompact_after=2,
        reclaim_min_age_seconds=0,
    )
    assert out["champions"][2]["mode"] == "incremental"
    assert out["compacted"] is True
    assert out["compact_obs"]["champions_restamped"] == 1
    assert search.champions_stale(spark, idx) is False
    assert search.needs_compaction(spark, idx, max_batches=2) is False
    got = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=10, champions_m=2).collect(),
        )
    )
    want_idx = str(tmp_path / "bm25_champ_onecall_fresh")
    search.bm25_index_write(
        spark.createDataFrame(CHAMP_DOCS_OLD + CHAMP_DOCS_NEW, schema),
        want_idx, n_buckets=8,
    )
    search.bm25_champions_write(spark, want_idx, m=2)
    want = sorted(
        map(
            tuple,
            search.bm25_search_index(
                spark, want_idx, qdf, k=10, champions_m=2
            ).collect(),
        )
    )
    assert got == want


def test_bm25_repair_sweeps_champion_sidecars(spark, tmp_path):
    """VERDICT r9 #7 / ADVICE r9 low: repair reclaims abandoned champion
    sidecars. Unstamped trees (crashed rebuilds — unusable by any probe)
    sweep under the age gate unconditionally; STALE-stamped trees sweep
    only with sweep_stale_champions=True (default keeps them — they are
    refreshable in O(new batch)); young unstamped trees (an in-flight
    rebuild) are deferred by the default gate."""
    from pwhl_data_engineering_pipeline_spark import fsutil

    schema = "doc_id long, text string"
    idx = str(tmp_path / "bm25_champ_sweep")
    search.bm25_index_write(
        spark.createDataFrame(CHAMP_DOCS_OLD, schema), idx, n_buckets=8
    )
    search.bm25_champions_write(spark, idx, m=5)
    search.bm25_champions_write(spark, idx, m=3)
    # m=3's rebuild "crashed": stamp never published
    fsutil.delete(spark, f"{idx}/_champions/m=3/stamp.json")

    # young unstamped tree is deferred by the default gate
    rep0 = search.bm25_index_repair(spark, idx)
    assert rep0["champions_swept"] == []
    assert fsutil.exists(spark, f"{idx}/_champions/m=3/data")

    # past the gate it sweeps; the stamped fresh m=5 is untouched
    rep1 = search.bm25_index_repair(spark, idx, min_age_seconds=0)
    assert rep1["champions_swept"] == ["m=3"]
    assert not fsutil.exists(spark, f"{idx}/_champions/m=3")
    assert fsutil.exists(spark, f"{idx}/_champions/m=5/stamp.json")

    # stale-stamped: kept by default (refreshable), swept on the flag
    search.bm25_index_append(
        spark.createDataFrame(CHAMP_DOCS_NEW, schema), idx, batch_id="late"
    )
    assert search.champions_stale(spark, idx) is True
    rep2 = search.bm25_index_repair(spark, idx, min_age_seconds=0)
    assert rep2["champions_swept"] == []
    rep3 = search.bm25_index_repair(
        spark, idx, min_age_seconds=0, sweep_stale_champions=True
    )
    assert rep3["champions_swept"] == ["m=5"]
    assert not fsutil.exists(spark, f"{idx}/_champions/m=5")


# ---------------- r11: champion-stamp hardening + refresh races (ADVICE r10)


def test_torn_champion_stamp_reads_as_unstamped_everywhere(spark, tmp_path):
    """ADVICE r10 medium: a torn/truncated stamp.json (a crash mid-publish,
    or a pre-r11 in-place restamp read mid-write) must land on the
    documented graceful 'unstamped' posture in EVERY reader — the probe
    refuses loudly, champions_stale flags it, refresh rebuilds, compact's
    restamp skips it, repair sweeps it — never a raw JSONDecodeError that
    leaves recovery manual."""
    from pwhl_data_engineering_pipeline_spark import fsutil

    schema = "doc_id long, text string"
    qdf = spark.createDataFrame(
        [("q1", "alpha beta")], "query_id string, query_text string"
    )
    idx = str(tmp_path / "bm25_torn_stamp")
    search.bm25_index_write(
        spark.createDataFrame(CHAMP_DOCS_OLD, schema), idx, n_buckets=8
    )
    search.bm25_champions_write(spark, idx, m=2)
    stamp_path = f"{idx}/_champions/m=2/stamp.json"
    good = fsutil.read_text(spark, stamp_path)
    fsutil.write_text(spark, stamp_path, good[: len(good) // 2])  # torn

    assert search.champions_stale(spark, idx) is True
    with pytest.raises(RuntimeError, match="torn"):
        search.bm25_search_index(spark, idx, qdf, k=10, champions_m=2).collect()
    # compact's restamp must skip (not crash on) the torn sidecar
    obs = search.bm25_index_compact(spark, idx, reclaim_min_age_seconds=0)
    assert obs["champions_restamped"] == 0
    # refresh treats it as a crashed rebuild → full rebuild, probe-usable
    assert search.bm25_champions_refresh(spark, idx, m=2)["mode"] == "rebuild"
    assert search.champions_stale(spark, idx) is False
    assert search.bm25_search_index(spark, idx, qdf, k=10, champions_m=2).count() > 0

    # repair sweeps a torn-stamped sidecar exactly like an unstamped one
    fsutil.write_text(spark, stamp_path, '{"m": 2, "batch')
    rep = search.bm25_index_repair(spark, idx, min_age_seconds=0)
    assert rep["champions_swept"] == ["m=2"]
    assert not fsutil.exists(spark, f"{idx}/_champions/m=2")


def test_champion_stamp_publish_atomic_lost_race_is_loud(
    spark, tmp_path, monkeypatch
):
    """ADVICE r10 medium: the stamp publishes via temp write + delete +
    no-overwrite rename (the _commit_scalars pattern). A lost rename race
    (a rival stamping the same sidecar — outside the single-writer
    contract) raises IOError and leaves the sidecar cleanly UNSTAMPED
    with no temp litter — never a torn stamp — and a plain re-run
    recovers."""
    from pwhl_data_engineering_pipeline_spark import fsutil

    schema = "doc_id long, text string"
    idx = str(tmp_path / "bm25_stamp_race")
    search.bm25_index_write(
        spark.createDataFrame(CHAMP_DOCS_OLD, schema), idx, n_buckets=8
    )
    real_rename = fsutil.rename_no_overwrite
    monkeypatch.setattr(
        fsutil, "rename_no_overwrite", lambda s, a, b: False
    )
    with pytest.raises(IOError, match="stamp publish conflict"):
        search.bm25_champions_write(spark, idx, m=2)
    monkeypatch.setattr(fsutil, "rename_no_overwrite", real_rename)
    root = f"{idx}/_champions/m=2"
    assert fsutil.read_text(spark, f"{root}/stamp.json") is None
    assert not [
        n for n in fsutil.list_names(spark, root) if n.startswith("stamp.json.")
    ]
    out = search.bm25_champions_write(spark, idx, m=2)
    assert out["rows"] > 0 and search.champions_stale(spark, idx) is False


def test_champions_refresh_stakes_staging_before_unpublish(
    spark, tmp_path, monkeypatch
):
    """ADVICE r10 low: the refresh stakes a fresh .refresh.* staging marker
    under the sidecar root BEFORE unpublishing the stamp, so the root's
    newest tree mtime stays young for the whole unstamped window — a
    concurrent bm25_index_repair's age gate defers the sweep instead of
    deleting {root}/data out from under the (lazy) merge read."""
    from pwhl_data_engineering_pipeline_spark import fsutil

    schema = "doc_id long, text string"
    idx = str(tmp_path / "bm25_refresh_stake")
    search.bm25_index_write(
        spark.createDataFrame(CHAMP_DOCS_OLD, schema), idx, n_buckets=8
    )
    search.bm25_champions_write(spark, idx, m=2)
    search.bm25_index_append(
        spark.createDataFrame(CHAMP_DOCS_NEW, schema), idx, batch_id="n1"
    )
    root = f"{idx}/_champions/m=2"

    real_delete = fsutil.delete
    real_list = fsutil.list_names
    seen: dict = {}

    def delete_spy(spark_, path_, recursive=False):
        # capture the FIRST stamp unpublish (the refresh's); _write_stamp
        # deletes it again later, after the staging dir was renamed away
        if path_ == f"{root}/stamp.json" and "markers" not in seen:
            seen["markers"] = [
                n for n in real_list(spark_, root) if n.startswith(".refresh.")
            ]
        return real_delete(spark_, path_, recursive)

    monkeypatch.setattr(fsutil, "delete", delete_spy)
    out = search.bm25_champions_refresh(spark, idx, m=2)
    monkeypatch.setattr(fsutil, "delete", real_delete)
    assert out["mode"] == "incremental"
    assert seen.get("markers"), "no staging marker staked before the unpublish"
    # and no staging litter survives a successful refresh
    assert not [
        n for n in fsutil.list_names(spark, root) if n.startswith(".refresh.")
    ]


def test_repair_age_gate_defers_root_with_fresh_staging_marker(spark, tmp_path):
    """The mechanism behind the stake (ADVICE r10 low): an unstamped
    sidecar root whose only YOUNG entry is an in-flight refresh's staging
    marker is deferred by the repair age gate even when the data files
    themselves are old; once the marker is gone (dead writer), the aged
    root sweeps."""
    import os
    import time

    from pwhl_data_engineering_pipeline_spark import fsutil

    schema = "doc_id long, text string"
    idx = str(tmp_path / "bm25_refresh_gate")
    search.bm25_index_write(
        spark.createDataFrame(CHAMP_DOCS_OLD, schema), idx, n_buckets=8
    )
    search.bm25_champions_write(spark, idx, m=2)
    root = f"{idx}/_champions/m=2"
    fsutil.delete(spark, f"{root}/stamp.json")  # the unstamped window
    # age the whole sidecar tree far past the gate
    root_local = str(tmp_path / "bm25_refresh_gate" / "_champions" / "m=2")
    old = time.time() - 7 * 86400
    for r, dirs, files in os.walk(root_local):
        for n in dirs + files:
            os.utime(os.path.join(r, n), (old, old))
    # an in-flight refresh staked its marker just now
    fsutil.write_text(spark, f"{root}/.refresh.live/_INPROGRESS", "")
    rep = search.bm25_index_repair(spark, idx, min_age_seconds=3600)
    assert rep["champions_swept"] == []
    assert fsutil.exists(spark, f"{root}/data")
    # dead writer: marker removed → the aged unstamped root sweeps
    fsutil.delete(spark, f"{root}/.refresh.live", recursive=True)
    rep2 = search.bm25_index_repair(spark, idx, min_age_seconds=3600)
    assert rep2["champions_swept"] == ["m=2"]
    assert not fsutil.exists(spark, root)


def test_champions_maintenance_sweeps_dead_staging(spark, tmp_path):
    """ADVICE r10 low: a refresh that crashed between its data-dir delete
    and the swap rename leaves a .refresh.* staging dir that — once the
    next rebuild re-stamps the root FRESH — repair would never reclaim.
    Both refresh and rebuild sweep dead staging (and stamp temp litter)
    at start, so it cannot accumulate."""
    from pwhl_data_engineering_pipeline_spark import fsutil

    schema = "doc_id long, text string"
    idx = str(tmp_path / "bm25_dead_staging")
    search.bm25_index_write(
        spark.createDataFrame(CHAMP_DOCS_OLD, schema), idx, n_buckets=8
    )
    search.bm25_champions_write(spark, idx, m=2)
    root = f"{idx}/_champions/m=2"
    fsutil.write_text(spark, f"{root}/.refresh.deadbeef/_INPROGRESS", "")
    fsutil.write_text(spark, f"{root}/stamp.json.deadbeef.tmp", "{}")
    # even a noop refresh sweeps the litter
    assert search.bm25_champions_refresh(spark, idx, m=2)["mode"] == "noop"
    names = fsutil.list_names(spark, root)
    assert not [n for n in names if n.startswith(".refresh.")]
    assert not [n for n in names if n.startswith("stamp.json.") and n.endswith(".tmp")]
    # the full rebuild sweeps too
    fsutil.write_text(spark, f"{root}/.refresh.cafe/_INPROGRESS", "")
    search.bm25_champions_write(spark, idx, m=2)
    assert not [
        n for n in fsutil.list_names(spark, root) if n.startswith(".refresh.")
    ]


def test_champions_refresh_stamp_never_wrong_under_rival_append(
    spark, tmp_path, monkeypatch
):
    """VERDICT r10 #5: an append that commits between the refresh's scalars
    read and its stamp publish leaves the new stamp conservatively STALE
    — citing exactly the pre-append batch list the merge covered — never
    WRONG (claiming coverage of the unmerged batch). The probe refuses
    loudly and the next refresh catches up incrementally."""
    schema = "doc_id long, text string"
    qdf = spark.createDataFrame(
        [("q1", "alpha beta"), ("q2", "gamma delta")],
        "query_id string, query_text string",
    )
    idx = str(tmp_path / "bm25_refresh_race")
    search.bm25_index_write(
        spark.createDataFrame(CHAMP_DOCS_OLD, schema), idx, n_buckets=8
    )
    search.bm25_champions_write(spark, idx, m=2)
    search.bm25_index_append(
        spark.createDataFrame(CHAMP_DOCS_NEW[:1], schema), idx, batch_id="n1"
    )

    real_read = search._read_scalars
    state = {"fired": False}

    def read_then_rival_appends(spark_, path_):
        meta = real_read(spark_, path_)
        if not state["fired"]:
            state["fired"] = True
            # the rival lands immediately AFTER the refresh planned its merge
            search.bm25_index_append(
                spark.createDataFrame(CHAMP_DOCS_NEW[1:], schema),
                path_,
                batch_id="n2",
            )
        return meta

    monkeypatch.setattr(search, "_read_scalars", read_then_rival_appends)
    out = search.bm25_champions_refresh(spark, idx, m=2)
    monkeypatch.setattr(search, "_read_scalars", real_read)
    assert out["mode"] == "incremental" and out["new_batches"] == 1

    # the stamp cites exactly what the merge covered — the pre-append list
    stamp = search._read_stamp(spark, f"{idx}/_champions/m=2/stamp.json")
    assert stamp["batches"] == ["base", "n1"]
    # conservatively stale: flagged, probe refuses loudly — never silently
    # missing n2's docs
    assert search.champions_stale(spark, idx) is True
    with pytest.raises(RuntimeError, match="STALE"):
        search.bm25_search_index(spark, idx, qdf, k=10, champions_m=2).collect()

    # the next refresh catches up (incremental — n2 is a pure append on
    # top of the stamped list) and matches a from-scratch oracle
    out2 = search.bm25_champions_refresh(spark, idx, m=2)
    assert out2["mode"] == "incremental" and out2["new_batches"] == 1
    assert search.champions_stale(spark, idx) is False
    got = sorted(
        map(
            tuple,
            search.bm25_search_index(spark, idx, qdf, k=10, champions_m=2).collect(),
        )
    )
    want_idx = str(tmp_path / "bm25_refresh_race_fresh")
    search.bm25_index_write(
        spark.createDataFrame(CHAMP_DOCS_OLD + CHAMP_DOCS_NEW, schema),
        want_idx,
        n_buckets=8,
    )
    search.bm25_champions_write(spark, want_idx, m=2)
    want = sorted(
        map(
            tuple,
            search.bm25_search_index(
                spark, want_idx, qdf, k=10, champions_m=2
            ).collect(),
        )
    )
    assert got == want
