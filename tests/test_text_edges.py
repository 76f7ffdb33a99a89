"""Edge cases for the text kit: empty/short inputs, redaction patterns."""

from __future__ import annotations

from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.functions import text


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_chunk_text_edges(spark):
    # shorter than one chunk → exactly one chunk, full text
    chunks = _one(spark, text.chunk_text(F.lit("short"), 128, 32))
    assert len(chunks) == 1 and chunks[0]["chunk_text"] == "short"
    # empty text → one empty chunk (never zero rows downstream of explode)
    chunks = _one(spark, text.chunk_text(F.lit(""), 128, 32))
    assert len(chunks) == 1 and chunks[0]["chunk_text"] == ""
    # exact multi-chunk math: 300 chars, chunk 128 stride 96 → ceil(268/96)=3
    s = "x" * 300
    chunks = _one(spark, text.chunk_text(F.lit(s), 128, 32))
    assert [c["chunk_idx"] for c in chunks] == [0, 1, 2]
    assert len(chunks[0]["chunk_text"]) == 128
    assert len(chunks[2]["chunk_text"]) == 300 - 2 * 96  # final partial window
    # overlap property: consecutive chunks share `overlap` chars
    assert chunks[0]["chunk_text"][-32:] == chunks[1]["chunk_text"][:32]


def test_redact_pii(spark):
    red = _one(
        spark,
        text.redact_pii(
            F.lit("mail a.b+c@test.org or call +1 (555) 123-4567, id 1234567 end")
        ),
    )
    assert "<EMAIL>" in red and "@" not in red
    assert "<PHONE>" in red and "555" not in red
    assert "<NUM>" in red and "1234567" not in red
    # clean text passes through untouched
    clean = _one(spark, text.redact_pii(F.lit("just words and a year 2025")))
    assert clean == "just words and a year 2025"


def test_token_count_edges(spark):
    assert _one(spark, text.token_count(F.lit(""))) == 0
    assert _one(spark, text.token_count(F.lit("   "))) == 0
    assert _one(spark, text.token_count(F.lit("a  b\tc"))) == 3
    # "hello" "," "world" "42" — letter runs, digit runs, single punctuation
    assert _one(spark, text.bpe_ish_token_count(F.lit("hello, world 42"))) == 4


def test_lang_id_unknown(spark):
    assert _one(spark, text.lang_id(F.lit("zzz qqq xxx"))) == "und"
    assert _one(spark, text.lang_id(F.lit("the cat and the dog"))) == "en"
    assert _one(spark, text.lang_id(F.lit(""))) == "und"


def test_shingles_and_ngrams_short_input(spark):
    sh = _one(spark, text.char_shingles(F.lit("ab"), 5))
    assert sh == ["ab"]  # shorter than k → whole string
    ng = _one(spark, text.word_ngrams(F.lit("one two"), 3))
    assert ng == ["one two"]  # fewer than n words → single partial gram


def test_strip_html_semantics_and_sql_mirror(spark):
    """functions.text.strip_html: script/style/comment bodies vanish, block
    closers become newlines, named entities decode, unknown entities blank,
    whitespace normalizes — and the DuckDB mirror generated from the SAME
    step table produces the identical string for every case."""
    import duckdb

    from pwhl_data_engineering_pipeline_spark.functions import text as T

    cases = [
        (
            "<html><head><style>p{color:red}</style>"
            "<script>var x = 1 < 2;</script></head>"
            "<body><!-- hidden -->"
            "<h1>Title</h1><p>first para</p><p>second &amp; third</p>"
            "<div>a &lt;tag&gt; literal &nbsp; here</div>"
            "<ul><li>one</li><li>two</li></ul>"
            "tail &#8212; with &bogus; entities</body></html>",
            "Title\nfirst para\nsecond & third\na <tag> literal here\none\ntwo\ntail with entities",
        ),
        ("no markup at all", "no markup at all"),
        ("<br><br><br>spaced", "spaced"),
        ("", ""),
        ("<p>only</p>", "only"),
        ("a<b>bold</b>c", "a bold c"),
        # double-escaped entities decode exactly ONE level (review
        # finding: &amp; must resolve last, but before that the unknown-
        # entity blanking must not eat it)
        ("use &amp;lt; and &amp;copy; here", "use &lt; and &copy; here"),
        ("5 &amp; 6 &amp;amp; 7", "5 & 6 &amp; 7"),
        ("stray \x02 sentinel &amp; ok", "stray sentinel & ok"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, html string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", T.strip_html("html").alias("t")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, repr(got[i]))

    con = duckdb.connect()
    for i, (html, want) in enumerate(cases):
        (dk,) = con.sql(
            f"SELECT {T.html_strip_sql('h')} FROM (SELECT ? AS h)",
            params=[html],
        ).fetchone()
        assert dk == want == got[i], (i, repr(dk))
    con.close()
