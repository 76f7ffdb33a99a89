"""Python UDTFs (Spark 4 user-defined table functions) — the row→rows
extension surface for logic that genuinely needs Python and a variable
number of output rows per input (SURVEY.md §2.10 policy: native expressions
first; this is the escape hatch beside pandas UDFs).

``SentenceSplit`` is the demonstrator: document → (sentence_idx, sentence,
n_chars) rows, registered so it is usable from SQL via LATERAL joins.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sentence_idx int, sentence string, n_chars int")
class SentenceSplit:
    """Naive sentence splitter (period/question/exclamation boundaries).

    Real pipelines would plug a proper segmenter here; the point is the
    table-function plumbing: one input row → N output rows, streamed.
    """

    def eval(self, text: str):  # noqa: D401 - UDTF contract method
        if not text:
            return
        import re

        parts = [p.strip() for p in re.split(r"(?<=[.!?])\s+", text.strip())]
        for i, p in enumerate(s for s in parts if s):
            yield i, p, len(p)


def register(spark) -> None:
    """Register the UDTFs in the session catalog for SQL use:
    ``SELECT d.doc_id, s.* FROM docs d, LATERAL sentence_split(d.text) s``."""
    spark.udtf.register("sentence_split", SentenceSplit)
