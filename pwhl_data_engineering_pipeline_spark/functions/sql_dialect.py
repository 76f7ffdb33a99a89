"""BigQuery → Spark SQL dialect translation (SURVEY.md §3 EP3).

The reference's query layer is BigQuery Standard SQL files run manually in
the warehouse console (sql/02_create_dims_and_facts.sql, 03_create_views.sql,
10_eda_queries.sql). This translator lets a user of the reference run those
same files on the engine unchanged — the dialect deltas are mechanical:

- backticked ``project.dataset.table`` names → bare table names
- ``SAFE_DIVIDE`` → ``try_divide``; ``COUNTIF`` → ``count_if``
- ``FORMAT_DATE('%A', d)`` → ``date_format(d, 'EEEE')``
- ``EXTRACT(ISOWEEK FROM d)`` → ``weekofyear(d)``
- ``FROM UNNEST(GENERATE_DATE_ARRAY(a, b, INTERVAL 1 DAY)) AS day`` →
  ``FROM (SELECT explode(sequence(to_date(a), to_date(b), interval 1 day)) AS day)``
- ``CREATE SCHEMA ... OPTIONS(...)`` → ``CREATE DATABASE IF NOT EXISTS ...``
- CTAS ``PARTITION BY / CLUSTER BY`` headers → ``USING parquet PARTITIONED
  BY`` (table mode) or stripped (temp-view mode, the default for tests)

SCOPE (widened round 4 per the round-3 verdict): still a dialect
translator, not a general BigQuery parser — but now hardened for arbitrary
user SQL to degrade GRACEFULLY instead of sharply:

- ``split_statements`` is quote- and comment-aware (a ``;`` inside a
  string literal no longer splits the statement),
- function rewrites use balanced-paren argument scanning
  (``FORMAT_DATE('%A', DATE(x))`` translates correctly),
- ``SAFE_CAST`` → ``try_cast``; ``DATE_ADD/DATE_SUB (INTERVAL n
  DAY/WEEK/MONTH/QUARTER/YEAR)`` → ``date_add/add_months`` forms;
  ``DATE_DIFF(a, b, DAY/MONTH/QUARTER/YEAR)`` → calendar-boundary-count
  expressions matching BigQuery semantics (NOT months_between's
  fractional semantics); ``EXTRACT(part FROM x)`` for the parts whose
  Spark semantics match (YEAR/QUARTER/MONTH/DAY/HOUR/MINUTE/SECOND/
  DAYOFWEEK/DAYOFYEAR/ISOWEEK/ISOYEAR; EXTRACT(DATE FROM ts) →
  to_date),
- ``SELECT * EXCEPT (...)`` passes through (Spark's syntax is identical);
  top-level ``QUALIFY <pred>`` is rewritten to a window-in-subquery form
  (``SELECT * EXCEPT (__q) FROM (SELECT ..., (pred) AS __q ...) WHERE
  __q``) with select-list aliases inlined into the predicate — Spark
  refuses lateral aliases inside window expressions,
- constructs whose semantics DIVERGE or are untranslated raise
  ``UnsupportedSQLError`` naming the construct (BigQuery WEEK
  extract/diff — Sunday-anchored 0-based weeks; ``SELECT * REPLACE``;
  QUALIFY buried in a subquery/CTE or mixed with set ops/DISTINCT;
  PARSE_/FORMAT_ date-time functions beyond FORMAT_DATE('%A', ·);
  UNNEST outside the translated GENERATE_DATE_ARRAY form; STRUCT<>
  literals; TIMESTAMP_ADD/SUB/DIFF) — a clear error instead of silent
  mistranslation. The translated output is always plain Spark SQL, so
  anything that slips past the detector surfaces as a Spark analysis
  error, never a silently wrong result.

One *documented deviation* (SURVEY.md §7.4 item 4): the reference's viz
queries join ``USING (weather_id)`` but no script ever materializes that
column — they cannot run against the reference's own tables. With
``repair_weather_id=True`` the translator mints
``concat_ws('|', market, cast(event_date AS string))`` on ``dim_weather``
and ``fact_ticket_sales`` so the declared star schema actually works.
"""

from __future__ import annotations

import re

_DATE_ARRAY_RE = re.compile(
    r"UNNEST\s*\(\s*GENERATE_DATE_ARRAY\s*\(\s*('(?:[^']*)')\s*,\s*('(?:[^']*)')\s*,"
    r"\s*INTERVAL\s+1\s+DAY\s*\)\s*\)\s*AS\s+(\w+)",
    re.IGNORECASE,
)
_QUALIFIED_NAME_RE = re.compile(r"`[\w.-]+\.(\w+)`")
_CTAS_RE = re.compile(
    r"CREATE\s+OR\s+REPLACE\s+TABLE\s+(\w+)\s*"
    r"(?:PARTITION\s+BY\s+[\w()]+\s*)?(?:CLUSTER\s+BY\s+[\w,\s]+?)?\s*AS",
    re.IGNORECASE,
)
_CVIEW_RE = re.compile(r"CREATE\s+OR\s+REPLACE\s+VIEW\s+(\w+)\s+AS", re.IGNORECASE)
_SCHEMA_RE = re.compile(
    r"CREATE\s+SCHEMA\s+IF\s+NOT\s+EXISTS\s+`?([\w.-]+)`?(\s+OPTIONS\s*\([^)]*\))?",
    re.IGNORECASE | re.DOTALL,
)

#: CTAS targets that receive the minted surrogate key in repair mode →
#: (column expression appended to the SELECT list)
_WEATHER_ID_REPAIRS = {
    "dim_weather": "concat_ws('|', market, cast(event_date AS string)) AS weather_id",
    # weather_id only — exposing a carried `market` column would make the
    # viz queries' bare `GROUP BY market` ambiguous against dim_weather
    "fact_ticket_sales": (
        "concat_ws('|', any_value(market), cast(event_date AS string)) AS weather_id"
    ),
}


class UnsupportedSQLError(ValueError):
    """A BigQuery construct this translator refuses to translate —
    semantics diverge from Spark or no mapping is implemented. Loud by
    design: the alternative is silent mistranslation."""


def split_statements(sql_text: str) -> list[str]:
    """Split a BigQuery script into statements; drop comment-only chunks.
    Quote- and comment-aware: a ``;`` inside a '…'/"…" literal or a ``--``
    comment does not split."""
    text = sql_text.replace("﻿", "")
    stmts, buf = [], []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in ("'", '"'):
            q = ch
            buf.append(ch)
            i += 1
            while i < n:
                buf.append(text[i])
                if text[i] == "\\" and i + 1 < n:  # escaped char inside literal
                    i += 1
                    buf.append(text[i])
                elif text[i] == q:
                    break
                i += 1
            i += 1
            continue
        if ch == "-" and text[i : i + 2] == "--":
            while i < n and text[i] != "\n":  # drop comment to EOL
                i += 1
            continue
        if ch == ";":
            stmts.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    stmts.append("".join(buf))
    return [s.strip() for s in stmts if s.strip()]


_LITERAL_RE = re.compile(r"'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"")


def _literal_spans(s: str) -> list[tuple[int, int]]:
    """(start, end) spans of every string literal in ``s`` — used to skip
    rewrite matches that START inside quoted text. A call whose ARGUMENTS
    contain literals is unaffected (its match starts outside them)."""
    return [m.span() for m in _LITERAL_RE.finditer(s)]


def _find_calls(s: str, fname: str):
    """Yield (start, open_paren, close_paren) index triples for every
    ``fname( ... )`` call with BALANCED parens, quote-aware. Matches whose
    start falls INSIDE a string literal are skipped — ``SELECT 'see
    DATE_ADD(d, INTERVAL 1 DAY)'`` must round-trip byte-identical, never
    have its literal contents rewritten (the module's "never silently
    wrong" contract applies to output TEXT too)."""
    pat = re.compile(rf"\b{fname}\s*\(", re.IGNORECASE)
    spans = _literal_spans(s)
    pos = 0
    while True:
        m = pat.search(s, pos)
        if not m:
            return
        if any(a <= m.start() < b for a, b in spans):
            pos = m.end()
            continue
        depth, i = 1, m.end()
        while i < len(s) and depth:
            c = s[i]
            if c in ("'", '"'):
                q = c
                i += 1
                while i < len(s) and s[i] != q:
                    i += 2 if s[i] == "\\" else 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        if depth:
            raise UnsupportedSQLError(f"unbalanced parentheses in {fname}(...) call")
        yield m.start(), m.end(), i - 1
        pos = i


def _split_args(args: str) -> list[str]:
    """Split a call's argument string on top-level commas, quote-aware."""
    out, depth, cur, i = [], 0, [], 0
    while i < len(args):
        c = args[i]
        if c in ("'", '"'):
            q = c
            cur.append(c)
            i += 1
            while i < len(args):
                cur.append(args[i])
                if args[i] == q:
                    break
                i += 1
        elif c == "(":
            depth += 1
            cur.append(c)
        elif c == ")":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        out.append("".join(cur).strip())
    return out


def _rewrite_calls(s: str, fname: str, fn) -> str:
    """Replace every balanced ``fname(args)`` call with ``fn(args_list)``
    (processed right-to-left so indices stay valid under nesting)."""
    calls = list(_find_calls(s, fname))
    for start, opn, close in reversed(calls):
        repl = fn(_split_args(s[opn:close]))
        s = s[:start] + repl + s[close + 1 :]
    return s


# strftime → Spark datetime-pattern tokens (the subset with exact
# equivalents; anything else raises rather than mistranslating)
_STRFTIME_TOKENS = {
    "%A": "EEEE", "%a": "EEE", "%B": "MMMM", "%b": "MMM",
    "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
    "%S": "ss", "%j": "DDD",
}


def _strftime_to_spark(fmt_literal: str) -> str:
    """Translate a quoted strftime format literal to a Spark pattern
    literal, or raise for tokens without an exact equivalent."""
    if not (fmt_literal.startswith("'") and fmt_literal.endswith("'")):
        raise UnsupportedSQLError(
            f"FORMAT_DATE format must be a string literal: {fmt_literal}"
        )
    body = fmt_literal[1:-1]
    out, i = [], 0
    while i < len(body):
        if body[i] == "%":
            tok = body[i : i + 2]
            if tok not in _STRFTIME_TOKENS:
                raise UnsupportedSQLError(
                    f"FORMAT_DATE token {tok!r} has no exact Spark equivalent"
                )
            out.append(_STRFTIME_TOKENS[tok])
            i += 2
        else:
            # literal chars: quote letters so Spark doesn't read them as
            # pattern tokens
            if body[i].isalpha():
                out.append(f"'{body[i]}'")
            else:
                out.append(body[i])
            i += 1
    return "'" + "".join(out).replace("''", "") + "'"


def _format_date(args: list[str]) -> str:
    if len(args) != 2:
        raise UnsupportedSQLError(f"FORMAT_DATE expects 2 args, got {len(args)}")
    return f"date_format({args[1]}, {_strftime_to_spark(args[0])})"


_INTERVAL_RE = re.compile(
    r"^INTERVAL\s+(.+?)\s+(DAY|WEEK|MONTH|QUARTER|YEAR)$", re.IGNORECASE | re.DOTALL
)


def _date_addsub(args: list[str], sign: str, fname: str) -> str:
    if len(args) != 2:
        raise UnsupportedSQLError(f"{fname} expects 2 args, got {len(args)}")
    m = _INTERVAL_RE.match(args[1].strip())
    if not m:
        # Spark's own 2-arg DATE_ADD(date, days): already valid — re-emit
        return f"{fname}({args[0]}, {args[1]})"
    n, unit = f"({m.group(1)})", m.group(2).upper()
    d = args[0]
    forms = {
        "DAY": f"date_add({d}, {sign}{n})",
        "WEEK": f"date_add({d}, {sign}(7 * {n}))",
        "MONTH": f"add_months({d}, {sign}{n})",
        "QUARTER": f"add_months({d}, {sign}(3 * {n}))",
        "YEAR": f"add_months({d}, {sign}(12 * {n}))",
    }
    return forms[unit]


def _date_diff(args: list[str]) -> str:
    if len(args) != 3:
        raise UnsupportedSQLError(f"DATE_DIFF expects 3 args, got {len(args)}")
    a, b, part = args[0], args[1], args[2].strip().upper()
    forms = {
        # BigQuery DATE_DIFF counts CALENDAR-BOUNDARY crossings — month
        # arithmetic on (year*12 + month), never months_between's fractions
        "DAY": f"datediff({a}, {b})",
        "MONTH": f"((year({a}) * 12 + month({a})) - (year({b}) * 12 + month({b})))",
        "QUARTER": f"((year({a}) * 4 + quarter({a})) - (year({b}) * 4 + quarter({b})))",
        "YEAR": f"(year({a}) - year({b}))",
        "ISOYEAR": f"(extract(YEAROFWEEK FROM {a}) - extract(YEAROFWEEK FROM {b}))",
    }
    if part not in forms:
        raise UnsupportedSQLError(
            f"DATE_DIFF part {part} not supported (BigQuery WEEK counts "
            "Sunday-anchored boundary crossings — no exact Spark equivalent)"
        )
    return forms[part]


_EXTRACT_PART_RE = re.compile(r"^\s*([A-Z_]+(?:\([^)]*\))?)\s+FROM\s+(.+)$",
                              re.IGNORECASE | re.DOTALL)

_EXTRACT_PASSTHROUGH = {
    "YEAR", "QUARTER", "MONTH", "DAY", "HOUR", "MINUTE", "SECOND", "DAYOFWEEK",
}


def _extract(args: list[str]) -> str:
    m = _EXTRACT_PART_RE.match(args[0]) if len(args) == 1 else None
    if not m:
        raise UnsupportedSQLError(f"unparseable EXTRACT: {args}")
    part, expr = m.group(1).upper(), m.group(2)
    if part in _EXTRACT_PASSTHROUGH:
        return f"extract({part} FROM {expr})"
    if part == "DAYOFYEAR":
        return f"extract(DOY FROM {expr})"
    if part == "ISOWEEK":
        return f"weekofyear({expr})"
    if part == "ISOYEAR":
        return f"extract(YEAROFWEEK FROM {expr})"
    if part == "DATE":
        return f"to_date({expr})"
    raise UnsupportedSQLError(
        f"EXTRACT part {part} not supported"
        + (
            " (BigQuery WEEK is Sunday-anchored and 0-based — no exact "
            "Spark equivalent; use ISOWEEK)"
            if part.startswith("WEEK")
            else ""
        )
    )


def _strip_literals(s: str) -> str:
    """Blank out string literals (for construct DETECTION only — avoids
    false positives on e.g. a literal containing 'UNNEST')."""
    return re.sub(r"'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"", "''", s)


def _sub_outside_literals(s: str, pattern: str, repl: str) -> str:
    """re.sub applied only to the segments of ``s`` outside string
    literals (so an alias name inside '…' text is never rewritten). The
    replacement is passed as a callable so ``repl`` is LITERAL text — a
    backslash or $-sequence in an inlined SQL expression must never be
    parsed as a regex template (re.error on '\\d', silent mangling on
    '\\1')."""
    parts = re.split(r"('(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\")", s)
    return "".join(
        p if i % 2 else re.sub(pattern, lambda _m: repl, p, flags=re.IGNORECASE)
        for i, p in enumerate(parts)
    )


def _top_level_matches(s: str, pattern: str) -> list[tuple[int, int]]:
    """(start, end) spans of ``pattern`` at paren-depth 0 outside string
    literals — how clause keywords (FROM, QUALIFY, ORDER BY…) are located
    without tripping on subqueries or literals."""
    pat = re.compile(pattern, re.IGNORECASE)
    out: list[tuple[int, int]] = []
    depth, i, n = 0, 0, len(s)
    while i < n:
        c = s[i]
        if c in ("'", '"'):
            q = c
            i += 1
            while i < n and s[i] != q:
                i += 2 if s[i] == "\\" else 1
            i += 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = pat.match(s, i)
            if m and m.end() > i:
                out.append((i, m.end()))
                i = m.end()
                continue
        i += 1
    return out


#: trailing words that are part of the expression, never a bare alias
_NOT_ALIAS = {
    "AND", "OR", "NOT", "AS", "END", "CASE", "THEN", "ELSE", "WHEN",
    "OVER", "BY", "ASC", "DESC", "NULLS", "FIRST", "LAST", "IN", "IS",
    "NULL", "TRUE", "FALSE", "LIKE", "BETWEEN", "INTERVAL", "DAY",
    "WEEK", "MONTH", "QUARTER", "YEAR",
}


def _select_item_alias(item: str) -> tuple[str, str] | None:
    """(alias, expression) of a select-list item, handling both ``expr AS
    alias`` and BigQuery's bare ``expr alias`` form. Bare aliases are
    recognized only when the preceding token clearly terminates an
    expression (a closing paren, identifier, or literal — never an
    operator or keyword), so ``a + b`` keeps ``b`` as an operand."""
    m = re.search(r"\s+AS\s+(`?)(\w+)\1\s*$", item, re.IGNORECASE)
    if m:
        return m.group(2), item[: m.start()].strip()
    m = re.search(r"^(?P<expr>.*?[\w)'\"`])\s+(?P<alias>[A-Za-z_]\w*)\s*$", item, re.DOTALL)
    if not m:
        return None
    expr, alias = m.group("expr").strip(), m.group("alias")
    if alias.upper() in _NOT_ALIAS:
        return None
    last_tok = re.split(r"[\s(,]+", expr)[-1]
    if last_tok.upper() in _NOT_ALIAS:
        return None
    return alias, expr


def _rewrite_qualify(s: str) -> str:
    """BigQuery ``QUALIFY <pred>`` → window-in-subquery rewrite (Spark has
    no QUALIFY):

        <prefix> SELECT <list> FROM ... [WHERE|GROUP BY|HAVING] QUALIFY p
        [ORDER BY o] [LIMIT n]
      →
        <prefix> SELECT * EXCEPT (__q) FROM (
            SELECT <list>, (p) AS __q FROM ... [WHERE|GROUP BY|HAVING]
        ) WHERE __q [ORDER BY o] [LIMIT n]

    The predicate may reference select-list aliases (including window
    functions) — Spark's lateral column alias resolution covers that.
    QUALIFY over set operations or SELECT DISTINCT raises (the wrap would
    change which query block the predicate binds to / the evaluation
    order), as does more than one top-level QUALIFY."""
    quals = _top_level_matches(s, r"\bQUALIFY\b")
    if not quals:
        return s
    if len(quals) > 1:
        raise UnsupportedSQLError("multiple top-level QUALIFY clauses")
    if _top_level_matches(s, r"\b(?:UNION|INTERSECT|EXCEPT)\b\s+(?:ALL\s+|DISTINCT\s+)?SELECT\b"):
        raise UnsupportedSQLError(
            "QUALIFY combined with set operations (wrap the branch in a subquery)"
        )
    selects = _top_level_matches(s, r"\bSELECT\b")
    if len(selects) != 1:
        raise UnsupportedSQLError("QUALIFY requires exactly one top-level SELECT")
    sel_start, sel_end = selects[0]
    if re.match(r"\s*DISTINCT\b", s[sel_end:], re.IGNORECASE):
        raise UnsupportedSQLError(
            "QUALIFY with SELECT DISTINCT (evaluation-order divergence)"
        )
    froms = [p for p in _top_level_matches(s, r"\bFROM\b") if p[0] > sel_end]
    if not froms:
        raise UnsupportedSQLError("QUALIFY without a top-level FROM")
    from_pos = froms[0][0]
    q_start, q_end = quals[0]
    tails = [
        p for p in _top_level_matches(s, r"\b(?:ORDER\s+BY|LIMIT)\b") if p[0] > q_end
    ]
    tail_pos = tails[0][0] if tails else len(s)
    pred = s[q_end:tail_pos].strip()
    if not pred:
        raise UnsupportedSQLError("empty QUALIFY predicate")
    prefix = s[:sel_start]
    select_list = s[sel_end:from_pos]
    body = s[from_pos:q_start]  # FROM ... WHERE/GROUP BY/HAVING
    tail = s[tail_pos:]
    # Substitute select-list aliases into the predicate: BigQuery QUALIFY
    # may reference them anywhere, but Spark refuses a lateral column alias
    # INSIDE a window expression (e.g. row_number() OVER (ORDER BY tot)
    # where tot = SUM(v)). Inlining the defining expression is the
    # BigQuery-equivalent form and sidesteps the limitation entirely.
    aliases: dict[str, str] = {}
    for item in _split_args(select_list):
        found = _select_item_alias(item)
        if found:
            alias, expr = found
            for a, e in aliases.items():  # resolve alias-on-alias chains
                expr = _sub_outside_literals(expr, rf"\b{re.escape(a)}\b", f"({e})")
            aliases[alias] = expr
    for a, e in aliases.items():
        pred = _sub_outside_literals(pred, rf"\b{re.escape(a)}\b", f"({e})")
    return (
        f"{prefix}SELECT * EXCEPT (__q) FROM (SELECT{select_list}, ({pred}) AS __q "
        f"{body}) WHERE __q {tail}"
    ).rstrip()


#: BigQuery constructs with no implemented/faithful Spark mapping: the
#: detector raises instead of letting them mistranslate or half-run.
_UNSUPPORTED_MARKERS = [
    (r"\bPARSE_(?:DATE|TIME|DATETIME|TIMESTAMP)\s*\(", "PARSE_* datetime parsing"),
    (r"\bFORMAT_(?:TIME|DATETIME|TIMESTAMP)\s*\(", "FORMAT_* (non-DATE) formatting"),
    (r"\b(?:TIMESTAMP|DATETIME|TIME)_(?:ADD|SUB|DIFF)\s*\(", "TIMESTAMP/DATETIME/TIME arithmetic"),
    (r"\bUNNEST\s*\(", "UNNEST (beyond the GENERATE_DATE_ARRAY day-spine form)"),
    (r"\bGENERATE_(?:DATE_)?ARRAY\s*\(", "GENERATE_ARRAY outside the day-spine form"),
    (r"\bSTRUCT\s*<", "typed STRUCT<> literals"),
    # QUALIFY is rewritten at top level (see _rewrite_qualify); one left
    # inside a subquery/CTE would reach Spark's parser, which has no
    # QUALIFY — catch it here with guidance instead.
    (r"\bQUALIFY\b", "QUALIFY inside a subquery/CTE (only top-level QUALIFY is rewritten)"),
    # SELECT * EXCEPT (...) passes through: Spark supports the identical
    # syntax natively. * REPLACE does not exist in Spark → still rejected.
    (r"\*\s+REPLACE\s*\(", "SELECT * REPLACE(...) projection"),
    (r"\bSAFE\.\w+", "SAFE.-prefixed function calls"),
    (r"\bFORMAT_DATE\s*\(", "FORMAT_DATE with an untranslated format"),
]


def _reject_unsupported(s: str) -> None:
    bare = _strip_literals(s)
    for pat, label in _UNSUPPORTED_MARKERS:
        m = re.search(pat, bare, re.IGNORECASE)
        if m:
            raise UnsupportedSQLError(
                f"BigQuery construct not supported by this translator: {label} "
                f"(at ~char {m.start()}: {bare[m.start():m.start()+40]!r})"
            )


def translate_statement(
    sql: str, mode: str = "view", repair_weather_id: bool = True
) -> str:
    """Translate one BigQuery statement to Spark SQL.

    ``mode="view"`` turns CTAS/CREATE VIEW into temp views (hermetic test
    execution); ``mode="table"`` emits real parquet CTAS.
    """
    s = _QUALIFIED_NAME_RE.sub(r"\1", sql)

    m = _SCHEMA_RE.search(s)
    if m:
        name = m.group(1).split(".")[-1]
        props = []
        opts = m.group(2) or ""
        ttl = re.search(r"default_table_expiration_days\s*=\s*(\d+)", opts, re.IGNORECASE)
        if ttl:
            # runtime counterpart: writers.vacuum_expired drops tables past
            # this TTL (BigQuery auto-expires them server-side)
            props.append(f"'default_table_expiration_days'='{ttl.group(1)}'")
        loc = re.search(r"location\s*=\s*'([^']*)'", opts, re.IGNORECASE)
        if loc:
            # a BigQuery *region*, not a filesystem path — recorded for
            # fidelity, not interpreted (Spark LOCATION means a warehouse dir)
            props.append(f"'bq.location'='{loc.group(1)}'")
        with_props = f" WITH DBPROPERTIES ({', '.join(props)})" if props else ""
        return f"CREATE DATABASE IF NOT EXISTS {name}{with_props}"

    ctas = _CTAS_RE.search(s)
    target = ctas.group(1) if ctas else None
    if ctas:
        if mode == "view":
            s = _CTAS_RE.sub(rf"CREATE OR REPLACE TEMPORARY VIEW {target} AS", s)
        else:
            part = re.search(r"PARTITION\s+BY\s+(?:DATE\()?(\w+)\)?", sql, re.IGNORECASE)
            header = f"CREATE OR REPLACE TABLE {target} USING parquet"
            if part:
                header += f" PARTITIONED BY ({part.group(1)})"
            s = _CTAS_RE.sub(header + " AS", s)
    else:
        cv = _CVIEW_RE.search(s)
        if cv and mode == "view":
            s = _CVIEW_RE.sub(rf"CREATE OR REPLACE TEMPORARY VIEW {cv.group(1)} AS", s)

    # day-spine rewrite FIRST: it consumes the one supported UNNEST form,
    # so the unsupported-construct detector below only sees leftovers.
    # The match CONTAINS quoted date args, so literal-splitting would break
    # it — instead skip only matches that START inside a literal.
    spans = _literal_spans(s)
    out, pos = [], 0
    for m in _DATE_ARRAY_RE.finditer(s):
        if m.start() < pos or any(a <= m.start() < b for a, b in spans):
            continue
        out.append(s[pos : m.start()])
        out.append(
            f"(SELECT explode(sequence(to_date({m.group(1)}), "
            f"to_date({m.group(2)}), interval 1 day)) AS {m.group(3)})"
        )
        pos = m.end()
    out.append(s[pos:])
    s = "".join(out)
    s = _rewrite_calls(s, "FORMAT_DATE", _format_date)
    s = _rewrite_calls(s, "EXTRACT", _extract)
    s = _rewrite_calls(s, "DATE_DIFF", _date_diff)
    s = _rewrite_calls(s, "DATE_ADD", lambda a: _date_addsub(a, "", "date_add"))
    s = _rewrite_calls(s, "DATE_SUB", lambda a: _date_addsub(a, "-", "date_sub"))
    # keyword renames go through the literal-splitting sub: a bare word
    # never spans a quote boundary, so segment-wise substitution is exact
    # and text inside '…' survives untouched
    s = _sub_outside_literals(s, r"\bSAFE_CAST\b", "try_cast")
    s = _sub_outside_literals(s, r"\bSAFE_DIVIDE\b", "try_divide")
    s = _sub_outside_literals(s, r"\bCOUNTIF\b", "count_if")
    s = _rewrite_qualify(s)
    _reject_unsupported(s)

    if repair_weather_id and target in _WEATHER_ID_REPAIRS:
        # append the minted key at the END of the SELECT list (before FROM)
        # so GROUP BY ordinals keep their meaning
        inject = _WEATHER_ID_REPAIRS[target]
        s = re.sub(r"\nFROM\b", f",\n  {inject}\nFROM", s, count=1)
    return s


def run_bigquery_script(spark, sql_text: str, mode: str = "view", repair_weather_id: bool = True):
    """Translate + execute every statement of a BigQuery script in order;
    returns the list of result DataFrames (one per statement)."""
    results = []
    for stmt in split_statements(sql_text):
        results.append(spark.sql(translate_statement(stmt, mode, repair_weather_id)))
    return results
