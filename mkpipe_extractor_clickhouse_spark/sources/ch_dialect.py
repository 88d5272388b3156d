"""ClickHouse-SQL → Spark-SQL translation for ``custom_query``.

The reference forwards ``custom_query`` strings verbatim to ClickHouse
(``/root/reference/mkpipe_extractor_clickhouse/__init__.py:96-99``), so
a user switching to this engine arrives with ClickHouse-dialect SQL.
``translate()`` rewrites a DOCUMENTED SUBSET of that dialect into Spark
SQL so those queries keep running unchanged; anything outside the
subset passes through untouched (valid ANSI is valid Spark) or raises
``ChDialectError`` with a pointer to the native operator that covers
the construct (FINAL → ch_replacing_final, SAMPLE → ch_sample_key).

Supported rewrites
------------------
* function renames: ``toDate``→``to_date``, ``toYear``→``year``,
  ``uniqExact``→``count(DISTINCT …)``, ``uniq``/``uniqCombined``→
  ``approx_count_distinct``, ``groupArray``→``collect_list``,
  ``groupUniqArray``→``collect_set``, ``any``→``first``,
  ``anyLast``→``last``, ``argMin``/``argMax``→``min_by``/``max_by``,
  ``arrayJoin``→``explode``, ``has``→``array_contains``,
  ``toStartOfDay/Hour/Month``→``date_trunc(...)``,
  ``toUnixTimestamp``→``unix_timestamp``, ``today``→``current_date``,
  ``now``→``current_timestamp``, ``toInt*/toFloat*/toString``→casts.
* conditional combinators with argument surgery (paren-aware):
  ``countIf(c)``→``count_if(c)``,
  ``sumIf/avgIf/minIf/maxIf(x, c)``→``agg(CASE WHEN c THEN x END)``.
* argument swaps: ``splitByChar(sep, s)``→``split(s, sep)``,
  ``position(haystack, needle)``→``position(needle, haystack)``.
* parameterized aggregates: ``quantileExact(p)(x)``→
  ``percentile(x, p)``, ``quantile(p)(x)``→``percentile_approx(x, p)``.
* ``intDiv(a, b)``→``(a DIV b)``; ``multiIf(c1,v1,…,else)``→``CASE``.
* ``toDayOfWeek``→Monday-1 arithmetic (Spark's dayofweek is Sunday-1).
* clause surgery: ``PREWHERE``→``WHERE`` (merged with AND if both
  present), ``LIMIT n BY cols``→row_number window filter (requires an
  ORDER BY for determinism).
* ``FINAL`` and ``SAMPLE`` raise ChDialectError naming the native
  replacement operator rather than silently changing semantics.

Scope note: this is a pragmatic string-level rewriter with a
paren-aware argument splitter, not a full parser — the documented
subset is what it promises, and tests/test_ch_dialect.py pins every
mapping with an executed example.
"""

from __future__ import annotations

import re

__all__ = ["translate", "ChDialectError"]


class ChDialectError(ValueError):
    """A ClickHouse construct whose semantics cannot be preserved by
    string translation; the message names the native operator to use."""


# ---------------------------------------------------------------------------
# paren-aware helpers
# ---------------------------------------------------------------------------


def _match_paren(s: str, open_idx: int) -> int:
    """Index of the ')' matching s[open_idx] == '(' (quote-aware)."""
    depth = 0
    i = open_idx
    in_str: str | None = None
    while i < len(s):
        c = s[i]
        if in_str:
            if c == in_str:
                in_str = None
        elif c in ("'", '"'):
            in_str = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ChDialectError(f"unbalanced parentheses in: {s[open_idx:open_idx+40]}…")


def _split_args(arglist: str) -> list[str]:
    """Split a function argument list on top-level commas."""
    args: list[str] = []
    depth = 0
    cur = []
    in_str: str | None = None
    for c in arglist:
        if in_str:
            cur.append(c)
            if c == in_str:
                in_str = None
            continue
        if c in ("'", '"'):
            in_str = c
            cur.append(c)
        elif c == "(":
            depth += 1
            cur.append(c)
        elif c == ")":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
    tail = "".join(cur).strip()
    if tail:
        args.append(tail)
    return args


def _rewrite_calls(sql: str, name: str, fn) -> str:
    """Replace every call ``name(args…)`` via ``fn(args: list[str]) ->
    str``. Arguments are rewritten recursively FIRST, and scanning
    resumes after each replacement — so a rewrite whose output still
    contains the source name (e.g. the ``position`` argument swap)
    terminates instead of re-matching its own output."""
    pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
    out = sql
    pos = 0
    while True:
        m = pat.search(out, pos)
        if not m:
            return out
        open_idx = out.index("(", m.start())
        close_idx = _match_paren(out, open_idx)
        args = [
            _rewrite_calls(a, name, fn)
            for a in _split_args(out[open_idx + 1 : close_idx])
        ]
        repl = fn(args)
        out = out[: m.start()] + repl + out[close_idx + 1 :]
        pos = m.start() + len(repl)


def _rewrite_parameterized(sql: str, name: str, fn) -> str:
    """Replace ``name(params)(args)`` (ClickHouse parameterized
    aggregate syntax) via ``fn(params, args) -> str``."""
    pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
    out = sql
    pos = 0
    while True:
        m = pat.search(out, pos)
        if not m:
            return out
        p_open = out.index("(", m.start())
        p_close = _match_paren(out, p_open)
        rest = out[p_close + 1 :].lstrip()
        if not rest.startswith("("):
            raise ChDialectError(
                f"{name} requires the parameterized form {name}(p)(x)"
            )
        a_open = p_close + 1 + (len(out[p_close + 1 :]) - len(rest))
        a_close = _match_paren(out, a_open)
        params = _split_args(out[p_open + 1 : p_close])
        args = _split_args(out[a_open + 1 : a_close])
        repl = fn(params, args)
        out = out[: m.start()] + repl + out[a_close + 1 :]
        pos = m.start() + len(repl)


# ---------------------------------------------------------------------------
# the mapping tables
# ---------------------------------------------------------------------------

# plain renames: same arity, same argument order
_RENAMES = {
    "toDate": "to_date",
    "toDateTime": "to_timestamp",
    "toYear": "year",
    "toMonth": "month",
    "toDayOfMonth": "day",
    "toHour": "hour",
    "toMinute": "minute",
    "toSecond": "second",
    "toUnixTimestamp": "unix_timestamp",
    "uniqExact": "count_distinct",
    "uniq": "approx_count_distinct",
    "uniqCombined": "approx_count_distinct",
    "uniqHLL12": "approx_count_distinct",
    "groupArray": "collect_list",
    "groupUniqArray": "collect_set",
    "anyLast": "last",
    "any": "first",
    "argMin": "min_by",
    "argMax": "max_by",
    "arrayJoin": "explode",
    "has": "array_contains",
    "countIf": "count_if",
    "lcase": "lower",
    "ucase": "upper",
    "arrayDistinct": "array_distinct",
    "arrayReverse": "reverse",
    "arrayConcat": "concat",
    "indexOf": "array_position",
    "startsWith": "startswith",
    "endsWith": "endswith",
    "leftPad": "lpad",
    "rightPad": "rpad",
    "substringUTF8": "substring",
    "lengthUTF8": "length",
    "ifNull": "ifnull",
    "assumeNotNull": "",
}

_CASTS = {
    "toInt8": "tinyint",
    "toInt16": "smallint",
    "toInt32": "int",
    "toInt64": "bigint",
    "toUInt8": "int",
    "toUInt16": "int",
    "toUInt32": "bigint",
    "toUInt64": "bigint",
    "toFloat32": "float",
    "toFloat64": "double",
    "toString": "string",
}

_TRUNCS = {
    "toStartOfDay": "DAY",
    "toStartOfHour": "HOUR",
    "toStartOfMinute": "MINUTE",
    "toStartOfMonth": "MONTH",
    "toStartOfQuarter": "QUARTER",
    "toStartOfYear": "YEAR",
}

_AGG_IF = {"sumIf": "sum", "avgIf": "avg", "minIf": "min", "maxIf": "max"}


def _translate_functions(sql: str) -> str:
    out = sql

    # zero-arg nows first (plain text replace, word-bounded)
    out = re.sub(r"\btoday\s*\(\s*\)", "current_date()", out, flags=re.IGNORECASE)
    out = re.sub(
        r"\byesterday\s*\(\s*\)",
        "date_sub(current_date(), 1)",
        out,
        flags=re.IGNORECASE,
    )
    out = re.sub(r"\bnow\s*\(\s*\)", "current_timestamp()", out, flags=re.IGNORECASE)

    # parameterized aggregates before plain renames (quantile vs quantileExact)
    out = _rewrite_parameterized(
        out,
        "quantileExact",
        lambda p, a: f"percentile({a[0]}, {p[0]})",
    )
    out = _rewrite_parameterized(
        out,
        "quantile",
        lambda p, a: f"percentile_approx({a[0]}, {p[0]})",
    )

    # conditional-aggregate combinators (argument surgery)
    for ch, spark_agg in _AGG_IF.items():
        out = _rewrite_calls(
            out,
            ch,
            lambda a, s=spark_agg: f"{s}(CASE WHEN {a[1]} THEN {a[0]} END)",
        )

    # argument swaps
    out = _rewrite_calls(out, "splitByChar", lambda a: f"split({a[1]}, {a[0]})")
    out = _rewrite_calls(out, "position", lambda a: f"position({a[1]}, {a[0]})")

    # casts
    for ch, sql_type in _CASTS.items():
        out = _rewrite_calls(
            out, ch, lambda a, t=sql_type: f"CAST({a[0]} AS {t.upper()})"
        )

    # date_trunc family
    for ch, unit in _TRUNCS.items():
        out = _rewrite_calls(
            out, ch, lambda a, u=unit: f"date_trunc('{u}', {a[0]})"
        )

    # Monday-first day of week: CH toDayOfWeek = 1 (Mon) … 7 (Sun);
    # Spark dayofweek = 1 (Sun) … 7 (Sat).
    out = _rewrite_calls(
        out,
        "toDayOfWeek",
        lambda a: f"(((dayofweek({a[0]}) + 5) % 7) + 1)",
    )

    # Spark's DIV needs integral operands; ClickHouse's intDiv accepts
    # floats (truncating them) — the casts reproduce that for the
    # documented nonnegative range and are no-ops on integer inputs.
    out = _rewrite_calls(
        out,
        "intDiv",
        lambda a: f"(CAST({a[0]} AS BIGINT) DIV CAST({a[1]} AS BIGINT))",
    )

    def _multi_if(args: list[str]) -> str:
        if len(args) < 3 or len(args) % 2 == 0:
            raise ChDialectError("multiIf needs cond,val pairs + else")
        parts = ["CASE"]
        for i in range(0, len(args) - 1, 2):
            parts.append(f"WHEN {args[i]} THEN {args[i + 1]}")
        parts.append(f"ELSE {args[-1]} END")
        return " ".join(parts)

    out = _rewrite_calls(out, "multiIf", _multi_if)

    # toYYYYMM after the cast family (it emits a cast itself)
    out = _rewrite_calls(
        out,
        "toYYYYMM",
        lambda a: f"CAST(date_format({a[0]}, 'yyyyMM') AS INT)",
    )

    # higher-order array functions: ClickHouse puts the lambda FIRST
    # (arrayMap(x -> …, arr)); Spark puts it last. Lambda syntax itself
    # (x -> expr) is identical in both dialects.
    for ch, spark_name in (
        ("arrayMap", "transform"),
        ("arrayFilter", "filter"),
        ("arrayExists", "exists"),
        ("arrayAll", "forall"),
    ):
        out = _rewrite_calls(
            out,
            ch,
            lambda a, s=spark_name: f"{s}({', '.join(a[1:])}, {a[0]})",
        )

    # countSubstrings(haystack, needle) → occurrence count via the
    # length-difference identity (both engines, same integer result)
    out = _rewrite_calls(
        out,
        "countSubstrings",
        lambda a: (
            f"((length({a[0]}) - length(replace({a[0]}, {a[1]}, '')))"
            f" DIV length({a[1]}))"
        ),
    )

    # more lambda-first array functions
    out = _rewrite_calls(
        out,
        "arrayCount",
        lambda a: f"size(filter({', '.join(a[1:])}, {a[0]}))",
    )
    out = _rewrite_calls(
        out,
        "arrayFirst",
        lambda a: f"try_element_at(filter({', '.join(a[1:])}, {a[0]}), 1)",
    )
    out = _rewrite_calls(
        out,
        "arrayFirstIndex",
        lambda a: (
            f"coalesce(array_position({', '.join(a[1:])}, "
            f"try_element_at(filter({', '.join(a[1:])}, {a[0]}), 1)), 0)"
        ),
    )

    # arraySort(arr) renames; the key-lambda form has no Spark
    # equivalent (array_sort takes a two-arg comparator, not a key)
    def _array_sort(a: list[str]) -> str:
        if len(a) > 1 or "->" in a[0]:
            raise ChDialectError(
                "arraySort with a key lambda has no direct Spark "
                "equivalent; sort a struct projection instead"
            )
        return f"array_sort({a[0]})"

    out = _rewrite_calls(out, "arraySort", _array_sort)

    # arrayStringConcat(arr[, sep]) → array_join(arr, sep)
    out = _rewrite_calls(
        out,
        "arrayStringConcat",
        lambda a: f"array_join({a[0]}, {a[1] if len(a) > 1 else repr('')})",
    )

    # empty/notEmpty (arrays; ClickHouse also applies them to strings —
    # size() returns -1 for NULL either way, so the comparison is safe)
    out = _rewrite_calls(out, "notEmpty", lambda a: f"(size({a[0]}) > 0)")
    out = _rewrite_calls(out, "empty", lambda a: f"(size({a[0]}) = 0)")

    # date arithmetic: addDays(x, n) → timestampadd(DAY, n, x), etc.
    for ch, unit in (
        ("addSeconds", "SECOND"),
        ("addMinutes", "MINUTE"),
        ("addHours", "HOUR"),
        ("addDays", "DAY"),
        ("addWeeks", "WEEK"),
        ("addMonths", "MONTH"),
        ("addYears", "YEAR"),
    ):
        out = _rewrite_calls(
            out, ch, lambda a, u=unit: f"timestampadd({u}, {a[1]}, {a[0]})"
        )
        sub = "subtract" + ch[3:]
        out = _rewrite_calls(
            out, sub, lambda a, u=unit: f"timestampadd({u}, -({a[1]}), {a[0]})"
        )

    # dateDiff('day', a, b) → timestampdiff(DAY, a, b)
    def _date_diff(a: list[str]) -> str:
        unit = a[0].strip().strip("'\"").upper()
        return f"timestampdiff({unit}, {a[1]}, {a[2]})"

    out = _rewrite_calls(out, "dateDiff", _date_diff)

    # regex / prefix predicates
    out = _rewrite_calls(out, "match", lambda a: f"({a[0]} RLIKE {a[1]})")

    # ClickHouse's named arithmetic/comparison operator functions
    # (generated SQL uses these instead of infix operators)
    for ch, op in (
        ("plus", "+"),
        ("minus", "-"),
        ("multiply", "*"),
        ("divide", "/"),
        ("modulo", "%"),
        ("equals", "="),
        ("notEquals", "<>"),
        ("less", "<"),
        ("greater", ">"),
        ("lessOrEquals", "<="),
        ("greaterOrEquals", ">="),
    ):
        out = _rewrite_calls(
            out, ch, lambda a, o=op: f"({a[0]} {o} {a[1]})"
        )
    out = _rewrite_calls(out, "negate", lambda a: f"(-({a[0]}))")
    out = _rewrite_calls(out, "isNull", lambda a: f"({a[0]} IS NULL)")
    out = _rewrite_calls(
        out, "isNotNull", lambda a: f"({a[0]} IS NOT NULL)"
    )
    # arrayElement(arr, i) → element_at (both 1-based; ClickHouse's
    # negative index = from-the-end matches element_at too)
    out = _rewrite_calls(
        out, "arrayElement", lambda a: f"element_at({a[0]}, {a[1]})"
    )

    # JSON extraction: JSONExtractString(j, 'k') → get_json_object
    out = _rewrite_calls(
        out,
        "JSONExtractString",
        lambda a: f"get_json_object({a[0]}, concat('$.', {a[1]}))",
    )
    out = _rewrite_calls(
        out,
        "JSONExtractInt",
        lambda a: (
            f"CAST(get_json_object({a[0]}, concat('$.', {a[1]})) AS BIGINT)"
        ),
    )
    out = _rewrite_calls(
        out,
        "JSONExtractFloat",
        lambda a: (
            f"CAST(get_json_object({a[0]}, concat('$.', {a[1]})) AS DOUBLE)"
        ),
    )

    # plain renames last (uniqExact before uniq is handled by dict
    # order + word boundary with the longer name first)
    for ch, spark_name in sorted(
        _RENAMES.items(), key=lambda kv: -len(kv[0])
    ):
        if ch == "uniqExact":
            out = _rewrite_calls(
                out, ch, lambda a: f"count(DISTINCT {', '.join(a)})"
            )
        else:
            out = re.sub(
                rf"\b{ch}\s*\(", f"{spark_name}(", out, flags=re.IGNORECASE
            )
    return out


# ---------------------------------------------------------------------------
# clause surgery
# ---------------------------------------------------------------------------

_FINAL_RE = re.compile(r"\bFROM\s+([A-Za-z_][\w.]*)\s+FINAL\b", re.IGNORECASE)
_SETTINGS_RE = re.compile(
    r"\bSETTINGS\s+\w+\s*=\s*[^,\s]+(\s*,\s*\w+\s*=\s*[^,\s]+)*",
    re.IGNORECASE,
)
_SAMPLE_RE = re.compile(r"\bSAMPLE\s+[\d./]+", re.IGNORECASE)
_PREWHERE_RE = re.compile(r"\bPREWHERE\b", re.IGNORECASE)
_LIMIT_BY_RE = re.compile(
    r"\bLIMIT\s+(\d+)\s+BY\s+(.+?)(?=(\bLIMIT\b|\bSETTINGS\b|$))",
    re.IGNORECASE | re.DOTALL,
)
_ORDER_BY_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)


def _translate_clauses(
    sql: str,
    final_dedup_keys: tuple[str, ...] = (),
    final_order_col: str | None = None,
) -> str:
    # execution-engine knobs have no Spark meaning; drop harmlessly
    sql = _SETTINGS_RE.sub("", sql).rstrip()

    m = _FINAL_RE.search(sql)
    if m:
        if not final_dedup_keys or not final_order_col:
            raise ChDialectError(
                "FINAL depends on the table engine's dedup key; either "
                "configure dedup_keys + iterate_column on the table (the "
                "translator then emulates ReplacingMergeTree FINAL) or "
                "use the ch_replacing_final / ch_collapsing_final "
                "operators instead"
            )
        tbl = m.group(1)
        keys = ", ".join(final_dedup_keys)
        sub = (
            f"FROM (SELECT * EXCEPT (__rn) FROM (SELECT *, row_number() "
            f"OVER (PARTITION BY {keys} ORDER BY {final_order_col} DESC) "
            f"AS __rn FROM {tbl}) WHERE __rn = 1) {tbl}"
        )
        sql = sql[: m.start()] + sub + sql[m.end() :]
    if _SAMPLE_RE.search(sql):
        raise ChDialectError(
            "SAMPLE k is engine-defined sampling; use the deterministic "
            "key-hash sampling of ch_sample_key instead"
        )

    # PREWHERE → WHERE (merge when both present: CH applies both)
    if _PREWHERE_RE.search(sql):
        if re.search(r"\bWHERE\b", sql, re.IGNORECASE):
            # PREWHERE cond WHERE cond2  →  WHERE (cond) AND (cond2)
            m = _PREWHERE_RE.search(sql)
            w = re.search(r"\bWHERE\b", sql, re.IGNORECASE)
            pre_cond = sql[m.end() : w.start()].strip()
            sql = (
                sql[: m.start()]
                + f"WHERE ({pre_cond}) AND "
                + sql[w.end() :].lstrip()
            )
        else:
            sql = _PREWHERE_RE.sub("WHERE", sql)

    # LIMIT n BY cols → row_number window filter
    m = _LIMIT_BY_RE.search(sql)
    if m:
        n, cols = int(m.group(1)), m.group(2).strip().rstrip(",")
        om = _ORDER_BY_RE.search(sql)
        if not om or om.start() > m.start():
            raise ChDialectError(
                "LIMIT n BY requires an ORDER BY before it for a "
                "deterministic translation"
            )
        # ORDER BY clause text runs up to the LIMIT BY
        order_expr = sql[om.end() : m.start()].strip().rstrip(",")
        inner = (sql[: om.start()] + sql[m.end(2) :]).strip()
        trailing = ""
        # a trailing plain LIMIT k stays on the outer query
        tl = re.search(r"\bLIMIT\s+\d+\s*$", inner, re.IGNORECASE)
        if tl:
            trailing = " " + inner[tl.start() :].strip()
            inner = inner[: tl.start()].strip()
        return (
            f"SELECT * EXCEPT (__rn) FROM (SELECT *, row_number() OVER "
            f"(PARTITION BY {cols} ORDER BY {order_expr}) AS __rn "
            f"FROM ({inner})) WHERE __rn <= {n} "
            f"ORDER BY {cols}, __rn{trailing}"
        )
    return sql


def translate(
    sql: str,
    final_dedup_keys: tuple[str, ...] = (),
    final_order_col: str | None = None,
) -> str:
    """ClickHouse-dialect SQL → Spark SQL (documented subset).

    ``final_dedup_keys`` + ``final_order_col`` let ``FROM t FINAL``
    translate into a keep-latest-version dedup subquery (the
    ReplacingMergeTree contract) using the key/version columns the
    table config already declares; without them FINAL raises."""
    return _translate_clauses(
        _translate_functions(sql), final_dedup_keys, final_order_col
    )
