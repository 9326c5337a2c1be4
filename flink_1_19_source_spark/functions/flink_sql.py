"""Flink-SQL compatibility shim (SURVEY §2.8): run Flink-flavored SQL on
Spark. Two mechanisms, both conservative and documented:

1. **Name aliases** — Flink built-ins whose Spark equivalent takes the
   same arguments under a different name are rewritten textually
   (word-boundary + '(' match, string-literal-safe enough for the
   documented subset).
2. **Registered shims** — Flink built-ins with no same-argument Spark
   twin are registered once per session as SQL-defined functions
   (CREATE TEMPORARY FUNCTION ... RETURN <expr>): Catalyst inlines the
   body at the call site, so they run as ordinary codegen'd expressions
   — no Python round-trip. Only RAND_INTEGER stays a Python UDF (it is
   nondeterministic by contract, so there is nothing to inline).

Covered subset (extend as needed): SPLIT_INDEX, TRUNCATE, STRCMP,
RAND_INTEGER, JSON_VALUE, REGEXP, TO_BASE64, FROM_BASE64; plus the
windowing TVFs — TABLE(TUMBLE/HOP/CUMULATE(TABLE t, DESCRIPTOR(ts),
...)) rewrite onto window()/covering-window subqueries (SESSION TVF
raises: keyed gap merge is not textual).
Flink semantics sources: Flink 1.19 "System (Built-in) Functions" docs
(upstream: flink-table-common BuiltInFunctionDefinitions).
"""

from __future__ import annotations

import random
import re

from pyspark.sql import DataFrame, SparkSession

#: Flink name → same-args Spark name
NAME_ALIASES = {
    "JSON_VALUE": "get_json_object",
    "REGEXP": "rlike",
    "TO_BASE64": "base64",
    "FROM_BASE64": "unbase64",
    "CHARACTER_LENGTH": "char_length",
}

_REGISTERED_FLAG = "_sg_flink_shims_registered"

#: SQL-defined shims: Catalyst inlines RETURN bodies at the call site —
#: plain codegen'd expressions, zero Python in the execution path.
#: Flink semantics sources: Flink 1.19 "System (Built-in) Functions".
_SQL_SHIMS = [
    # SPLIT_INDEX(str, delim, idx): plain-string delimiter (\Q..\E quotes
    # it for Spark's regex split), 0-based index, NULL out of range or on
    # any NULL arg (the no-ELSE CASE propagates nulls).
    r"""CREATE OR REPLACE TEMPORARY FUNCTION SPLIT_INDEX(s STRING, d STRING, i INT)
        RETURNS STRING
        RETURN CASE WHEN i >= 0 AND i < size(split(s, concat('\\Q', d, '\\E')))
                    THEN split(s, concat('\\Q', d, '\\E'))[i] END""",
    # STRCMP(a, b): -1/0/1 three-way compare, NULL on NULL input.
    r"""CREATE OR REPLACE TEMPORARY FUNCTION STRCMP(a STRING, b STRING)
        RETURNS INT
        RETURN CASE WHEN a = b THEN 0 WHEN a < b THEN -1 WHEN a > b THEN 1 END""",
    # TRUNCATE(numeric, d): truncate toward zero to d decimals.
    r"""CREATE OR REPLACE TEMPORARY FUNCTION TRUNCATE(x DOUBLE, d INT)
        RETURNS DOUBLE
        RETURN CASE WHEN x >= 0 THEN floor(x * power(10, d)) / power(10, d)
                    ELSE ceil(x * power(10, d)) / power(10, d) END""",
]


def _rand_integer(n):
    return None if n is None else random.randrange(n)


def register_shims(spark: SparkSession) -> None:
    """Idempotently register the Flink-name shims on this session."""
    if spark.conf.get(f"spark.{_REGISTERED_FLAG}", "no") == "yes":
        return
    from pyspark.sql.types import IntegerType

    for ddl in _SQL_SHIMS:
        spark.sql(ddl)
    # nondeterministic by contract — the one shim that stays a Python UDF
    spark.udf.register("RAND_INTEGER", _rand_integer, IntegerType())
    spark.conf.set(f"spark.{_REGISTERED_FLAG}", "yes")


#: session conf key the streaming layer publishes its combined watermark
#: under (streaming/partition_watermark.PartitionWatermarkTracker.publish)
WATERMARK_CONF = "spark.sg.currentWatermark"

_SIMILAR_RE = re.compile(
    r"(\bNOT\s+)?\bSIMILAR\s+TO\s+'([^']*)'", flags=re.IGNORECASE
)

_CURRENT_WM_RE = re.compile(r"\bCURRENT_WATERMARK\s*\([^)]*\)", flags=re.IGNORECASE)


def _rewrite_similar_to(query: str) -> str:
    """``x [NOT] SIMILAR TO '<literal>'`` → ``x [NOT] RLIKE '^(?:rx)$'``
    with the SQL:2016→regex translation from functions/similar_to.py.
    Literal patterns only (the documented dialect subset); RLIKE keeps the
    preceding operand expression untouched, so no operand parsing needed."""
    from .similar_to import similar_to_regex

    def sub(m: re.Match) -> str:
        neg = "NOT " if m.group(1) else ""
        rx = similar_to_regex(m.group(2)).replace("\\", "\\\\").replace("'", "''")
        return f"{neg}RLIKE '^(?:{rx})$'"

    return _SIMILAR_RE.sub(sub, query)


def _rewrite_current_watermark(query: str, spark: SparkSession | None) -> str:
    """``CURRENT_WATERMARK(rowtime)`` → the session's published combined
    watermark as a timestamp literal (NULL before any watermark exists —
    Flink's contract for a fresh pipeline). Statement-time evaluation: the
    right granularity for the micro-batch surface, where the watermark is
    constant within a batch."""
    if spark is None or not _CURRENT_WM_RE.search(query):
        return query
    wm = spark.conf.get(WATERMARK_CONF, None)
    lit = f"TIMESTAMP'{wm}'" if wm else "CAST(NULL AS TIMESTAMP)"
    return _CURRENT_WM_RE.sub(lit, query)


# ---------------------------------------------------------------------------
# Windowing TVFs — Flink's signature SQL syntax [docs: queries/window-tvf]:
#   TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '1' HOUR))
#   TABLE(HOP(TABLE t, DESCRIPTOR(ts), INTERVAL '15' MINUTE, INTERVAL '1' HOUR))
#   TABLE(CUMULATE(TABLE t, DESCRIPTOR(ts), INTERVAL '15' MINUTE, INTERVAL '1' HOUR))
# rewritten textually onto Spark subqueries that append the TVF's
# window_start / window_end / window_time columns.  TUMBLE maps to
# Spark's window() expression; HOP/CUMULATE expand each row to its
# covering windows with integer µs arithmetic (the same construction as
# operators/cumulate.py — no double rounding).  SESSION TVF (agg shape,
# the only one Flink supports) restructures onto Spark's
# session_window() grouping expression — see _rewrite_session_tvf.
# Positional-argument form only (the documented canonical shape).
# ---------------------------------------------------------------------------
_IVL = r"INTERVAL\s+'(\d+)'\s+(\w+)"
_TUMBLE_RE = re.compile(
    rf"TABLE\s*\(\s*TUMBLE\s*\(\s*TABLE\s+(\w+)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,\s*{_IVL}\s*\)\s*\)",
    re.IGNORECASE,
)
_HOP_RE = re.compile(
    rf"TABLE\s*\(\s*HOP\s*\(\s*TABLE\s+(\w+)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,\s*{_IVL}\s*,\s*{_IVL}\s*\)\s*\)",
    re.IGNORECASE,
)
_CUMULATE_RE = re.compile(
    rf"TABLE\s*\(\s*CUMULATE\s*\(\s*TABLE\s+(\w+)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,\s*{_IVL}\s*,\s*{_IVL}\s*\)\s*\)",
    re.IGNORECASE,
)
_SESSION_TVF_RE = re.compile(
    rf"TABLE\s*\(\s*SESSION\s*\(\s*TABLE\s+(\w+)"
    rf"(?:\s+PARTITION\s+BY\s+((?:\w+\s*,\s*)*\w+))?\s*,\s*"
    rf"DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,\s*{_IVL}\s*\)\s*\)",
    re.IGNORECASE,
)
_GROUP_BY_RE = re.compile(
    r"(GROUP\s+BY\s+)(.*?)(?=\bORDER\s+BY\b|\bHAVING\b|\bLIMIT\b|$)",
    re.IGNORECASE | re.DOTALL,
)

_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def _dur_us(n: str, unit: str) -> int:
    u = unit.lower().rstrip("s")
    if u not in _US:
        raise ValueError(f"unsupported window TVF interval unit: {unit}")
    return int(n) * _US[u]


def _rewrite_window_tvf(query: str) -> str:
    def tumble(m: re.Match) -> str:
        tbl, ts, n, unit = m.groups()
        dur = f"{n} {unit.lower()}"
        return (
            f"(SELECT *, window({ts}, '{dur}').start AS window_start,"
            f" window({ts}, '{dur}').end AS window_end,"
            f" window({ts}, '{dur}').end - INTERVAL 1 MILLISECOND"
            f" AS window_time FROM {tbl})"
        )

    def hop(m: re.Match) -> str:
        tbl, ts, sn, su, zn, zu = m.groups()
        slide, size = _dur_us(sn, su), _dur_us(zn, zu)
        if size % slide:
            raise ValueError("HOP size must be a multiple of slide")
        nk = size // slide
        ws = (
            f"timestamp_micros(CAST(floor(unix_micros({ts}) / {slide})"
            f" AS BIGINT) * {slide} - CAST(k_ AS BIGINT) * {slide})"
        )
        return (
            f"(SELECT * FROM (SELECT t_.*, {ws} AS window_start,"
            f" {ws} + INTERVAL {size} MICROSECOND AS window_end,"
            f" {ws} + INTERVAL {size - 1000} MICROSECOND AS window_time"
            f" FROM {tbl} t_"
            f" LATERAL VIEW explode(sequence(0, {nk - 1})) _e AS k_)"
            f" WHERE window_end > {ts})"
        )

    def cumulate(m: re.Match) -> str:
        tbl, ts, sn, su, zn, zu = m.groups()
        step, mx = _dur_us(sn, su), _dur_us(zn, zu)
        if mx % step:
            raise ValueError("CUMULATE max must be a multiple of step")
        bucket = (
            f"CAST(floor(unix_micros({ts}) / {mx}) AS BIGINT) * {mx}"
        )
        return (
            f"(SELECT * FROM (SELECT t_.*,"
            f" timestamp_micros({bucket}) AS window_start,"
            f" timestamp_micros({bucket} + CAST(k_ AS BIGINT) * {step}) AS window_end,"
            f" timestamp_micros({bucket} + CAST(k_ AS BIGINT) * {step} - 1000)"
            f" AS window_time FROM {tbl} t_"
            f" LATERAL VIEW explode(sequence(1, {mx // step})) _e AS k_)"
            f" WHERE window_end > {ts})"
        )

    def tumble_win(m: re.Match) -> str:
        _tbl, ts, n, unit = m.groups()
        return f"window({ts}, '{n} {unit.lower()}')"

    def hop_win(m: re.Match) -> str:
        _tbl, ts, sn, su, zn, zu = m.groups()
        if _dur_us(zn, zu) % _dur_us(sn, su):
            raise ValueError("HOP size must be a multiple of slide")
        # Spark window() is (size, slide) — Flink's argument order flips
        return f"window({ts}, '{zn} {zu.lower()}', '{sn} {su.lower()}')"

    # Agg-on-TVF (GROUP BY window_start, window_end[, keys]) collapses
    # onto Spark's native window() grouping expression — the plan
    # Catalyst wants, and the ONLY form Structured Streaming accepts in
    # append mode (grouping on derived plain columns loses the
    # watermark association).  The per-row covering-window subquery
    # form remains the fallback for non-aggregated TVF scans.
    out = query
    for tvf_re, win_fn, row_fn in (
        (_TUMBLE_RE, tumble_win, tumble),
        (_HOP_RE, hop_win, hop),
    ):
        restructured = _restructure_agg_on_tvf(out, tvf_re, win_fn)
        if restructured is not None:
            out = restructured
        else:
            out = tvf_re.sub(row_fn, out)
    out = _CUMULATE_RE.sub(cumulate, out)
    return _rewrite_session_tvf(out)


def _restructure_agg_on_tvf(query: str, tvf_re, win_fn):
    """If ``query`` is the canonical single-level agg-on-TVF shape for
    ``tvf_re``, collapse the GROUP BY onto the native grouping
    expression ``win_fn(match)`` and alias select-side window_start/
    window_end/window_time to its struct fields; returns the rewritten
    text, or None when not applicable (CTE/nested/multi-GROUP-BY
    statements fall back to the per-row covering-window form, which
    handles them)."""
    m = tvf_re.search(query)
    if not m:
        return None
    if not re.match(r"\s*SELECT\b", query, re.I):
        return None  # WITH-CTE prefix etc. — fall back
    if len(re.findall(r"\bGROUP\s+BY\b", query, re.I)) != 1:
        return None  # nested aggregations — fall back
    gm = _GROUP_BY_RE.search(query)
    if not gm:
        return None
    items = [c.strip().lower() for c in gm.group(2).split(",")]
    if "window_start" not in items or "window_end" not in items:
        return None
    win = win_fn(m)
    out = tvf_re.sub(m.group(1), query, count=1)
    return _apply_window_restructure(out, win)


def _split_top_level(text: str) -> list[str]:
    """Split a select list on commas not inside parentheses/quotes."""
    items, depth, start, in_str = [], 0, 0, False
    for i, ch in enumerate(text):
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            items.append(text[start:i])
            start = i + 1
    items.append(text[start:])
    return items


def _top_level_from_index(text: str) -> int:
    """Index of the first top-level ``FROM`` keyword — the same
    paren/quote-aware scan as ``_split_top_level``, so ``EXTRACT(HOUR
    FROM x)`` (inside parens) and a ``'FROM'`` string literal never
    terminate the SELECT list.  Returns -1 if absent."""
    depth, in_str = 0, False
    for i, ch in enumerate(text):
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif depth == 0 and ch in "fF":
            if (
                re.match(r"FROM\b", text[i:], re.I)
                and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_"))
            ):
                return i
    return -1


def _apply_window_restructure(out: str, win: str) -> str:
    """Shared GROUP BY collapse + SELECT-list field aliasing for the
    window()/session_window() grouping-expression rewrites."""

    def fix_group(gm: re.Match) -> str:
        items = [c.strip() for c in gm.group(2).split(",")]
        kept = [
            c for c in items
            if c.lower() not in ("window_start", "window_end") and c
        ]
        trail = "\n" if gm.group(2).endswith("\n") else " "
        return gm.group(1) + ", ".join([win] + kept) + trail

    fixed = _GROUP_BY_RE.sub(fix_group, out, count=1)
    # SELECT list only: a BARE select item `window_start` (or
    # `window_start AS x`) becomes the aliased field extraction, so
    # ORDER BY / HAVING references resolve against the output alias;
    # a token used INSIDE an expression (MAX(window_start),
    # window_end - window_start) substitutes the raw field extraction —
    # an alias mid-expression would be a parse error.
    sel_head = re.match(r"\s*SELECT\s+", fixed, re.I)
    from_idx = _top_level_from_index(fixed)
    if sel_head is None or from_idx < sel_head.end():
        raise ValueError("window TVF rewrite: no top-level FROM found")
    sel_list = fixed[sel_head.end():from_idx]
    exprs = {
        "window_start": f"{win}.start",
        "window_end": f"{win}.end",
        "window_time": f"{win}.end - INTERVAL 1 MILLISECOND",
    }
    items = []
    for item in _split_top_level(sel_list):
        stripped = item.strip().rstrip()
        bare = re.fullmatch(r"(\w+)(\s+AS\s+\w+)?", stripped, re.I)
        if bare and bare.group(1).lower() in exprs:
            expr = exprs[bare.group(1).lower()]
            alias = bare.group(2) or f" AS {bare.group(1)}"
            # preserve original whitespace envelope
            lead = item[: len(item) - len(item.lstrip())]
            trail = item[len(item.rstrip()):]
            items.append(f"{lead}{expr}{alias}{trail}")
        else:
            for tok, expr in exprs.items():
                item = re.sub(rf"\b{tok}\b", expr, item, flags=re.I)
            items.append(item)
    sel = ",".join(items)
    return fixed[: sel_head.end()] + sel + fixed[from_idx:]


def _rewrite_session_tvf(query: str) -> str:
    """``TABLE(SESSION(TABLE t [PARTITION BY k], DESCRIPTOR(ts), gap))``
    — the agg-on-TVF shape (the only one Flink 1.19 supports: session
    TVFs must be aggregated) maps onto Spark's ``session_window(ts,
    gap)`` grouping expression.  Unlike TUMBLE/HOP/CUMULATE, a session's
    window_start/window_end are group-level facts (gap merge), so the
    rewrite restructures the query instead of the FROM table alone:
    the TVF becomes the bare table, the GROUP BY's window_start/
    window_end pair collapses to the raw session_window() grouping
    expression (gap merging happens THERE), and select-side
    window_start/window_end/window_time references become field
    extractions of that same expression (Spark resolves them
    structurally against the grouping column)."""
    m = _SESSION_TVF_RE.search(query)
    if not m:
        return query
    if len(_SESSION_TVF_RE.findall(query)) > 1:
        raise ValueError("only one SESSION TVF per statement is supported")
    if not re.match(r"\s*SELECT\b", query, re.I):
        raise ValueError(
            "SESSION TVF supports the canonical single-level aggregation "
            "statement only (no WITH-CTE prefix); sessionize in a view "
            "or use the session_window operators directly"
        )
    _tbl, keys, ts, n, unit = m.groups()
    sw = f"session_window({ts}, '{int(n)} {unit.lower()}')"
    out = _SESSION_TVF_RE.sub(m.group(1), query, count=1)
    gm = _GROUP_BY_RE.search(out)
    if not gm:
        raise ValueError(
            "SESSION TVF requires an aggregation (GROUP BY window_start, "
            "window_end[, keys]) — Flink 1.19 supports no other shape"
        )
    # PARTITION BY keys stay as ordinary GROUP BY items — and must be
    # there, or the rewrite would gap-merge ACROSS keys while Flink
    # merges per key (silently different sessions)
    if keys:
        group_items = {c.strip().lower() for c in gm.group(2).split(",")}
        missing = [
            k.strip() for k in keys.split(",")
            if k.strip().lower() not in group_items
        ]
        if missing:
            raise ValueError(
                f"SESSION TVF PARTITION BY key(s) {missing} must appear "
                "in the GROUP BY — Flink gap-merges per key"
            )
    return _apply_window_restructure(out, sw)


# ---------------------------------------------------------------------------
# Legacy group windows — the pre-TVF Flink syntax still common in the
# wild [docs: queries/window-agg (legacy group window functions)]:
#   GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)    + TUMBLE_START/END accessors
#   GROUP BY HOP(ts, INTERVAL slide, INTERVAL size) + HOP_START/END
# map 1:1 onto Spark's window() grouping expression (note HOP's argument
# order flips: Flink is (slide, size), Spark window() is (size, slide)).
# SESSION legacy group windows map onto session_window() the same way.
# ---------------------------------------------------------------------------
_TUMBLE_ACC_RE = re.compile(
    rf"\bTUMBLE_(START|END)\s*\(\s*(\w+)\s*,\s*{_IVL}\s*\)", re.IGNORECASE
)
_TUMBLE_GRP_RE = re.compile(
    rf"\bTUMBLE\s*\(\s*(\w+)\s*,\s*{_IVL}\s*\)", re.IGNORECASE
)
_HOP_ACC_RE = re.compile(
    rf"\bHOP_(START|END)\s*\(\s*(\w+)\s*,\s*{_IVL}\s*,\s*{_IVL}\s*\)",
    re.IGNORECASE,
)
_HOP_GRP_RE = re.compile(
    rf"\bHOP\s*\(\s*(\w+)\s*,\s*{_IVL}\s*,\s*{_IVL}\s*\)", re.IGNORECASE
)
_SESSION_ACC_RE = re.compile(
    rf"\bSESSION_(START|END)\s*\(\s*(\w+)\s*,\s*{_IVL}\s*\)", re.IGNORECASE
)
_SESSION_GRP_RE = re.compile(
    rf"\bSESSION\s*\(\s*(\w+)\s*,\s*{_IVL}\s*\)", re.IGNORECASE
)


def _rewrite_legacy_group_windows(query: str) -> str:
    def dur(n: str, unit: str) -> str:
        return f"{n} {unit.lower()}"

    def tumble_acc(m: re.Match) -> str:
        which, ts, n, unit = m.groups()
        return f"window({ts}, '{dur(n, unit)}').{which.lower()}"

    def tumble_grp(m: re.Match) -> str:
        ts, n, unit = m.groups()
        return f"window({ts}, '{dur(n, unit)}')"

    def hop_acc(m: re.Match) -> str:
        which, ts, sn, su, zn, zu = m.groups()
        return (
            f"window({ts}, '{dur(zn, zu)}', '{dur(sn, su)}')"
            f".{which.lower()}"
        )

    def hop_grp(m: re.Match) -> str:
        ts, sn, su, zn, zu = m.groups()
        return f"window({ts}, '{dur(zn, zu)}', '{dur(sn, su)}')"

    def session_acc(m: re.Match) -> str:
        which, ts, n, unit = m.groups()
        return f"session_window({ts}, '{dur(n, unit)}').{which.lower()}"

    def session_grp(m: re.Match) -> str:
        ts, n, unit = m.groups()
        return f"session_window({ts}, '{dur(n, unit)}')"

    out = _TUMBLE_ACC_RE.sub(tumble_acc, query)
    out = _TUMBLE_GRP_RE.sub(tumble_grp, out)
    out = _HOP_ACC_RE.sub(hop_acc, out)
    out = _HOP_GRP_RE.sub(hop_grp, out)
    # legacy SESSION group windows map 1:1 too: SESSION(ts, gap) in the
    # GROUP BY is Spark's session_window(ts, gap) grouping expression,
    # SESSION_START/SESSION_END are its struct fields (gap-merged end =
    # last element + gap on both engines)
    out = _SESSION_ACC_RE.sub(session_acc, out)
    return _SESSION_GRP_RE.sub(session_grp, out)


# Flink 1.19 FLIP-373: per-operator state TTL via query hint —
# SELECT /*+ STATE_TTL('alias1'='2s', 'alias2'='4h') */ ...  The hint
# names table aliases of a regular (unwindowed) streaming join or
# group aggregation; state for that side expires after the duration of
# PROCESSING time.  Our proc-time clock is the micro-batch tick (the
# repo-wide W7 convention), declared as 1 tick == 1s, so '3s' = 3
# ticks; at deploy the trigger interval makes ticks wall-clock-spaced.
_STATE_TTL_HINT_RE = re.compile(
    r"/\*\+\s*STATE_TTL\s*\(([^)]*)\)\s*\*/", re.IGNORECASE
)
_STATE_TTL_ITEM_RE = re.compile(
    r"'([^']+)'\s*=\s*'(\d+)\s*"
    r"(s|sec|second|seconds|min|minute|minutes|h|hour|hours|d|day|days)'",
    re.IGNORECASE,
)
_TTL_UNIT_SECONDS = {
    "s": 1, "sec": 1, "second": 1, "seconds": 1,
    "min": 60, "minute": 60, "minutes": 60,
    "h": 3600, "hour": 3600, "hours": 3600,
    "d": 86400, "day": 86400, "days": 86400,
}


def parse_state_ttl(query: str) -> tuple[str, dict[str, int]]:
    """Extract a FLIP-373 ``STATE_TTL`` hint: returns (query with the
    hint removed, {alias: ttl_seconds}).  Raises on a hint whose items
    don't parse — a malformed TTL silently defaulting to infinite
    retention is exactly the bug the hint exists to prevent."""
    m = _STATE_TTL_HINT_RE.search(query)
    if not m:
        return query, {}
    body = m.group(1)
    ttls: dict[str, int] = {}
    consumed = 0
    for item in _STATE_TTL_ITEM_RE.finditer(body):
        alias, num, unit = item.groups()
        ttls[alias] = int(num) * _TTL_UNIT_SECONDS[unit.lower()]
        consumed += item.end() - item.start()
    leftovers = re.sub(_STATE_TTL_ITEM_RE, "", body).strip(" ,\t\n")
    if leftovers or not ttls:
        raise ValueError(f"malformed STATE_TTL hint: {body!r}")
    return (
        query[: m.start()] + query[m.end():],
        ttls,
    )


def translate(query: str, spark: SparkSession | None = None) -> str:
    """Rewrite the Flink dialect onto Spark SQL: window TVFs, legacy
    group windows, name aliases, SIMILAR TO, CURRENT_WATERMARK.  A
    FLIP-373 STATE_TTL hint is validated and STRIPPED: Spark's hint
    grammar rejects the quoted k='v' form outright, and TTL is a
    streaming-state concern with no batch semantics — the streaming
    runners consume the parsed TTLs through parse_state_ttl instead
    (s_state_ttl_hint_join / s_state_ttl_hint_agg)."""
    out, _ = parse_state_ttl(query)
    out = _rewrite_window_tvf(out)
    out = _rewrite_legacy_group_windows(out)
    for flink_name, spark_name in NAME_ALIASES.items():
        out = re.sub(
            rf"\b{flink_name}\s*\(", f"{spark_name}(", out, flags=re.IGNORECASE
        )
    out = _rewrite_similar_to(out)
    out = _rewrite_current_watermark(out, spark)
    return out


# Flink sql-client session statements [docs: sql/set]: SET 'k' = 'v'
# applies a session conf, bare SET lists them, RESET 'k' restores the
# default.  Spark analog: spark.conf; the statement result mirrors
# Flink's key/value echo.
_SET_RE = re.compile(r"^\s*SET\s+'([^']+)'\s*=\s*'([^']*)'\s*;?\s*$", re.I)
_RESET_RE = re.compile(r"^\s*RESET\s+'([^']+)'\s*;?\s*$", re.I)


def flink_sql(spark: SparkSession, query: str) -> DataFrame:
    """Execute Flink-flavored SQL: alias-translate, ensure shims, run.
    Tables must already be registered as views (tables.register_views).
    Session statements (SET 'k'='v' / RESET 'k') are executed against
    the Spark session conf and echo the key like Flink's sql client."""
    register_shims(spark)
    m = _SET_RE.match(query)
    if m:
        spark.conf.set(m.group(1), m.group(2))
        return spark.createDataFrame(
            [(m.group(1), m.group(2))], ["key", "value"]
        )
    m = _RESET_RE.match(query)
    if m:
        spark.conf.unset(m.group(1))
        return spark.createDataFrame([(m.group(1),)], ["key"])
    return spark.sql(translate(query, spark))


# ---------------------------------------------------------------------------
# EXPLAIN statement surface (Flink SQL: EXPLAIN [PLAN FOR |
# CHANGELOG_MODE | ESTIMATED_COST | PLAN_ADVICE] <statement>)
# ---------------------------------------------------------------------------

#: Spark physical node -> the Flink optimized-physical-plan operator name
#: it corresponds to, for the EXPLAIN PLAN surface.  Only nodes in this
#: map are reported — auxiliary nodes (ColumnarToRow, AQE wrappers,
#: ReusedExchange) are Spark mechanics with no Flink counterpart.
_PLAN_NODE_MAP = {
    "Scan parquet": "TableSourceScan",
    "Scan json": "TableSourceScan",
    "Scan csv": "TableSourceScan",
    "Filter": "Calc(where)",
    "Project": "Calc(select)",
    "HashAggregate": "HashAggregate",
    "SortAggregate": "SortAggregate",
    "Exchange": "Exchange",
    "Sort": "Sort",
    "BroadcastHashJoin": "Join(broadcast)",
    "SortMergeJoin": "Join(sortmerge)",
    "ShuffledHashJoin": "Join(shuffled-hash)",
    "BroadcastNestedLoopJoin": "NestedLoopJoin",
    "Window": "OverAggregate",
    "Expand": "Expand",
    "Generate": "Correlate",
    "TakeOrderedAndProject": "SortLimit",
}


def run_explain(spark: SparkSession, stmt: str) -> list[tuple[str, str]]:
    """Flink's EXPLAIN statement against the engine's own plan
    introspection (plans/audit.py): returns (section, item) rows.

    - ``EXPLAIN PLAN FOR <query>``: the distinct Flink-named operators
      of the optimized physical plan, plus the optimizer properties the
      plan-pin tests assert (filter pushdown reached the scan,
      whole-stage codegen present, exchange count) — LIVE introspection,
      so a plan regression changes the rows.
    - ``EXPLAIN CHANGELOG_MODE <query>``: the §7.4 changelog-kind
      inference — per-stage RowKind sets ([I] insert-only vs
      [I,UA,UB,D] retracting) and the sink plan the engine would pick
      (streaming/sinks.SINK_PLANS).
    - ``ESTIMATED_COST`` / ``PLAN_ADVICE``: declared out of surface
      (Spark exposes no per-operator cost model to report honestly).
    """
    from ..plans import audit
    from ..streaming import sinks as _sinks

    m = re.match(
        r"\s*EXPLAIN\s+(PLAN\s+FOR|CHANGELOG_MODE|ESTIMATED_COST|"
        r"PLAN_ADVICE)\s+(.+)$",
        stmt,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"unparseable EXPLAIN statement: {stmt!r}")
    detail = re.sub(r"\s+", " ", m.group(1).upper())
    query = m.group(2).strip()
    if detail in ("ESTIMATED_COST", "PLAN_ADVICE"):
        raise ValueError(
            f"EXPLAIN {detail} is out of surface: Spark exposes no "
            "per-operator cost model to report honestly"
        )

    if detail == "PLAN FOR":
        df = spark.sql(translate(query, spark))
        txt = audit.plan_text(df)
        nodes = set()
        for line in txt.splitlines():
            nm = re.match(r"\(\d+\)\s+(.*?)(?:\s+\[codegen.*)?$", line)
            if not nm:
                continue
            name = nm.group(1).strip()
            for spark_name, flink_name in _PLAN_NODE_MAP.items():
                if name == spark_name or name.startswith(spark_name + " "):
                    nodes.add(flink_name)
                    break
        out = [("node", n) for n in sorted(nodes)]
        out.append(
            (
                "prop",
                "filter_pushdown="
                + str(any("PushedFilters: [" in s and "]" != s.split(
                    "PushedFilters: [", 1)[1].lstrip()[0:1]
                    for s in audit.scans(df))).lower(),
            )
        )
        out.append(
            ("prop", f"codegen={str(audit.has_whole_stage_codegen(df)).lower()}")
        )
        out.append(("prop", f"exchanges={audit.shuffle_count(df)}"))
        return out

    # CHANGELOG_MODE: §7.4 changelog-kind inference from the statement
    # shape.  Subset: single SELECT, optional WHERE, optional GROUP BY
    # (windowed via TUMBLE/HOP/CUMULATE/SESSION/window() or unwindowed).
    q = re.sub(r"\s+", " ", query)
    if not re.match(r"SELECT\b", q, re.IGNORECASE):
        raise ValueError("EXPLAIN CHANGELOG_MODE supports SELECT statements")
    has_group = re.search(r"\bGROUP\s+BY\b", q, re.IGNORECASE) is not None
    rows = [("changelog", "source=[I]")]
    if has_group:
        windowed = re.search(
            r"\b(TUMBLE|HOP|CUMULATE|SESSION)\s*\(|\bwindow\s*\(",
            q,
            re.IGNORECASE,
        ) is not None
        if windowed:
            plan = _sinks.plan_sink("windowed_agg")
            rows.append(("changelog", "aggregate=[I]"))
        else:
            plan = _sinks.plan_sink("global_agg")
            rows.append(("changelog", "aggregate=[I,UA,UB,D]"))
    else:
        plan = _sinks.plan_sink("stateless")
    rows.append(
        ("changelog", f"sink={plan.output_mode}+{plan.sink}")
    )
    return rows
