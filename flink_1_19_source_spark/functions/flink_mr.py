"""MATCH_RECOGNIZE statement execution (SURVEY §2.1 S12, §2.9 X5).

Flink SQL row-pattern recognition run verbatim: the dialect layer
parses the statement and drives the engine's CEP operator — the same
NFA every x5_* query certifies.  Split out of functions/flink_sql.py
(same public name, ``run_match_recognize``) to keep modules under the
house size bound.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .flink_sql import _split_top_level

# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE statement execution (Flink SQL row-pattern recognition;
# Spark has no MATCH_RECOGNIZE, so the dialect layer parses the statement
# and drives the engine's CEP operator — the same NFA every x5_* query
# certifies).  Supported subset (raises ValueError outside it): ONE ROW
# PER MATCH, AFTER MATCH SKIP PAST LAST ROW, PATTERN over variables with
# regex quantifiers (+ * ? {m,n}), DEFINE predicates of the form
# <V>.<col> = '<literal>' (OR-chains on the same column allowed; an
# undefined variable matches any leftover row, per the spec), MEASURES
# restricted to FIRST(<first-var>.<ts>), LAST(<last-var>.<ts>),
# COUNT(<v>.*) and COUNT(*).  WITHIN / SUBSET / SKIP TO have dedicated
# operator entry points (x5_pattern_within, x5_skip_to_variable, ...).
# ---------------------------------------------------------------------------
_MR_RE = re.compile(
    r"SELECT\s+(?P<select>.+?)\s+FROM\s+(?P<table>\w+)\s+"
    r"MATCH_RECOGNIZE\s*\((?P<body>.+)\)\s*(?:AS\s+)?(?P<alias>\w+)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _mr_clause(body: str, name: str, stop: str) -> str | None:
    m = re.search(
        rf"\b{name}\b\s+(.*?)(?=\b(?:{stop})\b|$)", body,
        re.IGNORECASE | re.DOTALL,
    )
    return m.group(1).strip() if m else None


def run_match_recognize(spark: SparkSession, query: str):
    """Execute a Flink MATCH_RECOGNIZE statement verbatim against
    registered views, routing the pattern to operators/cep."""
    from pyspark.sql import functions as F

    from ..operators import cep as cep_ops

    m = _MR_RE.search(query)
    if not m:
        raise ValueError("not a MATCH_RECOGNIZE statement")
    body = m.group("body")
    # PATTERN (...) WITHIN INTERVAL 'n' UNIT — extract the time bound
    # before clause slicing (it sits between PATTERN and DEFINE).
    within = None
    wm = re.search(
        r"\bWITHIN\s+INTERVAL\s+'(\d+)'\s+(\w+)", body, re.IGNORECASE
    )
    if wm:
        within = (int(wm.group(1)), wm.group(2).upper())
        body = body[: wm.start()] + body[wm.end():]
    for unsupported in ("SUBSET", "ALL ROWS", "SKIP TO"):
        if re.search(rf"\b{unsupported}\b", body, re.IGNORECASE):
            raise ValueError(
                f"{unsupported} not supported by the statement path — "
                "use the dedicated operator entry points"
            )
    stops = ("ORDER|MEASURES|ONE|AFTER|PATTERN|DEFINE")
    part = _mr_clause(body, r"PARTITION\s+BY", stops)
    order = _mr_clause(body, r"ORDER\s+BY", stops)
    measures = _mr_clause(body, "MEASURES", stops)
    pattern = _mr_clause(body, "PATTERN", stops)
    define = _mr_clause(body, "DEFINE", r"$ ")
    if not (part and order and pattern and define and measures):
        raise ValueError("MATCH_RECOGNIZE needs PARTITION BY, ORDER BY, "
                         "MEASURES, PATTERN and DEFINE")
    part_col = part.strip()
    order_cols = [c.strip() for c in order.split(",")]
    ts_col, id_col = order_cols[0], order_cols[-1]

    # DEFINE -> symbol classification (variables get chars A, B, C...)
    defs: dict[str, list[tuple[str, str]]] = {}
    for item in _split_top_level(define):
        dm = re.match(r"\s*(\w+)\s+AS\s+(.+)", item, re.IGNORECASE | re.DOTALL)
        if not dm:
            raise ValueError(f"unparseable DEFINE item: {item!r}")
        var, pred = dm.group(1), dm.group(2)
        conds = []
        for disjunct in re.split(r"\bOR\b", pred, flags=re.IGNORECASE):
            pm = re.match(
                rf"\s*{var}\.(\w+)\s*=\s*'([^']*)'\s*$", disjunct.strip(),
                re.IGNORECASE,
            )
            if not pm:
                raise ValueError(
                    f"DEFINE predicate outside the literal-equality "
                    f"subset: {disjunct.strip()!r}"
                )
            conds.append((pm.group(1), pm.group(2)))
        defs[var.upper()] = conds

    # PATTERN ( A B+ C ) -> regex over assigned chars, in PATTERN order
    pat_inner = pattern.strip()
    if pat_inner.startswith("("):
        pat_inner = pat_inner[1:pat_inner.rindex(")")]
    toks = re.findall(r"(\w+)([+*?]|\{\d+(?:,\d+)?\})?", pat_inner)
    toks = [(v, q) for v, q in toks if v]
    order_vars = [v.upper() for v, _ in toks]
    for v in order_vars:
        if v not in defs:
            raise ValueError(f"pattern variable {v} lacks a DEFINE "
                             "(the match-any variable is not supported)")
    chars = {v: chr(ord("A") + i) for i, v in enumerate(dict.fromkeys(order_vars))}
    regex = "".join(chars[v] + (q or "") for v, q in toks)

    extra = set(defs) - set(chars)
    if extra:
        raise ValueError(
            f"DEFINE variables not in PATTERN: {sorted(extra)}"
        )
    if within is not None and order_vars[0] in order_vars[1:]:
        # WITHIN runs as a post-filter on completed matches, which
        # equals the NFA's within-timer ONLY when a discarded too-long
        # match cannot hide a restart point: with disjoint DEFINE
        # classes (guarded above) and the start variable appearing
        # exactly once at pattern head, no row inside a completed match
        # can start another one.  A repeated start variable breaks that
        # argument — out of subset.
        raise ValueError(
            "WITHIN with a repeated start variable is outside the "
            "statement path's subset"
        )
    # Classification below is a first-wins F.when chain, which is only
    # equivalent to MATCH_RECOGNIZE's pattern-position admissibility when
    # the DEFINE predicates are mutually exclusive.  Two guards establish
    # that: (1) every DEFINE must test the SAME column — predicates over
    # different columns (S AS S.a='x', C AS C.b='y') can both hold on one
    # row, and first-wins would silently misclassify it; (2) on that
    # shared column, no two variables may claim the same literal.
    # Together they make the classes genuinely disjoint (equality on one
    # column with distinct literals cannot overlap), which is what the
    # WITHIN soundness argument above relies on.
    define_cols = {col.lower() for conds in defs.values() for col, _ in conds}
    if len(define_cols) > 1:
        raise ValueError(
            f"DEFINE predicates span multiple columns {sorted(define_cols)} "
            "— the statement path's subset needs all DEFINEs over one "
            "shared column so first-wins classification is disjoint"
        )
    seen_preds: dict[tuple[str, str], str] = {}
    for v, conds in defs.items():
        for col, lit in conds:
            key = (col.lower(), lit)
            if key in seen_preds and seen_preds[key] != v:
                raise ValueError(
                    f"DEFINE predicates overlap: {seen_preds[key]} and "
                    f"{v} both match {col} = {lit!r} — overlapping "
                    "definitions need positional admissibility, outside "
                    "the statement path's subset"
                )
            seen_preds[key] = v
    sym = None
    for v, conds in defs.items():
        for col, lit in conds:
            cond = F.col(col) == F.lit(lit)
            sym = F.when(cond, chars[v]) if sym is None else sym.when(cond, chars[v])
    sym = sym.otherwise("X")

    # MEASURES: validate against the operator's measure surface
    count_syms = []
    renames = {}
    first_var, last_var = order_vars[0], order_vars[-1]
    for item in _split_top_level(measures):
        mm = re.match(
            r"\s*(FIRST|LAST|COUNT)\s*\(\s*(?:(\w+)\.)?(\w+|\*)\s*\)\s+"
            r"AS\s+(\w+)\s*$", item, re.IGNORECASE,
        )
        if not mm:
            raise ValueError(f"unsupported MEASURES item: {item!r}")
        fn, var, arg, alias = (mm.group(1).upper(), (mm.group(2) or "").upper(),
                               mm.group(3), mm.group(4))
        if fn == "FIRST":
            if var != first_var or arg != ts_col:
                raise ValueError(
                    "FIRST measure must reference the pattern's first "
                    "variable's order column (operator surface)")
            renames["first_ts"] = alias
        elif fn == "LAST":
            if var != last_var or arg != ts_col:
                raise ValueError(
                    "LAST measure must reference the pattern's last "
                    "variable's order column (operator surface)")
            renames["last_ts"] = alias
        elif arg == "*" and var:
            count_syms.append(chars[var])
            renames[f"n_{chars[var].lower()}"] = alias
        else:
            renames["n_rows"] = alias

    res = cep_ops.match_recognize_measures(
        spark.table(m.group("table")), part_col, ts_col, id_col, sym,
        regex, count_syms=tuple(count_syms),
    ).withColumnRenamed("key", part_col)
    if within is not None:
        n, unit = within
        res = res.filter(
            F.col("last_ts") <= F.col("first_ts") + F.expr(
                f"INTERVAL {n} {unit}"
            )
        )
    for old, new in renames.items():
        res = res.withColumnRenamed(old, new)
    alias = m.group("alias") or "mr"
    res.createOrReplaceTempView(alias)
    try:
        return spark.sql(f"SELECT {m.group('select')} FROM {alias}")
    finally:
        pass
