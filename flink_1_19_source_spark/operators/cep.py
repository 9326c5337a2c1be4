"""MATCH_RECOGNIZE-lite: regex pattern matching over per-key event
sequences (SURVEY §2.9 X5; Flink CEP / SQL MATCH_RECOGNIZE, upstream
flink-libraries/flink-cep + flink-table-planner MatchRecognize nodes).

Batch semantics implemented here; the contiguous-pattern subset:

- events are grouped by key and ordered by (ts, id);
- each row is classified to a single-character symbol;
- a Python regex engine (a compiled NFA — the same machinery Flink's CEP
  NFA implements in Java) scans the per-key symbol string left-to-right,
  non-overlapping — equivalent to MATCH_RECOGNIZE's default
  AFTER MATCH SKIP PAST LAST ROW;
- each match is emitted with its row span mapped back to event ids.

Scale shape: one shuffle on the key (applyInPandas group-map); per-key
work is linear in sequence length. Keys are independent — 1000 executors
each match their own key ranges. The streaming twin (incremental NFA in
keyed state) is streaming/cep_stream.py.
"""

from __future__ import annotations

import re
from typing import Callable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MATCH_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("match_no", LongType()),
        StructField("start_id", LongType()),
        StructField("end_id", LongType()),
        StructField("n_rows", LongType()),
        StructField("start_ts", TimestampType()),
        StructField("end_ts", TimestampType()),
    ]
)


def _scan_by_key(
    prepared: DataFrame,
    key_col: str,
    sort_cols: list[str],
    schema: StructType,
    run,
) -> DataFrame:
    """Run a per-key pandas scan over key-sorted partitions via
    ``mapInPandas`` instead of per-key ``applyInPandas``.

    With many short keys (the CEP norm: thousands of users, tens of
    rows each) ``groupBy().applyInPandas`` pays a ~2 ms Arrow
    round-trip AND a tiny output-DataFrame construction PER GROUP —
    measured as ~85% of several operators' sf0.1 runtime.  This helper
    keeps the exact same per-key semantics (``run`` receives every row
    of one key, pre-sorted by ``sort_cols``, exactly as applyInPandas
    delivered it — but returns a LIST OF TUPLES) while amortizing both
    costs across a whole partition: one repartition on the key (the
    same single shuffle), a partition-local sort, a generator that
    slices contiguous key runs — buffering across Arrow batch
    boundaries so a key split by the batch size is still scanned
    whole — and ONE output DataFrame per input Arrow batch instead of
    one per key."""
    cols = [f.name for f in schema.fields]

    def gen(batches):
        import numpy as np

        cur, buf = None, []

        def flush():
            if not buf:
                return []
            pdf = (
                pd.concat(buf, ignore_index=True)
                if len(buf) > 1
                else buf[0]
            )
            return run(pdf)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            keys = pdf[key_col].to_numpy()
            change = (np.flatnonzero(keys[1:] != keys[:-1]) + 1).tolist()
            starts = [0, *change]
            ends = [*change, len(pdf)]
            for s, e in zip(starts, ends):
                k = keys[s]
                seg = pdf.iloc[s:e]
                if cur is not None and k == cur:
                    buf.append(seg)
                    continue
                rows.extend(flush())
                cur, buf = k, [seg]
            if rows:
                yield pd.DataFrame(rows, columns=cols)
        rows = flush()
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    return (
        prepared.repartition(F.col(key_col))
        .sortWithinPartitions(key_col, *sort_cols)
        .mapInPandas(gen, schema)
    )


def match_recognize_lite(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    symbol: Column,
    pattern: str,
) -> DataFrame:
    """Contiguous-pattern MATCH_RECOGNIZE over (key, time)-ordered events.

    `symbol` must evaluate to a single-character string per row; `pattern`
    is a regex over those characters (e.g. ``AB+C``). Returns one row per
    match with the matched span."""
    compiled = re.compile(pattern)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # rows arrive (ts, id)-sorted from _scan_by_key's partition sort
        s = "".join(pdf["__sym"])
        ids = pdf[id_col].to_numpy()
        tss = pdf[ts_col].to_numpy()
        out = []
        for i, m in enumerate(compiled.finditer(s)):
            a, b = m.start(), m.end() - 1
            out.append(
                (
                    int(pdf[key_col].iloc[0]),
                    i + 1,
                    int(ids[a]),
                    int(ids[b]),
                    b - a + 1,
                    tss[a],
                    tss[b],
                )
            )
        return out

    prepared = df.select(
        F.col(key_col), F.col(ts_col), F.col(id_col), symbol.alias("__sym")
    )
    return _scan_by_key(prepared, key_col, [ts_col, id_col], MATCH_SCHEMA, run)


def match_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    symbol: Column,
    pattern: str,
) -> DataFrame:
    """Aggregate-only MATCH_RECOGNIZE fast path: per-key match count and
    longest match length, entirely in Catalyst (no Python).

    The per-key symbol string is built with
    array_sort(collect_list(struct(ts, id, sym))) → concat — struct
    ordering gives the (ts, id) event order — and scanned with
    regexp_extract_all on the JVM. Left-to-right non-overlapping regex
    matching ≡ AFTER MATCH SKIP PAST LAST ROW, same as the NFA path.
    ~10× faster than match_recognize_lite when spans/ids aren't needed:
    one shuffle, whole-stage codegen, no per-key Python calls."""
    seq = (
        df.select(
            F.col(key_col).alias("key"),
            F.struct(F.col(ts_col), F.col(id_col), symbol.alias("sym")).alias("e"),
        )
        .groupBy("key")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("e")), lambda x: x["sym"]
                ),
            ).alias("s")
        )
    )
    # Column-API call (not string interpolation) so a pattern containing
    # quotes/backslashes can't break out of — or silently change — the SQL
    m = F.regexp_extract_all(F.col("s"), F.lit(pattern), F.lit(0))
    return (
        seq.select(
            "key",
            F.size(m).cast("long").alias("n_matches"),
            F.coalesce(
                F.array_max(F.transform(m, F.length)), F.lit(0)
            ).cast("long").alias("longest_match"),
        )
        .filter(F.col("n_matches") > 0)
    )


def match_recognize_measures(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    symbol: Column,
    pattern: str,
    count_syms: tuple[str, ...] = (),
) -> DataFrame:
    """MATCH_RECOGNIZE with per-symbol MEASURES over an arbitrary pattern
    — alternations (``(C|V)`` ≡ ``[CV]``) and bounded quantifiers
    (``{m,n}``) included [docs: match_recognize#defining-a-pattern].

    MEASURES: ``n_rows`` (COUNT(*)) plus one ``n_<s>`` column per entry
    of ``count_syms`` (COUNT(s.*)), FIRST/LAST ts, start/end ids.
    Default AFTER MATCH SKIP PAST LAST ROW (non-overlapping, leftmost).
    Same scale shape as match_recognize_lite: one shuffle on the key,
    linear per-key scan, Arrow transfer."""
    compiled = re.compile(pattern)
    fields = [
        StructField("key", LongType()),
        StructField("match_no", LongType()),
        StructField("start_id", LongType()),
        StructField("end_id", LongType()),
        StructField("n_rows", LongType()),
    ]
    fields += [StructField(f"n_{s.lower()}", LongType()) for s in count_syms]
    fields += [
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
    schema = StructType(fields)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # rows arrive (ts, id)-sorted from _scan_by_key's partition sort
        s = "".join(pdf["__sym"])
        ids = pdf[id_col].to_numpy()
        tss = pdf[ts_col].to_numpy()
        key = int(pdf[key_col].iloc[0])
        out = []
        for i, m in enumerate(compiled.finditer(s)):
            a, b = m.start(), m.end() - 1
            seg = s[a : b + 1]
            out.append(
                (
                    key,
                    i + 1,
                    int(ids[a]),
                    int(ids[b]),
                    b - a + 1,
                    *(seg.count(cs) for cs in count_syms),
                    tss[a],
                    tss[b],
                )
            )
        return out

    prepared = df.select(
        F.col(key_col), F.col(ts_col), F.col(id_col), symbol.alias("__sym")
    )
    return _scan_by_key(prepared, key_col, [ts_col, id_col], schema, run)


SKIP_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("match_no", LongType()),
        StructField("start_id", LongType()),
        StructField("end_id", LongType()),
        StructField("n_rows", LongType()),
        StructField("b_rows", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)

SKIP_SCHEMA_BOTH = StructType(
    [StructField("skip_mode", StringType())] + list(SKIP_SCHEMA.fields)
)


def match_recognize_skip(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    symbol: Column,
    pattern: str,
    skip: str = "past_last_row",
    count_sym: str = "B",
) -> DataFrame:
    """MATCH_RECOGNIZE with an explicit AFTER MATCH SKIP mode + MEASURES.

    Flink's two overlap policies [docs: match_recognize#after-match-strategy]:

    - ``past_last_row`` (the default everywhere else in this module):
      resume the scan after the match's last row — matches never overlap.
    - ``to_next_row``: resume at the row after the match's FIRST row —
      matches may overlap (e.g. ``CB*C`` over ``CBCBC`` yields two
      matches sharing the middle C).

    MEASURES emitted per match: ``first_ts`` (FIRST(ts)), ``last_ts``
    (LAST(ts)), ``n_rows`` (COUNT(*)), ``b_rows`` (COUNT of the
    ``count_sym``-classified rows inside the match).

    Same scale shape as match_recognize_lite: one shuffle on the key,
    linear per-key scan.  ``skip="both"`` evaluates BOTH policies in the
    single per-key pass (the string scan is repeated task-locally; the
    data is shuffled and Arrow-transferred once) and prefixes each row
    with a ``skip_mode`` column — for side-by-side policy comparison
    without a second job."""
    if skip not in ("past_last_row", "to_next_row", "both"):
        raise ValueError(f"unknown AFTER MATCH SKIP mode: {skip}")
    compiled = re.compile(pattern)
    modes = (
        ["past_last_row", "to_next_row"] if skip == "both" else [skip]
    )
    schema = SKIP_SCHEMA_BOTH if skip == "both" else SKIP_SCHEMA

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # rows arrive (ts, id)-sorted from _scan_by_key's partition sort
        s = "".join(pdf["__sym"])
        ids = pdf[id_col].to_numpy()
        tss = pdf[ts_col].to_numpy()
        key = int(pdf[key_col].iloc[0])
        out = []
        for mode in modes:
            to_next = mode == "to_next_row"
            pos = n = 0
            while True:
                m = compiled.search(s, pos)
                if m is None:
                    break
                a, b = m.start(), m.end() - 1
                n += 1
                seg = s[a : b + 1]
                row = (
                    key,
                    n,
                    int(ids[a]),
                    int(ids[b]),
                    b - a + 1,
                    seg.count(count_sym),
                    tss[a],
                    tss[b],
                )
                out.append((mode, *row) if skip == "both" else row)
                # empty-match guard: always advance at least one position
                pos = a + 1 if to_next else max(a + 1, m.end())
        return out

    prepared = df.select(
        F.col(key_col), F.col(ts_col), F.col(id_col), symbol.alias("__sym")
    )
    return _scan_by_key(prepared, key_col, [ts_col, id_col], schema, run)


def classify(mapping: dict[str, str], other: str = "X") -> Callable[[Column], Column]:
    """Build a classifier column: event_type value → one-char symbol."""

    def apply(col: Column) -> Column:
        expr = None
        for val, sym in mapping.items():
            cond = F.when(col == val, sym)
            expr = cond if expr is None else expr.when(col == val, sym)
        return expr.otherwise(other)

    return apply


SKIP_TO_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("match_no", LongType()),
        StructField("start_id", LongType()),
        StructField("end_id", LongType()),
        StructField("n_rows", LongType()),
        StructField("s_rows", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
        StructField("s_first_ts", TimestampType()),
        StructField("s_last_ts", TimestampType()),
    ]
)


def subset_measures(
    m: "re.Match", subset_groups: tuple[str, ...]
) -> tuple[int, int | None, int | None]:
    """SUBSET union measures from a match's named-group spans:
    (COUNT(S.*), index of FIRST(S) row, index of LAST(S) row) — shared
    by the batch operator and the streaming keyed-state twin so the
    semantics cannot diverge."""
    spans = [
        (m.start(g), m.end(g))
        for g in subset_groups
        if m.start(g) != -1 and m.end(g) > m.start(g)
    ]
    s_rows = sum(e - st for st, e in spans)
    s_first = min(st for st, _ in spans) if spans else None
    s_last = max(e for _, e in spans) - 1 if spans else None
    return s_rows, s_first, s_last


def skip_to_resume(m: "re.Match", resume_group: str) -> int:
    """AFTER MATCH SKIP TO <variable> resume position (inclusive), with
    Flink's cannot-advance guard: a target at or before the match start
    (including a variable that did not participate) raises."""
    resume = m.start(resume_group)
    if resume <= m.start():
        raise ValueError(
            f"AFTER MATCH SKIP TO {resume_group} cannot advance "
            f"past the match start (Flink raises here too)"
        )
    return resume


def match_recognize_skip_to(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    symbol: Column,
    pattern: str,
    resume_group: str,
    subset_groups: tuple[str, ...],
) -> DataFrame:
    """MATCH_RECOGNIZE with ``AFTER MATCH SKIP TO <variable>`` and a
    ``SUBSET`` union measure [docs: match_recognize#after-match-strategy,
    #define--measures (SUBSET)].

    Pattern variables are regex NAMED GROUPS: ``resume_group`` names the
    variable the scan resumes AT after each match (inclusive — Flink's
    SKIP TO LAST <var>; the row can start the next match, which is how
    chained matches share their boundary row).  ``subset_groups`` is the
    SUBSET definition: the union of those variables' rows yields
    ``s_rows`` (COUNT(S.*)), ``s_first_ts`` (FIRST(S.ts)) and
    ``s_last_ts`` (LAST(S.ts)).

    Flink raises when a skip target cannot advance the scan (SKIP TO
    FIRST A on a match starting at A loops forever); the same guard
    raises here if the resume position is not strictly after the
    previous match's start.

    Scale shape unchanged from match_recognize_skip: one shuffle on the
    key, linear per-key scan, keys independent across executors."""
    compiled = re.compile(pattern)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # rows arrive (ts, id)-sorted from _scan_by_key's partition sort
        s = "".join(pdf["__sym"])
        ids = pdf[id_col].to_numpy()
        tss = pdf[ts_col].to_numpy()
        key = int(pdf[key_col].iloc[0])
        out = []
        pos = n = 0
        while True:
            m = compiled.search(s, pos)
            if m is None:
                break
            a, b = m.start(), m.end() - 1
            n += 1
            s_rows, s_first, s_last = subset_measures(m, subset_groups)
            out.append(
                (
                    key,
                    n,
                    int(ids[a]),
                    int(ids[b]),
                    b - a + 1,
                    s_rows,
                    tss[a],
                    tss[b],
                    tss[s_first] if s_first is not None else None,
                    tss[s_last] if s_last is not None else None,
                )
            )
            pos = skip_to_resume(m, resume_group)
        return out

    prepared = df.select(
        F.col(key_col), F.col(ts_col), F.col(id_col), symbol.alias("__sym")
    )
    return _scan_by_key(prepared, key_col, [ts_col, id_col], SKIP_TO_SCHEMA, run)


# ---------------------------------------------------------------------------
# Row-pattern exclusions: PATTERN (A {- B -} C)  [ISO SQL:2016 R020]
# ---------------------------------------------------------------------------

_EXCL_SECTION = re.compile(r"\{-\s*(.*?)\s*-\}")

EXCL_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("match_no", LongType()),
        StructField("start_id", LongType()),
        StructField("end_id", LongType()),
        StructField("n_rows", LongType()),
        StructField("excl_rows", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)


def compile_exclusions(pattern: str) -> tuple["re.Pattern", list[str]]:
    """Translate row-pattern exclusion syntax ``{- sub -}`` into named
    groups so the matched-but-excluded spans can be subtracted from the
    measures.  Returns (compiled regex, exclusion group names).

    Documented limitation: an exclusion nested under an OUTER quantifier
    keeps only its final iteration's span (regex group semantics); the
    supported surface is exclusions at pattern top level — every shape
    the SQL:2016 examples and Flink's MATCH_RECOGNIZE docs show."""
    names: list[str] = []

    def repl(m: "re.Match") -> str:
        name = f"xcl{len(names)}"
        names.append(name)
        return f"(?P<{name}>{m.group(1)})"

    return re.compile(_EXCL_SECTION.sub(repl, pattern)), names


def exclusion_matches(
    compiled: "re.Pattern", names: list[str], s: str
) -> list[tuple[int, int, list[int]]]:
    """Non-overlapping scan (AFTER MATCH SKIP PAST LAST ROW): per match
    yields (start, end_inclusive, included_positions) with the excluded
    groups' spans subtracted — shared by the batch operator, the
    streaming keyed-state twin, and the fuzz tests so the semantics
    cannot diverge."""
    out = []
    for m in compiled.finditer(s):
        a, b = m.start(), m.end() - 1
        spans = [m.span(n) for n in names if m.span(n) != (-1, -1)]
        included = [
            i for i in range(a, b + 1)
            if not any(lo <= i < hi for lo, hi in spans)
        ]
        out.append((a, b, included))
    return out


def match_recognize_exclusion(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    symbol: Column,
    pattern: str,
) -> DataFrame:
    """MATCH_RECOGNIZE with row-pattern exclusions — ``{- B -}`` rows
    advance the automaton (they MUST be present for the match) but are
    dropped from the output/measures [ISO SQL:2016 row-pattern
    exclusion; the one MATCH_RECOGNIZE clause Flink 1.19's docs list as
    unsupported — implemented here to the standard's semantics].

    start_id/end_id/first_ts/last_ts/n_rows are computed over the
    INCLUDED rows only; ``excl_rows`` reports how many matched rows the
    exclusion removed.  A match whose rows are ALL excluded emits
    nothing (it still consumes its span — SKIP PAST LAST ROW).  Same
    scale shape as every batch CEP operator here: one shuffle on the
    key, linear per-key scan, Arrow transfer."""
    compiled, names = compile_exclusions(pattern)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # rows arrive (ts, id)-sorted from _scan_by_key's partition sort
        s = "".join(pdf["__sym"])
        ids = pdf[id_col].to_numpy()
        tss = pdf[ts_col].to_numpy()
        key = int(pdf[key_col].iloc[0])
        out = []
        for a, b, inc in exclusion_matches(compiled, names, s):
            if not inc:
                continue
            out.append(
                (
                    key,
                    len(out) + 1,
                    int(ids[inc[0]]),
                    int(ids[inc[-1]]),
                    len(inc),
                    (b - a + 1) - len(inc),
                    tss[inc[0]],
                    tss[inc[-1]],
                )
            )
        return out

    prepared = df.select(
        F.col(key_col), F.col(ts_col), F.col(id_col), symbol.alias("__sym")
    )
    return _scan_by_key(prepared, key_col, [ts_col, id_col], EXCL_SCHEMA, run)


# ---------------------------------------------------------------------------
# Iterative conditions (Flink CEP IterativeCondition / MATCH_RECOGNIZE
# DEFINE referencing FIRST(<var>) — the condition of a row depends on the
# partial match it would extend, so rows CANNOT be pre-classified to
# symbols and regex-scanned like the paths above).
# ---------------------------------------------------------------------------

ITER_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("match_no", LongType()),
        StructField("start_id", LongType()),
        StructField("end_id", LongType()),
        StructField("b_rows", LongType()),
        StructField("anchor_value", DoubleType()),
        StructField("end_value", DoubleType()),
        StructField("start_ts", TimestampType()),
        StructField("end_ts", TimestampType()),
    ]
)

# Automaton state for PATTERN (A B+ C) with iterative DEFINEs
#   B AS B.value > FIRST(A.value),   C AS C.value < FIRST(A.value)
# st = (phase, anchor_val, anchor_id, anchor_ts_us, b_count);
# phase 0 = seeking an A row, phase 1 = inside an attempt anchored at A.
ITER_SEEK = (0, 0.0, 0, 0, 0)


def iterative_step(st, sym: str, val: float, rid: int, ts_us: int):
    """One step of the iterative-condition NFA; shared by the batch scan
    and the streaming keyed-state twin so the semantics cannot diverge.

    Returns (new_state, match) where match is None or the tuple
    (start_id, end_id, b_rows, anchor_value, end_value, start_ts_us,
    end_ts_us).  An A row (re)anchors unconditionally — a fresh attempt
    supersedes a pending one, which together with the disjoint symbol
    alphabet makes the single forward pass exactly MATCH_RECOGNIZE's
    backtracking scan with AFTER MATCH SKIP PAST LAST ROW (no row inside
    a failed attempt can start a match except the failing row itself,
    and this step function restarts on that row when it is an A)."""
    phase, a_val, a_id, a_ts, b = st
    if sym == "A":
        return (1, val, rid, ts_us, 0), None
    if phase == 1:
        if sym == "B" and val > a_val:
            return (1, a_val, a_id, a_ts, b + 1), None
        if sym == "C" and b >= 1 and val < a_val:
            return ITER_SEEK, (a_id, rid, b, a_val, val, a_ts, ts_us)
    return ITER_SEEK, None


def match_recognize_iterative(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    symbol: Column,
) -> DataFrame:
    """MATCH_RECOGNIZE with ITERATIVE conditions — the Flink CEP
    ``IterativeCondition`` surface (SQL ``DEFINE B AS B.value >
    FIRST(A.value)``): a row's symbol validity depends on the match
    being built, so the engine evaluates conditions against the partial
    match (here: the anchoring A row's value) instead of pre-classifying.

    PATTERN (A B+ C), DEFINE B AS B.value > FIRST(A.value),
    C AS C.value < FIRST(A.value); one shuffle on the key, per-key work
    linear in sequence length, O(1) scan state — the same keyed layout
    Flink's CEP operator uses, and the same step function the streaming
    twin (streaming/cep_stream.streaming_match_iterative) runs
    incrementally.

    100 TB path, two layers (equivalence pinned by
    tests/test_r8_tail.py::test_iterative_prepass_is_exact):

    1. A Catalyst PREPASS eliminates dead rows before any Python runs,
       so the per-row interpreter cost is paid only on rows inside live
       attempts.  The invariant is exact, not heuristic: every A
       re-anchors, so within an anchor group (grp = running count of A
       rows) the automaton is live only until the first row that is not
       a condition-satisfying B — that row (the "breaker") either
       completes a match (a valid C) or kills the attempt, and every
       later row in the group is provably ignored (phase 0 until the
       next A, which starts the next group).  The prepass keeps
       anchor..breaker spans only — all running-frame window
       expressions over ONE key-partition sort, whole-stage-codegen'd.
    2. The Python scan runs as ``mapInPandas`` over key-sorted
       partitions, NOT per-key ``applyInPandas``: with many short keys
       the per-group Arrow round-trip (~2 ms each) dwarfs the scan
       itself (measured 3.4 s of a 3.8 s sf0.1 run).  One generator per
       partition amortizes it; the automaton state resets at key
       boundaries and carries across Arrow batch boundaries within a
       partition, still driven by the unchanged shared step function —
       the single source of semantics for batch and stream."""

    def scan(batches):
        cur_key, st, nmatch = None, ITER_SEEK, 0
        cols = [f.name for f in ITER_SCHEMA.fields]
        for pdf in batches:
            out = []
            # .tolist() first: element-wise Series iteration pays a
            # boxing cost per row that dominates long partitions
            tss = pdf[ts_col].to_numpy("datetime64[us]").astype("int64")
            for k, sym, val, rid, ts in zip(
                pdf[key_col].tolist(), pdf["__sym"].tolist(),
                pdf[value_col].tolist(), pdf[id_col].tolist(),
                tss.tolist(),
            ):
                if k != cur_key:
                    cur_key, st, nmatch = k, ITER_SEEK, 0
                st, m = iterative_step(
                    st, sym, float(val), int(rid), int(ts)
                )
                if m is not None:
                    a_id, e_id, b, a_val, e_val, a_ts, e_ts = m
                    nmatch += 1
                    out.append(
                        (
                            int(cur_key), nmatch, a_id, e_id, b, a_val,
                            e_val, pd.to_datetime(a_ts, unit="us"),
                            pd.to_datetime(e_ts, unit="us"),
                        )
                    )
            if out:
                yield pd.DataFrame(out, columns=cols)

    prepared = df.select(
        F.col(key_col), F.col(ts_col), F.col(id_col),
        F.col(value_col), symbol.alias("__sym"),
    )
    pruned = iterative_dead_row_prune(
        prepared, key_col, ts_col, id_col, value_col
    )
    return (
        pruned.repartition(F.col(key_col))
        .sortWithinPartitions(key_col, ts_col, id_col)
        .mapInPandas(scan, ITER_SCHEMA)
    )


def iterative_dead_row_prune(
    prepared: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Exact dead-row elimination for the iterative A B+ C automaton
    (see match_recognize_iterative's docstring): keep each anchor
    group's anchor..breaker span, drop everything the automaton provably
    ignores.  Input needs a ``__sym`` column; all running frames over
    one key-partitioned sort, no extra shuffle."""
    w = (
        W.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    is_a = F.col("__sym") == "A"
    ok_b = (F.col("__sym") == "B") & (
        F.col(value_col) > F.col("__anchor_val")
    )
    return (
        prepared
        # anchor value = the most recent A row's value
        .withColumn(
            "__anchor_val",
            F.last(F.when(is_a, F.col(value_col)), ignorenulls=True).over(w),
        )
        # a non-anchor row that does not extend the B run breaks the
        # attempt (it is the closing-C candidate or a killer)
        .withColumn(
            "__bad", F.when(is_a | ok_b, F.lit(0)).otherwise(F.lit(1))
        )
        .withColumn("__cum_bad", F.sum("__bad").over(w))
        # cumulative bad count AT the most recent anchor (its own __bad
        # is 0), null before the first A
        .withColumn(
            "__anchor_cum",
            F.last(F.when(is_a, F.col("__cum_bad")), ignorenulls=True)
            .over(w),
        )
        # live rows: an anchor exists and no breaker precedes this row
        # within its group (the breaker itself survives)
        .filter(
            F.col("__anchor_cum").isNotNull()
            & (
                F.col("__cum_bad") - F.col("__bad") - F.col("__anchor_cum")
                == 0
            )
        )
        .select(key_col, ts_col, id_col, value_col, "__sym")
    )
