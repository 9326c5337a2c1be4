"""Streaming MATCH_RECOGNIZE-lite: the CEP NFA over a keyed stream
(SURVEY §2.9 X5 streaming tier; Flink CEP NFA operator, upstream
flink-libraries/flink-cep NFA + SQL MatchRecognize exec nodes).

The batch twin (operators/cep.py) scans the complete per-key symbol
string. Here the same compiled regex/NFA runs *incrementally*: per-key
state carries the undecided suffix of the symbol sequence (plus aligned
row ids/timestamps), each micro-batch appends its rows in (ts, id) order,
emits every newly completed match (AFTER MATCH SKIP PAST LAST ROW), and
retains only the residue that can still participate in a future match:

- everything up to the end of the last emitted match is dropped (SKIP
  PAST LAST ROW — matches never overlap);
- the residue is pruned to its first possible match-start symbol
  (`start_chars`): a dropped prefix can never begin a new match;
- a hard `max_buffer` cap bounds state for adversarial keys (Flink CEP
  bounds the same way via the WITHIN clause); overflow drops oldest rows.

Because matches are emitted exactly when their last row arrives and the
replay is event-time-ordered, the union of emitted matches over the run
equals the batch scan's match set — the convergence oracle.

Scale shape: one shuffle on the key; state per key is O(longest pending
partial match), independent of history length. 1000 executors each own
their key ranges' NFA state — identical layout to Flink's keyed CEP.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame

from ..operators import cep as _cep_ops
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MATCH_OUTPUT = StructType(
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

# undecided suffix: symbol string + aligned ids and µs timestamps
MATCH_STATE = StructType(
    [
        StructField("syms", StringType()),
        StructField("ids", ArrayType(LongType())),
        StructField("tss", ArrayType(LongType())),
        StructField("match_no", LongType()),
    ]
)


def _match_func_factory(pattern: str, start_chars: str, max_buffer: int):
    compiled = re.compile(pattern)

    def match_func(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            syms, ids, tss, match_no = state.get
            ids, tss = list(ids), list(tss)
        else:
            syms, ids, tss, match_no = "", [], [], 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "id"], kind="mergesort")
            syms += "".join(pdf["sym"])
            ids.extend(int(i) for i in pdf["id"])
            tss.extend(int(t) for t in pdf["ts"].astype("int64") // 1000)

        out, consumed = [], 0
        for m in compiled.finditer(syms):
            a, b = m.start(), m.end() - 1
            match_no += 1
            out.append(
                (
                    int(key[0]),
                    match_no,
                    ids[a],
                    ids[b],
                    b - a + 1,
                    pd.to_datetime(tss[a], unit="us"),
                    pd.to_datetime(tss[b], unit="us"),
                )
            )
            consumed = m.end()

        # SKIP PAST LAST ROW, then prune to the first possible match start
        rest = syms[consumed:]
        first_start = next(
            (i for i, ch in enumerate(rest) if ch in start_chars), len(rest)
        )
        cut = consumed + first_start
        syms, ids, tss = syms[cut:], ids[cut:], tss[cut:]
        if len(syms) > max_buffer:  # adversarial key: bound the state
            syms, ids, tss = syms[-max_buffer:], ids[-max_buffer:], tss[-max_buffer:]
        state.update((syms, ids, tss, match_no))
        yield pd.DataFrame(out, columns=[f.name for f in MATCH_OUTPUT.fields])

    return match_func


def streaming_match_recognize(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    symbol: Column,
    pattern: str,
    start_chars: str,
    max_buffer: int = 4096,
) -> DataFrame:
    """Keyed streaming CEP: emits one row per completed `pattern` match,
    as soon as its closing row arrives (append semantics)."""
    prepared = sdf.select(
        sdf[key_col].alias("key"),
        sdf[ts_col].alias("ts"),
        sdf[id_col].alias("id"),
        symbol.alias("sym"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _match_func_factory(pattern, start_chars, max_buffer),
        outputStructType=MATCH_OUTPUT,
        stateStructType=MATCH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SKIP_OUTPUT = StructType(
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


def _skip_factory(
    pattern: str, start_chars: str, max_buffer: int, to_next: bool, count_sym: str
):
    compiled = re.compile(pattern)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            syms, ids, tss, match_no = state.get
            ids, tss = list(ids), list(tss)
        else:
            syms, ids, tss, match_no = "", [], [], 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "id"], kind="mergesort")
            syms += "".join(pdf["sym"])
            ids.extend(int(i) for i in pdf["id"])
            tss.extend(int(t) for t in pdf["ts"].astype("int64") // 1000)

        out = []
        pos = 0
        while True:
            m = compiled.search(syms, pos)
            if m is None:
                break
            a, b = m.start(), m.end() - 1
            match_no += 1
            seg = syms[a : b + 1]
            out.append(
                (
                    int(key[0]),
                    match_no,
                    ids[a],
                    ids[b],
                    b - a + 1,
                    seg.count(count_sym),
                    pd.to_datetime(tss[a], unit="us"),
                    pd.to_datetime(tss[b], unit="us"),
                )
            )
            # TO NEXT ROW resumes inside the match (overlap allowed);
            # PAST LAST ROW resumes after it (empty-match guarded)
            pos = a + 1 if to_next else max(a + 1, m.end())

        # everything before the resume position can never participate in a
        # future match; then prune to the first possible match-start symbol
        rest = syms[pos:]
        first_start = next(
            (i for i, ch in enumerate(rest) if ch in start_chars), len(rest)
        )
        cut = pos + first_start
        syms, ids, tss = syms[cut:], ids[cut:], tss[cut:]
        if len(syms) > max_buffer:
            syms, ids, tss = syms[-max_buffer:], ids[-max_buffer:], tss[-max_buffer:]
        state.update((syms, ids, tss, match_no))
        yield pd.DataFrame(out, columns=[f.name for f in SKIP_OUTPUT.fields])

    return fn


def streaming_match_skip(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    symbol: Column,
    pattern: str,
    start_chars: str,
    skip: str = "past_last_row",
    count_sym: str = "B",
    max_buffer: int = 4096,
) -> DataFrame:
    """Skip-mode-aware streaming CEP twin of operators/cep.py's
    ``match_recognize_skip``: emits each match (with FIRST/LAST/COUNT
    measures) as its closing row arrives.  ``to_next_row`` keeps the
    buffer from one past the last match START (overlapping matches may
    still complete); ``past_last_row`` drops through the match end."""
    if skip not in ("past_last_row", "to_next_row"):
        raise ValueError(f"unknown AFTER MATCH SKIP mode: {skip}")
    prepared = sdf.select(
        sdf[key_col].alias("key"),
        sdf[ts_col].alias("ts"),
        sdf[id_col].alias("id"),
        symbol.alias("sym"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _skip_factory(
            pattern, start_chars, max_buffer, skip == "to_next_row", count_sym
        ),
        outputStructType=SKIP_OUTPUT,
        stateStructType=MATCH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Time-constrained pattern (Pattern.followedBy().within()) on keyed state
# ---------------------------------------------------------------------------
PW_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("signup_event_id", LongType()),
        StructField("signup_ts", TimestampType()),
        StructField("purchase_ts", TimestampType()),
        StructField("latency_ms", LongType()),
    ]
)

# pending signups awaiting their first in-window purchase
PW_STATE = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("tss", ArrayType(LongType())),  # epoch µs
    ]
)


def _pw_factory(within_ms: int):
    within_us = within_ms * 1000

    def fn(key, pdfs, state: GroupState):
        ids, tss = (list(state.get[0]), list(state.get[1])) if state.exists else ([], [])
        out = []
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "id"], kind="mergesort")
            for r in pdf.itertuples(index=False):
                rows.append((r.ts, int(r.id), r.sym))
        for ts, rid, sym in rows:
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if sym == "S":
                ids.append(rid)
                tss.append(ts_us)
                continue
            # purchase: match every pending signup still inside its window
            # (its FIRST subsequent purchase is this one).  Invariant: a
            # purchase clears ALL pending signups — each pending is either
            # matched (inside the window) or expired (Flink's within-timer
            # purge); nothing can remain pending past a purchase.
            for sid, sts in zip(ids, tss):
                if ts_us - sts <= within_us:
                    out.append(
                        (
                            int(key[0]),
                            sid,
                            pd.to_datetime(sts, unit="us"),
                            pd.to_datetime(ts_us, unit="us"),
                            # per-timestamp ms floors, then subtract — the
                            # same arithmetic as epoch_ms(p) - epoch_ms(s)
                            ts_us // 1000 - sts // 1000,
                        )
                    )
            ids, tss = [], []
        state.update((ids, tss))
        yield pd.DataFrame(out, columns=[f.name for f in PW_OUTPUT.fields])

    return fn


def pattern_within_stream(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    symbol: Column,
    within_ms: int,
) -> DataFrame:
    """Flink ``Pattern.begin(S).followedBy(P).within(t)`` on keyed state:
    pending S-events wait for their first subsequent P inside the window;
    a P closes every in-window pending (each S matches its first P), and
    expired pendings are purged — Flink's within-timer. Append output:
    one row per (S, first-in-window P)."""
    prepared = sdf.select(
        sdf[key_col].alias("key"),
        sdf[ts_col].alias("ts"),
        sdf[id_col].alias("id"),
        symbol.alias("sym"),
    ).filter(F.col("sym").isin("S", "P"))
    return prepared.groupBy("key").applyInPandasWithState(
        _pw_factory(within_ms),
        outputStructType=PW_OUTPUT,
        stateStructType=PW_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# AFTER MATCH SKIP TO <variable> + SUBSET measures on keyed state
# ---------------------------------------------------------------------------
SKIP_TO_OUTPUT = StructType(
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


def _skip_to_factory(
    pattern: str,
    start_chars: str,
    max_buffer: int,
    resume_group: str,
    subset_groups: tuple[str, ...],
):
    compiled = re.compile(pattern)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            syms, ids, tss, match_no = state.get
            ids, tss = list(ids), list(tss)
        else:
            syms, ids, tss, match_no = "", [], [], 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "id"], kind="mergesort")
            syms += "".join(pdf["sym"])
            ids.extend(int(i) for i in pdf["id"])
            tss.extend(int(t) for t in pdf["ts"].astype("int64") // 1000)

        out = []
        pos = 0
        while True:
            m = compiled.search(syms, pos)
            if m is None:
                break
            a, b = m.start(), m.end() - 1
            match_no += 1
            s_rows, s_first, s_last = _cep_ops.subset_measures(
                m, subset_groups
            )
            out.append(
                (
                    int(key[0]),
                    match_no,
                    ids[a],
                    ids[b],
                    b - a + 1,
                    s_rows,
                    pd.to_datetime(tss[a], unit="us"),
                    pd.to_datetime(tss[b], unit="us"),
                    pd.to_datetime(tss[s_first], unit="us")
                    if s_first is not None else pd.NaT,
                    pd.to_datetime(tss[s_last], unit="us")
                    if s_last is not None else pd.NaT,
                )
            )
            pos = _cep_ops.skip_to_resume(m, resume_group)

        # the resume row itself may start the NEXT match (SKIP TO LAST
        # semantics) — keep from pos, then prune to a possible start
        rest = syms[pos:]
        first_start = next(
            (i for i, ch in enumerate(rest) if ch in start_chars), len(rest)
        )
        cut = pos + first_start
        syms, ids, tss = syms[cut:], ids[cut:], tss[cut:]
        if len(syms) > max_buffer:
            syms, ids, tss = syms[-max_buffer:], ids[-max_buffer:], tss[-max_buffer:]
        state.update((syms, ids, tss, match_no))
        yield pd.DataFrame(out, columns=[f.name for f in SKIP_TO_OUTPUT.fields])

    return fn


def streaming_match_skip_to(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    symbol: Column,
    pattern: str,
    start_chars: str,
    resume_group: str,
    subset_groups: tuple[str, ...],
    max_buffer: int = 4096,
) -> DataFrame:
    """Streaming twin of operators/cep.match_recognize_skip_to: AFTER
    MATCH SKIP TO <variable> (resume AT the resumed variable's row —
    chained matches share their boundary row) with SUBSET union
    measures, on keyed state.  The buffer keeps from the resume
    position; a partial match's suffix survives across micro-batches
    and completes when its closing row arrives."""
    prepared = sdf.select(
        sdf[key_col].alias("key"),
        sdf[ts_col].alias("ts"),
        sdf[id_col].alias("id"),
        symbol.alias("sym"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _skip_to_factory(
            pattern, start_chars, max_buffer, resume_group, subset_groups
        ),
        outputStructType=SKIP_TO_OUTPUT,
        stateStructType=MATCH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EXCL_OUTPUT = StructType(
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


def _excl_factory(pattern: str, start_chars: str, max_buffer: int):
    compiled, names = _cep_ops.compile_exclusions(pattern)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            syms, ids, tss, match_no = state.get
            ids, tss = list(ids), list(tss)
        else:
            syms, ids, tss, match_no = "", [], [], 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "id"], kind="mergesort")
            syms += "".join(pdf["sym"])
            ids.extend(int(i) for i in pdf["id"])
            tss.extend(int(t) for t in pdf["ts"].astype("int64") // 1000)

        out, consumed = [], 0
        for a, b, inc in _cep_ops.exclusion_matches(compiled, names, syms):
            consumed = b + 1
            if not inc:
                continue  # fully-excluded match: consumes, emits nothing
            match_no += 1
            out.append(
                (
                    int(key[0]),
                    match_no,
                    ids[inc[0]],
                    ids[inc[-1]],
                    len(inc),
                    (b - a + 1) - len(inc),
                    pd.to_datetime(tss[inc[0]], unit="us"),
                    pd.to_datetime(tss[inc[-1]], unit="us"),
                )
            )

        rest = syms[consumed:]
        first_start = next(
            (i for i, ch in enumerate(rest) if ch in start_chars), len(rest)
        )
        cut = consumed + first_start
        syms, ids, tss = syms[cut:], ids[cut:], tss[cut:]
        if len(syms) > max_buffer:
            syms, ids, tss = (
                syms[-max_buffer:], ids[-max_buffer:], tss[-max_buffer:]
            )
        state.update((syms, ids, tss, match_no))
        yield pd.DataFrame(out, columns=[f.name for f in EXCL_OUTPUT.fields])

    return fn


def streaming_match_exclusion(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    symbol: Column,
    pattern: str,
    start_chars: str,
    max_buffer: int = 4096,
) -> DataFrame:
    """Keyed streaming MATCH_RECOGNIZE with row-pattern exclusions: the
    ``{- sub -}`` rows advance the incremental NFA but are dropped from
    the emitted measures (the exact engine batch twin
    operators/cep.match_recognize_exclusion shares via
    ``exclusion_matches``)."""
    prepared = sdf.select(
        sdf[key_col].alias("key"),
        sdf[ts_col].alias("ts"),
        sdf[id_col].alias("id"),
        symbol.alias("sym"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _excl_factory(pattern, start_chars, max_buffer),
        outputStructType=EXCL_OUTPUT,
        stateStructType=MATCH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Iterative conditions on a keyed stream (Flink CEP IterativeCondition):
# the batch twin is operators/cep.match_recognize_iterative; BOTH run the
# same iterative_step automaton, so batch and stream cannot diverge.  The
# keyed state is the O(1) automaton tuple — no row buffer at all (contrast
# the regex paths above, which must retain the undecided suffix): an
# iterative A B+ C attempt is decidable row-by-row, which is exactly why
# Flink evaluates IterativeConditions eagerly inside the NFA.
# ---------------------------------------------------------------------------

ITER_OUTPUT = StructType(
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

ITER_STATE = StructType(
    [
        StructField("phase", LongType()),
        StructField("a_val", DoubleType()),
        StructField("a_id", LongType()),
        StructField("a_ts", LongType()),
        StructField("b_cnt", LongType()),
        StructField("match_no", LongType()),
    ]
)


def _iter_factory():
    from ..operators.cep import ITER_SEEK, iterative_step

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            phase, a_val, a_id, a_ts, b_cnt, match_no = state.get
            st = (int(phase), float(a_val), int(a_id), int(a_ts), int(b_cnt))
        else:
            st, match_no = ITER_SEEK, 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "id"], kind="mergesort")
            tss = pdf["ts"].astype("int64").to_numpy() // 1000
            for sym, val, rid, ts in zip(
                pdf["sym"].tolist(), pdf["val"].tolist(),
                pdf["id"].tolist(), tss.tolist(),
            ):
                st, m = iterative_step(st, sym, float(val), int(rid), int(ts))
                if m is not None:
                    a, e, b, av, ev, ats, ets = m
                    match_no += 1
                    out.append(
                        (
                            int(key[0]), match_no, a, e, b, av, ev,
                            pd.to_datetime(ats, unit="us"),
                            pd.to_datetime(ets, unit="us"),
                        )
                    )
        state.update((st[0], st[1], st[2], st[3], st[4], match_no))
        yield pd.DataFrame(out, columns=[f.name for f in ITER_OUTPUT.fields])

    return fn


def streaming_match_iterative(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    symbol: Column,
) -> DataFrame:
    """Keyed streaming CEP with iterative DEFINE conditions
    (B.value > FIRST(A.value) / C.value < FIRST(A.value)); each match is
    emitted on the arrival of its closing C row (append semantics),
    keyed state is the constant-size automaton tuple."""
    prepared = sdf.select(
        sdf[key_col].alias("key"),
        sdf[ts_col].alias("ts"),
        sdf[id_col].alias("id"),
        sdf[value_col].alias("val"),
        symbol.alias("sym"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _iter_factory(),
        outputStructType=ITER_OUTPUT,
        stateStructType=ITER_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
