"""Dynamic-gap session windows on keyed state (SURVEY §2.5 W4-S, §2.9 X2).

Flink: ``EventTimeSessionWindows.withDynamicGap(extractor)`` — each
element opens a window [ts, ts + gap(element)) and overlapping windows
merge, so the open session's END is the running max of (ts + gap) over
its members; a later element starts a new session iff its ts reaches
that end. The fixed-gap sessionizer (sessionize.py) is the special case
gap(element) = const.

Spark surface: ``applyInPandasWithState`` + EventTimeTimeout. The timer
is registered at the session end (the merge frontier), clamped to
watermark+1 when the end is already behind the watermark — Spark rejects
timers below the current watermark, and the clamp only defers the fire
to the next (or the final no-data) micro-batch, which evaluates against
the advanced watermark; the emitted set is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import timezone as _tz

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

DYN_SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# open session: (start, end_ms = running max(ts+gap), n, total)
DYN_SESSION_STATE = StructType(
    [
        StructField("start", TimestampType()),
        StructField("end_ms", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)

_COLS = [f.name for f in DYN_SESSION_OUTPUT.fields]


def _ms(ts) -> int:
    t = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
    return int(t.replace(tzinfo=_tz.utc).timestamp() * 1000)


def _fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    closed: list[tuple] = []

    if state.hasTimedOut:
        if state.exists:
            start, end_ms, n, total = state.get
            # the timer may have been watermark-clamped: fire only once
            # the watermark truly passed the session end, else re-arm
            wm = state.getCurrentWatermarkMs()
            if end_ms <= wm:
                closed.append((key[0], start, int(end_ms), int(n), float(total)))
                state.remove()
            else:
                state.setTimeoutTimestamp(max(int(end_ms), wm + 1))
        yield pd.DataFrame(closed, columns=_COLS)
        return

    cur = list(state.get) if state.exists else None
    rows = []
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            rows.append((r.ts, float(r.value), int(r.gap_ms)))
    rows.sort(key=lambda x: x[0])
    for ts, val, gap_ms in rows:
        ts_ms = _ms(ts)
        if cur is None:
            cur = [ts, ts_ms + gap_ms, 1, val]
        elif ts_ms >= cur[1]:
            closed.append((key[0], cur[0], int(cur[1]), int(cur[2]), float(cur[3])))
            cur = [ts, ts_ms + gap_ms, 1, val]
        else:
            cur[1] = max(cur[1], ts_ms + gap_ms)
            cur[2] += 1
            cur[3] += val
    if cur is not None:
        state.update((cur[0], int(cur[1]), int(cur[2]), float(cur[3])))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(int(cur[1]), wm + 1))
    yield pd.DataFrame(closed, columns=_COLS)


def dynamic_sessionize(
    sdf: DataFrame, gap_ms_col: str = "gap_ms", watermark_delay: str = "10 minutes"
) -> DataFrame:
    """events stream (with a per-row ``gap_ms`` column) → closed
    dynamic-gap sessions per user."""
    return (
        sdf.withWatermark("ts", watermark_delay)
        .select("user_id", "ts", "value", F.col(gap_ms_col).alias("gap_ms"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _fn,
            outputStructType=DYN_SESSION_OUTPUT,
            stateStructType=DYN_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
