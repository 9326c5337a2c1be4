"""KeyedProcessFunction-with-timers equivalent (SURVEY §2.9 X2 + X3).

Flink's canonical timer pattern: per-key state holding an open session,
an event-time timer at ``last_ts + gap``; the timer firing (watermark
passes it) closes and emits the session and clears the state — which is
also exactly state TTL (X3): state lives ``gap`` past the last event.

Spark surface: ``applyInPandasWithState`` with ``EventTimeTimeout`` —
``state.setTimeoutTimestamp`` is Flink's ``registerEventTimeTimer``,
the timed-out invocation is ``onTimer``, ``state.remove`` is the TTL
cleanup. Sessions closed by a later event (gap exceeded within the data)
emit immediately; trailing sessions emit when the watermark passes their
timeout — or never, if the stream ends first (same as Flink).
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

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_last", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# open-session state: (start, last, n, total)
SESSION_STATE = StructType(
    [
        StructField("start", TimestampType()),
        StructField("last", TimestampType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _sessionize_factory(gap_seconds: int):
    gap_ms = gap_seconds * 1000

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []

        if state.hasTimedOut:
            # onTimer: watermark passed last+gap → close + TTL-clear state
            if state.exists:
                start, last, n, total = state.get
                closed.append((key[0], start, last, int(n), float(total)))
                state.remove()
            yield pd.DataFrame(closed, columns=[f.name for f in SESSION_OUTPUT.fields])
            return

        cur = list(state.get) if state.exists else None
        rows = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                ts = r.ts.to_pydatetime() if hasattr(r.ts, "to_pydatetime") else r.ts
                rows.append((ts, float(r.value)))
        rows.sort()
        for ts, val in rows:
            if cur is None:
                cur = [ts, ts, 1, val]
            elif (ts - cur[1]).total_seconds() > gap_seconds:
                closed.append((key[0], cur[0], cur[1], int(cur[2]), float(cur[3])))
                cur = [ts, ts, 1, val]
            else:
                cur[1] = ts
                cur[2] += 1
                cur[3] += val
        if cur is not None:
            state.update((cur[0], cur[1], int(cur[2]), float(cur[3])))
            # registerEventTimeTimer(last + gap): fires when wm passes it.
            # cur[1] is a UTC-naive timestamp; naive .timestamp() would
            # apply the process-local timezone and offset every timer on a
            # non-UTC host — pin tzinfo=UTC before converting to epoch ms.
            last_utc = cur[1].replace(tzinfo=_tz.utc)
            state.setTimeoutTimestamp(int(last_utc.timestamp() * 1000) + gap_ms)
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_OUTPUT.fields])

    return fn


def sessionize_with_timers(
    sdf: DataFrame, gap: str = "30 minutes", watermark_delay: str = "10 minutes"
) -> DataFrame:
    """events stream → closed sessions per user (event-time timers)."""
    gap_seconds = {"30 minutes": 1800}.get(gap)
    if gap_seconds is None:
        import re

        m = re.match(r"(\d+)\s*minutes?", gap)
        gap_seconds = int(m.group(1)) * 60
    return (
        sdf.withWatermark("ts", watermark_delay)
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_factory(gap_seconds),
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
