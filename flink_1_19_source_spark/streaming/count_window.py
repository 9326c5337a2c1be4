"""Count windows — Flink's trigger/evictor surface (SURVEY §2.5 W7).

Flink exposes custom window triggers and evictors on DataStream; the
two shapes real programs build with them are

* ``countWindow(N)`` — a *count trigger*: per key, fire when N elements
  have accumulated, then purge (tumbling count window). Incomplete
  windows never fire.
* ``countWindow(N, 1)`` — a *count evictor*: keep only the last N
  elements per key and fire per element (sliding count window).

Spark Structured Streaming has no trigger/evictor API — windows are
event-time only — so both are implemented on keyed state via
``applyInPandasWithState``, the same substrate as the engine's Top-N
and sessionization operators:

* tumbling: state is the open window's running (count, sum) — O(1) per
  key; a full window emits one row and resets. Exactly Flink's
  ``CountTrigger.of(N)`` + purge semantics.
* sliding: state is a ring of the last N values — O(N) per key; each
  arriving row emits the aggregate over itself and its N-1
  predecessors. Exactly Flink's ``CountEvictor.of(N)`` keep-last
  semantics.

Rows fold in (ts, id) order within each micro-batch; with the
per-key-ordered replay source the emitted windows are deterministic
and chunk-count-invariant (a window's content depends only on per-key
arrival order), which makes both operators batch-SQL-oracle-able:
tumbling = complete ROW_NUMBER()-buckets of size N; sliding = a ROWS
BETWEEN N-1 PRECEDING frame.

Scale shape: one shuffle on the key; state O(1) (tumbling) or O(N)
(sliding) per key — no history accumulation, no timers needed because
count triggers are data-driven, not time-driven.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

TUMBLE_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("win_seq", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("close_ts", TimestampType()),
    ]
)

#: open window: events so far, running sum, windows already closed
TUMBLE_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("acc", DoubleType()),
        StructField("seq", LongType()),
    ]
)


def _make_tumble_func(size: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n, acc, seq = state.get if state.exists else (0, 0.0, 0)
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            for r in pdf.itertuples(index=False):
                n += 1
                acc += float(r.value)
                if n == size:
                    out.append((int(key[0]), seq, size, round(acc, 6), r.ts))
                    n, acc, seq = 0, 0.0, seq + 1
        state.update((n, acc, seq))
        yield pd.DataFrame(
            out, columns=["user_id", "win_seq", "n_events", "sum_value", "close_ts"]
        )

    return fn


def streaming_count_tumble(sdf: DataFrame, size: int) -> DataFrame:
    """events stream → one row per *complete* N-element count window per
    user: (win_seq, n_events, sum_value, close_ts of the firing row)."""
    return (
        sdf.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_tumble_func(size),
            outputStructType=TUMBLE_OUTPUT,
            stateStructType=TUMBLE_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SLIDE_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("last_n", LongType()),
        StructField("last_sum", DoubleType()),
    ]
)

#: evictor state: the last ≤N values, oldest first
SLIDE_STATE = StructType([StructField("buf", ArrayType(DoubleType()))])


def _make_slide_func(size: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (buf,) = state.get if state.exists else ([],)
        buf = list(buf)
        rows: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            for r in pdf.itertuples(index=False):
                buf.append(float(r.value))
                if len(buf) > size:
                    buf.pop(0)
                rows.append(
                    (int(key[0]), int(r.event_id), r.ts, len(buf), round(sum(buf), 6))
                )
        state.update((buf,))
        yield pd.DataFrame(
            rows, columns=["user_id", "event_id", "ts", "last_n", "last_sum"]
        )

    return fn


def streaming_count_slide(sdf: DataFrame, size: int) -> DataFrame:
    """events stream → per arriving row, the SUM over itself and its N-1
    predecessors in its key (count evictor: keep-last-N)."""
    return (
        sdf.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_slide_func(size),
            outputStructType=SLIDE_OUTPUT,
            stateStructType=SLIDE_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
