"""Streaming OVER aggregation (SURVEY §2.6 O4 streaming tier).

Flink streaming SQL supports ``SUM(x) OVER (PARTITION BY k ORDER BY ts
ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)`` — every input row is
emitted immediately, extended with the aggregate over everything that
arrived before it in its key's timeline [docs: Flink "Over Aggregation";
upstream: flink-table-runtime over-window operators]. Spark Structured
Streaming has no streaming window-function primitive, so the operator
runs on keyed state: per key the state is the running (sum, count) pair
— O(1) per key, not the history — and each arriving row is emitted with
the updated accumulators (append semantics, per-row emit like Flink's).

Rows are folded in (ts, id) order within each micro-batch; with an
event-time-ordered source (per-partition-ordered Kafka / the replay
harness) the emitted values equal the batch window frame exactly.
Out-of-order arrivals within the bound would need Flink's same trick —
buffering rows until the watermark — which belongs to a retraction-
capable v2; the contract here matches Flink's ordered-input behavior.

Scale shape: one shuffle on the key; constant state per key. This is the
cheapest stateful operator in the engine — the 100 TB cost is the key
shuffle, nothing else.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OVER_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("running_sum", DoubleType()),
        StructField("running_n", LongType()),
    ]
)

OVER_STATE = StructType(
    [StructField("acc", DoubleType()), StructField("n", LongType())]
)


def _over_func(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    acc, n = state.get if state.exists else (0.0, 0)
    ids, tss, sums, ns = [], [], [], []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for r in pdf.itertuples(index=False):
            acc += float(r.value)
            n += 1
            ids.append(int(r.event_id))
            tss.append(r.ts)
            sums.append(round(acc, 6))
            ns.append(n)
    state.update((acc, n))
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])] * len(ids),
            "event_id": ids,
            "ts": tss,
            "running_sum": sums,
            "running_n": ns,
        }
    )


def streaming_over_sum(sdf: DataFrame) -> DataFrame:
    """events stream → each row emitted with its per-user running SUM/COUNT
    of `value` up to and including itself (Flink streaming OVER)."""
    return (
        sdf.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _over_func,
            outputStructType=OVER_OUTPUT,
            stateStructType=OVER_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
