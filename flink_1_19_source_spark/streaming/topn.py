"""Streaming Top-N and keep-last deduplication via arbitrary keyed state
(SURVEY §2.6 O6/O7-S; Flink: retractable rank operator /
KeyedProcessFunction, upstream flink-table-runtime rank operators).

``applyInPandasWithState`` provides the keyed-state surface of Flink's
KeyedProcessFunction (Spark 4's ``transformWithStateInPandas`` is the
successor API, but its driver worker requires protobuf, which this
container lacks — the older API has identical semantics for these
operators). Each operator keeps bounded per-key state (current top-N /
latest row) and emits the refreshed snapshot per micro-batch — update
semantics, i.e. Flink's retract stream collapsed to its latest state.
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
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TOPN_OUTPUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("rank", LongType()),
    ]
)

# per-key state: parallel arrays (ids, values), length ≤ N
TOPN_STATE = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("vals", ArrayType(DoubleType())),
    ]
)


def _topn_func_factory(n: int):
    def topn_func(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, vals = state.get
            current = list(zip(ids, vals))
        else:
            current = []
        for pdf in pdfs:
            current.extend(
                zip(pdf["event_id"].astype("int64"), pdf["value"].astype("float64"))
            )
        # value desc, event_id asc tie-break; state bounded at N per key
        current.sort(key=lambda t: (-t[1], t[0]))
        current = current[:n]
        state.update(([int(e) for e, _ in current], [float(v) for _, v in current]))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(current),
                "event_id": [int(e) for e, _ in current],
                "value": [float(v) for _, v in current],
                "rank": list(range(1, len(current) + 1)),
            }
        )

    return topn_func


KEEP_LAST_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

KEEP_LAST_STATE = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _keep_last_func(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Dedup keep-LAST by (ts, event_id) per key — not expressible with
    dropDuplicates (which keeps the first arrival)."""
    best = None
    if state.exists:
        e, t, v = state.get
        best = (int(e), t, float(v))
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            ts = r.ts.to_pydatetime() if hasattr(r.ts, "to_pydatetime") else r.ts
            cand = (int(r.event_id), ts, float(r.value))
            if best is None or (cand[1], cand[0]) > (best[1], best[0]):
                best = cand
    state.update(best)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_id": [best[0]],
            "ts": [best[1]],
            "value": [best[2]],
        }
    )


def streaming_topn(sdf: DataFrame, n: int = 3) -> DataFrame:
    """events stream → per-event_type top-N by value (update mode).
    State is O(N) per key; each micro-batch shuffles only its own rows to
    the key's state partition — the same state layout Flink's rank
    operator keeps (upstream: flink-table-runtime rank)."""
    return (
        sdf.select("event_type", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _topn_func_factory(n),
            outputStructType=TOPN_OUTPUT,
            stateStructType=TOPN_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_keep_last(sdf: DataFrame) -> DataFrame:
    """events stream → latest event per user_id (update mode)."""
    return (
        sdf.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _keep_last_func,
            outputStructType=KEEP_LAST_OUTPUT,
            stateStructType=KEEP_LAST_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
