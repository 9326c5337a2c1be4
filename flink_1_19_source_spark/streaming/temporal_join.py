"""Streaming event-time temporal join (SURVEY §2.3 J6 streaming tier).

Flink's `FOR SYSTEM_TIME AS OF` against a versioned table: each probe row
joins the latest build-side version with ``build_ts <= probe_ts`` for its
key [Flink docs "Temporal Joins"; upstream: flink-table-runtime
operators/join/temporal/TemporalRowTimeJoinOperator].

Spark Structured Streaming has no temporal-join primitive, so the
operator runs on keyed state over a union-tagged stream:

- build and probe rows are tagged and merged into ONE keyed stream
  (same shape as the batch twin in operators/asof_join.py — union-tag,
  not a per-row probe);
- per key the state is only the LATEST build version — (ts, value) —
  O(1) per key, not the version history;
- within each micro-batch rows fold in (ts, side, event_id) order with
  build rows first at equal timestamps, so ``<=`` visibility and
  last-version-wins tie-breaking are deterministic;
- each probe row is emitted immediately, annotated with the version in
  effect (append semantics).

Ordered-input contract: like Flink's event-time temporal join the
operator assumes per-key event-time order, which the ts-sorted replay
(and per-partition-ordered Kafka) provides; fully out-of-order streams
would buffer rows until the watermark — the retraction-capable v2
documented in streaming/over_agg.py applies here identically.

Scale shape: one shuffle on the join key, constant state per key — the
100 TB cost is the key shuffle, the same lower bound as any keyed join.
"""

from __future__ import annotations

from collections.abc import Iterator

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

TEMPORAL_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("asof_value", DoubleType()),
        StructField("asof_ts", TimestampType()),
    ]
)

# latest build version per key: (epoch_us, value); -1 = no version yet
TEMPORAL_STATE = StructType(
    [StructField("bts_us", LongType()), StructField("bval", DoubleType())]
)


def _tj_func(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    bts_us, bval = state.get if state.exists else (-1, None)
    ids, tss, vals, vts = [], [], [], []
    for pdf in pdfs:
        # build rows (side 0) before probe rows at equal ts => `<=` semantics;
        # event_id last => deterministic last-version-wins at equal build ts
        pdf = pdf.sort_values(["ts", "side", "event_id"], kind="mergesort")
        for r in pdf.itertuples(index=False):
            if r.side == 0:
                bts_us = int(pd.Timestamp(r.ts).value // 1000)
                bval = float(r.value)
            else:
                ids.append(int(r.event_id))
                tss.append(r.ts)
                vals.append(bval)
                vts.append(
                    pd.to_datetime(bts_us, unit="us") if bts_us >= 0 else None
                )
    state.update((bts_us, bval))
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])] * len(ids),
            "event_id": ids,
            "ts": tss,
            "asof_value": vals,
            "asof_ts": vts,
        }
    )


def streaming_temporal_join(
    build: DataFrame, probe: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Event-time temporal join of two event streams. Both inputs carry
    (key, ts, event_id, value); the result is every probe row extended
    with the build version in effect at its timestamp (NULLs before the
    first version)."""
    cols = [key, "ts", "event_id", "value"]
    tagged = (
        build.select(*cols, F.lit(0).alias("side"))
        .unionByName(probe.select(*cols, F.lit(1).alias("side")))
    )
    return tagged.groupBy(key).applyInPandasWithState(
        _tj_func,
        outputStructType=TEMPORAL_OUTPUT,
        stateStructType=TEMPORAL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
