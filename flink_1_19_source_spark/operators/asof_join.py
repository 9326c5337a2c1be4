"""Temporal / as-of join (SURVEY §2.3 J6; Flink `FOR SYSTEM_TIME AS OF`).

Semantics: each left row joins the single right-side version that was
valid at the left row's time — the right row with the greatest
``right_ts <= left_ts`` per key (Flink temporal join; upstream:
flink-table-runtime operators/join/temporal).

Spark-first implementation: **union-tag + last_value over an ordered
window**, not a per-row probe:

1. tag left (probe) and right (build) rows, union them;
2. one window `partitionBy(key).orderBy(ts, side)` carries the latest
   right-side payload forward with `last_value(..., ignorenulls=True)`;
3. keep left rows, now annotated with the as-of right version.

Cost model at 100 TB: ONE shuffle of left+right on the join key (the same
lower bound as a sort-merge join), no N×M candidate blow-up, no skew
amplification beyond the key's own skew. The sort inside each partition is
exactly the sort-merge-join sort. Tie-breaking: a right row with
``right_ts == left_ts`` IS visible (<=), achieved by sorting the right
side before the left side at equal timestamps.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    strictly_before: bool = False,
) -> DataFrame:
    """As-of join: enrich each left row with the latest right row whose
    timestamp is <= (or < when ``strictly_before``) the left timestamp,
    per ``on`` key. Right value columns come back NULL when no version
    exists yet. Output: all left columns + ``right_values``.
    """
    on = list(on)
    right_values = list(right_values)

    # side ordinal: right rows sort before left rows at the same timestamp
    # so `<=` semantics hold; flip the order for strict `<`.
    right_ord, left_ord = (0, 1) if not strictly_before else (1, 0)

    # Pack the right payload into ONE struct so every value column of the
    # as-of match comes atomically from the same right row (last+ignorenulls
    # on separate columns could mix versions when right values are NULL).
    payload = F.struct(*[F.col(v).alias(v) for v in right_values])
    payload_type = (
        right.select(payload.alias("__p")).schema["__p"].dataType
    )

    lcols = left.columns
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.lit(None).cast(payload_type).alias("__payload"),
        F.col(left_time).alias("__t"),
        F.lit(left_ord).alias("__side"),
    )
    tagged_right = right.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        payload.alias("__payload"),
        F.col(right_time).alias("__t"),
        F.lit(right_ord).alias("__side"),
    )

    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        F.col("__side"),
        F.last("__payload", ignorenulls=True).over(w).alias("__match"),
    )
    return filled.filter(F.col("__side") == left_ord).select(
        *lcols, *[F.col(f"__match.{v}").alias(v) for v in right_values]
    )
