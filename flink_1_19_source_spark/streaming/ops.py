"""Streaming operators (SURVEY §2.5/§2.6/§2.9 tier-S rows).

Each function takes a *streaming* DataFrame and returns the transformed
streaming DataFrame; shapes mirror their batch twins in queries/ so the
replay tests can assert convergence. Watermark semantics follow Flink's
bounded-out-of-orderness generator + min-propagation (PAPERS.md:7): Spark's
``withWatermark`` implements the same min-of-inputs rule per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_bounded_out_of_orderness(
    sdf: DataFrame, ts_col: str, delay: str
) -> DataFrame:
    """Flink: WATERMARK FOR ts AS ts - INTERVAL delay  [docs].
    Spark: withWatermark — one event-time column per stream."""
    return sdf.withWatermark(ts_col, delay)


def tumble_agg(
    sdf: DataFrame,
    ts_col: str,
    size: str,
    keys: list[str],
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming TUMBLE window agg (W1): emits once per closed window in
    append mode — Flink's default emit-on-watermark behavior."""
    return (
        with_bounded_out_of_orderness(sdf, ts_col, delay)
        .groupBy(*keys, F.window(ts_col, size).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value")).alias("total"),
        )
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            F.round("total", 6).alias("total"),
        )
    )


def hop_agg(
    sdf: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    keys: list[str],
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming HOP window agg (W2)."""
    return (
        with_bounded_out_of_orderness(sdf, ts_col, delay)
        .groupBy(*keys, F.window(ts_col, size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            "n",
        )
    )


def session_agg(
    sdf: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming SESSION window agg (W4; Flink 1.19's SESSION TVF)."""
    return (
        with_bounded_out_of_orderness(sdf, ts_col, delay)
        .groupBy(*keys, F.session_window(ts_col, gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
    )


def dedup_keep_first(
    sdf: DataFrame, keys: list[str], ts_col: str, delay: str = "10 minutes"
) -> DataFrame:
    """Streaming deduplication, keep-first (O7/N1): Flink's Top-N-with-
    rownum=1 pattern. `dropDuplicatesWithinWatermark` keeps the first
    arrival per key and expires state once the watermark passes."""
    return with_bounded_out_of_orderness(sdf, ts_col, delay).dropDuplicatesWithinWatermark(
        keys
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming interval join (J5): right.ts ∈ [left.ts - lower,
    left.ts + upper] on equal keys. Native stream-stream join in Spark —
    both sides watermark, state pruned by the time-range condition
    (upstream: flink-table-runtime interval join keyed state)."""
    l = with_bounded_out_of_orderness(left, left_ts, delay).alias("l")
    r = with_bounded_out_of_orderness(right, right_ts, delay).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond)


class LateDataCapture:
    """Late-data side output (W8): Flink routes rows older than the
    watermark to a side output; Spark silently drops them. This foreachBatch
    splitter reproduces the side output: it tracks the running max event
    time and diverts rows older than (max_ts - delay) to `late`, passing
    the rest to `on_time`. Use *upstream* of the watermark operator.
    """

    def __init__(self, ts_col: str, delay_seconds: float):
        self.ts_col = ts_col
        self.delay = delay_seconds
        self.max_ts = None
        self.on_time: list = []
        self.late: list = []

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.collect()
        for row in rows:
            ts = row[self.ts_col]
            if self.max_ts is not None and (
                (self.max_ts - ts).total_seconds() > self.delay
            ):
                self.late.append(row)
            else:
                self.on_time.append(row)
            if self.max_ts is None or ts > self.max_ts:
                self.max_ts = ts
