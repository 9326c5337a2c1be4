"""W8 — allowed lateness with window re-fire.

Flink's ``allowedLateness(L)`` keeps a fired window's state alive for L
beyond the watermark passing its end: a late row inside that bound is
added to the window and the window RE-FIRES with the updated aggregate;
a row arriving after ``wm >= end + L`` is dropped (the state is purged).
Spark's built-in windows can only drop; this operator reproduces the
full contract as a foreachBatch pipeline of pure DataFrame ops:

- per-row watermark-at-arrival: running ``max(ts) - delay`` over PRIOR
  arrivals in arrival order (the same cluster-side window aggregate as
  LateDataCapture, with the carried cross-batch scalar) — so the
  keep/drop decision is per-row, exactly Flink's onElement check;
- keep iff ``wm_at_arrival < window_end + L`` (strict; the boundary
  convention is documented here and mirrored by the oracle — Flink's
  own edge sits at ``end - 1ms + L``);
- kept rows reduce to per-(key, window) partials, which are added onto
  the current materialized values (read from the bucket-pruned
  ParquetMergeSink — only the touched buckets are read) and upserted
  back: each upsert of an already-fired window IS the re-fire, with
  last-writer-wins versioning in the sink;
- the final view filters to windows the watermark actually fired
  (``end <= final wm``) — an unfired window emits nothing even if its
  state exists.

The watermark-at-arrival rule is a pure function of global arrival
order, so results are micro-batch-boundary invariant (the chunk-
invariance property the replay tests pin for the other stateful ops).

At 100 TB: the state table is O(live windows × keys) and each batch
rewrites only the hash buckets its windows touch; the running-max
window uses one partition per source partition (here: the replay's
single ordered partition; on a real multi-partition source, partition
by the source partition and min-combine — partition_watermark.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks import ParquetMergeSink


class AllowedLatenessTumble:
    """Tumbling event-time window agg (count/sum) with allowed lateness.
    Use as a ``foreachBatch`` callable; read the result with
    ``result_df()`` after the stream drains."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        key_col: str,
        ts_col: str,
        value_col: str,
        window: str = "1 hour",
        delay_seconds: int = 300,
        lateness_seconds: int = 900,
        order_by: list[str] | None = None,
        num_buckets: int = 16,
    ):
        self.spark = spark
        self.key_col = key_col
        self.ts_col = ts_col
        self.value_col = value_col
        self.window = window
        self.delay = delay_seconds
        self.lateness = lateness_seconds
        self.order_by = order_by or [ts_col]
        self.sink = ParquetMergeSink(
            spark,
            os.path.join(work_dir, "win_state"),
            pk_cols=[key_col, "window_start"],
            num_buckets=num_buckets,
        )
        self.max_ts = None  # carried cross-batch watermark base (scalar)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window

        ts = F.col(self.ts_col)
        w = Window.orderBy(*self.order_by).rowsBetween(
            Window.unboundedPreceding, -1
        )
        run_max = F.max(ts).over(w)
        if self.max_ts is not None:
            run_max = F.greatest(run_max, F.lit(self.max_ts))
        wm = run_max - F.expr(f"INTERVAL {self.delay} SECOND")
        win = F.window(ts, self.window)
        kept = (
            batch_df.withColumn("_wm", wm)
            .withColumn("window_start", win.start)
            .withColumn("window_end", win.end)
            .filter(
                F.col("_wm").isNull()
                | (
                    F.col("_wm")
                    < F.col("window_end")
                    + F.expr(f"INTERVAL {self.lateness} SECOND")
                )
            )
        )
        partials = kept.groupBy(self.key_col, "window_start", "window_end").agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col(self.value_col).cast("decimal(27,6)")).alias("pdec"),
        )
        try:
            cur = self.sink.snapshot_df()
        except ValueError:
            cur = None
        if cur is not None:
            prev = cur.select(
                self.key_col,
                "window_start",
                F.col("n_events").alias("_prev_n"),
                F.col("tdec").alias("_prev_dec"),
            )
            merged = partials.join(prev, [self.key_col, "window_start"], "left").select(
                self.key_col,
                "window_start",
                "window_end",
                (F.col("pn") + F.coalesce(F.col("_prev_n"), F.lit(0))).alias(
                    "n_events"
                ),
                (
                    F.col("pdec")
                    + F.coalesce(
                        F.col("_prev_dec"), F.lit(0).cast("decimal(27,6)")
                    )
                ).cast("decimal(27,6)").alias("tdec"),
            )
        else:
            merged = partials.select(
                self.key_col,
                "window_start",
                "window_end",
                F.col("pn").alias("n_events"),
                F.col("pdec").alias("tdec"),
            )
        # the upsert of an already-materialized window IS the re-fire
        self.sink(merged, batch_id)
        mx = batch_df.agg(F.max(ts).alias("m")).first()["m"]
        if mx is not None and (self.max_ts is None or mx > self.max_ts):
            self.max_ts = mx

    def result_df(self) -> DataFrame:
        """Windows the final watermark fired, with their latest (re-fired)
        aggregates."""
        import datetime as dt

        if self.max_ts is None:
            raise ValueError("AllowedLatenessTumble: no data processed")
        final_wm = self.max_ts - dt.timedelta(seconds=self.delay)
        snap = self.sink.snapshot_df()
        return snap.filter(F.col("window_end") <= F.lit(final_wm)).select(
            self.key_col,
            "window_start",
            "n_events",
            F.round(F.col("tdec").cast("double"), 6).alias("total_value"),
        )
