"""W7 — processing-time trigger with purge, on the micro-batch clock.

Flink's ``ContinuousProcessingTimeTrigger`` + ``FIRE_AND_PURGE`` fires a
keyed window on a wall-clock cadence regardless of event time. A
wall-clock trigger is untestable deterministically, but its *semantics*
— "fire every T of processing time, emit what accumulated, purge" — map
cleanly onto Structured Streaming's only processing-time boundary: the
micro-batch tick. ``ProcTimeFirePurge`` treats each micro-batch as one
clock tick and fires every ``every`` ticks, so the trigger logic (keyed
accumulation across ticks, fire, purge) is exercised for real while the
"clock" is the deterministic replay batch sequence. At deploy time the
cadence knob is the stream's trigger interval (processingTime="T"),
which makes ticks wall-clock-spaced — same operator, real clock.

State layout (all DataFrame ops, nothing collected):

- each batch writes its per-key PARTIAL aggregates to
  ``state/batch={id}/`` — map-side combine across ticks; a replayed
  batch overwrites its own subdir (idempotent);
- a fire for tick-range ``[seq*every, (seq+1)*every)`` reads EXACTLY
  those batches' partial dirs (never "whatever is pending", so a
  crash-replay can neither double-count nor under-count), combines per
  key and writes ``out/fire-{seq}/`` with ``mode=overwrite``;
- a ``_LAST`` marker (atomic rename) records the highest completed
  batch; a replayed batch at or below it is a no-op, and a crash at any
  point between the partial write and the marker replays to the
  identical fire because the fire's input set is defined by the tick
  range, not by what the purge has or hasn't removed yet;
- the purge (after the marker) removes the fired range's partials —
  pure cleanup, never a correctness input;
- partials pending when the stream ends never fire — Flink's contract:
  an unfired processing-time window emits nothing.

State is O(keys × pending ticks) parquet, partitioned by batch — at
100 TB this is the same rolling-partial shape as a pre-aggregating
sink, and the fire is a partial+final agg over ≤ ``every`` small files
per key-partition.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ProcTimeFirePurge:
    """Keyed count/sum accumulator fired every ``every`` micro-batches
    (FIRE_AND_PURGE). Use as a ``foreachBatch`` callable."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        key_cols: list[str],
        value_col: str,
        every: int = 2,
        purge: bool = True,
    ):
        self.spark = spark
        self.key_cols = key_cols
        self.value_col = value_col
        self.every = every
        # purge=True  → FIRE_AND_PURGE (tumbling processing-time windows);
        # purge=False → accumulating fires (ContinuousProcessingTimeTrigger
        # without an evictor): each fire emits the running totals over
        # every tick so far, and no partials are ever removed
        self.purge = purge
        self.state_dir = os.path.join(work_dir, "state")
        self.out_dir = os.path.join(work_dir, "fired")
        shutil.rmtree(self.state_dir, ignore_errors=True)
        shutil.rmtree(self.out_dir, ignore_errors=True)
        os.makedirs(self.state_dir, exist_ok=True)
        os.makedirs(self.out_dir, exist_ok=True)

    def _last_completed(self) -> int:
        p = os.path.join(self.state_dir, "_LAST")
        if not os.path.exists(p):
            return -1
        with open(p) as f:
            return int(f.read().strip())

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # replay guard: a batch at or below the completion marker already
        # ran to completion — its effects (partials, fire) are committed
        if batch_id <= self._last_completed():
            return
        partial = batch_df.groupBy(*self.key_cols).agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col(self.value_col).cast("decimal(27,6)")).alias("pdec"),
        )
        # overwrite THIS batch's subdir only: replay-idempotent
        partial.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"batch={batch_id:04d}")
        )
        fired_range: list[str] = []
        if (batch_id + 1) % self.every == 0:
            fire_seq = batch_id // self.every
            # the fire's inputs are DEFINED by its tick range — immune to
            # stale leftovers and to a purge that did or didn't happen;
            # accumulating mode's range is every tick from the beginning
            lo = fire_seq * self.every if self.purge else 0
            fired_range = [
                os.path.join(self.state_dir, f"batch={b:04d}")
                for b in range(lo, batch_id + 1)
            ]
            pending = self.spark.read.parquet(
                *[d for d in fired_range if os.path.isdir(d)]
            )
            fired = pending.groupBy(*self.key_cols).agg(
                F.sum("pn").alias("n_events"),
                F.sum("pdec").alias("tdec"),
            ).select(
                *self.key_cols,
                F.lit(fire_seq).cast("long").alias("fire_seq"),
                F.col("n_events"),
                F.round(F.col("tdec").cast("double"), 6).alias("sum_value"),
            )
            fired.write.mode("overwrite").parquet(
                os.path.join(self.out_dir, f"fire-{fire_seq:04d}")
            )
        # commit the batch, then purge fired partials (cleanup only)
        tmp = os.path.join(self.state_dir, "_LAST.tmp")
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, os.path.join(self.state_dir, "_LAST"))
        if self.purge:
            for d in fired_range:
                shutil.rmtree(d, ignore_errors=True)

    def fired_df(self) -> DataFrame:
        fires = sorted(
            os.path.join(self.out_dir, d)
            for d in os.listdir(self.out_dir)
            if d.startswith("fire-")
        )
        if not fires:
            raise ValueError("ProcTimeFirePurge: no fires recorded")
        return self.spark.read.parquet(*fires)
