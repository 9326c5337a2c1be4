"""Per-partition watermarks with min-combine and idleness (SURVEY §2.9 X1).

Flink generates a watermark per source partition and propagates the MIN
across inputs; a partition marked *idle* (no data for the idleness
timeout) is excluded from the min so a stalled partition cannot freeze
event time for the whole pipeline [Flink docs: event-time/generating
watermarks, withIdleness; PAPERS.md:7 min-propagation].

Spark's ``withWatermark`` keeps one global max-event-time watermark —
there is no per-partition view to exclude an idle partition from. This
tracker supplies the missing semantics at the micro-batch boundary
(foreachBatch), the same place the engine's own watermark commits:

- per batch, the per-partition max event time is a P-row aggregate (the
  only values that reach the driver — P is the topic partition count,
  not the data size);
- the combined watermark is ``min(active partitions' max) − delay``;
- idleness is defined in EVENT time: a partition whose max lags the
  global max by more than ``idle_gap`` is idle and leaves the min.
  Flink's timeout is wall-clock; a replay harness has no meaningful
  wall-clock, so the event-time gap is the deterministic analogue (the
  docstring contract a production port would re-base on processing time).

State is a P-entry dict, checkpointable via ``snapshot``/``restore``.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PartitionWatermarkTracker:
    def __init__(
        self,
        delay: dt.timedelta,
        idle_gap: dt.timedelta | None = None,
        partition_col: str = "partition",
        ts_col: str = "timestamp",
    ):
        self.delay = delay
        self.idle_gap = idle_gap
        self.partition_col = partition_col
        self.ts_col = ts_col
        self.part_max: dict[int, dt.datetime] = {}

    def observe(self, batch_df: DataFrame) -> dt.datetime | None:
        """Fold one micro-batch into the per-partition maxima and return
        the combined watermark (None until any data is seen)."""
        rows = (
            batch_df.groupBy(self.partition_col)
            .agg(F.max(self.ts_col).alias("mx"))
            .collect()
        )
        for r in rows:
            p, mx = r[self.partition_col], r["mx"]
            if mx is not None and (p not in self.part_max or mx > self.part_max[p]):
                self.part_max[p] = mx
        return self.combined()

    def combined(self) -> dt.datetime | None:
        if not self.part_max:
            return None
        gmax = max(self.part_max.values())
        active = [
            v
            for v in self.part_max.values()
            if self.idle_gap is None or (gmax - v) <= self.idle_gap
        ]
        return min(active) - self.delay

    def publish(self, spark) -> None:
        """Expose the combined watermark to SQL as ``CURRENT_WATERMARK()``
        (functions/flink_sql.py reads this conf at translate time) — the
        batch-boundary analogue of Flink's watermark-aware function."""
        from ..functions.flink_sql import WATERMARK_CONF

        wm = self.combined()
        if wm is not None:
            spark.conf.set(WATERMARK_CONF, wm.isoformat(sep=" "))

    # -- checkpointing ----------------------------------------------------
    def snapshot(self) -> dict[int, str]:
        return {p: v.isoformat() for p, v in self.part_max.items()}

    def restore(self, snap: dict[int, str]) -> None:
        self.part_max = {
            int(p): dt.datetime.fromisoformat(v) for p, v in snap.items()
        }
