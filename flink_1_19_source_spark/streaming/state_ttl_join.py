"""X3/S12 — regular (unwindowed) stream-stream join with PER-SIDE state
TTL, the runtime behind Flink 1.19's FLIP-373 ``STATE_TTL`` hint.

Flink semantics: each side's join state lives for its own duration of
PROCESSING time; a row stops producing matches once its side's TTL
passes.  Processing time is wall-clock in Flink — inherently
nondeterministic — so, per the repo-wide W7 convention, the proc-time
clock here is the micro-batch tick (deterministic under the fixed
replay chunking; at deploy the trigger interval makes ticks
wall-clock-spaced and the operator is unchanged).

State layout (all DataFrame ops, nothing collected):

- each batch writes its side's new rows to ``state{L,R}/tick-{id}/``
  with ``mode=overwrite`` — a replayed batch rewrites identical content;
- matches for batch ``b`` = newL ⋈ liveR ∪ oldL ⋈ newR, where
  ``liveR`` reads exactly the batch dirs in ``[b-ttlR+1, b]`` and
  ``oldL`` the dirs in ``[b-ttlL+1, b-1]`` — input sets are defined by
  tick RANGES, never "whatever is still on disk", so crash replays
  can neither double-count nor under-count (same contract as
  proc_time_trigger.py);
- results land in ``out/tick-{id}/`` with ``mode=overwrite``;
- dirs older than every possible future live range are deleted after
  the write — pure hygiene (the 100 TB answer to unbounded join state,
  which is the entire point of the hint), never a correctness input.

State is O(rows per live window) parquet partitioned by tick; at scale
each side's retention is bounded by its OWN ttl — the asymmetric case
(long-lived dimension side, short-lived event side) is exactly what
FLIP-373 added over the single pipeline-wide TTL.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class StateTtlJoin:
    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        key: str,
        left_pred: Column,
        right_pred: Column,
        ttl_left: int,
        ttl_right: int,
        left_cols: list[str],
        right_cols: list[str],
    ) -> None:
        self.spark = spark
        self.key = key
        self.left_pred = left_pred
        self.right_pred = right_pred
        self.ttl_left = int(ttl_left)
        self.ttl_right = int(ttl_right)
        if self.ttl_left < 1 or self.ttl_right < 1:
            raise ValueError("STATE_TTL must be >= 1 tick per side")
        self.left_cols = left_cols
        self.right_cols = right_cols
        self.ldir = os.path.join(work_dir, "stateL")
        self.rdir = os.path.join(work_dir, "stateR")
        self.out = os.path.join(work_dir, "out")

    def _read_range(self, base: str, lo: int, hi: int) -> DataFrame | None:
        dirs = [
            os.path.join(base, f"tick-{b:05d}")
            for b in range(max(lo, 0), hi + 1)
        ]
        dirs = [d for d in dirs if os.path.isdir(d)]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        b = int(batch_id)
        new_l = df.filter(self.left_pred).select(
            self.key, *self.left_cols, F.lit(b).alias("a_tick")
        )
        new_r = df.filter(self.right_pred).select(
            self.key, *self.right_cols, F.lit(b).alias("b_tick")
        )
        new_l.write.mode("overwrite").parquet(
            os.path.join(self.ldir, f"tick-{b:05d}")
        )
        new_r.write.mode("overwrite").parquet(
            os.path.join(self.rdir, f"tick-{b:05d}")
        )

        live_r = self._read_range(self.rdir, b - self.ttl_right + 1, b)
        old_l = self._read_range(self.ldir, b - self.ttl_left + 1, b - 1)
        parts = []
        nl = self._read_range(self.ldir, b, b)
        if nl is not None and live_r is not None:
            parts.append(nl.join(live_r, self.key))
        nr = self._read_range(self.rdir, b, b)
        if old_l is not None and nr is not None:
            parts.append(old_l.join(nr, self.key))
        out_dir = os.path.join(self.out, f"tick-{b:05d}")
        # nl and live_r always exist (their tick dirs were just written,
        # schema-only when the side is empty), so parts is never empty
        assert parts, "newL x liveR must always be joinable"
        res = parts[0]
        for p in parts[1:]:
            res = res.unionByName(p)
        res.write.mode("overwrite").parquet(out_dir)

        # TTL eviction — the bounded-state guarantee the hint promises,
        # per side (the asymmetric retention IS the FLIP-373 feature).
        # Safe: replays re-run only the CURRENT batch, whose read ranges
        # start at b - ttl_side + 1; anything older can never be read.
        for base, ttl in ((self.ldir, self.ttl_left),
                          (self.rdir, self.ttl_right)):
            if not os.path.isdir(base):
                continue
            for name in os.listdir(base):
                if name.startswith("tick-"):
                    try:
                        bid = int(name.split("-", 1)[1])
                    except ValueError:
                        continue
                    if bid <= b - ttl:
                        shutil.rmtree(
                            os.path.join(base, name), ignore_errors=True
                        )

    def result_df(self) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self.out, "tick-*")
        )


class StateTtlAgg:
    """X3/S12 — unwindowed keyed aggregation with per-operator state TTL,
    FLIP-373's other named target.  Flink semantics (StateTtlConfig
    OnCreateAndWrite + NeverReturnExpired): the accumulator expires TTL
    proc-time units after its LAST update, so a key whose updates pause
    longer than the TTL restarts its aggregate from scratch — bounded
    state in exchange for windowless running aggregates.

    Tick convention matches :class:`StateTtlJoin`: state written at tick
    t is live for reads at ticks t .. t+ttl-1 (a gap >= ttl resets).

    State layout: ``state/tick-{b}`` holds EVERY live accumulator
    (updated keys merged, un-updated live keys carried forward), written
    ``mode=overwrite``; batch b reads only ``tick-{b-1}`` — O(1) dirs,
    never "whatever is on disk" — so a crash replay recomputes the same
    merge from the same input (the tick-b state and output it rewrites
    are bit-identical).  Per-batch output = the updated keys' new
    aggregates; the drained result takes each key's LAST emission.
    State size is bounded by keys active within the TTL window — the
    guarantee the hint buys at 100 TB."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        key: str,
        ttl: int,
        val: Column,
    ) -> None:
        self.spark = spark
        self.key = key
        self.ttl = int(ttl)
        if self.ttl < 1:
            raise ValueError("STATE_TTL must be >= 1 tick")
        self.val = val
        self.sdir = os.path.join(work_dir, "aggstate")
        self.out = os.path.join(work_dir, "aggout")

    def _tick(self, base: str, b: int) -> str:
        return os.path.join(base, f"tick-{b:05d}")

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        b = int(batch_id)
        upd = df.groupBy(self.key).agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum(self.val).alias("_sum"),
        )
        prev_dir = self._tick(self.sdir, b - 1)
        if os.path.isdir(prev_dir):
            prev = self.spark.read.parquet(prev_dir)
        else:
            prev = self.spark.createDataFrame(
                [], f"{self.key} long, cnt long, sum_val long, last_tick int"
            )
        # NeverReturnExpired: a prior accumulator merges only while its
        # last write is < ttl ticks old — otherwise the key restarts
        live = prev.filter(F.col("last_tick") >= b - self.ttl + 1)
        merged = (
            upd.join(live, self.key, "full_outer")
            .select(
                self.key,
                (F.coalesce(F.col("_cnt"), F.lit(0))
                 + F.when(F.col("_cnt").isNotNull(),
                          F.coalesce(F.col("cnt"), F.lit(0)))
                    .otherwise(F.col("cnt"))).alias("cnt"),
                (F.coalesce(F.col("_sum"), F.lit(0))
                 + F.when(F.col("_cnt").isNotNull(),
                          F.coalesce(F.col("sum_val"), F.lit(0)))
                    .otherwise(F.col("sum_val"))).alias("sum_val"),
                F.when(F.col("_cnt").isNotNull(), F.lit(b))
                 .otherwise(F.col("last_tick")).cast("int")
                 .alias("last_tick"),
            )
        )
        merged = merged.localCheckpoint(eager=True)
        # state: updated keys + still-live carried keys (liveable at b+1)
        merged.filter(F.col("last_tick") >= b + 2 - self.ttl).write.mode(
            "overwrite"
        ).parquet(self._tick(self.sdir, b))
        # changelog: this batch's updated keys only
        merged.filter(F.col("last_tick") == b).withColumn(
            "tick", F.lit(b)
        ).write.mode("overwrite").parquet(self._tick(self.out, b))
        # hygiene eviction — correctness never reads past tick b-1
        if os.path.isdir(self.sdir):
            for name in os.listdir(self.sdir):
                if name.startswith("tick-"):
                    try:
                        bid = int(name.split("-", 1)[1])
                    except ValueError:
                        continue
                    if bid < b - 1:
                        shutil.rmtree(
                            os.path.join(self.sdir, name),
                            ignore_errors=True,
                        )

    def result_df(self) -> DataFrame:
        from pyspark.sql import Window

        every = self.spark.read.parquet(os.path.join(self.out, "tick-*"))
        w = Window.partitionBy(self.key).orderBy(F.col("tick").desc())
        return (
            every.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(self.key, "cnt", "sum_val", "last_tick")
        )
