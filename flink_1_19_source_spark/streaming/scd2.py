"""X6 — streaming SCD2 (slowly-changing-dimension type 2) materializer.

Applies a CDC changelog to a versioned history table: every insert/
update OPENS a version, the next change on the same key CLOSES it
(``valid_to`` = the successor's change timestamp), deletes close
without opening.  This is the standard warehouse landing pattern for
Debezium streams (the "history table" MERGE in Flink's upsert-sink
documentation family).

Determinism/crash contract (same tick-dir discipline as
state_ttl_join):

- state ``scdstate/tick-{b}`` = ALL currently-open versions (touched
  keys replaced, untouched carried forward), ``mode=overwrite``;
- batch b reads exactly ``tick-{b-1}`` — never "whatever is on disk" —
  so a replayed batch recomputes identical closures from identical
  inputs;
- ``scdout/tick-{b}`` = versions CLOSED by batch b (overwrite ⇒
  idempotent);
- the drained history = every closed version (is_current = false) plus
  the final tick's open set (is_current = true, valid_to null).

At 100 TB the state is the open-version set — O(live keys), the same
size the MERGE target's "is_current" partition would be — and each
batch shuffles only (batch ∪ touched-state), never history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class Scd2Sink:
    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        key: str,
        seq_cols: list[str],
        op_col: str = "op",
        ts_col: str = "ms",
    ) -> None:
        self.spark = spark
        self.key = key
        self.seq_cols = seq_cols
        self.op_col = op_col
        self.ts_col = ts_col
        self.sdir = os.path.join(work_dir, "scdstate")
        self.odir = os.path.join(work_dir, "scdout")

    def _open_schema(self) -> str:
        return (
            f"{self.key} long, version_event_id long, value double, "
            f"valid_from_ms long"
        )

    def _tick(self, base: str, b: int) -> str:
        return os.path.join(base, f"tick-{b:05d}")

    def __call__(self, changes: DataFrame, batch_id: int) -> None:
        """``changes``: (key, version_event_id, value, op, ms) rows of
        this batch, op ∈ {c,u,d}."""
        b = int(batch_id)
        prev_dir = self._tick(self.sdir, b - 1)
        if os.path.isdir(prev_dir):
            opens = self.spark.read.parquet(prev_dir)
        else:
            opens = self.spark.createDataFrame([], self._open_schema())

        w = Window.partitionBy(self.key).orderBy(*self.seq_cols)
        seq = (
            changes.withColumn("_rn", F.row_number().over(w))
            .withColumn("_next_ms", F.lead(self.ts_col).over(w))
            .withColumn(
                "_last", F.lead(self.ts_col).over(w).isNull()
            )
            .localCheckpoint(eager=True)
        )
        first_ms = seq.filter(F.col("_rn") == 1).select(
            self.key, F.col(self.ts_col).alias("_close_ms")
        )
        # 1) prior open versions of touched keys close at the batch's
        #    first change for that key
        closed_prior = opens.join(first_ms, self.key).select(
            self.key, "version_event_id", "value", "valid_from_ms",
            F.col("_close_ms").alias("valid_to_ms"),
        )
        # 2) intra-batch: every non-final c/u closes at its successor
        closed_intra = seq.filter(
            (F.col(self.op_col) != "d") & ~F.col("_last")
        ).select(
            self.key,
            F.col("version_event_id"),
            "value",
            F.col(self.ts_col).alias("valid_from_ms"),
            F.col("_next_ms").alias("valid_to_ms"),
        )
        closed = closed_prior.unionByName(closed_intra)
        closed.write.mode("overwrite").parquet(self._tick(self.odir, b))

        # 3) new open set: untouched carried opens + final c/u per key
        untouched = opens.join(first_ms, self.key, "left_anti")
        new_open = seq.filter(
            F.col("_last") & (F.col(self.op_col) != "d")
        ).select(
            self.key, "version_event_id", "value",
            F.col(self.ts_col).alias("valid_from_ms"),
        )
        untouched.unionByName(new_open).write.mode("overwrite").parquet(
            self._tick(self.sdir, b)
        )
        # hygiene: correctness only ever reads tick b-1
        import shutil

        for name in os.listdir(self.sdir):
            if name.startswith("tick-"):
                try:
                    bid = int(name.split("-", 1)[1])
                except ValueError:
                    continue
                if bid < b - 1:
                    shutil.rmtree(
                        os.path.join(self.sdir, name), ignore_errors=True
                    )

    def history_df(self) -> DataFrame:
        closed = self.spark.read.parquet(
            os.path.join(self.odir, "tick-*")
        ).withColumn("is_current", F.lit(False))
        ticks = sorted(
            d for d in os.listdir(self.sdir) if d.startswith("tick-")
        )
        opens = self.spark.read.parquet(
            os.path.join(self.sdir, ticks[-1])
        ).select(
            self.key, "version_event_id", "value", "valid_from_ms",
            F.lit(None).cast("long").alias("valid_to_ms"),
            F.lit(True).alias("is_current"),
        )
        return closed.select(opens.columns).unionByName(opens)
