"""Retraction-stream consumption mid-pipeline (SURVEY §1.3, §7.4).

Flink pipelines freely chain stateful operators over retract streams: an
unwindowed aggregate emits ``+I/-U/+U/-D`` and a SECOND aggregate
downstream updates itself from those retractions — the classic

    SELECT cnt, COUNT(*) FROM
      (SELECT k, COUNT(*) AS cnt FROM t GROUP BY k) GROUP BY cnt

where every upstream update both retracts a user from its old-cnt bucket
and inserts it into the new one. Spark Structured Streaming cannot chain
two streaming aggregates (the first agg's update stream is not
re-consumable as a stream), which SURVEY §1.3/§7.4 declares the engine's
biggest semantic gap. This module closes it the set-based way, inside
``foreachBatch``:

- ``synthesize_retractions`` — Spark's update-mode output is an UPSERT
  changelog (new absolute value per changed key, no retraction of the old
  value). Joining each micro-batch against a keyed mirror of previously
  emitted values recovers the full retract stream: one ``-U`` carrying
  the replaced value, ``+U``/``+I`` for the new one. This is exactly
  Flink's ChangelogNormalize operator, done as a join instead of per-row
  state access.
- ``DeltaAggState`` — the downstream COUNT aggregate as a MERGE-backed
  state table: fold the batch's retraction rows into per-group ±1 deltas,
  add them to the stored group counts with one staging+MERGE, and ``-D``
  groups whose count reaches zero (Flink emits the same ``-D`` when the
  last contributor retracts).
- ``BatchLedger`` — applied-batch bookkeeping. Delta application is NOT
  naturally idempotent (re-applying a batch double-counts), so restart
  safety needs the sink to remember which batch ids are already folded —
  the standard transactional-sink pattern (Flink's TwoPhaseCommitSink /
  JDBC XA). Production wraps ledger+MERGE in one transaction; the
  embedded-Derby harness executes them back-to-back and documents the
  window.

Scale notes (100 TB): every step is a set operation — the per-batch work
is two shuffles (changed-keys join + group-delta agg) sized by the
*batch's* churn, never the full history; the mirror join pushes the
changed-key filter into the JDBC scan, and a lakehouse deployment swaps
the Derby tables for Delta/Iceberg MERGE targets partitioned by key with
no logic change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.jdbc import JdbcTableSource


def synthesize_retractions(
    batch_df: DataFrame,
    mirror: DataFrame,
    key_cols: list[str],
    val_cols: list[str],
) -> DataFrame:
    """Turn one micro-batch of an UPSERT stream into a retract stream.

    ``batch_df`` holds the new absolute value per changed key (Spark
    update-mode agg output); ``mirror`` holds the previously emitted value
    per key. Returns the Flink-equivalent changelog with ``_rowkind``:
    ``-U`` (old value) for every key that had one, then ``+U``/``+I`` with
    the new value.
    """
    new = batch_df.select(*key_cols, *val_cols)
    changed_keys = new.select(*key_cols)
    prev = mirror.join(changed_keys, key_cols, "inner")
    minus_u = prev.select(*key_cols, *val_cols).withColumn(
        "_rowkind", F.lit("-U")
    )
    plus = (
        new.join(
            prev.select(*key_cols).withColumn("_had_prev", F.lit(True)),
            key_cols,
            "left",
        )
        .withColumn(
            "_rowkind",
            F.when(F.col("_had_prev").isNotNull(), F.lit("+U")).otherwise(
                F.lit("+I")
            ),
        )
        .drop("_had_prev")
    )
    return minus_u.unionByName(plus)


class DeltaAggState:
    """Downstream ``GROUP BY <group_col> → COUNT(*)`` over a retract
    stream, materialized in a MERGE-capable table.

    Each retraction row contributes −1 to its group's count; each insert
    or update-after contributes +1. ``apply`` folds a whole changelog
    batch into net per-group deltas and issues ONE staging+MERGE — O(1)
    statements per micro-batch regardless of row count.
    """

    def __init__(
        self, target: JdbcTableSource, group_col: str, count_col: str = "n"
    ):
        self.target = target
        self.group_col = group_col
        self.count_col = count_col

    def init(self, spark: SparkSession, group_type: str = "long") -> None:
        self.target.ensure_table(
            spark.createDataFrame(
                [], f"{self.group_col} {group_type}, {self.count_col} long"
            ),
            overwrite=True,
        )

    def apply(self, changelog: DataFrame) -> None:
        spark = changelog.sparkSession
        g, n = self.group_col, self.count_col
        deltas = (
            changelog.withColumn(
                "_d",
                F.when(F.col("_rowkind") == "-U", F.lit(-1)).otherwise(
                    F.lit(1)
                ),
            )
            .groupBy(g)
            .agg(F.sum("_d").alias("_delta"))
            .where(F.col("_delta") != 0)
        )
        cur = self.target.scan(spark)
        merged = (
            deltas.join(cur, g, "left")
            .select(
                F.col(g),
                (F.coalesce(F.col(n), F.lit(0)) + F.col("_delta")).alias(n),
            )
            .withColumn(
                "_rowkind",
                F.when(F.col(n) <= 0, F.lit("-D")).otherwise(F.lit("+U")),
            )
        )
        self.target.upsert(merged, pk_cols=[g], op_col="_rowkind")

    def snapshot(self, spark: SparkSession) -> DataFrame:
        return self.target.scan(spark)


class BatchLedger:
    """Applied-micro-batch ledger backing exactly-once delta folding.

    availableNow + checkpoint only re-runs a batch after a failure; the
    ledger makes that re-run a no-op so non-idempotent delta application
    still converges (X4). One SELECT + one INSERT per batch, both on the
    driver-side control connection."""

    def __init__(self, source: JdbcTableSource):
        self.source = source

    def init(self, spark: SparkSession) -> None:
        self.source.ensure_table(
            spark.createDataFrame([], "batch_id long"), overwrite=True
        )

    def seen(self, spark: SparkSession, batch_id: int) -> bool:
        # control-plane probe on the pooled driver connection: a Spark
        # JDBC scan+count of a <10-row ledger paid ~0.4 s of planning
        # per micro-batch — a pure fixed-cost tax on every stream
        n = self.source.query_scalar(
            spark,
            f"SELECT COUNT(*) FROM {self.source.table} "
            f'WHERE "batch_id" = {int(batch_id)}',
        )
        return int(n) > 0

    def mark(self, spark: SparkSession, batch_id: int) -> None:
        self.source._execute(
            spark,
            f"INSERT INTO {self.source.table} VALUES ({int(batch_id)})",
        )
