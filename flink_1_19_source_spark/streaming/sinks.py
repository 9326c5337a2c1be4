"""Changelog-aware sinks (SURVEY §1.3, §7.4, X4/X6).

Flink models streaming results as changelogs (RowKind +I/-U/+U/-D) and
lets sinks declare which modes they accept. Spark has no first-class
retraction streams; the engine's equivalent is this module:

- output_mode_for(shape): the §7.4 planning table — pick Spark's
  append/update/complete per query shape.
- UpsertSink: foreachBatch MERGE keyed by primary key — the upsert-kafka /
  JDBC-upsert sink equivalent. Idempotent per (pk, batch) so availableNow
  retries converge (exactly-once effect on the materialized view).
- interpret_cdc: debezium/canal-style op column → RowKind mapping (X6);
  apply_changelog folds +I/+U/-D into a keyed table.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: §7.4 output-mode planning table: query shape → Spark sink mode
OUTPUT_MODE: dict[str, str] = {
    "stateless": "append",            # select/filter/explode
    "windowed_agg": "append",         # emit on window close (watermark)
    "global_agg": "update",           # unwindowed GROUP BY → upsert stream
    "topn": "update",                 # retract stream → latest snapshot
    "dedup_keep_first": "append",
    "stream_stream_join": "append",
}


def output_mode_for(shape: str) -> str:
    return OUTPUT_MODE[shape]


class UpsertSink:
    """Driver-side keyed MERGE sink for tests/local runs.

    Real deployments swap `_merge` for a transactional MERGE INTO (Delta/
    Iceberg/JDBC); the contract is identical: per micro-batch, group by
    primary key, last writer wins, '-D' deletes. foreachBatch gives the
    (batch_df, batch_id) pair; replays of the same batch_id are no-ops,
    which is what makes the sink effectively exactly-once."""

    def __init__(self, pk_cols: list[str], op_col: str | None = None):
        self.pk_cols = pk_cols
        self.op_col = op_col
        self.rows: dict[tuple, dict] = {}
        self.seen_batches: set[int] = set()
        self._lock = threading.Lock()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        with self._lock:
            if batch_id in self.seen_batches:
                return
            self.seen_batches.add(batch_id)
            for row in batch_df.collect():
                d = row.asDict()
                key = tuple(d[c] for c in self.pk_cols)
                if self.op_col and d.get(self.op_col) == "-D":
                    self.rows.pop(key, None)
                else:
                    self.rows[key] = d

    def snapshot(self) -> list[dict]:
        with self._lock:
            return list(self.rows.values())


#: debezium-ish op → Flink RowKind
CDC_OP_TO_ROWKIND = {"c": "+I", "r": "+I", "u": "+U", "d": "-D"}


def interpret_cdc(df: DataFrame, op_col: str = "op") -> DataFrame:
    """Map a CDC op column (c/r/u/d) to a `_rowkind` column (+I/+U/-D) —
    Flink's changelog ingestion for debezium/canal formats (X6)."""
    m = F.create_map(
        *[F.lit(x) for kv in CDC_OP_TO_ROWKIND.items() for x in kv]
    )
    return df.withColumn("_rowkind", m[F.col(op_col)])


def apply_changelog(
    df: DataFrame,
    pk_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Batch-fold a changelog into its final table state: last op per key
    wins (by ts desc, then `tiebreak_cols` desc for determinism); '-D'
    rows drop the key. This is the materialization a retraction-consuming
    sink would build."""
    from pyspark.sql.window import Window

    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*pk_cols).orderBy(*order)
    latest = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return latest.filter(F.col("_rowkind") != "-D")
