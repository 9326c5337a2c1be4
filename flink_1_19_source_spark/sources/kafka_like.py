"""File-backed topic with Kafka source/sink semantics (SURVEY §2.1 S6/S7).

The sandbox has no broker, so S6 is implemented as the Kafka *contract* on
files — not a mock that skips the semantics, but the semantics themselves
with the network layer swapped for a directory:

- **topic / partitions / offsets**: rows are keyed to one of P partitions
  by a partitioner expression; each partition carries a dense, monotone
  ``offset`` starting at its current log-end offset (appends continue the
  sequence, exactly like a broker's log).
- **wire schema**: consumers see Spark's Kafka source schema verbatim —
  ``key binary, value binary, topic string, partition int, offset long,
  timestamp timestamp, timestampType int`` — so a query written against
  this source runs unchanged against ``format("kafka")`` in production.
- **segments**: each produce epoch writes one segment generation; file
  mtimes are forced monotone per epoch so a streaming consume replays
  epochs in produce order (Kafka's segment roll; the same trick as
  streaming/replay.py).
- **bounded reads with offset ranges**: ``read_batch(starting_offsets,
  ending_offsets)`` takes per-partition offset maps — Kafka's
  ``startingOffsets``/``endingOffsets`` JSON contract. The filters are
  plain comparisons on the ``partition``/``offset`` columns, so parquet
  row-group pruning serves the role of the broker's index lookup.
- **exactly-once produce**: a segment is written to a temp dir and
  renamed into the topic atomically; re-producing the same epoch id
  replaces it idempotently (the checkpoint-replay story of an
  exactly-once sink).

What is honestly NOT here: a network protocol, consumer groups, broker
replication. Swap ``FileTopic.read_stream`` for
``spark.readStream.format("kafka")`` and ``produce`` for
``df.writeStream.format("kafka")`` at deploy time — the query bodies,
being written against the wire schema, do not change.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Spark's Kafka source output schema (public contract; Structured
#: Streaming + Kafka integration guide).
KAFKA_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

_EPOCH_MTIME_BASE = 1_700_000_000


class FileTopic:
    def __init__(self, root: str, topic: str, num_partitions: int = 4):
        self.root = root
        self.topic = topic
        self.num_partitions = num_partitions
        self.dir = os.path.join(root, topic)

    # -- producer ---------------------------------------------------------
    def default_partitioner(self, key: Column) -> Column:
        """Keyed partitioner: hash(key) mod P — Kafka's sticky-free keyed
        behavior (murmur2 there, xxhash64 here; any deterministic hash
        keeps the contract: same key → same partition)."""
        return F.pmod(F.xxhash64(key), F.lit(self.num_partitions)).cast("int")

    def produce(
        self,
        df: DataFrame,
        key_col: str,
        value_cols: list[str],
        ts_col: str,
        epoch: int = 0,
        partition_expr: Column | None = None,
        order_cols: list[str] | None = None,
        tombstone: Column | None = None,
    ) -> None:
        """Append one segment generation. ``value`` is the JSON encoding of
        ``value_cols`` (the schema-on-read norm for Kafka payloads); offsets
        continue from each partition's current log-end offset; ``order_cols``
        fixes the within-partition append order (default: event time then
        key — deterministic for replays/oracles). Rows where ``tombstone``
        is true are produced with a NULL value — Kafka's delete marker for
        compacted topics (S7 upsert-kafka).

        Distributed end to end: the only driver work is the P-row log-end
        offset read and segment-file renames (metadata ops — the same work
        a broker does at segment roll)."""
        from pyspark.sql.window import Window

        part = partition_expr if partition_expr is not None else self.default_partitioner(
            F.col(key_col)
        )
        order_cols = order_cols or [ts_col, key_col]
        # Replay safety: a re-produce of this epoch must not see the old
        # generation's own rows in the log-end read (offsets would shift,
        # breaking the dense-and-idempotent contract), so exclude them here
        # and sweep any stale files for the epoch after the rename loop.
        base = self.end_offsets(df.sparkSession, exclude_epoch=epoch)
        base_map = F.create_map(
            *[x for k in range(self.num_partitions) for x in (F.lit(k), F.lit(base.get(k, 0)))]
        )
        w = Window.partitionBy("partition").orderBy(*order_cols)
        val = F.to_json(F.struct(*value_cols))
        if tombstone is not None:
            val = F.when(tombstone, F.lit(None).cast("string")).otherwise(val)
        out = (
            df.withColumn("partition", part)
            .withColumn(
                "offset",
                (F.row_number().over(w) - 1).cast("long") + base_map[F.col("partition")],
            )
            .select(
                F.col(key_col).cast("string").cast("binary").alias("key"),
                val.cast("binary").alias("value"),
                F.lit(self.topic).alias("topic"),
                F.col("partition"),
                F.col("offset"),
                F.col(ts_col).alias("timestamp"),
                F.lit(0).alias("timestampType"),  # CreateTime
            )
        )
        tmp = os.path.join(self.root, f".{self.topic}-seg-{epoch:04d}.tmp")
        # co-locate each topic-partition in its own file: parquet min/max on
        # (partition, offset) then prunes like a broker index
        out.repartition(self.num_partitions, "partition").write.mode(
            "overwrite"
        ).parquet(tmp)
        os.makedirs(self.dir, exist_ok=True)
        # atomic segment publish; re-producing an epoch replaces it (the
        # idempotent half of exactly-once)
        seg_mtime = _EPOCH_MTIME_BASE + epoch
        i = 0
        for fn in sorted(os.listdir(tmp)):
            if not fn.endswith(".parquet"):
                continue
            dst = os.path.join(self.dir, f"seg-{epoch:04d}-{i:04d}.parquet")
            os.replace(os.path.join(tmp, fn), dst)
            os.utime(dst, (seg_mtime, seg_mtime))
            i += 1
        # Sweep stale files from a previous generation of this epoch: if the
        # rewrite produced fewer part files, the old tail would otherwise
        # survive the renames and duplicate rows on replay.
        for fn in self._epoch_files(epoch):
            idx = int(fn.rsplit("-", 1)[1].split(".")[0])
            if idx >= i:
                os.remove(os.path.join(self.dir, fn))
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    def _epoch_files(self, epoch: int) -> list[str]:
        """Existing segment files of one produce epoch (basename list)."""
        if not os.path.isdir(self.dir):
            return []
        prefix = f"seg-{epoch:04d}-"
        return sorted(f for f in os.listdir(self.dir) if f.startswith(prefix))

    # -- consumers --------------------------------------------------------
    def end_offsets(
        self, spark: SparkSession, exclude_epoch: int | None = None
    ) -> dict[int, int]:
        """Per-partition log-end offsets (next offset to write) — a P-row
        metadata aggregate, the analogue of ``listOffsets``.

        ``exclude_epoch`` drops that epoch's own segment files from the
        read so a replayed produce re-derives the same base offsets as the
        original attempt."""
        if not os.path.isdir(self.dir):
            return {}
        skip = set(self._epoch_files(exclude_epoch)) if exclude_epoch is not None else set()
        files = [
            os.path.join(self.dir, f)
            for f in os.listdir(self.dir)
            if f.endswith(".parquet") and f not in skip
        ]
        if not files:
            return {}
        rows = (
            spark.read.parquet(*files)
            .groupBy("partition")
            .agg(F.max("offset").alias("mx"))
            .collect()
        )
        return {r["partition"]: r["mx"] + 1 for r in rows}

    def read_batch(
        self,
        spark: SparkSession,
        starting_offsets: dict[int, int] | None = None,
        ending_offsets: dict[int, int] | None = None,
    ) -> DataFrame:
        """Bounded consume honoring per-partition offset ranges — Kafka's
        ``startingOffsets``/``endingOffsets`` contract. Bounds become plain
        (partition, offset) comparisons, so they push into the parquet scan
        (row-group pruning = the broker's offset index)."""
        df = spark.read.parquet(self.dir)
        if starting_offsets:
            cond = None
            for k in range(self.num_partitions):
                c = (F.col("partition") == k) & (
                    F.col("offset") >= starting_offsets.get(k, 0)
                )
                cond = c if cond is None else cond | c
            df = df.filter(cond)
        if ending_offsets:
            cond = None
            for k in range(self.num_partitions):
                end = ending_offsets.get(k)
                c = (F.col("partition") == k) & (
                    F.col("offset") < end if end is not None else F.lit(True)
                )
                cond = c if cond is None else cond | c
            df = df.filter(cond)
        return df

    def read_compacted(self, spark: SparkSession) -> DataFrame:
        """Log-compacted view (S7 upsert-kafka read side): the latest
        record per key wins — per-key order is the per-partition offset
        (keys live in exactly one partition, so offsets totally order each
        key's history) — and NULL-value tombstones delete the key. One
        shuffle on key; the same plan a compacted-topic consumer builds."""
        from pyspark.sql.window import Window

        w = Window.partitionBy("key").orderBy(F.desc("offset"))
        return (
            spark.read.parquet(self.dir)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .filter(F.col("value").isNotNull())
        )

    def read_stream(self, spark: SparkSession, files_per_trigger: int = 1) -> DataFrame:
        """Streaming consume: segment files arrive in epoch order (mtime-
        forced), ``maxFilesPerTrigger`` paces the replay — the bounded
        stand-in for a live broker poll loop."""
        return (
            spark.readStream.schema(KAFKA_SCHEMA)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(self.dir)
        )


def decode_json_value(df: DataFrame, payload_schema) -> DataFrame:
    """Expand the binary JSON ``value`` into typed columns (schema-on-read;
    keeps key/partition/offset/timestamp alongside the payload)."""
    return df.withColumn(
        "v", F.from_json(F.col("value").cast("string"), payload_schema)
    ).select(
        F.col("key").cast("string").alias("key"),
        "topic",
        "partition",
        "offset",
        "timestamp",
        "v.*",
    )
