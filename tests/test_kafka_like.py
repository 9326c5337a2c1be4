"""S6 file-topic contract + X1 per-partition watermark/idleness tests."""

import datetime as dt
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_1_19_source_spark.sources.kafka_like import (
    KAFKA_SCHEMA,
    FileTopic,
    decode_json_value,
)
from flink_1_19_source_spark.streaming.partition_watermark import (
    PartitionWatermarkTracker,
)

from .conftest import *  # noqa: F401,F403  (spark fixture)


def _mk_df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, x=x, ts=dt.datetime(2024, 1, 1, 0, m)) for k, x, m in rows]
    )


def test_produce_assigns_kafka_wire_schema(spark, tmp_path):
    t = FileTopic(str(tmp_path), "t", num_partitions=2)
    t.produce(_mk_df(spark, [(1, "a", 0), (2, "b", 1)]), "k", ["x"], "ts")
    got = t.read_batch(spark)
    assert got.schema == KAFKA_SCHEMA
    assert got.count() == 2
    assert {r.timestampType for r in got.collect()} == {0}


def test_offsets_continue_across_produces(spark, tmp_path):
    """Log-end-offset continuation: a second produce appends AFTER the
    first generation's offsets, per partition — the broker-log invariant."""
    t = FileTopic(str(tmp_path), "t", num_partitions=2)
    part = F.pmod(F.col("k"), F.lit(2)).cast("int")
    t.produce(_mk_df(spark, [(0, "a", 0), (2, "b", 1), (1, "c", 2)]),
              "k", ["x"], "ts", epoch=0, partition_expr=part)
    t.produce(_mk_df(spark, [(0, "d", 3), (1, "e", 4)]),
              "k", ["x"], "ts", epoch=1, partition_expr=part)
    rows = sorted(
        t.read_batch(spark).select("partition", "offset").collect(),
        key=lambda r: (r.partition, r.offset),
    )
    got = [(r.partition, r.offset) for r in rows]
    # partition 0: offsets 0,1 from epoch 0 then 2 from epoch 1; p1: 0 then 1
    assert got == [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1)]
    assert t.end_offsets(spark) == {0: 3, 1: 2}


def test_offset_range_read(spark, tmp_path):
    t = FileTopic(str(tmp_path), "t", num_partitions=1)
    t.produce(_mk_df(spark, [(1, c, m) for m, c in enumerate("abcdef")]),
              "k", ["x"], "ts", partition_expr=F.lit(0))
    got = t.read_batch(spark, starting_offsets={0: 2}, ending_offsets={0: 5})
    assert sorted(r.offset for r in got.collect()) == [2, 3, 4]


def test_json_value_roundtrip(spark, tmp_path):
    from pyspark.sql.types import StringType, StructField, StructType

    t = FileTopic(str(tmp_path), "t", num_partitions=1)
    t.produce(_mk_df(spark, [(7, "payload", 0)]), "k", ["x"], "ts",
              partition_expr=F.lit(0))
    dec = decode_json_value(
        t.read_batch(spark), StructType([StructField("x", StringType())])
    ).first()
    assert dec.x == "payload" and dec.key == "7"


def test_idleness_gap_unfreezes_watermark():
    """The X1 semantics in isolation: with partition 1 stalled, the plain
    min-combine freezes at its last event; the idleness gap expels it and
    the combined watermark advances with the live partition."""
    base = dt.datetime(2024, 1, 1)
    delay = dt.timedelta(minutes=10)

    frozen = PartitionWatermarkTracker(delay=delay, idle_gap=None)
    lively = PartitionWatermarkTracker(
        delay=delay, idle_gap=dt.timedelta(hours=1)
    )
    # partition 0 runs to +6h, partition 1 stops at +1h
    for tr in (frozen, lively):
        tr.part_max = {0: base + dt.timedelta(hours=6), 1: base + dt.timedelta(hours=1)}
    assert frozen.combined() == base + dt.timedelta(hours=1) - delay
    assert lively.combined() == base + dt.timedelta(hours=6) - delay
    # a partition inside the gap still gates the min (no premature eviction)
    lively.part_max[1] = base + dt.timedelta(hours=5, minutes=30)
    assert lively.combined() == base + dt.timedelta(hours=5, minutes=30) - delay


def test_tracker_snapshot_restore():
    tr = PartitionWatermarkTracker(delay=dt.timedelta(minutes=5))
    tr.part_max = {0: dt.datetime(2024, 1, 1, 12), 3: dt.datetime(2024, 1, 1, 13)}
    tr2 = PartitionWatermarkTracker(delay=dt.timedelta(minutes=5))
    tr2.restore(tr.snapshot())
    assert tr2.part_max == tr.part_max and tr2.combined() == tr.combined()


def test_reproduce_epoch_is_idempotent(spark, tmp_path):
    """Exactly-once produce: re-writing the same epoch replaces its segment
    instead of duplicating or offset-shifting rows (checkpoint-replay
    safety) — with NO manual cleanup: produce() itself must exclude the
    old generation from the log-end read and sweep its stale files."""
    t = FileTopic(str(tmp_path), "t", num_partitions=1)
    base = _mk_df(spark, [(1, "a", 0), (1, "b", 1)])
    t.produce(base, "k", ["x"], "ts", epoch=0, partition_expr=F.lit(0))
    t.produce(base, "k", ["x"], "ts", epoch=1, partition_expr=F.lit(0))
    rows_before = sorted(
        (r["offset"], bytes(r["value"]).decode())
        for r in t.read_batch(spark).collect()
    )
    # crash-replay of the LAST epoch (a foreachBatch retry): same batch id,
    # same data — offsets must come out identical, no duplicates
    t.produce(base, "k", ["x"], "ts", epoch=1, partition_expr=F.lit(0))
    rows_after = sorted(
        (r["offset"], bytes(r["value"]).decode())
        for r in t.read_batch(spark).collect()
    )
    assert rows_after == rows_before


def test_reproduce_epoch_sweeps_stale_part_files(spark, tmp_path):
    """A replay that yields fewer part files than the original generation
    must remove the stale tail, not leave it duplicating rows."""
    t = FileTopic(str(tmp_path), "t", num_partitions=2)
    part = F.pmod(F.col("k"), F.lit(2)).cast("int")
    both = _mk_df(spark, [(0, "p0", 0), (1, "p1", 1)])  # 2 partitions → 2 files
    t.produce(both, "k", ["x"], "ts", epoch=0, partition_expr=part)
    assert len([f for f in os.listdir(t.dir) if f.startswith("seg-0000")]) == 2
    # replay writes only partition 0 → 1 non-empty part file
    one = _mk_df(spark, [(0, "p0", 0)])
    t.produce(one, "k", ["x"], "ts", epoch=0, partition_expr=part)
    vals = sorted(bytes(r["value"]).decode() for r in t.read_batch(spark).collect())
    assert vals == ['{"x":"p0"}'], vals


def test_compacted_read_latest_wins_and_tombstone_deletes(spark, tmp_path):
    """S7: log compaction — latest offset per key wins; a NULL-value
    tombstone removes the key entirely."""
    t = FileTopic(str(tmp_path), "t", num_partitions=2)
    part = F.pmod(F.col("k"), F.lit(2)).cast("int")
    t.produce(_mk_df(spark, [(1, "old", 0), (2, "keep", 1)]), "k", ["x"], "ts",
              epoch=0, partition_expr=part)
    t.produce(_mk_df(spark, [(1, "new", 2), (3, "dead", 3)]), "k", ["x"], "ts",
              epoch=1, partition_expr=part,
              tombstone=F.col("x") == "dead")
    from pyspark.sql.types import StringType, StructField, StructType

    got = {
        r.key: r.x
        for r in decode_json_value(
            t.read_compacted(spark),
            StructType([StructField("x", StringType())]),
        ).collect()
    }
    assert got == {"1": "new", "2": "keep"}


def test_watermark_alignment_invariant_and_completeness(spark, sf_dir):
    """X1 alignment: replay the scheduler's decision trace and assert the
    FLIP-182 invariant directly — a partition is never fetched while its
    watermark exceeds the slowest unfinished partition's by more than the
    drift bound — plus pausing engagement and exactly-once completeness."""
    from pyspark.sql import functions as F

    from flink_1_19_source_spark.queries.kafka_queries import _events_topic
    from flink_1_19_source_spark.streaming.partition_watermark_aligned import (
        aligned_consume,
    )
    from flink_1_19_source_spark.tables import load_table

    t = _events_topic(spark, sf_dir, "t_aligned_inv")
    end = t.end_offsets(spark)
    steps = {p: max(1, end[p] // (3 if p < 2 else 12)) for p in end}
    drift = 600_000
    consumed, stats = aligned_consume(spark, t, max_drift_ms=drift, step_offsets=steps)

    assert stats["paused_rounds"] >= 1, stats
    for wm, unfinished, read_set in stats["trace"]:
        have = [wm[p] for p in unfinished if p in wm]
        if not have or not any(p in wm for p in read_set):
            continue
        floor = min(have)
        for p in read_set:
            if p in wm:
                assert wm[p] <= floor + drift, (p, wm, floor)

    n_total = load_table(spark, sf_dir, "events").count()
    assert consumed.count() == n_total
    assert consumed.groupBy("partition", "offset").count().filter(
        F.col("count") > 1
    ).count() == 0
