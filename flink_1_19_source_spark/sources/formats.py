"""Filesystem sources/sinks and formats (SURVEY §2.1 S1–S5, S9, S12).

Flink locus: flink-connector-files + flink-formats/{flink-csv, flink-json,
flink-parquet, flink-orc, flink-avro}. Spark equivalents are the built-in
DataSource V2 implementations; the engine's value-add is (a) round-trip
fidelity guarantees per format and (b) the scale-relevant options set on
every writer (partitioned layout, compression).

Avro note: Spark treats avro as an external module jar this container
cannot fetch, so ``fmt="avro"`` routes through the pure-Python container
implementation in avro_py.py (standard Avro bytes, distributed write and
read) instead of ``format("avro")`` — the S5 round-trip is real either
way; deploying the jar later only changes which codec runs.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_WORK_ROOT = os.path.join(tempfile.gettempdir(), "sgraft_formats")

CSV_OPTS = {"header": "true", "nullValue": "\\N", "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def scratch(sf_dir: str, name: str) -> str:
    key = os.path.basename(sf_dir.rstrip("/"))
    d = os.path.join(_WORK_ROOT, key, name)
    os.makedirs(d, exist_ok=True)
    return d


def write_read_roundtrip(
    df: DataFrame, fmt: str, path: str, options: dict[str, str] | None = None
) -> DataFrame:
    """Write `df` in `fmt`, read it back with the SAME explicit schema
    (schema inference would silently widen CSV ints); the caller compares
    against the source — the engine's format-fidelity contract."""
    spark = df.sparkSession
    opts = options or {}
    if fmt == "avro":
        from . import avro_py

        avro_py.write_avro(df, path)
        # block-parallel read (r7): sync-marker block index fans one
        # container out across tasks — a big single file is no longer a
        # serial decode unit
        return avro_py.read_avro_blocks(spark, path, df.schema)
    w = df.write.mode("overwrite").format(fmt)
    for k, v in opts.items():
        w = w.option(k, v)
    w.save(path)
    r = spark.read.format(fmt).schema(df.schema)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(path)


def partitioned_write(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Hive-style partitioned layout — at 100 TB this is what makes
    partition pruning possible: a filter on the partition column prunes
    directories before any file is opened."""
    df.write.mode("overwrite").format(fmt).partitionBy(*partition_cols).save(path)


def datagen(
    spark: SparkSession, n: int, seed_cols: dict[str, str]
) -> DataFrame:
    """Deterministic synthetic rows (Flink datagen connector, S9):
    `spark.range` + column expressions — pure Catalyst, fully parallel
    (range splits across executors; no driver materialization)."""
    df = spark.range(n)
    for name, expr in seed_cols.items():
        df = df.selectExpr("*", f"({expr}) AS {name}")
    return df


def compacted_partitioned_write(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Partitioned write with small-file compaction: shuffle rows onto
    their partition key before ``partitionBy``, so each partition
    directory is written by (at most) the tasks that own its key —
    one-ish file per partition instead of tasks×partitions slivers.

    The small-file problem is a first-order 100 TB failure mode: a
    1000-task write into 20 partitions without this yields 20 000 tiny
    files whose open/footer cost dominates every later scan. The
    repartition is one extra shuffle at write time, paid once; real
    deployments tune the file count per partition by repartitioning on
    (key, bucket(n)) instead of the bare key.
    """
    from pyspark.sql import functions as F

    df.repartition(*[F.col(c) for c in partition_cols]).write.mode(
        "overwrite"
    ).format(fmt).partitionBy(*partition_cols).save(path)


def sorted_range_write(
    df: DataFrame, path: str, col: str, n_files: int, fmt: str = "parquet"
) -> None:
    """Globally-sorted output: range-exchange on ``col`` (sampled range
    boundaries, Spark's RangePartitioning — the same two-phase global
    sort Flink's batch ORDER BY sink runs), then sort within each task.
    Result: n_files files whose [min, max] key ranges are pairwise
    disjoint, so every parquet footer becomes a coarse index — a reader
    filtering on the key opens only the files whose range matches
    (row-group min/max pruning at file granularity). The 100 TB pattern
    for time- or key-ordered archival layouts."""
    from pyspark.sql import functions as F

    df.repartitionByRange(n_files, F.col(col)).sortWithinPartitions(
        col
    ).write.mode("overwrite").format(fmt).save(path)
