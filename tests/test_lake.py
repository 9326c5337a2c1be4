"""Data-lake write-semantics invariants (queries/sources2.py additions).

The oracle suite proves the CONTENT contract; this pins the mechanism:
dynamic partition overwrite must leave untouched partitions' files
byte-identical on disk (static overwrite would truncate the table).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_1_19_source_spark.tables import load_table


def _file_stats(root: str) -> dict[str, tuple[int, float]]:
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime)
    return out


def test_dynamic_overwrite_touches_only_incoming_partitions(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders")
    d = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 400)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    d.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    before = _file_stats(path)
    assert any("o_orderstatus=F" in k for k in before)
    assert any("o_orderstatus=O" in k for k in before)

    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        d.filter(F.col("o_orderstatus") == "F").withColumn(
            "o_totalprice", F.round(F.col("o_totalprice") * 0.9, 2)
        ).write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    after = _file_stats(path)

    untouched_before = {k: v for k, v in before.items() if "o_orderstatus=F" not in k}
    untouched_after = {k: v for k, v in after.items() if "o_orderstatus=F" not in k}
    # every non-F file survives with identical size AND mtime (not rewritten)
    assert untouched_after == untouched_before
    # the F partition was replaced (new file names — Spark writes fresh
    # part files on overwrite)
    f_before = {k for k in before if "o_orderstatus=F" in k}
    f_after = {k for k in after if "o_orderstatus=F" in k}
    assert f_after
    assert f_after.isdisjoint(f_before)


def test_sorted_range_write_disjoint_ranges_random(spark, tmp_path):
    """S1 sorted sink: heavy duplicates + skew must still produce
    pairwise-disjoint per-file key ranges (equal keys land in one range
    partition) with content preserved."""
    import pyarrow.parquet as pq

    from flink_1_19_source_spark.sources.formats import sorted_range_write

    rows = [(i, i % 7) for i in range(500)] + [(1000 + i, 3) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, k long")
    path = str(tmp_path / "sorted")
    sorted_range_write(df, path, "k", 5)

    import os

    ranges = []
    total = 0
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, f)).metadata
        if meta.num_rows == 0:
            continue
        total += meta.num_rows
        idx = [meta.schema.column(i).name for i in range(meta.num_columns)].index("k")
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert total == 800
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, ranges
    assert spark.read.parquet(path).count() == 800
