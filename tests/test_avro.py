"""S5: pure-Python Avro container round-trip — every supported type,
including NULLs through the nullable union branches, must survive
bit-exactly; the files must carry the standard header so any Avro tool
can read them."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import types as T

from flink_1_19_source_spark.sources import avro_py


@pytest.fixture(scope="module")
def work_dir():
    d = tempfile.mkdtemp(prefix="sgraft_avro_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_avro_all_types_and_nulls_roundtrip(spark, work_dir):
    schema = T.StructType(
        [
            T.StructField("i64", T.LongType(), True),
            T.StructField("i32", T.IntegerType(), True),
            T.StructField("f64", T.DoubleType(), True),
            T.StructField("s", T.StringType(), True),
            T.StructField("b", T.BooleanType(), True),
            T.StructField("raw", T.BinaryType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("d", T.DateType(), True),
        ]
    )
    rows = [
        (
            -(2**62), 42, 3.141592653589793, "héllo ∆ unicode", True,
            b"\x00\xff\x10", dt.datetime(2024, 3, 1, 12, 34, 56, 789012),
            dt.date(1999, 12, 31),
        ),
        (None, None, None, None, None, None, None, None),
        (0, -1, -0.0, "", False, b"", dt.datetime(1970, 1, 1), dt.date(1970, 1, 1)),
    ]
    df = spark.createDataFrame(rows, schema)
    path = os.path.join(work_dir, "avro_types")
    avro_py.write_avro(df.repartition(2), path)
    back = avro_py.read_avro(spark, path, schema)
    got = sorted(
        [tuple(r) for r in back.collect()], key=lambda t: (t[0] is None, str(t))
    )
    want = sorted(rows, key=lambda t: (t[0] is None, str(t)))
    # binary comes back as bytearray; normalize
    norm = lambda t: tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v for v in t)  # noqa: E731
    assert [norm(t) for t in got] == [norm(t) for t in want]


def test_avro_files_have_standard_header(spark, work_dir):
    df = spark.range(10).selectExpr("id", "CAST(id AS STRING) AS s")
    path = os.path.join(work_dir, "avro_hdr")
    avro_py.write_avro(df.coalesce(1), path)
    files = glob.glob(os.path.join(path, "*.avro"))
    assert files
    data = open(files[0], "rb").read()
    assert data[:4] == b"Obj\x01"
    assert b"avro.schema" in data and b'"type": "record"' in data


def test_avro_varint_zigzag_roundtrip_property():
    """Property: every int64 survives the zigzag-varint encode/decode, and
    every container row group survives the block codec (pure Python — no
    Spark involved)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_1_19_source_spark.sources.avro_py import _dec_long, _enc_long

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    def roundtrip(n):
        buf = bytearray()
        _enc_long(n, buf)
        got, pos = _dec_long(memoryview(bytes(buf)), 0)
        assert got == n and pos == len(buf)

    roundtrip()


def test_avro_container_decode_matches_encode_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_1_19_source_spark.sources import avro_py
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), True),
            T.StructField("s", T.StringType(), True),
            T.StructField("f", T.DoubleType(), False),
        ]
    )
    sj = avro_py.avro_schema_json(schema)

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(-(2**62), 2**62)),
                st.one_of(st.none(), st.text(max_size=40)),
                st.floats(allow_nan=False, allow_infinity=False),
            ),
            max_size=30,
        )
    )
    def roundtrip(rows):
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".avro") as f:
            avro_py._write_container(iter(rows), f.name, schema, sj)
            got = avro_py.decode_container(open(f.name, "rb").read(), schema)
        assert got == [tuple(r) for r in rows]

    roundtrip()


def test_block_index_covers_file_exactly_and_block_read_matches(spark, work_dir):
    """index_blocks' (offset, length) spans must tile the data section
    exactly (header-only IO), and the block-parallel read must return
    the same rows as the whole-file read for any blocks_per_task."""
    import os

    from pyspark.sql import functions as F

    from flink_1_19_source_spark.sources import avro_py

    df = spark.range(0, 10_000).select(
        F.col("id").alias("a"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
        (F.col("id") * 1.5).alias("f"),
    ).coalesce(1)
    path = os.path.join(work_dir, "avro_blocks")
    avro_py.write_avro(df, path)
    fp = os.path.join(path, sorted(os.listdir(path))[0])
    blocks, sync = avro_py.index_blocks(fp)
    assert len(blocks) == (10_000 + avro_py._ROWS_PER_BLOCK - 1) // avro_py._ROWS_PER_BLOCK
    data = open(fp, "rb").read()
    data_start, hdr_sync = avro_py._skip_header(data)
    assert sync == hdr_sync
    assert blocks[0][0] == data_start
    for (o1, l1), (o2, _) in zip(blocks, blocks[1:]):
        assert o1 + l1 == o2  # contiguous tiling
    assert blocks[-1][0] + blocks[-1][1] == len(data)

    whole = avro_py.read_avro(spark, path, df.schema)
    for bpt in (1, 3, 100):
        blk = avro_py.read_avro_blocks(spark, path, df.schema, blocks_per_task=bpt)
        assert blk.count() == 10_000
        assert whole.exceptAll(blk).count() == 0
        assert blk.exceptAll(whole).count() == 0


def test_numpy_varint_fast_path_matches_compiled_loop(spark, work_dir):
    """All-varint non-nullable schemas take the vectorized boundary-scan
    decoder (r8): values — including multi-byte negative zigzags and
    date/timestamp micros — must match the compiled per-row loop bit
    for bit, and the distributed read must return the exact rows."""
    import glob
    import random
    import struct

    import numpy as np
    from pyspark.sql import types as T

    from flink_1_19_source_spark.sources import avro_py as ap

    random.seed(11)
    rows = [
        (random.randint(-2**50, 2**50), random.randint(-2**20, 2**20), i % 7)
        for i in range(20_000)
    ]
    schema = T.StructType([
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.LongType(), False),
        T.StructField("c", T.IntegerType(), False),
    ])
    assert ap._varint_only(schema)
    df = spark.createDataFrame(rows, schema).coalesce(1)
    path = f"{work_dir}/avro_np"
    ap.write_avro(df, path)
    data = open(glob.glob(path + "/*.avro")[0], "rb").read()
    pos, sync = ap._skip_header(data)

    fast = ap._decode_blocks_numpy(data, pos, sync, schema)
    dec = ap._compile_block_decoder(schema)
    slow = [[] for _ in schema.fields]
    mv, p = memoryview(data), pos
    while p < len(data):
        count, p = ap._dec_long(mv, p)
        _, p = ap._dec_long(mv, p)
        p = dec(data, p, count, slow, struct.unpack_from)
        p += 16
    for f, s in zip(fast, slow):
        assert np.array_equal(f, np.array(s, np.int64))

    got = sorted(ap.read_avro(spark, path, schema).collect())
    assert got == sorted(rows)

    # nullable or string-bearing schemas must NOT take the fast path
    assert not ap._varint_only(T.StructType([
        T.StructField("a", T.LongType(), True)]))
    assert not ap._varint_only(T.StructType([
        T.StructField("s", T.StringType(), False)]))
