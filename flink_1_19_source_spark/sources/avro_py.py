"""Avro object-container files without the spark-avro module (S5).

The spark-avro datasource is an external jar this container cannot
fetch, but the Avro Object Container File format itself is a small,
public spec (Apache Avro 1.11.x specification, "Object Container
Files" + "Binary Encoding"): magic ``Obj\\x01``, a metadata map
carrying the writer schema JSON, a 16-byte sync marker, then blocks of
``(row count, byte size, rows, sync)`` with zigzag-varint longs,
little-endian IEEE floats/doubles and length-prefixed UTF-8 strings.
This module implements that spec directly so S5 is a *real* format
round-trip, not a stub:

- **write_avro(df, path)**: distributed — each Spark partition writes
  one ``part-NNNNN.avro`` container file via ``foreachPartition`` (the
  legitimate per-partition-imperative-IO case); the driver only renders
  the schema JSON.
- **read_avro(spark, path, schema)**: distributed — the built-in
  ``binaryFile`` datasource ships each container file to an executor,
  where a ``mapInPandas`` decoder parses blocks into Arrow batches.

Type coverage mirrors the engine's table schemas: long/int/double/
float/string/boolean/bytes, nullable unions, timestamp-micros and date
logical types. Python-side encode/decode is the slow path by design —
this is the format-compatibility tier; the columnar performance tier is
parquet/ORC. At 100 TB you deploy the spark-avro jar and swap
``write_avro``/``read_avro`` for ``format("avro")`` — the file bytes
this module produces are standard Avro, readable by any Avro tool.
"""

from __future__ import annotations

import io
import json
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
#: fixed sync marker: deterministic output (any 16 bytes are spec-legal)
SYNC = bytes(range(16))

_ROWS_PER_BLOCK = 4096


# -- binary encoding (Avro spec: zigzag varint, LE floats, len-prefixed) --

def _enc_long(n: int, out: bytearray) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _enc_bytes(b: bytes, out: bytearray) -> None:
    _enc_long(len(b), out)
    out.extend(b)


def _dec_long(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos  # un-zigzag


def _dec_bytes(buf: memoryview, pos: int) -> tuple[bytes, int]:
    n, pos = _dec_long(buf, pos)
    return bytes(buf[pos : pos + n]), pos + n


# -- schema mapping (Spark <-> Avro) --------------------------------------

_PRIMS: list[tuple[type, object]] = [
    (T.LongType, "long"),
    (T.IntegerType, "int"),
    (T.DoubleType, "double"),
    (T.FloatType, "float"),
    (T.StringType, "string"),
    (T.BooleanType, "boolean"),
    (T.BinaryType, "bytes"),
    (T.TimestampType, {"type": "long", "logicalType": "timestamp-micros"}),
    (T.TimestampNTZType, {"type": "long", "logicalType": "local-timestamp-micros"}),
    (T.DateType, {"type": "int", "logicalType": "date"}),
]


def _avro_type(dt: T.DataType):
    for spark_t, avro_t in _PRIMS:
        if isinstance(dt, spark_t):
            return avro_t
    raise TypeError(f"avro_py: unsupported Spark type {dt}")


def avro_schema_json(schema: T.StructType, name: str = "row") -> str:
    fields = []
    for f in schema.fields:
        at = _avro_type(f.dataType)
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    return json.dumps({"type": "record", "name": name, "fields": fields})


# -- per-value codecs ------------------------------------------------------

def _encoder(dt: T.DataType):
    import datetime as _dt

    if isinstance(dt, (T.LongType, T.IntegerType)):
        return lambda v, out: _enc_long(int(v), out)
    if isinstance(dt, T.DoubleType):
        return lambda v, out: out.extend(struct.pack("<d", float(v)))
    if isinstance(dt, T.FloatType):
        return lambda v, out: out.extend(struct.pack("<f", float(v)))
    if isinstance(dt, T.StringType):
        return lambda v, out: _enc_bytes(str(v).encode("utf-8"), out)
    if isinstance(dt, T.BooleanType):
        return lambda v, out: out.append(1 if v else 0)
    if isinstance(dt, T.BinaryType):
        return lambda v, out: _enc_bytes(bytes(v), out)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        epoch = _dt.datetime(1970, 1, 1)
        return lambda v, out: _enc_long(
            round((v.replace(tzinfo=None) - epoch).total_seconds() * 1_000_000),
            out,
        )
    if isinstance(dt, T.DateType):
        epoch_d = _dt.date(1970, 1, 1)
        return lambda v, out: _enc_long((v - epoch_d).days, out)
    raise TypeError(f"avro_py: unsupported Spark type {dt}")


def _decoder(dt: T.DataType):
    import datetime as _dt

    if isinstance(dt, (T.LongType, T.IntegerType)):
        return _dec_long
    if isinstance(dt, T.DoubleType):
        return lambda buf, pos: (struct.unpack_from("<d", buf, pos)[0], pos + 8)
    if isinstance(dt, T.FloatType):
        return lambda buf, pos: (struct.unpack_from("<f", buf, pos)[0], pos + 4)
    if isinstance(dt, T.StringType):
        def dec_s(buf, pos):
            b, pos = _dec_bytes(buf, pos)
            return b.decode("utf-8"), pos
        return dec_s
    if isinstance(dt, T.BooleanType):
        return lambda buf, pos: (buf[pos] == 1, pos + 1)
    if isinstance(dt, T.BinaryType):
        return _dec_bytes
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        epoch = _dt.datetime(1970, 1, 1)
        def dec_ts(buf, pos):
            us, pos = _dec_long(buf, pos)
            return epoch + _dt.timedelta(microseconds=us), pos
        return dec_ts
    if isinstance(dt, T.DateType):
        epoch_d = _dt.date(1970, 1, 1)
        def dec_d(buf, pos):
            days, pos = _dec_long(buf, pos)
            return epoch_d + _dt.timedelta(days=days), pos
        return dec_d
    raise TypeError(f"avro_py: unsupported Spark type {dt}")


# -- container file writer/reader -----------------------------------------

def _write_header(out: io.BufferedWriter, schema_json: str) -> None:
    head = bytearray()
    head.extend(MAGIC)
    _enc_long(2, head)  # metadata map: 2 entries
    _enc_bytes(b"avro.schema", head)
    _enc_bytes(schema_json.encode("utf-8"), head)
    _enc_bytes(b"avro.codec", head)
    _enc_bytes(b"null", head)
    _enc_long(0, head)  # end of map
    head.extend(SYNC)
    out.write(head)


def _write_container(rows, path: str, schema: T.StructType, schema_json: str) -> None:
    encs = [(_encoder(f.dataType), f.nullable) for f in schema.fields]
    n_fields = len(schema.fields)
    with open(path, "wb") as out:
        _write_header(out, schema_json)
        block = bytearray()
        count = 0

        def flush():
            nonlocal block, count
            if not count:
                return
            pre = bytearray()
            _enc_long(count, pre)
            _enc_long(len(block), pre)
            out.write(pre)
            out.write(block)
            out.write(SYNC)
            block = bytearray()
            count = 0

        for row in rows:
            for i in range(n_fields):
                enc, nullable = encs[i]
                v = row[i]
                if nullable:
                    if v is None:
                        _enc_long(0, block)  # union branch 0 = null
                        continue
                    _enc_long(1, block)  # union branch 1 = value
                enc(v, block)
            count += 1
            if count >= _ROWS_PER_BLOCK:
                flush()
        flush()


def write_avro(df: DataFrame, path: str) -> None:
    """Distributed Avro write: one standard container file per Spark
    partition (``foreachPartition`` — per-partition imperative IO)."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    schema = df.schema
    schema_json = avro_schema_json(schema)

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        _write_container(
            rows, os.path.join(path, f"part-{pid:05d}.avro"), schema, schema_json
        )

    df.foreachPartition(write_partition)


def decode_container(data: bytes, schema: T.StructType) -> list[tuple]:
    """Parse one Avro container file into row tuples (executor-side)."""
    buf = memoryview(data)
    assert bytes(buf[:4]) == MAGIC, "not an Avro container file"
    pos = 4
    # metadata map (possibly multi-segment per spec)
    while True:
        n, pos = _dec_long(buf, pos)
        if n == 0:
            break
        if n < 0:  # negative count is followed by a byte size (spec)
            n = -n
            _, pos = _dec_long(buf, pos)
        for _ in range(n):
            _, pos = _dec_bytes(buf, pos)  # key
            _, pos = _dec_bytes(buf, pos)  # value
    sync = bytes(buf[pos : pos + 16])
    pos += 16
    decs = [(_decoder(f.dataType), f.nullable) for f in schema.fields]
    rows: list[tuple] = []
    end = len(buf)
    while pos < end:
        count, pos = _dec_long(buf, pos)
        size, pos = _dec_long(buf, pos)
        for _ in range(count):
            vals = []
            for dec, nullable in decs:
                if nullable:
                    branch, pos = _dec_long(buf, pos)
                    if branch == 0:
                        vals.append(None)
                        continue
                v, pos = dec(buf, pos)
                vals.append(v)
            rows.append(tuple(vals))
        assert bytes(buf[pos : pos + 16]) == sync, "sync marker mismatch"
        pos += 16
    return rows


# -- compiled columnar decoder (the fast path) -----------------------------
#
# The generic decode_container above pays a Python function call and a
# tuple append per VALUE.  For the hot read path we exec-compile one
# specialized block-decoder per schema: the varint loop and fixed-width
# reads are inlined (no dispatch), values land in per-COLUMN lists, and
# timestamps stay int64 micros until one vectorized pd.to_datetime at the
# end — measured 1.8x faster than the generic decoder on a 150k-row
# orders container (see STATUS.md S5-jar note); the jar remains the
# production route.

_DEC_CACHE: dict[tuple, object] = {}


def _varint_snippet(dst: str, ind: str) -> str:
    return (
        f"{ind}acc = 0\n"
        f"{ind}shift = 0\n"
        f"{ind}while True:\n"
        f"{ind}    b = buf[pos]; pos += 1\n"
        f"{ind}    acc |= (b & 0x7F) << shift\n"
        f"{ind}    if not (b & 0x80): break\n"
        f"{ind}    shift += 7\n"
        f"{ind}{dst} = (acc >> 1) ^ -(acc & 1)\n"
    )


def _compile_block_decoder(schema: T.StructType):
    """Generate `dec(buf, pos, count, cols) -> pos` with every field's
    read inlined.  Nullable fields read the union branch as a single
    byte (branch ∈ {0,1} ⇒ one zigzag byte, 0x00 or 0x02)."""
    key = tuple((f.name, str(f.dataType), f.nullable) for f in schema.fields)
    if key in _DEC_CACHE:
        return _DEC_CACHE[key]
    src = ["def _dec(buf, pos, count, cols, unpack_from):"]
    src.append("    for _ in range(count):")
    for i, f in enumerate(schema.fields):
        ind = "        "
        app = f"cols[{i}].append"
        if f.nullable:
            src.append(f"{ind}b = buf[pos]; pos += 1")
            src.append(f"{ind}if b == 0:")
            src.append(f"{ind}    {app}(None)")
            src.append(f"{ind}else:")
            ind = "            "
        dt = f.dataType
        if isinstance(dt, (T.LongType, T.IntegerType)):
            src.append(_varint_snippet("v", ind).rstrip())
            src.append(f"{ind}{app}(v)")
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            src.append(_varint_snippet("v", ind).rstrip())
            src.append(f"{ind}{app}(v)")
        elif isinstance(dt, T.DoubleType):
            src.append(f"{ind}{app}(unpack_from('<d', buf, pos)[0]); pos += 8")
        elif isinstance(dt, T.FloatType):
            src.append(f"{ind}{app}(unpack_from('<f', buf, pos)[0]); pos += 4")
        elif isinstance(dt, T.StringType):
            src.append(_varint_snippet("n", ind).rstrip())
            src.append(f"{ind}{app}(str(buf[pos:pos + n], 'utf-8')); pos += n")
        elif isinstance(dt, T.BinaryType):
            src.append(_varint_snippet("n", ind).rstrip())
            src.append(f"{ind}{app}(bytes(buf[pos:pos + n])); pos += n")
        elif isinstance(dt, T.BooleanType):
            src.append(f"{ind}{app}(buf[pos] == 1); pos += 1")
        else:
            raise TypeError(f"avro_py: unsupported Spark type {dt}")
    src.append("    return pos")
    ns: dict = {}
    exec("\n".join(src), ns)  # noqa: S102 — generated from the schema only
    _DEC_CACHE[key] = ns["_dec"]
    return ns["_dec"]


def _skip_header(buf: bytes) -> tuple[int, bytes]:
    """Parse past the container header; return (pos, sync_marker)."""
    assert buf[:4] == MAGIC, "not an Avro container file"
    mv = memoryview(buf)
    pos = 4
    while True:
        n, pos = _dec_long(mv, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = _dec_long(mv, pos)
        for _ in range(n):
            _, pos = _dec_bytes(mv, pos)
            _, pos = _dec_bytes(mv, pos)
    return pos + 16, bytes(mv[pos : pos + 16])


def _decode_blocks(data: bytes, pos: int, sync: bytes,
                   schema: T.StructType) -> list[list]:
    """Run the compiled decoder over [pos, end) — a sequence of
    (count, size, payload, sync) blocks — into per-field value lists."""
    if _varint_only(schema):
        return _decode_blocks_numpy(data, pos, sync, schema)
    dec = _compile_block_decoder(schema)
    cols: list[list] = [[] for _ in schema.fields]
    end = len(data)
    mv = memoryview(data)
    while pos < end:
        count, pos = _dec_long(mv, pos)
        _, pos = _dec_long(mv, pos)  # block byte size
        pos = dec(data, pos, count, cols, struct.unpack_from)
        assert data[pos : pos + 16] == sync, "sync marker mismatch"
        pos += 16
    return cols


# -- vectorized varint fast path (the r8 experiment the r7 profile asked
# for: 92% of decode time was the per-byte varint loop) ---------------------
#
# When EVERY field is a zigzag-varint kind (int/long/timestamp/date) and
# non-nullable, a block's payload is wall-to-wall varints: value
# boundaries are exactly the bytes with the continuation bit clear, so
# one numpy pass finds all boundaries (nonzero on ~0x80), a ≤10-step
# shift-accumulate loop over ARRAYS reconstructs every value, and the
# token matrix reshapes (count, nfields) straight into columns.  Fields
# with embedded raw bytes (strings/doubles/bools) or union branch
# markers make boundary detection structure-dependent — those schemas
# stay on the compiled per-row loop, and the jar remains the declared
# production route.

_VARINT_KINDS = (T.LongType, T.IntegerType, T.TimestampType,
                 T.TimestampNTZType, T.DateType)


def _varint_only(schema: T.StructType) -> bool:
    return all(
        isinstance(f.dataType, _VARINT_KINDS) and not f.nullable
        for f in schema.fields
    )


def _decode_varints_numpy(arr: "np.ndarray") -> "np.ndarray":
    """Decode a byte array that is entirely zigzag varints → int64."""
    import numpy as np

    ends = np.nonzero(arr < 0x80)[0]
    starts = np.empty_like(ends)
    if len(ends):
        starts[0] = 0
        starts[1:] = ends[:-1] + 1
    raw = (arr[starts] & 0x7F).astype(np.uint64)
    maxlen = int((ends - starts).max()) + 1 if len(ends) else 1
    for j in range(1, maxlen):
        sel = starts + j <= ends
        raw[sel] |= (arr[starts[sel] + j] & np.uint8(0x7F)).astype(
            np.uint64
        ) << np.uint64(7 * j)
    half = (raw >> np.uint64(1)).astype(np.int64)
    return half ^ -(raw & np.uint64(1)).astype(np.int64)


def _decode_blocks_numpy(data: bytes, pos: int, sync: bytes,
                         schema: T.StructType) -> list:
    import numpy as np

    nf = len(schema.fields)
    parts: list[list] = [[] for _ in range(nf)]
    end = len(data)
    mv = memoryview(data)
    while pos < end:
        count, pos = _dec_long(mv, pos)
        size, pos = _dec_long(mv, pos)
        arr = np.frombuffer(data, np.uint8, count=size, offset=pos)
        vals = _decode_varints_numpy(arr)
        if len(vals) != count * nf:
            raise ValueError(
                f"varint block decode drift: {len(vals)} tokens for "
                f"{count} rows x {nf} fields"
            )
        mat = vals.reshape(count, nf)
        for i in range(nf):
            parts[i].append(mat[:, i])
        pos += size
        assert data[pos : pos + 16] == sync, "sync marker mismatch"
        pos += 16
    return [
        np.concatenate(p) if p else np.empty(0, np.int64) for p in parts
    ]


def decode_container_columns(data: bytes, schema: T.StructType):
    """Fast columnar parse of one container file → pandas DataFrame."""
    pos, sync = _skip_header(data)
    cols = _decode_blocks(data, pos, sync, schema)
    return _finalize_columns(schema, cols)


def _finalize_columns(schema: T.StructType, cols: list):
    import pandas as pd

    def _has_null(col) -> bool:
        # the numpy fast path only fires on non-nullable schemas
        return isinstance(col, list) and None in col

    out = {}
    for f, col in zip(schema.fields, cols):
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            # Int64 (nullable), never float64: a float µs value above
            # 2^53 would silently lose sub-µs precision
            out[f.name] = pd.to_datetime(
                pd.Series(col, dtype="Int64" if _has_null(col) else "int64"),
                unit="us",
            )
        elif isinstance(f.dataType, T.DateType):
            out[f.name] = pd.to_datetime(
                pd.Series(col, dtype="Int64" if _has_null(col) else "int64"),
                unit="D",
            ).dt.date
        elif isinstance(f.dataType, T.BinaryType):
            out[f.name] = pd.Series(col, dtype="object")
        elif isinstance(
            f.dataType, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
        ):
            # nullable integers must NOT promote to float64 (silent
            # precision loss above 2^53) — use pandas' nullable Int64
            out[f.name] = pd.Series(
                col, dtype="Int64" if _has_null(col) else "int64"
            )
        else:
            # floats/bools/strings: let pandas infer (float64/bool/
            # object) — Arrow conversion handles each natively
            out[f.name] = pd.Series(col)
    return pd.DataFrame(out)


def read_avro(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Distributed Avro read: ``binaryFile`` ships each container file to
    an executor; a ``mapInPandas`` decoder parses it into Arrow batches
    through the compiled columnar fast path."""
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.avro")
    ).select("content")

    def decode(batches):
        for pdf in batches:
            for data in pdf["content"]:
                yield decode_container_columns(bytes(data), schema)

    return files.mapInPandas(decode, schema=schema)


def index_blocks(path: str) -> tuple[list[tuple[int, int]], bytes]:
    """Block (offset, length) index of a container file with HEADER-ONLY
    IO: per block, read its two varints (≤20 bytes) and seek over the
    payload — O(blocks) tiny reads, never the data itself.  This is the
    split-computation a FileFormat's ``isSplitable`` path performs; on
    object storage the same seeks become ranged GETs."""
    blocks: list[tuple[int, int]] = []
    with open(path, "rb") as f:
        # header size is unbounded (schema JSON + metadata map): grow
        # the read until the header parses instead of capping at 64 KiB
        size = 1 << 16
        while True:
            f.seek(0)
            head = f.read(size)
            try:
                data_start, sync = _skip_header(head)
                # truncation can land exactly on the sync marker and
                # parse "successfully" short — treat as incomplete too
                if data_start <= len(head) and len(sync) == 16:
                    break
                raise IndexError("header larger than buffered read")
            except (IndexError, AssertionError):
                if size >= os.path.getsize(path):
                    raise
                size *= 2
        f.seek(0, 2)
        end = f.tell()
        pos = data_start
        while pos < end:
            f.seek(pos)
            chunk = f.read(20)  # two varints, ≤10 bytes each
            mv = memoryview(chunk)
            _, p = _dec_long(mv, 0)
            size, p = _dec_long(mv, p)
            blk_len = p + size + 16  # header + payload + sync marker
            blocks.append((pos, blk_len))
            pos += blk_len
    return blocks, sync


def read_avro_blocks(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    blocks_per_task: int = 4,
) -> DataFrame:
    """BLOCK-parallel Avro read — the r7 step past per-file parallelism:
    one big container no longer decodes serially.  The driver indexes
    each file's blocks (header-only seeks, see ``index_blocks``), packs
    contiguous runs of ``blocks_per_task`` blocks into work units, and
    fans the units out; each task range-reads only its byte span and
    runs the same compiled columnar decoder.  Blocks are independent by
    construction (sync-marker framed, DC-free encoding), so any split
    is valid — exactly how spark-avro's own splittable FileFormat
    parallelizes one container across a cluster."""
    import glob as _glob

    units = []
    for fp in sorted(_glob.glob(os.path.join(path, "*.avro"))):
        blocks, sync = index_blocks(fp)
        for i in range(0, len(blocks), blocks_per_task):
            grp = blocks[i:i + blocks_per_task]
            units.append(
                (fp, grp[0][0], sum(ln for _, ln in grp), bytes(sync))
            )
    if not units:
        return spark.createDataFrame([], schema)
    udf = spark.createDataFrame(
        units, "path string, start long, length long, sync binary"
    ).repartition(min(len(units), 64))

    def decode(batches):
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                with open(r.path, "rb") as f:
                    f.seek(int(r.start))
                    data = f.read(int(r.length))
                cols = _decode_blocks(data, 0, bytes(r.sync), schema)
                yield _finalize_columns(schema, cols)

    return udf.mapInPandas(decode, schema=schema)
