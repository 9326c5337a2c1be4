"""Catalog time travel, snapshot maintenance, WARC ingest (SURVEY §2.1
S11, §2.11 N4).

The lake-layout tier over the CoW MERGE table: per-commit snapshot
manifests, FOR SYSTEM_TIME AS OF reads, RowKind-classified incremental
scans between snapshots, snapshot RETENTION/GC — plus the ISO 28500
WARC/WET crawl ingest.  Split out of queries/sources2.py (same registry
names) to keep modules under the house size bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

@register(
    "src_time_travel",
    oracle="""
    WITH b AS (
      SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events
    ), snaps AS (
      SELECT 0 AS k, (SELECT mn + (mx - mn) // 3 FROM b) AS bound
      UNION ALL
      SELECT 1, (SELECT mn + 2 * ((mx - mn) // 3) FROM b)
      UNION ALL
      SELECT 2, (SELECT mx FROM b)
    ), ranked AS (
      SELECT s.k, e.user_id, e.event_id,
             ROW_NUMBER() OVER (PARTITION BY s.k, e.user_id
                                ORDER BY e.ts DESC, e.event_id DESC) AS rn
      FROM events e JOIN snaps s ON epoch_us(e.ts) <= s.bound
    )
    SELECT CAST(k AS INTEGER) AS as_of_batch, user_id,
           event_id AS last_event_id
    FROM ranked WHERE rn = 1
    """,
    survey="S11 X4 X6",
)
def src_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog TIME TRAVEL (Flink 1.18+ `SELECT ... FOR SYSTEM_TIME AS OF`
    on versioned catalog tables [docs: time-travel]): three commit
    batches of upserts land in the snapshot-retaining MERGE table, then
    each historical snapshot is read back AS OF its commit — every
    snapshot must equal the keep-last state of exactly the rows ingested
    up to that commit.  Snapshots are immutable per-commit manifests over
    the hash-bucketed CoW versions (the Iceberg/Delta snapshot shape);
    reading AS OF k touches only the version dirs commit k referenced."""
    import os
    import shutil
    import uuid

    from ..sources import formats
    from ..streaming import sinks as _sinks

    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    b = e.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    ).first()
    mn, mx = int(b.mn), int(b.mx)
    t1 = mn + (mx - mn) // 3
    t2 = mn + 2 * ((mx - mn) // 3)

    wd = formats.scratch(sf_dir, "time_travel")
    state = os.path.join(wd, f"tbl-{uuid.uuid4().hex[:8]}")
    sink = _sinks.ParquetMergeSink(
        spark, state, pk_cols=["user_id"], order_cols=["ts", "event_id"],
        retain_history=True,
    )
    us = F.unix_micros("ts")
    sink(e.filter(us <= t1), 0)
    sink(e.filter((us > t1) & (us <= t2)), 1)
    sink(e.filter(us > t2), 2)

    parts = [
        sink.snapshot_df(as_of_batch=k)
        .select(
            F.lit(k).alias("as_of_batch"),
            "user_id",
            F.col("event_id").alias("last_event_id"),
        )
        for k in (0, 1, 2)
    ]
    out = parts[0].unionByName(parts[1]).unionByName(parts[2])
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(state, ignore_errors=True)
    return out


@register(
    "src_snapshot_diff",
    oracle="""
    WITH b AS (
      SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events
    ), snaps AS (
      SELECT 0 AS k, (SELECT mn + (mx - mn) // 3 FROM b) AS bound
      UNION ALL
      SELECT 2, (SELECT mx FROM b)
    ), state AS (
      SELECT k, user_id, event_id FROM (
        SELECT s.k, e.user_id, e.event_id, e.event_type,
               ROW_NUMBER() OVER (PARTITION BY s.k, e.user_id
                                  ORDER BY e.ts DESC, e.event_id DESC) AS rn
        FROM events e JOIN snaps s ON epoch_us(e.ts) <= s.bound
      ) WHERE rn = 1 AND event_type <> 'error'
    ), s0 AS (SELECT user_id, event_id FROM state WHERE k = 0),
    s2 AS (SELECT user_id, event_id FROM state WHERE k = 2)
    SELECT CASE WHEN s0.user_id IS NULL THEN '+I'
                WHEN s2.user_id IS NULL THEN '-D'
                ELSE '+U' END AS _rowkind,
           COALESCE(s2.user_id, s0.user_id) AS user_id,
           COALESCE(s2.event_id, s0.event_id) AS last_event_id
    FROM s2 FULL OUTER JOIN s0 ON s2.user_id = s0.user_id
    WHERE s0.user_id IS NULL OR s2.user_id IS NULL
       OR s0.event_id <> s2.event_id
    """,
    survey="S11 X6 X4",
)
def src_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental scan between table snapshots (Iceberg incremental
    read / Flink versioned-table changelog consumption): three CDC
    commit batches land in the snapshot-retaining MERGE table (``error``
    events are ``-D`` deletes, everything else upserts), then the
    RowKind-classified DIFF between commit 0 and commit 2 is read —
    ``+I`` for keys born after the first commit, ``+U`` for keys whose
    row changed, ``-D`` for keys deleted since, silence for untouched
    keys.  One full-outer join on pk with a null-safe payload compare
    (streaming/sinks.snapshot_changes); the oracle replays both
    snapshot states relationally and diffs them the same way."""
    import os
    import shutil
    import uuid

    from ..sources import formats
    from ..streaming import sinks as _sinks

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id",
        F.when(F.col("event_type") == "error", "-D")
        .otherwise("+U")
        .alias("op"),
    )
    b = e.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    ).first()
    mn, mx = int(b.mn), int(b.mx)
    t1 = mn + (mx - mn) // 3
    t2 = mn + 2 * ((mx - mn) // 3)

    wd = formats.scratch(sf_dir, "snapshot_diff")
    state = os.path.join(wd, f"tbl-{uuid.uuid4().hex[:8]}")
    sink = _sinks.ParquetMergeSink(
        spark, state, pk_cols=["user_id"], op_col="op",
        order_cols=["ts", "event_id"], retain_history=True,
    )
    us = F.unix_micros("ts")
    sink(e.filter(us <= t1), 0)
    sink(e.filter((us > t1) & (us <= t2)), 1)
    sink(e.filter(us > t2), 2)

    out = (
        _sinks.snapshot_changes(sink, 0, 2)
        .select("_rowkind", "user_id", F.col("event_id").alias("last_event_id"))
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(state, ignore_errors=True)
    return out


@register(
    "src_snapshot_expire",
    oracle="""
    WITH b AS (
      SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events
    ), snaps AS (
      SELECT 1 AS k,
             (SELECT mn + 2 * ((mx - mn) // 3) FROM b) AS bound
      UNION ALL SELECT 2, (SELECT mx FROM b)
    ), ranked AS (
      SELECT s.k, e.user_id, e.event_id,
             ROW_NUMBER() OVER (PARTITION BY s.k, e.user_id
                                ORDER BY e.ts DESC, e.event_id DESC) AS rn
      FROM events e JOIN snaps s ON epoch_us(e.ts) <= s.bound
    )
    SELECT CAST(k AS INTEGER) AS as_of_batch, user_id,
           event_id AS last_event_id,
           CAST(1 AS BIGINT) AS n_expired_snapshots
    FROM ranked WHERE rn = 1
    """,
    survey="S11 X4",
)
def src_snapshot_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot RETENTION for the time-travel catalog (the other half of
    `FOR SYSTEM_TIME AS OF`: Iceberg expireSnapshots / Delta VACUUM):
    three commits land in the history-retaining MERGE table, then
    snapshots older than commit 1 are expired — their manifests drop
    and version directories no surviving snapshot references are
    garbage-collected.  The oracle certifies the surviving history:
    AS OF 1 and AS OF 2 must still equal the keep-last state of the
    rows ingested up to each commit, with the expired count surfaced
    (and hash-checked) as a column; the fail-on-expired-read and
    version-GC behaviors are pinned in tests/test_r7_ops.py.  At 100 TB
    this is the maintenance job that bounds table history — metadata-
    only driver work, no data files rewritten."""
    import os
    import shutil
    import uuid

    from ..sources import formats
    from ..streaming import sinks as _sinks

    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    b = e.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    ).first()
    mn, mx = int(b.mn), int(b.mx)
    t1 = mn + (mx - mn) // 3
    t2 = mn + 2 * ((mx - mn) // 3)

    wd = formats.scratch(sf_dir, "snapshot_expire")
    state = os.path.join(wd, f"tbl-{uuid.uuid4().hex[:8]}")
    sink = _sinks.ParquetMergeSink(
        spark, state, pk_cols=["user_id"], order_cols=["ts", "event_id"],
        retain_history=True,
    )
    us = F.unix_micros("ts")
    sink(e.filter(us <= t1), 0)
    sink(e.filter((us > t1) & (us <= t2)), 1)
    sink(e.filter(us > t2), 2)
    n_expired, _ = _sinks.expire_snapshots(sink, older_than_batch=1)

    parts = [
        sink.snapshot_df(as_of_batch=k)
        .select(
            F.lit(k).alias("as_of_batch"),
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.lit(n_expired).cast("long").alias("n_expired_snapshots"),
        )
        for k in (1, 2)
    ]
    out = parts[0].unionByName(parts[1]).localCheckpoint(eager=True)
    shutil.rmtree(state, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# WARC/WET ingest — the Common Crawl format (S1 x N4: crawl -> corpus)
# --------------------------------------------------------------------------
@register(
    "src_warc_wet_scan",
    oracle="""
    SELECT doc_id,
           'http://corpus.local/doc/' || doc_id AS target_uri,
           'conversion' AS warc_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
           md5(text) AS payload_md5
    FROM documents WHERE doc_id < 200
    """,
    survey="S1 N4",
)
def src_warc_wet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC/WET roundtrip (sources/warc.py) — the ingest format a
    100 TB training-data pipeline actually starts from (Common Crawl
    WET: one ``warcinfo`` record then one ``conversion`` record per
    page, ISO 28500 framing).  documents rows are sharded into 8 .warc
    files by one applyInPandas pass (strict CRLF framing,
    Content-Length payloads, UTF-8 text), then read back DISTRIBUTED
    through the binaryFile source + a mapInPandas parse — version-line
    and terminator validation on the hot path, one output row per
    conversion record with the payload md5 computed from the raw
    bytes.  The oracle recomputes uri/length/md5 straight from
    `documents` — any framing, header, length or encoding bug breaks
    the hash.  At 100 TB: .warc.gz is per-record gzip members, so the
    same parse fans out per member; files here shard by hash for the
    same per-task parallelism shape."""
    import hashlib
    import os as _os

    import pandas as pd

    from ..sources import formats, warc

    out_dir = formats.scratch(sf_dir, "warc")

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text", (F.col("doc_id") % 8).alias("fid"))
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        fid = int(pdf["fid"].iloc[0])
        pdf = pdf.sort_values("doc_id")
        records = [
            {
                "warc_type": "conversion",
                "record_id": f"<urn:uuid:{int(r.doc_id):032d}>",
                "warc_date": "2024-01-01T00:00:00Z",
                "target_uri": f"http://corpus.local/doc/{int(r.doc_id)}",
                "content_type": "text/plain",
                "payload": str(r.text),
            }
            for r in pdf.itertuples(index=False)
        ]
        data = warc.write_warc(records)
        path = _os.path.join(out_dir, f"shard-{fid:04d}.warc")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        _os.replace(tmp, path)  # atomic publish, rerun-idempotent
        return pd.DataFrame({"fid": [fid], "n": [len(records)]})

    shards = docs.groupBy("fid").applyInPandas(
        write_shard, "fid int, n long"
    )
    shards.collect()  # materialize the write stage before the read

    raw = spark.read.format("binaryFile").load(
        _os.path.join(out_dir, "shard-*.warc")
    )

    def parse(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                for r in warc.parse_warc(bytes(rec.content)):
                    if r["warc_type"] != "conversion":
                        continue
                    uri = r["target_uri"] or ""
                    rows.append(
                        (
                            int(uri.rsplit("/", 1)[1]),
                            uri,
                            r["warc_type"],
                            r["content_length"],
                            hashlib.md5(r["payload"]).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "target_uri", "warc_type",
                    "content_length", "payload_md5",
                ],
            )

    return raw.select("content").mapInPandas(
        parse,
        "doc_id long, target_uri string, warc_type string, "
        "content_length long, payload_md5 string",
    )
