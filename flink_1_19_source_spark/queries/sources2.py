"""Session-catalog surface (SURVEY §2.1 S11, §2.2 S12).

Flink's HiveCatalog gives SQL DDL a durable namespace: CREATE
DATABASE/TABLE, SHOW/DESCRIBE introspection, INSERT INTO, and
queries resolved through the catalog. Spark ships the same SQL surface
on its built-in session catalog (in-memory metastore + spark-warehouse
storage) — that covers every catalog *operation* the reference's SQL
tests exercise, certified here. The persistence half (metadata
surviving across sessions/engines) is covered by the Derby-backed Hive
metastore in sources/metastore.py, proven across two separate JVMs in
tests/test_metastore.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


@register(
    "src_catalog_surface",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    survey="S11 S12",
)
def src_catalog_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog DDL round-trip (S11): CREATE DATABASE → CTAS a managed
    parquet table into the warehouse → SHOW TABLES / DESCRIBE must
    list it → INSERT INTO appends → final query resolves the table
    through the catalog (database-qualified name, full Catalyst
    lifecycle). Flink: the same statements against HiveCatalog."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    region.createOrReplaceTempView("cat_region_src")
    nation.createOrReplaceTempView("cat_nation_src")

    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cat")
    spark.sql("DROP TABLE IF EXISTS graft_cat.region_t")
    # the in-memory catalog forgets managed tables across sessions while
    # their warehouse directories persist — exactly the S11 metastore
    # persistence gap; clear any orphaned location so CTAS can recreate
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        shutil.rmtree(
            wh.removeprefix("file:") + "/graft_cat.db/region_t",
            ignore_errors=True,
        )
    # CTAS with a predicate, then INSERT the rest — exercises both the
    # create-from-query and append write paths through the catalog
    spark.sql(
        "CREATE TABLE graft_cat.region_t USING PARQUET AS "
        "SELECT * FROM cat_region_src WHERE r_regionkey < 3"
    )
    spark.sql(
        "INSERT INTO graft_cat.region_t "
        "SELECT * FROM cat_region_src WHERE r_regionkey >= 3"
    )

    tables = {r.tableName for r in spark.sql("SHOW TABLES IN graft_cat").collect()}
    if "region_t" not in tables:
        raise AssertionError("catalog does not list region_t")
    described = {r.col_name for r in spark.sql("DESCRIBE TABLE graft_cat.region_t").collect()}
    if not {"r_regionkey", "r_name"} <= described:
        raise AssertionError(f"DESCRIBE missing columns: {described}")

    return spark.sql(
        """
        SELECT r.r_name, COUNT(*) AS n_nations
        FROM graft_cat.region_t r
        JOIN cat_nation_src n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )


@register(
    "src_compacted_write",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents WHERE lang IN ('en', 'fr')
    """,
    survey="S1 S2",
)
def src_compacted_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compacted partitioned sink (S1/S2): repartition-on-key before a
    partitionBy write, so each lang directory holds one file instead of
    tasks×partitions slivers (the 100 TB small-file failure mode), then
    a partition-pruned read-back of two languages. The file-count bound
    is asserted, not assumed."""
    import glob
    import os as _os

    from ..sources import formats

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = _os.path.join(formats.scratch(sf_dir, "compact_docs"), "documents")
    formats.compacted_partitioned_write(d, path, ["lang"])

    for part_dir in glob.glob(_os.path.join(path, "lang=*")):
        files = [f for f in _os.listdir(part_dir) if f.endswith(".parquet")]
        if len(files) > 2:
            raise AssertionError(
                f"compaction failed: {part_dir} has {len(files)} files"
            )

    return (
        spark.read.parquet(path)
        .filter(F.col("lang").isin("en", "fr"))
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "s_datagen_rate_stream",
    oracle="""
    WITH gen AS (
      SELECT v,
             TIMESTAMP '2023-11-14 22:13:20'
               + (v // 100) * INTERVAL 1 MINUTE AS ts
      FROM range(300) t(v)
    )
    SELECT time_bucket(INTERVAL '1 minute', ts) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v) AS BIGINT) AS sum_v
    FROM gen GROUP BY 1
    """,
    survey="S9 W1-S",
)
def s_datagen_rate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming datagen (S9's streaming half): Flink's rate-limited
    datagen source maps to Spark's ``rate-micro-batch`` format, which is
    FULLY deterministic — batch k carries values [k·R, (k+1)·R) at
    timestamp start + k·advance, independent of wall clock. Three
    sequential availableNow drains over one checkpoint advance exactly
    three batches into a parquet sink; the windowed aggregate over the
    generated event times then oracles against a generate_series
    reconstruction. (Wall-clock pacing at deploy = the plain ``rate``
    format — same schema, same query body.)"""
    import os
    import shutil
    import uuid

    from ..streaming import replay

    wd = os.path.join(
        "/tmp/sgraft_streams", os.path.basename(sf_dir.rstrip("/")), "s_rate"
    )
    os.makedirs(wd, exist_ok=True)
    run = uuid.uuid4().hex[:8]
    out_dir = os.path.join(wd, f"out-{run}")
    ckpt = os.path.join(wd, f"ckpt-{run}")

    def one_batch_drain() -> None:
        sdf = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", 100)
            .option("numPartitions", 2)
            .option("startTimestamp", 1700000000000)
            .option("advanceMillisPerBatch", 60000)
            .load()
        )
        replay.run_foreach_batch(
            sdf,
            lambda df, bid: df.write.mode("append").parquet(out_dir),
            checkpoint_dir=ckpt,
        )

    for _ in range(3):
        one_batch_drain()

    got = spark.read.parquet(out_dir)
    result = (
        got.groupBy(F.window("timestamp", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_v"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_v")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return result


# --------------------------------------------------------------------------
# S1/S2 — data-lake write semantics: schema evolution, partition overwrite
# --------------------------------------------------------------------------
@register(
    "src_schema_evolution",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey > 300 THEN o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey <= 600
    """,
    survey="S1 S2",
)
def src_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution (S2): an old writer produced 2-column
    files, a new writer adds `o_totalprice`; `mergeSchema` unions the
    footers and back-fills NULL for pre-evolution rows — the append-only
    data-lake upgrade path, no rewrite of old files. At 100 TB schema
    merge happens on footers only (per-file metadata), never data."""
    import os

    from ..sources import formats

    d = load_table(spark, sf_dir, "orders")
    base = os.path.join(formats.scratch(sf_dir, "schema_evo"), "orders")
    v1, v2 = os.path.join(base, "v1"), os.path.join(base, "v2")
    d.filter(F.col("o_orderkey") <= 300).select(
        "o_orderkey", "o_orderstatus"
    ).write.mode("overwrite").parquet(v1)
    d.filter((F.col("o_orderkey") > 300) & (F.col("o_orderkey") <= 600)).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).write.mode("overwrite").parquet(v2)
    return spark.read.option("mergeSchema", "true").parquet(v1, v2)


@register(
    "src_dynamic_partition_overwrite",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderstatus = 'F'
                THEN CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2))
                                * CAST(0.9 AS DECIMAL(2,1)), 2) AS DOUBLE)
                ELSE o_totalprice
           END AS o_totalprice
    FROM orders WHERE o_orderkey <= 400
    """,
    survey="S1 S2",
)
def src_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (S1): INSERT OVERWRITE must replace
    ONLY the partitions present in the incoming data — a backfill of one
    day/status must not clobber the rest of the table (static overwrite
    truncates everything). Here: full load, then a corrected re-load of
    just the 'F' partition; the other partitions must survive byte-for-
    byte."""
    import os

    from ..sources import formats

    d = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    d = d.select("o_orderkey", "o_orderstatus", "o_totalprice")
    path = os.path.join(formats.scratch(sf_dir, "dyn_overwrite"), "orders")
    d.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    # decimal-exact discount: double*0.9 lands on .xx5 boundaries whose
    # float repr differs between engines' ROUND — decimal(18,2)×(2,1) is
    # exact, rounds HALF_UP identically, then one cast back to double
    fixed = d.filter(F.col("o_orderstatus") == "F").withColumn(
        "o_totalprice",
        F.round(
            F.col("o_totalprice").cast("decimal(18,2)")
            * F.lit("0.9").cast("decimal(2,1)"),
            2,
        ).cast("double"),
    )
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fixed.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    out = spark.read.parquet(path).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # partition column comes back as the directory value (string); restore
    # the source dtype for the oracle compare
    return out.withColumn("o_orderstatus", F.col("o_orderstatus").cast("string"))


def _stmt_set_oracle() -> str:
    from ..functions.exact import sql_dsum

    return f"""
    WITH src AS (
      SELECT l_orderkey, l_returnflag, l_quantity, l_extendedprice
      FROM lineitem WHERE l_orderkey <= 2000
    )
    SELECT 'by_flag' AS sink, l_returnflag AS k,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('l_extendedprice')} AS s
    FROM src GROUP BY l_returnflag
    UNION ALL
    SELECT 'big_items' AS sink, CAST(l_orderkey AS VARCHAR) AS k,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('l_extendedprice')} AS s
    FROM src WHERE l_quantity >= 45
    GROUP BY l_orderkey
    """


@register("sql_statement_set", oracle=_stmt_set_oracle(), survey="S12 S1")
def sql_statement_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE STATEMENT SET (plans/statement_set.py): two INSERTs fanned
    out from ONE shared scan, executed as a single logical job — the
    shared frame is persisted so the second sink reads the materialized
    scan, not the parquet again (Flink's shared-source-vertex property;
    the InMemoryTableScan shape is pinned in tests/test_plans.py). The
    query re-reads both sinks tagged and unioned, so the driver hash
    certifies the CONTENT both statements wrote."""
    import os

    from ..functions.exact import dsum
    from ..plans.statement_set import StatementSet
    from ..sources import formats

    src = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 2000)
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
    )
    by_flag = src.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("l_extendedprice")).alias("s")
    )
    big_items = (
        src.filter(F.col("l_quantity") >= 45)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_extendedprice")).alias("s"),
        )
    )
    base = formats.scratch(sf_dir, "stmt_set")
    p1, p2 = os.path.join(base, "by_flag"), os.path.join(base, "big_items")
    StatementSet(shared=src).add_insert(p1, by_flag).add_insert(p2, big_items).execute()

    r1 = spark.read.parquet(p1).select(
        F.lit("by_flag").alias("sink"),
        F.col("l_returnflag").alias("k"),
        F.col("n"),
        F.col("s"),
    )
    r2 = spark.read.parquet(p2).select(
        F.lit("big_items").alias("sink"),
        F.col("l_orderkey").cast("string").alias("k"),
        F.col("n"),
        F.col("s"),
    )
    return r1.unionByName(r2)


@register(
    "src_sorted_write",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_orderkey <= 3000
    """,
    survey="S1 S2 T1",
)
def src_sorted_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Globally-sorted range-partitioned sink (Flink batch ORDER BY
    output): range exchange + in-task sort → files with pairwise-disjoint
    key ranges. The disjointness is ASSERTED from the parquet footers
    (pyarrow column statistics), not assumed — that property is what
    turns the file listing into a coarse index at 100 TB."""
    import os

    import pyarrow.parquet as pq

    from ..sources import formats

    d = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 3000)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )
    path = os.path.join(formats.scratch(sf_dir, "sorted_write"), "lineitem")
    formats.sorted_range_write(d, path, "l_orderkey", 8)

    ranges = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, f)).metadata
        if meta.num_rows == 0:
            continue
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(0).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        if hi1 >= lo2:
            raise AssertionError(f"overlapping file ranges: {ranges}")

    return spark.read.parquet(path)


@register(
    "src_cdc_debezium",
    oracle="""
    WITH oped AS (
      SELECT user_id, event_id, value, CAST(epoch_ms(ts) AS BIGINT) AS ms,
             CASE WHEN event_type = 'signup' THEN 'c'
                  WHEN event_type = 'error' THEN 'd'
                  ELSE 'u' END AS op
      FROM events
    ), latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ms DESC, event_id DESC) AS rn
      FROM oped
    )
    SELECT user_id, event_id, ROUND(value, 6) AS value
    FROM latest WHERE rn = 1 AND op <> 'd'
    """,
    survey="X6 S4",
)
def src_cdc_debezium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """debezium-json CDC FORMAT (Flink flink-formats/flink-json debezium
    decoder): events are first rendered as real Debezium envelopes —
    ``{"before":..., "after":..., "op":"c|u|d", "ts_ms":...}`` strings —
    then the operator under test parses the envelopes with a typed
    from_json schema, derives the row image (after for c/u, before for
    d), and applies the changelog (latest op per key wins, deletes drop
    the key). The oracle computes the same final table relationally, so
    a wrong parse (missed nulls, wrong image choice, dropped precision in
    the JSON round-trip) diverges the hash. All expressions are
    codegen'd JSON built-ins — no UDFs, map-only until the keyed fold."""
    e = load_table(spark, sf_dir, "events")
    row = F.struct(
        F.col("user_id"), F.col("event_id"), F.col("value")
    )
    op = (
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u")
    )
    envelopes = e.select(
        F.to_json(
            F.struct(
                F.when(op != "c", row).alias("before"),
                F.when(op != "d", row).alias("after"),
                op.alias("op"),
                F.unix_millis("ts").alias("ts_ms"),
            )
        ).alias("env")
    )

    schema = (
        "before struct<user_id: bigint, event_id: bigint, value: double>,"
        " after struct<user_id: bigint, event_id: bigint, value: double>,"
        " op string, ts_ms bigint"
    )
    parsed = envelopes.select(F.from_json("env", schema).alias("m")).select(
        F.coalesce(F.col("m.after.user_id"), F.col("m.before.user_id")).alias(
            "user_id"
        ),
        F.coalesce(F.col("m.after.event_id"), F.col("m.before.event_id")).alias(
            "event_id"
        ),
        F.col("m.after.value").alias("value"),
        F.col("m.op").alias("op"),
        F.col("m.ts_ms").alias("ms"),
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(
            F.col("ms").desc(), F.col("event_id").desc()
        )
    )
    return (
        parsed.withColumn("rn", rn)
        .filter((F.col("rn") == 1) & (F.col("op") != "d"))
        .select("user_id", "event_id", F.round("value", 6).alias("value"))
    )


@register(
    "s_rolling_file_sink",
    oracle="""
    SELECT event_id, user_id, event_type, ROUND(value, 6) AS value
    FROM events
    """,
    survey="S1 S2 X4",
    tags=("streaming",),
)
def s_rolling_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming FileSink with rolling policy + compaction (Flink
    flink-connector-files: rolling policies cut part files at a size
    bound; the 1.15+ sink compacts the resulting smalls before commit).
    Micro-batch analog: each batch rolls into ceil(rows/roll_rows) part
    files under an idempotent epoch dir (crash-replay rewrites, never
    double-appends); after the drain a compaction pass rewrites the
    accumulated smalls into row-bounded big files. Both halves are
    ASSERTED on the filesystem: the staging layout really rolled (> the
    compacted count), the compacted layout really bounds file count.
    This is the small-file lifecycle that decides 100 TB scan cost."""
    import math
    import os
    import shutil
    import uuid

    from ..streaming import replay
    from .streaming_queries import _stream_shuffle_partitions

    wd = os.path.join(
        "/tmp/sgraft_streams", os.path.basename(sf_dir.rstrip("/")), "s_rollsink"
    )
    os.makedirs(wd, exist_ok=True)
    run = uuid.uuid4().hex[:8]
    staging = os.path.join(wd, f"staging-{run}")
    final = os.path.join(wd, f"final-{run}")
    ckpt = os.path.join(wd, f"ckpt-{run}")
    roll_rows, big_rows = 500, 5000

    sdf = replay.replay_table(
        spark, sf_dir, "events", os.path.join(wd, "src"), chunks=4
    )

    def roll(batch: DataFrame, bid: int) -> None:
        batch.persist()
        try:
            n = batch.count()
            if n == 0:
                return
            parts = max(1, math.ceil(n / roll_rows))
            batch.select("event_id", "user_id", "event_type", "value").repartition(
                parts
            ).write.mode("overwrite").parquet(
                os.path.join(staging, f"epoch={bid:05d}")
            )
        finally:
            batch.unpersist()

    with _stream_shuffle_partitions(spark):
        replay.run_foreach_batch(sdf, roll, checkpoint_dir=ckpt)

    def parquet_files(root: str) -> list[str]:
        out = []
        for dirpath, _, files in os.walk(root):
            out += [os.path.join(dirpath, f) for f in files if f.endswith(".parquet")]
        return out

    staged = spark.read.parquet(staging)
    total = staged.count()
    n_staged_files = len(parquet_files(staging))
    # compaction pass: bounded big files, content-preserving
    staged.repartition(max(1, math.ceil(total / big_rows))).write.mode(
        "overwrite"
    ).parquet(final)
    n_final_files = len(parquet_files(final))
    if not (n_final_files < n_staged_files):
        raise AssertionError(
            f"compaction did not reduce files: {n_staged_files} -> {n_final_files}"
        )
    if n_final_files > math.ceil(total / big_rows):
        raise AssertionError(f"compacted layout unbounded: {n_final_files}")

    out = (
        spark.read.parquet(final)
        .select(
            "event_id", "user_id", "event_type", F.round("value", 6).alias("value")
        )
        .localCheckpoint(eager=True)
    )
    for p in (staging, final, ckpt):
        shutil.rmtree(p, ignore_errors=True)
    return out


@register(
    "src_metadata_columns",
    oracle="""
    SELECT 'events.parquet' AS fname, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids
    FROM events
    """,
    survey="S12 S1",
)
def src_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connector METADATA columns (Flink DDL `col TYPE METADATA [FROM
    'key']` — e.g. the filesystem connector's `file.path`/`file.size`):
    Spark's hidden ``_metadata`` struct on file sources is the same
    surface. The query groups rows by source file (basename), proving
    the metadata column resolves per-row and joins normal columns; the
    size/mtime fields are asserted present and positive (their values
    are environment-specific, so they stay out of the hashed
    projection)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias("fname"),
        F.col("_metadata.file_size").alias("fsize"),
        "event_id",
    )
    bad = e.filter(F.col("fsize") <= 0).count()
    if bad:
        raise AssertionError("metadata file_size not populated")
    return e.groupBy("fname").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_id").alias("n_ids"),
    )


@register(
    "j7b_lookup_partial_cache",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey <= 5000
    """,
    survey="J7 S8 R7",
)
def j7b_lookup_partial_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTIAL-cache lookup join (Flink 'lookup.cache' = PARTIAL — the
    default JDBC lookup runtime; j7_lookup_broadcast is the FULL cache):
    each task point-fetches only the dimension keys it actually probes,
    once, through a process-local cache (sources/lookup_cache.py). The
    probe side never shuffles; fetch volume ∝ distinct keys per task.
    Cache effectiveness is accumulator-ASSERTED: fetched keys must be
    strictly fewer than probed rows (orders repeat customers)."""
    from pyspark.sql.types import StringType, StructField

    from ..sources.lookup_cache import lookup_join_partial_cache
    from ..tables import table_path

    probe = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 5000)
        .select("o_orderkey", "o_custkey")
    )
    sc = spark.sparkContext
    fetched, probed = sc.accumulator(0), sc.accumulator(0)
    from pyspark.sql.types import StructType

    # fresh StructType: .add() on probe.schema would MUTATE the frame's
    # cached schema and corrupt probe.columns
    out_schema = StructType(
        list(probe.schema.fields)
        + [StructField("c_name", StringType()), StructField("c_mktsegment", StringType())]
    )
    enriched = lookup_join_partial_cache(
        probe,
        "o_custkey",
        table_path(sf_dir, "customer"),
        "c_custkey",
        ["c_name", "c_mktsegment"],
        out_schema,
        fetched,
        probed,
    ).localCheckpoint(eager=True)
    if not (0 < fetched.value < probed.value):
        raise AssertionError(
            f"partial cache ineffective: fetched={fetched.value} probed={probed.value}"
        )
    return enriched


@register(
    "s_lookup_enrich_stream",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    survey="J7 R7 R3",
    tags=("streaming",),
)
def s_lookup_enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming lookup enrichment (Flink's lookup join on a stream,
    PARTIAL cache): the event stream is enriched per micro-batch through
    the same per-task point-fetch cache as j7b — stateless, append-mode,
    no watermark required, cache persists across batches inside each
    task's Python worker. Misses (users with no customer row) pass
    through null-padded, exercising the negative-cache path."""
    from pyspark.sql.types import StringType, StructField, StructType

    from ..sources.lookup_cache import lookup_join_partial_cache
    from ..tables import table_path
    from .streaming_queries import _drain_to_memory, _events_stream

    sdf, wd = _events_stream(spark, sf_dir, "s_lookup")
    probe = sdf.select("event_id", "user_id")
    sc = spark.sparkContext
    fetched, probed = sc.accumulator(0), sc.accumulator(0)
    out_schema = StructType(
        list(probe.schema.fields)
        + [StructField("c_name", StringType()), StructField("c_mktsegment", StringType())]
    )
    enriched = lookup_join_partial_cache(
        probe,
        "user_id",
        table_path(sf_dir, "customer"),
        "c_custkey",
        ["c_name", "c_mktsegment"],
        out_schema,
        fetched,
        probed,
    )
    out = _drain_to_memory(spark, enriched, "s_lookup_q", "append", wd)
    if not (0 < fetched.value < probed.value):
        raise AssertionError(
            f"partial cache ineffective: fetched={fetched.value} probed={probed.value}"
        )
    return out


@register(
    "src_cdc_canal",
    oracle="""
    WITH oped AS (
      SELECT user_id, event_id, value, CAST(epoch_ms(ts) AS BIGINT) AS ms,
             CASE WHEN event_type = 'signup' THEN 'INSERT'
                  WHEN event_type = 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS typ
      FROM events
    ), latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ms DESC, event_id DESC) AS rn
      FROM oped
    )
    SELECT user_id, event_id, ROUND(value, 6) AS value
    FROM latest WHERE rn = 1 AND typ <> 'DELETE'
    """,
    survey="X6 S4",
)
def src_cdc_canal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canal-json CDC FORMAT (Flink flink-formats/flink-json canal
    decoder): the Canal envelope batches row images in a ``data`` ARRAY
    with a statement-level ``type`` — ``{"data":[{...}],"type":
    "INSERT|UPDATE|DELETE","ts":...}``. The operator renders real
    envelopes, then parses them with a typed schema, EXPLODES the data
    array (one envelope can carry many rows), maps type→RowKind and
    applies the changelog. Same final-state oracle discipline as the
    debezium twin (src_cdc_debezium): a wrong parse diverges the hash."""
    e = load_table(spark, sf_dir, "events")
    typ = (
        F.when(F.col("event_type") == "signup", "INSERT")
        .when(F.col("event_type") == "error", "DELETE")
        .otherwise("UPDATE")
    )
    env = e.select(
        F.to_json(
            F.struct(
                F.array(
                    F.struct(F.col("user_id"), F.col("event_id"), F.col("value"))
                ).alias("data"),
                typ.alias("type"),
                F.unix_millis("ts").alias("ts"),
            )
        ).alias("env")
    )
    schema = (
        "data array<struct<user_id: bigint, event_id: bigint, value: double>>,"
        " type string, ts bigint"
    )
    rows = (
        env.select(F.from_json("env", schema).alias("m"))
        .select(
            F.explode("m.data").alias("r"),
            F.col("m.type").alias("typ"),
            F.col("m.ts").alias("ms"),
        )
        .select("r.user_id", "r.event_id", "r.value", "typ", "ms")
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(
            F.col("ms").desc(), F.col("event_id").desc()
        )
    )
    return (
        rows.withColumn("rn", rn)
        .filter((F.col("rn") == 1) & (F.col("typ") != "DELETE"))
        .select("user_id", "event_id", F.round("value", 6).alias("value"))
    )


@register(
    "src_dynamic_partition_pruning",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type FROM events WHERE event_type LIKE 's%'
    )
    SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
    survey="S1 S2 J9",
)
def src_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (§4 optimizer row; Flink 1.19's batch
    DPP via SupportsPartitionPushDown + the runtime filter): the fact is
    laid out partitioned by event_type; the dim side's filter is only
    known at runtime, so the fact scan must receive a DYNAMIC pruning
    subquery — asserted in the plan text — and read only the matching
    partition directories. The join result is the oracle."""
    import os

    from ..plans import audit
    from ..sources import formats

    e = load_table(spark, sf_dir, "events")
    path = os.path.join(formats.scratch(sf_dir, "dpp"), "events_by_type")
    if not os.path.isdir(path) or not os.listdir(path):
        formats.compacted_partitioned_write(
            e.select("event_id", "user_id", "value", "event_type"),
            path,
            ["event_type"],
        )
    fact = spark.read.parquet(path)
    dim = (
        e.select("event_type")
        .distinct()
        .filter(F.col("event_type").startswith("s"))
    )
    joined = (
        fact.join(dim.hint("broadcast"), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    plan = audit.plan_text(joined)
    if "dynamicpruning" not in plan.lower():
        raise AssertionError(f"no dynamic pruning subquery in plan:\n{plan}")
    return joined


@register(
    "src_csv_malformed",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey <= 600 AND o_orderkey % 7 <> 0
    """,
    survey="S3 S1",
)
def src_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record handling in the CSV format (Flink
    ``csv.ignore-parse-errors`` = skip bad rows): rows with
    o_orderkey % 7 == 0 are corrupted on write (the numeric price column
    gets a non-numeric token), the read uses DROPMALFORMED, and exactly
    the corrupted rows must vanish — the oracle is the well-formed
    subset. PERMISSIVE + _corrupt_record (Spark's default) is the
    capture-don't-drop alternative; both are schema-on-read behaviors
    the 100 TB ingest layer depends on."""
    import os

    from ..sources import formats

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 600)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    corrupted = o.select(
        F.col("o_orderkey").cast("string"),
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("NOT_A_NUMBER"))
        .otherwise(F.col("o_totalprice").cast("string"))
        .alias("o_totalprice"),
    )
    path = os.path.join(formats.scratch(sf_dir, "csv_malformed"), "orders_csv")
    corrupted.write.mode("overwrite").option("header", "true").csv(path)
    good = (
        spark.read.option("header", "true")
        .option("mode", "DROPMALFORMED")
        .schema("o_orderkey bigint, o_orderstatus string, o_totalprice double")
        .csv(path)
    )
    return good


@register(
    "src_agg_pushdown",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o_orderkey) AS mn_key, MAX(o_orderkey) AS mx_key,
           MIN(o_totalprice) AS mn_price, MAX(o_totalprice) AS mx_price
    FROM orders
    """,
    survey="S2 A1",
)
def src_agg_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate pushdown into the parquet scan (§4: Flink's
    SupportsAggregatePushDown ability interface): COUNT/MIN/MAX answered
    from row-group STATISTICS — zero data pages read — when the V2
    source path is active. The plan must show ``PushedAggregation``
    (asserted); at 100 TB this is the difference between a footer read
    and a full table scan for dashboard-style min/max/count probes."""
    from ..plans import audit
    from ..tables import table_path

    old_v1 = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    old_agg = spark.conf.get("spark.sql.parquet.aggregatePushdown", "false")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        df = spark.read.parquet(table_path(sf_dir, "orders"))
        agg = df.selectExpr(
            "count(*) as n",
            "min(o_orderkey) as mn_key",
            "max(o_orderkey) as mx_key",
            "min(o_totalprice) as mn_price",
            "max(o_totalprice) as mx_price",
        )
        plan = audit.plan_text(agg)
        if "PushedAggregation: [COUNT(*)" not in plan:
            raise AssertionError(f"aggregate not pushed into scan:\n{plan}")
        return agg.localCheckpoint(eager=True)
    finally:
        # restore: several write paths (dynamic partition overwrite) are
        # v1-only, and other queries assume the session default
        if old_v1 is None:
            spark.conf.unset("spark.sql.sources.useV1SourceList")
        else:
            spark.conf.set("spark.sql.sources.useV1SourceList", old_v1)
        spark.conf.set("spark.sql.parquet.aggregatePushdown", old_agg)


@register(
    "src_cdc_maxwell",
    oracle="""
    WITH oped AS (
      SELECT user_id, event_id, value, CAST(epoch_ms(ts) AS BIGINT) AS ms,
             CASE WHEN event_type = 'signup' THEN 'insert'
                  WHEN event_type = 'error' THEN 'delete'
                  ELSE 'update' END AS typ
      FROM events
    ), latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ms DESC, event_id DESC) AS rn
      FROM oped
    )
    SELECT user_id, event_id, ROUND(value, 6) AS value
    FROM latest WHERE rn = 1 AND typ <> 'delete'
    """,
    survey="X6 S4",
)
def src_cdc_maxwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maxwell-json CDC FORMAT (Flink flink-formats/flink-json maxwell
    decoder): Maxwell's Daemon emits one row image per envelope —
    ``{"database":..,"table":..,"type":"insert|update|delete","ts":..,
    "data":{...}}`` (lower-case statement types, ``data`` an OBJECT, not
    Canal's array). Render real envelopes, parse with a typed schema,
    map type→RowKind, apply the changelog; final state hash-matches the
    relational replay, same discipline as the debezium/canal twins."""
    e = load_table(spark, sf_dir, "events")
    typ = (
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("update")
    )
    env = e.select(
        F.to_json(
            F.struct(
                F.lit("appdb").alias("database"),
                F.lit("events").alias("table"),
                typ.alias("type"),
                F.unix_millis("ts").alias("ts"),
                F.struct(
                    F.col("user_id"), F.col("event_id"), F.col("value")
                ).alias("data"),
            )
        ).alias("env")
    )
    schema = (
        "database string, table string, type string, ts bigint,"
        " data struct<user_id: bigint, event_id: bigint, value: double>"
    )
    rows = env.select(F.from_json("env", schema).alias("m")).select(
        F.col("m.data.user_id").alias("user_id"),
        F.col("m.data.event_id").alias("event_id"),
        F.col("m.data.value").alias("value"),
        F.col("m.type").alias("typ"),
        F.col("m.ts").alias("ms"),
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(
            F.col("ms").desc(), F.col("event_id").desc()
        )
    )
    return (
        rows.withColumn("rn", rn)
        .filter((F.col("rn") == 1) & (F.col("typ") != "delete"))
        .select("user_id", "event_id", F.round("value", 6).alias("value"))
    )


@register(
    "src_cdc_ogg",
    oracle="""
    WITH oped AS (
      SELECT user_id, event_id, value, CAST(epoch_ms(ts) AS BIGINT) AS ms,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error' THEN 'D'
                  ELSE 'U' END AS typ
      FROM events
    ), latest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ms DESC, event_id DESC) AS rn
      FROM oped
    )
    SELECT user_id, event_id, ROUND(value, 6) AS value
    FROM latest WHERE rn = 1 AND typ <> 'D'
    """,
    survey="X6 S4",
)
def src_cdc_ogg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ogg-json CDC FORMAT (Flink flink-formats/flink-json Oracle
    GoldenGate decoder): GoldenGate envelopes carry before/after images
    with single-letter op codes — ``{"table":"SCHEMA.TABLE","op_type":
    "I|U|D","op_ts":...,"before":{...},"after":{...}}``; deletes have a
    NULL after-image, so the row image is COALESCE(after, before).
    Render, parse, map op→RowKind, apply; final state hash-matches the
    relational replay."""
    e = load_table(spark, sf_dir, "events")
    typ = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    img = F.struct(F.col("user_id"), F.col("event_id"), F.col("value"))
    # envelope with the correct before/after images per op: inserts have
    # no before-image, deletes no after-image
    env = e.select(
        F.to_json(
            F.struct(
                F.lit("APP.EVENTS").alias("table"),
                typ.alias("op_type"),
                F.unix_millis("ts").alias("op_ts"),
                F.when(typ != "I", img).alias("before"),
                F.when(typ != "D", img).alias("after"),
            )
        ).alias("env")
    )
    row_schema = "struct<user_id: bigint, event_id: bigint, value: double>"
    schema = (
        f"table string, op_type string, op_ts bigint,"
        f" before {row_schema}, after {row_schema}"
    )
    m = env.select(F.from_json("env", schema).alias("m"))
    rows = m.select(
        F.coalesce(F.col("m.after"), F.col("m.before")).alias("r"),
        F.col("m.op_type").alias("typ"),
        F.col("m.op_ts").alias("ms"),
    ).select("r.user_id", "r.event_id", "r.value", "typ", "ms")
    from pyspark.sql.window import Window

    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(
            F.col("ms").desc(), F.col("event_id").desc()
        )
    )
    return (
        rows.withColumn("rn", rn)
        .filter((F.col("rn") == 1) & (F.col("typ") != "D"))
        .select("user_id", "event_id", F.round("value", 6).alias("value"))
    )


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
