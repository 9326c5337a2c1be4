"""CDC envelope decoders over file sources (SURVEY §2.9 X6, §2.1 S4).

The complete flink-json CDC family — debezium-json, canal-json,
maxwell-json, ogg-json — each envelope parsed into typed columns with
the op -> RowKind (_rowkind) mapping and folded through the keyed
changelog apply.  Split out of queries/sources2.py (same registry
names) to keep modules under the house size bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

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


