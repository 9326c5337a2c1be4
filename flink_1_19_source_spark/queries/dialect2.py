"""Dialect closure queries (SURVEY §1.2 / §2.8 small documented gaps):
SQL:2016 SIMILAR TO, the TIME type, CURRENT_WATERMARK().

Each was listed in SURVEY §7.3 as a "small, documented gap" — closed here
with full oracles:

- **SIMILAR TO**: one translator (functions/similar_to.py) feeds BOTH
  engines — Spark rlike with the anchored translation, DuckDB
  regexp_full_match with the identical generated regex — so the oracle
  certifies the translation itself.
- **TIME**: Spark 4.1 ships a native TimeType behind
  ``spark.sql.timeType.enabled`` (runtime-settable); Flink's TIME(p)
  maps onto it directly. DuckDB has native TIME.
- **CURRENT_WATERMARK(rowtime)**: the per-partition min-combine tracker
  publishes its combined watermark to the session; the Flink-SQL layer
  substitutes it at statement time (constant within a micro-batch — the
  same granularity Flink guarantees within a firing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similar_to import similar_to_regex
from ..registry import register
from ..tables import load_table

# one literal pattern table shared by the Spark query and the generated
# oracle — the translation is computed ONCE and embedded on both sides
_PATTERNS = {
    "is_green": "%green%",
    "econ_or_std": "(ECONOMY|STANDARD)%",
    "brand_digit": "Brand#[0-9]{2}",
    "word_pair": "% [a-m]%y %",
    "anchored_dot": "%.%",  # SQL dialect: '.' is a LITERAL dot
}


def _similar_oracle() -> str:
    cols = ",\n           ".join(
        f"regexp_full_match(p_name, '{similar_to_regex(p)}') AS {alias}"
        if alias != "econ_or_std" and alias != "brand_digit"
        else (
            f"regexp_full_match(p_type, '{similar_to_regex(p)}') AS {alias}"
            if alias == "econ_or_std"
            else f"regexp_full_match(p_brand, '{similar_to_regex(p)}') AS {alias}"
        )
        for alias, p in _PATTERNS.items()
    )
    return f"""
    SELECT p_partkey,
           {cols}
    FROM part WHERE p_partkey <= 200
    """


@register(
    "f_similar_to_family",
    oracle=_similar_oracle(),
    survey="2.8-comparison S12",
)
def f_similar_to_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2016 SIMILAR TO via the Flink-SQL dialect layer: the query text
    uses literal SIMILAR TO syntax; functions/flink_sql.py rewrites it to
    anchored RLIKE with the shared translation. The oracle runs DuckDB's
    regexp_full_match over the SAME generated regexes, so wildcard
    semantics (%/_ wildcards, regex |*+{} passthrough, '.' as literal)
    are value-hash-certified."""
    from ..functions.flink_sql import flink_sql
    from ..tables import register_views

    register_views(spark, sf_dir)
    sel = ",\n               ".join(
        f"p_name SIMILAR TO '{p}' AS {alias}"
        if alias not in ("econ_or_std", "brand_digit")
        else (
            f"p_type SIMILAR TO '{p}' AS {alias}"
            if alias == "econ_or_std"
            else f"p_brand SIMILAR TO '{p}' AS {alias}"
        )
        for alias, p in _PATTERNS.items()
    )
    return flink_sql(
        spark,
        f"""
        SELECT p_partkey,
               {sel}
        FROM part WHERE p_partkey <= 200
        """,
    )


@register(
    "f_time_family",
    oracle="""
    SELECT event_id,
           CAST(CAST(ts AS TIME) AS VARCHAR) AS t_str,
           EXTRACT(hour FROM CAST(ts AS TIME)) AS t_hour,
           EXTRACT(minute FROM CAST(ts AS TIME)) AS t_min,
           CAST(ts AS TIME) >= TIME '12:00:00' AS after_noon,
           CAST(GREATEST(CAST(ts AS TIME), TIME '06:30:00') AS VARCHAR)
             AS clamped
    FROM events WHERE event_id < 500
    """,
    survey="2.8-temporal S12",
)
def f_time_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink TIME(p) on Spark 4.1's native TimeType (runtime-enabled):
    time-of-day extraction from the event timestamp (Spark casts
    STRING→TIME; the direct TIMESTAMP→TIME cast is not in 4.1, so the
    formatted-string hop is the documented bridge), EXTRACT, comparison
    against a TIME literal, GREATEST over times. Both engines trim
    trailing fractional zeros the same way, so string output is
    engine-neutral at full µs precision."""
    spark.conf.set("spark.sql.timeType.enabled", "true")
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH t AS (
          SELECT event_id,
                 CAST(date_format(ts, 'HH:mm:ss.SSSSSS') AS TIME(6)) AS tod
          FROM events WHERE event_id < 500
        )
        SELECT event_id,
               CAST(tod AS STRING) AS t_str,
               EXTRACT(HOUR FROM tod) AS t_hour,
               EXTRACT(MINUTE FROM tod) AS t_min,
               tod >= TIME'12:00:00' AS after_noon,
               CAST(GREATEST(tod, TIME'06:30:00') AS STRING) AS clamped
        FROM t
        """
    )


@register(
    "sql_current_watermark",
    oracle="""
    WITH pm AS (
      SELECT user_id % 4 AS p, MAX(ts) AS pmax FROM events GROUP BY 1
    ), wm AS (SELECT MIN(pmax) - INTERVAL 10 MINUTE AS w FROM pm)
    SELECT event_type, COUNT(*) AS n_on_time
    FROM events WHERE ts <= (SELECT w FROM wm)
    GROUP BY event_type
    """,
    survey="2.8-hash X1",
)
def sql_current_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURRENT_WATERMARK() surface (§2.8 hash/misc row — previously 'no
    equivalent'): the per-partition tracker folds the events table (as 4
    key-partitions), publishes min-combine − delay to the session, and the
    Flink-SQL layer substitutes it where the query says
    CURRENT_WATERMARK(ts). The oracle recomputes the same min-of-partition
    maxima rule in SQL."""
    import datetime as dt

    from ..functions.flink_sql import flink_sql
    from ..streaming.partition_watermark import PartitionWatermarkTracker
    from ..tables import register_views

    register_views(spark, sf_dir)
    e = load_table(spark, sf_dir, "events").withColumn(
        "partition", F.pmod(F.col("user_id"), F.lit(4)).cast("int")
    )
    tracker = PartitionWatermarkTracker(
        delay=dt.timedelta(minutes=10), ts_col="ts"
    )
    tracker.observe(e)
    tracker.publish(spark)
    return flink_sql(
        spark,
        """
        SELECT event_type, COUNT(*) AS n_on_time
        FROM events WHERE ts <= CURRENT_WATERMARK(ts)
        GROUP BY event_type
        """,
    )


# --------------------------------------------------------------------------
# VARIANT — semi-structured JSON as a first-class column type
# --------------------------------------------------------------------------
@register(
    "f_variant_family",
    oracle="""
    WITH j AS (
      SELECT event_id,
             '{"user":' || CAST(user_id AS VARCHAR)
             || ',"tags":["' || event_type || '"],"meta":' || props || '}' AS doc
      FROM events WHERE event_id < 2000
    )
    SELECT event_id,
           CAST(json_extract(doc, '$.user') AS BIGINT) AS v_user,
           json_extract_string(doc, '$.tags[0]') AS v_tag,
           CAST(json_extract(doc, '$.meta.k') AS BIGINT) AS v_k,
           CAST(json_extract(doc, '$.missing') AS BIGINT) AS v_missing,
           json_array_length(json_extract(doc, '$.tags')) AS v_n_tags
    FROM j
    """,
    survey="2.8-json S12",
)
def f_variant_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT (open-format semi-structured type): parse_json →
    binary variant, typed path access with variant_get / try_variant_get.
    Against a 100 TB JSON column VARIANT beats string re-parsing per
    expression: one parse at ingest, then O(path) binary access with
    shredding-friendly storage. The oracle replays the same paths with
    DuckDB's JSON accessors — typed results must agree exactly."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    doc = F.concat(
        F.lit('{"user":'), F.col("user_id").cast("string"),
        F.lit(',"tags":["'), F.col("event_type"),
        F.lit('"],"meta":'), F.col("props"), F.lit("}"),
    )
    v = F.parse_json(doc)
    return e.select(
        "event_id",
        F.variant_get(v, "$.user", "bigint").alias("v_user"),
        F.try_variant_get(v, "$.tags[0]", "string").alias("v_tag"),
        F.try_variant_get(v, "$.meta.k", "bigint").alias("v_k"),
        F.try_variant_get(v, "$.missing", "bigint").alias("v_missing"),
        F.array_size(F.variant_get(v, "$.tags", "array<string>"))
        .cast("long")
        .alias("v_n_tags"),
    )


# --------------------------------------------------------------------------
# 2.8 string — third wave: URL parsing, overlay, base64, bin/hex
# --------------------------------------------------------------------------
@register(
    "f_string3_family",
    oracle="""
    WITH u AS (
      SELECT event_id, event_type,
             'https://src' || CAST(user_id % 20 AS VARCHAR)
             || '.example.com/path/' || event_type
             || '?q=' || CAST(event_id AS VARCHAR) AS url
      FROM events WHERE event_id < 500
    )
    SELECT event_id,
           regexp_extract(url, '^https://([^/]+)', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           substr(event_type, 1, 1) || 'XX' || substr(event_type, 3) AS ov,
           CAST(strpos(event_type, 'r') AS BIGINT) AS loc,
           CAST(ascii(event_type) AS BIGINT) AS asc_code,
           chr(65 + CAST(event_id % 26 AS INTEGER)) AS ch,
           left(event_type, 3) AS l3, right(event_type, 3) AS r3,
           to_base64(CAST(event_type AS BLOB)) AS b64,
           CAST(from_base64(to_base64(CAST(event_type AS BLOB))) AS VARCHAR)
             AS b64_rt,
           bin(event_id) AS bn,
           upper(hex(event_id)) AS hx
    FROM u
    """,
    survey="2.8-string 2.8-hash",
)
def f_string3_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third string-function wave (SURVEY §2.8): PARSE_URL (Flink's URL
    accessor — the oracle replays it with regexes), OVERLAY, LOCATE,
    ASCII/CHR, LEFT/RIGHT, TO/FROM_BASE64 round-trip, BIN/HEX. All
    whole-stage-codegen expressions, zero shuffle."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    url = F.concat(
        F.lit("https://src"), (F.col("user_id") % 20).cast("string"),
        F.lit(".example.com/path/"), F.col("event_type"),
        F.lit("?q="), F.col("event_id").cast("string"),
    )
    et = F.col("event_type")
    return e.select(
        "event_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.overlay(et, F.lit("XX"), F.lit(2), F.lit(1)).alias("ov"),
        F.locate("r", "event_type").cast("long").alias("loc"),
        F.ascii(et).cast("long").alias("asc_code"),
        F.expr("char(65 + event_id % 26)").alias("ch"),
        F.expr("left(event_type, 3)").alias("l3"),
        F.expr("right(event_type, 3)").alias("r3"),
        F.base64(et.cast("binary")).alias("b64"),
        F.unbase64(F.base64(et.cast("binary"))).cast("string").alias("b64_rt"),
        F.bin(F.col("event_id")).alias("bn"),
        F.upper(F.hex(F.col("event_id"))).alias("hx"),
    )


_IS_ALPHA_RE = "^[A-Za-z]+$"
_IS_DIGIT_RE = "^[0-9]+$"
_IS_DECIMAL_RE = r"^[-+]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$"


@register(
    "f_string4_family",
    oracle=f"""
    SELECT event_id,
           regexp_full_match(event_type, '{_IS_ALPHA_RE}') AS et_alpha,
           regexp_full_match(CAST(event_id AS VARCHAR), '{_IS_DIGIT_RE}')
             AS id_digit,
           regexp_full_match(CAST(value AS VARCHAR), '{_IS_DECIMAL_RE}')
             AS val_decimal,
           CASE LOWER(typeof(event_id)) WHEN 'bigint' THEN 'bigint' END
             AS t_id,
           CASE LOWER(typeof(value)) WHEN 'double' THEN 'double' END AS t_val,
           CASE LOWER(typeof(event_type)) WHEN 'varchar' THEN 'string' END
             AS t_et,
           timezone('Asia/Tokyo', timezone('UTC', ts)) AS ts_tokyo,
           timezone('America/New_York', timezone('UTC', ts)) AS ts_ny
    FROM events WHERE event_id < 300
    """,
    survey="2.8-string 2.8-cast 2.8-temporal",
)
def f_string4_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth scalar wave: IS_ALPHA / IS_DIGIT / IS_DECIMAL (Flink's
    string-predicate built-ins — regex-expressed identically on both
    engines), TYPEOF (type names normalized across dialects: varchar ≡
    string), and CONVERT_TZ (Spark convert_timezone on NTZ ≡ DuckDB's
    two-step timezone() reinterpret+render; America/New_York exercises a
    DST-bearing zone, Tokyo a fixed offset). All codegen'd expressions,
    zero shuffle."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    ntz = F.col("ts").cast("timestamp_ntz")
    return e.select(
        "event_id",
        F.col("event_type").rlike(_IS_ALPHA_RE).alias("et_alpha"),
        F.col("event_id").cast("string").rlike(_IS_DIGIT_RE).alias("id_digit"),
        F.col("value").cast("string").rlike(_IS_DECIMAL_RE).alias("val_decimal"),
        F.when(F.typeof(F.col("event_id")) == "bigint", "bigint").alias("t_id"),
        F.when(F.typeof(F.col("value")) == "double", "double").alias("t_val"),
        F.when(F.typeof(F.col("event_type")) == "string", "string").alias("t_et"),
        F.convert_timezone(F.lit("UTC"), F.lit("Asia/Tokyo"), ntz).alias("ts_tokyo"),
        F.convert_timezone(F.lit("UTC"), F.lit("America/New_York"), ntz).alias(
            "ts_ny"
        ),
    )


@register(
    "sql_window_tvf",
    oracle="""
    WITH tumble AS (
      SELECT 'tumble' AS tvf,
             time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
               AS window_end,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(user_id) AS BIGINT) AS s
      FROM events GROUP BY 2, 3
    ), hop AS (
      SELECT 'hop' AS tvf, ws AS window_start,
             ws + INTERVAL '1 hour' AS window_end,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(user_id) AS BIGINT) AS s
      FROM (
        SELECT user_id,
               UNNEST(generate_series(
                   time_bucket(INTERVAL '15 minutes', ts)
                     - INTERVAL '45 minutes',
                   time_bucket(INTERVAL '15 minutes', ts),
                   INTERVAL '15 minutes')) AS ws
        FROM events
      ) GROUP BY 2, 3
    ), cml AS (
      SELECT 'cumulate' AS tvf,
             time_bucket(INTERVAL '1 hour', ts) AS window_start,
             UNNEST(generate_series(
                 time_bucket(INTERVAL '15 minutes', ts)
                   + INTERVAL '15 minutes',
                 time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour',
                 INTERVAL '15 minutes')) AS window_end,
             user_id
      FROM events
    ), cml_agg AS (
      SELECT tvf, window_start, window_end,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(user_id) AS BIGINT) AS s
      FROM cml GROUP BY 1, 2, 3
    )
    SELECT * FROM tumble UNION ALL SELECT * FROM hop
    UNION ALL SELECT * FROM cml_agg
    """,
    survey="S12 W1 W2 W3 2.8-temporal",
)
def sql_window_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's windowing-TVF SQL syntax runs VERBATIM through the dialect
    layer [docs: queries/window-tvf]: ``TABLE(TUMBLE(TABLE events,
    DESCRIPTOR(ts), INTERVAL '1' HOUR))`` (and HOP / CUMULATE) are
    textually rewritten onto Spark subqueries that append
    window_start/window_end/window_time — window() for TUMBLE, integer-µs
    covering-window expansion for HOP/CUMULATE.  A Flink user's windowed
    SQL pastes in unchanged; all three aggregates here are written in
    pure Flink syntax and hash-match the relational replay."""
    from ..functions.flink_sql import flink_sql
    from ..tables import register_views

    register_views(spark, sf_dir)

    def agg(tvf_sql: str, tag: str) -> DataFrame:
        return flink_sql(
            spark,
            f"""
            SELECT window_start, window_end,
                   COUNT(*) AS n, SUM(user_id) AS s
            FROM {tvf_sql}
            GROUP BY window_start, window_end
            """,
        ).select(
            F.lit(tag).alias("tvf"), "window_start", "window_end", "n", "s"
        )

    t = agg(
        "TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))",
        "tumble",
    )
    h = agg(
        "TABLE(HOP(TABLE events, DESCRIPTOR(ts), INTERVAL '15' MINUTE,"
        " INTERVAL '1' HOUR))",
        "hop",
    )
    c = agg(
        "TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts), INTERVAL '15' MINUTE,"
        " INTERVAL '1' HOUR))",
        "cumulate",
    )
    return t.unionByName(h).unionByName(c)


@register(
    "sql_legacy_group_windows",
    oracle="""
    WITH tumble AS (
      SELECT 'tumble' AS win,
             time_bucket(INTERVAL '1 hour', ts) AS ws,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS we,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(user_id) AS BIGINT) AS s
      FROM events GROUP BY 2, 3
    ), hop AS (
      SELECT 'hop' AS win, ws, ws + INTERVAL '1 hour' AS we,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(user_id) AS BIGINT) AS s
      FROM (
        SELECT user_id,
               UNNEST(generate_series(
                   time_bucket(INTERVAL '15 minutes', ts)
                     - INTERVAL '45 minutes',
                   time_bucket(INTERVAL '15 minutes', ts),
                   INTERVAL '15 minutes')) AS ws
        FROM events
      ) GROUP BY 2, 3
    )
    SELECT * FROM tumble UNION ALL SELECT * FROM hop
    """,
    survey="S12 W1 W2",
)
def sql_legacy_group_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's LEGACY group-window syntax — ``GROUP BY TUMBLE(ts,
    INTERVAL '1' HOUR)`` with ``TUMBLE_START``/``TUMBLE_END`` accessors,
    and ``GROUP BY HOP(ts, slide, size)`` with ``HOP_START`` — runs
    verbatim through the dialect layer [docs: legacy window aggregation].
    The rewrite maps them onto Spark's ``window()`` grouping expression
    (flipping HOP's slide/size argument order).  Pre-TVF Flink SQL is
    still everywhere in production; a user's old queries paste in
    unchanged."""
    from ..functions.flink_sql import flink_sql
    from ..tables import register_views

    register_views(spark, sf_dir)
    t = flink_sql(
        spark,
        """
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws,
               TUMBLE_END(ts, INTERVAL '1' HOUR) AS we,
               COUNT(*) AS n, SUM(user_id) AS s
        FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)
        """,
    ).select(F.lit("tumble").alias("win"), "ws", "we", "n", "s")
    h = flink_sql(
        spark,
        """
        SELECT HOP_START(ts, INTERVAL '15' MINUTE, INTERVAL '1' HOUR) AS ws,
               HOP_END(ts, INTERVAL '15' MINUTE, INTERVAL '1' HOUR) AS we,
               COUNT(*) AS n, SUM(user_id) AS s
        FROM events
        GROUP BY HOP(ts, INTERVAL '15' MINUTE, INTERVAL '1' HOUR)
        """,
    ).select(F.lit("hop").alias("win"), "ws", "we", "n", "s")
    return t.unionByName(h)


@register(
    "sql_session_tvf",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         <= INTERVAL '30 minutes'
                    THEN 0 ELSE 1 END AS new_sess
        FROM events
    ), sess AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ), merged AS (
        SELECT user_id,
               MIN(ts) AS window_start,
               MAX(ts) + INTERVAL '30 minutes' AS window_end,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM sess GROUP BY user_id, sid
    )
    SELECT form, user_id, window_start, window_end, n
    FROM merged CROSS JOIN (VALUES ('tvf'), ('legacy')) AS f(form)
    """,
    survey="S12 W4",
)
def sql_session_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink 1.19's SESSION window TVF — ``TABLE(SESSION(TABLE events
    PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '30' MINUTE))`` — AND
    the legacy ``GROUP BY SESSION(ts, gap)`` + SESSION_START/SESSION_END
    syntax, both running VERBATIM through the dialect layer [docs:
    queries/window-tvf (session)].  Sessions gap-merge per key, so
    unlike TUMBLE/HOP the rewrite restructures the aggregation onto
    Spark's session_window() grouping expression (window_start/
    window_end become field extractions of the grouping struct) rather
    than rewriting only the FROM table.  Both syntaxes hash-match the
    same DuckDB gap-merge replay — the headline 1.19 SQL feature a Flink
    user pastes in unchanged."""
    from ..functions.flink_sql import flink_sql
    from ..tables import register_views

    register_views(spark, sf_dir)
    tvf = flink_sql(
        spark,
        """
        SELECT window_start, window_end, user_id, COUNT(*) AS n
        FROM TABLE(SESSION(TABLE events PARTITION BY user_id,
                           DESCRIPTOR(ts), INTERVAL '30' MINUTE))
        GROUP BY window_start, window_end, user_id
        """,
    ).select(
        F.lit("tvf").alias("form"), "user_id", "window_start",
        "window_end", "n",
    )
    legacy = flink_sql(
        spark,
        """
        SELECT user_id,
               SESSION_START(ts, INTERVAL '30' MINUTE) AS window_start,
               SESSION_END(ts, INTERVAL '30' MINUTE) AS window_end,
               COUNT(*) AS n
        FROM events GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTE)
        """,
    ).select(
        F.lit("legacy").alias("form"), "user_id", "window_start",
        "window_end", "n",
    )
    return tvf.unionByName(legacy)


@register(
    "s_sql_window_tvf_stream",
    oracle="""
    WITH wm AS (SELECT MAX(ts) - INTERVAL 10 MINUTE AS w FROM events)
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
             AS window_end,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(user_id) AS BIGINT) AS s
    FROM events
    GROUP BY 1, 2
    HAVING window_end <= (SELECT w FROM wm)
    """,
    survey="S12 W1-S X1",
    tags=("streaming",),
)
def s_sql_window_tvf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's windowing-TVF SQL on a STREAMING source — the statement a
    Flink user actually runs is stream-first, and it pastes in verbatim
    here too: the replayed watermarked stream registers as a view, the
    IDENTICAL ``TABLE(TUMBLE(TABLE events_stream, DESCRIPTOR(ts),
    INTERVAL '1' HOUR))`` text goes through the same dialect rewrite as
    the batch twin (sql_window_tvf), and Spark plans it as a streaming
    window aggregate — append mode emits exactly the windows the final
    watermark closes (Flink's emit-on-watermark).  One dialect layer,
    both execution modes; the oracle is the closed-window batch
    replay."""
    import os

    from ..functions.flink_sql import flink_sql
    from ..streaming import replay
    from .streaming_queries import (
        _CHUNKS, _drain_to_memory, _work_dir,
    )

    wd = _work_dir(sf_dir, "s_sqltvf")
    sdf = replay.replay_table(
        spark, sf_dir, "events", os.path.join(wd, "src"), chunks=_CHUNKS,
        files_per_trigger=2,
    )
    sdf.withWatermark("ts", "10 minutes").createOrReplaceTempView(
        "events_stream"
    )
    out = flink_sql(
        spark,
        """
        SELECT window_start, window_end,
               COUNT(*) AS n, SUM(user_id) AS s
        FROM TABLE(TUMBLE(TABLE events_stream, DESCRIPTOR(ts),
                          INTERVAL '1' HOUR))
        GROUP BY window_start, window_end
        """,
    )
    return _drain_to_memory(spark, out, "s_sqltvf_q", "append", wd)


@register(
    "s_sql_session_tvf_stream",
    oracle="""
    WITH wm AS (SELECT MAX(ts) - INTERVAL 10 MINUTE AS w FROM events),
    flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         <= INTERVAL '30 minutes'
                    THEN 0 ELSE 1 END AS new_sess
        FROM events
    ), sess AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ), merged AS (
        SELECT user_id,
               MIN(ts) AS window_start,
               MAX(ts) + INTERVAL '30 minutes' AS window_end,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM sess GROUP BY user_id, sid
    )
    SELECT user_id, window_start, window_end, n
    FROM merged WHERE window_end <= (SELECT w FROM wm)
    """,
    survey="S12 W4-S X1",
    tags=("streaming",),
)
def s_sql_session_tvf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's SESSION window TVF on a STREAMING source — the verbatim
    ``TABLE(SESSION(TABLE events_stream PARTITION BY user_id,
    DESCRIPTOR(ts), INTERVAL '30' MINUTE))`` statement through the same
    dialect rewrite as the batch twin (sql_session_tvf), planned as
    Spark's native streaming session_window aggregate: gap-merging
    keyed state, append mode emitting exactly the sessions the final
    watermark closes (a session ends at last event + gap; it emits once
    the watermark passes that).  With s_sql_window_tvf_stream this
    completes the claim: the 1.19 windowing-TVF SQL a Flink user runs
    pastes in unchanged in BOTH execution modes."""
    import os

    from ..functions.flink_sql import flink_sql
    from ..streaming import replay
    from .streaming_queries import _CHUNKS, _drain_to_memory, _work_dir

    wd = _work_dir(sf_dir, "s_sqlsess")
    sdf = replay.replay_table(
        spark, sf_dir, "events", os.path.join(wd, "src"), chunks=_CHUNKS,
        files_per_trigger=2,
    )
    sdf.withWatermark("ts", "10 minutes").createOrReplaceTempView(
        "events_stream"
    )
    out = flink_sql(
        spark,
        """
        SELECT user_id, window_start, window_end, COUNT(*) AS n
        FROM TABLE(SESSION(TABLE events_stream PARTITION BY user_id,
                           DESCRIPTOR(ts), INTERVAL '30' MINUTE))
        GROUP BY user_id, window_start, window_end
        """,
    )
    return _drain_to_memory(spark, out, "s_sqlsess_q", "append", wd)
