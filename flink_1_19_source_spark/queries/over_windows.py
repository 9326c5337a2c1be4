"""OVER windows / analytic functions (SURVEY §2.6).

Flink locus: flink-table-runtime over-window operators + planner
FlinkLogicalRankRule (Top-N / dedup rewrites). All rows map to
``pyspark.sql.Window`` — one shuffle on the partition key, sort within
partitions (the same physical shape Flink's rank operator produces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exact import dsum, sql_dsum
from ..registry import register
from ..tables import load_table


@register(
    "o1_rank_functions",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    QUALIFY rn <= 5
    """,
    survey="O1",
)
def o1_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "o2_lead_lag",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           value - COALESCE(LAG(value) OVER w, 0.0) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    survey="O2",
)
def o2_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0))).alias("delta"),
    )


@register(
    "o3_first_last_over",
    oracle="""
    SELECT event_id, user_id,
           FIRST_VALUE(value) OVER w AS first_val,
           LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val,
           NTH_VALUE(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    survey="O3",
)
def o3_first_last_over(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    wcur = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        F.first("value").over(wcur).alias("first_val"),
        F.last("value").over(wall).alias("last_val"),
        F.nth_value("value", 2).over(wcur).alias("second_val"),
    )


@register(
    "o4_agg_over_frames",
    oracle=f"""
    SELECT event_id, user_id, value,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER wrow AS DOUBLE) AS running_sum,
           COUNT(*) OVER wrow AS running_n,
           MIN(value) OVER w3 AS min3, MAX(value) OVER w3 AS max3
    FROM events
    WINDOW wrow AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    survey="O4",
)
def o4_agg_over_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over ROWS frames — the streaming-legal `... AND CURRENT
    ROW` shape (Flink streaming OVER windows allow only that frame)."""
    e = load_table(spark, sf_dir, "events")
    wrow = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w3 = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.sum(F.col("value").cast("decimal(27,6)")).over(wrow).cast("double").alias("running_sum"),
        F.count(F.lit(1)).over(wrow).alias("running_n"),
        F.min("value").over(w3).alias("min3"),
        F.max("value").over(w3).alias("max3"),
    )


@register(
    "o5_distribution_functions",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 9) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    survey="O5",
)
def o5_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


@register(
    "o6_topn_pattern",
    oracle="""
    SELECT user_id, event_id, value, rn FROM (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id) AS rn
        FROM events WHERE event_type = 'purchase'
    ) WHERE rn <= 3
    """,
    survey="O6",
)
def o6_topn_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's Top-N pattern (ROW_NUMBER ≤ N rewrite → rank operator).
    Catalyst plans a rank-limit: per-partition top-N is computed before the
    shuffle, so only N rows per key per mapper move — skew-safe at scale."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        e.select("user_id", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "o7_dedup_keep_first",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value FROM (
        SELECT user_id, event_type, event_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    survey="O7 N1",
)
def o7_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink dedup pattern (Top-N with N=1, keep FIRST row per key by time).
    Streaming twin: dropDuplicatesWithinWatermark (streaming/ tests)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.select("user_id", "event_type", "event_id", "ts", "value",
                 F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "o7_dedup_keep_last",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value FROM (
        SELECT user_id, event_type, event_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    survey="O7",
)
def o7_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup keep-LAST (Flink's upsert-materialization shape)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.select("user_id", "event_type", "event_id", "ts", "value",
                 F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "o2b_lead_lag_offsets",
    oracle="""
    SELECT event_id, user_id,
           LAG(value, 3, -1.0) OVER w AS lag3,
           LEAD(value, 2, -1.0) OVER w AS lead2,
           LAG(event_type, 1, 'none') OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    survey="O2",
)
def o2b_lead_lag_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAD/LAG with explicit offsets and DEFAULT values (Flink
    ``LAG(x, n, default)`` [docs: over-agg]): edge rows take the typed
    default instead of NULL — the default-vs-null distinction is exactly
    what the hash certifies (a dropped default shows as NULL-row
    drift)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value", 3, -1.0).over(w).alias("lag3"),
        F.lead("value", 2, -1.0).over(w).alias("lead2"),
        F.lag("event_type", 1, "none").over(w).alias("prev_type"),
    )


@register(
    "o6b_topn_with_ties",
    oracle="""
    SELECT user_id, event_id, vb, rnk, drk FROM (
        SELECT user_id, event_id,
               CAST(FLOOR(value / 100) AS BIGINT) AS vb,
               CAST(RANK() OVER (PARTITION BY user_id
                                 ORDER BY FLOOR(value / 100) DESC)
                    AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER (PARTITION BY user_id
                                       ORDER BY FLOOR(value / 100) DESC)
                    AS BIGINT) AS drk
        FROM events WHERE event_type = 'purchase'
    ) WHERE rnk <= 3
    """,
    survey="O6 O1",
)
def o6b_topn_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N WITH TIES — Flink's Top-N pattern with RANK() instead of
    ROW_NUMBER() [docs: queries/topn — rank functions]: every row whose
    value bucket ties into the top 3 ranks survives, so group sizes
    vary with the data (the bucketed ordering key makes ties real, not
    accidental).  DENSE_RANK rides along as the gap-free variant.  Same
    rank-limit plan shape as o6_topn_pattern: per-partition pre-rank
    before the shuffle keeps the skew story intact."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    vb = F.floor(F.col("value") / 100).cast("long")
    w = Window.partitionBy("user_id").orderBy(vb.desc())
    return (
        e.select(
            "user_id",
            "event_id",
            vb.alias("vb"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drk"),
        )
        .filter(F.col("rnk") <= 3)
    )
