"""Group windows / window TVFs, batch semantics (SURVEY §2.5).

Flink locus: window TVFs TUMBLE/HOP/CUMULATE/SESSION (SESSION TVF completed
in 1.19). Spark: `window()` / `session_window()` grouping; CUMULATE via the
custom explode operator (operators/cumulate.py). The streaming twins of
these exact shapes are exercised in tests/test_streaming.py.

Oracle notes: DuckDB `time_bucket` ≡ tumble assignment; HOP is expanded to
covering windows with generate_series; SESSION via classic gaps-and-islands
window SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum, sql_dsum
from ..operators.cumulate import cumulate
from ..registry import register
from ..tables import load_table


@register(
    "w1_tumble",
    oracle=f"""
    SELECT event_type,
           time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           COUNT(*) AS n, {sql_dsum('value')} AS total
    FROM events
    GROUP BY event_type, time_bucket(INTERVAL '1 hour', ts)
    """,
    survey="W1 W6",
)
def w1_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUMBLE(1 hour) with window_start/window_end aux columns."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total"))
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "total",
        )
    )


@register(
    "w2_hop",
    oracle=f"""
    SELECT event_type, ws AS window_start, COUNT(*) AS n, {sql_dsum('value')} AS total
    FROM (
        SELECT event_type, value,
               UNNEST(generate_series(
                   time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '45 minutes',
                   time_bucket(INTERVAL '15 minutes', ts),
                   INTERVAL '15 minutes')) AS ws
        FROM events
    )
    GROUP BY event_type, ws
    """,
    survey="W2",
)
def w2_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP(slide=15 min, size=1 hour): every row lands in 4 windows."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total"))
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            "n",
            "total",
        )
    )


@register(
    "w3_cumulate",
    oracle=f"""
    SELECT event_type, window_start, window_end,
           COUNT(*) AS n, {sql_dsum('value')} AS total
    FROM (
        SELECT event_type, value,
               time_bucket(INTERVAL '2 hours', ts) AS window_start,
               time_bucket(INTERVAL '2 hours', ts)
                 + INTERVAL '30 minutes' * k AS window_end
        FROM events,
             (SELECT UNNEST(generate_series(1, 4)) AS k)
        WHERE ts < time_bucket(INTERVAL '2 hours', ts) + INTERVAL '30 minutes' * k
    )
    GROUP BY event_type, window_start, window_end
    """,
    survey="W3",
)
def w3_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATE(step=30 min, max=2 hours) via the custom explode operator."""
    e = load_table(spark, sf_dir, "events")
    return (
        cumulate(e, "ts", step="30 minutes", max_size="2 hours")
        .groupBy("event_type", "window_start", "window_end")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total"))
    )


@register(
    "w4_session",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         <= INTERVAL '30 minutes'
                    THEN 0 ELSE 1 END AS new_sess
        FROM events
    ), sess AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n, {sql_dsum('value')} AS total
    FROM sess
    GROUP BY user_id, sid
    """,
    survey="W4 W6",
)
def w4_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION(gap=30 min) PARTITION BY user — Flink 1.19's SESSION TVF ≡
    Spark session_window (merging gap sessions; end = last event + gap)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            "total",
        )
    )


@register(
    "w5_tumble_offset",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 day', ts, INTERVAL '6 hours') AS window_start,
           COUNT(*) AS n, {sql_dsum('value')} AS total
    FROM events
    GROUP BY window_start
    """,
    survey="W5",
)
def w5_tumble_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumble with offset: 1-day windows aligned to 06:00 (Flink window
    offset / timezone alignment)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day", "1 day", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total"))
        .select(F.col("w.start").alias("window_start"), "n", "total")
    )


@register(
    "w6_window_time",
    oracle="""
    SELECT event_type,
           time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
               - INTERVAL '1 millisecond' AS window_time,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type, time_bucket(INTERVAL '1 hour', ts)
    """,
    survey="W6",
)
def w6_window_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window_time aux column = window_end − 1ms (the row's event-time
    attribute after windowing, per Flink's window TVF contract)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            (F.col("w.end") - F.expr("INTERVAL 1 MILLISECOND")).alias("window_time"),
            "n",
        )
    )
