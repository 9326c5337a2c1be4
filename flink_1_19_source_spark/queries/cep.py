"""CEP / MATCH_RECOGNIZE coverage queries (SURVEY §2.9 X5).

Pattern: A B+ C over per-user event sequences where A=signup,
B=click|view, C=purchase (anything else breaks contiguity). The DuckDB
oracle replays the same semantics with string_agg + regex — left-to-right
non-overlapping matching is exactly Python's ``finditer`` and
MATCH_RECOGNIZE's AFTER MATCH SKIP PAST LAST ROW.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cep
from ..registry import register
from ..tables import load_table

_SYMBOLS = {"signup": "A", "click": "B", "view": "B", "purchase": "C"}


@register(
    "x5_match_recognize_abc",
    oracle="""
    WITH sym AS (
        SELECT user_id,
               string_agg(CASE event_type WHEN 'signup' THEN 'A'
                                          WHEN 'click' THEN 'B'
                                          WHEN 'view' THEN 'B'
                                          WHEN 'purchase' THEN 'C'
                                          ELSE 'X' END,
                          '' ORDER BY ts, event_id) AS s
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(regexp_extract_all(s, 'AB+C')) AS BIGINT) AS n_matches,
           CAST(COALESCE(list_max(list_transform(regexp_extract_all(s, 'AB+C'),
                                                 m -> LEN(m))), 0) AS BIGINT)
             AS longest_match
    FROM sym
    WHERE len(regexp_extract_all(s, 'AB+C')) > 0
    """,
    survey="X5",
)
def x5_match_recognize_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE, aggregate form: count of A B+ C matches per user +
    longest match length — the Catalyst fast path (JVM regex over the
    sorted per-key symbol string; operators/cep.match_counts). The
    span-returning NFA engine (match_recognize_lite) stays the general
    operator; its agreement with this path is pinned by
    tests/test_oracle.py + test_properties.py."""
    e = load_table(spark, sf_dir, "events")
    return cep.match_counts(
        e,
        key_col="user_id",
        ts_col="ts",
        id_col="event_id",
        symbol=cep.classify(_SYMBOLS)(F.col("event_type")),
        pattern="AB+C",
    ).withColumnRenamed("key", "user_id")


@register(
    "x5_adjacent_pair",
    oracle="""
    SELECT user_id, event_id AS signup_id, next_id AS purchase_id
    FROM (
        SELECT user_id, event_id, event_type, ts,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS next_type,
               LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS next_id
        FROM events
    )
    WHERE event_type = 'signup' AND next_type = 'purchase'
    """,
    survey="X5 O2",
)
def x5_adjacent_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window+lag batch subset of CEP: signup immediately followed by
    purchase in the same user's sequence (pure Catalyst, no Python)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .withColumn("next_id", F.lead("event_id").over(w))
        .filter((F.col("event_type") == "signup") & (F.col("next_type") == "purchase"))
        .select(
            "user_id",
            F.col("event_id").alias("signup_id"),
            F.col("next_id").alias("purchase_id"),
        )
    )
