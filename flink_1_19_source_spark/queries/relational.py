"""Row-level relational operators (SURVEY §2.2) + the flagship query.

Flink locus (upstream, per SURVEY §2.2): planner-codegen'd ``Calc`` for
project/filter, ``Correlate`` for UNNEST/lateral, ``Values``; DataStream
map/flatMap. All are stateless row ops → pure Catalyst expressions here;
each stays inside one WholeStageCodegen span (verified via .explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import compat
from ..functions.exact import davg, dsum, sql_davg, sql_dsum
from ..registry import register
from ..tables import load_table

_Q1_CUTOFF = "2001-09-02 00:00:00"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="A1 A5 R1 R2 T1",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the flagship end-to-end slice.

    Scan → pushed filter → project → hash agg (partial+final, exact decimal
    sums) → sort. At 100 TB: one shuffle on the 6-value group key; the
    predicate and the 7-column projection reach the parquet scan.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "r1_projection",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           p_retailprice * 1.1 AS inflated_price,
           p_size % 10 AS size_mod,
           CONCAT(p_brand, '#', p_type) AS brand_type
    FROM part
    """,
    survey="R1",
)
def r1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT with computed columns (Flink Calc / projection)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        (F.col("p_retailprice") * 1.1).alias("inflated_price"),
        (F.col("p_size") % 10).alias("size_mod"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "r2_filter_three_valued",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_totalprice > 150000 OR NULLIF(o_orderstatus, 'P') IS NULL)
      AND NOT (o_orderpriority = '1-URGENT' AND o_totalprice < 50000)
    """,
    survey="R2",
)
def r2_filter_three_valued(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE with 3-valued logic (NULL-producing NULLIF inside OR/NOT)."""
    o = load_table(spark, sf_dir, "orders")
    cond = (F.col("o_totalprice") > 150000) | F.nullif(
        F.col("o_orderstatus"), F.lit("P")
    ).isNull()
    cond &= ~((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") < 50000))
    return o.filter(cond).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "r3_flatmap_tokens",
    oracle="""
    SELECT lang, token, COUNT(*) AS n
    FROM (
        SELECT lang, UNNEST(string_split(text, ' ')) AS token FROM documents
    )
    WHERE token <> ''
    GROUP BY lang, token
    HAVING COUNT(*) >= 5
    """,
    survey="R3 R4",
)
def r3_flatmap_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataStream flatMap ≡ explode: 1→N tokenization then re-agg."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
    )


@register(
    "r4_unnest_posexplode",
    oracle="""
    SELECT doc_id, i - 1 AS pos, tokens[i] AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS tokens
          FROM documents WHERE doc_id < 50) t,
         (SELECT UNNEST([1, 2, 3]) AS i)
    WHERE i <= len(tokens)
    """,
    survey="R4",
)
def r4_unnest_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST WITH ORDINALITY ≡ posexplode (lateral table function)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .filter(F.col("pos") < 3)
    )


@register(
    "r5_values_literal",
    oracle="""
    SELECT * FROM (VALUES
        (1, 'EUROPE', TRUE),
        (2, 'ASIA', FALSE),
        (3, 'AMERICA', NULL)
    ) AS v(id, name, flag)
    """,
    survey="R5",
)
def r5_values_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES literal rows (Flink planner Values node). `spark.sql` VALUES
    stays a Catalyst LocalRelation — no RDD/Python-serialization detour
    (createDataFrame on a driver list costs ~2s; this is ~0.1s)."""
    return spark.sql(
        "SELECT * FROM VALUES (1, 'EUROPE', true), (2, 'ASIA', false), "
        "(3, 'AMERICA', CAST(NULL AS BOOLEAN)) AS v(id, name, flag)"
    )


@register(
    "r6_side_output_split",
    oracle="""
    SELECT tag, COUNT(*) AS n, {sum_v} AS total_value
    FROM (
        SELECT CASE WHEN event_type = 'error' THEN 'side' ELSE 'main' END AS tag, value
        FROM events
    )
    GROUP BY tag
    """.format(sum_v=sql_dsum("value")),
    survey="R6",
)
def r6_side_output_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Side outputs (Flink OutputTag): tag column + filtered branches.

    Batch shape of the streaming pattern: tag once, aggregate per branch —
    a single pass over the source (vs two scans for two filters).
    """
    e = load_table(spark, sf_dir, "events")
    tagged = e.withColumn(
        "tag", F.when(F.col("event_type") == "error", "side").otherwise("main")
    )
    return tagged.groupBy("tag").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total_value")
    )


@register(
    "r7_async_enrich",
    oracle="""
    SELECT event_id, user_id, value, value * 2 AS enriched
    FROM events WHERE event_id < 100
    """,
    survey="R7",
)
def r7_async_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AsyncScalarFunction (FLIP-400) shape: per-row enrichment executed as
    an Arrow-batched async pipeline inside mapInPandas. The demo enrichment
    is deterministic (value*2) so it oracles; real use would await an
    external service per batch with bounded concurrency."""
    import asyncio

    import pandas as pd

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100).select(
        "event_id", "user_id", "value"
    )

    def enrich_batches(batches):
        async def enrich_one(v: float) -> float:
            return v * 2  # stand-in for an awaited external lookup

        async def run(vals):
            return await asyncio.gather(*(enrich_one(v) for v in vals))

        for pdf in batches:
            pdf = pdf.copy()
            pdf["enriched"] = asyncio.new_event_loop().run_until_complete(
                run(pdf["value"].tolist())
            )
            yield pdf

    schema = "event_id long, user_id long, value double, enriched double"
    return e.mapInPandas(enrich_batches, schema=schema)
