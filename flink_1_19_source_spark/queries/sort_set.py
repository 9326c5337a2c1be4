"""Sort / limit / set operators (SURVEY §2.7).

Flink locus: batch sort/limit operators (flink-table-runtime sort) and
planner set-op rewrites. ORDER BY + LIMIT plans as TakeOrderedAndProject
on Spark: each task keeps a bounded heap, the driver merges — no global
sort materializes, which is what makes top-k affordable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


@register(
    "t1_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
    survey="T1 T2 T3",
)
def t1_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT (top-k): plans as TakeOrderedAndProject."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .limit(50)
    )


@register(
    "t2_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
    survey="T2",
)
def t2_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET/FETCH over a deterministic total order."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(20)
    )


@register(
    "t4_union",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
    survey="T4",
)
def t4_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union — Flink's streaming-legal union)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "t4_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    survey="T4",
)
def t4_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set union = union all + distinct)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct()


@register(
    "t5_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    survey="T5",
)
def t5_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "t5_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    survey="T5",
)
def t5_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference) — multiplicity-aware."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.exceptAll(s)


@register(
    "t5_intersect_all",
    oracle="""
    SELECT o_orderpriority AS pri FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_orderpriority AS pri FROM orders WHERE o_orderstatus = 'O'
    """,
    survey="T5",
)
def t5_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_orderpriority").alias("pri"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_orderpriority").alias("pri"))
    return a.intersectAll(b)


@register(
    "t6_null_ordering",
    oracle="""
    WITH src AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS v
      FROM orders WHERE o_orderkey <= 2000
    )
    SELECT o_orderkey, v,
           CAST(ROW_NUMBER() OVER (ORDER BY v ASC NULLS LAST, o_orderkey)
                AS BIGINT) AS pos_asc_nl,
           CAST(ROW_NUMBER() OVER (ORDER BY v DESC NULLS FIRST, o_orderkey)
                AS BIGINT) AS pos_desc_nf
    FROM src
    """,
    survey="T1 R2",
)
def t6_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST/LAST ordering (Flink ORDER BY ... NULLS
    FIRST|LAST [docs: queries/orderby]; engine DEFAULTS differ — Spark
    sorts nulls first ascending, Calcite-based engines last — so
    portable SQL must pin it). Rank positions under both pinned
    orderings are returned as data, making the null placement itself
    value-hash-certified."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    src = o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") != "P", F.col("o_totalprice")).alias("v"),
    )
    return src.select(
        "o_orderkey",
        "v",
        F.row_number()
        .over(Window.orderBy(F.col("v").asc_nulls_last(), F.col("o_orderkey")))
        .cast("long")
        .alias("pos_asc_nl"),
        F.row_number()
        .over(Window.orderBy(F.col("v").desc_nulls_first(), F.col("o_orderkey")))
        .cast("long")
        .alias("pos_desc_nf"),
    )


@register(
    "t4c_union_type_coercion",
    oracle="""
    SELECT k, CAST(v AS DOUBLE) AS v FROM (
      SELECT 'int' AS k, CAST(o_orderkey AS INTEGER) AS v
      FROM orders WHERE o_orderkey <= 100
      UNION ALL
      SELECT 'big' AS k, o_custkey AS v FROM orders WHERE o_orderkey <= 100
      UNION ALL
      SELECT 'dbl' AS k, o_totalprice AS v FROM orders WHERE o_orderkey <= 100
    )
    """,
    survey="T4 2.8-cast",
)
def t4c_union_type_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION implicit type coercion (Calcite/Flink widen the branch
    types to a common type; so does Spark's SQL union): INT, BIGINT and
    DOUBLE branches must all widen to DOUBLE — the coercion itself is
    what's certified (a dropped widening surfaces as a dtype-strict hash
    mismatch)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    o.createOrReplaceTempView("t4c_orders")
    return spark.sql(
        """
        SELECT 'int' AS k, CAST(o_orderkey AS INT) AS v FROM t4c_orders
        UNION ALL
        SELECT 'big' AS k, o_custkey AS v FROM t4c_orders
        UNION ALL
        SELECT 'dbl' AS k, o_totalprice AS v FROM t4c_orders
        """
    )
