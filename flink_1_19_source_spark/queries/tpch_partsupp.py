"""TPC-H queries over the DERIVED partsupp stand-in (Q2/Q9/Q11/Q20).

The testdata has no partsupp table; these four queries derive the same
deterministic stand-in on both engines (keys = distinct traded
(l_partkey, l_suppkey) pairs, cost/availqty = integer key arithmetic)
so the join topology each one benchmarks is identical to real TPC-H.
Split out of queries/tpch.py (same registry names) to keep modules
under the house size bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import davg, dsum, sql_davg, sql_dsum
from ..registry import register
from ..tables import load_table

# -- derived partsupp ------------------------------------------------------
#
# The testdata has no partsupp table; the four queries that need one
# (Q2/Q9/Q11/Q20) derive the SAME stand-in on both engines: keys = the
# distinct (l_partkey, l_suppkey) pairs actually traded, cost/availqty =
# pure integer arithmetic on the keys (exact in any engine, so the oracle
# hash cannot drift). The join topology — the thing these queries
# benchmark — is identical to real partsupp.

# CAST(... AS DOUBLE) / double: Spark would otherwise type the 100.0
# literal as DECIMAL(4,1) and carry decimal through the division, while
# DuckDB yields double — dtype-strict oracle hashes must agree
_PS_COST_SQL = (
    "CAST((ps_partkey * 37 + ps_suppkey * 101) % 90000 + 10000 AS DOUBLE)"
    " / CAST(100 AS DOUBLE)"
)
_PS_QTY_SQL = "CAST((ps_partkey * 13 + ps_suppkey * 7) % 9999 + 1 AS BIGINT)"

_PS_CTE = f"""psupp AS (
      SELECT ps_partkey, ps_suppkey,
             {_PS_COST_SQL} AS ps_supplycost,
             {_PS_QTY_SQL} AS ps_availqty
      FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
            FROM lineitem)
    )"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .withColumn("ps_supplycost", F.expr(_PS_COST_SQL))
        .withColumn("ps_availqty", F.expr(_PS_QTY_SQL))
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PS_CTE}
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           ROUND(ps_supplycost, 2) AS supplycost
    FROM part, psupp, supplier, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size = 15 AND p_type = 'SMALL'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps_supplycost = (
          SELECT MIN(ps_supplycost)
          FROM psupp p2, supplier s2, nation n2, region r2
          WHERE p2.ps_partkey = part.p_partkey
            AND s2.s_suppkey = p2.ps_suppkey
            AND s2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    survey="J1 J3 A1 T3",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: minimum-cost supplier — the correlated-MIN-subquery
    benchmark. Spark plan: the regional partsupp⋈supplier slice is built
    once (dims broadcast), the per-part MIN is a groupBy on the SAME
    partkey the probe join uses (one shuffle, reused partitioning), and
    the equality probe decorrelates the subquery. (p_mfgr/s_address etc.
    absent from this schema → p_brand and the available supplier columns;
    Brand/size predicates keep the original's selectivity shape.)"""
    ps = _derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    regional = (
        ps.join(F.broadcast(s), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
    )
    min_cost = regional.groupBy(F.col("ps_partkey").alias("m_partkey")).agg(
        F.min("ps_supplycost").alias("m_cost")
    )
    return (
        # join on partkey ALONE (the min_cost groupBy's own key, so the
        # partitioning is reusable) and filter the cost equality after —
        # a composite (partkey, cost) join key would force a fresh
        # shuffle of both sides on the wider key
        regional.join(min_cost, F.col("ps_partkey") == F.col("m_partkey"))
        .filter(F.col("ps_supplycost") == F.col("m_cost"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.round("ps_supplycost", 2).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q9_product_type_profit",
    oracle=f"""
    WITH {_PS_CTE}
    SELECT nation, o_year, {sql_dsum('amount')} AS sum_profit
    FROM (
      SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount)
               - ps_supplycost * l_quantity AS amount
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN psupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      JOIN part ON p_partkey = l_partkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
    survey="J1 A1",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: product-type profit by nation and year — the widest join
    fan of the suite (fact ⋈ 2-key partsupp ⋈ part ⋈ orders ⋈ supplier ⋈
    nation). Spark plan: part (name-filtered), supplier, nation broadcast;
    the derived partsupp joins on the fact's own (partkey, suppkey) so it
    rides the fact partitioning; orders is the one shuffled join. Profit
    sums are exact-decimal (order-independent under any partitioning).
    (p_name LIKE '%green%' → '%red%' for this generator's vocabulary.)"""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    ps = _derived_partsupp(spark, sf_dir)
    joined = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("ps_supplycost") * F.col("l_quantity")
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount")).alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH {_PS_CTE},
    natps AS (
      SELECT ps_partkey, ps_supplycost * ps_availqty AS value
      FROM psupp JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3'
    )
    SELECT ps_partkey, {sql_dsum('value')} AS value
    FROM natps
    GROUP BY ps_partkey
    HAVING {sql_dsum('value')} >
           (SELECT 0.001 * {sql_dsum('value')} FROM natps)
    ORDER BY value DESC, ps_partkey
    """,
    survey="J1 A1 T1",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: important stock — groupBy + HAVING against a global
    scalar subquery. Spark plan: the national partsupp slice is computed
    ONCE and localCheckpointed (the per-part agg and the grand total both
    read it without re-running the joins); the threshold is a 1-row
    broadcast cross-join, never a collect; one shuffle on partkey.
    (Fraction 0.001 in place of the original's 0.0001/SF for this data
    size.)"""
    ps = _derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    natps = (
        ps.join(F.broadcast(s), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("value"),
        )
        .localCheckpoint(eager=True)
    )
    per_part = natps.groupBy("ps_partkey").agg(dsum(F.col("value")).alias("value"))
    threshold = natps.agg((dsum(F.col("value")) * 0.001).alias("cap"))
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("cap"))
        .select("ps_partkey", "value")
        .orderBy(F.desc("value"), "ps_partkey")
    )


@register(
    "q20_potential_promotion",
    oracle=f"""
    WITH {_PS_CTE}
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_5'
      AND s_suppkey IN (
        SELECT ps_suppkey FROM psupp
        WHERE ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'
        )
        AND ps_availqty > (
            SELECT 0.3 * SUM(l_quantity) FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
        )
      )
    ORDER BY s_suppkey
    """,
    survey="J3 A1",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: potential part promotion — nested IN subqueries with a
    correlated per-(part,supplier) threshold. Spark plan: fully
    decorrelated — the year's shipped-quantity agg groups on the SAME
    (partkey, suppkey) pair the partsupp probe joins on (one shuffle,
    shared partitioning); the blue-part filter broadcasts; the final
    supplier membership is a left-semi join. ('forest%' → 'blue%', 0.5 →
    0.3 for this generator's vocabulary and quantity scale.)"""
    ps = _derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("blue%")
    ).select("p_partkey")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = l.groupBy(
        F.col("l_partkey").alias("q_partkey"),
        F.col("l_suppkey").alias("q_suppkey"),
    ).agg((F.sum("l_quantity") * 0.3).alias("qty_cap"))
    qualifying = (
        ps.join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            shipped,
            (F.col("q_partkey") == F.col("ps_partkey"))
            & (F.col("q_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("qty_cap"))
        .select(F.col("ps_suppkey").alias("k_suppkey"))
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    return (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("k_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
