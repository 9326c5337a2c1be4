"""Aggregation operators (SURVEY §2.4).

Flink locus: flink-table-runtime aggregate operators + planner rewrites
(two-stage agg, split-distinct). On Spark, hash aggregation is always
partial+final (map-side combine), so the only shuffle carries pre-combined
per-group rows — the property that keeps these plans viable at 100 TB.
Floating sums use the exact-decimal path (functions.exact) so results are
partitioning-invariant.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import compat
from ..functions.exact import (
    davg,
    dstddev_samp,
    dsum,
    dvar_samp,
    sql_davg,
    sql_dstddev_samp,
    sql_dsum,
    sql_dvar_samp,
)
from ..registry import register
from ..tables import load_table


@register(
    "a3_distinct_agg",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    survey="A3",
)
def a3_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-DISTINCT aggregate. Catalyst plans Expand + two-phase agg —
    the same shape as Flink's split-distinct rewrite, automatically."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "a4_grouping_sets",
    oracle=f"""
    SELECT n_name, o_orderstatus,
           GROUPING(n_name) AS g_nation, GROUPING(o_orderstatus) AS g_status,
           COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY CUBE (n_name, o_orderstatus)
    """,
    survey="A4 J1",
)
def a4_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING() indicators (Flink planner Expand)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return joined.cube("n_name", "o_orderstatus").agg(
        F.grouping("n_name").cast("long").alias("g_nation"),
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("total"),
    )


@register(
    "a5_std_aggregates",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
           {sql_dsum('l_extendedprice')} AS sum_price,
           {sql_davg('l_extendedprice')} AS avg_price,
           ROUND({sql_dvar_samp('l_quantity')}, 6) AS var_qty,
           ROUND({sql_dstddev_samp('l_quantity')}, 6) AS std_qty,
           MIN(l_linestatus) AS min_status, MAX(l_linestatus) AS max_status
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey="A1 A2 A5",
)
def a5_std_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard aggregate set; variance/stddev via exact decimal sums
    (partitioning-invariant, unlike streaming-merge moments)."""
    l = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(q).alias("min_qty"),
        F.max(q).alias("max_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_price"),
        davg(F.col("l_extendedprice")).alias("avg_price"),
        F.round(dvar_samp(q), 6).alias("var_qty"),
        F.round(dstddev_samp(q), 6).alias("std_qty"),
        F.min("l_linestatus").alias("min_status"),
        F.max("l_linestatus").alias("max_status"),
    )


@register(
    "a6_first_last_value",
    oracle=f"""
    SELECT user_id,
           ARG_MIN(event_type, event_id) AS first_event,
           ARG_MAX(event_type, event_id) AS last_event,
           ARG_MIN(value, event_id) AS first_value,
           ARG_MAX(value, event_id) AS last_value
    FROM events
    GROUP BY user_id
    """,
    survey="A6",
)
def a6_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE aggregates. Flink's are arrival-ordered
    (nondeterministic after shuffle); the engine anchors them to an explicit
    arrival key (event_id) via min_by/max_by so any partitioning gives the
    same answer — required for cluster determinism."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.min_by("event_type", "event_id").alias("first_event"),
        F.max_by("event_type", "event_id").alias("last_event"),
        F.min_by("value", "event_id").alias("first_value"),
        F.max_by("value", "event_id").alias("last_value"),
    )


@register(
    "a7_listagg",
    oracle="""
    SELECT n_regionkey,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
    survey="A7",
)
def a7_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG, deterministic (sorted) — see functions.compat.listagg."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(compat.listagg(F.col("n_name")).alias("nations"))


@register(
    "a8_collect_multiset",
    oracle="""
    SELECT o_orderstatus,
           STRING_AGG(pr || ':' || cnt, ',' ORDER BY pr) AS priority_multiset
    FROM (
        SELECT o_orderstatus, o_orderpriority AS pr, COUNT(*) AS cnt
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    )
    GROUP BY o_orderstatus
    """,
    survey="A8",
)
def a8_collect_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLECT → MULTISET (Flink's map elem→count), rendered canonically as
    a sorted 'elem:count' string (engine-portable representation).

    Two-level agg, not collect_list of raw rows: the heavy first level
    combines map-side, so no group ever materializes its full element list
    — the shape that survives 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    counted = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    entry = F.concat_ws(":", F.col("o_orderpriority"), F.col("cnt").cast("string"))
    return counted.groupBy("o_orderstatus").agg(
        F.array_join(F.array_sort(F.collect_list(entry)), ",").alias("priority_multiset")
    )


@register(
    "a9_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_orders_ok,
           TRUE AS approx_parts_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey="A9",
)
def a9_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROX_COUNT_DISTINCT (HLL++). The raw estimate is implementation-
    defined so it can never hash-match another engine; instead the hashed
    projection carries the *exact* distinct counts (oracle-comparable) plus
    booleans asserting the HLL estimate landed within 5% of exact — the
    oracle's side is a constant TRUE, so any estimator drift beyond the
    bound fails the driver hash. tests/test_properties.py additionally
    bounds the relative error tighter (rsd-scaled).

    Plan shape: two multi-DISTINCT aggregates in one agg would Expand the
    fact 4×; instead each exact count is a two-stage distinct (dedup on
    (flag, key) — partial map-side — then count per flag) and the approx
    sketches run in their own Expand-free agg, all joined on the tiny
    flag key. Three narrow scans beat one 4× multiplied scan at any
    scale. The scaffold-free estimate surface is a9c_hll_portable."""
    l = load_table(spark, sf_dir, "lineitem")

    def exact_distinct(key: str, alias: str) -> DataFrame:
        return (
            l.select("l_returnflag", key)
            .distinct()
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    approx = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("_ao"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("_ap"),
    )
    agg = (
        exact_distinct("l_orderkey", "exact_orders")
        .join(exact_distinct("l_partkey", "exact_parts"), "l_returnflag")
        .join(approx, "l_returnflag")
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= 0.05 * F.col(e)
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        within("_ao", "exact_orders").alias("approx_orders_ok"),
        within("_ap", "exact_parts").alias("approx_parts_ok"),
    )


def _a9c_oracle() -> str:
    from ..operators.sketches import hll_oracle_sql

    return hll_oracle_sql("lineitem", "l_orderkey", b=8)


@register(
    "a9c_hll_portable",
    oracle=_a9c_oracle(),
    survey="A9",
)
def a9c_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HyperLogLog (operators/sketches.py): unlike the
    built-in HLL++ (whose estimate is implementation-private), every
    register and the scaled harmonic sum are integer-exact and identical
    across engines, so the ESTIMATE ITSELF is value-hash-certified —
    DuckDB rebuilds the same 256 registers from the same md5-derived
    hashes and lands on the same 4-decimal estimate. Mergeable by
    register max — the 100 TB rollup property."""
    from ..operators.sketches import hll_distinct

    l = load_table(spark, sf_dir, "lineitem")
    return hll_distinct(l, "l_orderkey", b=8)


@register(
    "a11_udaf_median",
    oracle="""
    SELECT l_returnflag, MEDIAN(l_quantity) AS median_qty,
           MEDIAN(l_discount) AS median_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey="A11",
)
def a11_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate (Flink AggregateFunction) as an Arrow-batched
    pandas GROUPED_AGG UDF — the sanctioned Python-UDAF path (one Arrow
    transfer per group-partition, not per row)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        median_udaf("l_quantity").alias("median_qty"),
        median_udaf("l_discount").alias("median_disc"),
    )


@register(
    "a12_udtaf_top2",
    oracle="""
    SELECT o_orderstatus, o_orderkey, o_totalprice
    FROM (
        SELECT o_orderstatus, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn <= 2
    """,
    survey="A12",
)
def a12_udtaf_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table aggregate function (Flink TableAggregateFunction, e.g. Top2):
    group → N rows via applyInPandas (grouped-map)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", "o_totalprice"
    )

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(2)

    return o.groupBy("o_orderstatus").applyInPandas(top2, schema=o.schema)
