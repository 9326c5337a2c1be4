"""Aggregate-surface extensions (SURVEY §2.4 / §2.8-json).

Flink 1.19 built-in aggregate functions beyond the std/collect tier:
``JSON_OBJECTAGG`` / ``JSON_ARRAYAGG`` (SQL:2016 JSON aggregates, in the
1.19 function catalog) and ``ARRAY_AGG`` (added 1.18) — all expressed as
compositions of Spark collect aggregates + ``to_json``; plus the
engine-portable Bloom membership sketch (operators/sketches.py), the
runtime-filter/dedup-prefilter sibling of the portable HLL.

JSON aggregates are order-sensitive in SQL but Flink's emission order is
arrival order (nondeterministic under parallelism), so both engines here
pin a deterministic ORDER BY — the same normalization any distributed
engine must apply for a reproducible JSON aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketches
from ..registry import register
from ..tables import load_table


@register(
    "a13_jsonagg_family",
    oracle="""
    WITH per AS (
      SELECT o_orderstatus, o_orderpriority AS k, COUNT(*) AS v
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus,
           '{' || string_agg('"' || k || '":' || CAST(v AS VARCHAR), ','
                             ORDER BY k) || '}' AS obj_json,
           '[' || string_agg(CAST(v AS VARCHAR), ',' ORDER BY v) || ']'
             AS arr_json,
           array_to_string(list_sort(array_agg(k)), ',') AS prio_arr,
           CAST(COUNT(*) AS BIGINT) AS n_groups
    FROM per
    GROUP BY o_orderstatus
    """,
    survey="A5 A8 2.8-json",
)
def a13_jsonagg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_OBJECTAGG(k VALUE v) / JSON_ARRAYAGG(v) / ARRAY_AGG(k):
    per-status priority histograms rendered as JSON objects, JSON arrays
    and typed arrays. Spark shape: the inner (status, priority) count is
    one partial+final agg; the outer collect aggregates see ≤ |priorities|
    rows per group, so the collected state is bounded — the same two-level
    shape a 100 TB JSON_OBJECTAGG needs (never collect raw rows)."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("v")
    )
    return per.groupBy("o_orderstatus").agg(
        F.to_json(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("o_orderpriority").alias("k"),
                            F.col("v").alias("v"),
                        )
                    )
                )
            )
        ).alias("obj_json"),
        F.to_json(F.array_sort(F.collect_list("v"))).alias("arr_json"),
        F.array_join(F.array_sort(F.collect_list("o_orderpriority")), ",").alias(
            "prio_arr"
        ),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    )


_BLOOM_M, _BLOOM_K = 4096, 3


def _bloom_oracle() -> str:
    m, k = _BLOOM_M, _BLOOM_K
    build = ", ".join(sketches._bloom_pos_duck("x", i, m) for i in range(k))
    return f"""
    WITH src AS (SELECT DISTINCT o_custkey AS x FROM orders),
    bits AS (
      SELECT DISTINCT bit FROM (SELECT UNNEST([{build}]) AS bit FROM src)
    ),
    probe AS (SELECT DISTINCT c_custkey AS x FROM customer),
    ppos AS (
      SELECT DISTINCT x, bit
      FROM (SELECT x, UNNEST([{build}]) AS bit FROM probe)
    ),
    memb AS (
      SELECT p.x, COUNT(*) AS n_pos, COUNT(b.bit) AS n_hit
      FROM ppos p LEFT JOIN bits b ON p.bit = b.bit
      GROUP BY p.x
    ),
    verdicts AS (
      SELECT x, n_hit = n_pos AS member,
             x IN (SELECT x FROM src) AS true_member
      FROM memb
    )
    SELECT {m} AS m,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_set_bits,
           CAST(COUNT(*) AS BIGINT) AS n_probed,
           CAST(SUM(CASE WHEN true_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_members,
           CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_positive,
           CAST(SUM(CASE WHEN true_member AND NOT member THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_negative
    FROM verdicts
    """


@register("a14_bloom_portable", oracle=_bloom_oracle(), survey="A9 N1")
def a14_bloom_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable Bloom filter (operators/sketches.py): build the
    bit set over the custkeys that placed orders, probe with every
    customer. The bit positions are md5-derived on both engines, so the
    per-key membership VERDICTS (not just counts) are identical — the
    driver hash certifies n_bloom_positive exactly, including the sketch's
    false positives. n_false_negative is structurally 0 (the Bloom
    guarantee); the oracle pins that too. At 100 TB this is the broadcast
    pre-filter for have-we-seen-this-key dedup: ≤ m rows shuffle during
    the build, probes never shuffle."""
    m, k = _BLOOM_M, _BLOOM_K
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    bits = sketches.bloom_bits(o, "o_custkey", m=m, k=k)
    verdicts = sketches.bloom_probe(c, "c_custkey", bits, m=m, k=k)
    true_members = o.select(F.col("o_custkey").alias("key")).distinct().withColumn(
        "_t", F.lit(1)
    )
    v = verdicts.join(F.broadcast(true_members), "key", "left").select(
        "member", F.col("_t").isNotNull().alias("true_member")
    )
    n_set = bits.agg(F.count(F.lit(1)).cast("long").alias("n_set_bits"))
    agg = v.agg(
        F.lit(m).alias("m"),
        F.count(F.lit(1)).cast("long").alias("n_probed"),
        F.sum(F.when(F.col("true_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_true_members"),
        F.sum(F.when(F.col("member"), 1).otherwise(0))
        .cast("long")
        .alias("n_bloom_positive"),
        F.sum(F.when(F.col("true_member") & ~F.col("member"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_negative"),
    )
    return agg.crossJoin(n_set)


@register(
    "a15_agg_filter",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
             AS n_urgent,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                FILTER (WHERE o_totalprice > 100000) AS DOUBLE) AS big_total,
           CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice < 50000)
                AS BIGINT) AS n_cust_small
    FROM orders
    GROUP BY o_orderstatus
    """,
    survey="A5 A3",
)
def a15_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER clause (Flink `agg FILTER (WHERE ...)` [docs:
    queries/group-agg]): per-group conditional aggregates — including a
    filtered DISTINCT — in ONE pass, the planner's alternative to N
    self-joined subqueries. Same single partial+final agg shape; the
    filter predicates evaluate map-side inside codegen."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("a15_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                    FILTER (WHERE o_totalprice > 100000) AS DOUBLE) AS big_total,
               COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice < 50000)
                 AS n_cust_small
        FROM a15_orders
        GROUP BY o_orderstatus
        """
    )
