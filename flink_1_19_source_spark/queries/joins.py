"""Join operators (SURVEY §2.3).

Flink locus: flink-table-runtime operators/join (hash, interval, temporal,
window joins) + planner join-strategy rules. On Spark, strategy selection
(broadcast / shuffle-hash / sort-merge / BNL) is Catalyst's + AQE's job;
we add explicit ``broadcast()`` hints where the engine knows a side is a
dimension table — at 100 TB that removes the fact-table shuffle entirely.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum, sql_dsum
from ..operators.asof_join import asof_join
from ..registry import register
from ..tables import load_table


@register(
    "j1_inner_equi",
    oracle=f"""
    SELECT n_name, COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    survey="J1 J9",
)
def j1_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain fact→dim→dim. Dims are broadcast (no shuffle
    of orders); at scale the only shuffle is the final 25-group agg."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """One-time build of the co-bucketed lineitem/orders tables (idempotent
    per session). Split out of the query so bench/CI can pre-build during
    warm-up — the table build is ETL, not the join being measured."""
    sfx = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    lt, ot = f"b_lineitem_{sfx}", f"b_orders_{sfx}"
    if not spark.catalog.tableExists(lt) or not spark.catalog.tableExists(ot):
        # the in-memory catalog forgets tables between sessions but their
        # warehouse directories persist — clear them or saveAsTable throws
        # LOCATION_ALREADY_EXISTS
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        for t in (lt, ot):
            shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable(lt)
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable(ot)
    return lt, ot



@register(
    "j_bucketed_colocated",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           {sql_dsum('l_extendedprice')} AS total
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    survey="J1 J9 §4-bucketing",
)
def j_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact⋈fact join via bucketing (§4 partitioning row;
    Flink: pre-partitioned inputs / DataStream partitionCustom). Both
    tables are written bucketed+sorted by the join key into the warehouse;
    the sort-merge join then reads bucket-for-bucket with ZERO exchanges
    and zero sorts — the strategy that makes a 100 TB fact⋈fact join
    feasible (shuffling either side would move the whole table). The MERGE
    hint keeps Catalyst from broadcasting the (test-scale-small) orders
    side so the bucketed path is what runs — and what
    tests/test_plans.py asserts shuffle-free."""
    lt, ot = ensure_bucketed_tables(spark, sf_dir)
    li, od = spark.table(lt), spark.table(ot).hint("merge")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice")).alias("total"),
        )
    )


@register(
    "j2_outer_joins",
    oracle=f"""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           COALESCE({sql_dsum('o_totalprice')}, 0.0) AS spent
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    """,
    survey="J2",
)
def j2_outer_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with null-padded aggregation (customers with zero
    orders kept, COUNT over a nullable column skips nulls)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum(F.col("o_totalprice")), F.lit(0.0)).alias("spent"),
        )
    )


@register(
    "j3_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    survey="J3",
)
def j3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join (Flink planner subquery rewrite)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "semi").select("c_custkey", "c_name")


@register(
    "j3_anti_join",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    survey="J3",
)
def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "j4_theta_join",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
    survey="J4",
)
def j4_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi part (region) + non-equi predicate (<). Catalyst
    hashes on the equi key and applies the residual — not a cross product."""
    n = load_table(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b"))


@register(
    "j5_interval_join",
    oracle="""
    SELECT s.user_id, s.event_id AS signup_id, p.event_id AS purchase_id,
           p.value AS purchase_value
    FROM events s JOIN events p
      ON s.user_id = p.user_id
     AND s.event_type = 'signup' AND p.event_type = 'purchase'
     AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL '30 minutes'
    """,
    survey="J5",
)
def j5_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (Flink intervalJoin / time-bounded SQL join): key
    equality + bounded time range. Same DataFrame shape works as a
    watermarked stream-stream join (streaming/ tests)."""
    e = load_table(spark, sf_dir, "events")
    s = e.filter(F.col("event_type") == "signup").alias("s")
    p = e.filter(F.col("event_type") == "purchase").alias("p")
    return s.join(
        p,
        (F.col("s.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("s.ts"))
        & (F.col("p.ts") <= F.col("s.ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        F.col("s.user_id").alias("user_id"),
        F.col("s.event_id").alias("signup_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.value").alias("purchase_value"),
    )


@register(
    "j6_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.value AS purchase_value,
           v.value AS last_view_value, v.ts AS last_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    survey="J6",
)
def j6_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal/as-of join via the union-tag + last_value operator
    (operators/asof_join.py). Oracle: DuckDB's native ASOF JOIN."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("value").alias("purchase_value"), "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("value").alias("last_view_value"),
        "ts",
        F.col("ts").alias("last_view_ts"),
    )
    out = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        right_values=["last_view_value", "last_view_ts"],
    )
    return out.select(
        "event_id", "user_id", "purchase_value", "last_view_value", "last_view_ts"
    )


@register(
    "j7_lookup_broadcast",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS n_items,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    survey="J7 J9",
)
def j7_lookup_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup join: per-row probe of a dimension snapshot → broadcast hash
    join (dimension ships to every executor; the 100 TB fact table never
    shuffles)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@register(
    "j8_window_join",
    oracle="""
    SELECT c.user_id, c.window_start, c.n_clicks, e.n_errors
    FROM (
        SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS window_start,
               COUNT(*) AS n_clicks
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, window_start
    ) c
    JOIN (
        SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS window_start,
               COUNT(*) AS n_errors
        FROM events WHERE event_type = 'error'
        GROUP BY user_id, window_start
    ) e ON c.user_id = e.user_id AND c.window_start = e.window_start
    """,
    survey="J8 W1",
)
def j8_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window join (Flink window TVF join): window both sides with the same
    tumble, then join on (key, window)."""
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")

    def per_type(event_type: str, out: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == event_type)
            .groupBy("user_id", win.alias("w"))
            .agg(F.count(F.lit(1)).alias(out))
            .select("user_id", F.col("w.start").alias("window_start"), out)
        )

    clicks = per_type("click", "n_clicks")
    errors = per_type("error", "n_errors")
    return clicks.join(errors, ["user_id", "window_start"])


@register(
    "j5b_interval_join_outer",
    oracle="""
    SELECT s.user_id, s.event_id AS signup_id,
           p.event_id AS purchase_id, p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON s.user_id = p.user_id
     AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL '30 minutes'
    """,
    survey="J5 J2",
)
def j5b_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER interval join (Flink SQL interval joins support
    LEFT/RIGHT/FULL [docs: queries/joins — interval joins]): signups with
    their in-window purchases, null-padded when no purchase landed in
    the 30-minute window — the unconverted-signup side that the inner
    variant (j5_interval_join) drops. Same equi-key + time-range shape;
    streaming twin = watermarked left stream-stream join (Spark supports
    outer stream-stream joins with watermarks on both sides)."""
    e = load_table(spark, sf_dir, "events")
    s = e.filter(F.col("event_type") == "signup").alias("s")
    p = e.filter(F.col("event_type") == "purchase").alias("p")
    return s.join(
        p,
        (F.col("s.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("s.ts"))
        & (F.col("p.ts") <= F.col("s.ts") + F.expr("INTERVAL 30 MINUTES")),
        "left",
    ).select(
        F.col("s.user_id").alias("user_id"),
        F.col("s.event_id").alias("signup_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.value").alias("purchase_value"),
    )


@register(
    "j4b_band_join",
    oracle="""
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           ROUND(ABS(a.value - b.value), 9) AS diff
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND ABS(a.value - b.value) < 1.0
    WHERE a.event_id < 3000 AND b.event_id < 3000
    """,
    survey="J4 J1",
)
def j4b_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join — the scale rewrite for |a.v − b.v| < ε theta joins: a
    naive non-equi join plans as a nested-loop (quadratic); bucketizing
    v by ε and equi-joining on (key, bucket) with the left side expanded
    to its 3 covering buckets turns it into an ordinary hash join whose
    fan-out is bounded by per-bucket density. The exact predicate
    re-filters candidates, so results equal the naive join (the oracle
    IS the naive join). tests/test_plans.py pins that no
    BroadcastNestedLoopJoin appears."""
    eps = 1.0
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    a = e.select(
        F.col("user_id"),
        F.col("event_id").alias("id_a"),
        F.col("value").alias("v_a"),
        F.explode(
            F.array(
                F.floor(F.col("value") / eps) - 1,
                F.floor(F.col("value") / eps),
                F.floor(F.col("value") / eps) + 1,
            )
        ).alias("bucket"),
    )
    b = e.select(
        F.col("user_id"),
        F.col("event_id").alias("id_b"),
        F.col("value").alias("v_b"),
        F.floor(F.col("value") / eps).alias("bucket"),
    )
    return (
        a.join(b, ["user_id", "bucket"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("v_a") - F.col("v_b")) < eps)
        )
        .select(
            "id_a",
            "id_b",
            F.round(F.abs(F.col("v_a") - F.col("v_b")), 9).alias("diff"),
        )
    )


@register(
    "j8b_window_join_outer",
    oracle="""
    SELECT l.event_id AS l_id, r.event_id AS r_id,
           time_bucket(INTERVAL '1 hour', l.ts) AS window_start
    FROM (SELECT * FROM events WHERE event_type = 'signup') l
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
      ON l.user_id = r.user_id
     AND time_bucket(INTERVAL '1 hour', l.ts)
         = time_bucket(INTERVAL '1 hour', r.ts)
    """,
    survey="J8 J2 W1",
)
def j8b_window_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER window join (Flink window-join supports all outer
    variants [docs: queries/window-join]): signups joined to same-user
    errors inside the SAME 1 h tumble, null-padded when the window holds
    no error — the signup-without-incident side an inner window join
    drops. Join key = (user, window struct): plain hash join, state/
    fan-out bounded per window."""
    e = load_table(spark, sf_dir, "events")
    l = (
        e.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.window("ts", "1 hour").alias("w"),
            F.col("event_id").alias("l_id"),
        )
        .alias("l")
    )
    r = (
        e.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("r_user"),
            F.window("ts", "1 hour").alias("rw"),
            F.col("event_id").alias("r_id"),
        )
        .alias("r")
    )
    return l.join(
        r, (F.col("user_id") == F.col("r_user")) & (F.col("w") == F.col("rw")), "left"
    ).select("l_id", "r_id", F.col("w.start").alias("window_start"))


@register(
    "j8c_window_join_full",
    oracle="""
    SELECT l.event_id AS l_id, r.event_id AS r_id,
           COALESCE(time_bucket(INTERVAL '1 hour', l.ts),
                    time_bucket(INTERVAL '1 hour', r.ts)) AS window_start
    FROM (SELECT * FROM events WHERE event_type = 'signup') l
    FULL OUTER JOIN (SELECT * FROM events WHERE event_type = 'error') r
      ON l.user_id = r.user_id
     AND time_bucket(INTERVAL '1 hour', l.ts)
         = time_bucket(INTERVAL '1 hour', r.ts)
    """,
    survey="J8 J2 W1",
)
def j8c_window_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER window join — the last of Flink's window-join variants
    [docs: queries/window-join]: signups x same-user errors inside the
    same 1 h tumble, null-padded on BOTH sides (signup-without-incident
    AND incident-without-signup windows survive).  Same (user, window
    struct) hash-join key as the inner/left variants; window_start
    coalesces across sides since either may be null-padded."""
    e = load_table(spark, sf_dir, "events")
    l = e.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("l_user"),
        F.window("ts", "1 hour").alias("lw"),
        F.col("event_id").alias("l_id"),
    )
    r = e.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("r_user"),
        F.window("ts", "1 hour").alias("rw"),
        F.col("event_id").alias("r_id"),
    )
    return l.join(
        r,
        (F.col("l_user") == F.col("r_user")) & (F.col("lw") == F.col("rw")),
        "full_outer",
    ).select(
        "l_id",
        "r_id",
        F.coalesce(F.col("lw.start"), F.col("rw.start")).alias("window_start"),
    )


@register(
    "j8d_hop_window_join",
    oracle="""
    WITH c AS (
      SELECT user_id, ws, COUNT(*) AS n_clicks FROM (
        SELECT user_id, UNNEST(generate_series(
            time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
            time_bucket(INTERVAL '30 minutes', ts),
            INTERVAL '30 minutes')) AS ws
        FROM events WHERE event_type = 'click')
      GROUP BY user_id, ws
    ), e AS (
      SELECT user_id, ws, COUNT(*) AS n_errors FROM (
        SELECT user_id, UNNEST(generate_series(
            time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
            time_bucket(INTERVAL '30 minutes', ts),
            INTERVAL '30 minutes')) AS ws
        FROM events WHERE event_type = 'error')
      GROUP BY user_id, ws
    )
    SELECT c.user_id, c.ws AS window_start, c.n_clicks, e.n_errors
    FROM c JOIN e ON c.user_id = e.user_id AND c.ws = e.ws
    """,
    survey="J8 W2",
)
def j8d_hop_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window join over HOP windows [docs: queries/window-join — works
    with TUMBLE, HOP and CUMULATE TVFs]: both sides are exploded to
    their 2 covering hop windows (size 1 h, slide 30 min), aggregated
    per (key, window), then equi-joined on (key, window_start) — the
    same hash-join shape as the tumble variant j8_window_join, with the
    2× row expansion happening map-side before the shuffle."""
    e = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "30 minutes")

    def per_type(event_type: str, out: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == event_type)
            .groupBy("user_id", win.alias("w"))
            .agg(F.count(F.lit(1)).alias(out))
            .select("user_id", F.col("w.start").alias("window_start"), out)
        )

    clicks = per_type("click", "n_clicks")
    errors = per_type("error", "n_errors")
    return clicks.join(errors, ["user_id", "window_start"])


@register(
    "j5c_interval_join_sym",
    oracle="""
    SELECT s.event_id AS signup_id, e.event_id AS error_id,
           CAST(date_diff('second', s.ts, e.ts) AS BIGINT) AS skew_s
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON s.user_id = e.user_id
     AND e.ts >= s.ts - INTERVAL '10 minutes'
     AND e.ts <= s.ts + INTERVAL '10 minutes'
    """,
    survey="J5",
)
def j5c_interval_join_sym(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join with a NEGATIVE lower bound [docs: queries/joins —
    `BETWEEN l.ts - INTERVAL x AND l.ts + INTERVAL y`]: errors within
    ±10 minutes of a signup, either side of it.  The signed second-skew
    measure pins that the pre-window half really joins (a [0, upper)
    implementation would silently drop every negative-skew row).  Same
    equi-key + band shape as j5; streaming state must retain BOTH sides
    for lower+upper, which is why the bound signs matter."""
    e = load_table(spark, sf_dir, "events")
    s = e.filter(F.col("event_type") == "signup").alias("s")
    r = e.filter(F.col("event_type") == "error").alias("e")
    return s.join(
        r,
        (F.col("s.user_id") == F.col("e.user_id"))
        & (F.col("e.ts") >= F.col("s.ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("e.ts") <= F.col("s.ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select(
        F.col("s.event_id").alias("signup_id"),
        F.col("e.event_id").alias("error_id"),
        (
            (F.unix_timestamp("e.ts") - F.unix_timestamp("s.ts"))
        ).cast("long").alias("skew_s"),
    )


@register(
    "j8e_cumulate_window_join",
    oracle="""
    WITH cw AS (
        SELECT user_id, event_type,
               time_bucket(INTERVAL '2 hours', ts) AS ws,
               time_bucket(INTERVAL '2 hours', ts)
                 + INTERVAL '30 minutes' * k AS we
        FROM events,
             (SELECT UNNEST(generate_series(1, 4)) AS k)
        WHERE ts < time_bucket(INTERVAL '2 hours', ts)
                   + INTERVAL '30 minutes' * k
    ), c AS (
        SELECT user_id, ws, we, COUNT(*) AS n_clicks
        FROM cw WHERE event_type = 'click' GROUP BY user_id, ws, we
    ), e AS (
        SELECT user_id, ws, we, COUNT(*) AS n_errors
        FROM cw WHERE event_type = 'error' GROUP BY user_id, ws, we
    )
    SELECT c.user_id, c.ws AS window_start, c.we AS window_end,
           c.n_clicks, e.n_errors
    FROM c JOIN e ON c.user_id = e.user_id AND c.ws = e.ws AND c.we = e.we
    """,
    survey="J8 W3",
)
def j8e_cumulate_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window join over CUMULATE windows [docs: queries/window-join —
    TUMBLE, HOP and CUMULATE TVFs] — completing the window-join TVF
    triad (tumble j8, hop j8d): both sides explode to their covering
    cumulate windows (step 30 min, max 2 h) through the same operator
    w3_cumulate certifies, aggregate per (key, window_start, window_end)
    — the growing windows make BOTH bounds part of the join key — then
    equi-join.  The ≤4x expansion happens map-side before the shuffle."""
    from ..operators.cumulate import cumulate as _cumulate

    e = load_table(spark, sf_dir, "events")

    def per_type(event_type: str, out: str) -> DataFrame:
        return (
            _cumulate(
                e.filter(F.col("event_type") == event_type),
                "ts", step="30 minutes", max_size="2 hours",
            )
            .groupBy("user_id", "window_start", "window_end")
            .agg(F.count(F.lit(1)).alias(out))
        )

    clicks = per_type("click", "n_clicks")
    errors = per_type("error", "n_errors")
    return clicks.join(errors, ["user_id", "window_start", "window_end"])
