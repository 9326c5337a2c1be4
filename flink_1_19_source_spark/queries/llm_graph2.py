"""X8/N3 — label-propagation community detection over the mutual-kNN
similarity graph [Raghavan et al. 2007, "Near linear time algorithm to
detect community structures in large-scale networks"].

Communities over embedding neighborhoods are the cluster lens the
SemDeDup / D4 selection tier consumes; LPA is the classic
shuffle-friendly way to get them without a global objective.  The
SYNCHRONOUS variant with a deterministic tie-break (neighbor-label
frequency desc, then smallest label) makes every round a pure
relational pass — one hash shuffle on the neighbor key, one (node,
label) count, one per-node rank window — so both engines replay the
exact same fixed number of rounds and the result is value-hashable.

Graph construction is the certified x8_knn_triangles contract verbatim
(quantized int64 top-5, mutualized, canonical a<b) through the SAME
shared operators (graph_ann.quantized / cross_topm), so the two graph
analytics cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import graph_ann
from ..registry import register
from ..tables import load_table

_LPA_ROUNDS = 4

#: the x8_knn_triangles edge contract, verbatim (quantized top-5, mutual)
_EDGES_SQL = f"""
    qz AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * {graph_ann.SCALE})
                    AS BIGINT)) AS qv
      FROM embeddings
    ), nz AS (
      SELECT vec_id, qv,
             CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS nq
      FROM qz
    ), topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY CAST(list_sum(list_transform(range(1, 65),
                            i -> a.qv[i] * b.qv[i])) AS DOUBLE)
                          / SQRT(CAST(a.nq AS DOUBLE)
                                 * CAST(b.nq AS DOUBLE)) DESC,
                          b.vec_id) AS rk
        FROM nz a JOIN nz b ON a.vec_id <> b.vec_id
      ) WHERE rk <= 5
    ), mutual AS (
      SELECT query_id, neighbor_id FROM topk
      INTERSECT
      SELECT neighbor_id, query_id FROM topk
    ), und AS MATERIALIZED (
      SELECT query_id AS u, neighbor_id AS v FROM mutual
    )"""


def _lpa_oracle(rounds: int = _LPA_ROUNDS) -> str:
    parts = [
        "WITH ",
        _EDGES_SQL,
        """
    , l0 AS (SELECT vec_id AS node, vec_id AS lab FROM embeddings)""",
    ]
    for k in range(1, rounds + 1):
        parts.append(f"""
    , r{k} AS (
      SELECT u, lab FROM (
        SELECT e.u, l.lab, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY e.u
                 ORDER BY COUNT(*) DESC, l.lab) AS rk
        FROM und e JOIN l{k - 1} l ON l.node = e.v
        GROUP BY e.u, l.lab
      ) WHERE rk = 1
    ), l{k} AS MATERIALIZED (
      SELECT p.node, COALESCE(r.lab, p.lab) AS lab
      FROM l{k - 1} p LEFT JOIN r{k} r ON r.u = p.node
    )""")
    parts.append(f"""
    SELECT l.node AS node_id, l.lab AS community,
           CAST(c.sz AS BIGINT) AS community_size
    FROM l{rounds} l
    JOIN (SELECT lab, COUNT(*) AS sz FROM l{rounds} GROUP BY lab) c
      ON c.lab = l.lab
    """)
    return "".join(parts)


@register("x8_label_propagation", oracle=_lpa_oracle(), survey="X8 N3")
def x8_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous LPA over the mutual-kNN graph: every node starts as
    its own label; each of 4 rounds relabels every node to its
    neighbors' most frequent label (ties -> smallest), isolated nodes
    keeping their own.  Output: (node_id, community, community_size).

    100 TB shape: the graph comes from the certified ANN tier (here the
    distributed block-pair build — no driver collect); each LPA round
    is one neighbor-keyed shuffle + one (node, label) count + one rank
    window PARTITIONED BY node — never a global window — and the round
    count is fixed, so total cost is rounds x O(|E|) with map-side
    combine on the label counts.  The synchronous schedule (not the
    paper's asynchronous sweep) is what makes the rounds replayable as
    unrolled relational stages on both engines."""
    e = load_table(spark, sf_dir, "embeddings")
    nodes = graph_ann.quantized(e, "vec_id", "embedding").localCheckpoint(
        eager=True
    )
    topk = graph_ann.cross_topm(nodes, nodes, m=5).select(
        F.col("src").alias("query_id"), F.col("dst").alias("neighbor_id")
    )
    mutual = topk.intersect(
        topk.select(
            F.col("neighbor_id").alias("query_id"),
            F.col("query_id").alias("neighbor_id"),
        )
    )
    und = mutual.select(
        F.col("query_id").alias("u"), F.col("neighbor_id").alias("v")
    ).localCheckpoint(eager=True)

    labels = e.select(
        F.col("vec_id").alias("node"), F.col("vec_id").alias("lab")
    )
    w = Window.partitionBy("u").orderBy(F.desc("cnt"), "lab")
    for k in range(_LPA_ROUNDS):
        pick = (
            und.join(labels, und.v == labels.node)
            .groupBy("u", "lab")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("u").alias("node"), F.col("lab").alias("new_lab"))
        )
        labels = (
            labels.join(pick, "node", "left")
            .select(
                "node",
                F.coalesce("new_lab", "lab").alias("lab"),
            )
        )
        if (k + 1) % 2 == 0:
            labels = labels.localCheckpoint(eager=True)
    sizes = labels.groupBy("lab").agg(F.count(F.lit(1)).alias("sz"))
    return labels.join(sizes, "lab").select(
        F.col("node").alias("node_id"),
        F.col("lab").alias("community"),
        F.col("sz").cast("long").alias("community_size"),
    )


# --------------------------------------------------------------------------
# X8 — weighted single-source shortest paths (Bellman-Ford) on the graph
# --------------------------------------------------------------------------
_SSSP_ROUNDS = 6
_SSSP_INF = 1_000_000_000  # unreachable sentinel (> rounds * max weight)


def _sssp_oracle(rounds: int = _SSSP_ROUNDS) -> str:
    parts = [f"""
    WITH qz AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * {graph_ann.SCALE})
                    AS BIGINT)) AS qv
      FROM embeddings
    ), nz AS (
      SELECT vec_id, qv,
             CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS nq
      FROM qz
    ), wtopk AS MATERIALIZED (
      SELECT query_id, neighbor_id, rk FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY CAST(list_sum(list_transform(range(1, 65),
                            i -> a.qv[i] * b.qv[i])) AS DOUBLE)
                          / SQRT(CAST(a.nq AS DOUBLE)
                                 * CAST(b.nq AS DOUBLE)) DESC,
                          b.vec_id) AS rk
        FROM nz a JOIN nz b ON a.vec_id <> b.vec_id
      ) WHERE rk <= 5
    ), wedges AS MATERIALIZED (
      SELECT t1.query_id AS u, t1.neighbor_id AS v,
             CAST(t1.rk + t2.rk AS BIGINT) AS w
      FROM wtopk t1
      JOIN wtopk t2 ON t2.query_id = t1.neighbor_id
                   AND t2.neighbor_id = t1.query_id
    ), d0 AS (
      SELECT vec_id AS node,
             CAST(CASE WHEN vec_id = 0 THEN 0
                       ELSE {_SSSP_INF} END AS BIGINT) AS dist
      FROM embeddings
    )"""]
    for k in range(1, rounds + 1):
        parts.append(f"""
    , d{k} AS MATERIALIZED (
      SELECT p.node, LEAST(p.dist, COALESCE(m.nd, p.dist)) AS dist
      FROM d{k - 1} p LEFT JOIN (
        SELECT e.v AS node, MIN(d.dist + e.w) AS nd
        FROM wedges e JOIN d{k - 1} d ON d.node = e.u
        WHERE d.dist < {_SSSP_INF}
        GROUP BY e.v
      ) m ON m.node = p.node
    )""")
    parts.append(f"""
    SELECT node AS node_id,
           CASE WHEN dist < {_SSSP_INF} THEN dist END AS dist_w,
           (dist < {_SSSP_INF}) AS reached
    FROM d{rounds}
    """)
    return "".join(parts)


@register("x8_sssp_weighted", oracle=_sssp_oracle(), survey="X8 N3")
def x8_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths over the mutual-kNN graph:
    Bellman-Ford with 6 unrolled relaxation rounds from vec_id 0 —
    the weighted companion to x8_iterate_bfs's hop counts.  Edge
    weights are EXACT integers derivable on both engines: the sum of
    the two directed top-5 ranks (a mutually-1st pair costs 2, a
    barely-mutual pair costs 10), so relaxation arithmetic never
    touches a float.  Each round is one edge-keyed shuffle join + one
    min-aggregate + one left join back — the x8 bounded-loop shape;
    at 100 TB rounds cost O(|E|) each with map-side combine on the
    per-node MIN, and the frontier filter (dist < INF) keeps early
    rounds sparse."""
    e = load_table(spark, sf_dir, "embeddings")
    nodes = graph_ann.quantized(e, "vec_id", "embedding").localCheckpoint(
        eager=True
    )
    topk = graph_ann.cross_topm(nodes, nodes, m=5)
    wr = Window.partitionBy("src").orderBy(F.desc("sim"), "dst")
    ranked = topk.select(
        "src", "dst", F.row_number().over(wr).alias("rk")
    )
    t2 = ranked.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        F.col("rk").alias("rk2"),
    )
    wedges = (
        ranked.join(t2, ["src", "dst"])
        .select(
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            (F.col("rk") + F.col("rk2")).cast("long").alias("w"),
        )
        .localCheckpoint(eager=True)
    )
    dist = e.select(
        F.col("vec_id").alias("node"),
        F.when(F.col("vec_id") == 0, F.lit(0))
        .otherwise(F.lit(_SSSP_INF))
        .cast("long")
        .alias("dist"),
    )
    for k in range(_SSSP_ROUNDS):
        relaxed = (
            wedges.join(
                dist.filter(F.col("dist") < _SSSP_INF).withColumnRenamed(
                    "node", "u"
                ),
                "u",
            )
            .groupBy(F.col("v").alias("node"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("nd"))
        )
        dist = (
            dist.join(relaxed, "node", "left")
            .select(
                "node",
                F.least(
                    "dist", F.coalesce("nd", "dist")
                ).alias("dist"),
            )
        )
        if (k + 1) % 2 == 0:
            dist = dist.localCheckpoint(eager=True)
    return dist.select(
        F.col("node").alias("node_id"),
        F.when(F.col("dist") < _SSSP_INF, F.col("dist")).alias("dist_w"),
        (F.col("dist") < _SSSP_INF).alias("reached"),
    )
