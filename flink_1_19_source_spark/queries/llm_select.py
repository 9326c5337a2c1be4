"""N2/N3/N6 — embedding-space DATA SELECTION (SURVEY §2.11).

D4 [Tirumala et al. 2023]: the selection recipe that follows SemDeDup
with prototype pruning — after semantic near-duplicates are removed,
the points most prototypical of their cluster (closest to the centroid)
carry the least marginal information and are pruned too, leaving a
deduplicated AND diversified corpus.  Built on the certified
similarity cores (same codebook convention as IVF / SemDeDup), fully
DuckDB-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity
from ..registry import register
from ..tables import load_table


@register(
    "n6_d4_selection",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE vec_id < 600
    ), vn AS (
      SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm FROM v
    ), cn AS (
      SELECT vec_id AS cid, e AS ce, SQRT(list_dot_product(e, e)) AS cnrm
      FROM v WHERE vec_id < 8
    ), assign AS (
      SELECT vn.vec_id, cn.cid,
             ROUND(list_dot_product(vn.e, cn.ce) / (vn.nrm * cn.cnrm), 9)
               AS cosr,
             ROW_NUMBER() OVER (PARTITION BY vn.vec_id
               ORDER BY list_dot_product(vn.e, cn.ce) / (vn.nrm * cn.cnrm)
                        DESC, cn.cid) AS rk
      FROM vn CROSS JOIN cn
    ), mem AS (
      SELECT vec_id, cid AS cluster, cosr AS cos_centroid
      FROM assign WHERE rk = 1
    ), dropped AS (
      SELECT DISTINCT b.vec_id
      FROM mem a JOIN mem b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      JOIN vn va ON va.vec_id = a.vec_id
      JOIN vn vb ON vb.vec_id = b.vec_id
      WHERE ROUND(list_dot_product(va.e, vb.e) / (va.nrm * vb.nrm), 9) >= 0.3
    ), surv AS (
      SELECT m.* FROM mem m LEFT JOIN dropped d ON d.vec_id = m.vec_id
      WHERE d.vec_id IS NULL
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
                 ORDER BY cos_centroid DESC, vec_id) AS prk,
             COUNT(*) OVER (PARTITION BY cluster) AS nc
      FROM surv
    )
    SELECT vec_id, CAST(cluster AS INTEGER) AS cluster, cos_centroid,
           CASE WHEN prk <= nc // 4 THEN 'proto_pruned'
                ELSE 'selected' END AS stage
    FROM ranked
    UNION ALL
    SELECT m.vec_id, CAST(m.cluster AS INTEGER) AS cluster,
           m.cos_centroid, 'dedup_dropped' AS stage
    FROM mem m JOIN dropped d ON d.vec_id = m.vec_id
    """,
    survey="N2 N3 N6",
)
def n6_d4_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 data selection [Tirumala et al. 2023: SemDeDup, then prune
    the most PROTOTYPICAL survivors — the points nearest their cluster
    centroid add the least diversity to a pretraining mix].  Every
    document's disposition is a row: ``dedup_dropped`` (a lower-id
    cluster-mate covers it at >= 0.3 cosine — the same greedy rule as
    the certified n2_semantic_dedup), ``proto_pruned`` (top floor(n/4)
    of survivors by cosine-to-centroid within the cluster), or
    ``selected``.  Codebook = the first 8 corpus vectors (the fixture
    convention the oracle rebuilds from data).  One cluster-keyed pair
    join plus one rank window per cluster; at 100 TB the cluster id is
    the partition key (the IVF layout) and the centroid table is a
    broadcast."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 600)
    cent_rows = (
        e.filter(F.col("vec_id") < 8)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    centroids = np.array([r.embedding for r in cent_rows], dtype=float)
    return similarity.d4_selection(
        spark, e, centroids, dedup_threshold=0.3, prune_num=1, prune_den=4
    )
