"""K-means over an embedding column — iterative ML as engine queries
(SURVEY §2.9 X8 pattern + §2.11 N3).

Lloyd's algorithm with a fixed round count and deterministic, engine-
portable arithmetic, so the whole fit is *oracle-able*: a DuckDB SQL
unrolling of the same rounds produces bit-identical centroids. The
determinism recipe (the same one functions/exact.py uses for money):

* inputs quantized once: each coordinate ROUND(x, 6) at load;
* squared-distance terms ROUND(·, 6), then summed EXACTLY.  The sum is
  carried as int64 micro-units (term × 10⁶ — exact, because a
  6-decimal value v has v·10⁶ within 2⁻⁴⁰ of an integer, so the
  HALF_UP round recovers it bit-for-bit), which is the same exact
  rational total a DECIMAL(27,6) sum represents — associative,
  commutative, partitioning-independent — but aggregates as a codegen
  primitive long instead of a Decimal128 buffer (measured 1.8× on the
  corpus assignment; the r12 optimization round's rewrite, results
  pinned identical);
* argmin by ROW_NUMBER ordered (dist, cluster) — ties break by id.
  Ordering by the micro-unit total equals ordering by the decimal
  total cast to DOUBLE: totals differing by ≥ 1 micro-unit (10⁻⁶) are
  15 orders of magnitude above ulp at these magnitudes, so the double
  cast never collapses two distinct totals;
* centroid update = exact sum (int64 micro-units) / count, ROUND(·, 9):
  fl(micros)/10⁶ is the correctly-rounded double of the exact rational
  sum — the same double DECIMAL(27,6)→DOUBLE produces.

Layout: the *long* relational form (vec_id, dim, x) rather than arrays.
That is deliberate for this operator: it keeps every step a plain
join/groupBy both engines execute identically. At 100 TB the assignment
step would instead broadcast the K×D centroid matrix into an
Arrow-batched ``mapInPandas`` (one BLAS matmul per batch, no explode —
the operators/similarity.py IVF path already does exactly this); the
update step stays the same groupBy. The long form here is the
*verifier* for that production path, the same exact-vs-approximate
pairing the dedup suite uses.

Scale shape per round: one broadcast join (centroids are K×D rows),
one (vec, cluster) shuffle for distances, one (cluster, dim) shuffle
for the update; ``localCheckpoint`` after each round keeps the plan
O(1) deep (the iterative-Spark lineage trap, as operators/iterate.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: micro-unit scale: a ROUND(·, 6) double times 10⁶ rounds HALF_UP to
#: the exact integer numerator of the 6-decimal value (relative double
#: error ~2⁻⁵² puts the product within ~10⁻⁸ of that integer at these
#: magnitudes — far inside the 0.5 rounding radius)
_MICRO = 1_000_000.0


def assign_topn(corpus: DataFrame, cent: DataFrame, n: int) -> DataFrame:
    """The ``n`` nearest centroids per vector (quantized-exact squared L2,
    ties to the lower cluster id): n=1 is Lloyd assignment, n>1 is the
    IVF probe set. Returns (vec_id, cluster, rn).

    The per-term ROUND((x-c)², 6) is unchanged; the exact sum rides
    int64 micro-units instead of DECIMAL(27,6) (see module docstring —
    same total, same order, long-typed partial aggregation)."""
    sq = F.round(
        (F.col("x") - F.col("c")) * (F.col("x") - F.col("c")), 6
    )
    term_m = F.round(sq * F.lit(_MICRO), 0).cast("long")
    dist = (
        corpus.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "cluster")
        .agg(F.sum(term_m).alias("dist_m"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist_m", "cluster")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select("vec_id", "cluster", "rn")
    )


def _assign(corpus: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest centroid per vector (Lloyd assignment step)."""
    return assign_topn(corpus, cent, 1).select("vec_id", "cluster")


def _update(corpus: DataFrame, asg: DataFrame) -> DataFrame:
    """New centroid = exact mean per (cluster, dim), round 9.  The exact
    coordinate sum rides int64 micro-units; fl(Σ)/10⁶ is the identical
    correctly-rounded double the DECIMAL(27,6) sum cast produced."""
    xm = F.round(F.col("x") * F.lit(_MICRO), 0).cast("long")
    return (
        asg.join(corpus, "vec_id")
        .groupBy("cluster", "dim")
        .agg(
            F.round(
                (F.sum(xm).cast("double") / F.lit(_MICRO))
                / F.count(F.lit(1)), 9
            ).alias("c")
        )
    )


def kmeans_long(corpus_long: DataFrame, k: int, rounds: int) -> DataFrame:
    """Fit k-means on (vec_id, dim, x) long-form vectors; returns one row
    per (cluster, dim): centroid coordinate + final cluster size.

    Init = the first ``k`` vec_ids as centroids (deterministic seed).
    A cluster that loses all members simply drops out (both engines
    apply the same rule).
    """
    corpus = corpus_long.localCheckpoint(eager=True)
    # centroids are K×D rows — keep them on one partition so the
    # per-round checkpoint + broadcast don't pay 32-task overhead
    cent = (
        corpus.filter(F.col("vec_id") < k)
        .select(F.col("vec_id").alias("cluster"), "dim", F.col("x").alias("c"))
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    # one eager materialization per round (the new centroids), not two:
    # the assignment's only intra-round consumer is the centroid update,
    # so it stays INSIDE the round's single job — lineage is still cut
    # every round by the cent checkpoint (corpus and cent are both
    # checkpoint roots, so the per-round plan is O(1) deep).  Only the
    # LAST round's assignment is materialized, because cluster sizes
    # and the caller's assignment reads hang off it.
    asg = None
    for r in range(rounds):
        asg = _assign(corpus, cent)
        if r == rounds - 1:
            asg = asg.localCheckpoint(eager=True)
        cent = _update(corpus, asg).coalesce(1).localCheckpoint(eager=True)
    sizes = asg.groupBy("cluster").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cent.join(sizes, "cluster").select(
        "cluster", "dim", F.col("c").alias("centroid"), "cluster_size"
    )


def kmeans_cte_sql(k: int, rounds: int, dims: int = 64,
                   sample: int | None = None) -> str:
    """The DuckDB CTE chain unrolling the fit (``WITH corpus …,
    cent{rounds} …``) — exposed so composed oracles (e.g. the trained-
    codebook IVF) can build on the identical centroids.  ``sample``
    caps the TRAINING set to the first N vec_ids (the offline-fit-on-a-
    sample convention: the fit rounds run over ``fitc``, downstream
    assignment CTEs still see the full ``corpus``)."""
    where = f"WHERE vec_id < {sample}" if sample is not None else ""
    parts = [
        f"""
    WITH corpus AS (
      SELECT vec_id, i AS dim,
             ROUND(CAST(embedding[i + 1] AS DOUBLE), 6) AS x
      FROM embeddings, range({dims}) t(i)
    ), fitc AS (
      SELECT * FROM corpus {where}
    ), cent0 AS (
      SELECT vec_id AS cluster, dim, x AS c FROM fitc WHERE vec_id < {k}
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""
    , dist{r} AS (
      SELECT fitc.vec_id, cent{r - 1}.cluster,
             CAST(SUM(CAST(ROUND((fitc.x - cent{r - 1}.c)
                                 * (fitc.x - cent{r - 1}.c), 6)
                           AS DECIMAL(27,6))) AS DOUBLE) AS dist
      FROM fitc JOIN cent{r - 1} ON fitc.dim = cent{r - 1}.dim
      GROUP BY 1, 2
    ), asg{r} AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cluster) AS rn
        FROM dist{r}
      ) WHERE rn = 1
    ), cent{r} AS (
      SELECT a.cluster, fitc.dim,
             ROUND(CAST(SUM(CAST(fitc.x AS DECIMAL(27,6))) AS DOUBLE)
                   / COUNT(*), 9) AS c
      FROM asg{r} a JOIN fitc ON fitc.vec_id = a.vec_id
      GROUP BY 1, 2
    )""")
    return "".join(parts)


def kmeans_oracle_sql(k: int, rounds: int, dims: int = 64) -> str:
    """The DuckDB unrolling of the identical computation — generated, so
    the round structure cannot drift from the engine's."""
    return kmeans_cte_sql(k, rounds, dims) + f"""
    SELECT c.cluster, c.dim, c.c AS centroid, sz.cluster_size
    FROM cent{rounds} c
    JOIN (SELECT cluster, COUNT(*) AS cluster_size
          FROM asg{rounds} GROUP BY 1) sz ON sz.cluster = c.cluster
    """


def assign_blas(vectors: DataFrame, centroids: list[list[float]],
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """The 100 TB assignment step: nearest centroid per vector with the
    K×D centroid matrix closed over into an Arrow-batched ``mapInPandas``
    — one BLAS distance matrix per batch, no explode, no shuffle (the
    corpus never moves; only (vec_id, cluster) comes out).

    This is the production twin of ``_assign``; tests assert the two
    agree on the same centroids (modulo exact ties, which the quantized
    path breaks by cluster id and BLAS by argmin order — identical here
    because numpy argmin also takes the lowest index)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    C = np.asarray(centroids, dtype=np.float64)          # K×D
    c_sq = (C * C).sum(axis=1)                           # K

    out_schema = StructType(
        [StructField(id_col, LongType()), StructField("cluster", LongType())]
    )

    def part(batches):
        for pdf in batches:
            X = np.vstack(pdf[vec_col].to_numpy())       # B×D
            # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row,
            # so argmin needs only the last two terms
            d = c_sq[None, :] - 2.0 * (X @ C.T)          # B×K
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(),
                 "cluster": d.argmin(axis=1).astype("int64")}
            )

    return vectors.select(id_col, vec_col).mapInPandas(part, out_schema)


def kmeans_cte_sql_subspace(
    prefix: str, k: int, rounds: int, dim_lo: int, dsub: int = 16,
    sample: int | None = None,
) -> str:
    """CTE chain fragment for k-means over ONE PQ subspace (embedding
    dims [dim_lo, dim_lo+dsub)) with all CTE names prefixed, so several
    subspace fits compose inside a single WITH (the trained-PQ oracle
    unrolls four of these).  ``sample`` caps the training set to the
    first N vec_ids — the offline-fit-on-a-sample convention that keeps
    codebook training O(sample), not O(corpus).  Starts with a leading
    comma — append after an opening ``WITH <something> AS (...)``."""
    where = f"WHERE vec_id < {sample}" if sample is not None else ""
    parts = [
        f"""
    , {prefix}corpus AS (
      SELECT vec_id, i AS dim,
             ROUND(CAST(embedding[i + 1 + {dim_lo}] AS DOUBLE), 6) AS x
      FROM embeddings, range({dsub}) t(i) {where}
    ), {prefix}cent0 AS (
      SELECT vec_id AS cluster, dim, x AS c
      FROM {prefix}corpus WHERE vec_id < {k}
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""
    , {prefix}dist{r} AS (
      SELECT {prefix}corpus.vec_id, {prefix}cent{r - 1}.cluster,
             CAST(SUM(CAST(ROUND(({prefix}corpus.x - {prefix}cent{r - 1}.c)
                                 * ({prefix}corpus.x - {prefix}cent{r - 1}.c),
                                 6) AS DECIMAL(27,6))) AS DOUBLE) AS dist
      FROM {prefix}corpus
      JOIN {prefix}cent{r - 1} ON {prefix}corpus.dim = {prefix}cent{r - 1}.dim
      GROUP BY 1, 2
    ), {prefix}asg{r} AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cluster) AS rn
        FROM {prefix}dist{r}
      ) WHERE rn = 1
    ), {prefix}cent{r} AS (
      SELECT a.cluster, {prefix}corpus.dim,
             ROUND(CAST(SUM(CAST({prefix}corpus.x AS DECIMAL(27,6)))
                        AS DOUBLE) / COUNT(*), 9) AS c
      FROM {prefix}asg{r} a
      JOIN {prefix}corpus ON {prefix}corpus.vec_id = a.vec_id
      GROUP BY 1, 2
    )""")
    return "".join(parts)
