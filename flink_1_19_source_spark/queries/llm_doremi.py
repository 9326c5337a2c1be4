"""N6 — DoReMi-style domain reweighting (SURVEY §2.11).

Domain Reweighting with Minimax Optimization [Xie et al. 2023,
"DoReMi: Optimizing Data Mixtures Speeds Up Language Model
Pretraining"] re-derived for an exact SQL oracle: the Group-DRO
exponentiated-gradient loop that upweights domains whose PROXY loss
exceeds a per-domain REFERENCE loss, re-expressed in integer
arithmetic — per-token surprisal in whole bits (the house
bit_length floor-log2 device), per-round mean excess in millibits
(integer division), multiplicative weight updates in scaled int64
floor arithmetic, and the final mixture as largest-remainder
(Hare-quota) shares of 10^6.  No exp(), no float, no engine drift:
DuckDB replays every round bit-for-bit.

Model instantiation (all in-engine, nothing fitted offline): the
proxy is the corpus-wide unigram LM (what a uniform-mixture proxy
run converges to); the reference is each domain's OWN unigram LM
(the domain-specific reference model of the paper).  A domain the
generic model handles much worse than its own model carries high
excess loss and is upweighted — exactly the DoReMi signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..tables import load_table

_ROUNDS = 4
_ETA = 100          # millibit -> ppm step scale per round
_W_SCALE = 1_000_000
_PPM = 1_000_000


@register(
    "n6_doremi_weights",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, source, doc_id % 4 AS t,
             UNNEST(list_filter(string_split_regex(LOWER(text), '\s+'),
                                x -> x <> '')) AS w
      FROM documents
    ), cg AS (
      SELECT w, COUNT(*) AS c FROM toks GROUP BY w
    ), ng AS (
      SELECT SUM(c) AS n FROM cg
    ), cd AS (
      SELECT source, w, COUNT(*) AS c FROM toks GROUP BY source, w
    ), nd AS (
      SELECT source, SUM(c) AS n FROM cd GROUP BY source
    ), scored AS (
      SELECT tk.source, tk.t,
             GREATEST(0,
               (LENGTH(bin(ng.n // cg.c)) - 1)
               - (LENGTH(bin(nd.n // cd.c)) - 1)) AS excess
      FROM toks tk
      JOIN cg ON tk.w = cg.w
      JOIN cd ON tk.source = cd.source AND tk.w = cd.w
      JOIN nd ON tk.source = nd.source
      CROSS JOIN ng
    ), cell AS (
      SELECT source, t,
             (1000 * SUM(excess)) // COUNT(*) AS ex
      FROM scored GROUP BY source, t
    ), grid AS (
      SELECT s.source,
             COALESCE(MAX(CASE WHEN t = 0 THEN ex END), 0) AS e0,
             COALESCE(MAX(CASE WHEN t = 1 THEN ex END), 0) AS e1,
             COALESCE(MAX(CASE WHEN t = 2 THEN ex END), 0) AS e2,
             COALESCE(MAX(CASE WHEN t = 3 THEN ex END), 0) AS e3
      FROM (SELECT DISTINCT source FROM documents) s
      LEFT JOIN cell ON s.source = cell.source
      GROUP BY s.source
    ), wts AS (
      SELECT source, e0 + e1 + e2 + e3 AS excess_millibits,
             (((1000000
                * (1000000 + 100*e0) // 1000000)
                * (1000000 + 100*e1) // 1000000)
                * (1000000 + 100*e2) // 1000000)
                * (1000000 + 100*e3) // 1000000 AS w_final
      FROM grid
    ), tot AS (
      SELECT SUM(w_final) AS s FROM wts
    ), base AS (
      SELECT source, excess_millibits, w_final,
             (w_final * 1000000) // tot.s AS floor_ppm,
             (w_final * 1000000) % tot.s AS rem
      FROM wts CROSS JOIN tot
    ), short AS (
      SELECT 1000000 - SUM(floor_ppm) AS k FROM base
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
      FROM base
    )
    SELECT source,
           CAST(excess_millibits AS BIGINT) AS excess_millibits,
           CAST(w_final AS BIGINT) AS w_final,
           CAST(floor_ppm
                + CASE WHEN rk <= short.k THEN 1 ELSE 0 END
             AS BIGINT) AS alpha_ppm
    FROM ranked CROSS JOIN short
    """,
    survey="N6",
)
def n6_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi domain reweighting, exact-integer edition: per-token
    excess loss = max(0, proxy_bits - reference_bits) where
    proxy_bits = floor(log2(Ng/cg(w))) against the corpus-wide unigram
    LM and reference_bits the same against the token's own domain LM
    (both as bit_length(n//c) - 1, the exact floor-log2); four
    Group-DRO rounds each consume the round's batch (t = doc_id % 4 —
    the proxy's training order) and update the domain weight
    multiplicatively, w <- w * (10^6 + ETA*mean_excess_millibits) //
    10^6 in scaled int64 floor arithmetic (the integer stand-in for
    exp(eta*loss), exact to replay); the final mixture alpha is the
    largest-remainder share of 10^6 — the exact apportionment device
    the Hare-quota query certified.  100 TB shape: token counting is
    one token-keyed shuffle each for the global and per-domain LMs
    (vocabulary-sized outputs, co-partitioned scoring joins), the
    per-(domain, round) excess is one aggregate, and the weight
    recursion runs on a DOMAIN-sized frame — the loop never touches
    the corpus again."""
    from ..operators import text_analysis as ta

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        (F.col("doc_id") % 4).alias("t"),
        F.explode(ta.tokens(F.col("text"))).alias("w"),
    )
    cg = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cg"))
    ng = cg.agg(F.sum("cg").alias("ng"))
    cd = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("cd"))
    nd = cd.groupBy("source").agg(F.sum("cd").alias("nd"))

    bits = lambda n, c: (  # noqa: E731 — floor(log2(n/c)) exactly
        F.length(F.bin(F.expr(f"{n} div {c}"))) - F.lit(1)
    )
    scored = (
        toks.join(cg, "w")
        .join(cd, ["source", "w"])
        .join(F.broadcast(nd), "source")
        .crossJoin(F.broadcast(ng))
        .select(
            "source", "t",
            F.greatest(
                F.lit(0), bits("ng", "cg") - bits("nd", "cd")
            ).alias("excess"),
        )
    )
    cell = scored.groupBy("source", "t").agg(
        F.expr("(1000 * sum(excess)) div count(*)").alias("ex")
    )
    grid = (
        d.select("source").distinct()
        .join(cell, "source", "left")
        .groupBy("source")
        .agg(*[
            F.coalesce(
                F.max(F.when(F.col("t") == i, F.col("ex"))), F.lit(0)
            ).alias(f"e{i}")
            for i in range(_ROUNDS)
        ])
    )
    w_expr = str(_W_SCALE)
    for i in range(_ROUNDS):
        w_expr = f"(({w_expr}) * ({_W_SCALE} + {_ETA}*e{i}) div {_W_SCALE})"
    wts = grid.select(
        "source",
        sum(F.col(f"e{i}") for i in range(_ROUNDS))
        .cast("long").alias("excess_millibits"),
        F.expr(w_expr).cast("long").alias("w_final"),
    )
    tot = wts.agg(F.sum("w_final").alias("s"))
    base = wts.crossJoin(F.broadcast(tot)).select(
        "source", "excess_millibits", "w_final",
        F.expr(f"(w_final * {_PPM}) div s").alias("floor_ppm"),
        F.expr(f"(w_final * {_PPM}) % s").alias("rem"),
    )
    short = base.agg(
        (F.lit(_PPM) - F.sum("floor_ppm")).alias("k")
    )
    ranked = base.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.desc("rem"), "source")),
    )
    return ranked.crossJoin(F.broadcast(short)).select(
        "source",
        F.col("excess_millibits").cast("long"),
        F.col("w_final").cast("long"),
        (F.col("floor_ppm")
         + F.when(F.col("rk") <= F.col("k"), 1).otherwise(0))
        .cast("long").alias("alpha_ppm"),
    )
