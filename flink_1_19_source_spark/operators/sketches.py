"""Engine-portable HyperLogLog (SURVEY §2.2 A9) — a distinct-count sketch
whose every intermediate is integer-exact and identical across engines,
so the estimate itself is value-hash oracle-able (unlike the built-in
``approx_count_distinct``, whose HLL++ register layout is
implementation-private).

Construction (classic Flajolet HLL, b-bit bucketing):

- 60-bit hash: first 15 hex chars of md5 — the same expression runs in
  Spark (``conv(substring(md5(x),1,15),16,10)``) and DuckDB
  (``CAST('0x' || SUBSTRING(md5(x),1,15) AS BIGINT)``);
- register index = low ``b`` bits; rho = leftmost-1 position of the
  remaining ``F = 60 − b`` bit field, computed EXACTLY via the binary-
  string length (``length(bin(w))`` — no float log2 boundary hazard);
- the harmonic sum is kept as a scaled INTEGER: Σ 2^(F+1−M_j) with
  empty registers contributing 2^(F+1); ≤ m·2^(F+1) ≤ 2^61 fits a
  BIGINT, addition is associative, so any partitioning/order gives the
  same total on both engines;
- the only float ops are one multiply and one divide by exact values
  (identical IEEE results), plus the small-range linear-counting branch
  (m·ln(m/V) — ln may differ in the last ulp across libms, so the
  estimate is rounded to 4 decimals).

Scale shape: one narrow pass + a groupBy on the register index (≤ m rows
cross the shuffle); sketches for different partitions/days merge by
register max — the mergeable-rollup property that makes HLL the 100 TB
distinct-count workhorse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: HLL bias-correction constant for m ≥ 128 registers, embedded as the
#: SAME Python-repr literal in both engines' SQL.
def _alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(df: DataFrame, col: str, b: int = 8) -> DataFrame:
    """One-row DataFrame: (m, v_empty, estimate) for the approximate
    distinct count of ``col``. rsd ≈ 1.04/√m (b=8 → m=256 → ~6.5%)."""
    m = 1 << b
    fbits = 60 - b
    scale = 1 << (fbits + 1)
    h = f"CAST(conv(substring(md5(CAST({col} AS STRING)),1,15),16,10) AS BIGINT)"
    pre = df.select(
        F.expr(f"{h} & {m - 1}").alias("idx"),
        F.expr(f"shiftright({h}, {b})").alias("w"),
    ).select(
        "idx",
        F.when(F.col("w") == 0, F.lit(fbits + 1))
        .otherwise(F.lit(fbits) + 1 - F.length(F.expr("bin(w)")))
        .alias("rho"),
    )
    regs = pre.groupBy("idx").agg(F.max("rho").alias("mj"))
    agg = regs.agg(
        F.sum(F.expr(f"CAST(shiftleft(1L, {fbits} + 1 - mj) AS DECIMAL(38,0))")).alias(
            "sum_present"
        ),
        (F.lit(m) - F.count(F.lit(1))).alias("v_empty"),
    )
    total = (
        F.col("sum_present").cast("double")
        + F.col("v_empty").cast("double") * F.lit(float(scale))
    )
    e_raw = F.lit(_alpha(m) * m * m * scale) / total
    estimate = F.when(
        (e_raw <= 2.5 * m) & (F.col("v_empty") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_empty")),
    ).otherwise(e_raw)
    return agg.select(
        F.lit(m).alias("m"),
        F.col("v_empty").cast("long").alias("v_empty"),
        F.round(estimate, 4).alias("estimate"),
    )


def hll_oracle_sql(table: str, col: str, b: int = 8) -> str:
    """The DuckDB mirror — generated from the same constants so the two
    engines cannot drift."""
    m = 1 << b
    fbits = 60 - b
    scale = 1 << (fbits + 1)
    alpha_num = _alpha(m) * m * m * scale
    return f"""
    WITH pre AS (
      SELECT h & {m - 1} AS idx, h >> {b} AS w FROM (
        SELECT CAST(CONCAT('0x', SUBSTRING(md5(CAST({col} AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM {table}
      )
    ), rho AS (
      SELECT idx,
             CASE WHEN w = 0 THEN {fbits + 1}
                  ELSE {fbits} + 1 - LENGTH(bin(w)) END AS rho
      FROM pre
    ), regs AS (
      SELECT idx, MAX(rho) AS mj FROM rho GROUP BY idx
    ), agg AS (
      SELECT SUM(CAST((1::BIGINT << ({fbits} + 1 - mj)) AS DECIMAL(38,0)))
               AS sum_present,
             {m} - COUNT(*) AS v_empty
      FROM regs
    )
    SELECT {m} AS m,
           CAST(v_empty AS BIGINT) AS v_empty,
           ROUND(CASE WHEN ({alpha_num!r} / (CAST(sum_present AS DOUBLE)
                             + CAST(v_empty AS DOUBLE) * {float(scale)!r}))
                           <= {2.5 * m!r}
                      AND v_empty > 0
                      THEN {float(m)!r} * LN({float(m)!r} / v_empty)
                      ELSE {alpha_num!r} / (CAST(sum_present AS DOUBLE)
                             + CAST(v_empty AS DOUBLE) * {float(scale)!r})
                 END, 4) AS estimate
    FROM agg
    """


# ---------------------------------------------------------------------------
# Engine-portable Bloom filter — the membership-sketch sibling of the HLL
# above. Same portability trick: every bit position is derived from md5 on
# the key's string form, so Spark and DuckDB build the IDENTICAL bit set
# and the membership verdicts (not just the counts) hash-match.
#
# Scale shape: the filter itself is the DISTINCT set of set-bit indices —
# at most m rows cross the shuffle regardless of input size (partial agg
# caps each map task at m values), and the probe side joins against a
# broadcast of those ≤ m rows. Flink's runtime uses exactly this sketch
# for runtime filters in batch joins (flink-runtime BloomFilter); here it
# is also the 100 TB pre-filter for "have we seen this document/URL"
# dedup passes, mergeable across days by bit-set union.
# ---------------------------------------------------------------------------


def _bloom_pos_spark(col: str, i: int, m: int) -> str:
    return (
        f"CAST(conv(substring(md5(concat('{i}:', CAST({col} AS STRING))),1,8),"
        f"16,10) AS BIGINT) % {m}"
    )


def _bloom_pos_duck(col: str, i: int, m: int) -> str:
    return (
        f"CAST(CONCAT('0x', SUBSTRING(md5(CONCAT('{i}:', CAST({col} AS VARCHAR))),"
        f"1, 8)) AS BIGINT) % {m}"
    )


def bloom_bits(df: DataFrame, col: str, m: int = 4096, k: int = 3) -> DataFrame:
    """The filter: DISTINCT set-bit indices (≤ m rows) for ``col``."""
    pos = F.array(*[F.expr(_bloom_pos_spark(col, i, m)) for i in range(k)])
    return df.select(F.explode(pos).alias("bit")).distinct()


def bloom_probe(
    probe: DataFrame, col: str, bits: DataFrame, m: int = 4096, k: int = 3
) -> DataFrame:
    """Per-probe-row membership verdict: ``member`` is true iff every one
    of the key's k bit positions is set. No false negatives by
    construction; false positives bounded by (n_set/m)^k."""
    pos = F.array(*[F.expr(_bloom_pos_spark("key", i, m)) for i in range(k)])
    ppos = (
        probe.select(F.col(col).alias("key"))
        .distinct()
        .select("key", F.explode(F.array_distinct(pos)).alias("bit"))
    )
    hit = ppos.join(F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left")
    return (
        hit.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.count("_set").alias("n_hit"),
        )
        .select("key", (F.col("n_hit") == F.col("n_pos")).alias("member"))
    )


# -- bottom-k priority sample (mergeable quantile sketch) ------------------

def bottomk_priority(id_col: str = "event_id") -> F.Column:
    """The 60-bit md5 priority used by the bottom-k sample — identical in
    DuckDB as CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)),1,15))
    AS BIGINT), so oracles replay the exact sample."""
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")


def bottomk_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 200,
) -> DataFrame:
    """Per-group bottom-k rows by md5 priority — a MERGEABLE uniform
    sample: because membership is "the k smallest hashes", the bottom-k
    of a union equals the bottom-k of the parts' bottom-k's (union +
    re-select), making the sketch commutative and idempotent — the same
    algebra HLL registers obey, applied to quantile estimation.
    Deterministic: the hash is seeded by row identity, not RNG state.
    Scale: rank-limit plans prune to k rows per group map-side before
    the single shuffle."""
    from pyspark.sql import Window

    pri = bottomk_priority(id_col)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(group_col, value_col, F.col(id_col), pri.alias("__pri"))
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy(group_col).orderBy("__pri", id_col)
        ))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def bottomk_quantiles(
    sample: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.9),
) -> DataFrame:
    """Quantile estimates from a bottom-k sample: the element at index
    floor(q·(n−1)) of the value-sorted sample (nearest-rank, exact
    integer indexing — both engines compute the same double product and
    floor, so estimates hash-match)."""
    vs = F.array_sort(F.collect_list(value_col))
    agg = sample.groupBy(group_col).agg(
        vs.alias("__vs"), F.count(F.lit(1)).alias("n_sample")
    )
    cols = [F.col(group_col), F.col("n_sample").cast("long").alias("n_sample")]
    for q in quantiles:
        idx = (
            F.floor(F.lit(q) * (F.col("n_sample") - 1)).cast("int") + 1
        )
        cols.append(
            F.element_at("__vs", idx).alias(f"est_p{int(q * 100)}")
        )
    return agg.select(*cols)


# -- count-min sketch (mergeable frequency estimates) ----------------------

def _cms_pos_spark(col: str, d: int, w: int) -> str:
    return (
        f"CAST(conv(substring(md5(concat('cms{d}:', CAST({col} AS STRING)))"
        f",1,8),16,10) AS BIGINT) % {w}"
    )


def _cms_pos_duck(col: str, d: int, w: int) -> str:
    return (
        f"CAST(CONCAT('0x', SUBSTRING(md5(CONCAT('cms{d}:',"
        f" CAST({col} AS VARCHAR))), 1, 8)) AS BIGINT) % {w}"
    )


def cms_cells(df: DataFrame, col: str, w: int = 256, d: int = 4) -> DataFrame:
    """Count-min sketch [Cormode & Muthukrishnan 2005] as a relation:
    (depth, bucket, c) with ≤ d·w rows — each row hashes into one bucket
    per depth, cells count occurrences.  The sketch is MERGEABLE by
    cell-wise SUM (the property the streaming rollup twin exploits) and
    never under-estimates.  Same md5-portability trick as the Bloom/HLL
    sketches so DuckDB replays the identical cells."""
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("depth"),
                        F.expr(_cms_pos_spark(col, i, w)).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("p")
    )
    return rows.groupBy("p.depth", "p.bucket").agg(
        F.count(F.lit(1)).alias("c")
    )


def cms_estimate(
    probe: DataFrame, col: str, cells: DataFrame, w: int = 256, d: int = 4
) -> DataFrame:
    """Point-frequency estimate per probe key: min over depths of the
    key's cell — the count-min bound (est >= true, overestimate only
    from hash collisions).  The sketch broadcasts (≤ d·w rows)."""
    pos = F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                F.expr(_cms_pos_spark("key", i, w)).alias("bucket"),
            )
            for i in range(d)
        ]
    )
    ppos = (
        probe.select(F.col(col).alias("key"))
        .distinct()
        .select("key", F.explode(pos).alias("p"))
        .select("key", "p.depth", "p.bucket")
    )
    return (
        ppos.join(F.broadcast(cells), ["depth", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est"))
    )


def cms_oracle_sql(table: str, col: str, probe_where: str,
                   w: int = 256, d: int = 4) -> str:
    """DuckDB replay: identical cells, identical min-over-depths probe,
    plus the true count for the certifiable overestimate column."""
    cell_union = "\n      UNION ALL ".join(
        f"SELECT {i} AS depth, {_cms_pos_duck(col, i, w)} AS bucket"
        f" FROM {table}"
        for i in range(d)
    )
    probe_union = "\n      UNION ALL ".join(
        f"SELECT key, {i} AS depth, {_cms_pos_duck('key', i, w)} AS bucket"
        f" FROM probes"
        for i in range(d)
    )
    return f"""
    WITH cells AS (
      SELECT depth, bucket, COUNT(*) AS c FROM ({cell_union}) GROUP BY 1, 2
    ), probes AS (
      SELECT DISTINCT {col} AS key FROM {table} WHERE {probe_where}
    ), ppos AS ({probe_union}),
    est AS (
      SELECT ppos.key, MIN(COALESCE(cells.c, 0)) AS est
      FROM ppos LEFT JOIN cells
        ON cells.depth = ppos.depth AND cells.bucket = ppos.bucket
      GROUP BY 1
    ), truth AS (
      SELECT {col} AS key, COUNT(*) AS true_count FROM {table} GROUP BY 1
    )
    SELECT est.key, CAST(est.est AS BIGINT) AS est,
           CAST(truth.true_count AS BIGINT) AS true_count,
           CAST(est.est - truth.true_count AS BIGINT) AS overestimate
    FROM est JOIN truth ON truth.key = est.key
    """
