"""Skew-mitigation operators (SURVEY §4: distinct-agg split / skew-join
rewrites; Flink: SplitAggregateRule + skewed-partition handling).

At 100 TB a single hot key (one power-user, one viral document) can pin an
entire stage on one task. Two standard rewrites, both pure DataFrame
compositions so Catalyst still optimizes around them:

- salted_agg: two-phase aggregation — partial agg on (key, salt), final
  agg on key. The hot key's rows spread over `salt_buckets` tasks in
  phase 1; phase 2 combines `salt_buckets` partial rows per key.
  Correct for any decomposable aggregate (sum/count/min/max, and avg via
  sum+count).
- salted_join: broadcast-replicate the small side `salt_buckets` times so
  a skewed fact-side key hash-spreads instead of hot-spotting one task.

AQE's skewedJoin/coalesce handles much of this adaptively (enabled in
session.py); these operators are the explicit form for when the skew is
known a priori or AQE's thresholds don't trigger.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    agg_cols: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    agg_cols: out_name -> (fn, col) with fn in {sum, count, min, max}.
    Phase 1 groups by (keys, salt) — the hot key fans out over
    `salt_buckets` reducers; phase 2 merges partials per key (sum of
    partial sums/counts, min of mins, max of maxes)."""
    # deterministic spread: derive the salt from a per-row id, not rand()
    salted = df.withColumn(
        "__salt", F.abs(F.monotonically_increasing_id()) % salt_buckets
    )

    def phase1_expr(fn: str, col: str, out: str) -> Column:
        return getattr(F, fn)(col).alias(out)

    p1 = salted.groupBy(*keys, "__salt").agg(
        *[
            phase1_expr(fn, col, out)
            for out, (fn, col) in agg_cols.items()
        ]
    )
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    p2 = p1.groupBy(*keys).agg(
        *[
            merge[fn](out).alias(out)
            for out, (fn, _col) in agg_cols.items()
        ]
    )
    return p2


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: fact rows get a random-ish salt (derived from a
    per-row id — deterministic plan), the dim side is exploded to every
    salt value, and the join key becomes (key, salt). The hot key's rows
    land on `salt_buckets` different reducers.

    Broadcast of the replicated dim is usually even better when dim is
    small (see J9); this operator is for the mid-size-dim case where the
    replicated dim still fits comfortably per partition."""
    salted_fact = fact.withColumn(
        "__salt", (F.abs(F.monotonically_increasing_id()) % salt_buckets).cast("int")
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("__salt")
    replicated_dim = dim.select("*", salts)
    return salted_fact.join(replicated_dim, [key, "__salt"]).drop("__salt")
