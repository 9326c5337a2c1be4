"""Deterministic hash-based sampling and split assignment (SURVEY §2 N6).

Training-data pipelines need sampling that is (a) reproducible across
runs and engines, (b) stable under repartitioning and retries, and
(c) per-stratum tunable. ``rand()`` fails all three — its value depends
on partition layout and task re-execution. The standard remedy (used by
Spark's own ``sampleBy`` docs, dbt, BigQuery ``FARM_FINGERPRINT``
recipes alike): hash a stable key with a salt and keep the row iff the
hash, read as a uniform, falls below the rate.

The hash here is md5 — bit-identical in Spark and DuckDB — and the
comparison stays in *hex-string space*: ``substr(md5(salt:key),1,4) <
'28f6'``. Lowercase-hex strings of equal length order exactly like the
integers they encode, so no hex→int conversion is needed on either
side and the DuckDB oracle replicates the rule byte-for-byte.

Scale shape: pure Catalyst expressions (md5 + substring + string
compare + CASE) — no shuffle, no UDF, no driver round-trip. A 100 TB
scan samples at I/O speed; the stratum CASE is a per-row expression, so
skewed strata cost nothing extra. Changing ``salt`` draws an
independent sample; keeping it fixed makes every run (and every
engine) agree on the exact row set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hex threshold granularity: first 4 hex chars = 16 bits = 65536 buckets.
_BUCKETS = 65536


def threshold_hex(rate: float) -> str:
    """Rate → 4-char lowercase-hex threshold; rate ≥ 1 → ``"g"``.

    ``"g"`` sorts after every hex digit, so ``hash4 < 'g'`` is always
    true — a keep-everything threshold that needs no special-casing in
    the comparison (and stays expressible as a plain SQL literal).
    """
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return "0000"
    return format(int(round(rate * _BUCKETS)), "04x")


def hash4(key: Column, salt: str) -> Column:
    """First 4 hex chars of md5('salt:key') — the 16-bit sampling hash."""
    return F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 4)


def keep(key: Column, salt: str, rate: float) -> Column:
    """Boolean: does this key fall inside the sample at ``rate``?"""
    return hash4(key, salt) < F.lit(threshold_hex(rate))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    salt: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically by key.

    Equivalent to ``df.sampleBy(stratum_col, rates)`` but reproducible:
    the decision depends only on (salt, key), never on partitioning.
    """
    thr = F.lit(threshold_hex(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == value, F.lit(threshold_hex(rate))).otherwise(thr)
    return df.filter(hash4(F.col(key_col), salt) < thr)


def assign_split(
    key: Column, salt: str, fractions: dict[str, float]
) -> Column:
    """Deterministic train/val/test-style split label per key.

    ``fractions`` maps label → fraction in iteration order; cumulative
    thresholds carve [0, 1) into contiguous hash ranges, so every key
    lands in exactly one split and the same key always lands in the
    same split (the property that keeps eval sets leak-free across
    pipeline re-runs).
    """
    h = hash4(key, salt)
    expr = None
    cum = 0.0
    labels = list(fractions.items())
    for label, frac in labels[:-1]:
        cum += frac
        cond = h < F.lit(threshold_hex(cum))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last_label = labels[-1][0]
    return (F.lit(last_label) if expr is None else expr.otherwise(last_label)).alias("split")
