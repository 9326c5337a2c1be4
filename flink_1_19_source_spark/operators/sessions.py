"""Dynamic-gap session assignment (SURVEY §2.5 W4 — batch side).

Flink ``EventTimeSessionWindows.withDynamicGap``: each element opens a
window [ts, ts + gap(element)) and overlapping windows merge. On a
time-sorted per-key sequence that merge rule collapses to: a row starts
a new session iff its timestamp reaches the running max of (ts + gap)
over all earlier rows of the key — one per-key sort window computes the
frontier, a running sum of the new-session flags numbers the sessions.

One hash exchange on the key (the window sort); the session aggregate
afterwards needs no second shuffle (HashPartitioning(key) satisfies the
(key, sid) clustering — pinned in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def assign_dynamic_sessions(
    df: DataFrame,
    key: str,
    ms: str,
    gap: str,
    order_tiebreak: str,
) -> DataFrame:
    """Append ``sid`` (1-based per-key session number): rows sorted by
    (ms, tiebreak) per key; new session when ms >= running max of
    earlier (ms + gap)."""
    order = Window.partitionBy(key).orderBy(ms, order_tiebreak)
    prev_end = F.max(F.col(ms) + F.col(gap)).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "is_new",
        F.when(prev_end.isNull() | (F.col(ms) >= prev_end), 1).otherwise(0),
    )
    return flagged.withColumn(
        "sid",
        F.sum("is_new").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("is_new")
