"""CUMULATE window TVF (SURVEY §2.5 W3; Flink 1.19 CUMULATE(step, max)).

Semantics [Flink docs]: for max_size = N·step, each row with timestamp t
belongs to the expanding windows [w0, w0+step), [w0, w0+2·step), ...,
[w0, w0+N·step) that contain t, where w0 = floor(t to max_size). An
aggregate is emitted per (window_start, window_end) pair — early partial
results every `step`, the final result at `max_size`.

Spark has no cumulate primitive. The operator explodes each row to its
covering cumulate windows with `sequence()` + `explode` (pure Catalyst
expressions, whole-stage codegen), then the caller aggregates on
(window_start, window_end).

Scale: fan-out is at most N = max/step — a query-chosen constant (typically
4–24) applied map-side *before* the aggregation's partial combine, so the
shuffle carries pre-combined (window, key) groups, not N× raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_seconds(spec: str) -> int:
    qty, unit = spec.strip().split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit.lower()]
    return int(qty) * mult


def cumulate(
    df: DataFrame,
    ts_col: str,
    step: str,
    max_size: str,
    window_start: str = "window_start",
    window_end: str = "window_end",
) -> DataFrame:
    """Assign cumulate windows: returns df + (window_start, window_end),
    one output row per covering window. Aggregate the result on
    [window_start, window_end, ...keys]."""
    step_s = interval_seconds(step)
    max_s = interval_seconds(max_size)
    if max_s % step_s != 0:
        raise ValueError(f"max_size {max_size!r} must be a multiple of step {step!r}")

    us = F.unix_micros(F.col(ts_col))          # exact µs, no float rounding
    max_us = max_s * 1_000_000
    w0_us = us - (us % max_us)                 # start of the max window
    in_steps = (us - w0_us) / F.lit(step_s * 1_000_000)  # completed steps before t
    # end offsets (seconds after w0) of every cumulate window containing t
    end_offsets = F.sequence(
        (in_steps.cast("long") + 1) * step_s, F.lit(max_s), F.lit(step_s)
    )

    return (
        df.withColumn("__w0_us", w0_us)
        .withColumn("__end_off", F.explode(end_offsets))
        .withColumn(window_start, F.timestamp_micros(F.col("__w0_us")))
        .withColumn(
            window_end,
            F.timestamp_micros(F.col("__w0_us") + F.col("__end_off") * 1_000_000),
        )
        .drop("__w0_us", "__end_off")
    )
