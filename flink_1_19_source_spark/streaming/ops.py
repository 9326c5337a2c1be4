"""Streaming operators (SURVEY §2.5/§2.6/§2.9 tier-S rows).

Each function takes a *streaming* DataFrame and returns the transformed
streaming DataFrame; shapes mirror their batch twins in queries/ so the
replay tests can assert convergence. Watermark semantics follow Flink's
bounded-out-of-orderness generator + min-propagation (PAPERS.md:7): Spark's
``withWatermark`` implements the same min-of-inputs rule per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_bounded_out_of_orderness(
    sdf: DataFrame, ts_col: str, delay: str
) -> DataFrame:
    """Flink: WATERMARK FOR ts AS ts - INTERVAL delay  [docs].
    Spark: withWatermark — one event-time column per stream."""
    return sdf.withWatermark(ts_col, delay)


def tumble_agg(
    sdf: DataFrame,
    ts_col: str,
    size: str,
    keys: list[str],
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming TUMBLE window agg (W1): emits once per closed window in
    append mode — Flink's default emit-on-watermark behavior."""
    return (
        with_bounded_out_of_orderness(sdf, ts_col, delay)
        .groupBy(*keys, F.window(ts_col, size).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value")).alias("total"),
        )
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            F.round("total", 6).alias("total"),
        )
    )


def hop_agg(
    sdf: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    keys: list[str],
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming HOP window agg (W2)."""
    return (
        with_bounded_out_of_orderness(sdf, ts_col, delay)
        .groupBy(*keys, F.window(ts_col, size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            "n",
        )
    )


def session_agg(
    sdf: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming SESSION window agg (W4; Flink 1.19's SESSION TVF)."""
    return (
        with_bounded_out_of_orderness(sdf, ts_col, delay)
        .groupBy(*keys, F.session_window(ts_col, gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
    )


def cumulate_agg(
    sdf: DataFrame,
    ts_col: str,
    step: str,
    max_size: str,
    keys: list[str],
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming CUMULATE (W3-S): Flink's CUMULATE(step, max) TVF on a
    stream, append mode, via the stateless explode operator + a synthetic
    end-key tumble.

    Mechanism: each row explodes to its covering cumulate windows
    (operators/cumulate — pure Catalyst, no state). A cumulate window is
    then uniquely keyed by its END e: the synthetic event time e − 1µs
    falls in exactly the step-sized tumble [e − step, e), so grouping on
    ``window(synthetic, step)`` gives watermark-driven append closure per
    cumulate window.

    Watermark compensation: the synthetic time of a row can sit up to
    ``max_size`` BEFORE the synthetic time of an earlier row (a late-step
    window end for a fresh max-window), so the synthetic column's
    out-of-orderness bound is the data's bound plus ``max_size`` — the
    watermark delay below adds them. Consequence: a cumulate window is
    emitted once the watermark passes max-window-start(max ts) − delay,
    which the oracle mirrors as
    ``window_end <= time_bucket(max, MAX(ts)) − delay``.

    Exact boundary: because the synthetic key is window_end − 1µs, the
    true emission condition is the STRICT
    ``window_end < time_bucket(max, MAX(ts)) − delay + 1µs``. The oracle's
    ``<=`` form is equivalent unless ``delay`` is an exact multiple of
    ``step`` AND a window ends exactly at the compensated watermark — then
    the 1µs gap keeps that single window open one batch longer than the
    ``<=`` rule suggests. The shipped step=30 min / delay=10 min config
    can never hit this; pick delay not a multiple of step (or add 1µs to
    the compensation) if you need the inclusive rule exactly.
    """
    from ..operators.cumulate import cumulate, interval_seconds

    total_delay = f"{interval_seconds(delay) + interval_seconds(max_size)} seconds"
    ex = cumulate(sdf, ts_col, step, max_size)
    ex = ex.withColumn(
        "__wkey", F.timestamp_micros(F.unix_micros(F.col("window_end")) - 1)
    ).withWatermark("__wkey", total_delay)
    return (
        ex.groupBy(*keys, F.col("window_start"), F.window("__wkey", step).alias("__w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value")), 6).alias("total"),
        )
        .select(
            *keys,
            "window_start",
            F.col("__w.end").alias("window_end"),
            "n",
            "total",
        )
    )


def dedup_keep_first(
    sdf: DataFrame, keys: list[str], ts_col: str, delay: str = "10 minutes"
) -> DataFrame:
    """Streaming deduplication, keep-first (O7/N1): Flink's Top-N-with-
    rownum=1 pattern. `dropDuplicatesWithinWatermark` keeps the first
    arrival per key and expires state once the watermark passes."""
    return with_bounded_out_of_orderness(sdf, ts_col, delay).dropDuplicatesWithinWatermark(
        keys
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Streaming interval join (J5): right.ts ∈ [left.ts - lower,
    left.ts + upper] on equal keys. Native stream-stream join in Spark —
    both sides watermark, state pruned by the time-range condition
    (upstream: flink-table-runtime interval join keyed state).

    ``how='leftOuter'`` = Flink's LEFT interval join: a left row with no
    in-window match emits null-padded when the watermark passes its
    match window (state eviction time), matching Flink's cleanup-timer
    emission."""
    l = with_bounded_out_of_orderness(left, left_ts, delay).alias("l")
    r = with_bounded_out_of_orderness(right, right_ts, delay).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how)


def window_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    size: str,
    delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Streaming window join (J8): rows from both streams that fall into
    the SAME tumbling window join on equal keys — Flink's window-TVF join
    (windowed both sides, join on key + window_start/window_end; outer
    variants emit null-padded rows once the watermark closes the window).

    Spark shape: assign ``F.window(ts, size)`` on each watermarked side
    and equi-join on (keys, window). The window column carries event
    time, so the state store evicts a window's rows once the watermark
    passes its end — state is bounded by (keys x live windows), the same
    bound as Flink's window-join keyed state. Output column ``window_start``
    replaces the raw timestamps.
    """
    l = with_bounded_out_of_orderness(left, left_ts, delay).withColumn(
        "__w", F.window(left_ts, size)
    )
    r = with_bounded_out_of_orderness(right, right_ts, delay).withColumn(
        "__w", F.window(right_ts, size)
    )
    return (
        l.join(r, [*keys, "__w"], how)
        .withColumn("window_start", F.col("__w.start"))
        .drop("__w", left_ts, *([right_ts] if right_ts != left_ts else []))
    )


class _MemoryRowWriter:
    """Test-only sink: accumulates each side's rows on the driver (the
    memory-sink stand-in the tests read back). Production callers pass
    writer callables that append the DataFrame to parquet/Delta instead —
    nothing in the split mechanism itself touches the driver."""

    def __init__(self):
        self.rows: list = []

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        self.rows.extend(df.collect())


class LateDataCapture:
    """Late-data side output (W8): Flink routes rows older than the
    watermark to a side output; Spark silently drops them. This foreachBatch
    splitter reproduces the side output with pure DataFrame ops:

    - within each micro-batch, the running max event time over arrival
      order (``order_by``) is a window aggregate — executed on the cluster;
    - the watermark carried across batches is ONE scalar (per-batch
      ``agg(max(ts))``), the only value that ever reaches the driver;
    - rows with ``running_max - ts > delay`` are tagged late; each side is
      handed to a writer callback *as a DataFrame* (two filtered writes —
      no per-row driver iteration anywhere).

    The single-partition window mirrors the replay harness's single ordered
    source partition (Flink's per-partition watermark, one partition). For a
    multi-partition source, partition the window by the source-partition
    column and take the min across partitions — same mechanism, same O(batch)
    cost, no global sort.

    Watermark state survives restarts when ``state_dir`` is given: the
    carried max is persisted per batch-id (idempotent overwrite on replay)
    and re-read on construction — unlike a plain in-memory attribute, a
    recovered query resumes with the correct watermark.
    """

    def __init__(
        self,
        ts_col: str,
        delay_seconds: float,
        order_by: list[str] | None = None,
        late_writer=None,
        on_time_writer=None,
        state_dir: str | None = None,
    ):
        self.ts_col = ts_col
        self.delay = delay_seconds
        self.order_by = order_by or [ts_col]
        self._late_writer = late_writer or _MemoryRowWriter()
        self._on_time_writer = on_time_writer or _MemoryRowWriter()
        self.state_dir = state_dir
        self.max_ts = self._recover_watermark() if state_dir else None

    # -- test-harness accessors (memory writers only) --------------------
    @property
    def late(self) -> list:
        return self._late_writer.rows

    @property
    def on_time(self) -> list:
        return self._on_time_writer.rows

    def _recover_watermark(self):
        import datetime as _dt
        import glob
        import os

        vals = []
        for p in glob.glob(os.path.join(self.state_dir, "wm-*.txt")):
            with open(p) as f:
                vals.append(_dt.datetime.fromisoformat(f.read().strip()))
        return max(vals) if vals else None

    #: watermark files kept after each persist — recovery needs only the
    #: latest value; a couple of predecessors are kept so a crash between
    #: replace() and prune can never leave zero files. Bounds state-dir
    #: size and restart cost for long-running streams.
    _KEEP_WM_FILES = 2

    def _persist_watermark(self, batch_id: int) -> None:
        import glob
        import os

        os.makedirs(self.state_dir, exist_ok=True)
        tmp = os.path.join(self.state_dir, f"wm-{batch_id}.txt.tmp")
        with open(tmp, "w") as f:
            f.write(self.max_ts.isoformat())
        os.replace(tmp, os.path.join(self.state_dir, f"wm-{batch_id}.txt"))
        # prune all but the newest _KEEP_WM_FILES (numeric batch-id order;
        # max_ts is monotone so newer files always carry >= watermarks)
        files = sorted(
            glob.glob(os.path.join(self.state_dir, "wm-*.txt")),
            key=lambda p: int(os.path.basename(p)[3:-4]),
        )
        for p in files[: -self._KEEP_WM_FILES]:
            os.remove(p)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window

        ts = F.col(self.ts_col)
        w = (
            Window.orderBy(*self.order_by)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        run_max = F.max(ts).over(w)
        if self.max_ts is not None:
            run_max = F.greatest(run_max, F.lit(self.max_ts))
        # late iff the watermark (max ts over PRIOR arrivals) exceeds ts by
        # more than the allowed delay; first-ever row has no prior → on time
        is_late = F.when(
            run_max.isNotNull(),
            (run_max.cast("double") - ts.cast("double")) > F.lit(self.delay),
        ).otherwise(F.lit(False))
        tagged = batch_df.withColumn("_late", is_late).persist()
        try:
            self._late_writer(tagged.filter(F.col("_late")).drop("_late"), batch_id)
            self._on_time_writer(
                tagged.filter(~F.col("_late")).drop("_late"), batch_id
            )
            mx = batch_df.agg(F.max(ts).alias("m")).first()["m"]
        finally:
            tagged.unpersist()
        if mx is not None and (self.max_ts is None or mx > self.max_ts):
            self.max_ts = mx
            if self.state_dir:
                self._persist_watermark(batch_id)
