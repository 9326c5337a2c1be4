"""Second wave of streaming coverage: retract-stream chaining (§1.3/§7.4).

Flink's update/retract changelog lets stateful operators stack — SURVEY
§1.3 and §7.4 declare "a second stateful operator consuming a retract
stream" the engine's biggest semantic gap vs Flink. The queries here close
it with the machinery in ``streaming/retract.py``: Spark's native
update-mode streaming aggregate produces the level-1 upsert stream; a
keyed mirror turns it into a true ``-U/+U`` retract stream
(ChangelogNormalize); and the level-2 aggregate folds those retractions
into a MERGE-backed state table — all set-based inside ``foreachBatch``.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import jdbc as jdbc_mod
from ..streaming import replay, retract, sinks
from .streaming_queries import _events_stream, _stream_shuffle_partitions


@register(
    "s_chained_agg_retract",
    oracle="""
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    )
    SELECT cnt, COUNT(*) AS n_users
    FROM per_user
    GROUP BY cnt
    """,
    survey="§7.4-retract X2 X4",
    tags=("streaming",),
)
def s_chained_agg_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained streaming aggregation over a RETRACT stream — Flink's

        SELECT cnt, COUNT(*) AS n_users
        FROM (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
        GROUP BY cnt

    where every level-1 update retracts its user from the old cnt bucket
    (−1) and adds it to the new one (+1). Level 1 is Spark's NATIVE
    update-mode streaming aggregate over the replayed event stream (real
    checkpointed state, per-batch changed-key output). foreachBatch then:

    1. joins the batch against a keyed mirror of previously emitted
       (user_id, cnt) rows to synthesize the full ``-U/+U`` changelog
       (ChangelogNormalize — ``retract.synthesize_retractions``);
    2. folds the changelog into net per-cnt deltas and MERGEs them into
       the level-2 state table, deleting buckets that reach zero
       (``retract.DeltaAggState``);
    3. MERGEs the batch into the mirror (last writer wins per user);
    4. records the batch id in a ledger so failure-replays of a batch are
       no-ops — delta folding is not idempotent, so the ledger, not the
       MERGE, carries the exactly-once effect (X4).

    Convergence is chunk-count-invariant: each micro-batch applies exact
    ±1 deltas, so after the availableNow drain the level-2 table equals
    the batch two-level aggregate for ANY replay chunking — which is the
    DuckDB oracle above. Everything is set-based (two small joins + one
    agg + one MERGE per batch, sized by batch churn, never history)."""
    sdf, wd = _events_stream(spark, sf_dir, "s_chained_agg")
    level1 = sdf.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))

    url = jdbc_mod.derby_url(os.path.join(wd, "derby"))
    mirror = jdbc_mod.JdbcTableSource(url, "L1_MIRROR")
    l2 = retract.DeltaAggState(
        # VARCHAR pin: Spark's Derby dialect maps StringType → CLOB, which
        # MERGE cannot compare against a literal
        jdbc_mod.JdbcTableSource(
            url, "L2_CNT_HIST", column_types={"_rowkind": "VARCHAR(8)"}
        ),
        "cnt",
        "n_users",
    )
    ledger = retract.BatchLedger(jdbc_mod.JdbcTableSource(url, "L2_LEDGER"))
    mirror.ensure_table(
        spark.createDataFrame([], "user_id long, cnt long"), overwrite=True
    )
    l2.init(spark)
    ledger.init(spark)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if ledger.seen(spark, batch_id):
            return  # failure-replayed batch: deltas already folded
        batch_df = batch_df.persist()
        try:
            changelog = retract.synthesize_retractions(
                batch_df, mirror.scan(spark), ["user_id"], ["cnt"]
            )
            l2.apply(changelog)
            mirror.upsert(batch_df.select("user_id", "cnt"), pk_cols=["user_id"])
            ledger.mark(spark, batch_id)
        finally:
            batch_df.unpersist()

    plan = sinks.plan_sink("chained_agg")  # update + keyed_merge (§7.4)
    ckpt = os.path.join(wd, f"ckpt-{uuid.uuid4().hex[:8]}")
    with _stream_shuffle_partitions(spark):
        replay.run_foreach_batch(
            level1, fold, checkpoint_dir=ckpt, output_mode=plan.output_mode
        )
    shutil.rmtree(ckpt, ignore_errors=True)
    return (
        l2.snapshot(spark)
        .where(F.col("n_users") > 0)
        .select("cnt", "n_users")
    )


@register(
    "s_statement_set_stream",
    oracle="""
    SELECT 'purchases' AS sink, event_id, user_id, ROUND(value, 6) AS value
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT 'high_value' AS sink, event_id, user_id, ROUND(value, 6) AS value
    FROM events WHERE value >= 150
    """,
    survey="S12 X4 R6",
    tags=("streaming",),
)
def s_statement_set_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming STATEMENT SET: one source stream, two INSERTs, executed
    as a single job — per micro-batch the shared batch frame is persisted
    once and both sinks write from it (Flink's multi-INSERT statement set
    over the same Kafka source). Exactly-once comes from the checkpointed
    replay: a re-run of a batch overwrites its own epoch directories
    (idempotent per-batch paths), never double-appends. The read-back is
    tagged + unioned so the oracle certifies BOTH sinks' content."""
    wd = os.path.join(
        "/tmp/sgraft_streams",
        os.path.basename(sf_dir.rstrip("/")),
        "s_stmt_set",
    )
    os.makedirs(wd, exist_ok=True)
    run = uuid.uuid4().hex[:8]
    p_purch = os.path.join(wd, f"purchases-{run}")
    p_high = os.path.join(wd, f"high-{run}")
    ckpt = os.path.join(wd, f"ckpt-{run}")

    sdf, _ = _events_stream(spark, sf_dir, "s_stmt_set_src")

    def fan_out(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            # idempotent epoch paths: a crash-replayed batch rewrites its
            # own directory instead of appending a duplicate
            batch.filter(F.col("event_type") == "purchase").select(
                "event_id", "user_id", "value"
            ).write.mode("overwrite").parquet(
                os.path.join(p_purch, f"epoch={batch_id:05d}")
            )
            batch.filter(F.col("value") >= 150).select(
                "event_id", "user_id", "value"
            ).write.mode("overwrite").parquet(
                os.path.join(p_high, f"epoch={batch_id:05d}")
            )
        finally:
            batch.unpersist()

    with _stream_shuffle_partitions(spark):
        replay.run_foreach_batch(sdf, fan_out, checkpoint_dir=ckpt)

    r1 = spark.read.parquet(p_purch).select(
        F.lit("purchases").alias("sink"),
        "event_id",
        "user_id",
        F.round("value", 6).alias("value"),
    )
    r2 = spark.read.parquet(p_high).select(
        F.lit("high_value").alias("sink"),
        "event_id",
        "user_id",
        F.round("value", 6).alias("value"),
    )
    out = r1.unionByName(r2).localCheckpoint(eager=True)
    shutil.rmtree(p_purch, ignore_errors=True)
    shutil.rmtree(p_high, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


@register(
    "x7b_broadcast_rules_update_stream",
    oracle="""
    WITH mid AS (SELECT MAX(event_id) // 2 AS m FROM events),
    h1 AS (SELECT * FROM events, mid WHERE event_id <= m),
    h2 AS (SELECT * FROM events, mid WHERE event_id > m)
    SELECT 1 AS rules_version, CAST(user_id % 5 AS BIGINT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM h1 GROUP BY user_id % 5
    UNION ALL
    SELECT 2 AS rules_version, CAST((user_id + 2) % 5 AS BIGINT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM h2 GROUP BY (user_id + 2) % 5
    """,
    survey="X7 X4",
    tags=("streaming",),
)
def x7b_broadcast_rules_update_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast state UPDATED BY THE CONTROL STREAM mid-flight — the
    full Flink X7 contract (s_broadcast_state_join covers the static
    snapshot): the first half of the stream is processed under rules v1,
    then the control side publishes rules v2 and the remaining events
    are enriched under the NEW rules, all through ONE checkpointed query
    resumed across the rule change. Spark shape: the stream-static
    join's static side is re-read every micro-batch, so republishing the
    rules table between drains IS the control-stream update; the output
    carries the rules version that actually enriched each row, which the
    oracle pins per half."""
    from pyspark.sql.types import LongType, StructField, StructType

    wd = os.path.join(
        "/tmp/sgraft_streams", os.path.basename(sf_dir.rstrip("/")), "x7b"
    )
    os.makedirs(wd, exist_ok=True)
    run = uuid.uuid4().hex[:8]
    src = os.path.join(wd, f"src-{run}")
    rules = os.path.join(wd, f"rules-{run}")
    out = os.path.join(wd, f"out-{run}")
    ckpt = os.path.join(wd, f"ckpt-{run}")
    os.makedirs(src, exist_ok=True)

    from ..tables import load_table

    e = load_table(spark, sf_dir, "events")
    mid = e.agg(F.expr("max(event_id) div 2").alias("m")).first().m

    def publish_rules(version: int, offset: int) -> None:
        users = e.select("user_id").distinct()
        users.select(
            "user_id",
            F.lit(version).alias("rules_version"),
            ((F.col("user_id") + offset) % 5).alias("segment"),
        ).write.mode("overwrite").parquet(rules)

    def publish_events(half_df, name: str) -> None:
        tmp = os.path.join(wd, f"stage-{run}-{name}")
        half_df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part), os.path.join(src, f"{name}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    def drain() -> None:
        sdf = spark.readStream.schema(e.schema).parquet(src)

        def fn(batch, bid):
            r = spark.read.parquet(rules)
            (
                batch.join(F.broadcast(r), "user_id")
                .groupBy("rules_version", "segment")
                .agg(F.count(F.lit(1)).alias("n"))
                .write.mode("overwrite")
                .parquet(os.path.join(out, f"epoch={bid:05d}"))
            )

        with _stream_shuffle_partitions(spark):
            replay.run_foreach_batch(sdf, fn, checkpoint_dir=ckpt)

    publish_rules(1, 0)
    publish_events(e.filter(F.col("event_id") <= mid), "h1")
    drain()
    publish_rules(2, 2)  # the control stream updates the broadcast state
    publish_events(e.filter(F.col("event_id") > mid), "h2")
    drain()

    res = (
        spark.read.parquet(out)
        .groupBy("rules_version", F.col("segment").cast("long").alias("segment"))
        .agg(F.sum("n").alias("n"))
        .localCheckpoint(eager=True)
    )
    for p in (src, rules, out, ckpt):
        shutil.rmtree(p, ignore_errors=True)
    return res


@register(
    "s_crash_resume_exactly_once",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 6) AS total
    FROM events GROUP BY event_type
    """,
    survey="X4",
    tags=("streaming",),
)
def s_crash_resume_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end exactly-once under a REAL injected failure (X4): the
    sink crashes mid-write on its second micro-batch, leaving a TORN
    epoch directory (a partial, wrong prefix of the batch); the query is
    restarted on the same checkpoint, Spark replays the failed batch,
    the idempotent epoch sink overwrites the torn directory completely,
    and the remaining batches drain. The final aggregate must equal the
    batch answer exactly — no loss, no duplication, the torn write
    invisible. This is the checkpoint/replay/idempotent-sink triangle
    every exactly-once claim reduces to."""
    wd = os.path.join(
        "/tmp/sgraft_streams", os.path.basename(sf_dir.rstrip("/")), "s_xonce"
    )
    os.makedirs(wd, exist_ok=True)
    run = uuid.uuid4().hex[:8]
    out = os.path.join(wd, f"out-{run}")
    ckpt = os.path.join(wd, f"ckpt-{run}")

    sdf = replay.replay_table(
        spark, sf_dir, "events", os.path.join(wd, "src"), chunks=4,
        files_per_trigger=1,
    )
    crashed = {"done": False}

    def fn(batch, bid: int) -> None:
        target = os.path.join(out, f"epoch={bid:05d}")
        if bid == 1 and not crashed["done"]:
            crashed["done"] = True
            # torn write: a partial prefix lands, then the "process" dies
            batch.limit(50).select("event_id", "event_type", "value").write.mode(
                "overwrite"
            ).parquet(target)
            raise RuntimeError("injected sink crash after partial write")
        batch.select("event_id", "event_type", "value").write.mode(
            "overwrite"
        ).parquet(target)

    with _stream_shuffle_partitions(spark):
        try:
            replay.run_foreach_batch(sdf, fn, checkpoint_dir=ckpt)
            raise AssertionError("injected crash did not fire")
        except Exception as e:
            if "injected sink crash" not in str(e):
                raise
        # restart on the SAME checkpoint: batch 1 replays, torn dir healed
        replay.run_foreach_batch(sdf, fn, checkpoint_dir=ckpt)

    res = (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return res


@register(
    "s_restart_schema_evolution",
    oracle="""
    WITH b AS (
      SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events
    ), delivered AS (
      -- the post-upgrade source only carries the migrated user cohort
      -- (user_id % 3 <> 0), so a third of the users keep their
      -- pre-upgrade state — the NULL-quality branch is real, not vacuous
      SELECT * FROM events
      WHERE epoch_us(ts) <= (SELECT mid FROM b) OR user_id % 3 <> 0
    ), ranked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) > (SELECT mid FROM b)
                  THEN event_id % 97 END AS quality,
             ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM delivered
    )
    SELECT user_id, event_id AS last_event_id,
           CAST(quality AS BIGINT) AS quality
    FROM ranked WHERE rn = 1
    """,
    survey="X4 X2 O7-S",
    tags=("streaming",),
)
def s_restart_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful restart under SCHEMA EVOLUTION (X4, the savepoint-upgrade
    scenario): a keep-last-per-user stream runs to completion on schema
    v1, the job is stopped, the source gains a ``quality`` column, and
    the job RESTARTS on the SAME checkpoint and the SAME keyed sink
    state.  The file source's checkpoint skips the already-processed v1
    files; the MERGE sink widens its state in place
    (``unionByName(allowMissingColumns)`` + ``mergeSchema`` snapshot), so
    users last seen before the upgrade carry NULL quality and users
    touched after carry the real value — exactly Flink's state-schema
    evolution contract for a savepoint upgrade.  The oracle is the batch
    keep-last with the same epoch-split quality derivation."""
    from ..streaming.topn import streaming_keep_last  # noqa: F401 (doc xref)
    from ..tables import load_table

    wd = os.path.join(
        "/tmp/sgraft_streams", os.path.basename(sf_dir.rstrip("/")), "s_schemaevo"
    )
    os.makedirs(wd, exist_ok=True)
    run = uuid.uuid4().hex[:8]
    src = os.path.join(wd, f"src-{run}")
    ckpt = os.path.join(wd, f"ckpt-{run}")
    state = os.path.join(wd, f"merge-{run}")
    os.makedirs(src, exist_ok=True)

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    bounds = e.agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long")
        .alias("mid")
    ).first()
    mid = int(bounds.mid)

    def publish(df, names: list[str]) -> None:
        # K ts-ordered chunk files with increasing mtimes so the file
        # source replays them in event-time order (same as replay.py)
        rows = df.orderBy("ts", "event_id")
        n = rows.count()
        per = (n + len(names) - 1) // len(names)
        tmp = os.path.join(wd, f"stage-{run}")
        rows.coalesce(1).write.mode("overwrite").parquet(tmp)
        import pyarrow.parquet as pq

        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        t = pq.read_table(os.path.join(tmp, part))
        # Spark writes INT96 timestamps (read back by pyarrow as ns-NTZ);
        # normalize to µs-UTC so the file stream reads plain TimestampType
        # — same normalization as replay.split_into_chunks
        import pyarrow as pa

        idx = t.schema.get_field_index("ts")
        t = t.set_column(
            idx,
            "ts",
            t.column("ts")
            .cast(pa.timestamp("us"), safe=False)
            .cast(pa.timestamp("us", tz="UTC")),
        )
        for i, name in enumerate(names):
            sl = t.slice(i * per, per)
            if sl.num_rows:
                path = os.path.join(src, name)
                pq.write_table(sl, path)
                seq = int(name.split("-")[1].split(".")[0])
                os.utime(path, (1_700_000_000 + seq, 1_700_000_000 + seq))
        shutil.rmtree(tmp, ignore_errors=True)

    sink = sinks.ParquetMergeSink(
        spark, state, pk_cols=["user_id"], order_cols=["ts", "event_id"]
    )

    def drain(schema) -> None:
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        with _stream_shuffle_partitions(spark):
            replay.run_foreach_batch(sdf, sink, checkpoint_dir=ckpt)

    # phase 1: schema v1 (no quality), first event-time half
    v1 = e.filter(F.unix_micros("ts") <= mid)
    publish(v1, ["chunk-0000.parquet", "chunk-0001.parquet"])
    drain(e.schema)

    # upgrade: source gains a quality column; restart on the SAME
    # checkpoint + sink state with the WIDER schema
    # only the migrated cohort flows after the upgrade: users with
    # user_id % 3 == 0 never get post-upgrade rows, so their pre-upgrade
    # state must survive in place with NULL quality
    v2 = e.filter(
        (F.unix_micros("ts") > mid) & (F.col("user_id") % 3 != 0)
    ).withColumn("quality", (F.col("event_id") % 97).cast("long"))
    publish(v2, ["chunk-0002.parquet", "chunk-0003.parquet"])
    drain(v2.schema)

    out = (
        sink.snapshot_df()
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("quality").cast("long").alias("quality"),
        )
        .localCheckpoint(eager=True)
    )
    for p in (src, ckpt, state):
        shutil.rmtree(p, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# §7.4-retract — retractable Top-N over a streaming aggregate's changelog
# --------------------------------------------------------------------------
_TOPN_K = 10
_TOPN_SLACK = 6


@register(
    "s_topn_over_agg_retract",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ), ranked AS (
        SELECT user_id, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rn
        FROM per_user
    )
    SELECT CAST(rn AS BIGINT) AS rn, user_id, cnt
    FROM ranked WHERE rn <= {_TOPN_K}
    """,
    survey="§7.4-retract O6-S X2 X4",
    tags=("streaming",),
)
def s_topn_over_agg_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's classic retractable Top-N OVER an unwindowed streaming
    aggregate — the second canonical consume-a-retraction-stream shape
    (SURVEY §7.4; `s_chained_agg_retract` proved agg→agg, this proves
    agg→rank):

        SELECT * FROM (
          SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) rn
          FROM (SELECT user_id, COUNT(*) cnt FROM events GROUP BY user_id)
        ) WHERE rn <= 10

    Level 1 is Spark's NATIVE update-mode streaming aggregate; per
    micro-batch foreachBatch (1) synthesizes the -U/+U changelog against
    the keyed mirror (ChangelogNormalize), (2) MERGEs the +I/+U absolute
    values into a BOUNDED Top-N candidate table and prunes everything
    below rank K+slack with -D MERGE deletes (Flink's
    UpdatableTopNFunction buffer, done set-based), (3) upserts the
    mirror, (4) marks the batch ledger.

    Eviction safety is an explicit precondition, stated and relied on:
    the ranking value (COUNT over an append-only stream) is MONOTONE
    non-decreasing, so an evicted row's rank can never improve without
    its own +U (which re-enters through the changelog carrying the new
    absolute count) — a retractable source (CDC deletes) would instead
    re-rank from the keyed mirror, which this pipeline already
    maintains.  State is O(K + slack + batch churn), never O(users):
    the 100 TB shape, where the hot ranking state stays driver-scan
    small while the mirror is a keyed MERGE table probed only on
    changed keys.

    All state mutations are ABSOLUTE-value MERGEs (idempotent), so a
    crash between the state MERGE and the ledger mark converges on
    replay — pinned by tests/test_r7_ops.py::
    test_topn_over_agg_crash_replay_converges; chunk-count invariance
    (3 vs 8 micro-batches) is pinned in test_chunk_invariance.py.
    Drained result = rank snapshot of the candidate table, which must
    hash-match the batch two-level SQL above (the DuckDB oracle).
    """
    return _topn_retract_run(spark, sf_dir)


def _topn_retract_run(
    spark: SparkSession, sf_dir: str, crash_once_at: int | None = None
) -> DataFrame:
    from pyspark.sql import Window

    sdf, wd = _events_stream(spark, sf_dir, "s_topn_retract")
    level1 = sdf.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))

    run = uuid.uuid4().hex[:8]
    url = jdbc_mod.derby_url(os.path.join(wd, f"derby-{run}"))
    mirror = jdbc_mod.JdbcTableSource(url, "TN_MIRROR")
    state = jdbc_mod.JdbcTableSource(
        url, "TN_TOPN", column_types={"_rowkind": "VARCHAR(8)"}
    )
    ledger = retract.BatchLedger(jdbc_mod.JdbcTableSource(url, "TN_LEDGER"))
    mirror.ensure_table(
        spark.createDataFrame([], "user_id long, cnt long"), overwrite=True
    )
    state.ensure_table(
        spark.createDataFrame([], "user_id long, cnt long"), overwrite=True
    )
    ledger.init(spark)
    crashed = {"done": False}
    rank_w = Window.orderBy(F.col("cnt").desc(), F.col("user_id"))

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if ledger.seen(spark, batch_id):
            return  # committed batch replayed after a crash: no-op
        batch_df = batch_df.persist()
        try:
            changelog = retract.synthesize_retractions(
                batch_df, mirror.scan(spark), ["user_id"], ["cnt"]
            )
            # +I/+U carry the new ABSOLUTE count: upsert into candidates
            # (the -U needs no delete — its key's +U replaces it in the
            # same MERGE, the set-based form of retract-then-add)
            adds = changelog.filter(F.col("_rowkind") != "-U").select(
                "user_id", "cnt"
            )
            state.upsert(adds, pk_cols=["user_id"])
            # prune: everything below rank K+slack leaves the candidate
            # table (monotone ranking value => safe, see docstring)
            ranked = state.scan(spark).withColumn(
                "rn", F.row_number().over(rank_w)
            )
            evict = (
                ranked.filter(F.col("rn") > _TOPN_K + _TOPN_SLACK)
                .select("user_id", "cnt")
                .withColumn("_rowkind", F.lit("-D"))
            )
            if evict.count():
                state.upsert(evict, pk_cols=["user_id"], op_col="_rowkind")
            mirror.upsert(
                batch_df.select("user_id", "cnt"), pk_cols=["user_id"]
            )
            if crash_once_at == batch_id and not crashed["done"]:
                crashed["done"] = True
                # worst spot: every state table mutated, ledger unmarked
                raise RuntimeError("injected crash before ledger mark")
            ledger.mark(spark, batch_id)
        finally:
            batch_df.unpersist()

    plan = sinks.plan_sink("chained_agg")  # update + keyed_merge (§7.4)
    ckpt = os.path.join(wd, f"ckpt-{run}")
    with _stream_shuffle_partitions(spark):
        if crash_once_at is not None:
            try:
                replay.run_foreach_batch(
                    level1, fold, checkpoint_dir=ckpt,
                    output_mode=plan.output_mode,
                )
                raise AssertionError("injected crash did not fire")
            except Exception as e:
                if "injected crash" not in str(e):
                    raise
        replay.run_foreach_batch(
            level1, fold, checkpoint_dir=ckpt, output_mode=plan.output_mode
        )
    shutil.rmtree(ckpt, ignore_errors=True)
    return (
        state.scan(spark)
        .withColumn("rn", F.row_number().over(rank_w).cast("long"))
        .filter(F.col("rn") <= _TOPN_K)
        .select("rn", "user_id", "cnt")
    )


@register(
    "s_join_over_agg_retract",
    oracle="""
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, u.cnt
    FROM events e JOIN per_user u ON e.user_id = u.user_id
    """,
    survey="§7.4-retract J1 X2 X4",
    tags=("streaming",),
)
def s_join_over_agg_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming JOIN consuming an unwindowed aggregate's changelog —
    Flink's enrich-against-aggregate, the THIRD canonical
    consume-a-retraction-stream shape (SURVEY §7.4; agg→agg and
    agg→rank are s_chained_agg_retract / s_topn_over_agg_retract):

        SELECT e.event_id, e.user_id, u.cnt
        FROM events e
        JOIN (SELECT user_id, COUNT(*) cnt FROM events GROUP BY user_id) u
          ON e.user_id = u.user_id

    In Flink the join's right input is an updating table: every +U on a
    user's count retracts ALL previously-emitted join rows for that user
    and re-emits them with the new count.  Here, per micro-batch,
    foreachBatch (1) appends the batch's events to the join's LEFT-side
    state (a self-compacting SegmentStore — the join operator's keyed
    left state, bounded files over any uptime), (2) recomputes the new
    ABSOLUTE count for exactly the touched users from that log and
    synthesizes the ``-U/+U`` changelog against the keyed mirror
    (ChangelogNormalize), (3) re-emits every logged event of a changed
    user with its +U count and MERGEs by event_id into the sink —
    the set-based form of Flink's join-state re-emission, and (4)
    upserts the mirror and marks the batch ledger.

    The ``-U`` rows need no sink deletes: the join key set never
    shrinks (counts grow monotonically; an inner-join match can't
    disappear), so each -U's rows are replaced by its +U's in the same
    MERGE — the precondition is stated and relied on exactly as in the
    Top-N eviction rule; a retractable source would add -D MERGEs keyed
    by event_id.  Per-batch work ∝ logged events of users TOUCHED in
    the batch (Flink's own re-emission cost), never untouched history.

    Every state mutation is an absolute-value MERGE or an idempotent
    log append, so a crash at ANY point between them converges on
    replay (the recomputed counts are absolute, from the log, not
    mirror+delta) — pinned by tests/test_r8_ops.py; chunk-slicing
    invariance likewise.  Drained sink = every event enriched with its
    user's final count = the batch join (the DuckDB oracle)."""
    return _join_retract_run(spark, sf_dir)


def _join_retract_run(
    spark: SparkSession,
    sf_dir: str,
    crash_once_at: int | None = None,
    chunks: int | None = None,
    crash_times: int = 1,
) -> DataFrame:
    from ..streaming.segments import SegmentStore
    from .streaming_queries import _CHUNKS, _FILES_PER_TRIGGER, _work_dir

    wd = _work_dir(sf_dir, "s_join_retract")
    sdf = replay.replay_table(
        spark, sf_dir, "events", os.path.join(wd, "src"),
        chunks=chunks if chunks is not None else _CHUNKS,
        files_per_trigger=_FILES_PER_TRIGGER,
    )
    run = uuid.uuid4().hex[:8]
    url = jdbc_mod.derby_url(os.path.join(wd, f"derby-{run}"))
    mirror = jdbc_mod.JdbcTableSource(url, "JR_MIRROR")
    out = jdbc_mod.JdbcTableSource(url, "JR_OUT")
    ledger = retract.BatchLedger(jdbc_mod.JdbcTableSource(url, "JR_LEDGER"))
    mirror.ensure_table(
        spark.createDataFrame([], "user_id long, cnt long"), overwrite=True
    )
    out.ensure_table(
        spark.createDataFrame([], "event_id long, user_id long, cnt long"),
        overwrite=True,
    )
    ledger.init(spark)
    log = SegmentStore(
        spark, os.path.join(wd, f"evlog-{run}"), compact_every=2
    )
    crashed = {"n": 0}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if ledger.seen(spark, batch_id):
            return  # committed batch replayed after a crash: no-op
        batch_df = batch_df.persist()
        try:
            # (1) left-side join state: append this batch's events
            log.append(batch_df.select("event_id", "user_id"), batch_id)
            changed = batch_df.select("user_id").distinct()
            affected = log.read().join(changed, "user_id")
            # (2) new ABSOLUTE counts for touched users, from the log
            # (absolute ⇒ every downstream MERGE is idempotent under
            # crash replay, unlike mirror+delta)
            batch_l1 = affected.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("cnt")
            )
            changelog = retract.synthesize_retractions(
                batch_l1, mirror.scan(spark), ["user_id"], ["cnt"]
            )
            upserts = changelog.filter(F.col("_rowkind") != "-U").select(
                "user_id", "cnt"
            )
            # (3) join-state re-emission: every logged event of a
            # changed user pairs with its +U count
            joined = affected.join(upserts, "user_id").select(
                "event_id", "user_id", "cnt"
            )
            out.upsert(joined, pk_cols=["event_id"])
            if crash_once_at == batch_id and crashed["n"] < crash_times:
                crashed["n"] += 1
                # worst spot: sink mutated, mirror/ledger uncommitted
                raise RuntimeError("injected crash before ledger mark")
            mirror.upsert(upserts, pk_cols=["user_id"])
            ledger.mark(spark, batch_id)
        finally:
            batch_df.unpersist()

    ckpt = os.path.join(wd, f"ckpt-{run}")
    with _stream_shuffle_partitions(spark):
        for _ in range(crash_times if crash_once_at is not None else 0):
            try:
                replay.run_foreach_batch(sdf, fold, checkpoint_dir=ckpt)
                raise AssertionError("injected crash did not fire")
            except Exception as e:
                if "injected crash" not in str(e):
                    raise
        replay.run_foreach_batch(sdf, fold, checkpoint_dir=ckpt)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out.scan(spark).select("event_id", "user_id", "cnt")


@register(
    "s_outer_join_retract_stream",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id
    FROM (SELECT event_id, user_id FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT event_id, user_id FROM events
               WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
    """,
    survey="§7.4-retract J2 X2 X4",
    tags=("streaming",),
)
def s_outer_join_retract_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular (unwindowed) LEFT OUTER stream-stream join — Flink's
    retraction-PRODUCING join (the §7.4 shapes above consume changelogs;
    this operator is where changelogs are BORN in Flink):

        SELECT v.event_id, p.event_id, v.user_id
        FROM views v LEFT JOIN purchases p ON v.user_id = p.user_id

    Flink semantics: a view with no purchase yet emits +I(v, NULL)
    immediately; the user's FIRST purchase retracts that null-padded row
    (-D) and re-emits +I(v, p) — the null flip is the canonical
    retraction.  Here, per micro-batch, foreachBatch (1) appends each
    side's rows to its join state (self-compacting SegmentStores — both
    sides' keyed state, bounded files over any uptime), (2) emits
    INCREMENTALLY, Flink's actual algorithm: each (view, purchase) pair
    lands exactly once, in the batch where the later side arrives (new
    views LEFT-join the purchase log — the NULL pad for the unmatched —
    and new purchases inner-join the previously-logged views), and
    (3) synthesizes retractions from the LOGS — '-D' for the null rows
    of users whose FIRST purchase arrived this batch — applied with the
    additions in ONE changelog MERGE keyed on (view_id,
    purchase-or-sentinel).  Untouched users cost nothing; per-batch sink
    volume ∝ NEW pairs (plus first-match retractions), not touched-key
    state — the r8 shape re-merged the full state per batch and that
    Derby insert volume was the bench's streaming floor.

    Every emission set derives from batch_df plus the idempotently-
    converged logs, so a crash between the MERGE and the ledger mark
    replays identically: re-staged deletes hit already-absent rows
    (MERGE no-op) and upserts are idempotent — pinned by
    tests/test_r8_tail.py, chunk-slicing invariance likewise.  Drained
    snapshot = the batch LEFT JOIN (the DuckDB oracle): every view
    paired with all its user's purchases, or with NULL if that user
    never purchases."""
    return _outer_join_retract_run(spark, sf_dir)


def _outer_join_retract_run(
    spark: SparkSession,
    sf_dir: str,
    crash_once_at: int | None = None,
    chunks: int | None = None,
    crash_times: int = 1,
) -> DataFrame:
    from ..streaming.segments import SegmentStore
    from .streaming_queries import _CHUNKS, _FILES_PER_TRIGGER, _work_dir

    wd = _work_dir(sf_dir, "s_outer_join_retract")
    sdf = replay.replay_table(
        spark, sf_dir, "events", os.path.join(wd, "src"),
        chunks=chunks if chunks is not None else _CHUNKS,
        files_per_trigger=_FILES_PER_TRIGGER,
    )
    run = uuid.uuid4().hex[:8]
    url = jdbc_mod.derby_url(os.path.join(wd, f"derby-{run}"))
    out = jdbc_mod.JdbcTableSource(
        url, "OJ_OUT", column_types={"op": "VARCHAR(4)"}
    )
    ledger = retract.BatchLedger(jdbc_mod.JdbcTableSource(url, "OJ_LEDGER"))
    out.ensure_table(
        spark.createDataFrame(
            [], "view_id long, b_key long, user_id long"
        ),
        overwrite=True,
    )
    ledger.init(spark)
    llog = SegmentStore(spark, os.path.join(wd, f"vlog-{run}"), compact_every=2)
    rlog = SegmentStore(spark, os.path.join(wd, f"plog-{run}"), compact_every=2)
    crashed = {"n": 0}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if ledger.seen(spark, batch_id):
            return  # committed batch replayed after a crash: no-op
        batch_df = batch_df.persist()
        try:
            # (1) both sides' join state: idempotent per-batch appends
            llog.append(
                batch_df.filter(F.col("event_type") == "view")
                .select("event_id", "user_id"),
                batch_id,
            )
            rlog.append(
                batch_df.filter(F.col("event_type") == "purchase")
                .select("event_id", "user_id"),
                batch_id,
            )
            touched = batch_df.select("user_id").distinct()
            l_aff = llog.read().join(touched, "user_id")
            r_aff = rlog.read().join(touched, "user_id")
            # (2) INCREMENTAL emission — Flink's actual join algorithm:
            # a (view, purchase) pair is emitted exactly once, in the
            # batch where the LATER side arrives.  New views pair with
            # every logged purchase (LEFT, so a still-unmatched view
            # gets its +I(v, NULL) pad immediately); new purchases pair
            # with previously-logged views only (new views were covered
            # by the first set — the split keeps the two PK-disjoint,
            # no dedup needed).  Re-MERGEing the full touched-key state
            # per batch was the r8 bench's Derby-insert floor: O(state)
            # rows written per batch vs O(new pairs) here.
            new_l = batch_df.filter(
                F.col("event_type") == "view"
            ).select("event_id", "user_id")
            add_new_views = (
                new_l.withColumnRenamed("event_id", "view_id")
                .join(
                    r_aff.withColumnRenamed("event_id", "purchase_id"),
                    "user_id",
                    "left",
                )
                .select(
                    "view_id",
                    F.coalesce("purchase_id", F.lit(-1)).alias("b_key"),
                    "user_id",
                )
            )
            old_views = l_aff.join(
                new_l.select("event_id"), "event_id", "left_anti"
            )
            desired = add_new_views.unionByName(
                old_views.withColumnRenamed("event_id", "view_id")
                .join(
                    batch_df.filter(F.col("event_type") == "purchase")
                    .select(
                        F.col("event_id").alias("purchase_id"), "user_id"
                    ),
                    "user_id",
                )
                .select(
                    "view_id",
                    F.col("purchase_id").alias("b_key"),
                    "user_id",
                )
            )
            # (3) retractions derived from the LOGS, never a sink scan:
            # a stale (view, NULL) row exists exactly for users whose
            # FIRST purchase arrived in this batch (they were unmatched
            # before, so every logged view carried the null pad) —
            # computable as new-purchase users minus prior-purchase
            # users, keeping per-batch I/O ∝ touched-key state.  On a
            # crash replay the idempotent log append already holds this
            # batch's rows, and the prior set (log MINUS this batch by
            # event_id) is unchanged — the same deletes re-stage against
            # already-absent rows, a MERGE no-op.
            new_r = batch_df.filter(
                F.col("event_type") == "purchase"
            ).select("event_id", "user_id")
            prior_users = (
                rlog.read()
                .join(new_r.select("event_id"), "event_id", "left_anti")
                .select("user_id")
                .distinct()
            )
            first_users = (
                new_r.select("user_id").distinct()
                .join(prior_users, "user_id", "left_anti")
            )
            retractions = (
                l_aff.join(first_users, "user_id")
                .select(
                    F.col("event_id").alias("view_id"),
                    F.lit(-1).alias("b_key"),
                    "user_id",
                )
                .withColumn("op", F.lit("-D"))
            )
            additions = desired.withColumn("op", F.lit("+I"))
            out.upsert(
                retractions.unionByName(additions),
                pk_cols=["view_id", "b_key"],
                op_col="op",
            )
            if crash_once_at == batch_id and crashed["n"] < crash_times:
                crashed["n"] += 1
                # worst spot: sink mutated, ledger uncommitted
                raise RuntimeError("injected crash before ledger mark")
            ledger.mark(spark, batch_id)
        finally:
            batch_df.unpersist()

    ckpt = os.path.join(wd, f"ckpt-{run}")
    with _stream_shuffle_partitions(spark):
        n_crashes = crash_times if crash_once_at is not None else 0
        for attempt in range(n_crashes):
            try:
                replay.run_foreach_batch(sdf, fold, checkpoint_dir=ckpt)
                raise AssertionError("injected crash did not fire")
            except Exception as e:
                if "injected crash" not in str(e):
                    raise
            # restart-from-scratch resume: a fresh checkpoint each time
            shutil.rmtree(ckpt, ignore_errors=True)
            ckpt = os.path.join(wd, f"ckpt-{run}-resume{attempt}")
        replay.run_foreach_batch(sdf, fold, checkpoint_dir=ckpt)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out.scan(spark).select(
        "view_id",
        F.when(F.col("b_key") >= 0, F.col("b_key")).alias("purchase_id"),
        "user_id",
    )
