"""Round-6 continuation operators: plan pins + semantic invariants for
the streaming LSH dedup, DSIR resampling, quantifier MATCH_RECOGNIZE,
HOP window join and rank-based Top-N."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_19_source_spark.plans import audit
from flink_1_19_source_spark.registry import REGISTRY, queries
from flink_1_19_source_spark.tables import load_table

queries()


def test_dsir_weights_join_is_broadcast(spark, sf_dir):
    """The O(buckets) weight table must broadcast into the token join —
    a shuffle join there would move the whole tokenized corpus twice."""
    df = REGISTRY["n6_dsir_resample"].fn(spark, sf_dir)
    assert audit.has_broadcast_join(df), audit.plan_text(df, "simple")


def test_dsir_scores_separate_target_language(spark, sf_dir):
    """The integer importance score must actually separate the corpora:
    target-language (en) docs score higher on average than the rest —
    the gate is useful, not just well-typed."""
    rows = REGISTRY["n6_dsir_resample"].fn(spark, sf_dir).collect()
    en = [r.score for r in rows if r.lang == "en"]
    rest = [r.score for r in rows if r.lang != "en"]
    assert en and rest
    assert sum(en) / len(en) > 0 > sum(rest) / len(rest)
    # ranks are dense over the kept set, starting at 1
    kept = sorted(r.sample_rank for r in rows if r.keep)
    assert kept == list(range(1, len(kept) + 1))


def test_quantifier_match_measures_are_consistent(spark, sf_dir):
    """S (C|V){2,3} P: every match has n_rows = n_c + n_v + 2 and the
    quantifier bound 2..3 actually binds the middle run."""
    rows = REGISTRY["x5_quantifier_alternation"].fn(spark, sf_dir).collect()
    assert rows, "expected at least one match at test SF"
    for r in rows:
        assert r.n_rows == r.n_c + r.n_v + 2, r
        assert 2 <= r.n_c + r.n_v <= 3, r
        assert r.first_ts <= r.last_ts, r


def test_topn_with_ties_keeps_whole_tie_groups(spark, sf_dir):
    """RANK-based Top-N must include EVERY row of a value bucket that
    ties into the top 3 — a partially-included tie group would be
    ROW_NUMBER semantics leaking through."""
    res = REGISTRY["o6b_topn_with_ties"].fn(spark, sf_dir)
    got = res.groupBy("user_id", "vb").count().collect()
    raw = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.floor(F.col("value") / 100).cast("long").alias("vb"))
        .count()
        .collect()
    )
    raw_counts = {(r.user_id, r.vb): r["count"] for r in raw}
    for r in got:
        assert r["count"] == raw_counts[(r.user_id, r.vb)], (
            f"tie group {(r.user_id, r.vb)} partially included: "
            f"{r['count']} of {raw_counts[(r.user_id, r.vb)]}"
        )


def test_hop_window_join_no_nested_loop(spark, sf_dir):
    """The HOP join must stay an equi hash join on (key, window) — the
    2x window expansion must not degrade it to a nested loop."""
    df = REGISTRY["j8d_hop_window_join"].fn(spark, sf_dir)
    txt = audit.plan_text(df, "simple")
    assert "BroadcastNestedLoopJoin" not in txt, txt
    assert audit.has_pushed_filter(df, "event_type"), audit.plan_text(df)


def test_minhash_dedup_stream_matches_batch_replay(spark, sf_dir):
    """The online verdicts equal the one-shot batch computation: dup_of =
    min earlier doc sharing a band (the oracle's formulation, recomputed
    here Spark-side from the same band buckets)."""
    from flink_1_19_source_spark.operators import dedup

    d = load_table(spark, sf_dir, "documents")
    buckets = dedup.minhash_band_buckets(d, "doc_id", "text", n=3, num_hashes=32, bands=8)
    flat = buckets.select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = flat.select(F.col("id").alias("eid"), "band", "key")
    batch = (
        flat.join(a, ["band", "key"])
        .filter(F.col("eid") < F.col("id"))
        .groupBy("id")
        .agg(F.min("eid").alias("dup_of"))
        .collect()
    )
    expected = {r.id: r.dup_of for r in batch}
    got = REGISTRY["s_minhash_dedup_stream"].fn(spark, sf_dir).collect()
    assert len(got) == d.count()
    for r in got:
        assert r.dup_of == expected.get(r.doc_id), (r, expected.get(r.doc_id))
        assert r.is_dup == (r.doc_id in expected), r


def test_quantile_sketch_rank_limit_is_map_side(spark, sf_dir):
    """The bottom-k selection must prune to k rows per group BEFORE the
    shuffle (WindowGroupLimit Partial) — the property that keeps the
    sketch O(groups x k x mappers) on the wire at 100 TB."""
    df = REGISTRY["a16_quantile_sketch"].fn(spark, sf_dir)
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in txt and "Partial" in txt, txt


def test_restart_with_changed_shuffle_partitions(spark, sf_dir, tmp_path):
    """X4 operational pin: restarting a stateful query from its
    checkpoint under a DIFFERENT spark.sql.shuffle.partitions must
    converge to the uninterrupted run's answer — the state-store
    partition count is recorded in the checkpoint and silently wins
    over the new session conf (Flink analog: restoring a savepoint
    keeps the operator's key-group range)."""
    import os
    import shutil

    from flink_1_19_source_spark.streaming import replay

    src = os.path.join(sf_dir, "events.parquet")
    chunks = str(tmp_path / "chunks")
    held = str(tmp_path / "held")
    replay.split_into_chunks(src, chunks, "ts", 4)
    os.makedirs(held)
    files = sorted(os.listdir(chunks))
    for f in files[2:]:
        shutil.move(os.path.join(chunks, f), os.path.join(held, f))
    schema = spark.read.parquet(chunks).schema

    def run(n_parts, out, ckpt):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", n_parts)
        try:
            sdf = replay.read_stream(spark, chunks, schema, 1)
            agg = (
                sdf.withWatermark("ts", "10 minutes")
                .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            q = (
                agg.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    out_a, ckpt_a = str(tmp_path / "out_a"), str(tmp_path / "ckpt_a")
    run("8", out_a, ckpt_a)  # phase 1: half the stream at 8 partitions
    for f in files[2:]:
        shutil.move(os.path.join(held, f), os.path.join(chunks, f))
    run("16", out_a, ckpt_a)  # restart, conf says 16 — checkpoint wins

    out_b, ckpt_b = str(tmp_path / "out_b"), str(tmp_path / "ckpt_b")
    run("8", out_b, ckpt_b)  # uninterrupted reference over the full data

    def snap(path):
        return sorted(
            (r.ws, r.event_type, r.n)
            for r in spark.read.parquet(path)
            .select(F.col("w.start").alias("ws"), "event_type", "n")
            .collect()
        )

    a, b = snap(out_a), snap(out_b)
    assert a == b, f"restart diverged: {len(a)} vs {len(b)} rows"
    assert a, "no windows closed — test is vacuous"


def test_minhash_dedup_stream_crash_replay(spark, sf_dir):
    """X4 pin for the streaming LSH dedup: a crash injected AFTER a torn
    (partial) state segment lands but BEFORE the batch's verdicts commit,
    then a restart on the same checkpoint, must converge to the clean
    run's verdicts — the replayed batch sees its own torn rows in the
    index, which the strict doc_id ordering and MIN/COUNT(DISTINCT)
    aggregates absorb."""
    from flink_1_19_source_spark.queries.llm_dedup import _minhash_dedup_run

    clean = {
        r.doc_id: (r.dup_of, r.is_dup, r.n_dup_bands)
        for r in _minhash_dedup_run(spark, sf_dir).collect()
    }
    crashed = {
        r.doc_id: (r.dup_of, r.is_dup, r.n_dup_bands)
        for r in _minhash_dedup_run(spark, sf_dir, crash_once_at=1).collect()
    }
    assert clean and crashed == clean
