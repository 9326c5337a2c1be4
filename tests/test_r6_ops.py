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
