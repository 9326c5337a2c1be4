"""Plan-quality audit (SURVEY §4): the physical plans the engine produces
must keep the properties that make them survive a 100× scale-up —
pushdown, pruning, broadcast joins, whole-stage codegen. A regression here
is a 100 TB incident caught at test time."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_19_source_spark.plans import audit
from flink_1_19_source_spark.registry import REGISTRY, queries
from flink_1_19_source_spark.tables import load_table

queries()


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir):
    df = REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    assert audit.has_pushed_filter(df, "l_shipdate"), audit.plan_text(df)
    cols = audit.read_schema_columns(df)
    assert cols, "no parquet scan found"
    # 16-column lineitem: Q1 needs only 7
    assert all(len(c) <= 8 for c in cols), f"column pruning failed: {cols}"


def test_dim_join_is_broadcast(spark, sf_dir):
    df = REGISTRY["j7_lookup_broadcast"].fn(spark, sf_dir)
    assert audit.has_broadcast_join(df), audit.plan_text(df, "simple")


def test_sql_surface_join_is_broadcast_and_codegen(spark, sf_dir):
    df = REGISTRY["sql_ddl_surface"].fn(spark, sf_dir)
    assert audit.has_broadcast_join(df)
    assert audit.has_whole_stage_codegen(df)


def test_agg_is_partial_then_final_single_shuffle(spark, sf_dir):
    """GROUP BY must shuffle exactly once (partial agg map-side)."""
    df = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert audit.shuffle_count(df) == 1, audit.plan_text(df, "simple")
    txt = audit.plan_text(df, "simple")
    assert txt.count("HashAggregate") == 2, txt  # partial + final


def test_partition_pruning_on_partitioned_layout(spark, sf_dir):
    REGISTRY["src_partitioned_pruning"].fn(spark, sf_dir)  # writes layout
    import os
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(),
        "sgraft_formats",
        os.path.basename(sf_dir.rstrip("/")),
        "part_orders",
        "orders",
    )
    df = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    txt = audit.plan_text(df)
    assert "PartitionFilters" in txt and "o_orderstatus" in txt.split(
        "PartitionFilters", 1
    )[1].split("\n")[0], txt


def test_exact_dedup_single_shuffle(spark, sf_dir):
    df = REGISTRY["n1_exact_dedup"].fn(spark, sf_dir)
    assert audit.shuffle_count(df) == 1, audit.plan_text(df, "simple")


def test_cosine_topk_broadcasts_queries(spark, sf_dir):
    """The query side must broadcast — a shuffle join on the corpus side
    would move the 100 TB."""
    df = REGISTRY["n3_cosine_topk"].fn(spark, sf_dir)
    txt = audit.plan_text(df, "simple")
    assert "BroadcastNestedLoopJoin" in txt or "BroadcastHashJoin" in txt, txt


def test_bucketed_join_shuffles_neither_fact_table(spark, sf_dir):
    """Fact⋈fact co-location: the bucketed sort-merge join must read
    bucket-for-bucket — the only Exchange allowed is the final group-by's
    (the join itself moves zero rows)."""
    df = REGISTRY["j_bucketed_colocated"].fn(spark, sf_dir)
    txt = audit.plan_text(df)
    assert "SortMergeJoin" in txt, txt
    assert "Bucketed: true" in txt, txt
    assert audit.shuffle_count(df) == 1, audit.plan_text(df, "simple")


def test_stratified_sample_zero_shuffle_pruned_scan(spark, sf_dir):
    """N6: the hash gate must stay scan-side — no shuffle, and the scan
    reads only the three projected columns (a sampling pass over 100 TB
    that shuffles or reads full rows is wrong)."""
    df = REGISTRY["n6_stratified_sample"].fn(spark, sf_dir)
    assert audit.shuffle_count(df) == 0, audit.plan_text(df, "simple")
    cols = audit.read_schema_columns(df)
    assert cols and all(c <= {"doc_id", "lang", "source"} for c in cols), cols


def test_window_topn_prunes_rank_map_side(spark, sf_dir):
    """O6 window top-n: Spark must insert WindowGroupLimit before the
    rank exchange (map-side top-k cut) and use exactly two shuffles
    (agg on (window,user), rank on window)."""
    df = REGISTRY["w7_window_topn"].fn(spark, sf_dir)
    txt = audit.plan_text(df)
    assert "WindowGroupLimit" in txt, txt
    assert audit.shuffle_count(df) == 2, audit.plan_text(df, "simple")


def test_bfs_final_plan_is_checkpoint_bounded(spark, sf_dir):
    """X8: after the iterate loop the returned plan must hang off the
    localCheckpoint (O(1) depth), not replay every round's join chain."""
    df = REGISTRY["x8_iterate_bfs"].fn(spark, sf_dir)
    txt = audit.plan_text(df, "simple")
    assert "Scan ExistingRDD" in txt, txt  # checkpointed state, not lineage
    assert "SortMergeJoin" not in txt and "parquet" not in txt.lower(), txt


def test_q21_q8_join_strategies_hold_at_bench_scale(spark):
    """AQE/broadcast thresholds can flip between SFs; pin the load-bearing
    shapes at the BENCH scale factor (sf0.1), not just the test SF:
    q21 must stay the single-pass window-flag plan (ONE lineitem scan, no
    self-joins) with broadcast dims; q8's 8-way join must broadcast every
    dim and shuffle the fact exactly once. Plan-only — nothing executes."""
    import os

    import pytest

    bench_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(bench_sf):
        pytest.skip(f"bench SF dir {bench_sf} not present")
    q21 = REGISTRY["q21_waiting_orders"].fn(spark, bench_sf)
    txt = audit.plan_text(q21, "simple")
    assert txt.lower().count("lineitem") == 1, txt  # no triple self-join
    assert audit.has_broadcast_join(q21)
    assert audit.shuffle_count(q21) <= 2, audit.plan_text(q21, "simple")
    q8 = REGISTRY["q8_market_share"].fn(spark, bench_sf)
    assert audit.has_broadcast_join(q8)
    assert audit.shuffle_count(q8) == 1, audit.plan_text(q8, "simple")


def test_kafka_offset_scan_pushes_partition_offset_filters(spark, sf_dir):
    """S6: the offset-range bounded consume must reach the parquet scan as
    pushed filters on (partition, offset) — row-group pruning playing the
    broker's offset index — and scan zero extra columns beyond the wire
    schema."""
    df = REGISTRY["src_kafka_offset_scan"].fn(spark, sf_dir)
    txt = audit.plan_text(df)
    assert "PushedFilters" in txt, txt
    import re

    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", txt).group(1)
    assert "offset" in pushed and "partition" in pushed, pushed


def test_r13_certification_window_is_pinned():
    """The driver certifies list(REGISTRY)[:50]; this pins the round-13
    window (r12 certification debt + r13 changed-code MUST set +
    oldest-certified padding) so an accidental import reorder can't
    silently rotate it."""
    from flink_1_19_source_spark.queries import _R13_MUST, _R13_PAD

    window = list(REGISTRY)[:50]
    assert window == _R13_MUST + _R13_PAD[: 50 - len(_R13_MUST)]
    # every changed query sits inside the certified prefix
    assert set(_R13_MUST) <= set(window)
    from flink_1_19_source_spark.registry import oracle_sql

    oracles = oracle_sql()
    assert all(n in oracles for n in window), [
        n for n in window if n not in oracles
    ]


def test_contamination_broadcasts_benchmark_grams(spark, sf_dir):
    """The corpus side of the contamination check must never shuffle for
    the join — the benchmark gram set broadcasts (eval sets are tiny; the
    corpus is the 100 TB side)."""
    df = REGISTRY["n4_contamination"].fn(spark, sf_dir)
    assert audit.has_broadcast_join(df), audit.plan_text(df, "simple")
    txt = audit.plan_text(df, "simple")
    assert "SortMergeJoin" not in txt, txt


def test_pii_redact_is_map_only(spark, sf_dir):
    """PII scrub is a pure per-row rewrite: zero shuffles at any scale."""
    df = REGISTRY["n4_pii_redact"].fn(spark, sf_dir)
    assert audit.shuffle_count(df) == 0, audit.plan_text(df, "simple")


def test_repetition_signals_no_explode_shuffle(spark, sf_dir):
    """Repetition metrics fold arrays per row; the only exchange allowed
    is the local-fixture round-robin repartition, never a hash shuffle."""
    df = REGISTRY["n4_repetition_signals"].fn(spark, sf_dir)
    assert audit.shuffle_count(df) == 0, audit.plan_text(df, "simple")
    assert "Generate" not in audit.plan_text(df, "simple")  # no explode


def test_statement_set_second_sink_reads_cached_scan(spark, sf_dir):
    """S12 statement set: with the shared frame persisted, every sink
    after the first plans an InMemoryTableScan instead of re-reading the
    parquet — the Spark analog of Flink's shared source vertex in a
    multi-INSERT job."""
    src = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 2000)
        .select("l_orderkey", "l_returnflag", "l_extendedprice")
    )
    src.persist()
    try:
        src.count()  # materialize, as the first INSERT's write does
        agg = src.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
        plan = audit.plan_text(agg)
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, plan
    finally:
        src.unpersist()


def test_dynamic_gap_session_single_shuffle(spark, sf_dir):
    """W4 dynamic gap: both window passes and the final (user_id, sid)
    aggregate ride ONE user_id hash exchange — HashPartitioning(user_id)
    satisfies the (user_id, sid) clustering, so no second shuffle."""
    df = REGISTRY["w4b_dynamic_gap_session"].fn(spark, sf_dir)
    assert audit.shuffle_count(df) == 1, audit.plan_text(df)


def test_pattern_within_single_shuffle(spark, sf_dir):
    """X5 within-pattern: the min-over-following window is the only
    exchange — no range join, no second sort."""
    df = REGISTRY["x5_pattern_within"].fn(spark, sf_dir)
    assert audit.shuffle_count(df) == 1, audit.plan_text(df)


def test_bloom_probe_broadcasts_bit_set(spark, sf_dir):
    """A14 Bloom: the probe joins a BROADCAST of the <=m-row bit set —
    the probe side itself must not shuffle for the membership join."""
    from flink_1_19_source_spark.operators.sketches import bloom_bits, bloom_probe

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    bits = bloom_bits(o, "o_custkey")
    probe = bloom_probe(c, "c_custkey", bits)
    assert audit.has_broadcast_join(probe), audit.plan_text(probe)


def test_band_join_is_hash_not_nested_loop(spark, sf_dir):
    """J4 band rewrite: the bucketized ε-join must plan as a hash/merge
    equi-join — a BroadcastNestedLoopJoin would mean the rewrite fell
    through to the quadratic path."""
    df = REGISTRY["j4b_band_join"].fn(spark, sf_dir)
    plan = audit.plan_text(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan


def test_pq_topk_joins_all_broadcast(spark, sf_dir):
    """N3 PQ: every join in the PQ/ADC plan must broadcast (codebook and
    LUT are tiny); a sort-merge join would mean the corpus is shuffling
    for metadata."""
    df = REGISTRY["n3_pq_topk"].fn(spark, sf_dir)
    txt = audit.plan_text(df)
    assert "BroadcastHashJoin" in txt
    assert "SortMergeJoin" not in txt, txt


def test_substring_spans_pushdown(spark, sf_dir):
    """N2 substring spans: the doc_id/length prefilters must reach the
    parquet scan — the gram explosion only ever sees qualifying docs."""
    df = REGISTRY["n2_substring_dup_spans"].fn(spark, sf_dir)
    txt = audit.plan_text(df)
    assert "LessThan(doc_id,300)" in txt, txt


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """Flink 1.19's headline batch feature — runtime filters for large
    joins (FLIP-324) — maps to Spark's InjectRuntimeFilter: a selective
    dim-side predicate materializes a bloom filter that prunes the fact
    scan before the shuffle join. Pin that the engine's conf surface can
    produce the shape: plan must contain the bloom_filter_agg creation
    and a might_contain probe on the fact side."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # creation side must fall below this cap for injection
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        txt = audit.plan_text(j)
        assert "bloom_filter_agg" in txt, txt
        assert "might_contain" in txt, txt
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_aqe_skew_join_splits_hot_partition(spark, sf_dir):
    """§4 skew handling: a join keyed 90% onto one value must trigger
    AQE's skew-join split — the executed plan carries SortMergeJoin
    (skew=true) with a skewed AQEShuffleRead — and still return the
    exact row count. This is the runtime half of the skew story
    (skew_salted_agg is the rewrite half)."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.lit("x" * 64).alias("pad"),
        )
        right = spark.range(0, 50_000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("w")
        )
        agg = left.join(right, "k").groupBy().count()
        # 360k rows on k=0 join 50 right rows with k=0 -> 18,000,000
        # + 40k distinct left keys (>=1000, none match) -> 18M
        # + keys 1..999 appear ~? left keys are id (>=10) w/ id%10==9 -> only
        # ids 19,29,..,999 match right keys 19..999 (99 ids x 50 each? no:
        # right has 50 rows per k) -> assert against a computed reference
        n = agg.collect()[0][0]
        lk = {}
        for i in range(0, 400_000):
            k = 0 if i % 10 < 9 else i
            lk[k] = lk.get(k, 0) + 1
        rk = {}
        for i in range(0, 50_000):
            rk[i % 1000] = rk.get(i % 1000, 0) + 1
        expect = sum(c * rk.get(k, 0) for k, c in lk.items())
        assert n == expect, (n, expect)
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def test_media_stage_queries_are_map_only(spark, sf_dir):
    """The r8 real media STAGES (resize / frame-sample / audio features)
    are encode->decode->fold chains inside mapInPandas: zero shuffles —
    the fan-out happens inside the Arrow batch, never via exchange."""
    for name in (
        "n5_image_resize_real",
        "n5_video_frame_sample_real",
        "n5_audio_features_real",
        "n5_jpeg_sa_decode",
    ):
        df = REGISTRY[name].fn(spark, sf_dir)
        assert audit.shuffle_count(df) == 0, (
            name, audit.plan_text(df, "simple"),
        )


def test_quota_mix_broadcasts_quota_table(spark, sf_dir):
    """Hare apportionment runs on the per-language count table; the
    corpus-sized side joins the 5-row quota table by BROADCAST, never a
    shuffled join of corpus x quotas."""
    df = REGISTRY["n6_quota_mix"].fn(spark, sf_dir)
    txt = audit.plan_text(df, "simple")
    assert "BroadcastHashJoin" in txt or "BroadcastNestedLoopJoin" in txt, txt


def test_scd2_history_single_window_pass(spark, sf_dir):
    """SCD2 batch materialization is ONE key-partitioned window over the
    changelog: exactly one hash exchange (the window's), no self-join."""
    df = REGISTRY["x6_scd2_history"].fn(spark, sf_dir)
    txt = audit.plan_text(df, "simple")
    assert audit.shuffle_count(df) <= 1, txt
    assert "SortMergeJoin" not in txt and "HashJoin" not in txt, txt


def test_r8_tail_codec_queries_single_agg_shuffle(spark, sf_dir):
    """GIF / ADPCM / color-progressive decode: encode->decode chains are
    mapInPandas map-only; the ONLY exchange is the final per-doc
    aggregate's partial->final pair."""
    for name in (
        "n5_gif_decode_real",
        "n5_adpcm_decode_real",
        "n5_jpeg_color_progressive_decode",
    ):
        df = REGISTRY[name].fn(spark, sf_dir)
        assert audit.shuffle_count(df) <= 1, (
            name, audit.plan_text(df, "simple"),
        )


def test_maxsim_broadcasts_query_tokens(spark, sf_dir):
    """Late-interaction scoring: the query-token matrix is tiny and must
    BROADCAST against the streaming doc-token side — a shuffled
    corpus x queries join would be the wrong plan at any scale."""
    df = REGISTRY["n3_maxsim_topk"].fn(spark, sf_dir)
    txt = audit.plan_text(df, "simple")
    assert "BroadcastHashJoin" in txt or "BroadcastNestedLoopJoin" in txt, txt


def test_perceptron_result_single_scan_no_join(spark, sf_dir):
    """The trained model is task-closure constants: the final scored
    frame is a projection over the feature scan — no join, no window."""
    df = REGISTRY["n4_perceptron_train"].fn(spark, sf_dir)
    txt = audit.plan_text(df, "simple")
    assert "Join" not in txt, txt


def test_r10c_encode_pipelines_are_map_only(spark, sf_dir):
    """The compressed write paths (FLAC archive, GIF thumbnail) are
    decode->process->ENCODE->decode chains inside mapInPandas: zero
    exchanges — the write path of a media corpus build must stay
    map-only at any scale."""
    for name in (
        "n5_flac_archive_pipeline_real",
        "n5_gif_thumbnail_pipeline_real",
    ):
        df = REGISTRY[name].fn(spark, sf_dir)
        assert audit.shuffle_count(df) == 0, (
            name, audit.plan_text(df, "simple"),
        )


def test_doremi_broadcasts_domain_tables(spark, sf_dir):
    """DoReMi's scoring join shuffles only the token stream against the
    vocabulary-keyed count tables; the DOMAIN-sized frames (per-domain
    totals, the global total, the apportionment scalars) must join by
    broadcast — at 100 TB they are the only parts guaranteed to fit
    anywhere, and a shuffled corpus x domain join would be the
    bottleneck."""
    df = REGISTRY["n6_doremi_weights"].fn(spark, sf_dir)
    txt = audit.plan_text(df, "simple")
    assert "BroadcastHashJoin" in txt or "BroadcastNestedLoopJoin" in txt, txt


def test_audit_trail_reads_corpus_once(spark, sf_dir):
    """The audit is the pipeline's own plan with drops kept: the text
    projection is checkpointed once and every stage reuses it — the
    final plan must not rescan documents.parquet."""
    df = REGISTRY["pipeline_audit_trail"].fn(spark, sf_dir)
    txt = audit.plan_text(df)
    assert "documents.parquet" not in txt, txt[:2000]
