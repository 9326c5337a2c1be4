#!/usr/bin/env python
"""Benchmark harness: time every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing is end-to-end per query (plan + execute + materialize via
collect()) on a warmed SparkSession, so it captures what a user pays:
Catalyst planning, shuffles, and Arrow/JVM boundaries included.

Output-size contract: the driver keeps only the LAST 2000 characters of
stdout and parses the final line as JSON — a full 100+-query timing dict
overflows that window and truncates the line mid-JSON (round-1 lesson).
So stdout carries a compact line (headline queries + aggregates, < 1.5 KB)
and the complete per-query timing map goes to BENCH_FULL.json next to
this script. stdout is also dup2-redirected to stderr for the whole run
so no library print can ever precede or split the JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline queries on the compact stdout line: one representative per major
# SURVEY §2 area (agg, join, window, over, set, scalar, streaming, LLM-ops).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "j1_inner_equi",
    "j6_asof_join",
    "j_bucketed_colocated",
    "a4_grouping_sets",
    "w4_session",
    "o6_topn_pattern",
    "t5_intersect_all",
    "f_string_family",
    "x5_match_recognize_abc",
    "n1_exact_dedup",
    "n2_minhash_lsh_pairs",
    "n2_dedup_clusters",
    "n3_cosine_topk",
    "n4_lang_id",
    "s_tumble_stream",
    "s_sessionize_timers",
    "s_interval_join_stream",
    "x8_iterate_bfs",
    "w7_window_topn",
    "s_count_tumble_stream",
    "n2_dedup_end_to_end",
    "src_kafka_roundtrip",
    "s_kafka_idle_partition",
    "f_similar_to_family",
    "q9_product_type_profit",
    "s_allowed_lateness_stream",
    "src_avro_roundtrip",
    "n4_pii_redact",
    "n6_sequence_packing",
    "s_temporal_join_stream",
    "w4b_dynamic_gap_session",
    "s_dynamic_gap_session_stream",
    "sql_statement_set",
    "s_kafka_aligned_read",
    "a14_bloom_portable",
    "n1_chunk_dedup",
    "n1_incremental_dedup",
    "pipeline_corpus_end_to_end",
    "x8_pagerank",
    "s_pattern_within_stream",
    # r8 representatives (join the median-of-3 tier from BENCH_r08 on)
    "n4_lm_surprisal_filter",
    "x6_scd2_history",
    "n6_quota_mix",
    "n3_ivfpq_topk",
    # r8 tail wave representatives
    "x5_iterative_condition",
    "s_outer_join_retract_stream",
    "n4_unigram_encode",
    "n3_maxsim_topk",
    "n5_gif_decode_real",
    # r10 representatives
    "n2_suffix_array_spans",
    "n3_hnsw_topk",
    "n4_logistic_train",
    "n5_audio_downsample_pipeline_real",
    # r11 representatives
    "n3_knn_graph_blocked",
    "n4_bpe_bytelevel_train",
    "s_exactsubstr_cut_stream",
]

# Correctness-only queries whose runtime is dominated by oracle scaffolding,
# not the operator users run — excluded from the timed set (the note lands in
# BENCH_FULL.json). Empty since r5: the rows-only a9b was retired (every
# registered query is now oracled), so a9 carries the HLL timing — its 4x
# Expand is the price of in-query certification, noted here for profile
# readers.
EXCLUDED: dict[str, str] = {}

# Recycle the SparkSession every N timed queries: one long-lived session
# accumulates debris a 355-query run turns into fake regressions — memory-
# sink tables from 150+ drained streams, localCheckpoint blocks, codegen
# classes, GC pressure (r8: x5_match_recognize_abc read 6.5x its solo time
# purely from session position). Restart cost (~10 s) x 2 is cheap against
# un-attributable drift. Per-query scrubbing below handles the rest.
RECYCLE_EVERY = 120


def _scrub(spark, keep_views: set[str]) -> None:
    """Drop what the previous query left behind so the next query's timing
    is position-independent: cached plans, persisted/localCheckpoint RDD
    blocks, and temp views it created (memory-sink tables of drained
    streams hold their full result set on the driver until dropped)."""
    spark.catalog.clearCache()
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(False)
    for t in spark.catalog.listTables():
        if t.isTemporary and t.name not in keep_views:
            spark.catalog.dropTempView(t.name)
    # collect the previous query's garbage OUTSIDE the timed region, so
    # the next query doesn't pay the last one's collection debt as fake
    # per-query time (scrub runs in the finally AFTER the timer stops;
    # wall-clock cost here never enters the metric)
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def main() -> None:
    # Guard the stdout contract before the JVM inherits fd 1: everything the
    # process (or Spark) prints goes to stderr; only the final JSON line is
    # written to the real stdout.
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr
    try:
        _run(real_stdout)
    except BaseException as ex:
        # never leave the driver an empty stdout window: a structured
        # failure record is still ONE parseable JSON line
        line = json.dumps(
            {
                "metric": "total_query_seconds",
                "value": None,
                "unit": "sec",
                "failed": {"__bench__": f"{type(ex).__name__}: {ex}"[:300]},
            },
            separators=(",", ":"),
        )
        os.write(real_stdout, (line + "\n").encode())
        raise


def _run(real_stdout: int) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from flink_1_19_source_spark.registry import queries
    from flink_1_19_source_spark.session import get_spark

    from flink_1_19_source_spark.queries.joins import ensure_bucketed_tables

    def fresh_session():
        spark = get_spark(app_name="bench")
        spark.sparkContext.setLogLevel("ERROR")
        # warm the JVM / codegen / parquet footer caches with a trivial pass
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
        # pre-build the co-bucketed warehouse tables: a one-time ETL step,
        # not part of the join j_bucketed_colocated measures
        ensure_bucketed_tables(spark, sf_dir)
        base_views = {
            t.name for t in spark.catalog.listTables() if t.isTemporary
        }
        return spark, base_views

    spark, base_views = fresh_session()
    qs = queries()

    import statistics

    # Prior run's per-query timings: any single-run query that lands
    # >1.5x its previous number gets two confirmation runs (median of
    # 3 accepted instead) — machine-load spikes can no longer masquerade
    # as per-query regressions (the r10 lesson: a 44% uniform drift on
    # untouched queries cost a round of adjudication).
    prev_times: dict[str, float] = {}
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    try:
        with open(full_path) as f:
            prev_times = json.load(f).get("queries", {})
    except Exception:
        pass

    load_start = os.getloadavg()

    times: dict[str, float] = {}
    samples_map: dict[str, list[float]] = {}
    failed: dict[str, str] = {}
    rebenched: list[str] = []
    headline = set(HEADLINE)

    def timed_run(name: str) -> float:
        t0 = time.perf_counter()
        rows = qs[name](spark, sf_dir).collect()
        _ = len(rows)
        return time.perf_counter() - t0

    for i, name in enumerate(sorted(qs)):
        if name in EXCLUDED:
            continue
        if i and i % RECYCLE_EVERY == 0:
            spark.stop()
            spark, base_views = fresh_session()
        # Headline queries: median of 3 runs, so same-machine variance
        # (±7% observed between back-to-back solo runs) can't masquerade
        # as a regression — round-to-round drift on a median is signal.
        # The long tail stays single-run unless it trips the 1.5x
        # regression check against the prior BENCH_FULL.json.
        runs = 3 if name in headline else 1
        samples: list[float] = []
        try:
            for _ in range(runs):
                samples.append(timed_run(name))
            prev = prev_times.get(name)
            if (
                runs == 1
                and prev is not None
                and samples[0] > 1.5 * prev
                and samples[0] - prev > 0.5
            ):
                samples.append(timed_run(name))
                samples.append(timed_run(name))
                rebenched.append(name)
            times[name] = round(statistics.median(samples), 3)
            if len(samples) > 1:
                samples_map[name] = [round(s, 3) for s in samples]
        except Exception as ex:  # keep benching; a failed query is reported
            failed[name] = f"{type(ex).__name__}: {ex}"[:200]
        finally:
            try:
                _scrub(spark, base_views)
            except Exception:
                pass  # scrubbing is hygiene, never a bench failure

    total = round(sum(times.values()), 3)
    stream_sec = round(sum(v for k, v in times.items() if k.startswith("s_")), 3)
    # Machine-load context: 1/5/15-min loadavg at start and end, so a
    # reader can tell a loaded-box run (r10: driver 811s vs solo 648s on
    # identical code) from a genuine plan regression.
    load_ctx = {
        "loadavg_start": [round(v, 2) for v in load_start],
        "loadavg_end": [round(v, 2) for v in os.getloadavg()],
        "cpus": os.cpu_count(),
    }
    full = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "load": load_ctx,
    }
    if failed:
        full["failed"] = failed
    if EXCLUDED:
        full["excluded"] = EXCLUDED
    if samples_map:
        full["headline_samples"] = samples_map  # raw 3-run timings
    if rebenched:
        full["rebenched"] = rebenched  # tripped the 1.5x check; median-of-3
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1)

    compact = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": {k: times[k] for k in HEADLINE if k in times},
        "sf": full["sf"],
        "n_queries": len(times),
        "n_failed": len(failed),
        "headline_runs": 3,  # headline values are medians of 3
        "n_rebenched": len(rebenched),  # tail queries that tripped 1.5x
        "load": load_ctx,

        "batch_sec": round(total - stream_sec, 3),
        "stream_sec": stream_sec,
        "full_timings": "BENCH_FULL.json",
    }
    spark.stop()
    line = json.dumps(compact, separators=(",", ":")) + "\n"
    os.write(real_stdout, line.encode())


if __name__ == "__main__":
    main()
