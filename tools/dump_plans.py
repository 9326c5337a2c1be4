#!/usr/bin/env python
"""Generate PLANS.md: formatted physical plans for the headline queries.

The scale argument (SURVEY §4, README) is only credible if the plans are
inspectable: this dumps `explain("formatted")` for a representative query
per operator family, with the properties that matter at 100 TB called out
mechanically (PushedFilters, ReadSchema width, broadcast joins, codegen
spans, exchange count). Re-run after any operator change:

    python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# query → why this plan is the evidence
HEADLINERS = {
    "q1_pricing_summary": "scan→filter→agg→sort: pushdown + pruning + single shuffle",
    "q3_shipping_priority": "3-way join: broadcast dims, shuffle only the fact",
    "q5_local_supplier_volume": "5-way join: join order + broadcast selection",
    "j1_inner_equi": "equi-join strategy selection",
    "j5_interval_join": "non-equi time-range join",
    "j6_asof_join": "custom as-of join: union-tag + window, one shuffle",
    "j_bucketed_colocated": "bucketed fact⋈fact: zero-exchange sort-merge join",
    "a4_grouping_sets": "multi-grouping Expand",
    "o4_agg_over_frames": "window frames: single sort per partition spec",
    "w3_cumulate": "custom CUMULATE: explode + window agg",
    "n1_exact_dedup": "exact dedup: single shuffle",
    "n2_minhash_lsh_pairs": "MinHash+LSH band self-join",
    "n2_ngram_jaccard_capped": (
        "stop-shingle-capped inverted-index self-join: each shingle with "
        "document frequency d yields O(d^2) candidate pairs, so the join's "
        "total fan-out is bounded by n_shingles x cap^2 after the df<=cap "
        "semi-join (same shuffle key as the self-join — no extra exchange "
        "pattern); uncapped, one hot boilerplate shingle is quadratic"
    ),
    "src_jdbc_scan": "JDBC range-partitioned scan: filter pushed into remote SQL",
    "q8_market_share": "8-way join: every dim broadcast, one fact shuffle",
    "q9_product_type_profit": (
        "widest join fan (fact x derived-partsupp x part x orders x "
        "supplier x nation): dims broadcast, partsupp rides the fact's "
        "(partkey, suppkey) keys, orders is the one shuffled join"
    ),
    "src_avro_roundtrip": (
        "pure-Python Avro: distributed per-partition container write, "
        "binaryFile + mapInPandas decode — the Python stages are the "
        "format codec only, never the query operators"
    ),
    "q21_waiting_orders": (
        "EXISTS/NOT-EXISTS decorrelated: per-order flags on the same "
        "orderkey shuffle + semi-join, no correlated re-scan"
    ),
    "q17_small_quantity_revenue": (
        "correlated scalar subquery decorrelated: threshold agg on the "
        "broadcast-filtered subset, full fact never shuffles"
    ),
    "n3_cosine_topk": "ANN brute-force: broadcast queries, no corpus shuffle",
    "n4_tfidf": "tf-idf: explode + two aggs",
    "udf_scalar_pandas": "Arrow-batched pandas UDF boundary",
    "n6_stratified_sample": (
        "deterministic hash sampling: pure scan-side expressions, zero "
        "shuffle — a 100 TB corpus samples at I/O speed"
    ),
    "w7_window_topn": (
        "Window Top-N: WindowGroupLimit pushes the top-3 cut map-side "
        "before the rank exchange, so the second shuffle carries <=3 rows "
        "per window per map partition"
    ),
    "n2_dedup_end_to_end": (
        "full near-dup removal: capped pair mine -> iterative components "
        "(localCheckpoint-bounded plan) -> broadcast anti-join of the "
        "drop-list"
    ),
    "src_kafka_offset_scan": (
        "Kafka offset-range consume: (partition, offset) bounds pushed "
        "into the parquet scan — row-group pruning is the broker's offset "
        "index"
    ),
    "x5_match_recognize_abc": (
        "MATCH_RECOGNIZE aggregate fast path: JVM regex over "
        "array_sort(collect_list) symbol strings — one shuffle, no Python"
    ),
    "f_similar_to_family": (
        "SQL:2016 SIMILAR TO -> anchored rlike: whole-stage codegen "
        "expressions, zero shuffle"
    ),
    "n4_pii_redact": (
        "PII scrub: pure per-row regexp rewrite — zero shuffles, the 100 TB "
        "corpus rewrites at scan speed"
    ),
    "n4_contamination": (
        "benchmark-overlap check: benchmark gram set broadcast, corpus side "
        "explode + broadcast-hash left join — no corpus shuffle for the join"
    ),
    "a16_quantile_sketch": (
        "mergeable bottom-k quantile sketch: WindowGroupLimit prunes to k "
        "rows per group map-side (Partial) before the single exchange — "
        "only groups x k x mappers rows ever move"
    ),
    "n6_dsir_resample": (
        "DSIR importance scores: O(buckets) weight table broadcast into "
        "the token join, corpus shuffles once on the hashed bucket id"
    ),
    "j8d_hop_window_join": (
        "HOP window join: bounded 2x covering-window expansion map-side, "
        "then plain hash join on (key, window_start)"
    ),
    "n3_pq_topk": (
        "product quantization + ADC: codebook and per-query lookup table "
        "broadcast everywhere, codes shuffle instead of embeddings — zero "
        "sort-merge joins anywhere in the plan"
    ),
    "n2_substring_dup_spans": (
        "exact substring-dup spans: char-gram hash (8-byte shuffle key, "
        "gram text never shuffles) + df-capped self-join + diagonal "
        "island windows"
    ),
    "n4_model_score_batch": (
        "batch model inference: Catalyst feature extraction feeding one "
        "Arrow-vectorized scorer — map-only, the model rides the task "
        "closure"
    ),
    "x5_skip_modes": (
        "after-match skip policies: both evaluated in ONE keyed "
        "applyInPandas pass — events shuffle and Arrow-transfer once"
    ),
    "n4_repetition_signals": (
        "Gopher repetition metrics: O(n) sorted-run-length folds per row, "
        "no explode, no shuffle (the quadratic distinct-x-filter spelling "
        "measured 26x slower and was rejected)"
    ),
    "n6_sequence_packing": (
        "greedy token packing: one groupBy shuffle, per-group Arrow fold; "
        "pack groups are bounded hash buckets at scale"
    ),
    "n3_int8_topk": (
        "int8-quantized ANN: per-vector scales cancel in cosine, scoring "
        "runs on 4x-smaller vectors with integer-exact arithmetic"
    ),
    "n1_cross_source_dup_matrix": (
        "cross-source dup analytics: self-join on 32-byte fingerprints — "
        "the shuffle moves digests, never documents"
    ),
    "n6_mix_rebalance": (
        "data-derived mixing gate: per-stratum rates broadcast, md5 gate "
        "map-only — rebalancing a 100 TB corpus costs one stats agg + one "
        "scan"
    ),
    "a13_jsonagg_family": (
        "JSON_OBJECTAGG/ARRAYAGG: two-level agg — collect state bounded "
        "by |priorities| per group, never raw rows"
    ),
    "a14_bloom_portable": (
        "portable Bloom: build shuffles <=m distinct bit rows, probe side "
        "joins a broadcast of the bit set — probes never shuffle"
    ),
    "sql_statement_set": (
        "STATEMENT SET: shared scan persisted once; second sink plans an "
        "InMemoryTableScan instead of re-reading parquet"
    ),
    "w4b_dynamic_gap_session": (
        "dynamic-gap sessions: running-max merge frontier + session ids "
        "on ONE per-key sort window, then an ordinary agg"
    ),
    "w9_window_grouping_sets": (
        "window TVF agg with GROUPING SETS: Expand then one partial+final "
        "agg — multi-granularity rollup in a single shuffle"
    ),
    "n1_chunk_dedup": (
        "corpus duplicate-chunk removal: map-only array chunking, one "
        "chunk-keyed shuffle for corpus-first ranking"
    ),
    "x5_pattern_within": (
        "CEP within-window pattern: min-over-following on the per-key "
        "sort — conversion matching with zero range joins"
    ),
    "x8_pagerank": (
        "integer fixed-point PageRank: per round one src join-shuffle + "
        "one dst agg, localCheckpoint-bounded plan, bit-exact math"
    ),
    "j7b_lookup_partial_cache": (
        "PARTIAL-cache lookup: probe side never shuffles; fetch volume "
        "tracks distinct keys per task, accumulator-asserted"
    ),
    "n1_incremental_dedup": (
        "incremental dedup: history reduced to broadcast digests + LSH "
        "bucket keys; the new batch probes map-side"
    ),
    "n6_curriculum_order": (
        "curriculum manifest: per-stratum window + the DISTRIBUTED global "
        "interleave (repartitionByRange + per-partition local rank + "
        "broadcast P-row offsets) — the only SinglePartition exchange in "
        "the plan is the offsets table's, fed by a HashAggregate; the "
        "corpus itself is never sorted in one task"
    ),
    "src_sorted_write": (
        "range-partitioned sorted sink: disjoint per-file key ranges, "
        "asserted from parquet footers"
    ),
    "o4c_time_range_over": (
        "time-interval RANGE frames: one sort exchange per partition "
        "spec, peers aggregate together"
    ),
    # r8 additions
    "n4_lm_surprisal_filter": (
        "bigram LM gate: one bigram-keyed count shuffle, scoring joins "
        "co-partitioned on the same keys — bigram vocab never broadcast"
    ),
    "n6_quota_mix": (
        "Hare apportionment on the 5-row language table, corpus pays one "
        "lang-partitioned hash-rank window + a broadcast quota join"
    ),
    "x6_scd2_history": (
        "SCD2 from changelog: ONE key-partitioned window pass, no "
        "self-join, no history rewrite"
    ),
    "n3_ivfpq_topk": (
        "IVF-PQ: coarse-list pruning + broadcast codebooks, ADC folds "
        "per (query, probed list), exact rerank on the top-64 only"
    ),
    "n3_filtered_ivf_topk": (
        "filtered ANN: metadata predicate joins the index BEFORE "
        "candidate generation — list pruning and parquet filter compose"
    ),
    "a18_theta_sketch_intersect": (
        "theta sketch: per side one distinct pass + rank-limit to k+1 "
        "rows; intersection joins two k-row sets under a broadcast theta"
    ),
    "n2_suffix_array_spans": (
        "suffix-array substring dedup: each prefix-doubling round is one "
        "gpos self-join + a range-partitioned dense rank (row_number "
        "within range partitions + broadcast offsets — no single-task "
        "window); materialized per round, so the plan stays O(1) deep"
    ),
    "n4_logistic_train": (
        "in-engine logistic GD: the scored output plan is one cached "
        "feature scan + codegen'd margin expression; each training "
        "iteration was a map-side-combining 1-row aggregate"
    ),
    "n4_ccnet_buckets": (
        "CCNet buckets: the certified one-shuffle surprisal core plus "
        "ONE per-language NTILE rank window — no second corpus pass"
    ),
    "n6_d4_selection": (
        "D4 selection: cluster-keyed pair join (Σ|cluster|², never "
        "corpus²) + broadcast centroid table + one rank window per "
        "cluster"
    ),
    "pipeline_data_card": (
        "data card: one corpus read feeds fingerprint + gate cores; "
        "two key shuffles (fp, source) and a 20-row report"
    ),
    "n4_kn3_surprisal_filter": (
        "trigram KN: one trigram explode + one trigram-keyed count "
        "shuffle; all four derived stat tables aggregate c3 (no second "
        "corpus pass); scoring co-partitions on (w1,w2)/(w2,w3)"
    ),
    "n3_ivf_trained_topk": (
        "trained-codebook IVF: the Lloyd fit runs on the first "
        "_IVF_FIT_SAMPLE vec_ids only (O(sample) training, one "
        "broadcast join + two small shuffles per round); full-corpus "
        "assignment is one broadcast of the 8x64 centroid table; the "
        "probe join broadcasts the query lists"
    ),
    "n3_hnsw_topk": (
        "distributed graph-ANN build: block-pair grid (hash-packed "
        "sub-matrices crossJoined, one int64 block product per task) "
        "+ ONE global (lvl, src) rank window — no driver collect, no "
        "task sees more than two blocks; search is bounded "
        "frontier-expand joins"
    ),
    "n3_knn_graph_blocked": (
        "sub-quadratic kNN graph: IVF assignment is a broadcast-free "
        "Arrow pass, candidates a plain list_id-keyed shuffle join over "
        "~BLOCK_ROWS sub-blocked list packs (per-task memory bounded "
        "regardless of list skew; the per-list sub-block counts ride a "
        "codebook-sized broadcast), one per-src rank window — "
        "N^2*nprobe/K work, O(N^1.5) under sqrt(N) codebook sizing"
    ),
    "n4_unigram_train": (
        "Unigram-LM EM trainer: one corpus pass to word types, map-only "
        "E-step over distinct words (vocab dict broadcast), one "
        "map-side-combining aggregate per round ending in a model-sized "
        "collect — the llm_train shape"
    ),
    "n5_adpcm_quality_report": (
        "codec quality report: map-only encode->decode->exact-moment "
        "pass, metrics as one shared Spark/DuckDB expression text"
    ),
    "n4_gopher_rules": (
        "Gopher rule set: every metric and cross-multiplied integer rule "
        "is a scan-side array expression — zero shuffles, gopher_pass is "
        "a pushdown-friendly gate"
    ),
    "n2_c4_span_dedup": (
        "C4 3-sentence-span keep-first: map-only span fingerprints, ONE "
        "span_fp-keyed rank shuffle + one doc-keyed re-agg — the "
        "chunk-dedup two-shuffle budget"
    ),
    "x8_label_propagation": (
        "synchronous LPA: per round one neighbor-keyed shuffle + (node, "
        "label) count + node-partitioned rank window — no global window, "
        "rounds x O(|E|) total"
    ),
    "n4_wordpiece_train": (
        "WordPiece trainer: one corpus pass to word types, then 24 "
        "vocabulary-sized rounds (pair counts + unit counts + broadcast "
        "joins + fixed-point argmax collect of ONE row)"
    ),
    "n6_exact_k_sample": (
        "exact-k bottom-k sample: one lang-keyed rank window; "
        "WindowGroupLimit prunes to k rows per stratum map-side before "
        "the exchange"
    ),
    "pipeline_quality_gate_end_to_end": (
        "quality-gate composite: two map-only flag scans joined on "
        "doc_id, one lang-keyed holdout rank window over the kept set, "
        "language-sized ledger"
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from flink_1_19_source_spark.plans import audit
    from flink_1_19_source_spark.registry import REGISTRY, queries
    from flink_1_19_source_spark.session import get_spark

    queries()
    spark = get_spark(app_name="dump-plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — physical-plan evidence for the headline operators",
        "",
        f"Generated by `tools/dump_plans.py` at `{sf_dir}`. Each section is",
        "the Catalyst `explain(\"formatted\")` output plus the mechanically",
        "extracted scale properties the tests assert (tests/test_plans.py).",
        "",
    ]
    for name, why in HEADLINERS.items():
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        df = spec.fn(spark, sf_dir)
        txt = audit.plan_text(df)
        n_shuffles = audit.shuffle_count(df)
        bcast = "yes" if audit.has_broadcast_join(df) else "no"
        scans = audit.read_schema_columns(df)
        widths = ",".join(str(len(s)) for s in scans) or "-"
        out += [
            f"## {name}",
            "",
            f"*{why}*",
            "",
            f"- shuffles (Exchange): **{n_shuffles}**; broadcast join: **{bcast}**; "
            f"scan column counts: **{widths}**",
            "",
            "```",
            txt.rstrip(),
            "```",
            "",
        ]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}: {len(HEADLINERS)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
