"""Scale-factor sweep: run representative BATCH queries at sf0.001 /
sf0.01 / sf0.1 (100x data spread) and record wall-clock + result rows.

Evidence for the 100 TB story: a plan whose runtime tracks data volume
sublinearly-to-linearly across two decades (while its shape stays fixed
— pushdown/broadcast/single-shuffle, pinned by tests/test_plans.py) has
no hidden quadratic or driver-side bottleneck waiting at cluster scale.
Quadratic shapes (all-pairs joins) show up immediately as super-linear
growth here.

Writes SCALING.md.  Run solo (timings), ~3 min.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = [
    ("sf0.001", "/root/testdata/sf0.001", 0.001),
    ("sf0.01", "/root/testdata/sf0.01", 0.01),
    ("sf0.1", "/root/testdata/sf0.1", 0.1),
]

# Scan/agg, broadcast joins, window functions, the LLM tier's index
# shapes (incl. its heavy hitters), one iterative op, and one drained
# stream (replay-harness fixed cost noted in the table header).
QUERIES = [
    "q1_pricing_summary",       # scan -> partial agg -> 1 shuffle
    "q3_shipping_priority",     # 3-way broadcast join
    "q9_product_type_profit",   # multi-join + agg
    "q18_large_volume_customer",  # semi-join on agg
    "o4_agg_over_frames",       # window frames, 1 sort
    "n1_exact_dedup",           # hash dedup, 1 shuffle
    "n2_minhash_lsh_pairs",     # banded LSH (must NOT be quadratic)
    "n4_tfidf",                 # explode + join + agg
    "n6_stratified_sample",     # zero-shuffle hash gate
    "a16_quantile_sketch",      # map-side rank-limit
    "x8_iterate_bfs",           # bounded iterative joins
    # LLM-tier heavy hitters (the dedup/ANN scale claims need curves,
    # not just plan pins):
    "n2_substring_dup_spans",   # char-gram inverted index, df-capped
    "n3_pq_topk",               # PQ encode + ADC (all-broadcast)
    "pipeline_dsir_end_to_end",  # 2-pass DSIR gate -> winnow dedup
    # one drained stream: per-batch work must track batch size, with the
    # replay harness as a fixed floor
    "s_minhash_dedup_stream",
    # r7 retrieval/tokenizer tier:
    "n4_bm25_topk",             # broadcast-only BM25 (vocab-sized dims)
    "n3_binary_hamming_topk",   # XOR+POPCOUNT prefilter + rerank
    "n4_bpe_train",             # iterative vocab loop (corpus pass + 32 vocab passes)
    "n4_chunk_manifest",        # map-only explode/slice projection
    # r8 additions:
    "n4_lm_surprisal_filter",   # bigram count + co-partitioned score joins
    "n6_quota_mix",             # 5-row apportionment + lang-partitioned rank
    "n3_ivfpq_topk",            # coarse lists + PQ residual ADC + rerank
    "x6_scd2_history",          # changelog -> one window pass
    "n4_wordpiece_encode",      # greedy longest-match over broadcast vocab
    "n5_image_resize_real",
    # r8 tail: tokenizer/LM/training + the new codec tier
    "n4_unigram_encode",        # DP encode, broadcast vocab
    "n4_kn_surprisal_filter",   # KN rationals, one bigram shuffle
    "n4_perceptron_train",      # 8 iterations x map-side agg
    "n3_maxsim_topk",           # broadcast query tokens x doc tokens
    "n5_webp_decode_real",      # VP8L encode+decode, map-only
    "x5_iterative_condition",   # keyed one-pass NFA scan (Catalyst prepass)
    # r9: the retraction tier — the newest state-heavy shapes (per-batch
    # work must track touched-key state; Derby MERGE + replay harness is
    # the fixed floor)
    "s_outer_join_retract_stream",  # retraction-producing outer join
    "s_join_over_agg_retract",      # join over an agg changelog
    "s_window_agg_over_retract",    # window TVF agg over a changelog
    # r9: the crawl composite (every stage individually curved above)
    "pipeline_crawl_end_to_end",
    # r9 additions: truncated-dim ANN, fuzzy decontamination, batching,
    # and one representative of the _scan_by_key CEP rework
    "n3_matryoshka_topk",       # prefix-dim coarse + exact rerank
    "n4_fuzzy_contamination",   # bench shingles broadcast, 1 doc shuffle
    "n6_length_bucketed_batches",  # bit-arith buckets, 1 shuffle
    "x5_reluctant_quantifier",  # keyed regex scan via _scan_by_key
    # r9 third wave (the two shapes without a curve on record)
    "n5_thumbnail_pipeline_real",   # decode->sample->resize->PNG encode
    "n5_corrupt_media_side_output",  # CRC-gated error side, map-only
    # r10 additions
    "n2_suffix_array_spans",    # prefix-doubling ranks, log L rounds
    "n3_hnsw_topk",             # layered graph build + beam search
    "n4_logistic_train",        # hard-sigmoid GD, 1 agg per iteration
    "n5_audio_downsample_pipeline_real",  # WAV decode->decimate->ENCODE
    # r10 continuation: compressed write paths, mixture control, audit
    "n5_flac_archive_pipeline_real",   # gain/clamp -> FLAC ENCODE roundtrip
    "n5_gif_thumbnail_pipeline_real",  # 3-3-2 quantize -> GIF LZW ENCODE
    "n6_doremi_weights",        # 2 vocab shuffles + domain-sized loop
    "n3_hnsw_recall_report",    # exact topk + graph walk, joined
    "pipeline_audit_trail",     # the crawl chain with drops kept
    "s_doremi_weights_stream",  # drained online-controller stream
    "s_hnsw_ingest_stream",     # drained incremental graph build
    "x8_knn_triangles",         # canonical-order cyclic join
    "n2_exactsubstr_cut",       # SA passes + one group-keyed window
    "pipeline_training_manifest",  # schedule + per-source shard windows
    "a19_heavy_hitters_mg",     # MG candidate pass + semi-join recount
    "s_heavy_hitters_stream",   # drained candidate/count segments
    # r10 third session: selection/bucketing tier + the new composites
    "n4_ccnet_buckets",         # surprisal core + per-lang NTILE window
    "n6_d4_selection",          # cluster-keyed pair join + proto rank
    "n5_jpeg_archive_pipeline_real",  # FDCT+quant+Huffman ENCODE roundtrip
    "pipeline_data_card",       # fingerprint + gate cores, per-source agg
    "s_data_card_stream",       # drained additive card segments
    "pipeline_ccnet_end_to_end",  # chunk dedup -> lang-id -> KN buckets
    "n4_kn3_surprisal_filter",  # trigram KN rationals, 1 trigram shuffle
    "s_kn3_stats_stream",       # drained additive trigram-count segments
    "n3_pq_trained_topk",       # 4 subspace k-means fits + ADC scoring
    "n5_qoi_archive_pipeline_real",  # gray stage -> QOI encode roundtrip
    # r11: the sample-bounded trained-IVF fit (the last >10s bench entry
    # without a curve) — fit cost must stay flat across sf while the
    # assignment tracks corpus size
    "n3_ivf_trained_topk",
    "n3_knn_graph_blocked",     # list-keyed shuffle join, no broadcast side
    "n4_bpe_bytelevel_train",   # corpus shuffle + 24 vocab passes
    "s_exactsubstr_cut_stream",  # drained gram count/min segments
    "n3_hnsw_blocked_topk",     # blocked layer 0 + exact upper + beam
    "n6_unimax_mix",            # 1 corpus agg + language-table windows
    "s_bpe_bytelevel_stats_stream",  # drained pre-token count segments
    # r12: new operators
    "n4_unigram_train",         # EM rounds: map-only E-step + 1 agg each
    "n4_unigram_train_encode",  # trained-vocab max-product Viterbi encode
    "n5_gif_quality_report",    # map-only quantize->GIF roundtrip + SSIM
    "n5_adpcm_quality_report",  # map-only ADPCM encode roundtrip + PSNR
    "n6_curriculum_order",      # stratum window + distributed interleave
    "s_hnsw_blocked_ingest_stream",  # drained IVF-pruned ingest segments
    "s_unigram_stats_stream",   # drained word-count segments + EM drain
    "s_unimax_mix_stream",      # drained additive language-token segments
    "s_quota_mix_stream",       # drained additive doc-count segments
    "n5_jpeg_quality_report",   # map-only JPEG roundtrip + PSNR/SSIM
    # r12 continuation: quality-rule tier, trainers, graph analytics
    "n4_gopher_rules",          # map-only integer rule set
    "n4_c4_page_clean",         # map-only synthesized-page line filter
    "n2_c4_span_dedup",         # span_fp keep-first rank + doc re-agg
    "n4_wordpiece_train",       # corpus shuffle + 24 likelihood passes
    "x8_label_propagation",     # 4 relabel rounds over mutual-kNN edges
    "x8_sssp_weighted",         # 6 Bellman-Ford relaxations, int weights
    "n6_exact_k_sample",        # lang-keyed bottom-k rank window
    "s_exact_k_sample_stream",  # drained mergeable bottom-k segments
    "pipeline_quality_gate_end_to_end",  # flags + holdout + ledger
    "s_quality_gate_stream",    # drained attrition + candidate segments
]


def main() -> None:
    from flink_1_19_source_spark.registry import REGISTRY, queries
    from flink_1_19_source_spark.session import get_spark

    queries()
    spark = get_spark(app_name="scaling-probe", shuffle_partitions=32)
    # warm-up pass: JIT/codegen/Arrow spin-up must not be billed to the
    # first measured cell
    for qname in QUERIES:
        REGISTRY[qname].fn(spark, SFS[0][1]).count()
    results: dict[str, dict[str, tuple[float, int]]] = {}
    for sf_name, sf_dir, _ in SFS:
        for qname in QUERIES:
            fn = REGISTRY[qname].fn
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = time.time() - t0
            results.setdefault(qname, {})[sf_name] = (dt, n)
            print(f"{sf_name} {qname}: {dt:.2f}s {n} rows", flush=True)

    lines = [
        "# SCALING — wall-clock vs data volume (100x sweep)",
        "",
        "Generated by `tools/scaling_probe.py` on local[32]; one warm",
        "session, each cell = seconds (result rows).  `x0.1/x0.001` is the",
        "runtime ratio across the 100x data spread — linear scan-bound work",
        "would read ≤100 even before fixed per-query overhead (session,",
        "planning, Python UDF spin-up) flattens the small-SF floor; a",
        "quadratic operator would blow past it.",
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 | x0.1/x0.001 |",
        "|---|---|---|---|---|",
    ]
    for qname in QUERIES:
        r = results[qname]
        t1, n1 = r["sf0.001"]
        t2, n2 = r["sf0.01"]
        t3, n3 = r["sf0.1"]
        ratio = t3 / t1 if t1 > 0 else float("inf")
        lines.append(
            f"| {qname} | {t1:.2f}s ({n1}) | {t2:.2f}s ({n2}) "
            f"| {t3:.2f}s ({n3}) | {ratio:.1f}x |"
        )
    lines += [
        "",
        "Reading: every ratio far below 100x means the fixed overhead still",
        "dominates at these SFs — the distributed fraction has headroom;",
        "ratios near-or-above 100x flag work growing with data faster than",
        "the scan (none should).  Plan-shape constancy across SFs is pinned",
        "separately (tests/test_plans.py, incl. the bench-scale join-",
        "strategy assertions).",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SCALING.md")


if __name__ == "__main__":
    main()
