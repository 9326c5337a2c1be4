"""Importing this package registers every coverage query (SURVEY.md §2).

WINDOW ORDER IS LOAD-BEARING: the driver certifies only the FIRST 50
registry entries.  Import order seeds the registry, then the window
list below reorders it explicitly so the certification window is an
exact, named set rather than a module-prefix accident.

Round-12 window = ``_R12_MUST`` (every query NEW in round 12 — the
Unigram EM trainer trio, the two codec quality reports, the blocked
streaming ANN ingest — plus every query whose code or oracle changed
this round: the distributed curriculum interleave, the sub-blocked
IVF-list graph family and everything sharing operators/graph_ann, the
suffix pair behind the prefix-sum precondition assert, the two Kafka
consumers behind the distributed epoch NTILE, and the one query that
executes a crash-sentinel line in its normal run) padded to exactly 50
with ``_R12_PAD`` — the queries whose LATEST certification is oldest
(the r3 wave, then the r4 wave in name order).  See STATUS.md "driver
certification window" for the ledger.
"""

from . import windows  # noqa: F401
from . import llm  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import streaming_joins2  # noqa: F401  (outer/chained join streams)
from . import sources  # noqa: F401
from . import cep  # noqa: F401
from . import cep2  # noqa: F401  (X5 exclusions/iterative/verbatim MR)
from . import relational2  # noqa: F401
from . import tpch  # noqa: F401
from . import tpch_partsupp  # noqa: F401  (Q2/Q9/Q11/Q20 derived-partsupp)
from . import relational  # noqa: F401
from . import aggregates  # noqa: F401
from . import joins  # noqa: F401
from . import over_windows  # noqa: F401
from . import sort_set  # noqa: F401
from . import scalar_funcs  # noqa: F401
from . import udtf_queries  # noqa: F401
from . import pipeline  # noqa: F401  (N6 + end-to-end N2/N4 pipelines)
from . import feedback  # noqa: F401  (X8 iterate, W7 count windows)
from . import windows2  # noqa: F401  (window top-n/dedup, cascading agg)
from . import sources2  # noqa: F401  (S11 session-catalog surface)
from . import sources_cdc  # noqa: F401  (X6 CDC envelope family)
from . import sources_lake  # noqa: F401  (S11 time travel/snapshots, WARC)
from . import streaming2  # noqa: F401  (retract-stream chained aggregation)
from . import streaming_retract2  # noqa: F401  (retract producers/consumers)
from . import kafka_queries  # noqa: F401  (S6 file-topic contract, X1 idleness)
from . import dialect2  # noqa: F401  (SIMILAR TO, TIME type, CURRENT_WATERMARK)
from . import llm2  # noqa: F401  (PII, contamination, repetition, packing)
from . import aggregates2  # noqa: F401  (JSON_OBJECTAGG family, portable Bloom)
from . import dialect3  # noqa: F401  (ALTER/TRUNCATE/LIKE, SQL UDFs, ANALYZE)
from . import llm_tokenize  # noqa: F401  (BPE/WordPiece, chunking, RAG)
from . import llm_dedup  # noqa: F401  (streaming LSH/chunk dedup, winnow)
from . import llm_dsir  # noqa: F401  (DSIR resampling + pipeline)
from . import llm_surprisal  # noqa: F401  (LM gates, token-budget epochs)
from . import llm_surprisal3  # noqa: F401  (trigram KN gate + stats stream)
from . import llm_retrieval  # noqa: F401  (BM25, RRF, IVF-PQ, Hamming ANN)
from . import llm_media  # noqa: F401  (real JPEG-family codec queries)
from . import llm_media_stages  # noqa: F401  (N5 stages + PNG/WAV/AVI)
from . import llm_media_codecs  # noqa: F401  (FLAC/GIF/ADPCM/WebP)
from . import llm_reports  # noqa: F401  (LSH/IVF recall reports)
from . import cdc_scd  # noqa: F401  (SCD2 history from CDC, batch + stream)
from . import sketches2  # noqa: F401  (theta KMV sketch family)
from . import llm_text  # noqa: F401  (trained trigram NB lang-id)
from . import crawl_pipeline  # noqa: F401  (N7 crawl->corpus composite)
from . import llm_batching  # noqa: F401  (N6 length-bucketed batches)
from . import llm_suffix  # noqa: F401  (N2 suffix-array substring dedup)
from . import llm_graph_ann  # noqa: F401  (N3 HNSW-family graph ANN)
from . import llm_media_encode  # noqa: F401  (N5 encode-side stages)
from . import llm_train  # noqa: F401  (N4 logistic training)
from . import llm_doremi  # noqa: F401  (N6 DoReMi domain reweighting)
from . import audit  # noqa: F401  (N7 per-document audit trail)
from . import manifest  # noqa: F401  (N7 training-manifest composite)
from . import heavy_hitters  # noqa: F401  (A9 Misra-Gries frequent items)
from . import llm_select  # noqa: F401  (N6 D4 embedding-space selection)
from . import ccnet_pipeline  # noqa: F401  (N7 CCNet composite)
from . import llm_bytebpe  # noqa: F401  (N4 byte-level BPE, GPT-2 regex)
from . import llm_unigram  # noqa: F401  (N4 Unigram-LM EM trainer)
from . import llm_media_quality  # noqa: F401  (N5 PSNR/SSIM reports)
from . import llm_quality_rules  # noqa: F401  (N4 Gopher/C4 rule sets)
from . import llm_graph2  # noqa: F401  (X8 label-propagation communities)
from . import llm_wordpiece  # noqa: F401  (N4 WordPiece trainer)
from . import llm_sampling2  # noqa: F401  (N6 exact-k bottom-k sample)

from ..registry import REGISTRY

# Every query NEW in round 12, then every query whose code or oracle
# changed this round.  These MUST all certify this round.
_R12_MUST = [
    # new in r12
    "n4_unigram_train",
    "n4_unigram_train_encode",
    "s_unigram_stats_stream",
    "n5_gif_quality_report",
    "n5_adpcm_quality_report",
    "s_hnsw_blocked_ingest_stream",
    "s_unimax_mix_stream",
    "s_quota_mix_stream",
    "n5_jpeg_quality_report",
    "n4_gopher_rules",
    "n4_c4_page_clean",
    "x8_label_propagation",
    "n4_wordpiece_train",
    "n4_wordpiece_train_encode",
    "x8_sssp_weighted",
    "n6_exact_k_sample",
    "s_exact_k_sample_stream",
    "pipeline_quality_gate_end_to_end",
    "n2_c4_span_dedup",
    "s_quality_gate_stream",
    # r12 changed code: UniMax water-filling extracted into the shared
    # _unimax_alloc helper (results must be UNCHANGED)
    "n6_unimax_mix",
    # r12 changed code: distributed curriculum interleave (results
    # must be UNCHANGED)
    "n6_curriculum_order",
    # sub-blocked IVF lists + shared graph_ann module changes
    "n3_knn_graph_blocked",
    "n3_hnsw_blocked_topk",
    "n3_hnsw_topk",
    "n3_hnsw_recall_report",
    "s_hnsw_ingest_stream",
    "x8_knn_triangles",
    # distributed epoch NTILE in the Kafka topic builder
    "s_kafka_tumble_stream",
    "s_kafka_idle_partition",
    # prefix_sum_distributed gained its unique-key precondition assert
    "n2_suffix_array_spans",
    "n2_exactsubstr_cut",
    # the one registered query that EXECUTES a crash-sentinel line in
    # its normal run (the r12 sentinel-message fix)
    "s_crash_resume_exactly_once",
]

# Re-validation pad: the queries whose latest driver CORRECTNESS row is
# OLDEST (r3 wave, then the r4 wave in name order).
_R12_PAD = [
    # r3 wave
    "s_cdc_apply", "s_cumulate_stream", "s_dedup_within_watermark_stream",
    "s_hop_stream", "s_interval_join_stream", "s_keep_last_stream",
    "s_late_data_capture", "s_match_recognize_stream", "s_over_agg_stream",
    "s_sessionize_timers", "s_topn_stream", "s_tumble_stream",
    "src_csv_roundtrip", "src_datagen", "src_jdbc_lookup", "src_jdbc_scan",
    "src_jdbc_upsert", "src_json_roundtrip", "src_orc_roundtrip",
    "src_parquet_roundtrip", "src_partitioned_pruning",
    # r4 wave (name order; truncated to fill the window)
    "f_json2_family", "f_string2_family", "f_temporal2_family",
    "n2_dedup_end_to_end", "n2_minhash_lsh_pairs", "n2_simhash_fingerprints",
    "n3_ivf_topk", "n3_lsh_topk", "n4_quality_filter",
    "n4_winnow_fingerprints", "n6_stratified_sample",
]


def _apply_window() -> None:
    assert len(_R12_MUST) <= 50, len(_R12_MUST)
    window = _R12_MUST + _R12_PAD[: 50 - len(_R12_MUST)]
    assert len(window) == 50, len(window)
    missing = [n for n in window if n not in REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    rest = {k: v for k, v in REGISTRY.items() if k not in set(window)}
    ordered = {k: REGISTRY[k] for k in window}
    ordered.update(rest)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_window()
