"""Importing this package registers every coverage query (SURVEY.md §2).

WINDOW ORDER IS LOAD-BEARING: the driver certifies only the FIRST 50
registry entries.  Import order seeds the registry, then the window
list below reorders it explicitly so the certification window is an
exact, named set rather than a module-prefix accident.

Round-13 window = ``_R13_MUST``: first, the r12 certification DEBT —
the ~16 queries whose computation changed in the final r12 optimizer
commits (kmeans int64 micro-units and its whole IVF/PQ consumer family,
the fused theta-sketch exact counts, the map-only Misra-Gries pass, the
checkpointed crawl/DSIR composites, the equality-class suffix streaming
twin) AFTER the r12 window had rotated — then every query whose code
changes in round 13 (the kafka epoch-produce checkpoint, the ANN ingest
folds, the retract-stream tier), padded to exactly 50 with ``_R13_PAD``
— the queries whose LATEST driver certification is oldest (r3 wave
remnants, then the r4 wave in name order; computed from the
CORRECTNESS_r*.json history).  See STATUS.md "driver certification
window" for the ledger.
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

# Round-13 certification debt and touched queries.  These MUST all
# certify this round.
_R13_MUST = [
    # --- r12 debt: computation rewritten AFTER the r12 window rotated
    # (kmeans int64 micro-unit aggregation + every consumer of
    # operators/kmeans.assign_topn / kmeans_long)
    "x8_kmeans_embeddings",
    "n3_ivf_trained_topk",
    "n3_pq_trained_topk",
    "n3_ivf_topk",
    "n3_pq_topk",
    "n3_ivf_recall_report",
    "n3_ivfpq_topk",
    "n3_ivfpq_recall_report",
    "s_ivf_ingest_stream",
    # fused theta-sketch exact counts (one aggregate, zero driver counts)
    "a18_theta_sketch_intersect",
    "s_theta_sketch_stream",
    # map-only Misra-Gries candidate pass
    "a19_heavy_hitters_mg",
    "s_heavy_hitters_stream",
    # checkpointed composite verdicts
    "pipeline_crawl_end_to_end",
    "pipeline_dsir_end_to_end",
    # r13 changed code: tokenize-once DSIR scoring core (shared module:
    # the stats stream rides the refactored _dsir_score_with_stats)
    "n6_dsir_resample",
    "s_dsir_stats_stream",
    # equality-class suffix ranks: the streaming twin missed the window
    "s_exactsubstr_cut_stream",
    # --- r13 changed code: kafka epoch-produce subtree checkpoint
    # (epochs>1 path) + the sibling consumers sharing _events_topic
    "s_kafka_tumble_stream",
    "s_kafka_idle_partition",
    "src_kafka_roundtrip",
    "s_kafka_aligned_read",
    # --- r13 changed code: ANN ingest fold restructure
    "s_hnsw_ingest_stream",
    "s_hnsw_blocked_ingest_stream",
    # --- r13 changed code: retract-stream tier subtree audit
    "s_outer_join_retract_stream",
    "s_join_over_agg_retract",
    "s_window_agg_over_retract",
    "s_topn_over_agg_retract",
    # --- r13 changed code: state-store partition pin on the one
    # stateful drain that ran at the session's shuffle-partition count
    "s_window_topn_stream",
    # --- r13 changed code: zero-shuffle winnowing fingerprints (array
    # sliding-min replaces the per-gram exchange + window)
    "n4_winnow_fingerprints",
    "n2_winnow_overlap_pairs",
]

# Re-validation pad: the queries whose latest driver CORRECTNESS row is
# OLDEST (r3-wave remnants, then the r4 wave in name order; derived
# from the CORRECTNESS_r*.json ledger — n3_ivf_topk skipped, it is in
# _R13_MUST).
_R13_PAD = [
    # r3 wave remnants
    "src_json_roundtrip", "src_orc_roundtrip", "src_parquet_roundtrip",
    "src_partitioned_pruning",
    # r4 wave (name order)
    "f_json2_family", "f_string2_family", "f_temporal2_family",
    "n2_dedup_end_to_end", "n2_minhash_lsh_pairs",
    "n2_simhash_fingerprints", "n3_lsh_topk", "n4_quality_filter",
    "n6_stratified_sample",
    "n6_train_val_test_split", "o4b_range_frames",
    "q13_customer_distribution", "q16_parts_supplier",
    "q17_small_quantity_revenue", "q18_large_volume_customer",
    "q21_waiting_orders", "q3_shipping_priority", "q4_order_priority",
    "q5_local_supplier_volume",
]


def _apply_window() -> None:
    assert len(_R13_MUST) <= 50, len(_R13_MUST)
    window = _R13_MUST + _R13_PAD[: 50 - len(_R13_MUST)]
    assert len(window) == 50, len(window)
    missing = [n for n in window if n not in REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    rest = {k: v for k, v in REGISTRY.items() if k not in set(window)}
    ordered = {k: REGISTRY[k] for k in window}
    ordered.update(rest)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_window()
