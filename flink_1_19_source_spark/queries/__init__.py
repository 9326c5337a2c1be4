"""Importing this package registers every coverage query (SURVEY.md §2).

WINDOW ORDER IS LOAD-BEARING: the driver certifies only the FIRST 50
registry entries.  Import order seeds the registry, then the window
list below reorders it explicitly so the certification window is an
exact, named set rather than a module-prefix accident.

Round-11 window = ``_R11_MUST`` (every query NEW in round 11 — the
byte-level BPE pair, the streaming ExactSubstr twin, the IVF-blocked
kNN graph — plus every r10 query whose code or oracle changed this
round: the de-collected HNSW family, the sample-bounded trained IVF,
the kmeans-oracle consumers, the prefix-sum-rewired suffix pair, the
split KN3 tier, the QOI pipeline behind the decode-bound fix) padded
to exactly 50 with ``_R11_PAD`` — the queries whose LATEST
certification is oldest (the one r1 leftover, the full r2 wave, and
the r3 wave in name order).  See STATUS.md "driver certification
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

from ..registry import REGISTRY

# Every query NEW in round 11, then every query whose code or oracle
# changed this round.  These MUST all certify this round.
_R11_MUST = [
    # new in r11
    "n4_bpe_bytelevel_train",
    "n4_bpe_bytelevel_encode",
    "s_exactsubstr_cut_stream",
    "n3_knn_graph_blocked",
    "n3_hnsw_blocked_topk",
    "n6_unimax_mix",
    "s_bpe_bytelevel_stats_stream",
    # r11 changed code/oracle: sample-bounded trained-IVF fit (results
    # changed), kmeans CTE gains the fitc stage (oracle text changed)
    "n3_ivf_trained_topk",
    "x8_kmeans_embeddings",
    # de-collected block-pair graph ANN build (results must be UNCHANGED)
    "n3_hnsw_topk",
    "n3_hnsw_recall_report",
    "s_hnsw_ingest_stream",
    "x8_knn_triangles",
    # distributed doc-offset prefix sum in the suffix corpus builder
    "n2_suffix_array_spans",
    "n2_exactsubstr_cut",
    # KN3 tier moved to llm_surprisal3 (same registry names)
    "n4_kn3_surprisal_filter",
    "s_kn3_stats_stream",
    # QOI decode now bounds allocation against the payload
    "n5_qoi_archive_pipeline_real",
]

# Re-validation pad: the queries whose latest driver CORRECTNESS row is
# OLDEST (r1/r2/r3 unions), in wave order then name order.
_R11_PAD = [
    "f_cast_hash_family",
    # r2 wave
    "f_collection_family", "f_comparison_family", "f_conditional_family",
    "f_json_family", "f_map_family", "f_math_family", "f_string_family",
    "f_temporal_family", "o7_dedup_keep_first", "o7_dedup_keep_last",
    "t1_orderby_limit", "t2_limit_offset", "t4_union", "t4_union_distinct",
    "t5_except_all", "t5_intersect", "t5_intersect_all",
    # r3 wave (name order; truncated to fill the window)
    "n1_exact_dedup", "n1_fingerprint_dedup", "n2_dedup_clusters",
    "n2_embedding_cosine_pairs", "n2_ngram_jaccard_capped",
    "n2_ngram_jaccard_pairs", "n3_cosine_topk", "n4_corpus_token_stats",
    "n4_lang_id", "n4_quality_stats", "n4_tfidf", "n5_frame_sample",
    "n5_multimodal_features", "n5_resize", "s_cdc_apply",
    "s_cumulate_stream", "s_dedup_within_watermark_stream", "s_hop_stream",
    "s_interval_join_stream", "s_keep_last_stream",
]


def _apply_window() -> None:
    assert len(_R11_MUST) <= 50, len(_R11_MUST)
    window = _R11_MUST + _R11_PAD[: 50 - len(_R11_MUST)]
    assert len(window) == 50, len(window)
    missing = [n for n in window if n not in REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    rest = {k: v for k, v in REGISTRY.items() if k not in set(window)}
    ordered = {k: REGISTRY[k] for k in window}
    ordered.update(rest)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_window()
