"""Importing this package registers every coverage query (SURVEY.md §2).

WINDOW ORDER IS LOAD-BEARING: the driver certifies only the FIRST 50
registry entries.  Import order seeds the registry, then ``_R09_WINDOW``
below reorders it explicitly so the certification window is an exact,
named set rather than a module-prefix accident.  Round-9 window = the
first 50 of the 52 registered queries that have NEVER carried a driver
CORRECTNESS row (the r1-r8 CORRECTNESS union vs the registry, computed
at the top of round 9): the full r8 wave — gzip/WARC/codec-matrix
sources, CEP exclusions + iterative conditions, MATCH_RECOGNIZE and
named-argument dialect, FLIP-373 STATE_TTL hints, the retraction-
producing outer stream join, WordPiece/Unigram tokenizers, KN/bigram
LM surprisal gates, priority/containment dedup, quota/token-budget
mixing, IVF-PQ/filtered/MaxSim ANN, the eight new media codecs + real
pipeline stages, SCD2 history, theta sketches, trained lang-id — plus
``s_chunk_dedup_stream`` (the known r7 overflow).
``n4_perceptron_train`` and ``s_perceptron_train_stream`` overflow to
r10.  See STATUS.md "driver certification window" for the ledger.
"""

from . import windows  # noqa: F401
from . import llm  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import sources  # noqa: F401
from . import cep  # noqa: F401
from . import relational2  # noqa: F401
from . import tpch  # noqa: F401
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
from . import streaming2  # noqa: F401  (retract-stream chained aggregation)
from . import kafka_queries  # noqa: F401  (S6 file-topic contract, X1 idleness)
from . import dialect2  # noqa: F401  (SIMILAR TO, TIME type, CURRENT_WATERMARK)
from . import llm2  # noqa: F401  (PII, contamination, repetition, packing)
from . import aggregates2  # noqa: F401  (JSON_OBJECTAGG family, portable Bloom)
from . import dialect3  # noqa: F401  (ALTER/TRUNCATE/LIKE, SQL UDFs, ANALYZE)
from . import llm_tokenize  # noqa: F401  (BPE/WordPiece, chunking, RAG)
from . import llm_dedup  # noqa: F401  (streaming LSH/chunk dedup, winnow)
from . import llm_dsir  # noqa: F401  (DSIR resampling + pipeline)
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

from ..registry import REGISTRY

# The exact round-9 certification window (first 50 registry entries):
# the first 50 of the 52 never-driver-certified queries, in registry
# order (the r8 wave + the r7 overflow ``s_chunk_dedup_stream``).
# ``n4_perceptron_train`` / ``s_perceptron_train_stream`` overflow to
# r10.
_R09_WINDOW = [
    "x8_cc_two_phase", "s_punctuated_watermark_stream",
    "src_gzip_jsonl_scan", "src_parquet_codec_matrix",
    "s_gzip_ingest_stream", "x5_exclusion", "s_exclusion_stream",
    "x5_iterative_condition", "s_iterative_condition_stream",
    "sql_match_recognize", "s_state_ttl_hint_join",
    "s_state_ttl_hint_agg", "src_warc_wet_scan",
    "s_join_over_agg_retract", "s_outer_join_retract_stream",
    "sql_named_arguments", "n4_wordpiece_encode", "n4_unigram_encode",
    "s_chunk_dedup_stream", "n1_priority_dedup", "n2_containment_pairs",
    "s_priority_dedup_stream", "n6_quota_mix", "n4_lm_surprisal_filter",
    "pipeline_quality_mix_end_to_end", "n4_kn_surprisal_filter",
    "n6_token_budget_epochs", "n3_ivfpq_topk", "n3_filtered_ivf_topk",
    "n3_ivfpq_recall_report", "n3_maxsim_topk", "n5_jpeg_color_decode",
    "n5_flac_decode_real", "n5_jpeg_progressive_decode",
    "n5_jpeg_restart", "n5_image_resize_real",
    "n5_video_frame_sample_real", "n5_audio_features_real",
    "n5_jpeg_sa_decode", "n5_gif_decode_real", "n5_adpcm_decode_real",
    "n5_jpeg_color_progressive_decode", "n5_webp_decode_real",
    "x6_scd2_history", "s_scd2_stream", "s_window_agg_over_retract",
    "x6_scd2_asof_lookup", "a18_theta_sketch_intersect",
    "s_theta_sketch_stream", "n4_lang_id_trigram_nb",
]


def _apply_window() -> None:
    assert len(_R09_WINDOW) == 50, len(_R09_WINDOW)
    missing = [n for n in _R09_WINDOW if n not in REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    rest = {k: v for k, v in REGISTRY.items() if k not in set(_R09_WINDOW)}
    ordered = {k: REGISTRY[k] for k in _R09_WINDOW}
    ordered.update(rest)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_window()
