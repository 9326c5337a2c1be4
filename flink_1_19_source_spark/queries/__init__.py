"""Importing this package registers every coverage query (SURVEY.md §2).

WINDOW ORDER IS LOAD-BEARING: the driver certifies only the FIRST 50
registry entries.  Import order seeds the registry, then ``_R08_WINDOW``
below reorders it explicitly so the certification window is an exact,
named set rather than a module-prefix accident.  Round-8 window = the
first 50 of the 51 registered queries that have NEVER carried a driver
CORRECTNESS row, in the exact order STATUS.md's r08 ledger plans them:
the 27 r6-overflow queries (quantile sketches, DSIR, window-join
variants, snapshot/time-travel, math/try families, winnowing), then
23 of the 24 r7 additions (BPE train/encode/packing, hybrid RRF,
binary-Hamming ANN, count-min, SESSION TVF batch+stream, CEP
skip-to-variable and reluctant quantifiers, real JPEG decode,
temperature mixing, RAG pipeline).  ``s_chunk_dedup_stream`` overflows
to r09.  See STATUS.md "driver certification window" for the ledger.
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
from . import llm_media  # noqa: F401  (real JPEG/FLAC codec queries)
from . import cdc_scd  # noqa: F401  (SCD2 history from CDC, batch + stream)
from . import sketches2  # noqa: F401  (theta KMV sketch family)
from . import llm_text  # noqa: F401  (trained trigram NB lang-id)

from ..registry import REGISTRY

# The exact round-8 certification window (first 50 registry entries):
# all never-certified, in STATUS.md r08-ledger order: the 27 r6-overflow
# queries, then the r7 wave (BPE, RRF, binary ANN, count-min, SESSION
# TVF, skip-to-variable, reluctant quantifiers, JPEG, RAG pipeline).
# ``s_chunk_dedup_stream`` overflows to r09.
_R08_WINDOW = [
    # r6 overflow (27)
    "n6_epoch_shuffle", "src_time_travel", "src_snapshot_diff",
    "sql_window_tvf", "sql_legacy_group_windows",
    "j8c_window_join_full", "s_window_join_full_stream",
    "s_minhash_dedup_stream", "n6_dsir_resample",
    "x5_quantifier_alternation", "f_math2_family",
    "j8d_hop_window_join", "o6b_topn_with_ties",
    "s_three_way_interval_join_stream", "a16_quantile_sketch",
    "s_quantile_sketch_stream", "sql_view_lifecycle",
    "s_ivf_ingest_stream", "f_try_family", "j5c_interval_join_sym",
    "n2_winnow_overlap_pairs", "j8e_cumulate_window_join",
    "pipeline_dsir_end_to_end", "s_quantifier_stream",
    "n4_char_diversity", "sql_set_reset", "n2_cluster_canonical",
    # r7 additions (23 of 24)
    "sql_session_tvf", "n2_lsh_capped_skew",
    "s_topn_over_agg_retract", "x5_skip_to_variable",
    "s_skip_to_variable_stream", "x5_reluctant_quantifier",
    "s_reluctant_quantifier_stream", "n5_jpeg_decode_real",
    "n3_binary_hamming_topk", "n4_bm25_topk", "n4_bpe_train",
    "n4_bpe_encode", "src_snapshot_expire", "n3_hybrid_rrf_topk",
    "a17_countmin_sketch", "s_countmin_stream", "n6_temperature_mix",
    "s_sql_window_tvf_stream", "s_dsir_stats_stream",
    "n4_chunk_manifest", "n6_bpe_packing",
    "pipeline_rag_index_end_to_end", "s_sql_session_tvf_stream",
]


def _apply_window() -> None:
    assert len(_R08_WINDOW) == 50, len(_R08_WINDOW)
    missing = [n for n in _R08_WINDOW if n not in REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    rest = {k: v for k, v in REGISTRY.items() if k not in set(_R08_WINDOW)}
    ordered = {k: REGISTRY[k] for k in _R08_WINDOW}
    ordered.update(rest)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_window()
