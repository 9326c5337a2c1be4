"""Importing this package registers every coverage query (SURVEY.md §2).

WINDOW ORDER IS LOAD-BEARING: the driver certifies only the FIRST 50
registry entries.  Import order seeds the registry, then ``_R06_WINDOW``
below reorders it explicitly so the certification window is an exact,
named set rather than a module-prefix accident.  Round-6 window = the
first 50 of the 85 registered queries that have NEVER carried a driver
CORRECTNESS row (all r5 additions), in the exact order STATUS.md's r06
ledger plans them: proc-time triggers, avro, the parked TPC-H quartet,
semantic dedup, the late-r5 N/SQL/stream blocks.  The remaining 35
never-certified queries are queued for r07.  See STATUS.md "driver
certification window" for the per-round ledger.
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
from . import llm3  # noqa: F401  (streaming LSH dedup, DSIR resampling)

from ..registry import REGISTRY

# The exact round-6 certification window (first 50 registry entries):
# all never-certified, in STATUS.md r06-ledger order.
_R06_WINDOW = [
    # W7 proc-time triggers + W8 allowed lateness + S5 avro + S9 rate
    "s_proc_time_trigger_stream", "s_proc_time_accumulate_stream",
    "s_allowed_lateness_stream", "src_avro_roundtrip",
    # TPC-H classics never in a window
    "q2_min_cost_supplier", "q9_product_type_profit",
    "q11_important_stock", "q20_potential_promotion",
    # N2 semantic dedup + datagen stream
    "n2_semantic_dedup", "s_datagen_rate_stream",
    # late-r5 N4/N6/N1/N3 block
    "n4_pii_redact", "n4_contamination", "n4_repetition_signals",
    "n4_token_percentiles", "n6_sequence_packing", "n6_mix_rebalance",
    "n1_cross_source_dup_matrix", "n3_int8_topk",
    # late-r5 streaming joins + source closures
    "s_window_join_stream", "s_temporal_join_stream",
    "src_schema_evolution", "src_dynamic_partition_overwrite",
    "f_variant_family", "f_string3_family",
    # final-r5 aggregate/dialect block
    "a13_jsonagg_family", "a14_bloom_portable", "sql_statement_set",
    "sql_ddl_lifecycle", "sql_create_function", "sql_analyze_stats",
    # final-r5 window/dedup/CEP/source block
    "w4b_dynamic_gap_session", "w9_window_grouping_sets",
    "n1_chunk_dedup", "s_dynamic_gap_session_stream",
    "x5_pattern_within", "src_sorted_write", "s_statement_set_stream",
    "src_cdc_debezium", "s_rolling_file_sink", "sql_join_hints",
    "s_kafka_aligned_read", "n4_url_canonicalize",
    "n1_incremental_dedup", "o4c_time_range_over",
    "s_window_distinct_stream", "j5b_interval_join_outer",
    "s_interval_join_outer_stream", "a15_agg_filter",
    "src_metadata_columns", "x8_pagerank",
]


def _apply_window() -> None:
    assert len(_R06_WINDOW) == 50, len(_R06_WINDOW)
    missing = [n for n in _R06_WINDOW if n not in REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    rest = {k: v for k, v in REGISTRY.items() if k not in set(_R06_WINDOW)}
    ordered = {k: REGISTRY[k] for k in _R06_WINDOW}
    ordered.update(rest)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_window()
