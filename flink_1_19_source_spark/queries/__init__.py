"""Importing this package registers every coverage query (SURVEY.md §2).

WINDOW ORDER IS LOAD-BEARING: the driver certifies only the FIRST 50
registry entries.  Import order seeds the registry, then ``_R04_WINDOW``
below reorders it explicitly so the certification window is an exact,
named set rather than a module-prefix accident.  Round-4 window =
43 never-certified queries (TPC-H classics, f_*2 families, UDTF/pandas
UDF, N6 sampling, X8 iterate/k-means, W7 count windows, window
top-n/dedup + new streams, catalog/compacted sources, retract chain)
+ the 15 rows red in CORRECTNESS_r03 (w1-w6/sql_*/x5_*/X7 events-bug
reds, now fixed; the four newly-oracled n2/n3 approximate ops), minus
overflow parked for the r05 window.  See STATUS.md "driver
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

from ..registry import REGISTRY

# The exact round-4 certification window (first 50 registry entries).
_R04_WINDOW = [
    # never-certified: TPC-H classics (8 of 15; rest parked for r05)
    "q4_order_priority", "q7_volume_shipping", "q8_market_share",
    "q13_customer_distribution", "q16_parts_supplier",
    "q17_small_quantity_revenue", "q18_large_volume_customer",
    "q21_waiting_orders",
    # never-certified: relational2 (n4_tfidf already green r3 — excluded)
    "q3_shipping_priority", "q5_local_supplier_volume",
    "f_temporal2_family", "f_string2_family", "f_json2_family",
    "skew_salted_agg", "o4b_range_frames", "n4_winnow_fingerprints",
    # never-certified: UDTF / pandas-UDF surface (2.10)
    "udtf_tokenize_lateral", "udf_scalar_pandas",
    # never-certified: N6 sampling + end-to-end pipelines
    "n6_stratified_sample", "n6_train_val_test_split",
    "n2_dedup_end_to_end", "n4_quality_filter",
    # never-certified: X8 iterate/k-means + W7 count windows
    "x8_iterate_bfs", "x8_kmeans_embeddings",
    "s_count_tumble_stream", "s_count_evictor_stream",
    # never-certified: window top-n/dedup + r3 streams
    "w7_window_topn", "w8_window_dedup", "s_cascading_window_stream",
    "s_window_topn_stream", "s_union_stream", "s_session_native_stream",
    # never-certified: S11 catalog + compacted write, §7.4 retract chain
    "src_catalog_surface", "src_compacted_write", "s_chained_agg_retract",
    # red in r03 (events ts bug, now fixed): W1-W6, S12, X5, X7
    "w1_tumble", "w2_hop", "w3_cumulate", "w4_session",
    "w5_tumble_offset", "w6_window_time",
    "sql_flink_dialect", "sql_ddl_surface",
    "x5_match_recognize_abc", "x5_adjacent_pair",
    "s_broadcast_state_join",
    # red in r03 (no_oracle, now oracled): MinHash/SimHash/IVF/LSH
    "n2_minhash_lsh_pairs", "n2_simhash_fingerprints",
    "n3_ivf_topk", "n3_lsh_topk",
]


def _apply_window() -> None:
    assert len(_R04_WINDOW) == 50, len(_R04_WINDOW)
    missing = [n for n in _R04_WINDOW if n not in REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    rest = {k: v for k, v in REGISTRY.items() if k not in set(_R04_WINDOW)}
    ordered = {k: REGISTRY[k] for k in _R04_WINDOW}
    ordered.update(rest)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_window()
