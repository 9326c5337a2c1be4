"""Importing this package registers every coverage query (SURVEY.md §2).

WINDOW ORDER IS LOAD-BEARING: the driver certifies only the FIRST 50
registry entries.  Import order seeds the registry, then ``_R05_WINDOW``
below reorders it explicitly so the certification window is an exact,
named set rather than a module-prefix accident.  Round-5 window =
17 queries with no driver evidence yet (the 7 TPC-H classics parked
out of the r04 window; the round-4 kafka file-topic, upsert-kafka and
dialect-closure additions; the trained-codebook IVF; the portable HLL)
+ 33 re-certifications of the oldest-green r01-r02 rows (relational,
aggregate, join, over-window blocks — last driver evidence two rounds
old).  See STATUS.md "driver certification window" for the per-round
ledger.
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

from ..registry import REGISTRY

# The exact round-5 certification window (first 50 registry entries).
_R05_WINDOW = [
    # first driver evidence: TPC-H classics parked out of the r04 window
    "q6_forecast_revenue", "q10_returned_items", "q12_priority_shipping",
    "q14_promo_revenue", "q15_top_supplier", "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    # first driver evidence: S6/S7 kafka file-topic contract + X1 idleness
    "src_kafka_roundtrip", "src_kafka_offset_scan",
    "s_kafka_tumble_stream", "s_kafka_idle_partition",
    "s_upsert_kafka_compacted",
    # first driver evidence: S12 dialect closures (SIMILAR TO / TIME /
    # CURRENT_WATERMARK)
    "f_similar_to_family", "f_time_family", "sql_current_watermark",
    # first driver evidence: trained-codebook IVF, portable HLL estimate
    "n3_ivf_trained_topk", "a9c_hll_portable",
    # re-certification: oldest-green r01-r02 rows (relational block)
    "q1_pricing_summary", "r1_projection", "r2_filter_three_valued",
    "r3_flatmap_tokens", "r4_unnest_posexplode", "r5_values_literal",
    "r6_side_output_split", "r7_async_enrich",
    # re-certification: oldest-green r01-r02 rows (aggregate block)
    "a3_distinct_agg", "a4_grouping_sets", "a5_std_aggregates",
    "a6_first_last_value", "a7_listagg", "a8_collect_multiset",
    "a9_approx_count_distinct", "a11_udaf_median", "a12_udtaf_top2",
    # re-certification: oldest-green r01-r02 rows (join block)
    "j1_inner_equi", "j2_outer_joins", "j3_semi_join", "j3_anti_join",
    "j4_theta_join", "j5_interval_join", "j6_asof_join",
    "j7_lookup_broadcast", "j8_window_join", "j_bucketed_colocated",
    # re-certification: oldest-green r01-r02 rows (over-window block)
    "o1_rank_functions", "o2_lead_lag", "o3_first_last_over",
    "o4_agg_over_frames", "o5_distribution_functions", "o6_topn_pattern",
]


def _apply_window() -> None:
    assert len(_R05_WINDOW) == 50, len(_R05_WINDOW)
    missing = [n for n in _R05_WINDOW if n not in REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    rest = {k: v for k, v in REGISTRY.items() if k not in set(_R05_WINDOW)}
    ordered = {k: REGISTRY[k] for k in _R05_WINDOW}
    ordered.update(rest)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_window()
