"""Replay-granularity invariance (VERDICT r1 item #9).

The streaming oracle strategy rests on one claim (streaming_queries.py
``_CHUNKS`` comment): every watermark/timer/state query here converges to
the same answer no matter how the ordered replay is sliced into
micro-batches — append windows close on the FINAL watermark, keyed
snapshots depend only on per-key event order, and the late-data rule is a
per-row running max independent of batch boundaries. This test replays the
stateful queries with 3 and with 8 micro-batches and asserts bit-identical
converged answers, guarding that claim directly.
"""

from __future__ import annotations

import pytest

import flink_1_19_source_spark.queries.streaming_queries as sq
from flink_1_19_source_spark.registry import REGISTRY, queries

from .oracle import canon_rows

queries()  # populate REGISTRY

# One per stateful mechanism: windowed agg + watermark, session timers
# (applyInPandasWithState + TTL), keyed Top-N state, late-data capture,
# stream-stream interval join, keep-last upsert snapshot.
INVARIANT_QUERIES = [
    "s_tumble_stream",
    "s_sessionize_timers",
    "s_topn_stream",
    "s_late_data_capture",
    "s_keep_last_stream",
    "s_cumulate_stream",
    # count windows: content depends only on per-key arrival order, so
    # fire points must not move with the chunking
    "s_count_tumble_stream",
    "s_count_evictor_stream",
    # chained stateful stages and multi-source min-watermark: closure
    # rules depend only on full-data maxima, never on batch boundaries
    "s_cascading_window_stream",
    "s_union_stream",
    # retract-stream chaining: ±1 delta folding must telescope to the
    # same level-2 histogram for any micro-batch slicing
    "s_chained_agg_retract",
    # allowed lateness: the keep/drop rule is the watermark at arrival —
    # a pure function of global arrival order — and the re-fire upserts
    # are additive, so the final window values can't move with chunking
    "s_allowed_lateness_stream",
    # window join: inner matches are a pure function of (key, window)
    # membership; state eviction never drops a live window at any slicing
    "s_window_join_stream",
    # temporal join: the as-of version per probe depends only on per-key
    # event order, which the ts-sorted replay preserves at any chunking
    "s_temporal_join_stream",
    # dynamic-gap sessions: the merge frontier (running max of ts+gap)
    # is a pure function of per-key event order; watermark-clamped
    # timers only defer fires, never change the emitted set
    "s_dynamic_gap_session_stream",
    # chained dedup → window agg: distinct pairs per window are a set,
    # and window closure depends only on the final watermark
    "s_window_distinct_stream",
    # outer interval join: matches are data-driven; null emission depends
    # only on the FINAL min-of-sides watermark, not batch boundaries
    "s_interval_join_outer_stream",
    # stateless enrichment and multi-sink fan-out: row-wise, so any
    # slicing must produce identical content (file layout may differ)
    "s_lookup_enrich_stream",
    "s_statement_set_stream",
    # CEP within: matches form from per-key event order alone; a purchase
    # in a later batch still closes pendings carried in state
    "s_pattern_within_stream",
    # sketch maintenance: register max-merge / bit-set union are
    # commutative + idempotent, so any slicing converges identically
    "s_hll_stream_rollup",
    "s_bloom_stream_filter",
    # outer window join: null emission gated on the final min-of-sides
    # watermark, matches data-driven — same invariance as interval outer
    "s_window_join_outer_stream",
    # incremental LSH dedup: dup_of = min earlier doc sharing a band is a
    # pure function of doc_id order (strict <), and the append-only index
    # is a set union — any batch composition yields the same verdicts
    "s_minhash_dedup_stream",
    # chained 3-way interval join: inner matches are data-driven; both
    # join states evict strictly after their time bounds at any slicing
    "s_three_way_interval_join_stream",
    # bottom-k quantile sketch: union + re-select-bottom-k is commutative
    # and idempotent (same algebra as the HLL register max-merge), so the
    # converged sample — and its estimates — are slicing-independent
    "s_quantile_sketch_stream",
    # retractable Top-N over the agg changelog: absolute-value MERGEs +
    # monotone-rank eviction — the converged candidate table holds the
    # true top K+slack for any slicing
    "s_topn_over_agg_retract",
    # SKIP TO <variable>: emission is prefix-stable (quantified vars
    # exclude the boundary symbol), so the match set and SUBSET
    # measures cannot move with the chunking
    "s_skip_to_variable_stream",
    # reluctant quantifier: lazy matches close at the FIRST terminator,
    # so a completed match can never extend across a batch boundary
    "s_reluctant_quantifier_stream",
    # count-min: cell-wise SUM over overwrite-idempotent epoch segments
    # is associative/commutative, so any slicing sums to the same cells
    "s_countmin_stream",
    # DSIR stats: per-bucket (rc, tc) counts are additive over any
    # partition of the corpus — segment sums equal the one-shot agg
    "s_dsir_stats_stream",
    # dialect-layer streaming TVFs: window/session closure depends only
    # on the FINAL watermark, never on batch boundaries
    "s_sql_window_tvf_stream",
    "s_sql_session_tvf_stream",
    # chunk-hash dedup: dup target = min earlier composite key sharing
    # the hash (strict <) — a pure function of (doc_id, chunk_no) order
    "s_chunk_dedup_stream",
    # iterative-condition CEP: the automaton state is O(1) and advanced
    # strictly in per-key event order, so batch boundaries are invisible
    "s_iterative_condition_stream",
    # streaming model refresh: the post-drain fit runs over the complete
    # log with the shared exact-integer update rule — same data, same
    # rule, same model at any slicing
    "s_perceptron_train_stream",
    # logistic twin: same absolutive refresh loop, hard-sigmoid rule
    "s_logistic_train_stream",
    # streaming heavy hitters: the candidate union contains every true
    # hitter for ANY chunking (pigeonhole over batch x partition cells)
    # and the count fold is a plain sum, so the filtered final set is
    # exactly the true heavy hitters at any slicing
    "s_heavy_hitters_stream",
    # incremental HNSW: the union of per-batch top-M candidate segments
    # re-ranked at read time equals the one-shot top-M graph for ANY
    # slicing (a global top-M neighbor survives any subset's top-M), and
    # the search over an identical graph is deterministic
    "s_hnsw_ingest_stream",
    # punctuated watermark: the running max-marker is monotone and its
    # final value is the global max, so each window emits exactly once
    # at any slicing and the converged sink is slicing-independent
    "s_punctuated_watermark_stream",
    # streaming data card: per-(source,lang) sums and per-(fp,source)
    # (min, count) are additive over any partition of the corpus, and
    # the corpus-first owner is the global min — all slicing-invariant
    "s_data_card_stream",
    # streaming trigram-LM stats: (w1,w2,w3) counts are additive, and
    # every derived KN statistic is an aggregation of the drained c3 —
    # identical counts imply identical scores at any slicing
    "s_kn3_stats_stream",
    # streaming ExactSubstr: gram counts sum and the first-occurrence
    # key is a MIN — both additive over any corpus slicing, and the
    # post-drain cut is a pure function of the drained table
    "s_exactsubstr_cut_stream",
    # streaming byte-BPE vocabulary: per-doc hash gate composes with any
    # slicing, pre-token counts are additive, and the post-drain merge
    # loop is a pure function of the drained vocabulary
    "s_bpe_bytelevel_stats_stream",
]


@pytest.mark.parametrize("name", INVARIANT_QUERIES)
def test_chunk_count_invariance(spark, sf_dir, name, monkeypatch):
    fn = REGISTRY[name].fn

    monkeypatch.setattr(sq, "_CHUNKS", 3)
    got3 = canon_rows(fn(spark, sf_dir).toPandas())

    monkeypatch.setattr(sq, "_CHUNKS", 8)
    got8 = canon_rows(fn(spark, sf_dir).toPandas())

    assert len(got3) == len(got8), f"{name}: rowcount 3-chunk={len(got3)} 8-chunk={len(got8)}"
    for i, (a, b) in enumerate(zip(got3, got8)):
        assert a == b, f"{name}: row {i} differs between 3- and 8-chunk replay\n  3: {a}\n  8: {b}"
