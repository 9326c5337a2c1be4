"""Crash-point SWEEP for the retraction tier (r9 verdict item #5).

The existing crash pins inject at ONE fixed batch index; the r9 ADVICE
bug (punctuated-watermark replay overwriting its own closed windows)
was index-dependent — exactly the class a mechanical sweep catches.
Each parametrized case replays a retraction-tier stream with a crash
injected at EVERY batch index in turn (and, for the last index, TWICE
at the same index — a crash during the crash-recovery replay), and
requires the drained result to be bit-identical to the clean run.
"""

from __future__ import annotations

import pytest

from .oracle import canon_rows

# (runner module, runner name, kwargs, batch indices to crash at)
_SWEEP = [
    ("flink_1_19_source_spark.queries.streaming_retract2",
     "_outer_join_retract_run", {}, [0, 1]),
    ("flink_1_19_source_spark.queries.streaming_retract2",
     "_join_retract_run", {}, [0, 1]),
    ("flink_1_19_source_spark.queries.streaming_joins2",
     "_punctuated_wm_run", {}, [0, 1]),
    ("flink_1_19_source_spark.queries.cdc_scd",
     "_scd2_run", {}, [0, 1, 2, 3]),
    ("flink_1_19_source_spark.queries.cdc_scd",
     "_window_retract_run", {}, [0, 1, 2, 3]),
]


def _canon(df) -> list:
    return canon_rows(df.toPandas())


@pytest.mark.parametrize(
    "mod_name,fn_name,kwargs,indices",
    _SWEEP,
    ids=[row[1] for row in _SWEEP],
)
def test_crash_sweep_every_batch_index(
    spark, sf_dir, mod_name, fn_name, kwargs, indices
):
    import importlib

    fn = getattr(importlib.import_module(mod_name), fn_name)
    clean = _canon(fn(spark, sf_dir, **kwargs))
    assert clean, fn_name  # a sweep over an empty result pins nothing
    for b in indices:
        got = _canon(fn(spark, sf_dir, crash_once_at=b, **kwargs))
        assert got == clean, f"{fn_name}: crash at batch {b} diverged"
    # double crash at the last index: the recovery replay itself crashes
    b = indices[-1]
    got = _canon(
        fn(spark, sf_dir, crash_once_at=b, crash_times=2, **kwargs)
    )
    assert got == clean, f"{fn_name}: double crash at batch {b} diverged"


# r10 continuation: the two new ingest-state streams join the sweep —
# the HNSW runner's injected crash lands BETWEEN its two stores (edges
# carry the batch, nodes do not: the torn-state window), the DoReMi
# controller's lands after its ledger append with the checkpoint
# uncommitted.
_SWEEP_R10C = [
    ("flink_1_19_source_spark.queries.llm_graph_ann",
     "_hnsw_ingest_run", {}, [0, 1, 2, 3]),
    ("flink_1_19_source_spark.queries.llm_doremi",
     "_doremi_stream_run", {}, [0, 1, 2, 3]),
    ("flink_1_19_source_spark.queries.heavy_hitters",
     "_heavy_hitters_stream_run", {}, [0, 1, 2, 3]),
    # streaming data card: crash between the stats append and the
    # fingerprint append (stats carry the batch, fingerprints do not)
    ("flink_1_19_source_spark.queries.audit",
     "_data_card_stream_run", {}, [0, 1, 2, 3]),
    # streaming trigram-LM stats: crash after the count-segment append
    # with the checkpoint uncommitted — overwrite, never double-count
    ("flink_1_19_source_spark.queries.llm_surprisal3",
     "_kn3_stats_stream_run", {}, [0, 1, 2, 3]),
    # r11: streaming ExactSubstr maintenance — crash after the gram
    # count/first-occurrence segment append; the summing + MIN merge is
    # exactly the class the bid-gated overwrite must protect
    ("flink_1_19_source_spark.queries.llm_suffix",
     "_exactsubstr_stream_run", {}, [0, 1, 2, 3]),
    # r11: streaming byte-BPE vocabulary — crash after the count append
    ("flink_1_19_source_spark.queries.llm_bytebpe",
     "_bb_stats_stream_run", {}, [0, 1, 2, 3]),
    # r12: BLOCKED streaming ANN ingest — same torn-store window as the
    # exact HNSW runner (edges carry the batch, nodes do not), now over
    # the IVF-pruned candidate segments
    ("flink_1_19_source_spark.queries.llm_graph_ann",
     "_hnsw_blocked_ingest_run", {}, [0, 1, 2, 3]),
    # r12: streaming Unigram-trainer word counts — crash after the
    # count-segment append with the checkpoint uncommitted
    ("flink_1_19_source_spark.queries.llm_unigram",
     "_unigram_stats_stream_run", {}, [0, 1, 2, 3]),
    # r12: streaming UniMax controller — crash after the per-language
    # token-count segment append with the checkpoint uncommitted
    ("flink_1_19_source_spark.queries.llm_batching",
     "_unimax_stream_run", {}, [0, 1, 2, 3]),
]


@pytest.mark.parametrize(
    "mod_name,fn_name,kwargs,indices",
    _SWEEP_R10C,
    ids=[row[1] for row in _SWEEP_R10C],
)
def test_crash_sweep_r10c_ingest_streams(
    spark, sf_dir, mod_name, fn_name, kwargs, indices
):
    test_crash_sweep_every_batch_index(
        spark, sf_dir, mod_name, fn_name, kwargs, indices
    )
