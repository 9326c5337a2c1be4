"""Round-7 additions: skew-cap engagement, SESSION TVF, retraction
chains — semantic pins the hash oracle alone can't express (e.g. that a
count is NONZERO, not merely equal on both engines)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_19_source_spark.registry import REGISTRY, queries
from flink_1_19_source_spark.tables import load_table

queries()


def test_lsh_skew_cap_engages_and_spares_clean_docs(spark, sf_dir):
    """The band-bucket cap must be SEEN binding: the adversarial
    boilerplate corpus drops a nonzero number of hot buckets (all 8
    bands of the identical-text set), and every surviving pair is
    between clean (doc_id % 5 == 0) docs — the capped loss is exactly
    the degenerate set, never the safe subset."""
    rows = REGISTRY["n2_lsh_capped_skew"].fn(spark, sf_dir).collect()
    assert rows, "clean near-dup pairs must survive the cap"
    dropped = {r.n_dropped_buckets for r in rows}
    assert dropped == {8}, dropped  # one hot bucket per band, all capped
    for r in rows:
        assert r.id_a % 5 == 0 and r.id_b % 5 == 0, r


def test_topn_over_agg_crash_replay_converges(spark, sf_dir):
    """Crash injected at the WORST point (all three state tables
    mutated, ledger unmarked) — the availableNow restart replays the
    batch, the absolute-value MERGEs absorb the double application, and
    the drained Top-N equals the crash-free run bit for bit."""
    from flink_1_19_source_spark.queries.streaming2 import _topn_retract_run

    from .oracle import canon_rows

    clean = canon_rows(_topn_retract_run(spark, sf_dir).toPandas())
    crashed = canon_rows(
        _topn_retract_run(spark, sf_dir, crash_once_at=1).toPandas()
    )
    assert clean == crashed
