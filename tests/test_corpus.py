"""Invariant tests for the corpus-hygiene operators (operators/corpus.py).

The oracle suite (test_oracle.py) already value-hash-checks the four
llm2 queries against DuckDB; these tests pin the semantic invariants the
hash can't express: redaction idempotence, zero false positives, pack
budget compliance, contamination bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_19_source_spark.operators import corpus
from flink_1_19_source_spark.queries.llm2 import _inject_pii, _PACK_BUDGET
from flink_1_19_source_spark.tables import load_table


def test_pii_redaction_idempotent(spark, sf_dir):
    d = _inject_pii(load_table(spark, sf_dir, "documents"))
    once = d.select("doc_id", corpus.pii_redact(F.col("text")).alias("t"))
    twice = once.select("doc_id", corpus.pii_redact(F.col("t")).alias("t"))
    assert once.exceptAll(twice).count() == 0


def test_pii_no_false_positives_on_clean_docs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")  # un-injected word salad
    counts = corpus.pii_counts(F.col("text"))
    hit = d.select(
        sum(c for c in counts.values()).alias("total")
    ).agg(F.sum("total")).collect()[0][0]
    assert hit == 0


def test_pii_counts_match_injection_schedule(spark, sf_dir):
    d = _inject_pii(load_table(spark, sf_dir, "documents"))
    counts = corpus.pii_counts(F.col("text"))
    rows = d.select("doc_id", *[c.alias(n) for n, c in counts.items()]).collect()
    for r in rows:
        assert r.n_emails == (1 if r.doc_id % 7 == 0 else 0), r
        assert r.n_phones == (1 if r.doc_id % 13 == 0 else 0), r
        assert r.n_ips == (1 if r.doc_id % 11 == 0 else 0), r


def test_pack_budget_respected(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    packed = corpus.pack_sequences(
        d, "source", "doc_id", "text", budget=_PACK_BUDGET
    )
    per_pack = (
        packed.groupBy("source", "pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n_docs"))
        .collect()
    )
    assert per_pack
    for r in per_pack:
        # a pack only exceeds the budget when a single oversized doc forced it
        assert r.tot <= _PACK_BUDGET or r.n_docs == 1, r


def test_pack_ids_contiguous_per_group(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    packed = corpus.pack_sequences(d, "source", "doc_id", "text", budget=128)
    groups = (
        packed.groupBy("source")
        .agg(
            F.min("pack_id").alias("lo"),
            F.max("pack_id").alias("hi"),
            F.countDistinct("pack_id").alias("n"),
        )
        .collect()
    )
    for r in groups:
        assert r.lo == 0 and r.n == r.hi + 1, r


def test_contamination_bounds_and_benchmark_exclusion(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 10 == 7)
    corp = d.filter(F.col("doc_id") % 10 != 7)
    out = corpus.contamination(corp, bench, "doc_id", "text", n=5).collect()
    assert out
    for r in out:
        assert r.doc_id % 10 != 7
        assert 0 <= r.n_hit <= r.n_grams
        assert 0.0 <= r.contamination <= 1.0
    # a benchmark doc checked against itself must be fully contaminated
    self_hit = corpus.contamination(bench, bench, "doc_id", "text", n=5).collect()
    assert all(r.contamination == 1.0 for r in self_hit)


def test_repetition_signals_bounds(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    sig = corpus.repetition_signals(F.col("text"))
    rows = d.select("doc_id", *[c.alias(n) for n, c in sig.items()]).collect()
    for r in rows:
        assert 0.0 <= r.dup_token_frac < 1.0
        # the top token appears at least once and at most every slot
        if r.n_tokens:
            assert 1.0 / r.n_tokens <= r.top_token_frac <= 1.0
        # a doc repeating one token has top_bigram_frac 1; bounds hold anyway
        assert 0.0 <= r.top_bigram_frac <= 1.0


def test_repetition_flags_synthetic_repeater(spark):
    clean = "the quick brown fox jumps over the lazy dog again and again"
    loop = "spam ham spam ham spam ham spam ham spam ham spam ham"
    df = spark.createDataFrame([(1, clean), (2, loop)], "id long, text string")
    sig = corpus.repetition_signals(F.col("text"))
    got = {
        r.id: r
        for r in df.select("id", *[c.alias(n) for n, c in sig.items()]).collect()
    }
    assert got[2].top_token_frac == 0.5
    assert got[2].top_bigram_frac > got[1].top_bigram_frac
    assert got[2].dup_token_frac > got[1].dup_token_frac
