"""Round-12 operator tests.

Covers the r11-verdict fixes: the distributed N6 curriculum interleave
(no corpus-sized single-task window anywhere in the manifest tier), the
sub-blocked IVF lists in knn_graph_blocked (bounded per-task memory
regardless of list skew), and the round's new operators (Unigram-LM EM
trainer, blocked streaming ANN ingest, codec quality report).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_19_source_spark.plans import audit
from flink_1_19_source_spark.registry import REGISTRY, queries

queries()


# --------------------------------------------------------------------------
# N6/N7 manifest tier: every SinglePartition exchange is aggregate-sized
# --------------------------------------------------------------------------
def test_manifest_tier_has_no_corpus_sized_single_partition(spark, sf_dir):
    """The r11 verdict's one weak item: n6_curriculum_order's global
    interleave planned as Exchange SinglePartition -> one task sorting
    the whole corpus.  Now the interleave runs the house
    range-partition pattern (dense_rank_distributed), and this pin
    holds for the whole batch N6 tier: a SinglePartition exchange may
    only feed from aggregated (group-count-sized) rows — e.g. the
    one-row-per-shuffle-partition offset table — never from a scan."""
    for name in (
        "n6_curriculum_order",
        "n6_epoch_shuffle",
        "n6_sequence_packing",
        "n6_stratified_sample",
        "n6_temperature_mix",
        "n6_unimax_mix",
        "n6_token_budget_epochs",
        "n6_train_val_test_split",
    ):
        df = REGISTRY[name].fn(spark, sf_dir)
        assert audit.single_partition_is_aggregate_sized(df), (
            name,
            audit.plan_text(df, "simple"),
        )


def test_curriculum_order_matches_single_task_window(spark, sf_dir):
    """The distributed interleave must be value-identical to the
    straightforward (single-task) global row_number it replaced —
    (stratum_rank, lang, doc_id) is unique, so the distributed dense
    rank IS the row number."""
    from pyspark.sql.window import Window

    got = REGISTRY["n6_curriculum_order"].fn(spark, sf_dir)
    ref = (
        got.select("doc_id", "lang", "stratum_rank")
        .withColumn(
            "global_pos_ref",
            F.row_number()
            .over(Window.orderBy("stratum_rank", "lang", "doc_id"))
            .cast("long"),
        )
    )
    diff = (
        got.join(ref, ["doc_id", "lang", "stratum_rank"])
        .filter(F.col("global_pos") != F.col("global_pos_ref"))
        .count()
    )
    assert diff == 0


# --------------------------------------------------------------------------
# N3: IVF lists sub-blocked — bounded per-task memory under list skew
# --------------------------------------------------------------------------
def test_knn_graph_blocked_subblocking_is_exact(spark, sf_dir, monkeypatch):
    """Lists larger than BLOCK_ROWS are hash-split into sub-blocks
    (_list_packed) so no shuffle row grows with list size; the per-src
    top-m must be EXACTLY the same whatever the sub-blocking.  Force
    BLOCK_ROWS tiny (every fixture list splits into many sub-blocks,
    every src's in-list neighbors scattered across them) and compare
    edge-for-edge — including rank and the 9-dp sim — against the
    one-sub-block-per-list run."""
    import numpy as np

    from flink_1_19_source_spark.operators import graph_ann as ga
    from flink_1_19_source_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 400
    )
    cent = np.array(
        [r.embedding for r in e.filter(F.col("vec_id") < 4)
         .orderBy("vec_id").select("embedding").collect()],
        dtype=float,
    )
    want = {
        tuple(r)
        for r in ga.knn_graph_blocked(e, cent, m=5, nprobe=2).collect()
    }
    monkeypatch.setattr(ga, "BLOCK_ROWS", 16)
    got = {
        tuple(r)
        for r in ga.knn_graph_blocked(e, cent, m=5, nprobe=2).collect()
    }
    assert got == want and len(want) > 0


# --------------------------------------------------------------------------
# N4: Unigram-LM EM trainer (Kudo 2018)
# --------------------------------------------------------------------------
def test_unigram_em_posterior_covers_each_position_once():
    """Forward-backward correctness at the kernel level: every
    segmentation covers every character position exactly once, so the
    posterior occupancy summed over the occurrences covering any one
    position must be 1 — i.e. SCALE in the quantized integers, up to
    one rounding step per contributing occurrence."""
    from flink_1_19_source_spark.operators.corpus import (
        unigram_em_expected_counts,
    )

    w = "abcab"
    # a vocab where multiple segmentations carry real mass
    probs = {"a": 0.2, "b": 0.2, "c": 0.1, "ab": 0.15, "ca": 0.1,
             "bca": 0.05, "abc": 0.05}
    # re-derive per-occurrence posteriors (the kernel aggregates per
    # piece, so recompute the lattice here with plain floats)
    import math

    n = len(w)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for j in range(1, n + 1):
        for ln in range(1, min(4, j) + 1):
            p = probs.get(w[j - ln:j])
            if p is not None:
                alpha[j] += p * alpha[j - ln]
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        for ln in range(1, min(4, n - i) + 1):
            p = probs.get(w[i:i + ln])
            if p is not None:
                beta[i] += p * beta[i + ln]
    for pos in range(n):
        cover = sum(
            alpha[i] * probs[w[i:j]] * beta[j] / alpha[n]
            for i in range(n)
            for j in range(i + 1, min(i + 4, n) + 1)
            if w[i:j] in probs and i <= pos < j
        )
        assert math.isclose(cover, 1.0, rel_tol=1e-12), (pos, cover)
    # and the kernel's per-piece totals agree with the lattice
    ecs = unigram_em_expected_counts(w, probs)
    for piece, ec in ecs.items():
        want = sum(
            math.floor(
                alpha[i] * probs[piece] * beta[j] / alpha[n]
                * 1048576.0 + 0.5
            )
            for i in range(n)
            for j in range(i + 1, min(i + 4, n) + 1)
            if w[i:j] == piece
        )
        assert ec == want, piece


def test_unigram_train_invariants(spark, sf_dir):
    """Trained-vocab invariants: every corpus character survives the
    prune (coverage), rank is the exact (ecnt desc, piece asc)
    permutation, and the renormalized probabilities sum to ~1."""
    out = REGISTRY["n4_unigram_train"].fn(spark, sf_dir).collect()
    pieces = {r["piece"] for r in out}
    chars = {
        c
        for (w,) in spark.sql("SELECT 1").sparkSession.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).filter("doc_id < 200").select("text").collect()
        for tokw in str(w).lower().split()
        for c in tokw
    }
    assert chars <= pieces, chars - pieces
    ranked = sorted(out, key=lambda r: (-r["ecnt"], r["piece"]))
    assert [r["rank"] for r in ranked] == list(range(1, len(out) + 1))
    s = sum(r["prob"] for r in out)
    assert abs(s - 1.0) < 1e-6, s


def test_unigram_trained_encode_is_lossless(spark, sf_dir):
    """Max-product Viterbi segmentation concatenates back to the word:
    total encoded characters == total corpus word characters."""
    from flink_1_19_source_spark.queries.llm_unigram import _words_df

    toks = REGISTRY["n4_unigram_train_encode"].fn(spark, sf_dir)
    enc_chars = toks.select(
        F.sum(F.length("token") * F.col("cnt"))
    ).collect()[0][0]
    corpus_chars = _words_df(spark, sf_dir).select(
        F.sum(F.col("wl") * F.col("freq"))
    ).collect()[0][0]
    assert enc_chars == corpus_chars


# --------------------------------------------------------------------------
# N3-S: blocked streaming ingest == one-shot blocked build
# --------------------------------------------------------------------------
def test_blocked_ingest_stream_matches_one_shot(spark, sf_dir):
    """The IVF-pruned streaming ingest must answer EXACTLY what the
    one-shot blocked build answers: the per-batch candidate segments
    union to the full blocked candidate relation, and the read-time
    per-(lvl, src) top-M fold reproduces knn_graph_blocked's layer 0
    and the exact layered passes' upper layers."""
    batch = {
        tuple(r)
        for r in REGISTRY["n3_hnsw_blocked_topk"].fn(spark, sf_dir).collect()
    }
    stream = {
        tuple(r)
        for r in REGISTRY["s_hnsw_blocked_ingest_stream"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert stream == batch and len(batch) > 0


# --------------------------------------------------------------------------
# N5: codec quality reports (PSNR/SSIM)
# --------------------------------------------------------------------------
def test_adpcm_encode_roundtrip_invariants():
    """The new IMA ADPCM ENCODE path: whole-block framing, block-start
    samples lossless (header predictor), bounded reconstruction, and
    the encoder is deterministic."""
    from flink_1_19_source_spark.operators.adpcm_codec import (
        decode_adpcm_wav, encode_adpcm_pcm,
    )

    for did in (0, 3, 7, 42):
        amp = 2 + did % 5
        src = [((did*41 + i*17) % 4001 - 2000) * amp for i in range(130)]
        payload = encode_adpcm_pcm(src)
        rate, ch, rt = decode_adpcm_wav(payload)
        assert (rate, ch) == (8000, 1)
        assert len(rt) == len(src)
        assert rt[0] == src[0] and rt[65] == src[65]  # block headers
        assert all(-32768 <= s <= 32767 for s in rt)
        assert encode_adpcm_pcm(src) == payload


def test_quality_report_metric_ranges(spark, sf_dir):
    """SSIM must land in (0, 1] and be exactly 1.0 only for lossless
    items; PSNR must be present whenever SSE > 0."""
    gif = REGISTRY["n5_gif_quality_report"].fn(spark, sf_dir).collect()
    assert gif
    for r in gif:
        assert 0.0 < r["ssim"] <= 1.0, r
        assert (r["sse"] == 0) == (r["psnr_db"] is None), r
        if r["sse"] == 0:
            assert r["ssim"] == 1.0, r
    adp = REGISTRY["n5_adpcm_quality_report"].fn(spark, sf_dir).collect()
    assert adp
    for r in adp:
        assert r["sse"] > 0 and r["psnr_db"] > 0, r  # genuinely lossy


def test_ssim_expression_is_one_for_identical_images(spark):
    """Kernel identity: equal source and round-trip moments give SSIM
    exactly 1.0 (numerator and denominator are the same doubles)."""
    from flink_1_19_source_spark.queries.llm_media_quality import (
        _SSIM_EXPR,
    )

    row = spark.createDataFrame(
        [(100, 5000, 5000, 260000, 260000, 260000)],
        "n_px long, sx long, sy long, sxx long, syy long, sxy long",
    )
    got = row.select(F.expr(_SSIM_EXPR).alias("s")).collect()[0]["s"]
    assert got == 1.0


# --------------------------------------------------------------------------
# N6-S: streaming UniMax re-allocation
# --------------------------------------------------------------------------
def test_unimax_stream_is_slicing_invariant(spark, sf_dir):
    """Language token counts are additive over any corpus slicing, so
    the drained streaming allocation must equal the one-shot batch
    answer for EVERY chunk count — the invariance that lets the
    controller re-allocate at any ingest cadence."""
    from flink_1_19_source_spark.queries.llm_batching import (
        _unimax_stream_run, n6_unimax_mix,
    )

    want = sorted(tuple(r) for r in n6_unimax_mix(spark, sf_dir).collect())
    assert want
    for chunks in (2, 5):
        got = sorted(
            tuple(r)
            for r in _unimax_stream_run(spark, sf_dir, chunks=chunks)
            .collect()
        )
        assert got == want, f"chunks={chunks} diverged from batch"


# --------------------------------------------------------------------------
# N4 quality-rule sets: Gopher (Rae et al. 2021) + C4 (Raffel et al. 2020)
# --------------------------------------------------------------------------
def test_gopher_rules_map_only_and_exact_boundaries(spark, sf_dir):
    """The whole rule set must ride the scan: zero hash/range shuffles.
    Rule booleans must be exact integer comparisons: recompute
    r_mean_word_len from the reported integers and require agreement,
    and the corpus must produce BOTH outcomes for the word-count gate
    (a vacuously-true rule set pins nothing)."""
    df = REGISTRY["n4_gopher_rules"].fn(spark, sf_dir)
    assert audit.shuffle_count(df) == 0, audit.plan_text(df, "simple")
    rows = df.collect()
    assert rows
    passes = {r.r_word_count for r in rows}
    assert passes == {True, False}, passes
    for r in rows:
        assert r.gopher_pass == (
            r.r_word_count and r.r_mean_word_len and r.r_symbol_ratio
            and r.r_bullet_lines and r.r_ellipsis_lines
            and r.r_alpha_words and r.r_stopwords
        )
        # word-soup fixture: no bullets/ellipses/symbols -> those rules
        # hold, and every word is alphabetic
        assert r.r_symbol_ratio and r.r_bullet_lines and r.r_ellipsis_lines
        assert r.frac_alpha_words == 1.0


def test_c4_every_rule_fires(spark, sf_dir):
    """The synthesized page view must exercise EVERY paper rule: both
    page-drop reasons occur, pages survive, line-level drops happen on
    kept pages (javascript / missing punctuation / short tail line),
    and clean_fp is non-null exactly on kept pages."""
    rows = REGISTRY["n4_c4_page_clean"].fn(spark, sf_dir).collect()
    statuses = {r.page_status for r in rows}
    assert {"kept", "drop_lorem", "drop_brace"} <= statuses, statuses
    for r in rows:
        assert (r.clean_fp is not None) == (r.page_status == "kept")
        assert r.n_kept_lines <= r.n_lines
    kept = [r for r in rows if r.page_status == "kept"]
    assert any(r.n_kept_lines < r.n_lines for r in kept)


def test_label_propagation_structure(spark, sf_dir):
    """LPA output: one row per vector, community ids are node ids,
    sizes reconcile, and the graph genuinely clusters (at least one
    multi-node community AND more than one community)."""
    df = REGISTRY["x8_label_propagation"].fn(spark, sf_dir)
    rows = df.collect()
    n_vec = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    )
    assert len(rows) == n_vec
    ids = {r.node_id for r in rows}
    assert len(ids) == n_vec
    from collections import Counter

    by_comm = Counter(r.community for r in rows)
    for r in rows:
        assert r.community_size == by_comm[r.community]
        assert r.community in ids
    assert len(by_comm) > 1
    assert max(by_comm.values()) > 1


def test_wordpiece_trainer_is_likelihood_driven(spark, sf_dir):
    """The WordPiece/BPE discriminator: the merge sequence must NOT be
    frequency-monotone (BPE's order) — the fixed-point likelihood score
    picks low-frequency high-affinity pairs first.  Plus structural
    invariants: contiguous merge numbers, continuation-marked right
    pairs, scores in (0, 10^12] (cnt <= min(ua, ub) bounds the ratio
    by 1)."""
    rows = REGISTRY["n4_wordpiece_train"].fn(spark, sf_dir).collect()
    assert [r.merge_no for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == 24
    for r in rows:
        assert r.pair_b.startswith("#"), r
        assert 0 < r.score_fp <= 10**12, r
        assert r.pair_count > 0
    cnts = [r.pair_count for r in rows]
    assert not all(cnts[i] >= cnts[i + 1] for i in range(len(cnts) - 1)), (
        "merge order is frequency-monotone — that's BPE, not WordPiece"
    )


def test_wordpiece_trained_encode_shrinks_tokens(spark, sf_dir):
    """Encoding under the trained vocab must emit fewer symbols than
    characters (24 merges genuinely fired) and at least one symbol per
    word."""
    from flink_1_19_source_spark.queries.llm_wordpiece import (
        _wp_train_spark,
    )

    _, words, _ = _wp_train_spark(spark, sf_dir)
    rows = words.select(
        "w",
        "freq",
        F.size(F.split(F.expr("trim(BOTH '|' FROM s)"), r"\|\|")).alias(
            "n_syms"
        ),
    ).collect()
    assert all(1 <= r.n_syms <= len(r.w) for r in rows)
    assert any(r.n_syms < len(r.w) for r in rows)


def test_sssp_weighted_triangle_inequality_vs_bfs(spark, sf_dir):
    """SSSP sanity on the real graph: the source has dist 0; every
    reached node's weighted distance is positive and at least 2x its
    unweighted hop count (min edge weight = mutual-rank sum >= 2); a
    relaxed edge never violates dist(v) <= dist(u) + w(u, v)."""
    df = REGISTRY["x8_sssp_weighted"].fn(spark, sf_dir)
    rows = {r.node_id: r for r in df.collect()}
    assert rows[0].dist_w == 0 and rows[0].reached
    reached = [r for r in rows.values() if r.reached and r.node_id != 0]
    assert reached, "graph disconnected at the source — fixture broke"
    assert all(r.dist_w >= 2 for r in reached)
    assert all(not r.reached or r.dist_w is not None for r in rows.values())
    assert any(not r.reached for r in rows.values()) or len(reached) == len(rows) - 1


def test_exact_k_sample_stream_invariance_and_crash(spark, sf_dir):
    """Bottom-k is mergeable, so the drained streaming sample must be
    bit-identical to the one-shot batch sample at EVERY slicing, and a
    crash after the segment append (checkpoint uncommitted) must not
    duplicate or lose candidates."""
    from flink_1_19_source_spark.queries.llm_sampling2 import (
        _exact_k_stream_run, n6_exact_k_sample,
    )

    want = sorted(
        tuple(r) for r in n6_exact_k_sample(spark, sf_dir).collect()
    )
    assert want
    for chunks in (2, 5):
        got = sorted(
            tuple(r)
            for r in _exact_k_stream_run(spark, sf_dir, chunks=chunks)
            .collect()
        )
        assert got == want, f"chunks={chunks} diverged from batch"
    got = sorted(
        tuple(r)
        for r in _exact_k_stream_run(spark, sf_dir, crash_once_at=1)
        .collect()
    )
    assert got == want, "crash replay diverged from batch"


def test_exact_k_sample_is_exact_k_and_uniform_device(spark, sf_dir):
    """Each language yields min(k, stratum size) rows, ranks are
    contiguous from 1, and the kept set is exactly the k smallest
    md5 priorities (re-derived independently here)."""
    import hashlib
    from collections import defaultdict

    rows = REGISTRY["n6_exact_k_sample"].fn(spark, sf_dir).collect()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    by_lang = defaultdict(list)
    for r in d:
        pri = hashlib.md5(f"ks:{r.doc_id}".encode()).hexdigest()
        by_lang[r.lang].append((pri, r.doc_id))
    got = defaultdict(list)
    for r in rows:
        got[r.lang].append((r.smp_rank, r.doc_id))
    assert set(got) == set(by_lang)
    for lang, cand in by_lang.items():
        want = [doc for _, doc in sorted(cand)[:20]]
        have = [doc for _, doc in sorted(got[lang])]
        assert have == want, lang
        assert sorted(rk for rk, _ in got[lang]) == list(
            range(1, len(want) + 1)
        )


def test_quality_gate_pipeline_ladder_reconciles(spark, sf_dir):
    """The attrition ledger must reconcile per language: docs =
    c4_dropped + gopher_dropped + kept; kept = eval + train; eval <=
    20; and the per-stage counts must agree with the certified
    component operators recomputed independently."""
    rows = {
        r.lang: r
        for r in REGISTRY["pipeline_quality_gate_end_to_end"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert rows
    c4 = {
        r.doc_id: r.page_status
        for r in REGISTRY["n4_c4_page_clean"].fn(spark, sf_dir).collect()
    }
    gop = {
        r.doc_id: r.gopher_pass
        for r in REGISTRY["n4_gopher_rules"].fn(spark, sf_dir).collect()
    }
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    from collections import Counter

    want_docs = Counter(r.lang for r in d)
    want_kept = Counter(
        r.lang for r in d if c4[r.doc_id] == "kept" and gop[r.doc_id]
    )
    for lang, r in rows.items():
        assert r.n_docs == want_docs[lang]
        assert r.n_docs == r.n_c4_dropped + r.n_gopher_dropped + r.n_kept
        assert r.n_kept == want_kept.get(lang, 0)
        assert r.n_kept == r.n_eval + r.n_train
        assert r.n_eval <= 20


def test_c4_span_dedup_footer_fires(spark, sf_dir):
    """The planted boilerplate footer makes the 3-sentence-span rule do
    real work: at least one doc loses a span to keep-first, exactly one
    doc keeps the footer span, and docs without the footer have zero
    duplicate spans unless they collide otherwise (word-soup spans are
    unique, so dup spans == footer losers)."""
    rows = REGISTRY["n2_c4_span_dedup"].fn(spark, sf_dir).collect()
    assert rows
    dup_docs = [r for r in rows if r.n_dup_spans > 0]
    assert dup_docs, "span dedup is vacuous — footer synthesis broke"
    for r in rows:
        assert 0 <= r.n_dup_spans <= r.n_spans
        assert abs(r.dup_frac - round(r.n_dup_spans / r.n_spans, 9)) < 1e-12


def test_quality_gate_stream_invariance_and_crash(spark, sf_dir):
    """Counts are additive and the eval holdout is mergeable bottom-k,
    so every slicing must reproduce the batch ledger bit-for-bit; the
    crash fires BETWEEN the two stores (counts appended, candidates
    not) — the torn-state window replay must heal."""
    from flink_1_19_source_spark.queries.llm_quality_rules import (
        _quality_gate_stream_run, pipeline_quality_gate_end_to_end,
    )

    want = sorted(
        tuple(r)
        for r in pipeline_quality_gate_end_to_end(spark, sf_dir).collect()
    )
    assert want
    for chunks in (2, 5):
        got = sorted(
            tuple(r)
            for r in _quality_gate_stream_run(spark, sf_dir, chunks=chunks)
            .collect()
        )
        assert got == want, f"chunks={chunks} diverged from batch"
    for b in (0, 1):
        got = sorted(
            tuple(r)
            for r in _quality_gate_stream_run(
                spark, sf_dir, crash_once_at=b
            ).collect()
        )
        assert got == want, f"crash at batch {b} diverged"


def test_kmeans_micro_unit_sums_match_decimal_reference(spark, sf_dir):
    """r12 optimization pin: assign_topn / _update carry their exact
    sums as int64 micro-units instead of DECIMAL(27,6).  Guard the
    equivalence at the unit level against future edits: on the real
    fixture corpus the micro-unit assignment must be row-identical to
    an explicit decimal-sum reference (same distances, same tie-breaks,
    same rn), and the round-9 centroid doubles of a full fit must match
    the decimal-path update bit-for-bit."""
    from flink_1_19_source_spark.operators import kmeans as km
    from flink_1_19_source_spark.tables import load_table
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "embeddings")
    corpus = (
        e.select("vec_id", F.posexplode("embedding").alias("dim", "xf"))
        .select(
            "vec_id",
            F.col("dim").cast("long").alias("dim"),
            F.round(F.col("xf").cast("double"), 6).alias("x"),
        )
        .localCheckpoint(eager=True)
    )
    cent = corpus.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cluster"), "dim", F.col("x").alias("c")
    )

    def assign_decimal_ref(n):
        sq = F.round(
            (F.col("x") - F.col("c")) * (F.col("x") - F.col("c")), 6
        ).cast("decimal(27,6)")
        dist = (
            corpus.join(F.broadcast(cent), "dim")
            .groupBy("vec_id", "cluster")
            .agg(F.sum(sq).cast("double").alias("dist"))
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cluster")
        return (
            dist.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= n)
            .select("vec_id", "cluster", "rn")
        )

    want = {tuple(r) for r in assign_decimal_ref(2).collect()}
    got = {tuple(r) for r in km.assign_topn(corpus, cent, 2).collect()}
    assert got == want and len(want) > 0

    # centroid update: exact decimal mean vs micro-unit mean, round 9
    asg = km._assign(corpus, cent)
    dec = (
        asg.join(corpus, "vec_id")
        .groupBy("cluster", "dim")
        .agg(
            F.round(
                F.sum(F.col("x").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1)), 9
            ).alias("c")
        )
    )
    want_c = {(r.cluster, r.dim): r.c for r in dec.collect()}
    got_c = {
        (r.cluster, r.dim): r.c
        for r in km._update(corpus, asg).collect()
    }
    assert got_c == want_c and len(got_c) > 0


def test_equality_classes_match_dense_rank_grouping(spark):
    """r12 optimization pin: prefix_double_ranks switched from ordered
    dense ranks to equality-class ids (min gpos + 1).  The contract its
    consumers rely on: same-class iff same key tuple, ids >= 1 (so the
    Manber-Myers 0 sentinel can never collide), and the id is the
    class's minimum gpos + 1 (deterministic under any partitioning)."""
    from flink_1_19_source_spark.operators import suffix_array as sa

    df = spark.createDataFrame(
        [(0, "b", 5), (1, "a", 5), (2, "b", 5), (3, "a", 7), (4, "b", 5)],
        "gpos long, k1 string, k2 long",
    )
    got = {
        r["gpos"]: r["cls"]
        for r in sa.equality_classes(df, ["k1", "k2"], "cls").collect()
    }
    # classes: {("a",5): min gpos 1} {("a",7): 3} {("b",5): min gpos 0}
    assert got == {0: 1, 1: 2, 2: 1, 3: 4, 4: 1}, got
    assert min(got.values()) >= 1
