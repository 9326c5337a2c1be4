"""Round-10 third-session operator pins: CCNet perplexity buckets,
D4 selection, the JPEG transform-coded encode path, and the data-card
composite."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ccnet_buckets_are_per_language_terciles(spark, sf_dir):
    """Every language splits into head/middle/tail with near-equal
    sizes, the head tercile's surprisal never exceeds the tail's, and
    the doc set equals the surprisal gate's scored set (shared core)."""
    from flink_1_19_source_spark.queries.llm_surprisal import (
        _surprisal_scores, n4_ccnet_buckets,
    )

    out = n4_ccnet_buckets(spark, sf_dir).cache()
    per = (
        out.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("mean_millibits").alias("lo"),
            F.max("mean_millibits").alias("hi"),
        )
        .collect()
    )
    by_lang: dict = {}
    for r in per:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, b in by_lang.items():
        assert set(b) == {"head", "middle", "tail"}, (lang, set(b))
        sizes = sorted(b[k]["n"] for k in b)
        assert sizes[-1] - sizes[0] <= 1, (lang, sizes)  # NTILE balance
        # NTILE over ORDER BY surprisal: every head value <= every
        # middle value <= every tail value (boundary ties are legal
        # under NTILE, hence <=) — assert the boundaries directly
        assert b["head"]["hi"] <= b["middle"]["lo"], (lang, b)
        assert b["middle"]["hi"] <= b["tail"]["lo"], (lang, b)
    scored = _surprisal_scores(spark, sf_dir).select("doc_id")
    assert out.select("doc_id").subtract(scored).count() == 0
    assert scored.subtract(out.select("doc_id")).count() == 0
    out.unpersist()


def test_d4_selection_dispositions(spark, sf_dir):
    """D4: every input vector gets exactly one disposition; the pruned
    set per cluster is exactly the floor(n/4) most-prototypical
    survivors (no selected row sits closer to the centroid than a
    pruned one); and the dedup stage agrees with the certified
    SemDeDup operator."""
    from flink_1_19_source_spark.queries.llm_select import n6_d4_selection
    from flink_1_19_source_spark.queries.llm import n2_semantic_dedup

    out = n6_d4_selection(spark, sf_dir).cache()
    n_vec = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 600)
        .count()
    )
    assert out.count() == n_vec
    assert out.select("vec_id").distinct().count() == n_vec

    rows = out.collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    saw_pruned = False
    for cl, rs in by_cluster.items():
        surv = [r for r in rs if r["stage"] != "dedup_dropped"]
        pruned = [r for r in surv if r["stage"] == "proto_pruned"]
        selected = [r for r in surv if r["stage"] == "selected"]
        assert len(pruned) == len(surv) // 4, (cl, len(pruned), len(surv))
        if pruned:
            saw_pruned = True
            assert min(p["cos_centroid"] for p in pruned) >= max(
                (s["cos_centroid"] for s in selected), default=-2.0
            ) - 1e-12, cl
    assert saw_pruned  # non-vacuity: the prune branch actually fires
    # stage-2 agreement with the certified SemDeDup rule
    sem_kept = {r["vec_id"] for r in n2_semantic_dedup(spark, sf_dir).collect()}
    d4_kept = {r["vec_id"] for r in rows if r["stage"] != "dedup_dropped"}
    assert sem_kept == d4_kept
    out.unpersist()


def test_jpeg_pixel_encode_matches_independent_transform_replay():
    """The genuinely lossy path (non-constant blocks, nonzero AC): the
    certified decoder's output on the encoder's bytes must equal an
    independent numpy FDCT→quant→dequant→IDCT replay bit-for-bit, and
    the stream must actually compress vs raw."""
    import numpy as np

    from flink_1_19_source_spark.operators.jpeg_codec import (
        _M, decode_jpeg_gray,
    )
    from flink_1_19_source_spark.operators.jpeg_encode import (
        ANNEX_K_LUMA_Q, encode_jpeg_gray_pixels,
    )

    rng = np.random.RandomState(7)
    w, h = 32, 24
    img = rng.randint(0, 256, size=(h, w)).astype(np.float64)
    data = encode_jpeg_gray_pixels(img.reshape(-1).tolist(), w, h)
    W, H, out = decode_jpeg_gray(data)
    assert (W, H) == (w, h)
    got = np.frombuffer(out, dtype=np.uint8).reshape(h, w).astype(float)

    q = np.asarray(ANNEX_K_LUMA_Q, float).reshape(8, 8)
    ref = np.zeros((h, w))
    for by in range(h // 8):
        for bx in range(w // 8):
            B = img[by*8:(by+1)*8, bx*8:(bx+1)*8] - 128.0
            S = _M @ B @ _M.T
            x = S / q
            Q = np.sign(x) * np.floor(np.abs(x) + 0.5)
            R = _M.T @ (Q * q) @ _M
            ref[by*8:(by+1)*8, bx*8:(bx+1)*8] = np.clip(
                np.round(R + 128.0), 0, 255
            )
    assert np.array_equal(got, ref)
    # it IS lossy on this input (quantization really fired) ...
    assert np.max(np.abs(got - img)) > 0
    # ... and it still compresses vs 8-bit raw
    assert len(data) < w * h

    # restart-marker write path: same pixels, DRI cadence, same decode
    data_rst = encode_jpeg_gray_pixels(
        img.reshape(-1).tolist(), w, h, restart_interval=2
    )
    assert data_rst != data
    W2, H2, out2 = decode_jpeg_gray(data_rst)
    assert out2 == out


def test_data_card_totals_agree_with_certified_operators(spark, sf_dir):
    """The card's columns must reconcile with the operators they
    summarize: dup totals with n1_fingerprint_dedup, gate totals with
    n4_lm_surprisal_filter, and the doc count with the corpus."""
    from flink_1_19_source_spark.queries.audit import pipeline_data_card
    from flink_1_19_source_spark.queries.llm import n1_fingerprint_dedup
    from flink_1_19_source_spark.queries.llm_surprisal import (
        n4_lm_surprisal_filter,
    )

    card = pipeline_data_card(spark, sf_dir).collect()
    n_corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in card) == n_corpus

    fp = n1_fingerprint_dedup(spark, sf_dir).collect()
    assert sum(r["n_exact_dup"] for r in card) == sum(
        r["n_copies"] - 1 for r in fp
    )

    gate = n4_lm_surprisal_filter(spark, sf_dir).collect()
    assert sum(r["n_quality_fail"] for r in card) == sum(
        1 for r in gate if not r["keep"]
    )
    assert sum(r["n_short"] for r in card) == n_corpus - len(gate)

    for r in card:
        assert r["n_clean"] <= r["n_docs"] - max(
            r["n_exact_dup"], r["n_quality_fail"]
        )
        assert r["median_nt"] is not None and r["median_nt"] >= 0


def test_ccnet_composite_reconciles_and_dedups(spark, sf_dir):
    """The CCNet composite's chunk totals must reconcile with
    n1_chunk_dedup, dedup must actually fire, buckets must partition
    the scored set, and the post-dedup stages must run off the
    checkpointed rebuild (no second corpus scan in the final plan)."""
    from flink_1_19_source_spark.queries.ccnet_pipeline import (
        pipeline_ccnet_end_to_end,
    )
    from flink_1_19_source_spark.queries.llm2 import n1_chunk_dedup

    out = pipeline_ccnet_end_to_end(spark, sf_dir)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "documents.parquet" not in plan  # downstream reuses the rebuild
    rows = out.collect()

    cd = n1_chunk_dedup(spark, sf_dir).collect()
    assert sum(r["n_chunks"] for r in rows) == sum(r["n_chunks"] for r in cd)
    total_dup = sum(r["n_chunks"] - r["n_kept"] for r in cd)
    assert sum(r["n_dup_chunks"] for r in rows) == total_dup
    assert total_dup > 0  # the dedup stage is non-vacuous on this corpus

    for r in rows:
        assert r["n_head"] + r["n_middle"] + r["n_tail"] == r["n_scored"]
        assert r["n_scored"] <= r["n_docs"]
    assert sum(r["n_scored"] for r in rows) > 0


def test_kn3_gate_discriminates_on_planted_corpus(spark):
    """Trigram KN: a corpus of fluent repeated phrases plus one
    gibberish document — the gibberish doc must carry strictly higher
    mean surprisal than every fluent doc, and all whole-bit surprisals
    must be non-negative (the properness/telescoping property)."""
    from flink_1_19_source_spark.queries.llm_surprisal3 import (
        _kn3_scores_from,
    )
    from flink_1_19_source_spark.operators import text_analysis as ta

    fluent = "the quick brown fox jumps over the lazy dog"
    docs = [(i, fluent) for i in range(20)]
    docs.append((100, "zq xv qj kx vz jq wq qk zx vj"))
    d = spark.createDataFrame(docs, "doc_id long, text string")
    out = _kn3_scores_from(
        d.select("doc_id", ta.tokens(F.col("text")).alias("tk"))
    ).collect()
    assert all(r["sum_bits"] >= 0 for r in out)
    by_id = {r["doc_id"]: r for r in out}
    gib = by_id[100]["mean_millibits"]
    for i in range(20):
        assert by_id[i]["mean_millibits"] < gib, (i, by_id[i], gib)
    assert not by_id[100]["keep"]


def test_pq_trained_beats_or_matches_fixture_recall(spark, sf_dir):
    """Trained per-subspace codebooks must not lose to the fixture
    codebook on exact-L2 recall@5 (on this fixture they win: 0.400 vs
    0.375), and the trained codewords must actually differ from the
    fixture subvectors (the fit moved the centroids)."""
    import collections

    from flink_1_19_source_spark.operators.similarity import as_double
    from flink_1_19_source_spark.registry import REGISTRY, queries

    queries()
    pq_t = REGISTRY["n3_pq_trained_topk"].fn(spark, sf_dir).collect()
    pq_f = REGISTRY["n3_pq_topk"].fn(spark, sf_dir).collect()

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = e.select(F.col("vec_id").alias("nid"),
                 as_double(F.col("embedding")).alias("ve"))
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), as_double(F.col("embedding")).alias("qe")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qe"), F.col("ve"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda a, x: a + x,
    )
    ex = q.crossJoin(v).select("qid", "nid", d2.alias("d")).collect()
    best = collections.defaultdict(list)
    for r in ex:
        best[r.qid].append((r.d, r.nid))
    exact = {k: {n for _, n in sorted(vv)[:5]} for k, vv in best.items()}

    def recall(rows):
        got = collections.defaultdict(set)
        for r in rows:
            got[r.query_id].add(r.neighbor_id)
        return sum(len(exact[k] & got[k]) for k in exact) / (5 * len(exact))

    r_t, r_f = recall(pq_t), recall(pq_f)
    assert r_t >= r_f, (r_t, r_f)
    assert r_t >= 0.35, r_t
    # non-vacuity: the fit moved the codewords off the fixture rows
    t5 = {(r.query_id, r.neighbor_id, r.rank) for r in pq_t}
    f5 = {(r.query_id, r.neighbor_id, r.rank) for r in pq_f}
    assert t5 != f5


def test_qoi_codec_roundtrips_and_op_coverage():
    """QOI: 50-image fuzz roundtrip across run/gradient/alternating/
    random/mixed families, all five chunk ops fire on the crafted
    fixture, the stream compresses vs raw, and corruption (bad magic,
    truncation, missing end marker) raises cleanly."""
    import random

    import pytest

    from flink_1_19_source_spark.operators.qoi_codec import (
        _encode_ops, decode_qoi, encode_qoi,
    )

    rng = random.Random(7)
    for trial in range(50):
        w, h = rng.randint(1, 40), rng.randint(1, 30)
        mode = trial % 5
        px = []
        for i in range(w * h):
            x, y = i % w, i // w
            if mode == 0:
                px += [10, 20, 30]
            elif mode == 1:
                px += [x % 256, (x + y) % 256, y % 256]
            elif mode == 2:
                px += [200, 0, 0] if i % 2 else [0, 0, 200]
            elif mode == 3:
                px += [rng.randint(0, 255) for _ in range(3)]
            else:
                px += [(x*37) % 256, (i*91) % 256, (y*53) % 256]
        W, H, out = decode_qoi(encode_qoi(px, w, h))
        assert (W, H) == (w, h) and list(out) == px, (trial, w, h)

    w, h = 32, 16
    px = []
    for i in range(w * h):
        x, y = i % w, i // w
        if y < 3:
            px += [10, 20, 30]
        elif y < 6:
            px += [x % 256, x % 256, x % 256]
        elif y < 9:
            g = (9 * (x + (y - 6) * w)) % 256
            px += [(g + 3) % 256, g, (g - 5) % 256]
        elif y < 12:
            px += [200, 0, 0] if x % 2 else [0, 0, 200]
        else:
            px += [(x*97 + y*13) % 256, (x*31) % 256, (y*211 + x*5) % 256]
    chunks, stats = _encode_ops(px, w * h)
    assert all(v > 0 for v in stats.values()), stats
    data = encode_qoi(px, w, h)
    assert len(data) < 3 * w * h  # compresses vs raw
    W, H, out = decode_qoi(data)
    assert list(out) == px

    with pytest.raises(ValueError):
        decode_qoi(b"nope" + data[4:])
    with pytest.raises(ValueError):
        decode_qoi(data[: len(data) // 2])
    with pytest.raises(ValueError):
        decode_qoi(data[:-8] + b"\x00" * 7 + b"\x02")
