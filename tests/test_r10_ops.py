"""Round-10 operator pins: suffix-array substring dedup (N2) and the
distributed dense rank underneath it."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_1_19_source_spark.operators import suffix_array as sa


def test_dense_rank_distributed_matches_window_rank(spark):
    """The range-partition + offset construction must equal the plain
    (single-task) dense_rank for any input, including ties."""
    df = spark.range(2000).select(
        (F.col("id") % 97).alias("a"), (F.col("id") % 13).alias("b")
    )
    got = sa.dense_rank_distributed(df, ["a", "b"], "r")
    ref = df.withColumn(
        "r_ref", F.dense_rank().over(Window.orderBy("a", "b"))
    )
    joined = got.join(ref, ["a", "b"]).filter(
        F.col("r") != F.col("r_ref")
    )
    assert joined.count() == 0
    # dense: ranks form 1..K with no gaps
    ranks = [r["r"] for r in got.select("r").distinct().collect()]
    assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_suffix_array_spans_planted_corpus(spark):
    """Planted duplicates produce exactly the expected maximal spans —
    including a cross-document duplicate, an in-document repeat, and a
    near-boundary window that must NOT merge across documents."""
    dup = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            # doc 0: dup at tokens [2, 10); unique elsewhere
            (0, "u00 u01 " + dup + " u02 u03"),
            # doc 1: same dup at tokens [0, 8)
            (1, dup + " u10 u11 u12"),
            # doc 2: dup twice back-to-back -> one maximal span [1, 17)
            (2, "u20 " + dup + " " + dup + " u21"),
            # doc 3: entirely unique -> no spans
            (3, "v0 v1 v2 v3 v4 v5 v6 v7 v8 v9"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in sa.duplicate_token_spans(docs, "doc_id", "text", 8).collect()
    }
    assert got == {
        (0, 2, 10, 8),
        (1, 0, 8, 8),
        (2, 1, 17, 16),
    }


def test_suffix_array_equals_gram_formulation(spark, sf_dir):
    """Algorithm-independence pin: the prefix-doubling rank path must
    produce the identical covered-position set as a direct L-gram
    build (the theorem the DuckDB oracle rides on), on real data."""
    from flink_1_19_source_spark.tables import load_table

    L = 8
    docs = load_table(spark, sf_dir, "documents")
    spans = sa.duplicate_token_spans(docs, "doc_id", "text", L)

    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.col("text"), r"\s+"), lambda x: x != F.lit("")
        ).alias("tk"),
    ).select("doc_id", F.posexplode("tk").alias("tpos", "token"))
    w = Window.partitionBy("doc_id").orderBy("tpos")
    gram = F.concat_ws(
        "\x01", *[F.lead("token", i).over(w) for i in range(L)]
    )
    full = F.lead("token", L - 1).over(w).isNotNull()
    g = toks.withColumn("gram", gram).withColumn("fl", full)
    dupg = (
        g.filter("fl").groupBy("gram").count()
        .filter(F.col("count") >= 2).select("gram")
    )
    ref_cover = set()
    for r in (
        g.filter("fl").join(dupg, "gram", "left_semi")
        .select("doc_id", "tpos").collect()
    ):
        for t in range(r["tpos"], r["tpos"] + L):
            ref_cover.add((r["doc_id"], t))
    got_cover = set()
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in spans.collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
        for t in range(r["span_start"], r["span_end"]):
            got_cover.add((r["doc_id"], t))
    # identical covered-token sets (interval merging preserves unions)
    assert got_cover == ref_cover
    # and the spans are MAXIMAL: no two spans in a doc touch or overlap
    for doc, iv in by_doc.items():
        iv.sort()
        for (s1, e1), (s2, e2) in zip(iv, iv[1:]):
            assert s2 > e1, (doc, (s1, e1), (s2, e2))


def test_hnsw_recall_pinned_vs_exact(spark, sf_dir):
    """n3_hnsw_topk must reach recall@5 >= 0.8 against the exact cosine
    baseline on the sf fixture — the graph search is approximate by
    design, the floor pins that it actually navigates (a broken graph
    or beam collapses recall toward the entry point's neighborhood)."""
    from flink_1_19_source_spark.operators import graph_ann, similarity
    from flink_1_19_source_spark.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in graph_ann.hnsw_topk(emb, q, k=5).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, q, k=5).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, recall


def test_logistic_train_converges_and_probs_monotone(spark):
    """Hard-sigmoid logistic GD on planted separable data: the trained
    model must classify every row correctly, and the emitted
    probability must be a monotone function of the margin, bounded in
    [0, 1] — the calibration surface the perceptron lacks."""
    from flink_1_19_source_spark.queries.llm_train import (
        _LG_FEATS, _logistic_fit,
    )
    from pyspark.sql import functions as F

    # planted contrast (the r8 perceptron pin's construction): class +1
    # has f_tokens >> f_punct, class -1 the reverse — separable by a
    # signed weight direction, the shape a zero-init margin trainer can
    # actually reach (bias-only separability is out of reach for any
    # no-learning-rate margin method and would pin nothing)
    rows = []
    for i in range(40):
        y = 1 if i % 2 == 0 else -1
        hi, lo = (20 + i % 5, 2 + i % 3)
        f1, f2 = (hi, lo) if y == 1 else (lo, hi)
        rows.append((i, y, f1, f2, 1 + i % 2, 3 + i % 4, f1 + 2 * f2))
    feats = spark.createDataFrame(
        rows, "doc_id long, y int, f_tokens long, f_punct long, "
        "f_digits long, f_upper long, f_chars long",
    )
    w, b = _logistic_fit(feats)
    margin = sum(
        (F.col(f) * F.lit(wi) for f, wi in zip(_LG_FEATS, w)), F.lit(b)
    )
    mm = feats.select("y", margin.cast("long").alias("m"))
    c = int(
        mm.agg(F.greatest(F.max(F.abs(F.col("m"))), F.lit(1)))
        .collect()[0][0]
    )
    out = mm.select(
        "y", "m",
        (
            (F.col("m") + F.lit(c)).cast("double")
            / F.lit(2 * c).cast("double")
        ).alias("p"),
    ).collect()
    # convergence on separable data
    assert all((r["m"] >= 0) == (r["y"] == 1) for r in out)
    # probability well-formed and monotone in margin
    by_m = sorted(out, key=lambda r: r["m"])
    probs = [r["p"] for r in by_m]
    assert all(0.0 <= p <= 1.0 for p in probs)
    assert all(a <= b for a, b in zip(probs, probs[1:]))
    # and it is not the trivial all-0/1 map: the band must be used
    assert any(0.0 < p < 1.0 for p in probs)


def test_flac_encode_write_path_compresses_and_clips():
    """The FLAC ENCODE stage must actually compress (encoded bytes well
    under 16-bit PCM on the ramp class) and the saturating-gain stage
    must actually bind (rail events exist) — otherwise the pipeline's
    compression/limiter claims are vacuous."""
    from flink_1_19_source_spark.operators.flac_codec import (
        decode_flac, encode_flac,
    )

    did = 7  # class 1: clamped ramp
    n = did % 200 + 60
    src = [(did*41 + i*13) % 60001 - 30000 for i in range(n)]
    gained = [s * 3 for s in src]
    assert any(g > 32767 or g < -32768 for g in gained)
    processed = [min(32767, max(-32768, g)) for g in gained]
    blob = encode_flac(processed, sample_rate=8000, block_size=64)
    # multiple frames (block_size 64 < n) and real compression
    assert len(blob) < 2 * n * 0.8, (len(blob), 2 * n)
    rate, ch, rt = decode_flac(blob)
    assert (rate, ch) == (8000, 1) and rt == processed


def test_gif_encode_write_path_compresses_both_interlace_modes():
    """The GIF ENCODE stage must beat raw 8-bit indices on the smooth
    quantized gradient (LZW non-vacuity) and round-trip bit-exactly in
    BOTH interlace modes; quantization must be a real palette cube
    (every emitted channel a multiple of its step)."""
    from flink_1_19_source_spark.operators.gif_codec import (
        decode_gif, encode_gif,
    )

    pal332 = [
        (((k >> 5) & 7) * 32, ((k >> 2) & 7) * 32, (k & 3) * 64)
        for k in range(256)
    ]
    for did in (4, 5):  # one non-interlaced, one interlaced
        w, h = 16 + did % 9, 12 + did % 5
        idx = []
        for i in range(w * h):
            x, y = i % w, i // w
            r = (did*3 + x*5 + y*11) % 256
            g = (did*7 + x*13 + y*3) % 256
            b = (did*11 + x*2 + y*7) % 256
            idx.append(((r >> 5) << 5) | ((g >> 5) << 2) | (b >> 6))
        blob = encode_gif(idx, w, h, pal332, interlace=did % 2 == 1)
        # LZW payload (between the min-code byte and the trailer) beats
        # one raw byte per pixel
        assert len(blob) - (13 + 768 + 10 + 1) < w * h
        ow, oh, rgb = decode_gif(blob)
        assert (ow, oh) == (w, h)
        for i, p in enumerate(idx):
            er, eg, eb = pal332[p]
            assert (rgb[3*i], rgb[3*i+1], rgb[3*i+2]) == (er, eg, eb)
            assert er % 32 == 0 and eg % 32 == 0 and eb % 64 == 0


def test_doremi_weights_exact_apportionment_and_monotone(spark, sf_dir):
    """DoReMi pins: the alpha shares are an exact apportionment of 10^6
    (largest remainder never loses or invents a ppm), the mixture is
    genuinely non-uniform on this corpus (the DRO loop did something),
    and alpha is monotone in the final weight (the apportionment cannot
    invert the DRO ordering by more than the +1 remainder unit)."""
    from flink_1_19_source_spark.queries.llm_doremi import (
        n6_doremi_weights,
    )

    rows = n6_doremi_weights(spark, sf_dir).collect()
    assert sum(r["alpha_ppm"] for r in rows) == 1_000_000
    alphas = sorted(r["alpha_ppm"] for r in rows)
    assert alphas[0] < alphas[-1]  # non-uniform
    by_w = sorted(rows, key=lambda r: (r["w_final"], r["source"]))
    for a, b in zip(by_w, by_w[1:]):
        assert a["alpha_ppm"] <= b["alpha_ppm"] + 1
    # the heaviest-excess domain is never below the uniform share
    top = max(rows, key=lambda r: r["w_final"])
    assert top["alpha_ppm"] >= 1_000_000 // len(rows)


def test_audit_trail_consistent_with_crawl_attrition(spark, sf_dir):
    """The audit's GROUP BY must reproduce the pipeline's own counts:
    kept docs = sum of the schedule's doc population, every dedup loser
    names a kept winner with the same fingerprint disposition, and all
    four dispositions actually occur on the corpus (non-vacuity)."""
    from flink_1_19_source_spark.queries.audit import pipeline_audit_trail

    rows = pipeline_audit_trail(spark, sf_dir).collect()
    disp = {}
    for r in rows:
        disp.setdefault(r["disposition"], []).append(r)
    assert set(disp) >= {"quality_gate", "dedup_loser", "kept"}, set(disp)
    kept_ids = {r["doc_id"] for r in disp["kept"]}
    for r in disp["dedup_loser"]:
        assert r["lost_to"] in kept_ids and r["lost_to"] != r["doc_id"]
    for r in disp["kept"]:
        assert r["lost_to"] == -1 and 1 <= r["repeats"] <= 5
    for name in ("too_short", "quality_gate"):
        for r in disp.get(name, []):
            assert r["repeats"] == 0 and r["lost_to"] == -1


def test_knn_triangles_nonvacuous_and_bounded(spark, sf_dir):
    """The mutual-kNN graph on the fixture must actually contain
    triangles (otherwise the cyclic join is untested), every lcc must
    lie in [0, 1], and triangle counts must respect the degree bound
    T <= d(d-1)/2."""
    from flink_1_19_source_spark.registry import REGISTRY, queries

    queries()
    rows = REGISTRY["x8_knn_triangles"].fn(spark, sf_dir).collect()
    assert sum(r["triangles"] for r in rows) > 0
    for r in rows:
        assert 0.0 <= r["lcc"] <= 1.0, r
        d = r["degree"]
        assert r["triangles"] <= d * (d - 1) // 2, r
        if d < 2:
            assert r["triangles"] == 0 and r["lcc"] == 0.0


def test_layered_topm_equals_per_layer_reference(spark, sf_dir):
    """cross_topm_layered (the one-pass build) must produce, per layer,
    exactly the reference per-layer layer_edges sets — the claim the
    one-shot and streaming HNSW builds rest on."""
    from flink_1_19_source_spark.operators import graph_ann as ga
    from flink_1_19_source_spark.tables import load_table
    from pyspark.sql import functions as F

    nodes = ga.with_levels(
        ga.quantized(
            load_table(spark, sf_dir, "embeddings").filter(
                F.col("vec_id") < 120
            ),
            "vec_id", "embedding",
        )
    ).localCheckpoint(eager=True)
    got_all = ga.cross_topm_layered(nodes, nodes).collect()
    for lv in (2, 1, 0):
        got = {
            (r["src"], r["dst"]) for r in got_all if r["lvl"] == lv
        }
        ref = {
            (r["src"], r["dst"])
            for r in ga.layer_edges(
                nodes.filter(F.col("lvl") >= lv)
            ).collect()
        }
        assert got == ref, (lv, got ^ ref)


def test_exactsubstr_cut_keeps_first_occurrence(spark):
    """Planted corpus: the cut must remove every occurrence EXCEPT the
    globally-first one — doc 0 (canonical) keeps all tokens, later
    copies lose exactly the duplicated block, unique docs untouched."""
    from flink_1_19_source_spark.operators import suffix_array as sa

    dup = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (0, "u00 u01 " + dup + " u02 u03"),     # canonical holder
            (1, dup + " u10 u11 u12"),              # loses 8 tokens
            (2, "u20 " + dup + " " + dup + " u21"),  # loses 16 tokens
            (3, "v0 v1 v2 v3 v4 v5 v6 v7 v8 v9"),   # untouched
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tok"], r["cut_tokens"], r["kept_tokens"],
                      r["n_cut_spans"])
        for r in sa.exactsubstr_cut(docs, "doc_id", "text", 8).collect()
    }
    assert got == {
        0: (12, 0, 12, 0),
        1: (11, 8, 3, 1),
        2: (18, 16, 2, 1),
        3: (10, 0, 10, 0),
    }, got


def test_training_manifest_shards_respect_budget(spark, sf_dir):
    """Manifest pins: every instance of a repeated doc appears exactly
    `repeats` times, each shard's token START offsets stay inside its
    budget window (an instance starts in the shard where its offset
    falls), positions are contiguous from 1, and ordering is
    reproducible (two runs byte-identical)."""
    from flink_1_19_source_spark.queries.manifest import (
        _SHARD_TOKENS, pipeline_training_manifest,
    )

    rows = pipeline_training_manifest(spark, sf_dir).collect()
    assert rows
    by_shard = {}
    for r in rows:
        by_shard.setdefault((r["source"], r["shard_no"]), []).append(r)
    for (src, shard), rs in by_shard.items():
        rs.sort(key=lambda r: r["pos_in_shard"])
        assert [r["pos_in_shard"] for r in rs] == list(
            range(1, len(rs) + 1)
        )
        # start offsets of this shard's instances lie in its window
        # (recompute from the global per-source order)
    per_src = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r)
    import hashlib

    for src, rs in per_src.items():
        rs.sort(key=lambda r: (
            hashlib.md5(
                f"manifest:{r['doc_id']}:{r['rep']}".encode()
            ).hexdigest(),
            r["doc_id"], r["rep"],
        ))
        off = 0
        for r in rs:
            assert r["shard_no"] == off // _SHARD_TOKENS, (src, r)
            off += r["nt"]
    again = pipeline_training_manifest(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_misra_gries_eviction_and_retention_guarantee(spark):
    """The MG path on a planted adversarial corpus (vocab >> k):
    (1) the pure-Python summary actually evicts (bounded memory binds),
    (2) the stored count underestimates by at most n/k,
    (3) the end-to-end two-phase query returns EXACTLY the true heavy
    hitters — including one whose count sits just above the bar —
    while thousands of light items are pruned before the recount."""
    from flink_1_19_source_spark.queries.heavy_hitters import (
        K_HH, heavy_hitters, mg_summary,
    )
    from pyspark.sql import functions as F

    # planted stream: 2000 distinct light items + two heavy ones
    seq = [f"u{i}" for i in range(2000)]
    seq += ["heavy"] * 300 + ["edge"] * 80
    # deterministic interleave so heavy items fight the light flood
    import random

    rnd = random.Random(7)
    rnd.shuffle(seq)
    summ = mg_summary(seq, K_HH)
    assert len(summ) <= K_HH
    n = len(seq)
    # retention: both true hitters (count > n/32 = 74.4) survive
    assert "heavy" in summ and "edge" in summ
    # underestimate bound
    assert summ["heavy"] >= 300 - n // K_HH
    # end-to-end: exact heavy hitters, nothing else — spread over
    # several physical partitions so the r12 map-only candidate pass
    # (one MG summary per scan partition, no shuffle) is exercised with
    # eviction pressure inside every partition
    toks = spark.createDataFrame(
        [(w,) for w in seq], "w string"
    ).repartition(6)
    got = {
        (r["token"], r["cnt"])
        for r in heavy_hitters(toks, spark, K_HH).collect()
    }
    assert got == {("heavy", 300), ("edge", 80)}, got
    # the incremental feed matches the one-shot summary on a split
    # stream (the shape the per-partition batch iterator sees)
    from flink_1_19_source_spark.queries.heavy_hitters import mg_feed

    inc: dict[str, int] = {}
    for piece in (seq[:700], seq[700:1500], seq[1500:]):
        mg_feed(inc, piece, K_HH)
    assert inc == summ
