"""Property tests for the approximate (non-oracle-able) LLM-pipeline ops:
recall of LSH paths against their exact counterparts, and invariants of
signature/fingerprint operators."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_1_19_source_spark.operators import dedup, multimodal, similarity
from flink_1_19_source_spark.tables import load_table


def test_minhash_recall_vs_exact_jaccard(spark, sf_dir):
    """Every exact-Jaccard pair ≥ 0.5 must appear among LSH candidates
    (with 32 hashes / 8 bands, the 4-row band match probability at
    J=0.5 is 1-(1-0.5^4)^8 ≈ 0.41 per band set... so require ≥ 0.8 recall
    on the high-sim (≥0.7) pairs where hit probability ≈ 0.99)."""
    d = load_table(spark, sf_dir, "documents")
    exact = dedup.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.7)
    lsh = dedup.minhash_lsh_pairs(d, "doc_id", "text", n=3, num_hashes=32, bands=8)
    exact_pairs = {(r.id_a, r.id_b) for r in exact.collect()}
    lsh_pairs = {(r.id_a, r.id_b) for r in lsh.collect()}
    if exact_pairs:
        recall = len(exact_pairs & lsh_pairs) / len(exact_pairs)
        assert recall >= 0.8, f"minhash-LSH recall {recall} on {len(exact_pairs)} pairs"


def test_minhash_identical_docs_full_signature_match(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20)
    dup = d.select(F.col("doc_id") + 100000, F.col("text")).toDF("doc_id", "text")
    both = d.select("doc_id", "text").union(dup)
    sigs = {r.id: tuple(r.signature) for r in dedup.minhash_signatures(
        both, "doc_id", "text").collect()}
    for r in d.select("doc_id").collect():
        assert sigs[r.doc_id] == sigs[r.doc_id + 100000]


def test_simhash_identical_docs_equal_fingerprint(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20)
    dup = d.select(F.col("doc_id") + 100000, F.col("text")).toDF("doc_id", "text")
    both = d.select("doc_id", "text").union(dup)
    fps = {r.id: r.simhash for r in dedup.simhash(both, "doc_id", "text").collect()}
    for r in d.select("doc_id").collect():
        assert fps[r.doc_id] == fps[r.doc_id + 100000]


def test_lsh_band_bucket_cap_bounds_adversarial_skew(spark, sf_dir):
    """Adversarial skew: N near-identical boilerplate docs share every
    band, so the uncapped self-join generates ~N²/2 candidate pairs. With
    band_bucket_cap the candidate count must stay bounded by
    buckets × cap² while a standard corpus is unaffected."""
    n_dup = 60
    rows = [(i, "the same boilerplate sentence repeated across the corpus "
                f"with tiny suffix {i % 3}") for i in range(n_dup)]
    skewed = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.minhash_lsh_pairs(
        skewed, "doc_id", "text", n=3, num_hashes=32, bands=8
    ).count()
    capped = dedup.minhash_lsh_pairs(
        skewed, "doc_id", "text", n=3, num_hashes=32, bands=8,
        band_bucket_cap=10,
    ).count()
    # 3 variants × 20 copies each: uncapped pairs ≥ 3 × C(20,2) = 570;
    # capped: every bucket ≤ 10 members → ≤ 8 bands × 3 keys × C(10,2)
    assert uncapped >= 3 * (20 * 19) // 2, uncapped
    assert capped <= 8 * 3 * (10 * 9) // 2, capped

    # cap does not change results when no bucket exceeds it
    d = load_table(spark, sf_dir, "documents").limit(120)
    base = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(
        d, "doc_id", "text", n=3, num_hashes=32, bands=8).collect()}
    with_cap = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(
        d, "doc_id", "text", n=3, num_hashes=32, bands=8,
        band_bucket_cap=10_000).collect()}
    assert base == with_cap


def test_lsh_topk_band_bucket_cap_bounds_candidates(spark, sf_dir):
    """Same skew guard on the ANN path: a corpus-side bucket over the cap
    is dropped, bounding per-query candidates at bands × cap, while a
    generous cap leaves results identical."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    base = {(r.query_id, r.neighbor_id, r.rank) for r in similarity.lsh_topk(
        e, q, dim=64, k=5, num_planes=16, bands=4).collect()}
    generous = {(r.query_id, r.neighbor_id, r.rank) for r in similarity.lsh_topk(
        e, q, dim=64, k=5, num_planes=16, bands=4,
        band_bucket_cap=1_000_000).collect()}
    assert base == generous
    # cap=1 drops every shared bucket (any bucket with a query match has
    # ≥1 corpus member; duplicated corpus rows make them >1) — with a
    # degenerate corpus of N copies of one vector, results must be empty
    one = e.filter(F.col("vec_id") == 0).select("vec_id", "embedding")
    copies = one.crossJoin(spark.range(50).select(F.col("id").alias("cid"))) \
        .select((F.col("vec_id") + F.col("cid")).alias("vec_id"), "embedding")
    qq = copies.filter(F.col("vec_id") == 0)
    capped = similarity.lsh_topk(
        copies, qq, dim=64, k=5, num_planes=16, bands=4, band_bucket_cap=10
    ).count()
    assert capped == 0, capped


def test_lsh_topk_recall_vs_exact(spark, sf_dir):
    """ANN top-5 must recover a reasonable fraction of the exact top-5.
    Random 64-d embeddings are a worst case for LSH (no cluster structure);
    recall ≥ 0.3 guards the plumbing, exactness is n3_cosine_topk's job."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    exact = similarity.cosine_topk(e, q, k=5)
    approx = similarity.lsh_topk(e, q, dim=64, k=5, num_planes=16, bands=4)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3, f"LSH ANN recall {recall}"


def test_ivf_topk_recall_vs_exact(spark, sf_dir):
    """IVF with nprobe=3 of 16 lists must recover a solid fraction of the
    exact top-5 (random embeddings are the worst case for any ANN)."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    cent = np.array(
        [r.embedding for r in e.filter(F.col("vec_id") < 16).orderBy("vec_id")
         .select("embedding").collect()],
        dtype=float,
    )
    exact = similarity.cosine_topk(e, q, k=5)
    approx = similarity.ivf_topk(e, q, cent, k=5, nprobe=3)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.2, f"IVF ANN recall {recall}"
    # scores on shared pairs must be exact (IVF only prunes)
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine_sim for r in exact.collect()}
    for r in approx.collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact_scores:
            assert abs(exact_scores[key] - r.cosine_sim) < 1e-12


def test_lsh_candidates_are_exactly_scored(spark, sf_dir):
    """Approximate path must agree with the exact path on any pair both
    return (LSH only prunes candidates; it never changes the score)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    exact = {(r.query_id, r.neighbor_id): r.cosine_sim
             for r in similarity.cosine_topk(e, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id): r.cosine_sim
              for r in similarity.lsh_topk(e, q, dim=64, k=5).collect()}
    for pair in exact.keys() & approx.keys():
        assert abs(exact[pair] - approx[pair]) < 1e-12


def test_multimodal_decode_dispatch_and_remaining_env_gaps(spark):
    """jpeg/webp now dispatch to real decoders — truncated or
    out-of-subset input fails with a clear parse error, not
    NotImplementedError; the genuinely library-bound formats still
    declare the env gap."""
    import pytest

    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff", "jpeg")
    with pytest.raises(ValueError):  # real VP8L parser: no VP8L chunk
        multimodal.decode_image(b"RIFF\x04\x00\x00\x00WEBP", "webp")
    with pytest.raises(ValueError, match="out of subset"):  # lossy half
        multimodal.decode_image(
            b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00....", "webp"
        )
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"....", "avif")


def test_png_roundtrip_every_filter_type():
    """Each of the five PNG scanline filters must encode/decode losslessly.
    The encoder cycles row % 5, so a >=5-row image exercises all of them;
    additionally force single-filter images by height-1 slices."""
    from flink_1_19_source_spark.operators import png_codec as pc

    w, h = 9, 7
    pixels = bytes(
        ((x * 7 + y * 17 + c * 5) % 256)
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    png = pc.encode_png(pixels, w, h)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    rw, rh, rpix = pc.decode_png(png)
    assert (rw, rh) == (w, h)
    assert rpix == pixels
    # the filtered stream must actually contain all 5 filter types
    import struct
    import zlib

    pos, idat = 8, b""
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos : pos + 4])
        if png[pos + 4 : pos + 8] == b"IDAT":
            idat += png[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = 1 + w * 3
    assert {raw[y * stride] for y in range(h)} == {0, 1, 2, 3, 4}


def test_png_paeth_predictor_spec_vectors():
    """Pin the Paeth predictor to the spec's tie-breaking rules (left,
    then above, then upper-left) so a mirror-image encode/decode bug
    can't hide behind a self-consistent round-trip."""
    from flink_1_19_source_spark.operators.png_codec import _paeth

    assert _paeth(0, 0, 0) == 0
    assert _paeth(10, 20, 30) == 10   # p=0: pa=10,pb=20,pc=30 -> left
    assert _paeth(100, 50, 100) == 50  # p=50: pb=0 smallest -> above
    assert _paeth(50, 100, 100) == 50  # p=50: pa=0 smallest -> left
    assert _paeth(30, 40, 10) == 40    # p=60: pa=30,pb=20,pc=50 -> above
    assert _paeth(5, 5, 5) == 5        # full tie -> left
    assert _paeth(255, 0, 255) == 0    # p=0: pa=255,pb=0 -> above


def test_png_decode_rejects_corruption():
    import struct

    import pytest

    from flink_1_19_source_spark.operators import png_codec as pc

    png = bytearray(pc.encode_png(bytes(27), 3, 3))
    # flip one byte inside the IDAT body -> CRC must catch it
    (ihdr_len,) = struct.unpack(">I", png[8:12])
    idat_body = 8 + 12 + ihdr_len + 8  # sig + IHDR chunk + IDAT header
    png[idat_body] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        pc.decode_png(bytes(png))
    with pytest.raises(ValueError, match="signature"):
        pc.decode_png(b"not a png at all")


def test_decode_image_png_is_real():
    """multimodal.decode_image must route PNG to the real codec."""
    from flink_1_19_source_spark.operators.png_codec import encode_png

    pixels = bytes(range(0, 48))  # 4x4 RGB
    w, h, out = multimodal.decode_image(encode_png(pixels, 4, 4), "PNG")
    assert (w, h) == (4, 4) and out == pixels


def test_multimodal_payload_roundtrip(spark, sf_dir):
    """The opaque binary payload must survive the Arrow round-trip intact:
    n_bytes equals the utf-8 length of the source text."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    media = multimodal.attach_media(d, "doc_id", "text")
    feats = {r.doc_id: r.n_bytes for r in multimodal.extract_features(media).collect()}
    for r in d.select("doc_id", "text").collect():
        assert feats[r.doc_id] == len(r.text.encode("utf-8"))


def _true_jaccard(ta: str, tb: str, n: int = 3) -> float:
    """Driver-side exact word-n-gram Jaccard, mirroring word_shingles."""
    def sh(t):
        toks = t.lower().split()
        if len(toks) >= n:
            return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
        return {" ".join(toks)}

    a, b = sh(ta), sh(tb)
    return len(a & b) / len(a | b) if a | b else 0.0


def test_minhash_precision_vs_true_jaccard(spark, sf_dir):
    """Precision side of LSH (recall is tested above): pairs REPORTED at
    est_jaccard ≥ 0.5 must be genuinely similar. est_jaccard of a pair
    with true Jaccard s is Binomial(32, s)/32, so
    P(est ≥ 0.5 | s ≤ 0.2) ≤ 3e-6 per pair — at corpus scale the
    expected count of such false positives is << 1; allow at most 1."""
    d = load_table(spark, sf_dir, "documents")
    texts = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}
    lsh = dedup.minhash_lsh_pairs(d, "doc_id", "text", n=3, num_hashes=32, bands=8)
    reported = [(r.id_a, r.id_b) for r in lsh.filter(F.col("est_jaccard") >= 0.5).collect()]
    badly_wrong = [
        (a, b)
        for a, b in reported
        if _true_jaccard(texts[a], texts[b]) <= 0.2
    ]
    assert len(badly_wrong) <= 1, f"false positives at est>=0.5: {badly_wrong[:5]}"


def test_minhash_fp_rate_on_dissimilar_corpus(spark):
    """Banding-theory FP bound on a synthetic all-dissimilar corpus: 80
    docs of disjoint-ish random vocab (true pairwise Jaccard ≈ 0). Band
    match probability at s≈0.05 is 1-(1-s^4)^8 ≈ 5e-5, so among 3160
    pairs the expected candidate count is ≈ 0.16 — and a candidate must
    further show est ≥ 0.5 (probability ~1e-9). Allow ≤ 1 candidate,
    0 reported pairs."""
    import random

    rng = random.Random(7)
    docs = [
        (i, " ".join(f"w{rng.randrange(10**9)}" for _ in range(30)))
        for i in range(80)
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    lsh = dedup.minhash_lsh_pairs(d, "doc_id", "text", n=3, num_hashes=32, bands=8)
    cands = lsh.collect()
    assert len(cands) <= 1, f"candidate FP rate too high: {len(cands)}/3160"
    assert not [r for r in cands if r.est_jaccard >= 0.5]


def test_kmeans_blas_assignment_agrees_with_exact(spark, sf_dir):
    """The production BLAS assignment (mapInPandas, no explode) must
    reproduce the oracled long-form assignment on the same centroids —
    the exact/approximate pairing that certifies the 100 TB path."""
    from pyspark.sql import functions as F

    from flink_1_19_source_spark.operators import kmeans as km
    from flink_1_19_source_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("xf").cast("double"), 6).alias("x"),
    )
    k = 4
    cent = (
        corpus.filter(F.col("vec_id") < k)
        .select(F.col("vec_id").alias("cluster"), "dim", F.col("x").alias("c"))
    )
    exact = {
        r.vec_id: r.cluster for r in km._assign(corpus, cent).collect()
    }
    by_cluster: dict[int, dict[int, float]] = {}
    for r in cent.collect():
        by_cluster.setdefault(r.cluster, {})[r.dim] = r.c
    cmat = [
        [dims[d] for d in sorted(dims)]
        for _, dims in sorted(by_cluster.items())
    ]
    ev = e.select(
        "vec_id",
        F.transform(F.col("embedding"),
                    lambda v: F.round(v.cast("double"), 6)).alias("embedding"),
    )
    blas = {r.vec_id: r.cluster for r in km.assign_blas(ev, cmat).collect()}
    assert set(blas) == set(exact)
    diffs = {v for v in exact if exact[v] != blas[v]}
    # quantized-exact vs float64-BLAS may differ only on near-ties
    assert len(diffs) <= max(2, len(exact) // 200), sorted(diffs)[:5]


def test_semantic_dedup_invariants(spark, sf_dir):
    """The greedy keep-lowest-id rule's invariants: (1) every dropped
    vector has SOME lower-id cluster-mate >= threshold (that is the only
    way to be dropped); (2) an unreachable threshold drops nothing; (3)
    the lowest id of every cluster always survives."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    cents = np.array(
        [r.embedding for r in e.filter(F.col("vec_id") < 8)
         .orderBy("vec_id").select("embedding").collect()], dtype=float)
    kept = similarity.semantic_dedup(e, cents, threshold=0.3)
    kept_rows = kept.collect()
    kept_ids = {r.vec_id for r in kept_rows}
    all_ids = {r.vec_id for r in e.select("vec_id").collect()}
    assert 0 < len(kept_ids) < len(all_ids)  # threshold 0.3 does drop some

    # (2) cosine can never reach 2.0 → nothing drops, every vector kept
    none_dropped = similarity.semantic_dedup(e, cents, threshold=2.0)
    assert {r.vec_id for r in none_dropped.collect()} == all_ids

    # (3) per-cluster minimum id has no lower-id mate → must survive
    cluster_min = {}
    for r in none_dropped.collect():
        cluster_min[r.cluster] = min(cluster_min.get(r.cluster, 1 << 60), r.vec_id)
    assert set(cluster_min.values()) <= kept_ids

    # (1) dropped ⇒ covered by a lower-id cluster-mate at >= threshold
    import numpy.linalg as la

    vecs = {r.vec_id: np.array(r.embedding, dtype=float)
            for r in e.select("vec_id", "embedding").collect()}
    cluster_of = {r.vec_id: r.cluster for r in none_dropped.collect()}
    for d in sorted(all_ids - kept_ids)[:50]:
        mates = [i for i in all_ids
                 if i < d and cluster_of[i] == cluster_of[d]]
        covered = any(
            round(float(vecs[i] @ vecs[d] / (la.norm(vecs[i]) * la.norm(vecs[d]))), 9) >= 0.3
            for i in mates
        )
        assert covered, f"vec {d} dropped without a covering mate"


def test_int8_topk_recall_vs_fp32(spark, sf_dir):
    """Int8 symmetric quantization keeps near-exact neighbor ranking:
    measured recall@5 is 0.975 on the fixture embeddings; 0.9 guards
    against a quantizer regression without flaking on ties."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    exact = similarity.cosine_topk(e, q, k=5)
    q8e = e.select("vec_id", similarity.quantize_int8(F.col("embedding")).alias("qe"))
    q8 = similarity.cosine_topk(q8e, q8e.filter(F.col("vec_id") < 8), vec_col="qe", k=5)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    got_set = {(r.query_id, r.neighbor_id) for r in q8.collect()}
    recall = len(exact_set & got_set) / len(exact_set)
    assert recall >= 0.9, f"int8 recall {recall}"


def test_quantize_int8_components_are_integers_in_range(spark, sf_dir):
    """Every quantized component is an integer in [-127, 127] and the
    max-|x| component maps to ±127 exactly."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", similarity.quantize_int8(F.col("embedding")).alias("qe")
    )
    bad = e.select(
        F.size(
            F.filter(
                F.col("qe"),
                lambda x: (F.abs(x) > 127) | (x != F.floor(x)),
            )
        ).alias("n_bad"),
        F.array_max(F.transform(F.col("qe"), lambda x: F.abs(x))).alias("m"),
    ).collect()
    assert all(r.n_bad == 0 for r in bad)
    assert all(r.m == 127.0 for r in bad)


def test_lookup_cache_no_refetch_on_repeat(spark, sf_dir):
    """J7 partial cache: a second pass over the SAME keys inside one
    task must not fetch again — the fetched-keys accumulator counts
    distinct keys once, probed counts every row."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    from flink_1_19_source_spark.sources.lookup_cache import (
        lookup_join_partial_cache,
    )
    from flink_1_19_source_spark.tables import load_table, table_path

    # collect the 200 keys ONCE — LIMIT without ORDER BY is not stable
    # across actions, so both frames (and the distinct count below) must
    # be built from the same materialized key list
    keys = [
        r[0]
        for r in load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .orderBy("o_custkey")
        .limit(200)
        .collect()
    ]
    probe = spark.createDataFrame(
        [(k,) for k in keys], "o_custkey bigint"
    ).coalesce(1)  # one task → one shared cache
    doubled = probe.unionByName(probe).coalesce(1)
    sc = spark.sparkContext
    fetched, probed = sc.accumulator(0), sc.accumulator(0)
    out_schema = StructType(
        list(doubled.schema.fields) + [StructField("c_name", StringType())]
    )
    res = lookup_join_partial_cache(
        doubled,
        "o_custkey",
        table_path(sf_dir, "customer"),
        "c_custkey",
        ["c_name"],
        out_schema,
        fetched,
        probed,
    )
    n = res.count()
    assert n == 400
    assert probed.value == 400
    distinct_keys = probe.distinct().count()
    assert fetched.value == distinct_keys, (fetched.value, distinct_keys)


def test_wav_roundtrip_mono_and_stereo():
    from flink_1_19_source_spark.operators import wav_codec as wc

    mono = [0, 1, -1, 32767, -32768, 100, -200]
    data = wc.encode_wav(mono, sample_rate=8000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    rate, ch, out = wc.decode_wav(data)
    assert (rate, ch, out) == (8000, 1, mono)
    stereo = [10, -10, 20, -20, 30, -30]  # 3 frames, 2 channels
    rate, ch, out = wc.decode_wav(wc.encode_wav(stereo, 44100, channels=2))
    assert (rate, ch, out) == (44100, 2, stereo)


def test_wav_decode_rejects_corruption():
    import pytest

    from flink_1_19_source_spark.operators import wav_codec as wc

    good = bytearray(wc.encode_wav([1, 2, 3], 8000))
    with pytest.raises(ValueError, match="RIFF"):
        wc.decode_wav(b"nope" + bytes(good[4:]))
    bad_len = bytearray(good)
    bad_len[4] ^= 0xFF  # corrupt declared RIFF length
    with pytest.raises(ValueError, match="length"):
        wc.decode_wav(bytes(bad_len))
    with pytest.raises(ValueError, match="int16"):
        wc.encode_wav([99999], 8000)
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"\xffISM", "mp3")


def test_decode_audio_wav_is_real():
    from flink_1_19_source_spark.operators.wav_codec import encode_wav

    rate, ch, out = multimodal.decode_audio(encode_wav([5, -5], 16000), "WAV")
    assert (rate, ch, out) == (16000, 1, [5, -5])


def test_pq_topk_structure_and_recall(spark, sf_dir):
    """N3 PQ/ADC: each query gets exactly k ranked neighbors with
    non-negative approx distances, and PQ recall against the exact
    EUCLIDEAN top-k clears a plumbing floor (random vectors are ANN's
    worst case; exactness is the oracle's job)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    pq = similarity.pq_topk(e, q, dim=64, n_subspaces=4, codebook_ids=8, k=5)
    rows = pq.collect()
    per_q = {}
    for r in rows:
        assert r.approx_dist >= 0
        per_q.setdefault(r.query_id, set()).add(r.rank)
    assert all(v == {1, 2, 3, 4, 5} for v in per_q.values())

    ev = e.select("vec_id", similarity.as_double(F.col("embedding")).alias("v"))
    qv = ev.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = Window.partitionBy("query_id").orderBy("d", "neighbor_id")
    exact = (
        ev.crossJoin(qv)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), d2.alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    pq_set = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(exact_set & pq_set) / len(exact_set)
    assert recall >= 0.2, f"PQ recall {recall}"


def test_avi_roundtrip_and_dib_conventions():
    """AVI codec: round-trip recovers top-down RGB frames exactly, and
    the stored DIB bytes really are bottom-up + BGR + padded (checked on
    a frame whose stride is not a multiple of 4)."""
    import struct

    from flink_1_19_source_spark.operators import avi_codec as ac

    w, h = 3, 2  # stride 9 -> 3 pad bytes per row
    f0 = bytes(range(0, 18))            # distinct values everywhere
    f1 = bytes((255 - v) for v in range(18))
    avi = ac.encode_avi([f0, f1], w, h)
    rw, rh, fps, frames = ac.decode_avi(avi)
    assert (rw, rh, fps) == (w, h, 25)
    assert frames == [f0, f1]
    # the raw 00db payload must start with the LAST row, blue-first:
    # bottom row starts at y=1 -> RGB (9,10,11) -> stored B,G,R = 11,10,9
    pos = avi.find(b"00db")
    (ln,) = struct.unpack("<I", avi[pos + 4 : pos + 8])
    dib = avi[pos + 8 : pos + 8 + ln]
    assert ln == (9 + 3) * 2
    assert dib[0:3] == bytes((11, 10, 9))


def test_avi_decode_rejects_corruption():
    import pytest

    from flink_1_19_source_spark.operators import avi_codec as ac

    good = bytearray(ac.encode_avi([bytes(12)], 2, 2))
    with pytest.raises(ValueError, match="RIFF"):
        ac.decode_avi(b"nope" + bytes(good[4:]))
    bad = bytearray(good)
    bad[4] ^= 0xFF
    with pytest.raises(ValueError, match="length"):
        ac.decode_avi(bytes(bad))
    with pytest.raises(NotImplementedError):
        multimodal.decode_video(b"\x00\x00\x00\x18ftyp", "mp4")


def test_decode_video_avi_is_real():
    from flink_1_19_source_spark.operators.avi_codec import encode_avi

    frame = bytes(range(24))  # 2x4 RGB
    w, h, fps, frames = multimodal.decode_video(
        encode_avi([frame], 2, 4), "AVI"
    )
    assert (w, h, fps, frames) == (2, 4, 25, [frame])
