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
    from flink_1_19_source_spark.queries.streaming_retract2 import _topn_retract_run

    from .oracle import canon_rows

    clean = canon_rows(_topn_retract_run(spark, sf_dir).toPandas())
    crashed = canon_rows(
        _topn_retract_run(spark, sf_dir, crash_once_at=1).toPandas()
    )
    assert clean == crashed


def test_jpeg_codec_ac_path_matches_numpy_idct_reference():
    """The oracle only reaches the DC-exact path (constant blocks); the
    AC run/size + ZRL + EXTEND path is pinned here against a straight
    numpy IDCT of the same coefficients — 50 random sparse spectra plus
    the long-zero-run shape that forces two ZRL codes."""
    import numpy as np

    from flink_1_19_source_spark.operators import jpeg_codec as jc
    from flink_1_19_source_spark.operators import jpeg_encode as je

    def ref(zz):
        S = np.zeros(64)
        S[jc.ZIGZAG] = np.asarray(zz, dtype=float)
        out = jc._M.T @ S.reshape(8, 8) @ jc._M + 128.0
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    rng = np.random.default_rng(42)
    for _ in range(50):
        zz = [0] * 64
        zz[0] = int(rng.integers(-1000, 1000))
        for _ in range(int(rng.integers(0, 10))):
            zz[int(rng.integers(1, 64))] = int(rng.integers(-200, 200))
        w, h, px = jc.decode_jpeg_gray(je.encode_jpeg_gray([zz], 1, 1))
        got = np.frombuffer(px, dtype=np.uint8).reshape(8, 8)
        assert (got == ref(zz)).all()

    zz = [0] * 64
    zz[0], zz[40] = 8 * (200 - 128), 7  # two ZRLs before the AC code
    w, h, px = jc.decode_jpeg_gray(je.encode_jpeg_gray([zz], 1, 1))
    assert (np.frombuffer(px, dtype=np.uint8).reshape(8, 8) == ref(zz)).all()


def test_jpeg_decoder_rejects_unsupported_shapes():
    """Declared scope is enforced, not silently mis-decoded."""
    import pytest

    from flink_1_19_source_spark.operators import jpeg_codec as jc
    from flink_1_19_source_spark.operators import jpeg_encode as je

    with pytest.raises(ValueError, match="SOI"):
        jc.decode_jpeg_gray(b"\x89PNG")
    data = bytearray(je.encode_jpeg_gray([je.constant_block_coeffs(9)], 1, 1))
    i = bytes(data).find(b"\xff\xc0")
    # SOF2 (progressive) gained a real path in r8, so the unsupported
    # frame check uses SOF3 (lossless) instead
    data[i + 1] = 0xC3
    with pytest.raises(ValueError, match="non-baseline"):
        jc.decode_jpeg_gray(bytes(data))
    # a baseline-structured file mutated to SOF2 enters the progressive
    # path and must still fail loudly (its scan header is sequential)
    data[i + 1] = 0xC2
    with pytest.raises(ValueError):
        jc.decode_jpeg_gray(bytes(data))


def test_jpeg_decoder_honors_sof0_quant_table_selector():
    """A conforming baseline JPEG may store its quant table under id 1
    (SOF0 Tq selector); the decoder must index qtables by Tq rather
    than assuming id 0, and fail cleanly when Tq references a missing
    table."""
    import numpy as np
    import pytest

    from flink_1_19_source_spark.operators import jpeg_codec as jc
    from flink_1_19_source_spark.operators import jpeg_encode as je

    zz = je.constant_block_coeffs(77)
    data = bytearray(je.encode_jpeg_gray([zz], 1, 1))
    # retag the (sole) quant table as id 1 and point SOF0's Tq at it
    dqt = bytes(data).find(b"\xff\xdb")
    assert data[dqt + 4] == 0x00  # Pq=0/Tq=0 byte
    data[dqt + 4] = 0x01
    sof = bytes(data).find(b"\xff\xc0")
    assert data[sof + 12] == 0x00  # component Tq byte (C, HV, Tq)
    data[sof + 12] = 0x01
    w, h, px = jc.decode_jpeg_gray(bytes(data))
    assert (np.frombuffer(px, dtype=np.uint8) == 77).all()

    # Tq referencing an absent table is an error, not qtables[0]
    data[sof + 12] = 0x02
    with pytest.raises(ValueError, match="quant table"):
        jc.decode_jpeg_gray(bytes(data))


def test_binary_hamming_recall_vs_exact(spark, sf_dir):
    """1-bit quantization loses information by design; the gate is
    recall@5 against the exact fp32 path — the rerank stage must
    recover most of it (>= 0.6 at test SFs; int8's pin is 0.9)."""
    from flink_1_19_source_spark.operators import similarity

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(e, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.binary_hamming_topk(e, q, dim=64, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall


def test_bm25_joins_are_broadcast_only(spark, sf_dir):
    """tf must stay partitioned by document; query terms, document
    frequencies, lengths and corpus stats all broadcast — a sort-merge
    join anywhere would reshuffle the corpus-sized tf table."""
    from flink_1_19_source_spark.plans import audit

    df = REGISTRY["n4_bm25_topk"].fn(spark, sf_dir)
    txt = audit.plan_text(df, "simple")
    assert "BroadcastHashJoin" in txt, txt
    assert "SortMergeJoin" not in txt, txt


def test_binary_hamming_coarse_pass_is_codegen_integer_ops(spark, sf_dir):
    """The Hamming prefilter must stay inside whole-stage codegen (XOR +
    POPCOUNT expressions) with the query words broadcast — no Python
    boundary anywhere in the coarse pass."""
    from flink_1_19_source_spark.plans import audit

    df = REGISTRY["n3_binary_hamming_topk"].fn(spark, sf_dir)
    txt = audit.plan_text(df, "simple")
    assert "BroadcastHashJoin" in txt, txt
    assert audit.has_whole_stage_codegen(df)
    assert "ArrowEvalPython" not in txt and "BatchEvalPython" not in txt, txt


def test_bpe_merge_fold_equals_reference_on_adversarial_words():
    """The REPLACE-as-fold trick: pipe-wrapped replace must equal the
    sequential greedy BPE fold, including overlap chains (aaaa) and
    symbols that are prefixes/suffixes of each other (ba + b)."""

    def fold(syms, a, b):
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        return out

    def via_replace(syms, a, b):
        s = "".join(f"|{x}|" for x in syms)
        s = s.replace(f"|{a}||{b}|", f"|{a}{b}|")
        return s.strip("|").split("||")

    cases = [
        (["a", "a", "a", "a"], "a", "a"),
        (["a", "b", "a", "b"], "a", "b"),
        (["ba", "b"], "a", "b"),        # must NOT match inside 'ba'
        (["a", "ab", "b"], "a", "b"),   # 'ab' symbol must not split
        (["x", "a", "b", "a", "b", "y"], "a", "b"),
        (["aa", "a", "a"], "a", "a"),
    ]
    for syms, a, b in cases:
        assert via_replace(syms, a, b) == fold(syms, a, b), (syms, a, b)


def test_expire_snapshots_blocks_expired_reads_and_gcs_versions(spark, tmp_path):
    """After expiry: reading an expired commit raises, surviving
    snapshots and the current table still read, and version dirs only
    the expired snapshot referenced are gone from disk."""
    import os

    import pytest

    from flink_1_19_source_spark.streaming import sinks as sk

    state = os.path.join(str(tmp_path), "expire")
    sink = sk.ParquetMergeSink(
        spark, state, pk_cols=["k"], retain_history=True, num_buckets=4
    )
    mk = lambda rows: spark.createDataFrame(rows, "k long, v string")
    sink(mk([(1, "a"), (2, "b"), (3, "c"), (4, "d")]), 0)
    # batches 1-2 rewrite EVERY bucket so v0 becomes unreferenced once
    # snapshot 0 expires
    sink(mk([(1, "a2"), (2, "b2"), (3, "c2"), (4, "d2")]), 1)
    sink(mk([(1, "a3"), (2, "b3"), (3, "c3"), (4, "d3")]), 2)
    assert sink.snapshot_df(as_of_batch=0).count() == 4

    n_exp, n_gc = sk.expire_snapshots(sink, older_than_batch=1)
    assert n_exp == 1
    assert n_gc >= 1 and not os.path.isdir(os.path.join(state, "v0"))
    with pytest.raises(ValueError, match="no snapshot"):
        sink.snapshot_df(as_of_batch=0)
    assert {(r.k, r.v) for r in sink.snapshot_df(as_of_batch=1).collect()} == {
        (1, "a2"), (2, "b2"), (3, "c2"), (4, "d2")
    }
    assert {(r.k, r.v) for r in sink.snapshot_df().collect()} == {
        (1, "a3"), (2, "b3"), (3, "c3"), (4, "d3")
    }


def test_chunk_manifest_is_map_only(spark, sf_dir):
    """The chunking claim: a projection of the corpus scan — zero
    shuffles anywhere in the plan (the explode is within-partition)."""
    from flink_1_19_source_spark.plans import audit

    df = REGISTRY["n4_chunk_manifest"].fn(spark, sf_dir)
    assert audit.shuffle_count(df) == 0, audit.plan_text(df, "simple")


def test_bpe_encode_vocabulary_broadcasts(spark, sf_dir):
    """The encode join must broadcast the vocabulary — a shuffle there
    would move the whole tokenized corpus for a vocab-sized table."""
    from flink_1_19_source_spark.plans import audit

    df = REGISTRY["n4_bpe_encode"].fn(spark, sf_dir)
    txt = audit.plan_text(df, "simple")
    assert "BroadcastHashJoin" in txt, txt
    assert "SortMergeJoin" not in txt, txt


def test_hybrid_rrf_fusion_join_stays_small(spark, sf_dir):
    """RRF fuses two top-20 lists: the fusion join must not reshuffle
    either corpus — only broadcast joins below the final window."""
    from flink_1_19_source_spark.plans import audit

    df = REGISTRY["n3_hybrid_rrf_topk"].fn(spark, sf_dir)
    txt = audit.plan_text(df, "simple")
    assert "BroadcastHashJoin" in txt, txt
