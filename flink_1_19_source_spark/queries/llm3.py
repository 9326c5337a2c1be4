"""Round-6 LLM-pipeline continuations (SURVEY §2.11 N2/N3/N6/N7, X2/X4).

The ingest-time maintenance tier: streaming incremental MinHash-LSH
dedup and streaming IVF index ingest (each hash-matching its one-shot
batch twin), DSIR-style hashed-n-gram importance resampling, winnowing
fingerprint-overlap pairs (the MOSS measure), and the pipeline composite
chaining them.  Same oracle discipline as queries/llm.py: seeded
constants are embedded as SQL literals so DuckDB replays the exact
hashes and the driver value-hash-checks everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup
from ..registry import register
from ..tables import load_table

from .llm import _IVF_ORACLE, _SHINGLE_HASH_CTES


# --------------------------------------------------------------------------
# N2-S — streaming incremental MinHash-LSH dedup
# --------------------------------------------------------------------------
def _s_minhash_oracle(num_hashes: int = 32, bands: int = 8, seed: int = 42) -> str:
    """Whole-stream replay of the online dedup: a doc's dup_of is the
    smallest earlier doc_id sharing ANY band bucket (arrival order ==
    doc_id order in the replay), n_dup_bands counts the bands that hit."""
    pa, pb = dedup.minhash_perms(num_hashes, seed)
    rpb = num_hashes // bands
    perms = ", ".join(f"({k}, {a}, {b})" for k, (a, b) in enumerate(zip(pa, pb)))
    return f"""
    WITH {_SHINGLE_HASH_CTES},
    perms(k, a, b) AS (VALUES {perms}),
    sig AS (
      SELECT doc_id, k, MIN(((h % 2147483647) * a + b) % 2147483647) AS sv
      FROM hv CROSS JOIN perms GROUP BY doc_id, k
    ), bandkey AS (
      SELECT doc_id, k // {rpb} AS band,
             string_agg(CAST(sv AS VARCHAR), ',' ORDER BY k) AS key
      FROM sig GROUP BY doc_id, k // {rpb}
    ), m AS (
      SELECT b.doc_id, MIN(a.doc_id) AS dup_of,
             CAST(COUNT(DISTINCT a.band) AS BIGINT) AS n_dup_bands
      FROM bandkey a JOIN bandkey b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
      GROUP BY b.doc_id
    )
    SELECT d.doc_id, m.dup_of, m.dup_of IS NOT NULL AS is_dup,
           COALESCE(m.n_dup_bands, 0) AS n_dup_bands
    FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
    """


@register(
    "s_minhash_dedup_stream",
    oracle=_s_minhash_oracle(),
    survey="N2 N1-S X2 X4",
    tags=("streaming",),
)
def s_minhash_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING incremental MinHash-LSH dedup — the online near-dup
    gate a training-data ingest pipeline runs continuously: each arriving
    micro-batch of documents is (1) MinHash-signed and banded (one Arrow
    pass, no shuffle), (2) probed against the accumulated band-bucket
    index PLUS its own earlier rows (one join keyed on the band bucket —
    work ∝ bucket hits, never corpus²), and (3) appended to the index.

    State is an APPEND-ONLY bucket log: each batch writes only its own
    O(batch) segment (`seg-<bid>`, overwrite ⇒ idempotent on crash
    replay), never rewriting history — the 100 TB shape, where the index
    is a date-partitioned table and today's ingest probes it without
    touching yesterday's files (same contract as n1_incremental_dedup's
    broadcast-digest history).  A replayed batch re-probes against a
    state that may already contain its own rows; the strict `<` on
    doc_id and the MIN/COUNT(DISTINCT) aggregates make the verdicts
    identical, so crash-resume converges (X4).

    Verdict per doc: (doc_id, dup_of = min earlier doc sharing a band,
    is_dup, n_dup_bands).  The drained stream hash-matches the one-shot
    whole-corpus LSH replay (the oracle), estimate-free: banding is
    exact given the signatures.  The crash-convergence claim is pinned
    by tests/test_r6_ops.py::test_minhash_dedup_stream_crash_replay,
    which injects a torn state segment mid-run through this same core
    (``_minhash_dedup_run``).
    """
    return _minhash_dedup_run(spark, sf_dir)


def _minhash_dedup_run(
    spark: SparkSession, sf_dir: str, crash_once_at: int | None = None
) -> DataFrame:
    """The streaming-dedup core.  ``crash_once_at=b`` injects a failure
    in batch b AFTER a torn (partial) state segment lands — the worst
    crash point — then restarts on the same checkpoint; the replayed
    batch sees its own torn rows in the index, which the strict `<` and
    MIN/COUNT(DISTINCT) aggregates absorb."""
    import glob as _glob
    import os
    import shutil
    import uuid

    from ..streaming import replay
    from ..streaming.segments import SegmentStore
    from .streaming_queries import _CHUNKS, _stream_shuffle_partitions, _work_dir

    wd = _work_dir(sf_dir, "s_mhdedup")
    run = uuid.uuid4().hex[:8]
    state_dir = os.path.join(wd, f"state-{run}")
    out_dir = os.path.join(wd, f"out-{run}")
    ckpt = os.path.join(wd, f"ckpt-{run}")
    os.makedirs(out_dir, exist_ok=True)
    # self-compacting band-bucket index: fold every 2 batches, keeping
    # only the MIN doc per (band, key) — exactly what the strict-< probe
    # consumes — so the index is bounded by DISTINCT buckets, not uptime
    store = SegmentStore(
        spark, state_dir, compact_every=2,
        merge=lambda df: df.groupBy("band", "key")
        .agg(F.min("id").alias("id"))
        .select("id", "band", "key"),
    )

    sdf = replay.replay_table(
        spark, sf_dir, "documents", os.path.join(wd, "src"),
        ts_col="doc_id", chunks=_CHUNKS, order_by=["doc_id"],
    )
    crashed = {"done": False}

    def fold(batch, bid: int) -> None:
        buckets = dedup.minhash_band_buckets(
            batch, "doc_id", "text", n=3, num_hashes=32, bands=8
        )
        flat = buckets.select(
            "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
        ).localCheckpoint(eager=True)
        earlier = flat.select(F.col("id").alias("eid"), "band", "key")
        hist = store.read()
        if hist is not None:
            earlier = earlier.unionByName(
                hist.select(F.col("id").alias("eid"), "band", "key")
            )
        hits = (
            flat.join(earlier, ["band", "key"])
            .filter(F.col("eid") < F.col("id"))
            .groupBy("id")
            .agg(
                F.min("eid").alias("dup_of"),
                F.countDistinct("band").alias("n_dup_bands"),
            )
        )
        verdicts = (
            batch.select("doc_id")
            .join(hits.withColumnRenamed("id", "doc_id"), "doc_id", "left")
            .select(
                "doc_id",
                "dup_of",
                F.col("dup_of").isNotNull().alias("is_dup"),
                F.coalesce("n_dup_bands", F.lit(0)).cast("long").alias("n_dup_bands"),
            )
        )
        if crash_once_at == bid and not crashed["done"]:
            crashed["done"] = True
            # torn write: a partial state segment lands, then the
            # "process" dies before the verdicts commit
            flat.limit(5).write.mode("overwrite").parquet(
                os.path.join(state_dir, f"seg-{bid:04d}")
            )
            raise RuntimeError("injected crash after torn state segment")
        # overwrite per-batch paths ⇒ replay-idempotent emission and state
        verdicts.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"out-{bid:04d}")
        )
        store.append(flat, bid)

    with _stream_shuffle_partitions(spark):
        if crash_once_at is not None:
            try:
                replay.run_foreach_batch(sdf, fold, checkpoint_dir=ckpt)
                raise AssertionError("injected crash did not fire")
            except Exception as e:
                if "injected crash" not in str(e):
                    raise
        replay.run_foreach_batch(sdf, fold, checkpoint_dir=ckpt)

    outs = sorted(_glob.glob(os.path.join(out_dir, "out-*")))
    res = (
        spark.read.parquet(*outs)
        .select("doc_id", "dup_of", "is_dup", "n_dup_bands")
        .localCheckpoint(eager=True)
    )
    for d in (state_dir, out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    return res


# --------------------------------------------------------------------------
# N6 — DSIR-style hashed-n-gram importance resampling
# --------------------------------------------------------------------------
_DSIR_BUCKETS = 1024


def _dsir_bt(d: DataFrame) -> DataFrame:
    """(doc_id, lang, b): one row per token occurrence, hashed into its
    DSIR bucket — the shared tokenize+bucket pass."""
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit("")
            )
        ).alias("t"),
    )
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long")
        % _DSIR_BUCKETS
    )
    return tok.select("doc_id", "lang", bucket.alias("b"))


def _dsir_bucket_stats(bt: DataFrame) -> DataFrame:
    """Per-bucket (b, rc, tc) counts — ADDITIVE across any partition of
    the corpus, which is what the streaming stats maintenance sums."""
    return bt.groupBy("b").agg(
        F.count(F.lit(1)).alias("rc"),
        F.count(F.when(F.col("lang") == "en", F.lit(1))).alias("tc"),
    )


def _dsir_score_with_stats(bt: DataFrame, stats_rows) -> DataFrame:
    """Finish DSIR from collected bucket stats: derive tt/rt and the
    integer cross-difference weights driver-side, broadcast, score."""
    spark = bt.sparkSession
    tt = sum(r["tc"] for r in stats_rows)
    rt = sum(r["rc"] for r in stats_rows)
    weights = spark.createDataFrame(
        [(r["b"], r["tc"] * rt - r["rc"] * tt) for r in stats_rows],
        "b long, w long",
    )
    return (
        bt.join(F.broadcast(weights), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("w").cast("long").alias("score"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def _dsir_rank(scored: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    rank_w = Window.partitionBy(F.col("score") > 0).orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return scored.select(
        "doc_id",
        "lang",
        "score",
        "n_tokens",
        (F.col("score") > 0).alias("keep"),
        F.when(
            F.col("score") > 0, F.row_number().over(rank_w).cast("long")
        ).alias("sample_rank"),
    )


def _dsir_scored(d: DataFrame) -> DataFrame:
    """The DSIR scoring core: (doc_id, lang, score, n_tokens) with the
    exact-integer cross-difference weights — shared by n6_dsir_resample
    and the pipeline composite."""
    bt = _dsir_bt(d)
    # ONE stats pass over the corpus: raw AND target per-bucket counts
    # in the same aggregation, collected once (≤ _DSIR_BUCKETS rows).
    # tt/rt and the finished weights derive driver-side — the corpus is
    # tokenized exactly twice total (stats pass + scoring pass), not
    # once per collect()/action as the naive raw/target/totals DAG does.
    return _dsir_score_with_stats(bt, _dsir_bucket_stats(bt).collect())


_DSIR_RESAMPLE_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, lang,
             UNNEST(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                t -> t <> '')) AS t
      FROM documents
    ), bt AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)
               % {_DSIR_BUCKETS} AS b
      FROM tok
    ), target AS (
      SELECT b, COUNT(*) AS tc FROM bt WHERE lang = 'en' GROUP BY b
    ), raw AS (
      SELECT b, COUNT(*) AS rc FROM bt GROUP BY b
    ), totals AS (
      SELECT (SELECT SUM(tc) FROM target) AS tt,
             (SELECT SUM(rc) FROM raw) AS rt
    ), scored AS (
      SELECT bt.doc_id, bt.lang,
             SUM(COALESCE(target.tc, 0) * totals.rt
                 - raw.rc * totals.tt) AS score,
             COUNT(*) AS n_tokens
      FROM bt
      LEFT JOIN target ON target.b = bt.b
      JOIN raw ON raw.b = bt.b
      CROSS JOIN totals
      GROUP BY bt.doc_id, bt.lang
    )
    SELECT doc_id, lang, CAST(score AS BIGINT) AS score,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           score > 0 AS keep,
           CAST(CASE WHEN score > 0 THEN
                  ROW_NUMBER() OVER (PARTITION BY (score > 0)
                                     ORDER BY score DESC, doc_id)
                ELSE NULL END AS BIGINT) AS sample_rank
    FROM scored
    """


@register(
    "n6_dsir_resample",
    oracle=_DSIR_RESAMPLE_ORACLE,
    survey="N6 N4",
)
def n6_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-flavored importance resampling [Xie et al. 2023, Data
    Selection for Language Models via Importance Resampling]: documents
    are scored by how target-like their hashed-n-gram feature profile is,
    then the over-represented ones are kept/ranked for resampling.

    Engine-exact variant: instead of log-probability ratios (libm-
    dependent), the per-bucket weight is the INTEGER cross-difference
    ``target_count·raw_total − raw_count·target_total`` — positive iff
    the bucket is over-represented in the target distribution (here:
    lang='en' docs), and a document's score is the exact BIGINT sum of
    its token-occurrence weights.  Rank order equals the rational-
    arithmetic ratio ranking; nothing floats, so both engines agree
    bit-for-bit.

    Scale shape: tokens hash into 1024 buckets, the
    target/raw count tables are O(buckets) and broadcast into the
    per-token join; the corpus shuffles once on the bucket id.  At
    100 TB the count tables are a side output of the same scan,
    refreshed per snapshot — no per-doc state anywhere.
    """
    d = load_table(spark, sf_dir, "documents")
    return _dsir_rank(_dsir_scored(d))


# --------------------------------------------------------------------------
# N3-S — streaming IVF index ingest
# --------------------------------------------------------------------------
@register(
    "s_ivf_ingest_stream",
    oracle=_IVF_ORACLE,
    survey="N3 X2 X4",
    tags=("streaming", "approx"),
)
def s_ivf_ingest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING IVF index maintenance — similarity search kept fresh at
    ingest time: each arriving micro-batch of embeddings is assigned to
    its nearest coarse centroid (the fixed codebook broadcasts with the
    Arrow UDF) and APPENDED to the inverted-file index as an O(batch)
    segment — per-batch overwrite paths make crash replay idempotent,
    and history is never REWRITTEN, only periodically FOLDED: a
    SegmentStore compaction every 2 batches bounds the live file count
    so probe-side listing stays O(1) over arbitrary uptime (at 100 TB
    the list_id is the table's partition key and the fold is per-day
    file consolidation under it).  After the drain,
    the standard probe path (operators/similarity.ivf_probe — the same
    code the one-shot build uses) answers top-5 queries against the
    accumulated index, hash-matching the batch IVF build (the oracle is
    n3_ivf_topk's SQL replay)."""
    import os
    import shutil
    import uuid

    import numpy as np

    from ..operators import similarity
    from ..streaming import replay
    from ..streaming.segments import SegmentStore
    from .streaming_queries import _CHUNKS, _stream_shuffle_partitions, _work_dir

    e = load_table(spark, sf_dir, "embeddings")
    cent_rows = (
        e.filter(F.col("vec_id") < 16).orderBy("vec_id").select("embedding").collect()
    )
    centroids = np.array([r.embedding for r in cent_rows], dtype=float)
    corpus_assign = similarity._centroid_assign_udf(centroids, 1)

    wd = _work_dir(sf_dir, "s_ivf")
    run = uuid.uuid4().hex[:8]
    state_dir = os.path.join(wd, f"index-{run}")
    ckpt = os.path.join(wd, f"ckpt-{run}")
    store = SegmentStore(spark, state_dir, compact_every=2)

    sdf = replay.replay_table(
        spark, sf_dir, "embeddings", os.path.join(wd, "src"),
        ts_col="vec_id", chunks=_CHUNKS, order_by=["vec_id"],
    )

    def fold(batch, bid: int) -> None:
        seg = batch.select(
            F.col("vec_id").alias("neighbor_id"),
            similarity.as_double(F.col("embedding")).alias("nvec"),
        ).withColumn("list_id", F.explode(corpus_assign(F.col("nvec"))))
        store.append(seg, bid)

    with _stream_shuffle_partitions(spark):
        replay.run_foreach_batch(sdf, fold, checkpoint_dir=ckpt)

    index = store.read()
    q = e.filter(F.col("vec_id") < 8)
    out = similarity.ivf_probe(
        index, q, centroids, k=5, nprobe=3
    ).localCheckpoint(eager=True)
    shutil.rmtree(state_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# N2 — winnowing fingerprint-overlap pairs (MOSS-style)
# --------------------------------------------------------------------------
@register(
    "n2_winnow_overlap_pairs",
    oracle="""
    WITH pos AS (
        SELECT doc_id, LOWER(text) AS t,
               GREATEST(LEN(LOWER(text)) - 7, 1) AS n,
               UNNEST(generate_series(1, GREATEST(LEN(LOWER(text)) - 7, 1)))
                 AS i
        FROM documents WHERE doc_id < 200
    ), h AS (
        SELECT doc_id, i, n,
               CAST(concat('0x', substr(md5(substr(t, CAST(i AS INTEGER), 8)),
                                        1, 8)) AS BIGINT) AS hv
        FROM pos
    ), wm AS (
        SELECT doc_id, i, n,
               MIN(hv) OVER (PARTITION BY doc_id ORDER BY i
                             ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
        FROM h
    ), fset AS (
        SELECT DISTINCT doc_id, fp FROM wm WHERE i <= n - 15
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM fset GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        FROM fset a JOIN fset b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
           ROUND(CAST(n_shared AS DOUBLE) / LEAST(sa.sz, sb.sz), 9) AS overlap
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_shared AS DOUBLE) / LEAST(sa.sz, sb.sz) >= 0.5
    """,
    survey="N2 N4",
)
def n2_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint overlap pairs [Schleimer et al. 2003 — the
    MOSS similarity measure]: documents whose selected-fingerprint sets
    overlap by ≥ 50% of the smaller set.  Reuses the same rolling-hash +
    window-minimum fingerprints n4_winnow_fingerprints certifies; the
    self-join keys on the fingerprint (an inverted index — work ∝
    per-fingerprint document frequency, same scale rule as the shingle
    index, cappable the same way at 100 TB).  Winnowing guarantees any
    shared substring ≥ w+k−1 chars yields a shared fingerprint, so high
    overlap ⇒ long verbatim reuse — the plagiarism/near-dup signal."""
    from ..operators import text_analysis as ta

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    fset = (
        ta.winnow_fingerprints(d, "doc_id", "text", k=8, w=16)
        .select("id", "fp")
        .distinct()
    )
    sizes = fset.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = fset.alias("a")
    b = fset.alias("b")
    inter = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    ratio = F.col("n_shared") / F.least("sz_a", "sz_b")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(ratio >= 0.5)
        .select(
            "id_a", "id_b", F.col("n_shared").cast("long").alias("n_shared"),
            F.round(ratio, 9).alias("overlap"),
        )
    )


# --------------------------------------------------------------------------
# N7 — composite: DSIR gate → winnow-overlap dedup → quantile report
# --------------------------------------------------------------------------
def _pipeline_dsir_oracle() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, lang,
             UNNEST(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                t -> t <> '')) AS t
      FROM documents
    ), bt AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)
               % {_DSIR_BUCKETS} AS b
      FROM tok
    ), target AS (
      SELECT b, COUNT(*) AS tc FROM bt WHERE lang = 'en' GROUP BY b
    ), raw AS (
      SELECT b, COUNT(*) AS rc FROM bt GROUP BY b
    ), totals AS (
      SELECT (SELECT SUM(tc) FROM target) AS tt,
             (SELECT SUM(rc) FROM raw) AS rt
    ), scored AS (
      SELECT bt.doc_id, bt.lang,
             SUM(COALESCE(target.tc, 0) * totals.rt
                 - raw.rc * totals.tt) AS score
      FROM bt
      LEFT JOIN target ON target.b = bt.b
      JOIN raw ON raw.b = bt.b
      CROSS JOIN totals
      GROUP BY bt.doc_id, bt.lang
    ), keep AS (
      SELECT doc_id, lang FROM scored WHERE score > 0
    ), pos AS (
      SELECT d.doc_id, LOWER(d.text) AS t,
             GREATEST(LEN(LOWER(d.text)) - 7, 1) AS n,
             UNNEST(generate_series(1, GREATEST(LEN(LOWER(d.text)) - 7, 1)))
               AS i
      FROM documents d JOIN keep k ON k.doc_id = d.doc_id
    ), h AS (
      SELECT doc_id, i, n,
             CAST(concat('0x', substr(md5(substr(t, CAST(i AS INTEGER), 8)),
                                      1, 8)) AS BIGINT) AS hv
      FROM pos
    ), wm AS (
      SELECT doc_id, i, n,
             MIN(hv) OVER (PARTITION BY doc_id ORDER BY i
                           ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
      FROM h
    ), fset0 AS (
      SELECT DISTINCT doc_id, fp FROM wm WHERE i <= n - 15
    ), fdf AS (
      SELECT fp, COUNT(*) AS df FROM fset0 GROUP BY fp
    ), fset AS (
      -- stop-fingerprint cap (df <= 64): hot fingerprints carry no
      -- near-dup signal and send the self-join quadratic — same rule as
      -- stop_shingle_df_cap, applied identically on both engines
      SELECT fset0.doc_id, fset0.fp FROM fset0
      JOIN fdf ON fdf.fp = fset0.fp WHERE fdf.df <= 64
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM fset GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      FROM fset a JOIN fset b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), dropped AS (
      SELECT DISTINCT id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_shared AS DOUBLE) / LEAST(sa.sz, sb.sz) >= 0.5
    ), final AS (
      SELECT k.doc_id, k.lang FROM keep k
      LEFT JOIN dropped dr ON dr.id_b = k.doc_id
      WHERE dr.id_b IS NULL
    ), chars AS (
      SELECT f.doc_id, f.lang, d.n_chars
      FROM final f JOIN documents d ON d.doc_id = f.doc_id
    ), pri AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT), doc_id) AS rn
      FROM chars
    ), g AS (
      SELECT lang, ARRAY_AGG(n_chars ORDER BY n_chars) AS vs, COUNT(*) AS n
      FROM pri WHERE rn <= 50 GROUP BY lang
    ), n_in AS (
      SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang
    ), n_dsir AS (
      SELECT lang, COUNT(*) AS c FROM keep GROUP BY lang
    ), n_final AS (
      SELECT lang, COUNT(*) AS c FROM final GROUP BY lang
    )
    SELECT g.lang,
           CAST(n_in.c AS BIGINT) AS n_in,
           CAST(n_dsir.c AS BIGINT) AS n_after_dsir,
           CAST(n_final.c AS BIGINT) AS n_after_dedup,
           CAST(g.vs[CAST(FLOOR(0.5 * (g.n - 1)) AS BIGINT) + 1]
                AS BIGINT) AS est_p50_chars
    FROM g
    JOIN n_in ON n_in.lang = g.lang
    JOIN n_dsir ON n_dsir.lang = g.lang
    JOIN n_final ON n_final.lang = g.lang
    """


@register(
    "pipeline_dsir_end_to_end",
    oracle=_pipeline_dsir_oracle(),
    survey="N7 N6 N2 A9",
)
def pipeline_dsir_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third end-to-end pipeline composite, built from THIS wave's
    certified operators in one oracled query: (1) DSIR importance gate
    (keep score > 0), (2) winnowing-overlap dedup among survivors (drop
    any doc sharing ≥ 50% of the smaller fingerprint set with an
    earlier survivor), (3) per-language report with a bottom-k quantile
    sketch of the surviving length distribution — per-stage attrition
    visible as n_in → n_after_dsir → n_after_dedup.  Every stage is the
    same code its standalone query certifies (_dsir_scored,
    winnow_fingerprints, bottomk); the composition itself is what this
    query proves."""
    from ..operators import sketches
    from ..operators import text_analysis as ta

    d = load_table(spark, sf_dir, "documents")
    # keep and fset each feed several DAG branches (attrition counts,
    # anti-join, self-join, sizes); localCheckpoint materializes the
    # doc-level intermediates ONCE so the corpus-wide scoring and
    # winnowing passes don't re-run per branch — at 100 TB these are
    # the two passes worth persisting (both outputs are doc-granular,
    # orders of magnitude smaller than the corpus text)
    keep = (
        _dsir_scored(d)
        .filter(F.col("score") > 0)
        .select("doc_id", "lang")
        .localCheckpoint()
    )
    survivors = d.join(keep.select("doc_id"), "doc_id")
    fset = (
        ta.winnow_fingerprints(survivors, "doc_id", "text", k=8, w=16)
        .select("id", "fp")
        .distinct()
        .localCheckpoint()
    )
    # stop-fingerprint cap: drop fps with df > 64 BEFORE the self-join
    # (semi-join on the same shuffle key) — bounds the pair fan-out at
    # n_fps x 64^2; hot fingerprints carry no near-dup signal
    rare = (
        fset.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 64)
        .select("fp")
    )
    fset = fset.join(rare, "fp", "left_semi")
    sizes = fset.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = fset.alias("a")
    b = fset.alias("b")
    inter = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    dropped = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("n_shared") / F.least("sz_a", "sz_b") >= 0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    final = keep.join(dropped, "doc_id", "left_anti")
    chars = final.join(d.select("doc_id", "n_chars"), "doc_id")
    samp = sketches.bottomk_sample(chars, "lang", "n_chars", "doc_id", k=50)
    est = sketches.bottomk_quantiles(samp, "lang", "n_chars", quantiles=(0.5,))
    n_in = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_in"))
    n_dsir = keep.groupBy("lang").agg(F.count(F.lit(1)).alias("n_after_dsir"))
    n_final = final.groupBy("lang").agg(F.count(F.lit(1)).alias("n_after_dedup"))
    return (
        est.join(n_in, "lang")
        .join(n_dsir, "lang")
        .join(n_final, "lang")
        .select(
            "lang", "n_in", "n_after_dsir", "n_after_dedup",
            F.col("est_p50").cast("long").alias("est_p50_chars"),
        )
    )


# --------------------------------------------------------------------------
# N4 — character-diversity quality signal (entropy-free, engine-exact)
# --------------------------------------------------------------------------
@register(
    "n4_char_diversity",
    oracle="""
    WITH ch AS (
      SELECT doc_id, UNNEST(string_split_regex(LOWER(text), '')) AS c
      FROM documents WHERE doc_id < 300
    ), cnt AS (
      SELECT doc_id, c, COUNT(*) AS n FROM ch WHERE c <> '' GROUP BY doc_id, c
    ), agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
             CAST(SUM(n) AS BIGINT) AS n_chars,
             CAST(SUM(n * n) AS BIGINT) AS sum_sq,
             CAST(MAX(n) AS BIGINT) AS top_char_n
      FROM cnt GROUP BY doc_id
    )
    SELECT doc_id, n_distinct_chars, n_chars,
           1.0 - CAST(sum_sq AS DOUBLE) / (n_chars * n_chars) AS char_gini,
           CAST(top_char_n AS DOUBLE) / n_chars AS top_char_frac
    FROM agg
    """,
    survey="N4",
)
def n4_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-diversity quality signal, entropy without logarithms:
    Gini impurity 1 − Σ(cᵢ/n)² over the character histogram plus the
    top-character mass — rational arithmetic only (one double division
    per measure), so both engines agree bit-for-bit where a Shannon
    entropy would drift in the last ulp of libm's log.  Low diversity /
    high top-char mass flags degenerate or repetitive documents — the
    cheap first-pass gate before the heavier repetition signals
    (n4_repetition_signals).  Map-side explode + one shuffle on doc_id."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    ch = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "")).alias("c"),
    ).filter(F.col("c") != "")
    cnt = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n"))
    agg = cnt.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
        F.sum("n").cast("long").alias("n_chars"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sum_sq"),
        F.max("n").cast("long").alias("top_char_n"),
    )
    return agg.select(
        "doc_id",
        "n_distinct_chars",
        "n_chars",
        (
            F.lit(1.0)
            - F.col("sum_sq").cast("double")
            / (F.col("n_chars") * F.col("n_chars"))
        ).alias("char_gini"),
        (F.col("top_char_n").cast("double") / F.col("n_chars")).alias(
            "top_char_frac"
        ),
    )


# --------------------------------------------------------------------------
# N2 — cluster canonical selection (keep the best member per dedup cluster)
# --------------------------------------------------------------------------
def _canonical_oracle() -> str:
    from ..registry import REGISTRY

    clusters = REGISTRY["n2_dedup_clusters"].oracle
    return f"""
    WITH comp AS ({clusters}),
    members AS (
      SELECT c.id, c.component, d.n_chars
      FROM comp c JOIN documents d ON d.doc_id = c.id
    ), pick AS (
      SELECT component, id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY component
                                ORDER BY n_chars DESC, id) AS rk,
             COUNT(*) OVER (PARTITION BY component) AS n_members
      FROM members
    )
    SELECT component, id AS canonical_id,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(n_chars AS BIGINT) AS kept_chars,
           CAST(n_members - 1 AS BIGINT) AS n_dropped
    FROM pick WHERE rk = 1
    """


@register(
    "n2_cluster_canonical",
    oracle=_canonical_oracle(),
    survey="N2 N1",
)
def n2_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-member selection per near-dup cluster — the decision
    step after n2_dedup_clusters' components: keep the LONGEST member
    (most complete version, ties to the lower doc_id), drop the rest.
    The min-id convention elsewhere is a special case; real corpus
    dedup keeps the best-quality copy, and any deterministic per-member
    score slots into the same argmax window.  One extra window over the
    component partitioning — no new shuffle beyond the components'."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = dedup.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.2)
    comp = dedup.connected_components(pairs)
    members = comp.join(
        d.select(F.col("doc_id").alias("id"), "n_chars"), "id"
    )
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("id")
    )
    cw = Window.partitionBy("component")
    return (
        members.select(
            "component",
            "id",
            "n_chars",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(cw).alias("n_members"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "component",
            F.col("id").alias("canonical_id"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("n_chars").cast("long").alias("kept_chars"),
            (F.col("n_members") - 1).cast("long").alias("n_dropped"),
        )
    )


# --------------------------------------------------------------------------
# N2 — skew-guard certification: the band-bucket cap SEEN binding
# --------------------------------------------------------------------------
_SKEW_BOILER = (
    "click here to accept all cookies and subscribe to our newsletter"
    " for exclusive updates today"
)
_SKEW_CAP = 32


def _lsh_capped_skew_oracle(
    num_hashes: int = 32, bands: int = 8, seed: int = 42
) -> str:
    pa, pb = dedup.minhash_perms(num_hashes, seed)
    rpb = num_hashes // bands
    perms = ", ".join(
        f"({k}, {a}, {b})" for k, (a, b) in enumerate(zip(pa, pb))
    )
    shingles = _SHINGLE_HASH_CTES.replace("FROM documents", "FROM adv")
    return f"""
    WITH adv AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text
                  ELSE '{_SKEW_BOILER}' END AS text
      FROM documents
    ), {shingles},
    perms(k, a, b) AS (VALUES {perms}),
    sig AS (
      SELECT doc_id, k, MIN(((h % 2147483647) * a + b) % 2147483647) AS sv
      FROM hv CROSS JOIN perms GROUP BY doc_id, k
    ), bandkey AS (
      SELECT doc_id, k // {rpb} AS band,
             string_agg(CAST(sv AS VARCHAR), ',' ORDER BY k) AS key
      FROM sig GROUP BY doc_id, k // {rpb}
    ), bsize AS (
      SELECT band, key, COUNT(*) AS c FROM bandkey GROUP BY band, key
    ), dropped AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_dropped
      FROM bsize WHERE c > {_SKEW_CAP}
    ), ok AS (
      SELECT bk.doc_id, bk.band, bk.key
      FROM bandkey bk JOIN bsize
        ON bsize.band = bk.band AND bsize.key = bk.key
      WHERE bsize.c <= {_SKEW_CAP}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ok a JOIN ok b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(SUM(CASE WHEN sa.sv = sb.sv THEN 1 ELSE 0 END) AS DOUBLE)
             / {num_hashes} AS est_jaccard,
           (SELECT n_dropped FROM dropped) AS n_dropped_buckets
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.id_a
    JOIN sig sb ON sb.doc_id = c.id_b AND sb.k = sa.k
    GROUP BY c.id_a, c.id_b
    """


@register(
    "n2_lsh_capped_skew",
    oracle=_lsh_capped_skew_oracle(),
    survey="N2",
    tags=("approx",),
)
def n2_lsh_capped_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The band-bucket skew cap OBSERVED binding — not merely neutral.

    Adversarial corpus, derived deterministically from `documents` on
    both engines: 4 of every 5 docs are replaced by one identical
    boilerplate string, so every band bucket of the boilerplate set
    goes hot (all 8 bands of an identical text share identical keys)
    and exceeds the cap at every test SF (40 docs at sf0.001, 4000 at
    sf0.1 — cap 32).  The capped join then proves BOTH halves of the
    guard's contract at once:

    - the cap ENGAGES: n_dropped_buckets (hot buckets excluded before
      the self-join) is surfaced as a column and hash-checked — the
      pytest pin asserts it is nonzero, so 'cap never seen working'
      can't regress silently;
    - the SAFE SUBSET is untouched: surviving pairs are exactly the
      near-dup pairs among the 1-in-5 clean docs, value-hash-matching
      DuckDB's identically-capped replay.

    At 100 TB this is the degenerate shape that would otherwise send
    one bucket's self-join quadratic (boilerplate-dense crawls); the
    guard turns it into bounded work with explicit, countable loss.
    """
    d = load_table(spark, sf_dir, "documents")
    adv = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.col("text"))
        .otherwise(F.lit(_SKEW_BOILER))
        .alias("text"),
    )
    buckets = dedup.minhash_band_buckets(adv, "doc_id", "text")
    over = (
        buckets.groupBy("bk")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > _SKEW_CAP)
        .agg(F.count(F.lit(1)).alias("n_dropped_buckets"))
    )
    pairs = dedup.minhash_lsh_pairs(
        adv, "doc_id", "text", band_bucket_cap=_SKEW_CAP
    )
    return pairs.crossJoin(F.broadcast(over))


# --------------------------------------------------------------------------
# N5 — REAL baseline JPEG decode end-to-end (DC-exact certification)
# --------------------------------------------------------------------------
@register(
    "n5_jpeg_decode_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id, (doc_id % 4 + 1) * 8 AS w, (doc_id % 3 + 1) * 8 AS h
      FROM documents WHERE doc_id < 120
    ), px AS (
      SELECT doc_id, w, h, UNNEST(range(0, w*h)) AS i FROM dims
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM((doc_id*37 + ((i // w) // 8)*19 + ((i % w) // 8)*11)
                    % 256) AS BIGINT) AS sum_lum,
           CAST(SUM((i + 1) * ((doc_id*37 + ((i // w) // 8)*19
                               + ((i % w) // 8)*11) % 256))
                AS BIGINT) AS wsum
    FROM px GROUP BY doc_id
    """,
    survey="N5",
)
def n5_jpeg_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode end-to-end (N5) — the compressed-format
    counterpart of n5_decode_real's PNG path: per-doc grayscale images
    of constant 8x8 blocks are JPEG-ENCODED in one mapInPandas pass
    (operators/jpeg_codec: Annex-K Huffman tables, unit quantizer,
    byte-stuffed entropy stream) and DECODED in a second — marker
    parse, stream-driven Huffman table build, DC prediction + EXTEND,
    dequant, zigzag de-scan and the full floating-point IDCT all on the
    hot path.

    Certifiability trick: a constant block's FDCT is DC-only and a unit
    quantizer keeps it integer, so quantize→dequantize→IDCT is
    bit-exact and the oracle recomputes every decoded pixel in closed
    form from (doc_id, block position) — DuckDB never sees a JPEG byte.
    The AC/ZRL path (which the oracle can't reach — cosines) is pinned
    one-sided in tests/test_r7_ops.py against a straight numpy IDCT
    reference.  Both passes are map-only; per-image feature fold
    happens inside the decode pass, the only shuffle is the final
    per-doc agg.  (Per-image Python Huffman decode is the correctness
    reference; at 100 TB the same hook swaps to libjpeg-turbo.)"""
    import pandas as pd

    from ..operators import multimodal
    from ..operators.jpeg_codec import constant_block_coeffs, encode_jpeg_gray

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 120)
        .select("doc_id")
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                bw, bh = did % 4 + 1, did % 3 + 1
                blocks = [
                    constant_block_coeffs(
                        (did * 37 + by * 19 + bx * 11) % 256
                    )
                    for by in range(bh)
                    for bx in range(bw)
                ]
                payloads.append(encode_jpeg_gray(blocks, bw, bh))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads}
            )

    media = d.mapInPandas(encode, "doc_id long, media_bytes binary")

    cols = ["doc_id", "width", "height", "n_px", "sum_lum", "wsum"]

    def decode(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h, rgb = multimodal.decode_image(
                    bytes(r.media_bytes), "jpeg"
                )
                lum = rgb[0::3]
                s = ws = 0
                for i, v in enumerate(lum):
                    s += v
                    ws += (i + 1) * v
                rows.append((int(r.doc_id), w, h, w * h, s, ws))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        decode,
        "doc_id long, width int, height int, n_px long, "
        "sum_lum long, wsum long",
    )


# --------------------------------------------------------------------------
# N5 — REAL 4:2:0 COLOR baseline JPEG decode (exact-pixel certification)
# --------------------------------------------------------------------------
@register(
    "n5_jpeg_color_decode",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             doc_id % 3 + 1 AS mw,
             16*(doc_id % 3 + 1) - (doc_id % 5) AS w,
             16*(doc_id % 2 + 1) - (doc_id % 3) AS h
      FROM documents WHERE doc_id < 96
    ), px AS (
      SELECT doc_id, mw, w, h, UNNEST(range(0, w*h)) AS i FROM dims
    ), ycc AS (
      SELECT doc_id, w, h, i,
             (doc_id*37 + (((i // w) // 16)*mw + (i % w) // 16)*29
              + ((((i // w) % 16) // 8)*2 + ((i % w) % 16) // 8)*7)
               % 256 AS yv,
             (doc_id*11 + (((i // w) // 16)*mw + (i % w) // 16)*5 + 40)
               % 256 AS cbv,
             (doc_id*23 + (((i // w) // 16)*mw + (i % w) // 16)*3 + 90)
               % 256 AS crv
      FROM px
    ), rgb AS (
      SELECT doc_id, w, h, i,
             LEAST(255, GREATEST(0,
               (1000000*yv + 1402000*(crv-128) + 512500000)
                 // 1000000 - 512)) AS r,
             LEAST(255, GREATEST(0,
               (1000000*yv - 344136*(cbv-128) - 714136*(crv-128)
                + 512500000) // 1000000 - 512)) AS g,
             LEAST(255, GREATEST(0,
               (1000000*yv + 1772000*(cbv-128) + 512500000)
                 // 1000000 - 512)) AS b
      FROM ycc
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(b) AS BIGINT) AS sum_b,
           CAST(SUM((i + 1) * (r + 2*g + 3*b)) AS BIGINT) AS wsum
    FROM rgb GROUP BY doc_id
    """,
    survey="N5",
)
def n5_jpeg_color_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 4:2:0 COLOR baseline JPEG decode end-to-end (N5) — closes
    the chroma-subsampling half of the r7-declared JPEG gap.  Per-doc
    YCbCr images (Y quadrant constants per MCU, constant chroma per
    MCU) are encoded as interleaved 4:2:0 baseline JPEG in one
    mapInPandas pass (operators/jpeg_codec.encode_jpeg_color_420:
    Annex-K luma AND chroma Huffman tables, per-component DC
    predictors, T.81 A.2.3 MCU interleave, non-MCU-aligned crop dims)
    and decoded in a second via the general decoder — per-component
    quant/Huffman selectors, interleaved entropy decode, replication
    chroma upsample and the exact-int64 YCbCr->RGB conversion.

    Certifiability: constant blocks keep quantize/dequantize/IDCT
    bit-exact (DC-only FDCT), and the color convert is defined in
    integer arithmetic (JFIF constants x 10^6, round-half-up, +512
    shift keeping numerators positive so floor==truncate in every
    engine) — DuckDB recomputes each decoded RGB pixel in closed form
    without seeing a JPEG byte.  The color AC path is pinned in tests
    against a straight numpy IDCT reference.  Both passes map-only;
    the only shuffle is the final per-doc agg (at 100 TB the decode
    hook swaps to libjpeg-turbo behind the same signature)."""
    import pandas as pd

    from ..operators import multimodal
    from ..operators.jpeg_codec import (
        constant_block_coeffs,
        encode_jpeg_color_420,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 96)
        .select("doc_id")
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                mw_, mh_ = did % 3 + 1, did % 2 + 1
                yb, cbb, crb = [], [], []
                for my in range(mh_):
                    for mx in range(mw_):
                        m = my * mw_ + mx
                        for q in range(4):
                            yb.append(constant_block_coeffs(
                                (did * 37 + m * 29 + q * 7) % 256))
                        cbb.append(constant_block_coeffs(
                            (did * 11 + m * 5 + 40) % 256))
                        crb.append(constant_block_coeffs(
                            (did * 23 + m * 3 + 90) % 256))
                payloads.append(encode_jpeg_color_420(
                    yb, cbb, crb, mw_, mh_,
                    width=16 * mw_ - did % 5,
                    height=16 * mh_ - did % 3,
                ))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads}
            )

    media = d.mapInPandas(encode, "doc_id long, media_bytes binary")

    cols = ["doc_id", "width", "height", "n_px",
            "sum_r", "sum_g", "sum_b", "wsum"]

    def decode(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                w, h, rgb = multimodal.decode_image(
                    bytes(rec.media_bytes), "jpeg"
                )
                a = np.frombuffer(rgb, np.uint8).astype(np.int64)
                rch, gch, bch = a[0::3], a[1::3], a[2::3]
                idx = np.arange(w * h, dtype=np.int64)
                wsum = int(((idx + 1) * (rch + 2 * gch + 3 * bch)).sum())
                rows.append((int(rec.doc_id), w, h, w * h,
                             int(rch.sum()), int(gch.sum()),
                             int(bch.sum()), wsum))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        decode,
        "doc_id long, width int, height int, n_px long, "
        "sum_r long, sum_g long, sum_b long, wsum long",
    )


# --------------------------------------------------------------------------
# N3 — binary-quantization ANN: sign bits + Hamming prefilter + rerank
# --------------------------------------------------------------------------
@register(
    "n3_binary_hamming_topk",
    oracle="""
    WITH v0 AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), w AS (
      SELECT vec_id, e,
             CAST(list_sum(list_transform(range(0, 32),
                  j -> CASE WHEN e[j + 1] > 0
                            THEN CAST(1 AS BIGINT) << j ELSE 0 END))
                  AS BIGINT) AS w0,
             CAST(list_sum(list_transform(range(32, 64),
                  j -> CASE WHEN e[j + 1] > 0
                            THEN CAST(1 AS BIGINT) << (j - 32) ELSE 0 END))
                  AS BIGINT) AS w1
      FROM v0
    ), q AS (SELECT * FROM w WHERE vec_id < 8),
    cand AS (
      SELECT * FROM (
        SELECT q.vec_id AS query_id, w.vec_id AS neighbor_id,
               CAST(bit_count(xor(q.w0, w.w0))
                    + bit_count(xor(q.w1, w.w1)) AS BIGINT) AS hamming,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY bit_count(xor(q.w0, w.w0))
                          + bit_count(xor(q.w1, w.w1)), w.vec_id) AS crank
        FROM w CROSS JOIN q WHERE q.vec_id <> w.vec_id
      ) WHERE crank <= 32
    ), scored AS (
      SELECT c.query_id, c.neighbor_id, c.hamming,
             ROUND(list_dot_product(qe.e, ne.e)
                   / (SQRT(list_dot_product(qe.e, qe.e))
                      * SQRT(list_dot_product(ne.e, ne.e))), 9) AS cosine_sim
      FROM cand c
      JOIN v0 qe ON qe.vec_id = c.query_id
      JOIN v0 ne ON ne.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, hamming, cosine_sim,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    survey="N3",
)
def n3_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN (the 1-bit tier below int8): embeddings
    sign-binarize into packed words (64x smaller than fp32), the coarse
    pass ranks by Hamming distance — XOR + POPCOUNT, pure
    whole-stage-codegen integer ops — and only the top-32 candidates
    per query are exact-cosine reranked for the final top-5.  The
    standard two-stage retrieval shape: at 100 TB the packed words
    persist as two long columns so the coarse scan skips the 64-float
    array entirely (here they are derived inline — same plan, one extra
    projection), and the rerank join touches queries x 32 embedding
    rows.  Fully oracled: DuckDB packs
    the identical sign bits and replays both stages (coarse tie-break
    by neighbor_id pinned on both engines); recall vs the exact fp32
    path is additionally pinned in tests/test_r7_ops.py."""
    from ..operators import similarity

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return similarity.binary_hamming_topk(e, q, dim=64, k=5, rerank=32)


# --------------------------------------------------------------------------
# N4/N3 — BM25 more-like-this retrieval
# --------------------------------------------------------------------------
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_core_sql(k: int) -> str:
    """CTE chain ending in ``lex`` = per-query BM25 top-``k`` with rank —
    shared by n4_bm25_topk (k=5) and the hybrid RRF query (k=20)."""
    from ..functions.exact import sql_dsum

    return f"""ex AS (
      SELECT doc_id,
             UNNEST(list_filter(string_split_regex(LOWER(text), '\\s+'),
                                t -> t <> '')) AS tok
      FROM documents WHERE doc_id < 300
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM ex GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM ex GROUP BY 1
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(CAST(dl AS DECIMAL(27,6))) AS DOUBLE) / COUNT(dl)
               AS avgdl
      FROM dl
    ), dfreq AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS df FROM ex GROUP BY 1
    ), qt AS (
      SELECT DISTINCT doc_id AS query_id, tok FROM ex WHERE doc_id < 5
    ), term AS (
      SELECT qt.query_id, tf.doc_id,
             LN((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1)
             * (tf.tf * {_BM25_K1 + 1}) /
               (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                                      + {_BM25_B} * dl.dl / stats.avgdl))
               AS s
      FROM qt
      JOIN tf ON tf.tok = qt.tok AND tf.doc_id <> qt.query_id
      JOIN dl ON dl.doc_id = tf.doc_id
      JOIN dfreq ON dfreq.tok = qt.tok
      CROSS JOIN stats
    ), agg AS (
      SELECT query_id, doc_id, ROUND({sql_dsum('s')}, 6) AS score
      FROM term GROUP BY 1, 2
    ), lex AS (
      SELECT query_id, doc_id, score, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY score DESC, doc_id) AS rank
        FROM agg
      ) WHERE rank <= {k}
    )"""


def _bm25_oracle() -> str:
    return f"""
    WITH {_bm25_core_sql(5)}
    SELECT query_id, doc_id, score, CAST(rank AS INTEGER) AS rank
    FROM lex
    """


@register(
    "n4_bm25_topk",
    oracle=_bm25_oracle(),
    survey="N4 N3",
)
def n4_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 more-like-this retrieval (k1=1.2, b=0.75, Lucene's
    always-positive idf): each of 5 query documents retrieves its top-5
    BM25 neighbors — the lexical-retrieval counterpart of the N3 dense
    tiers, and the standard pre-filter stage of a hybrid (BM25 + dense)
    training-data retrieval pipeline.

    Scale shape: tf stays partitioned by document; df, document-length
    and corpus stats are the ONLY broadcasts (df table is vocabulary-
    sized); the per-term scores aggregate through an exact DECIMAL sum
    so the floating result is independent of Spark's partial-agg
    ordering and equals DuckDB's replay bit-for-bit."""
    return _bm25_spark(spark, sf_dir, k=5)


def _bm25_spark(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    from ..functions.exact import dsum
    from ..operators import text_analysis as ta

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    ex = d.select("doc_id", F.explode(ta.tokens(F.col("text"))).alias("tok"))
    tf = ex.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dl = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    from ..functions.exact import davg

    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        davg(F.col("dl")).alias("avgdl"),
    )
    dfreq = ex.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    qt = ex.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), "tok"
    ).distinct()
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    s = idf * (F.col("tf") * F.lit(_BM25_K1 + 1)) / (
        F.col("tf")
        + F.lit(_BM25_K1)
        * (1 - _BM25_B + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl"))
    )
    term = (
        F.broadcast(qt)
        .join(tf, (tf.tok == qt.tok) & (tf.doc_id != qt.query_id))
        .drop(qt.tok)
        .join(dl, "doc_id")
        .join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", s.alias("s"))
    )
    agg = term.groupBy("query_id", "doc_id").agg(
        F.round(dsum(F.col("s")), 6).alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    return agg.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= k
    )


# --------------------------------------------------------------------------
# N4 — distributed BPE: merge-rule training + corpus encode
# --------------------------------------------------------------------------
_BPE_MERGES = 8


def _bpe_stages_sql(n: int) -> str:
    """The shared unrolled-iteration CTE chain: words as
    ``|s||y||m||s|`` strings (every symbol pipe-wrapped, so the merge
    REPLACE is boundary-safe and left-to-right greedy like the fold),
    n stages of pair-count → argmax → merge-apply."""
    parts = [r"""
    tok0 AS (
      SELECT doc_id,
             UNNEST(list_filter(string_split_regex(LOWER(text), '\s+'),
                    t -> t <> '' AND NOT contains(t, '|'))) AS w
      FROM documents WHERE doc_id < 200
    ), w0 AS (
      SELECT w, regexp_replace(w, '(.)', '|\1|', 'g') AS s,
             COUNT(*) AS freq
      FROM tok0 GROUP BY 1, 2
    )"""]
    for i in range(n):
        parts.append(f"""
    , p{i} AS (
      SELECT l, freq, UNNEST(range(1, len(l))) AS i
      FROM (SELECT string_split(trim(s, '|'), '||') AS l, freq FROM w{i})
    ), c{i} AS (
      SELECT l[i] AS a, l[i+1] AS b, SUM(freq) AS cnt FROM p{i} GROUP BY 1, 2
    ), m{i} AS (
      SELECT a, b, CAST(cnt AS BIGINT) AS cnt FROM c{i}
      ORDER BY cnt DESC, a, b LIMIT 1
    ), w{i + 1} AS (
      SELECT w, replace(s, '|' || m.a || '||' || m.b || '|',
                        '|' || m.a || m.b || '|') AS s, freq
      FROM w{i} CROSS JOIN m{i} m
    )""")
    return "".join(parts)


def _bpe_train_oracle(n: int = _BPE_MERGES) -> str:
    union = "\n      UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS merge_no, a AS pair_a,"
        f" b AS pair_b, cnt AS pair_count FROM m{i}"
        for i in range(n)
    )
    return f"WITH {_bpe_stages_sql(n)}\n    {union}"


def _bpe_encode_oracle(n: int = _BPE_MERGES) -> str:
    return f"""WITH {_bpe_stages_sql(n)}
    SELECT t.doc_id,
           CAST(SUM(len(string_split(trim(f.s, '|'), '||'))) AS BIGINT)
             AS n_bpe_tokens
    FROM tok0 t JOIN w{n} f ON f.w = t.w
    GROUP BY t.doc_id
    """


def _bpe_train_spark(spark: SparkSession, sf_dir: str, n: int = _BPE_MERGES):
    """Run the distributed BPE trainer; returns (merges, words_df) where
    words_df is the final (w, s, freq) vocabulary table."""
    from ..operators import text_analysis as ta

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok = d.select(
        "doc_id", F.explode(ta.tokens(F.col("text"))).alias("w")
    ).filter(~F.col("w").contains("|"))
    words = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "w",
            F.regexp_replace("w", "(.)", r"|$1|").alias("s"),
            "freq",
        )
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    for i in range(n):
        pairs = (
            words.select(
                F.split(F.expr("trim(BOTH '|' FROM s)"), r"\|\|").alias("l"),
                "freq",
            )
            .filter(F.size("l") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(l) - 2),"
                        " i -> struct(l[i] AS a, l[i + 1] AS b))"
                    )
                ).alias("p"),
                "freq",
            )
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0].a, top[0].b, int(top[0].cnt)
        merges.append((i + 1, a, b, cnt))
        words = words.select(
            "w",
            F.replace(
                F.col("s"), F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|")
            ).alias("s"),
            "freq",
        )
    return merges, words, tok


@register(
    "n4_bpe_train",
    oracle=_bpe_train_oracle(),
    survey="N4 X8",
)
def n4_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge-rule training [Sennrich et al. 2016] — the
    real tokenizer-training loop, not a regex approximation: the corpus
    folds once into a word-frequency vocabulary (the only corpus-sized
    shuffle), then each of 8 iterations counts adjacent symbol pairs
    weighted by word frequency, collects the single argmax pair
    (count desc, pair lexicographic — the deterministic tie-break both
    engines encode), and applies the merge to the vocabulary.

    Words are ``|s||y||m|`` strings (every symbol pipe-wrapped), which
    makes the merge a plain REPLACE that is boundary-safe (a pattern
    can only match at symbol starts) and left-to-right greedy —
    exactly the BPE fold, runnable identically in Spark and DuckDB
    (whose oracle unrolls the 8 iterations as CTE stages).  At 100 TB
    the iterations run on the vocabulary table — orders of magnitude
    smaller than the corpus — so training cost is one corpus pass +
    n_merges vocab passes, the same structure as x8's bounded loops.
    Output: the learned merge table (merge_no, pair_a, pair_b,
    pair_count)."""
    merges, _, _ = _bpe_train_spark(spark, sf_dir)
    return spark.createDataFrame(
        merges, "merge_no long, pair_a string, pair_b string, pair_count long"
    )


@register(
    "n4_bpe_encode",
    oracle=_bpe_encode_oracle(),
    survey="N4",
)
def n4_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encode with the trained BPE merges: every document's
    token count under the learned vocabulary — the number a sequence-
    packing / budget-planning stage consumes.  The encode is a JOIN
    against the final (word → merged symbols) vocabulary table, not a
    per-document re-derivation: at 100 TB the vocabulary broadcasts
    and the corpus is touched exactly once.  Oracle: the same 8
    unrolled merge stages, then per-doc symbol counts through the
    identical word join."""
    merges, words, tok = _bpe_train_spark(spark, sf_dir)
    n_syms = F.size(F.split(F.expr("trim(BOTH '|' FROM s)"), r"\|\|"))
    vocab = words.select("w", n_syms.alias("n_syms"))
    return (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(F.sum("n_syms").cast("long").alias("n_bpe_tokens"))
    )


# --------------------------------------------------------------------------
# N3/N4 — hybrid retrieval: BM25 + dense cosine, reciprocal-rank fusion
# --------------------------------------------------------------------------
_RRF_K = 60


def _hybrid_rrf_oracle() -> str:
    return f"""
    WITH {_bm25_core_sql(20)},
    dv AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings WHERE vec_id < 300
    ), dq AS (SELECT * FROM dv WHERE vec_id < 5),
    den AS (
      SELECT query_id, doc_id, rnk FROM (
        SELECT dq.vec_id AS query_id, dv.vec_id AS doc_id,
               ROW_NUMBER() OVER (PARTITION BY dq.vec_id
                 ORDER BY list_dot_product(dq.e, dv.e)
                          / (SQRT(list_dot_product(dq.e, dq.e))
                             * SQRT(list_dot_product(dv.e, dv.e))) DESC,
                          dv.vec_id) AS rnk
        FROM dv CROSS JOIN dq WHERE dq.vec_id <> dv.vec_id
      ) WHERE rnk <= 20
    ), fused AS (
      SELECT COALESCE(l.query_id, d.query_id) AS query_id,
             COALESCE(l.doc_id, d.doc_id) AS doc_id,
             ROUND(COALESCE(1.0 / ({_RRF_K} + l.rank), 0)
                   + COALESCE(1.0 / ({_RRF_K} + d.rnk), 0), 9) AS rrf_score
      FROM lex l FULL OUTER JOIN den d
        ON l.query_id = d.query_id AND l.doc_id = d.doc_id
    )
    SELECT query_id, doc_id, rrf_score, CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY rrf_score DESC, doc_id) AS rank
      FROM fused
    ) WHERE rank <= 5
    """


@register(
    "n3_hybrid_rrf_topk",
    oracle=_hybrid_rrf_oracle(),
    survey="N3 N4",
)
def n3_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — BM25 lexical top-20 and dense-cosine top-20
    fused by reciprocal-rank fusion (RRF, k=60): score(d) = sum over
    retrievers of 1/(60 + rank_r(d)).  The standard production shape
    for training-data retrieval and RAG candidate generation: both
    stages are the independently certified operators (the BM25 core and
    the brute-force cosine baseline over the id-aligned embeddings
    table), and RRF is pure rank arithmetic — no score calibration
    across modalities, deterministic on both engines.  The fusion join
    is top-20 x queries rows (tiny); each retriever keeps its own scale
    shape."""
    from ..operators import similarity

    lex = _bm25_spark(spark, sf_dir, k=20).select(
        "query_id", "doc_id", F.col("rank").alias("lrank")
    )
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    q = e.filter(F.col("vec_id") < 5)
    den = similarity.cosine_topk(e, q, k=20).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("drank"),
    )
    fused = (
        lex.join(den, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("lrank")), F.lit(0.0))
                + F.coalesce(
                    1.0 / (F.lit(_RRF_K) + F.col("drank")), F.lit(0.0)
                ),
                9,
            ).alias("rrf_score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), "doc_id"
    )
    return fused.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= 5
    )


@register(
    "s_dsir_stats_stream",
    oracle=_DSIR_RESAMPLE_ORACLE,
    survey="N6 X2 X4",
    tags=("streaming",),
)
def s_dsir_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING DSIR stats maintenance — the heaviest pipeline's stats
    pass made incremental: each arriving micro-batch of documents folds
    into per-bucket (rc, tc) counts and lands as an OVERWRITE-idempotent
    epoch segment (counts are additive, not idempotent — exactly-once
    rides on the per-batch segment paths, the same X4 pattern as the
    CMS/LSH/IVF ingest tier).  The drained stats are the bucket-wise SUM
    of segments, which equals the one-shot corpus aggregation for any
    slicing, so the final scoring pass (weights derived driver-side,
    broadcast, one corpus join) hash-matches n6_dsir_resample's batch
    oracle verbatim.  The 100 TB shape: the importance-weight tables a
    continuous ingest keeps fresh without ever re-reading history — new
    data updates O(buckets) state, re-scoring is a separate batch job on
    whatever snapshot needs it.  Epoch segments fold through a
    SegmentStore every 2 batches with a bucket-wise re-SUM, so live
    state is O(buckets) files-and-rows regardless of uptime (sums are
    additive; the store's skip-on-replayed-compacted-batch rule keeps
    them exactly-once under crash replay)."""
    import os
    import uuid

    from ..streaming import replay
    from ..streaming.segments import SegmentStore
    from .streaming_queries import _CHUNKS, _stream_shuffle_partitions, _work_dir

    wd = _work_dir(sf_dir, "s_dsir")
    run = uuid.uuid4().hex[:8]
    seg_dir = os.path.join(wd, f"segs-{run}")
    ckpt = os.path.join(wd, f"ckpt-{run}")
    store = SegmentStore(
        spark, seg_dir, compact_every=2,
        merge=lambda df: df.groupBy("b").agg(
            F.sum("rc").alias("rc"), F.sum("tc").alias("tc")
        ),
    )

    sdf = replay.replay_table(
        spark, sf_dir, "documents", os.path.join(wd, "src"),
        ts_col="doc_id", chunks=_CHUNKS, order_by=["doc_id"],
    )

    def fold(batch, bid: int) -> None:
        store.append(_dsir_bucket_stats(_dsir_bt(batch)).coalesce(1), bid)

    with _stream_shuffle_partitions(spark):
        replay.run_foreach_batch(sdf, fold, checkpoint_dir=ckpt)

    stats = (
        store.read()
        .groupBy("b")
        .agg(F.sum("rc").alias("rc"), F.sum("tc").alias("tc"))
        .collect()
    )
    d = load_table(spark, sf_dir, "documents")
    return _dsir_rank(_dsir_score_with_stats(_dsir_bt(d), stats))


# --------------------------------------------------------------------------
# N4 — overlapping chunk manifest (the RAG / context-window split)
# --------------------------------------------------------------------------
_CHUNK_W, _CHUNK_S = 64, 48


@register(
    "n4_chunk_manifest",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\\s+'),
                         t -> t <> '') AS tk
      FROM documents
    ), counted AS (
      SELECT doc_id, tk, len(tk) AS n,
             CASE WHEN len(tk) <= {_CHUNK_W} THEN 1
                  ELSE CAST(CEIL((len(tk) - {_CHUNK_W}) / {_CHUNK_S}.0)
                       AS INT) + 1 END AS n_chunks
      FROM toks WHERE len(tk) > 0
    ), ex AS (
      SELECT doc_id, tk, n, UNNEST(range(0, n_chunks)) AS k FROM counted
    )
    SELECT doc_id, CAST(k AS BIGINT) AS chunk_no,
           CAST(LEAST({_CHUNK_W}, n - k * {_CHUNK_S}) AS BIGINT)
             AS n_chunk_tokens,
           md5(array_to_string(
                 list_slice(tk, k * {_CHUNK_S} + 1,
                            k * {_CHUNK_S} + {_CHUNK_W}), ' '))
             AS chunk_hash
    FROM ex
    """,
    survey="N4 R4",
)
def n4_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping chunk manifest — the document split every RAG index
    and context-window packer consumes: 64-token windows at stride 48
    (16-token overlap), each chunk addressed by (doc_id, chunk_no) with
    a content hash for downstream chunk-level dedup and incremental
    re-embedding (only chunks whose hash changed re-embed).

    Pure Catalyst: tokenize once, derive the chunk count per document
    with the same integer/ceil arithmetic on both engines, posexplode
    the chunk indices, slice the token array per chunk — map-only, no
    shuffle at all (the explode is within-partition), which is the
    100 TB shape: chunking is a projection of the corpus scan."""
    from ..operators import text_analysis as ta

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", ta.tokens(F.col("text")).alias("tk")).filter(
        F.size("tk") > 0
    )
    n = F.size("tk")
    n_chunks = F.when(n <= _CHUNK_W, F.lit(1)).otherwise(
        F.ceil((n - _CHUNK_W) / F.lit(float(_CHUNK_S))).cast("int") + 1
    )
    ex = toks.select(
        "doc_id", "tk", n.alias("n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("k"),
    )
    return ex.select(
        "doc_id",
        F.col("k").cast("long").alias("chunk_no"),
        F.least(F.lit(_CHUNK_W), F.col("n") - F.col("k") * _CHUNK_S)
        .cast("long")
        .alias("n_chunk_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.slice(F.col("tk"), F.col("k") * _CHUNK_S + 1, _CHUNK_W),
            )
        ).alias("chunk_hash"),
    )


# --------------------------------------------------------------------------
# N6/N4 — tokenizer-aware packing: pack by REAL trained-BPE counts
# --------------------------------------------------------------------------
_BPE_PACK_BUDGET = 512


def _bpe_packing_oracle(n: int = _BPE_MERGES) -> str:
    return f"""WITH RECURSIVE {_bpe_stages_sql(n)},
    counts AS (
      SELECT t.doc_id,
             CAST(SUM(len(string_split(trim(f.s, '|'), '||'))) AS BIGINT)
               AS n_bpe_tokens
      FROM tok0 t JOIN w{n} f ON f.w = t.w
      GROUP BY t.doc_id
    ), base AS MATERIALIZED (
      SELECT d.doc_id, d.lang, c.n_bpe_tokens,
             ROW_NUMBER() OVER (PARTITION BY d.lang ORDER BY d.doc_id)
               AS idx
      FROM documents d JOIN counts c ON c.doc_id = d.doc_id
      WHERE d.doc_id < 200
    ), p AS (
      SELECT lang, idx, doc_id, n_bpe_tokens, n_bpe_tokens AS run,
             CAST(0 AS BIGINT) AS pack_id
      FROM base WHERE idx = 1
      UNION ALL
      SELECT b.lang, b.idx, b.doc_id, b.n_bpe_tokens,
             CASE WHEN p.run + b.n_bpe_tokens > {_BPE_PACK_BUDGET}
                  THEN b.n_bpe_tokens ELSE p.run + b.n_bpe_tokens END,
             CASE WHEN p.run + b.n_bpe_tokens > {_BPE_PACK_BUDGET}
                  THEN p.pack_id + 1 ELSE p.pack_id END
      FROM p JOIN base b ON b.lang = p.lang AND b.idx = p.idx + 1
    )
    SELECT lang, doc_id, n_bpe_tokens AS n_tokens, pack_id FROM p
    """


@register(
    "n6_bpe_packing",
    oracle=_bpe_packing_oracle(),
    survey="N6 N4",
)
def n6_bpe_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-AWARE sequence packing: documents pack into 512-token
    training sequences by their REAL trained-BPE token counts (the
    n4_bpe_train/encode vocabulary), not a whitespace/regex estimate —
    the number that actually bounds what fits in a context window.
    Composes two certified operators: the BPE encode join supplies
    per-doc counts, the greedy per-language fold packs them (one
    vocabulary broadcast + one corpus pass + one keyed Arrow fold);
    the oracle replays BPE's 8 unrolled merge stages AND the packing
    recursion in one statement."""
    from ..operators import corpus as corpus_ops

    merges, words, tok = _bpe_train_spark(spark, sf_dir)
    n_syms = F.size(F.split(F.expr("trim(BOTH '|' FROM s)"), r"\|\|"))
    vocab = words.select("w", n_syms.alias("n_syms"))
    counts = (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(F.sum("n_syms").cast("long").alias("n_bpe_tokens"))
    )
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    base = d.select("doc_id", "lang").join(counts, "doc_id")
    return corpus_ops.pack_sequences(
        base, group_col="lang", order_col="doc_id", text_col="lang",
        budget=_BPE_PACK_BUDGET, counts_col="n_bpe_tokens",
    )


@register(
    "pipeline_rag_index_end_to_end",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\\s+'),
                         t -> t <> '') AS tk
      FROM documents
    ), counted AS (
      SELECT doc_id, tk, len(tk) AS n,
             CASE WHEN len(tk) <= {_CHUNK_W} THEN 1
                  ELSE CAST(CEIL((len(tk) - {_CHUNK_W}) / {_CHUNK_S}.0)
                       AS INT) + 1 END AS n_chunks
      FROM toks WHERE len(tk) > 0
    ), chunks AS (
      SELECT doc_id, CAST(k AS BIGINT) AS chunk_no,
             md5(array_to_string(
                   list_slice(tk, k * {_CHUNK_S} + 1,
                              k * {_CHUNK_S} + {_CHUNK_W}), ' '))
               AS chunk_hash
      FROM (SELECT doc_id, tk, n, UNNEST(range(0, n_chunks)) AS k
            FROM counted)
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY chunk_hash
                                   ORDER BY doc_id, chunk_no) AS rn
      FROM chunks
    )
    SELECT d.lang,
           CAST(COUNT(DISTINCT c.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN c.rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique_chunks,
           ROUND(1.0 - CAST(SUM(CASE WHEN c.rn = 1 THEN 1 ELSE 0 END)
                            AS DOUBLE) / COUNT(*), 9) AS dup_ratio
    FROM ranked c JOIN documents d ON d.doc_id = c.doc_id
    GROUP BY d.lang
    """,
    survey="N7 N4 N1",
)
def pipeline_rag_index_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth end-to-end pipeline composite — the RAG INDEXING pass:
    (1) overlapping chunk manifest (the certified n4_chunk_manifest
    split), (2) corpus-level chunk dedup by content hash (keep the
    first (doc_id, chunk_no) per hash — what keeps an index from
    embedding the same boilerplate chunk a million times), (3) the
    per-language index report (docs, chunks, unique chunks, duplicate
    ratio) an indexing job emits before the embed stage.  Stage 1 is
    map-only; stage 2 is ONE shuffle keyed on the chunk hash; stage 3
    aggregates the survivors — the whole pipeline touches the corpus
    text exactly once."""
    chunks = n4_chunk_manifest(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_no")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        ranked.join(d, "doc_id")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("rn") == 1).cast("long")).alias("n_unique_chunks"),
            F.round(
                1.0
                - F.sum((F.col("rn") == 1).cast("long"))
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("dup_ratio"),
        )
    )


@register(
    "s_chunk_dedup_stream",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(LOWER(text), '\\s+'),
                         t -> t <> '') AS tk
      FROM documents
    ), counted AS (
      SELECT doc_id, tk, len(tk) AS n,
             CASE WHEN len(tk) <= {_CHUNK_W} THEN 1
                  ELSE CAST(CEIL((len(tk) - {_CHUNK_W}) / {_CHUNK_S}.0)
                       AS INT) + 1 END AS n_chunks
      FROM toks WHERE len(tk) > 0
    ), chunks AS (
      SELECT doc_id, CAST(k AS BIGINT) AS chunk_no,
             md5(array_to_string(
                   list_slice(tk, k * {_CHUNK_S} + 1,
                              k * {_CHUNK_S} + {_CHUNK_W}), ' '))
               AS chunk_hash
      FROM (SELECT doc_id, tk, n, UNNEST(range(0, n_chunks)) AS k
            FROM counted)
    ), firsts AS (
      SELECT chunk_hash,
             MIN(doc_id * 4294967296 + chunk_no) AS first_key
      FROM chunks GROUP BY chunk_hash
    )
    SELECT c.doc_id, c.chunk_no,
           (c.doc_id * 4294967296 + c.chunk_no) > f.first_key AS is_dup,
           CASE WHEN (c.doc_id * 4294967296 + c.chunk_no) > f.first_key
                THEN f.first_key // 4294967296 END AS dup_doc_id,
           CASE WHEN (c.doc_id * 4294967296 + c.chunk_no) > f.first_key
                THEN f.first_key % 4294967296 END AS dup_chunk_no
    FROM chunks c JOIN firsts f ON f.chunk_hash = c.chunk_hash
    """,
    survey="N1-S N4 X2 X4",
    tags=("streaming",),
)
def s_chunk_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING chunk-level dedup at ingest — the online gate of the
    RAG-indexing pipeline (its batch composite is
    pipeline_rag_index_end_to_end): each arriving micro-batch of
    documents chunks map-only (the certified n4_chunk_manifest split),
    probes the accumulated chunk-hash index PLUS its own earlier chunks
    (one join keyed on the hash), and appends its own O(batch) segment
    to the append-only index — overwrite-idempotent per batch id, the
    same X4 crash-replay contract as the MinHash/IVF/CMS ingest tier.

    Verdict per chunk: is_dup and the FIRST (doc_id, chunk_no) carrying
    the same content hash, strict-< on the composite key so replayed
    batches that see their own rows in the index converge.  Drained
    verdicts hash-match the one-shot whole-corpus keep-first replay
    (the oracle).  At 100 TB this is what keeps an embedding job from
    re-encoding boilerplate: only never-seen chunk hashes proceed.

    The index is a SegmentStore (streaming/segments.py): every 2
    batches the seg files fold into one keep-first compact (min ckey
    per chunk_hash), so per-batch listing and probe-read stay bounded
    by the fold interval — and by DISTINCT hashes, not stream length —
    over arbitrary uptime.  Batch-slicing invariance post-compaction
    is pinned by tests/test_r8_ops.py."""
    return _chunk_dedup_run(spark, sf_dir)


def _chunk_dedup_run(
    spark: SparkSession, sf_dir: str, chunks: int | None = None
) -> DataFrame:
    """The streaming chunk-dedup core; ``chunks`` controls the replay
    slicing so tests can pin slicing-invariance of the verdicts."""
    import os
    import uuid

    from ..streaming import replay
    from ..streaming.segments import SegmentStore
    from .streaming_queries import _CHUNKS, _stream_shuffle_partitions, _work_dir

    wd = _work_dir(sf_dir, "s_chunkdedup")
    run = uuid.uuid4().hex[:8]
    seg_dir = os.path.join(wd, f"segs-{run}")
    out_dir = os.path.join(wd, f"out-{run}")
    ckpt = os.path.join(wd, f"ckpt-{run}")
    os.makedirs(out_dir, exist_ok=True)
    store = SegmentStore(
        spark, seg_dir, compact_every=2,
        merge=lambda df: df.groupBy("chunk_hash").agg(
            F.min("ckey").alias("ckey")
        ),
    )

    sdf = replay.replay_table(
        spark, sf_dir, "documents", os.path.join(wd, "src"),
        ts_col="doc_id", chunks=chunks if chunks is not None else _CHUNKS,
        order_by=["doc_id"],
    )
    # 2^32 multiplier: chunk_no derives from an array index, so it is
    # < 2^31 structurally (Spark arrays are int32-indexed) and the
    # composite (doc_id << 32) | chunk_no is collision-free for any
    # doc_id < 2^31 — no aliasing between documents at corpus scale
    key = (F.col("doc_id") * F.lit(4294967296) + F.col("chunk_no")).alias(
        "ckey"
    )

    def chunk_batch(batch) -> DataFrame:
        toks = batch.select(
            "doc_id",
            F.filter(
                F.split(F.lower("text"), r"\s+"), lambda t: t != F.lit("")
            ).alias("tk"),
        ).filter(F.size("tk") > 0)
        n = F.size("tk")
        n_chunks = F.when(n <= _CHUNK_W, F.lit(1)).otherwise(
            F.ceil((n - _CHUNK_W) / F.lit(float(_CHUNK_S))).cast("int") + 1
        )
        ex = toks.select(
            "doc_id", "tk",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("k"),
        )
        return ex.select(
            "doc_id",
            F.col("k").cast("long").alias("chunk_no"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(F.col("tk"), F.col("k") * _CHUNK_S + 1, _CHUNK_W),
                )
            ).alias("chunk_hash"),
        )

    def fold(batch, bid: int) -> None:
        chunks = chunk_batch(batch).select(
            "doc_id", "chunk_no", "chunk_hash", key
        ).localCheckpoint(eager=True)
        earlier = chunks.select("chunk_hash", F.col("ckey").alias("ekey"))
        hist = store.read()
        if hist is not None:
            earlier = earlier.unionByName(
                hist.select("chunk_hash", F.col("ckey").alias("ekey"))
            )
        hits = (
            chunks.join(earlier, "chunk_hash")
            .filter(F.col("ekey") < F.col("ckey"))
            .groupBy("ckey")
            .agg(F.min("ekey").alias("dup_key"))
        )
        verdicts = chunks.join(hits, "ckey", "left").select(
            "doc_id",
            "chunk_no",
            F.col("dup_key").isNotNull().alias("is_dup"),
            # integer div, not float: exact for arbitrarily large keys
            F.expr("dup_key div 4294967296").alias("dup_doc_id"),
            F.when(
                F.col("dup_key").isNotNull(), F.col("dup_key") % 4294967296
            ).cast("long").alias("dup_chunk_no"),
        )
        verdicts.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"out-{bid:04d}")
        )
        store.append(chunks.select("chunk_hash", "ckey"), bid)

    with _stream_shuffle_partitions(spark):
        replay.run_foreach_batch(sdf, fold, checkpoint_dir=ckpt)
    return spark.read.parquet(os.path.join(out_dir, "out-*")).localCheckpoint(
        eager=True
    )


# --------------------------------------------------------------------------
# N3 — IVF-PQ composite: coarse lists + residual PQ + ADC (FAISS IndexIVFPQ)
# --------------------------------------------------------------------------
@register(
    "n3_ivfpq_topk",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), vn AS (
      SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm FROM v
    ), u AS (
      SELECT vec_id, list_transform(e, x -> x / nrm) AS e FROM vn
    ), un AS (
      SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm FROM u
    ), cn AS (
      SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM un WHERE vec_id < 8
    ), assign AS (
      SELECT un.vec_id, un.e, cn.cid, cn.ce,
             ROW_NUMBER() OVER (PARTITION BY un.vec_id
               ORDER BY list_dot_product(un.e, cn.ce) / (un.nrm * cn.cnrm)
                        DESC, cn.cid) AS rk
      FROM un CROSS JOIN cn
    ), corpus_r AS (
      SELECT vec_id AS vid, cid AS list_id,
             list_transform(range(1, 65), j -> e[j] - ce[j]) AS r
      FROM assign WHERE rk = 1
    ), ms AS (SELECT UNNEST(range(0, 4)) AS m),
    cb AS (
      SELECT ms.m, c.vid AS cb_k,
             list_slice(c.r, ms.m*16 + 1, ms.m*16 + 16) AS cw
      FROM corpus_r c, ms WHERE c.vid < 8
    ), sub AS (
      SELECT c.vid, c.list_id, ms.m,
             list_slice(c.r, ms.m*16 + 1, ms.m*16 + 16) AS sv
      FROM corpus_r c, ms
    ), dist AS (
      SELECT s.vid, s.list_id, s.m, cb.cb_k,
             list_sum(list_transform(range(1, 17),
                      j -> (s.sv[j] - cb.cw[j]) * (s.sv[j] - cb.cw[j])))
               AS d2
      FROM sub s JOIN cb ON s.m = cb.m
    ), codes AS (
      SELECT vid AS neighbor_id, list_id, m, cb_k AS code FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vid, m
                                     ORDER BY d2, cb_k) AS rn
        FROM dist
      ) WHERE rn = 1
    ), q_r AS (
      SELECT vec_id AS query_id, cid AS list_id,
             list_transform(range(1, 65), j -> e[j] - ce[j]) AS r
      FROM assign WHERE vec_id < 8 AND rk <= 3
    ), qsub AS (
      SELECT q.query_id, q.list_id, ms.m,
             list_slice(q.r, ms.m*16 + 1, ms.m*16 + 16) AS sv
      FROM q_r q, ms
    ), lut AS (
      SELECT q.query_id, q.list_id, q.m, cb.cb_k AS code,
             list_sum(list_transform(range(1, 17),
                      j -> (q.sv[j] - cb.cw[j]) * (q.sv[j] - cb.cw[j])))
               AS d2
      FROM qsub q JOIN cb ON q.m = cb.m
    ), score AS (
      SELECT l.query_id, c.neighbor_id,
             CAST(SUM(CAST(ROUND(l.d2, 6) AS DECIMAL(27,6))) AS DOUBLE)
               AS ad
      FROM codes c
      JOIN lut l ON l.list_id = c.list_id AND l.m = c.m AND l.code = c.code
      WHERE l.query_id <> c.neighbor_id
      GROUP BY 1, 2
    ), cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY ad, neighbor_id) AS crank
        FROM score
      ) WHERE crank <= 64
    ), rr AS (
      SELECT cand.query_id, cand.neighbor_id,
             ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 9)
               AS cosine_sim
      FROM cand
      JOIN vn a ON a.vec_id = cand.query_id
      JOIN vn b ON b.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id) AS INTEGER)
                  AS rank
      FROM rr
    ) WHERE rank <= 5
    """,
    survey="N3",
    tags=("approx",),
)
def n3_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite ANN (operators/similarity.ivfpq_topk) — the
    FAISS-IndexIVFPQ structure the r7 N3 tier still lacked: the corpus
    is unit-normalized (PQ's L2 surrogate then ranks cosine, the metric
    the exact path uses), bucketed into 8 coarse inverted lists
    (first-8-vectors codebook, like the other N3 oracles), and PQ
    encodes the RESIDUAL v̂ - ĉ(list) into 4 one-byte codes against an
    8-codeword residual codebook; per-(query, probed-list) ADC lookup
    tables fold through DECIMAL(27,6) so the subspace sum is
    order-exact on both engines; the top-64 ADC candidates fetch their
    full vectors for the exact round-9 cosine rerank (the FAISS refine
    step).  Queries probe their 3 nearest lists; candidates surface
    only through the list-aligned code join.  DuckDB replays the entire
    chain — normalize, coarse assign, residuals, codebook, encode
    argmin, LUT, fold, candidate cut, rerank — in one statement.
    Recall vs the exact path is pinned in tests/test_r8_ops.py.  At
    100 TB: list_id is the partition key (probing = partition pruning),
    codes are 4 bytes/vector plus fp rows only the rerank touches, both
    codebooks broadcast; ADC scoring shuffles code rows, never
    embeddings."""
    from ..operators import similarity

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return similarity.ivfpq_topk(e, q, dim=64, k=5)


# --------------------------------------------------------------------------
# N5 — REAL compressed-audio decode: subset-profile FLAC end-to-end
# --------------------------------------------------------------------------
@register(
    "n5_flac_decode_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 60 + 30 AS n
      FROM documents WHERE doc_id < 120
    ), sam AS (
      SELECT doc_id, n, UNNEST(range(0, n)) AS i FROM dims
    ), vals AS (
      SELECT doc_id, n,
             CASE doc_id % 3
               WHEN 0 THEN doc_id % 200 - 100
               WHEN 1 THEN (doc_id + 7*i) % 4001 - 2000
               ELSE (doc_id*53 + i*29) % 4001 - 2000
             END AS s
      FROM sam
    )
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS channels,
           CAST(MAX(n) AS BIGINT) AS n_samples,
           CAST(SUM(s) AS BIGINT) AS sum_amp,
           CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
           CAST(MAX(ABS(s)) AS BIGINT) AS peak
    FROM vals GROUP BY doc_id
    """,
    survey="N5",
)
def n5_flac_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio decode end-to-end (N5) — the FLAC
    counterpart of n5_audio_decode_real's WAV path, narrowing the
    'compressed audio env-gapped' declaration: deterministic per-doc
    waveforms (one class per predictor tier — constant, linear ramp,
    pseudo-noise) are FLAC-ENCODED in one mapInPandas pass
    (operators/flac_codec: rice-coded residuals, best fixed predictor
    by summed |residual|, CRC-8/16 framing) and FLAC-DECODED in a
    second — bit-level frame parse, UTF-8 frame numbers, unary+rice
    residual decode, predictor reconstruction and BOTH CRC checks on
    the hot path — then folded to per-clip features.  The oracle never
    sees a FLAC byte: samples are a closed form of (doc_id, i), so any
    bitstream bug breaks the hash.  Lossless means EXACT equality, not
    tolerance.  Map-only until the per-doc fold; at 100 TB the decode
    hook swaps to libFLAC behind the same signature."""
    import pandas as pd

    from ..operators import multimodal
    from ..operators.flac_codec import encode_flac

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 120)
        .select("doc_id")
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = did % 60 + 30
                cls = did % 3
                if cls == 0:
                    samples = [did % 200 - 100] * n
                elif cls == 1:
                    samples = [(did + 7 * i) % 4001 - 2000
                               for i in range(n)]
                else:
                    samples = [(did * 53 + i * 29) % 4001 - 2000
                               for i in range(n)]
                payloads.append(
                    encode_flac(samples, sample_rate=8000, block_size=64)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads}
            )

    media = d.mapInPandas(encode, "doc_id long, media_bytes binary")

    cols = [
        "doc_id", "sample_rate", "channels", "n_samples",
        "sum_amp", "sum_abs", "peak",
    ]

    def decode(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                rate, ch, samples = multimodal.decode_audio(
                    bytes(rec.media_bytes), "flac"
                )
                rows.append(
                    (
                        int(rec.doc_id), rate, ch, len(samples),
                        sum(samples), sum(abs(s) for s in samples),
                        max(abs(s) for s in samples),
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        decode,
        "doc_id long, sample_rate int, channels int, n_samples long, "
        "sum_amp long, sum_abs long, peak long",
    )


# --------------------------------------------------------------------------
# N4 — WordPiece greedy longest-match-first encode (BERT tokenizer family)
# --------------------------------------------------------------------------
@register(
    "n4_wordpiece_encode",
    oracle=r"""
    WITH RECURSIVE tok AS (
      SELECT UNNEST(list_filter(string_split_regex(LOWER(text), '\s+'),
                    t -> t <> '')) AS w
      FROM documents WHERE doc_id < 200
    ), words AS MATERIALIZED (
      SELECT w, COUNT(*) AS freq, LEN(w) AS wl FROM tok GROUP BY 1
    ), startc AS (
      SELECT piece, SUM(freq) AS cnt FROM (
        SELECT substr(w, 1, L) AS piece, freq
        FROM words, (SELECT UNNEST(range(1, 5)) AS L)
        WHERE wl >= L
      ) GROUP BY 1
    ), starts AS (
      SELECT piece FROM startc ORDER BY cnt DESC, piece LIMIT 200
    ), wpos AS (
      SELECT w, freq, wl, UNNEST(range(1, wl)) AS p FROM words
    ), contc AS (
      SELECT piece, SUM(freq) AS cnt FROM (
        SELECT substr(w, p + 1, L) AS piece, freq
        FROM wpos, (SELECT UNNEST(range(1, 5)) AS L)
        WHERE p + L <= wl
      ) GROUP BY 1
    ), conts AS (
      SELECT piece FROM contc ORDER BY cnt DESC, piece LIMIT 200
    ), vocab AS MATERIALIZED (
      SELECT piece, true AS is_start FROM starts
      UNION ALL SELECT piece, false FROM conts
    ), seg AS (
      SELECT w, freq, wl, 0 AS pos,
             CAST([] AS VARCHAR[]) AS toks, false AS failed
      FROM words
      UNION ALL
      SELECT w, freq, wl,
             CASE WHEN best IS NULL THEN wl ELSE pos + LEN(best) END,
             CASE WHEN best IS NULL THEN ['[UNK]']
                  ELSE toks || [CASE WHEN pos = 0 THEN best
                                ELSE '##' || best END] END,
             best IS NULL
      FROM (
        SELECT s.w, s.freq, s.wl, s.pos, s.toks,
               COALESCE(v4.piece, v3.piece, v2.piece, v1.piece) AS best
        FROM seg s
        LEFT JOIN vocab v4 ON s.pos + 4 <= s.wl
          AND v4.piece = substr(s.w, s.pos + 1, 4)
          AND v4.is_start = (s.pos = 0)
        LEFT JOIN vocab v3 ON s.pos + 3 <= s.wl
          AND v3.piece = substr(s.w, s.pos + 1, 3)
          AND v3.is_start = (s.pos = 0)
        LEFT JOIN vocab v2 ON s.pos + 2 <= s.wl
          AND v2.piece = substr(s.w, s.pos + 1, 2)
          AND v2.is_start = (s.pos = 0)
        LEFT JOIN vocab v1 ON s.pos + 1 <= s.wl
          AND v1.piece = substr(s.w, s.pos + 1, 1)
          AND v1.is_start = (s.pos = 0)
        WHERE s.pos < s.wl AND NOT s.failed
      )
    )
    SELECT token, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
      SELECT UNNEST(toks) AS token, freq FROM seg WHERE pos >= wl
    ) GROUP BY token
    """,
    survey="N4",
)
def n4_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece greedy longest-match-first encode (the BERT tokenizer;
    Wu et al. 2016 §4.1) — the third member of the tokenizer family
    next to the trained BPE pair: a data-derived vocabulary (top-200
    word-initial pieces + top-200 '##' continuation pieces of length
    ≤ 4, frequency-ranked with lexicographic tie-break) segments every
    corpus word by repeatedly taking the LONGEST matching piece; a word
    with no match at any position collapses to [UNK] whole — the real
    WordPiece failure mode, exercised by rare characters falling
    outside the top-K vocabulary.

    Scale shape mirrors n4_bpe_encode: ONE corpus pass builds the
    word-frequency table, piece counting is vocabulary-sized, the
    ≤ 401-entry vocab is bounded metadata (collected + closure-
    broadcast), and the encode itself is map-only over distinct words.
    DuckDB replays the segmentation as a recursive CTE whose step
    LEFT-JOINs the vocab at lengths 4..1 and COALESCEs — the same
    longest-match the Python loop takes, so the token histogram
    hash-matches exactly."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok = (
        d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    words = tok.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    words = words.withColumn("wl", F.length("w"))

    lens = F.array(*[F.lit(i) for i in (1, 2, 3, 4)])
    starts = (
        words.select(F.explode(lens).alias("L"), "w", "freq", "wl")
        .filter(F.col("wl") >= F.col("L"))
        .select(F.expr("substring(w, 1, L)").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(200)
    )
    conts = (
        # wl >= 2 guard: Spark's sequence(1, 0) is DESCENDING [1, 0], so
        # single-char words would sneak a p=0 row past the p+L filter
        # and count their first char as a continuation piece — a vocab
        # the DuckDB range(1, wl) replay (empty for wl=1) never builds
        words.filter(F.col("wl") >= 2)
        .select(
            "w", "freq", "wl",
            F.explode(F.expr("sequence(1, wl - 1)")).alias("p"),
        )
        .select("w", "freq", "wl", "p", F.explode(lens).alias("L"))
        .filter(F.col("p") + F.col("L") <= F.col("wl"))
        .select(F.expr("substring(w, p + 1, L)").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "piece")
        .limit(200)
    )
    # vocabulary-sized metadata: <= 401 entries, the one legitimate
    # collect (same contract as the BPE merge-rule broadcast)
    svoc = {r.piece for r in starts.collect()}
    cvoc = {r.piece for r in conts.collect()}

    def segment(batches):
        from ..operators.corpus import wordpiece_segment

        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                toks = wordpiece_segment(str(rec.w), svoc, cvoc)
                out.extend((t, int(rec.freq)) for t in toks)
            yield pd.DataFrame(out, columns=["token", "freq"])

    pieces = words.select("w", "freq").mapInPandas(
        segment, "token string, freq long"
    )
    return pieces.groupBy("token").agg(F.sum("freq").alias("cnt"))


# --------------------------------------------------------------------------
# N5 — REAL progressive (spectral-selection) JPEG decode
# --------------------------------------------------------------------------
@register(
    "n5_jpeg_progressive_decode",
    oracle="""
    WITH dims AS (
      SELECT doc_id, (doc_id % 5 + 1) * 8 AS w, (doc_id % 4 + 1) * 8 AS h
      FROM documents WHERE doc_id < 120
    ), px AS (
      SELECT doc_id, w, h, UNNEST(range(0, w*h)) AS i FROM dims
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM((doc_id*41 + ((i // w) // 8)*23 + ((i % w) // 8)*13)
                    % 256) AS BIGINT) AS sum_lum,
           CAST(SUM((i + 1) * ((doc_id*41 + ((i // w) // 8)*23
                               + ((i % w) // 8)*13) % 256))
                AS BIGINT) AS wsum
    FROM px GROUP BY doc_id
    """,
    survey="N5",
)
def n5_jpeg_progressive_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive (spectral-selection) JPEG decode end-to-end —
    the multi-scan half of the r7-declared JPEG gap: per-doc grayscale
    images are encoded as SOF2 streams (operators/jpeg_codec.
    encode_jpeg_gray_progressive: a DC scan then AC band scans 1-5 and
    6-63, cross-block EOB runs batched into EOBn codes against a
    stream-written progressive AC table — the Annex-K baseline table
    has no EOBn symbols) and decoded by the dedicated multi-scan path:
    coefficients accumulate across scans, general EOBRUN, per-scan
    Huffman tables, dequant + IDCT once at EOI.

    Same DC-exact certification as the baseline twin: constant blocks
    put everything in the DC scan, so DuckDB recomputes every decoded
    pixel in closed form; the AC-band + EOBRUN paths (unreachable by a
    closed-form oracle — cosines) are pinned in tests against a numpy
    IDCT reference with long cross-block EOB runs.  Both passes
    map-only; successive approximation (Ah/Al) and color progressive
    remain declared env gaps."""
    import pandas as pd

    from ..operators import multimodal
    from ..operators.jpeg_codec import (
        constant_block_coeffs,
        encode_jpeg_gray_progressive,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 120)
        .select("doc_id")
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                bw, bh = did % 5 + 1, did % 4 + 1
                blocks = [
                    constant_block_coeffs(
                        (did * 41 + by * 23 + bx * 13) % 256
                    )
                    for by in range(bh)
                    for bx in range(bw)
                ]
                payloads.append(
                    encode_jpeg_gray_progressive(blocks, bw, bh)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads}
            )

    media = d.mapInPandas(encode, "doc_id long, media_bytes binary")

    cols = ["doc_id", "width", "height", "n_px", "sum_lum", "wsum"]

    def decode(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                w, h, rgb = multimodal.decode_image(
                    bytes(rec.media_bytes), "jpeg"
                )
                lum = rgb[0::3]
                s = ws = 0
                for i, v in enumerate(lum):
                    s += v
                    ws += (i + 1) * v
                rows.append((int(rec.doc_id), w, h, w * h, s, ws))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        decode,
        "doc_id long, width int, height int, n_px long, "
        "sum_lum long, wsum long",
    )
