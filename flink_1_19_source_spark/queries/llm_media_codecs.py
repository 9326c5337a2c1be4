"""N5 real codecs beyond the JPEG family (SURVEY §2.11 N5).

Split out of queries/llm_media.py (the ~900-line house bound): the
subset-profile FLAC decoder (rice residuals, fixed predictors,
CRC-8/16), GIF89a (variable-width LZW, interlace), WebP-lossless VP8L
(prefix codes, LZ77 + 2D distance map, subtract-green) and IMA ADPCM
(the first lossy tier, step/index tables replayed by a recursive-CTE
oracle).  Each decode is map-only mapInPandas, oracled end-to-end
against closed-form generators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


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
# N5 — REAL GIF decode (variable-width LZW + interlace, exact-pixel oracle)
# --------------------------------------------------------------------------
@register(
    "n5_gif_decode_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             10 + doc_id % 13 AS w,
             8 + doc_id % 7 AS h
      FROM documents WHERE doc_id < 150
    ), px AS (
      SELECT doc_id, w, h, UNNEST(range(0, w*h)) AS i FROM dims
    ), pal AS (
      SELECT doc_id, w, h, i,
             (doc_id*31 + i*7) % 64 AS k
      FROM px
    ), rgb AS (
      SELECT doc_id, w, h, i,
             (k*3 + doc_id) % 256 AS r,
             (k*5 + 2*doc_id) % 256 AS g,
             (k*7 + 3*doc_id) % 256 AS b
      FROM pal
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
def n5_gif_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF89a decode end-to-end — the third real image codec after
    PNG and JPEG: per-doc 64-color palette images (half of them
    INTERLACED — the Appendix-E four-pass row scramble) are LZW-encoded
    into genuine GIF bytes in one mapInPandas pass and decoded in a
    second (operators/gif_codec: variable-width codes 7→12 bits,
    dictionary rebuild on CLEAR, the KwKwK self-reference, local/global
    color tables, de-interlace).

    GIF is LOSSLESS, so no certifiability trick is needed: the oracle
    recomputes every pixel in closed form from (doc_id, pixel index) —
    DuckDB never sees a GIF byte, yet every channel sum and the
    position-weighted fold must match bit-exactly, which fails if ANY
    code width, table rebuild or interlace pass is wrong.  Both passes
    are map-only; the only shuffle is the final per-doc agg.  (Python
    LZW is the correctness reference; the 100 TB swap is a native
    library behind the same decode_image hook.)"""
    import pandas as pd

    from ..operators import multimodal
    from ..operators.gif_codec import encode_gif

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id")
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 10 + did % 13, 8 + did % 7
                pal = [
                    ((k*3 + did) % 256, (k*5 + 2*did) % 256,
                     (k*7 + 3*did) % 256)
                    for k in range(64)
                ]
                idx = [(did*31 + i*7) % 64 for i in range(w*h)]
                payloads.append(
                    encode_gif(idx, w, h, pal, interlace=did % 2 == 1)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads}
            )

    media = d.mapInPandas(encode, "doc_id long, media_bytes binary")
    cols = ["doc_id", "width", "height", "n_px",
            "sum_r", "sum_g", "sum_b", "wsum"]

    def decode(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h, rgb = multimodal.decode_image(
                    bytes(r.media_bytes), "gif"
                )
                sr = sg = sb = ws = 0
                for i in range(w * h):
                    rr, gg, bb = rgb[3*i], rgb[3*i+1], rgb[3*i+2]
                    sr += rr
                    sg += gg
                    sb += bb
                    ws += (i + 1) * (rr + 2*gg + 3*bb)
                rows.append((int(r.doc_id), w, h, w * h, sr, sg, sb, ws))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        decode,
        "doc_id long, width int, height int, n_px long, "
        "sum_r long, sum_g long, sum_b long, wsum long",
    )



# --------------------------------------------------------------------------
# N5 — REAL IMA ADPCM decode (lossy compressed audio, expander replayed
# table-by-table in SQL)
# --------------------------------------------------------------------------
@register(
    "n5_adpcm_decode_real",
    oracle="""
    WITH RECURSIVE blocks AS (
      SELECT doc_id, b AS blk,
             (doc_id*131 + b*57) % 4096 - 2048 AS pred0,
             (doc_id + b*5) % 89 AS idx0
      FROM (SELECT doc_id FROM documents WHERE doc_id < 120),
           (SELECT UNNEST([0, 1]) AS b)
    ), dec AS (
      SELECT doc_id, blk, -1 AS j,
             CAST(pred0 AS BIGINT) AS pred, CAST(idx0 AS BIGINT) AS idx
      FROM blocks
      UNION ALL
      SELECT doc_id, blk, j + 1,
             LEAST(32767, GREATEST(-32768,
               CASE WHEN nib >= 8 THEN pred - diff
                    ELSE pred + diff END)),
             LEAST(88, GREATEST(0,
               idx + ([-1,-1,-1,-1,2,4,6,8])[(nib % 8) + 1]))
      FROM (
        SELECT doc_id, blk, j, pred, idx, nib,
               (step // 8)
               + CASE WHEN nib % 2 = 1 THEN step // 4 ELSE 0 END
               + CASE WHEN (nib // 2) % 2 = 1 THEN step // 2 ELSE 0 END
               + CASE WHEN (nib // 4) % 2 = 1 THEN step ELSE 0 END AS diff
        FROM (
          SELECT doc_id, blk, j, pred, idx,
                 (doc_id*7 + blk*11 + (j + 1)*3) % 16 AS nib,
                 ([7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,
                   41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,
                   190,209,230,253,279,307,337,371,408,449,494,544,598,
                   658,724,796,876,963,1060,1166,1282,1411,1552,1707,
                   1878,2066,2272,2499,2749,3024,3327,3660,4026,4428,
                   4871,5358,5894,6484,7132,7845,8630,9493,10442,11487,
                   12635,13899,15289,16818,18500,20350,22385,24623,27086,
                   29794,32767])[idx + 1] AS step
          FROM dec WHERE j < 63
        )
      )
    )
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS channels,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(pred) AS BIGINT) AS sum_amp,
           CAST(SUM(ABS(pred)) AS BIGINT) AS sum_abs,
           CAST(MAX(ABS(pred)) AS BIGINT) AS peak,
           CAST(SUM((blk*65 + j + 2) * pred) AS BIGINT) AS wsum
    FROM dec GROUP BY doc_id
    """,
    survey="N5",
)
def n5_adpcm_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy compressed-audio decode — IMA ADPCM (WAV format tag
    0x0011), the first LOSSY codec certified end-to-end: per-doc
    two-block clips are built as genuine IMA ADPCM WAV bytes in one
    mapInPandas pass and decoded in a second (operators/adpcm_codec:
    89-entry step table, index adaptation, int16 clamping, block-header
    sample emission).

    Lossy codecs normally defeat value-hash oracles (the quantizer's
    rounding lives outside SQL) — here the trick is to certify the
    DECODER, the production-relevant direction: the block nibbles are a
    closed form of (doc_id, block, position), so the DuckDB oracle
    replays the expander itself — step/index tables as literal arrays
    inside a recursive CTE, 64 lock-step iterations across every
    (doc, block) — and every decoded sample must match bit-exactly.
    Both passes map-only; the only shuffle is the final per-doc agg."""
    import pandas as pd

    from ..operators import multimodal
    from ..operators.adpcm_codec import encode_adpcm_wav

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
                blocks = []
                for blk in range(2):
                    pred0 = (did*131 + blk*57) % 4096 - 2048
                    idx0 = (did + blk*5) % 89
                    nibs = [
                        (did*7 + blk*11 + j*3) % 16 for j in range(64)
                    ]
                    blocks.append((pred0, idx0, nibs))
                payloads.append(encode_adpcm_wav(blocks))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads}
            )

    media = d.mapInPandas(encode, "doc_id long, media_bytes binary")
    cols = ["doc_id", "sample_rate", "channels", "n_samples",
            "sum_amp", "sum_abs", "peak", "wsum"]

    def decode(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rate, ch, samples = multimodal.decode_audio(
                    bytes(r.media_bytes), "adpcm"
                )
                s = sa = pk = ws = 0
                for pos, v in enumerate(samples):
                    s += v
                    sa += abs(v)
                    pk = max(pk, abs(v))
                    ws += (pos + 1) * v
                rows.append(
                    (int(r.doc_id), rate, ch, len(samples), s, sa, pk, ws)
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        decode,
        "doc_id long, sample_rate int, channels int, n_samples long, "
        "sum_amp long, sum_abs long, peak long, wsum long",
    )



# --------------------------------------------------------------------------
# N5 — REAL WebP lossless decode (VP8L subset profile, exact-pixel oracle)
# --------------------------------------------------------------------------
@register(
    "n5_webp_decode_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             12 + doc_id % 17 AS w,
             9 + doc_id % 11 AS h
      FROM documents WHERE doc_id < 140
    ), px AS (
      SELECT doc_id, w, h, UNNEST(range(0, w*h)) AS i FROM dims
    ), rgb AS (
      -- banded pattern: runs inside rows (LZ77 1D refs) + repeated rows
      -- (2D neighborhood distance refs), plus a doc-keyed noise stripe
      SELECT doc_id, w, h, i,
             CASE WHEN (i // w) % 4 = 3
                  THEN (doc_id*41 + i*13) % 256
                  ELSE ((i % w) // 4 * 53 + doc_id) % 256 END AS r,
             CASE WHEN (i // w) % 4 = 3
                  THEN (doc_id*17 + i*7) % 256
                  ELSE ((i % w) // 4 * 29 + 2*doc_id) % 256 END AS g,
             CASE WHEN (i // w) % 4 = 3
                  THEN (doc_id*29 + i*3) % 256
                  ELSE ((i % w) // 4 * 11 + 3*doc_id) % 256 END AS b
      FROM px
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
def n5_webp_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WebP LOSSLESS decode end-to-end — the fourth real image
    codec, retiring the 'WebP env-gapped' declaration for the lossless
    half of the format: per-doc banded images (in-row runs exercise 1D
    LZ77 back-references, repeated rows the 120-entry 2D neighborhood
    distance map, a noise stripe the literal path) are encoded as
    genuine VP8L bitstreams in one mapInPandas pass
    (operators/webp_codec: canonical prefix codes via the DEFLATE-style
    code-length code with 3-bit-capped CL depths, greedy LZ77,
    SUBTRACT-GREEN transform on odd docs) and decoded in a second.

    Lossless like PNG/GIF, so the oracle recomputes every pixel in
    closed form — a wrong prefix-code rebuild, distance mapping or
    transform inverse breaks the channel sums.  Lossy (VP8) WebP stays
    env-gapped.  Both passes map-only; only the per-doc agg shuffles."""
    import pandas as pd

    from ..operators import multimodal
    from ..operators.webp_codec import encode_webp_lossless

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 140)
        .select("doc_id")
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 12 + did % 17, 9 + did % 11
                px = bytearray()
                for i in range(w * h):
                    if (i // w) % 4 == 3:
                        px += bytes([
                            (did*41 + i*13) % 256,
                            (did*17 + i*7) % 256,
                            (did*29 + i*3) % 256,
                        ])
                    else:
                        band = (i % w) // 4
                        px += bytes([
                            (band*53 + did) % 256,
                            (band*29 + 2*did) % 256,
                            (band*11 + 3*did) % 256,
                        ])
                payloads.append(encode_webp_lossless(
                    bytes(px), w, h, subtract_green=did % 2 == 1
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
                    bytes(rec.media_bytes), "webp"
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
