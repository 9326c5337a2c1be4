"""N5-tier real-codec media queries (SURVEY §2.11): baseline grayscale
JPEG, interleaved-MCU color JPEG (4:2:0/4:2:2/4:4:4), progressive
(spectral-selection) JPEG, and subset-profile FLAC — all decoded by the
pure-stdlib codecs in operators/ and oracled end-to-end against
closed-form pixel/sample generators.  Split out of llm3.py (r8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..registry import register
from ..tables import load_table


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


# --------------------------------------------------------------------------
# N5 — baseline JPEG with RESTART MARKERS (DRI / RSTm, T.81 E.2.4)
# --------------------------------------------------------------------------
@register(
    "n5_jpeg_restart",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             (doc_id % 5 + 2) * 8 AS w,
             (doc_id % 3 + 2) * 8 AS h
      FROM documents WHERE doc_id < 96
    ), px AS (
      SELECT doc_id, w, h, UNNEST(range(0, w*h)) AS i FROM dims
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(MAX(doc_id % 3 + 1) AS INTEGER) AS restart_interval,
           CAST(SUM((doc_id*41 + ((i // w) // 8)*23 + ((i % w) // 8)*13)
                    % 256) AS BIGINT) AS sum_lum,
           CAST(SUM((i + 1) * ((doc_id*41 + ((i // w) // 8)*23
                               + ((i % w) // 8)*13) % 256))
                AS BIGINT) AS wsum
    FROM px GROUP BY doc_id
    """,
    survey="N5",
)
def n5_jpeg_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG decode across RESTART MARKERS (T.81 E.2.4) — the
    last sequential-JPEG syntax the decoder lacked, and the one real
    crawl images use most (cameras emit DRI so a bit error loses one
    interval, not the image).  Per doc: a (doc_id%5+2) x (doc_id%3+2)
    block grayscale image is encoded with DRI = doc_id%3+1 MCUs
    (always < the block count, so every file restarts at least once), so
    every file contains RSTm markers with m cycling 0-7, padding bits
    before each, and a DC-predictor reset after — the decoder
    sequence-checks every marker (an out-of-order RSTm raises, pinned
    in tests/test_r8_ops.py) and restarts DC prediction.  Encode and
    decode are each one map-only mapInPandas pass; the only shuffle is
    the driver comparator's own sort.  Certifiability: constant 8x8
    blocks under a unit quantizer decode bit-exactly, so the oracle
    recomputes every pixel in closed form from (doc_id, block position)
    without seeing a JPEG byte."""
    import pandas as pd

    from ..operators import multimodal
    from ..operators.jpeg_codec import constant_block_coeffs, encode_jpeg_gray

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 96)
        .select("doc_id")
    )

    def encode(batches):
        for pdf in batches:
            payloads, rin = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                bw, bh = did % 5 + 2, did % 3 + 2
                ri = did % 3 + 1
                blocks = [
                    constant_block_coeffs(
                        (did * 41 + by * 23 + bx * 13) % 256
                    )
                    for by in range(bh)
                    for bx in range(bw)
                ]
                data = encode_jpeg_gray(blocks, bw, bh, restart_interval=ri)
                assert b"\xff\xdd" in data and b"\xff\xd0" in data
                payloads.append(data)
                rin.append(ri)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads,
                 "restart_interval": rin}
            )

    media = d.mapInPandas(
        encode, "doc_id long, media_bytes binary, restart_interval int"
    )

    cols = ["doc_id", "width", "height", "restart_interval",
            "sum_lum", "wsum"]

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
                rows.append((int(r.doc_id), w, h,
                             int(r.restart_interval), s, ws))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        decode,
        "doc_id long, width int, height int, restart_interval int, "
        "sum_lum long, wsum long",
    )


# --------------------------------------------------------------------------
# N5 — REAL pipeline stages over decoded media: resize / frame-sample /
# audio feature-extract (the stages that were digest-stubs before the
# real codecs landed)
# --------------------------------------------------------------------------
@register(
    "n5_image_resize_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id, (doc_id % 4 + 1) * 8 AS w, (doc_id % 3 + 1) * 8 AS h
      FROM documents WHERE doc_id < 120
    ), opx AS (
      SELECT doc_id, w, h, UNNEST(range(0, 192)) AS o FROM dims
    ), mapped AS (
      SELECT doc_id, o,
             ((o % 16) * w // 16) AS sx, ((o // 16) * h // 12) AS sy,
             w, h
      FROM opx
    )
    SELECT doc_id,
           CAST(16 AS INTEGER) AS out_w, CAST(12 AS INTEGER) AS out_h,
           CAST(SUM((doc_id*37 + (sy // 8)*19 + (sx // 8)*11) % 256)
                AS BIGINT) AS sum_lum,
           CAST(SUM((o + 1) * ((doc_id*37 + (sy // 8)*19 + (sx // 8)*11)
                               % 256)) AS BIGINT) AS wsum
    FROM mapped GROUP BY doc_id
    """,
    survey="N5",
)
def n5_image_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize (N5) — the stage that was a digest-stub before
    the codecs landed: per doc, a baseline JPEG is decoded (real T.81
    path) and nearest-neighbor resampled to a fixed 16x12 thumbnail —
    out[y][x] = in[y*h//12][x*w//16], the exact integer mapping PIL's
    NEAREST uses — all inside one mapInPandas pass (decode + resample
    per Arrow batch, no shuffle).  The oracle replays the coordinate
    arithmetic and the constant-block pixel formula; a resampler that
    rounds instead of floors, or transposes axes, breaks the hash."""
    import pandas as pd

    import numpy as np

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
                    constant_block_coeffs((did * 37 + by * 19 + bx * 11) % 256)
                    for by in range(bh)
                    for bx in range(bw)
                ]
                payloads.append(encode_jpeg_gray(blocks, bw, bh))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads}
            )

    media = d.mapInPandas(encode, "doc_id long, media_bytes binary")
    ow, oh = 16, 12
    cols = ["doc_id", "out_w", "out_h", "sum_lum", "wsum"]

    def resize(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h, rgb = multimodal.decode_image(
                    bytes(r.media_bytes), "jpeg"
                )
                lum = np.frombuffer(rgb, np.uint8)[0::3].reshape(h, w)
                sy = (np.arange(oh) * h) // oh
                sx = (np.arange(ow) * w) // ow
                thumb = lum[np.ix_(sy, sx)].astype(np.int64)
                flat = thumb.reshape(-1)
                ws = int(((np.arange(flat.size) + 1) * flat).sum())
                rows.append((int(r.doc_id), ow, oh, int(flat.sum()), ws))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        resize, "doc_id long, out_w int, out_h int, sum_lum long, wsum long"
    )


@register(
    "n5_video_frame_sample_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 9 + 4 AS w, doc_id % 5 + 3 AS h,
             doc_id % 4 + 2 AS nf
      FROM documents WHERE doc_id < 120
    ), fr AS (
      SELECT doc_id, w, h, UNNEST(range(0, nf)) AS f FROM dims
    ), keep AS (
      SELECT * FROM fr WHERE f % 2 = 0
    ), px AS (
      SELECT doc_id, w, h, f, UNNEST(range(0, w * h)) AS i FROM keep
    )
    SELECT doc_id, CAST(f AS INTEGER) AS frame_no,
           CAST(f * 40 AS INTEGER) AS frame_ts_ms,
           CAST(SUM((doc_id*31 + f*11 + (i // w)*17 + (i % w)*7) % 256)
                AS BIGINT) AS sum_r
    FROM px GROUP BY doc_id, f
    """,
    survey="N5",
)
def n5_video_frame_sample_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling (N5): decode the AVI container (RIFF
    walk, DIB un-flip + BGR swap on the hot path), keep every 2nd frame
    with its timestamp (25 fps → 40 ms/frame), and fold each SAMPLED
    frame to its red-channel sum — one output row per kept frame, the
    1→N fan-out happening inside the Arrow batch, no shuffle and no
    driver involvement.  Oracle replays the closed-form frame pixels
    for even frame numbers only; sampling the wrong parity or
    timestamping by frame index instead of 1000*f//fps breaks it."""
    import pandas as pd

    from ..operators import multimodal
    from ..operators.avi_codec import encode_avi

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
                w, h, nf = did % 9 + 4, did % 5 + 3, did % 4 + 2
                frames = []
                for f in range(nf):
                    px = bytearray()
                    for i in range(w * h):
                        base = did * 31 + f * 11 + (i // w) * 17 + (i % w) * 7
                        px += bytes(((base + c * 5) % 256) for c in range(3))
                    frames.append(bytes(px))
                payloads.append(encode_avi(frames, w, h))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads}
            )

    media = d.mapInPandas(encode, "doc_id long, media_bytes binary")
    cols = ["doc_id", "frame_no", "frame_ts_ms", "sum_r"]

    def sample(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h, fps, frames = multimodal.decode_video(
                    bytes(r.media_bytes), "avi"
                )
                for f in range(0, len(frames), 2):
                    pix = frames[f]
                    sr = sum(pix[3 * i] for i in range(w * h))
                    rows.append(
                        (int(r.doc_id), f, 1000 * f // fps, sr)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        sample,
        "doc_id long, frame_no int, frame_ts_ms int, sum_r long",
    )


@register(
    "n5_audio_features_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 50 + 20 AS n
      FROM documents WHERE doc_id < 150
    ), sam AS (
      SELECT doc_id, n, UNNEST(range(0, n)) AS i FROM dims
    ), vals AS (
      SELECT doc_id, i, i // 16 AS frame_no,
             (doc_id*37 + i*13) % 4001 - 2000 AS s,
             CASE WHEN i % 16 = 0 THEN NULL
                  ELSE (doc_id*37 + (i-1)*13) % 4001 - 2000 END AS prev_s
      FROM sam
    )
    SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no,
           CAST(COUNT(*) AS BIGINT) AS n_in_frame,
           CAST(SUM(s * s) AS BIGINT) AS sum_sq,
           CAST(COUNT(*) FILTER (WHERE prev_s IS NOT NULL
                                   AND prev_s * s < 0) AS BIGINT)
             AS zero_crossings
    FROM vals GROUP BY doc_id, frame_no
    """,
    survey="N5",
)
def n5_audio_features_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio feature extraction (N5): decode PCM-16 WAV (RIFF walk
    on the hot path), frame into 16-sample windows, and emit per-frame
    energy (sum of squares — integer-exact, no float RMS) and in-frame
    zero-crossing counts — the two features every VAD / silence-trim
    stage starts from.  One row per (clip, frame), fan-out inside the
    Arrow batch.  The oracle replays the closed-form waveform; a
    framing off-by-one or a crossing counted across a frame boundary
    breaks the hash."""
    import pandas as pd

    from ..operators import multimodal
    from ..operators.wav_codec import encode_wav

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
                n = did % 50 + 20
                samples = [(did * 37 + i * 13) % 4001 - 2000 for i in range(n)]
                payloads.append(encode_wav(samples, sample_rate=8000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads}
            )

    media = d.mapInPandas(encode, "doc_id long, media_bytes binary")
    cols = ["doc_id", "frame_no", "n_in_frame", "sum_sq", "zero_crossings"]

    def features(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                _, _, samples = multimodal.decode_audio(
                    bytes(r.media_bytes), "wav"
                )
                for f0 in range(0, len(samples), 16):
                    fr = samples[f0:f0 + 16]
                    zc = sum(
                        1 for a, b in zip(fr, fr[1:]) if a * b < 0
                    )
                    rows.append(
                        (int(r.doc_id), f0 // 16, len(fr),
                         sum(s * s for s in fr), zc)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        features,
        "doc_id long, frame_no int, n_in_frame long, sum_sq long, "
        "zero_crossings long",
    )


@register(
    "n5_jpeg_sa_decode",
    oracle="""
    WITH dims AS (
      SELECT doc_id, (doc_id % 5 + 1) * 8 AS w, (doc_id % 4 + 1) * 8 AS h
      FROM documents WHERE doc_id < 96
    ), px AS (
      SELECT doc_id, w, h, UNNEST(range(0, w*h)) AS i FROM dims
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(SUM((doc_id*43 + ((i // w) // 8)*29 + ((i % w) // 8)*13)
                    % 256) AS BIGINT) AS sum_lum,
           CAST(SUM((i + 1) * ((doc_id*43 + ((i // w) // 8)*29
                               + ((i % w) // 8)*13) % 256))
                AS BIGINT) AS wsum
    FROM px GROUP BY doc_id
    """,
    survey="N5",
)
def n5_jpeg_sa_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive JPEG with SUCCESSIVE APPROXIMATION (T.81 G.1.2) —
    closing the last grayscale-JPEG gap: per doc, a six-scan SA ladder
    (DC first at Al=2, two one-bit DC refinements, the 1..63 AC band at
    Al=2, two AC refinements whose (r,1) symbols mark newly-significant
    ±2^Al coefficients while correction bits — read inline during ZRL
    spans, placement walks and batched-EOBn tails — refine nonzero
    history) is encoded and decoded end-to-end in two map-only
    mapInPandas passes.  Refinements complete, so the final image is
    bit-exact and the oracle recomputes every pixel in closed form; the
    defining SA property — a TRUNCATED stream decodes to the
    point-transformed approximation — plus AC-path exactness on random
    coefficient spectra are fuzz-pinned in tests/test_r8_ops.py."""
    import pandas as pd

    from ..operators import multimodal
    from ..operators.jpeg_codec import (
        constant_block_coeffs,
        encode_jpeg_gray_progressive_sa,
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
                bw, bh = did % 5 + 1, did % 4 + 1
                blocks = [
                    constant_block_coeffs((did * 43 + by * 29 + bx * 13) % 256)
                    for by in range(bh)
                    for bx in range(bw)
                ]
                payloads.append(
                    encode_jpeg_gray_progressive_sa(blocks, bw, bh, al=2)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads}
            )

    media = d.mapInPandas(encode, "doc_id long, media_bytes binary")
    cols = ["doc_id", "width", "height", "sum_lum", "wsum"]

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
                rows.append((int(r.doc_id), w, h, s, ws))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        decode,
        "doc_id long, width int, height int, sum_lum long, wsum long",
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
# N5 — REAL COLOR PROGRESSIVE JPEG decode (the last JPEG mode tier)
# --------------------------------------------------------------------------
@register(
    "n5_jpeg_color_progressive_decode",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             doc_id % 3 + 1 AS mw,
             16*(doc_id % 3 + 1) - (doc_id % 7) AS w,
             16*(doc_id % 2 + 1) - (doc_id % 5) AS h
      FROM documents WHERE doc_id < 90
    ), px AS (
      SELECT doc_id, mw, w, h, UNNEST(range(0, w*h)) AS i FROM dims
    ), ycc AS (
      SELECT doc_id, w, h, i,
             (doc_id*41 + (((i // w) // 16)*mw + (i % w) // 16)*31
              + ((((i // w) % 16) // 8)*2 + ((i % w) % 16) // 8)*13)
               % 256 AS yv,
             (doc_id*13 + (((i // w) // 16)*mw + (i % w) // 16)*7 + 50)
               % 256 AS cbv,
             (doc_id*29 + (((i // w) // 16)*mw + (i % w) // 16)*9 + 80)
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
def n5_jpeg_color_progressive_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL COLOR PROGRESSIVE JPEG decode end-to-end — the last JPEG
    mode tier (grayscale baseline → color baseline → grayscale
    progressive → successive approximation → COLOR progressive): an
    SOF2 frame whose first scan carries all three components' DC
    coefficients INTERLEAVED in MCU order (per-component DPCM) and
    whose AC band scans run per component over each component's OWN
    ceil-sized block grid — the non-interleaved raster inside the
    MCU-padded coefficient plane, which is exactly where non-16-aligned
    dimensions bite (operators/jpeg_codec.encode_jpeg_color_progressive
    _420 / _decode_progressive).

    Certifiability as in the color baseline tier: constant 8x8 blocks
    keep the coefficient path bit-exact, the YCbCr->RGB convert is
    exact int64, so DuckDB recomputes every decoded pixel from
    (doc_id, position) closed-form.  The AC path (nonzero bands,
    EOBRUN across each component's raster) is pinned by the
    progressive-equals-baseline decode-equivalence fuzz in
    tests/test_r8_tail.py.  Both passes map-only; only the per-doc agg
    shuffles."""
    import pandas as pd

    from ..operators import multimodal
    from ..operators.jpeg_codec import (
        constant_block_coeffs,
        encode_jpeg_color_progressive_420,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 90)
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
                                (did * 41 + m * 31 + q * 13) % 256))
                        cbb.append(constant_block_coeffs(
                            (did * 13 + m * 7 + 50) % 256))
                        crb.append(constant_block_coeffs(
                            (did * 29 + m * 9 + 80) % 256))
                payloads.append(encode_jpeg_color_progressive_420(
                    yb, cbb, crb, mw_, mh_,
                    width=16 * mw_ - did % 7,
                    height=16 * mh_ - did % 5,
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
