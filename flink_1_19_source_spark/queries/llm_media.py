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
    from ..operators.jpeg_encode import constant_block_coeffs, encode_jpeg_gray

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
    from ..operators.jpeg_encode import (constant_block_coeffs, encode_jpeg_color_420)

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
    from ..operators.jpeg_encode import (constant_block_coeffs, encode_jpeg_gray_progressive)

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
    from ..operators.jpeg_encode import constant_block_coeffs, encode_jpeg_gray

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
    from ..operators.jpeg_encode import (constant_block_coeffs, encode_jpeg_gray_progressive_sa)

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
    from ..operators.jpeg_encode import (constant_block_coeffs, encode_jpeg_color_progressive_420)

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


