"""N5 — codec QUALITY metrics (PSNR / SSIM) for the lossy write paths.

The encode tier certifies that bytes round-trip; this module certifies
HOW MUCH the two genuinely lossy in-engine paths distort, as data — the
quality-report pattern the ANN tier already applies to recall:

- **n5_gif_quality_report**: the 3-3-2 uniform palette quantization
  behind the GIF write path, measured per image with global SSIM (Wang
  et al. 2004, single-window form over an integer luma proxy) and PSNR
  — pixels taken ONLY from the real encode_gif/decode_gif round trip.
- **n5_adpcm_quality_report**: the new IMA ADPCM ENCODE path
  (operators/adpcm_codec.encode_adpcm_pcm — the lossy compressed-audio
  WRITE path), measured per clip with PSNR over the full-scale int16
  range — samples taken ONLY from the encoder's own WAV bytes.

Numeric contract: every moment (sums, squared sums, cross sums, SSE)
is exact int64 computed from round-tripped integer samples; PSNR and
SSIM are then ONE shared expression TEXT evaluated by both engines
(Spark F.expr and DuckDB verbatim — CAST-to-double of exact ints,
fixed-order products, one division, ROUND(…, 9); LOG10+ROUND(9) is the
certified f_math_family precedent).  The oracle never sees a GIF or
WAV byte: palette quantization is closed-form (GIF over indices is
lossless, certified by n5_gif_thumbnail_pipeline_real), and the ADPCM
encoder+expander is a pure-integer state machine the oracle replays
sample-by-sample with a recursive CTE over the step/index tables.

Scale shape: both queries are map-only over the media corpus (one clip
or image per Arrow row), the 100 TB shape of any quality-audit pass.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.adpcm_codec import INDEX_TABLE, STEP_TABLE
from ..registry import register
from ..tables import load_table

#: single-window SSIM from exact integer moments — ONE text, evaluated
#: by Spark (F.expr) and DuckDB verbatim so the op chain cannot drift.
#: K1=0.01, K2=0.03, L=255 -> C1=6.5025, C2=58.5225 (Wang et al. 2004).
_SSIM_EXPR = (
    "ROUND(((CAST(2*sx*sy AS DOUBLE)"
    " + 6.5025 * CAST(n_px*n_px AS DOUBLE))"
    " * (CAST(2*(n_px*sxy - sx*sy) AS DOUBLE)"
    " + 58.5225 * CAST(n_px*n_px AS DOUBLE)))"
    " / ((CAST(sx*sx + sy*sy AS DOUBLE)"
    " + 6.5025 * CAST(n_px*n_px AS DOUBLE))"
    " * (CAST((n_px*sxx - sx*sx) + (n_px*syy - sy*sy) AS DOUBLE)"
    " + 58.5225 * CAST(n_px*n_px AS DOUBLE))), 9)"
)


def _psnr_expr(n_col: str, sse_col: str, peak_sq: str) -> str:
    """PSNR dB from exact integer (count, SSE) — shared text for both
    engines; NULL when the path happens to be lossless on an item."""
    return (
        f"CASE WHEN {sse_col} = 0 THEN NULL ELSE"
        f" ROUND(10.0 * LOG10(CAST({n_col} AS DOUBLE) * {peak_sq}"
        f" / CAST({sse_col} AS DOUBLE)), 9) END"
    )


# --------------------------------------------------------------------------
# GIF palette quantization: SSIM + PSNR per image
# --------------------------------------------------------------------------
_GIF_Q_ORACLE = f"""
    WITH dims AS (
      SELECT doc_id, 16 + doc_id % 9 AS w, 12 + doc_id % 5 AS h
      FROM documents WHERE doc_id < 150
    ), px AS (
      SELECT doc_id, w, h, UNNEST(range(0, w*h)) AS i FROM dims
    ), rgb AS (
      SELECT doc_id, i,
             (doc_id*3 + (i % w)*5 + (i // w)*11) % 256 AS r,
             (doc_id*7 + (i % w)*13 + (i // w)*3) % 256 AS g,
             (doc_id*11 + (i % w)*2 + (i // w)*7) % 256 AS b
      FROM px
    ), lum AS (
      SELECT doc_id,
             (2*r + 5*g + b) // 8 AS lx,
             (2*((r // 32) * 32) + 5*((g // 32) * 32)
              + ((b // 64) * 64)) // 8 AS ly
      FROM rgb
    ), mom AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_px,
             CAST(SUM((lx - ly)*(lx - ly)) AS BIGINT) AS sse,
             CAST(MAX(ABS(lx - ly)) AS BIGINT) AS max_abs_err,
             CAST(SUM(lx) AS BIGINT) AS sx,
             CAST(SUM(ly) AS BIGINT) AS sy,
             CAST(SUM(lx*lx) AS BIGINT) AS sxx,
             CAST(SUM(ly*ly) AS BIGINT) AS syy,
             CAST(SUM(lx*ly) AS BIGINT) AS sxy
      FROM lum GROUP BY doc_id
    )
    SELECT doc_id, n_px, sse, max_abs_err,
           {_psnr_expr('n_px', 'sse', '65025.0')} AS psnr_db,
           {_SSIM_EXPR} AS ssim
    FROM mom
    """


@register(
    "n5_gif_quality_report",
    oracle=_GIF_Q_ORACLE,
    survey="N5",
)
def n5_gif_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image QUALITY report for the palette-quantized GIF write
    path — the r10/r11 verdicts' carried stretch item: closed-form RGB
    frames → 3-3-2 uniform quantization → REAL GIF ENCODE (LZW,
    interlace on odd docs) → GIF DECODE of the encoder's own bytes →
    exact integer luma moments (proxy L = (2r+5g+b)//8) of source vs
    round-trip → PSNR dB and single-window SSIM.  Quantization is the
    only lossy stage (GIF over indices is lossless — certified by
    n5_gif_thumbnail_pipeline_real), so the oracle replays it in closed
    form and evaluates the IDENTICAL metric expression text; a decoder
    bug surfaces as a hash break, a quantizer regression as a visible
    quality drop.  Map-only at any corpus size."""
    from ..operators.gif_codec import decode_gif, encode_gif

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id")
    )
    pal332 = [
        (((k >> 5) & 7) * 32, ((k >> 2) & 7) * 32, (k & 3) * 64)
        for k in range(256)
    ]
    cols = ["doc_id", "n_px", "sse", "max_abs_err",
            "sx", "sy", "sxx", "syy", "sxy"]

    def pipeline(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 16 + did % 9, 12 + did % 5
                src = []
                idx = []
                for i in range(w * h):
                    x, y = i % w, i // w
                    r = (did*3 + x*5 + y*11) % 256
                    g = (did*7 + x*13 + y*3) % 256
                    b = (did*11 + x*2 + y*7) % 256
                    src.append((r, g, b))
                    idx.append(((r >> 5) << 5) | ((g >> 5) << 2)
                               | (b >> 6))
                # quality measured ONLY against the real write path's
                # own bytes
                ow, oh, rgb = decode_gif(
                    encode_gif(idx, w, h, pal332,
                               interlace=did % 2 == 1)
                )
                n = ow * oh
                sse = me = sx = sy = sxx = syy = sxy = 0
                for i in range(n):
                    r, g, b = src[i]
                    lx = (2*r + 5*g + b) // 8
                    ly = (2*rgb[3*i] + 5*rgb[3*i+1] + rgb[3*i+2]) // 8
                    e = lx - ly
                    sse += e * e
                    me = max(me, abs(e))
                    sx += lx
                    sy += ly
                    sxx += lx * lx
                    syy += ly * ly
                    sxy += lx * ly
                rows.append((did, n, sse, me, sx, sy, sxx, syy, sxy))
            yield pd.DataFrame(rows, columns=cols)

    mom = d.mapInPandas(
        pipeline,
        "doc_id long, n_px long, sse long, max_abs_err long, "
        "sx long, sy long, sxx long, syy long, sxy long",
    )
    return mom.select(
        "doc_id", "n_px", "sse", "max_abs_err",
        F.expr(_psnr_expr("n_px", "sse", "65025.0")).alias("psnr_db"),
        F.expr(_SSIM_EXPR).alias("ssim"),
    )


# --------------------------------------------------------------------------
# JPEG transform coding: SSIM + PSNR per image (closed-form DC replay)
# --------------------------------------------------------------------------
# Constant 8x8 blocks make the float64 FDCT exactly DC-only (DC = 8c,
# c = v - 128; every AC term is symmetric-cancellation float dust far
# below half a quantizer step), and q = 24 keeps round-half-away
# boundaries unreachable (|c|/3 + 1/2 is an integer iff 2|c|+3 = 0
# mod 6 — impossible), so the whole lossy roundtrip collapses to the
# integer closed form  recon = clamp(3*round(c/3) + 128, 0, 255)
# with round(c/3) = sign(c) * ((2|c|+3) // 6).
_JPEG_Q = 24


def _jpeg_recon_sql() -> str:
    """Closed-form reconstruction of one constant block's roundtrip
    pixel under the all-24 quant table (see the module constant)."""
    return (
        "LEAST(255, GREATEST(0,"
        " 3 * (CASE WHEN v >= 128 THEN (2*(v - 128) + 3) // 6"
        " ELSE -((2*(128 - v) + 3) // 6) END) + 128))"
    )


_JPEG_Q_ORACLE = f"""
    WITH dims AS (
      SELECT doc_id, 2 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh
      FROM documents WHERE doc_id < 150
    ), blk AS (
      SELECT doc_id, bw, UNNEST(range(0, bw*bh)) AS bi FROM dims
    ), val AS (
      SELECT doc_id,
             (doc_id*7 + (bi % bw)*31 + (bi // bw)*59) % 256 AS v
      FROM blk
    ), rec AS (
      SELECT doc_id, v, {_jpeg_recon_sql()} AS r FROM val
    ), mom AS (
      SELECT doc_id,
             CAST(64 * COUNT(*) AS BIGINT) AS n_px,
             CAST(64 * SUM((v - r)*(v - r)) AS BIGINT) AS sse,
             CAST(MAX(ABS(v - r)) AS BIGINT) AS max_abs_err,
             CAST(64 * SUM(v) AS BIGINT) AS sx,
             CAST(64 * SUM(r) AS BIGINT) AS sy,
             CAST(64 * SUM(v*v) AS BIGINT) AS sxx,
             CAST(64 * SUM(r*r) AS BIGINT) AS syy,
             CAST(64 * SUM(v*r) AS BIGINT) AS sxy
      FROM rec GROUP BY doc_id
    )
    SELECT doc_id, n_px, sse, max_abs_err,
           {_psnr_expr('n_px', 'sse', '65025.0')} AS psnr_db,
           {_SSIM_EXPR} AS ssim
    FROM mom
    """


@register(
    "n5_jpeg_quality_report",
    oracle=_JPEG_Q_ORACLE,
    survey="N5",
)
def n5_jpeg_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image QUALITY report for the JPEG TRANSFORM-CODING write
    path (encode_jpeg_gray_pixels: level shift → float64 FDCT →
    quantization → zigzag → Huffman; DRI/RSTm on odd docs) — the last
    lossy in-engine write path without a quality column.  Images are
    built from CONSTANT 8x8 blocks under an all-24 quant table,
    the regime where the float transform is provably integer-exact
    (module comment: AC terms are cancellation dust ≪ q/2, the DC
    rounding boundary is unreachable), so the oracle replays the ENTIRE
    encode→decode roundtrip in closed integer form — recon =
    clamp(3·round(c/3)+128) — without seeing a JPEG byte, while the
    engine measures the REAL encoder's own bytes through the REAL
    decoder.  Any drift in the DCT basis, quantizer rounding rule,
    Huffman path or restart handling breaks the hash; the quantization
    loss itself lands in psnr_db/ssim.  Map-only at any corpus size."""
    from ..operators.jpeg_codec import decode_jpeg_gray
    from ..operators.jpeg_encode import encode_jpeg_gray_pixels

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id")
    )
    cols = ["doc_id", "n_px", "sse", "max_abs_err",
            "sx", "sy", "sxx", "syy", "sxy"]
    qtab = [_JPEG_Q] * 64

    def pipeline(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                bw, bh = 2 + did % 3, 1 + did % 2
                w, h = 8 * bw, 8 * bh
                px = [0] * (w * h)
                for bi in range(bw * bh):
                    v = (did*7 + (bi % bw)*31 + (bi // bw)*59) % 256
                    bx, by = bi % bw, bi // bw
                    for yy in range(8):
                        base = (by*8 + yy) * w + bx*8
                        px[base:base + 8] = [v] * 8
                # quality measured ONLY against the real write path's
                # own bytes, through the real decoder
                ow, oh, out = decode_jpeg_gray(
                    encode_jpeg_gray_pixels(
                        px, w, h, qtable_raster=qtab,
                        restart_interval=2 if did % 2 else 0,
                    )
                )
                assert (ow, oh) == (w, h)
                n = w * h
                sse = me = sx = sy = sxx = syy = sxy = 0
                for i in range(n):
                    lx, ly = px[i], out[i]
                    e = lx - ly
                    sse += e * e
                    me = max(me, abs(e))
                    sx += lx
                    sy += ly
                    sxx += lx * lx
                    syy += ly * ly
                    sxy += lx * ly
                rows.append((did, n, sse, me, sx, sy, sxx, syy, sxy))
            yield pd.DataFrame(rows, columns=cols)

    mom = d.mapInPandas(
        pipeline,
        "doc_id long, n_px long, sse long, max_abs_err long, "
        "sx long, sy long, sxx long, syy long, sxy long",
    )
    return mom.select(
        "doc_id", "n_px", "sse", "max_abs_err",
        F.expr(_psnr_expr("n_px", "sse", "65025.0")).alias("psnr_db"),
        F.expr(_SSIM_EXPR).alias("ssim"),
    )


# --------------------------------------------------------------------------
# IMA ADPCM encode: PSNR per clip (recursive-CTE encoder replay)
# --------------------------------------------------------------------------
def _adpcm_step_sql() -> str:
    """One encoder+expander step as nested SELECTs — the exact integer
    state machine of encode_nibble/expand_nibble, with the step/index
    tables embedded from the codec module (single source of truth).
    Block starts ((i+1) % 65 == 0) take the source sample as the new
    header predictor (lossless) with the step index carried over."""
    st = "[" + ", ".join(str(v) for v in STEP_TABLE) + "]"
    ix = "[" + ", ".join(str(v) for v in INDEX_TABLE) + "]"
    return f"""
      SELECT doc_id, n, amp, i, s,
             CASE WHEN i % 65 = 0 THEN s
                  ELSE LEAST(32767, GREATEST(-32768,
                       pred + CASE WHEN sgn = 8 THEN -diff
                                   ELSE diff END)) END AS pred,
             CASE WHEN i % 65 = 0 THEN idx
                  ELSE LEAST(88, GREATEST(0,
                       idx + ({ix})[(sgn + 4*b4 + 2*b2 + b1) % 8 + 1]))
                  END AS idx
      FROM (
        SELECT *, step // 8 + b1*(step // 4) + b2*(step // 2)
                  + b4*step AS diff
        FROM (
          SELECT *,
                 CASE WHEN r4 >= step // 2 THEN 1 ELSE 0 END AS b2,
                 CASE WHEN r4 - (CASE WHEN r4 >= step // 2 THEN 1
                                      ELSE 0 END) * (step // 2)
                      >= step // 4 THEN 1 ELSE 0 END AS b1
          FROM (
            SELECT *, ad - b4*step AS r4
            FROM (
              SELECT *,
                     CASE WHEN ad >= step THEN 1 ELSE 0 END AS b4
              FROM (
                SELECT w.doc_id, w.n, w.amp, w.i + 1 AS i, w.pred,
                       w.idx,
                       ((w.doc_id*41 + (w.i + 1)*17) % 4001 - 2000)
                         * w.amp AS s,
                       ({st})[w.idx + 1] AS step,
                       CASE WHEN ((w.doc_id*41 + (w.i + 1)*17) % 4001
                                  - 2000) * w.amp - w.pred < 0
                            THEN 8 ELSE 0 END AS sgn,
                       ABS(((w.doc_id*41 + (w.i + 1)*17) % 4001
                            - 2000) * w.amp - w.pred) AS ad
                FROM walk w WHERE w.i + 1 < w.n
              )
            )
          )
        )
      )"""


_ADPCM_Q_ORACLE = f"""
    WITH RECURSIVE dims AS (
      SELECT doc_id, 65 * (1 + doc_id % 2) AS n, 2 + doc_id % 5 AS amp
      FROM documents WHERE doc_id < 150
    ), walk AS (
      SELECT doc_id, n, amp, 0 AS i,
             CAST(((doc_id*41) % 4001 - 2000) * amp AS BIGINT) AS s,
             CAST(((doc_id*41) % 4001 - 2000) * amp AS BIGINT) AS pred,
             CAST(0 AS BIGINT) AS idx
      FROM dims
      UNION ALL
      SELECT doc_id, n, amp, i, s, pred, idx FROM ({_adpcm_step_sql()})
    ), errs AS (
      SELECT doc_id, n, s - pred AS err FROM walk
    )
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS n_samples,
           CAST(SUM(err*err) AS BIGINT) AS sse,
           CAST(MAX(ABS(err)) AS BIGINT) AS max_abs_err,
           {_psnr_expr('CAST(MAX(n) AS BIGINT)',
                       'CAST(SUM(err*err) AS BIGINT)',
                       '1073741824.0')} AS psnr_db
    FROM errs GROUP BY doc_id
    """


@register(
    "n5_adpcm_quality_report",
    oracle=_ADPCM_Q_ORACLE,
    survey="N5",
)
def n5_adpcm_quality_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-clip QUALITY report for the NEW IMA ADPCM ENCODE path — the
    first lossy compressed-audio WRITE path (the decode side has been
    certified since the ADPCM decoder landed; encode_adpcm_pcm now
    completes the pair): closed-form PCM-16 clips (1 or 2 blocks,
    doc-varied amplitude) → **ADPCM ENCODE** (4-bit successive
    approximation per sample, shared state with the expander) → ADPCM
    DECODE of the encoder's own WAV bytes → exact integer SSE /
    max-error and PSNR over the full int16 range.  The oracle replays
    the encoder+expander state machine sample-by-sample with a
    recursive CTE over the embedded 89-entry step table — any
    quantization, clamping, index-adaptation or block-header bug in
    the WRITE path breaks the hash.  Map-only at any corpus size."""
    from ..operators.adpcm_codec import (
        decode_adpcm_wav, encode_adpcm_pcm,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id")
    )
    cols = ["doc_id", "n_samples", "sse", "max_abs_err"]

    def pipeline(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 65 * (1 + did % 2)
                amp = 2 + did % 5
                src = [
                    ((did*41 + i*17) % 4001 - 2000) * amp
                    for i in range(n)
                ]
                # quality measured ONLY against the write path's own
                # bytes
                _rate, _ch, rt = decode_adpcm_wav(
                    encode_adpcm_pcm(src)
                )
                assert len(rt) == n
                sse = sum((a - b) ** 2 for a, b in zip(src, rt))
                me = max(abs(a - b) for a, b in zip(src, rt))
                rows.append((did, n, sse, me))
            yield pd.DataFrame(rows, columns=cols)

    mom = d.mapInPandas(
        pipeline,
        "doc_id long, n_samples long, sse long, max_abs_err long",
    )
    return mom.select(
        "doc_id", "n_samples", "sse", "max_abs_err",
        F.expr(
            _psnr_expr("n_samples", "sse", "1073741824.0")
        ).alias("psnr_db"),
    )
