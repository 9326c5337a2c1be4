"""N5 — encode-side media stages (the write path of a media corpus).

Round 9 certified the first ENCODE stage (PNG, in the thumbnail
pipeline); this module extends the write-path tier to AUDIO: a full
decode → process → WAV ENCODE → decode round trip, hash-certified.
PCM is lossless, so every checksum is computed from the ROUND-TRIPPED
bytes — any RIFF framing, chunk-length, alignment, or byte-order bug in
the in-engine encoder surfaces as a hash mismatch against the oracle's
closed-form replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


@register(
    "n5_audio_downsample_pipeline_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 60 + 32 AS n
      FROM documents WHERE doc_id < 150
    ), sam AS (
      SELECT doc_id, UNNEST(range(0, n)) AS i FROM dims
    ), kept AS (
      SELECT doc_id, i,
             ((doc_id*41 + i*17) % 4001 - 2000) * 2 AS s,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS j
      FROM sam WHERE i % 2 = 0
    )
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_out,
           CAST(SUM(s) AS BIGINT) AS sum_s,
           CAST(SUM(s * s) AS BIGINT) AS sum_sq,
           CAST(MIN(s) AS BIGINT) AS min_s,
           CAST(MAX(s) AS BIGINT) AS max_s,
           CAST(SUM((j + 1) * s) AS BIGINT) AS pos_weighted
    FROM kept GROUP BY doc_id
    """,
    survey="N5",
)
def n5_audio_downsample_pipeline_real(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Audio ARCHIVAL pipeline with a certified WAV ENCODE stage:
    PCM-16 WAV decode (real RIFF walk) → 2:1 integer decimation + x2
    gain (the exact-integer reference for a decimation stage; a
    production resampler adds a low-pass, which is float DSP and out of
    the exact-oracle tier by design) → **WAV ENCODE** (in-engine RIFF
    write at the halved rate) → WAV DECODE of the encoder's own bytes →
    per-clip checksums (count, sum, energy, min/max, position-weighted
    sum) and the round-tripped sample_rate, all computed AFTER the
    round trip.  One mapInPandas pass, fan-out inside the Arrow batch,
    no shuffle — the write path of a media corpus build is map-only at
    any scale.  Oracle replays the closed-form waveform through the
    same decimation/gain; PCM losslessness makes the encoder the only
    thing that can break the hash."""
    import pandas as pd

    from ..operators import multimodal
    from ..operators.wav_codec import decode_wav, encode_wav

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id")
    )

    def encode_src(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = did % 60 + 32
                samples = [
                    (did * 41 + i * 17) % 4001 - 2000 for i in range(n)
                ]
                payloads.append(encode_wav(samples, sample_rate=16000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads}
            )

    media = d.mapInPandas(encode_src, "doc_id long, media_bytes binary")
    cols = [
        "doc_id", "sample_rate", "n_out", "sum_s", "sum_sq",
        "min_s", "max_s", "pos_weighted",
    ]

    def pipeline(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rate, ch, samples = multimodal.decode_audio(
                    bytes(r.media_bytes), "wav"
                )
                assert ch == 1 and rate == 16000
                processed = [s * 2 for s in samples[::2]]
                # the certified write path: encode, then trust ONLY the
                # bytes we just wrote
                out_rate, out_ch, rt = decode_wav(
                    encode_wav(processed, sample_rate=rate // 2)
                )
                assert out_ch == 1
                rows.append((
                    int(r.doc_id), out_rate, len(rt), sum(rt),
                    sum(s * s for s in rt), min(rt), max(rt),
                    sum((j + 1) * s for j, s in enumerate(rt)),
                ))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        pipeline,
        "doc_id long, sample_rate int, n_out long, sum_s long, "
        "sum_sq long, min_s long, max_s long, pos_weighted long",
    )


# --------------------------------------------------------------------------
# N5 — FLAC ENCODE: the compressed-audio WRITE path, hash-certified
# --------------------------------------------------------------------------
@register(
    "n5_flac_archive_pipeline_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 200 + 60 AS n
      FROM documents WHERE doc_id < 120
    ), sam AS (
      SELECT doc_id, UNNEST(range(0, n)) AS i FROM dims
    ), src AS (
      SELECT doc_id, i,
             CASE doc_id % 3
               WHEN 0 THEN doc_id % 400 - 200
               WHEN 1 THEN (doc_id*41 + i*13) % 60001 - 30000
               ELSE (doc_id*53 + i*i*17) % 60001 - 30000
             END AS s
      FROM sam
    ), gained AS (
      SELECT doc_id, i, s * 3 AS g,
             LEAST(32767, GREATEST(-32768, s * 3)) AS o
      FROM src
    )
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_out,
           CAST(SUM(CASE WHEN g > 32767 OR g < -32768
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           CAST(SUM(o) AS BIGINT) AS sum_s,
           CAST(SUM(o * o) AS BIGINT) AS sum_sq,
           CAST(MIN(o) AS BIGINT) AS min_s,
           CAST(MAX(o) AS BIGINT) AS max_s,
           CAST(SUM((i + 1) * o) AS BIGINT) AS pos_weighted
    FROM gained GROUP BY doc_id
    """,
    survey="N5",
)
def n5_flac_archive_pipeline_real(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Audio archival pipeline with a certified **FLAC ENCODE** stage —
    the first COMPRESSED write path (PNG/WAV were raw-payload writes;
    here the encoder itself does predictor selection + rice coding):
    PCM-16 WAV decode → saturating 3x gain (int16 clamp — the exact-
    integer reference for a normalize/limiter stage; the clip COUNT is
    a certified output so the rail events themselves are oracle-checked)
    → **FLAC ENCODE** (operators/flac_codec: best fixed predictor 0-4,
    one rice partition, CRC-8/16 framing, block_size=64 so every clip
    spans multiple frames) → FLAC DECODE of the encoder's own bytes →
    per-clip checksums computed ONLY from the round-tripped samples.
    The three waveform classes steer the encoder through its subframe
    tiers (constant → CONSTANT, clamped ramp → order-1 runs at the
    rails, quadratic → order-2 predictor).  FLAC is lossless, so any
    rice-parameter, zigzag, warmup, UTF-8 frame-number or CRC bug in
    the WRITE path breaks the hash against an oracle that never sees a
    FLAC byte.  Map-only; compression non-vacuity (encoded bytes well
    under 16-bit PCM) is test-pinned, not assumed."""
    import pandas as pd

    from ..operators.flac_codec import decode_flac, encode_flac
    from ..operators.wav_codec import decode_wav, encode_wav

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 120)
        .select("doc_id")
    )

    def encode_src(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = did % 200 + 60
                if did % 3 == 0:
                    samples = [did % 400 - 200] * n
                elif did % 3 == 1:
                    samples = [
                        (did*41 + i*13) % 60001 - 30000 for i in range(n)
                    ]
                else:
                    samples = [
                        (did*53 + i*i*17) % 60001 - 30000 for i in range(n)
                    ]
                payloads.append(encode_wav(samples, sample_rate=8000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads}
            )

    media = d.mapInPandas(encode_src, "doc_id long, media_bytes binary")
    cols = [
        "doc_id", "sample_rate", "n_out", "n_clipped", "sum_s",
        "sum_sq", "min_s", "max_s", "pos_weighted",
    ]

    def pipeline(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rate, ch, samples = decode_wav(bytes(r.media_bytes))
                assert ch == 1 and rate == 8000
                gained = [s * 3 for s in samples]
                clipped = sum(
                    1 for g in gained if g > 32767 or g < -32768
                )
                processed = [
                    min(32767, max(-32768, g)) for g in gained
                ]
                # the certified write path: every checksum below comes
                # from bytes the in-engine FLAC ENCODER produced
                out_rate, out_ch, rt = decode_flac(
                    encode_flac(processed, sample_rate=rate,
                                block_size=64)
                )
                assert out_ch == 1
                rows.append((
                    int(r.doc_id), out_rate, len(rt), clipped, sum(rt),
                    sum(s * s for s in rt), min(rt), max(rt),
                    sum((j + 1) * s for j, s in enumerate(rt)),
                ))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        pipeline,
        "doc_id long, sample_rate int, n_out long, n_clipped long, "
        "sum_s long, sum_sq long, min_s long, max_s long, "
        "pos_weighted long",
    )


# --------------------------------------------------------------------------
# N5 — GIF ENCODE behind a palette-quantization stage (image WRITE path #2)
# --------------------------------------------------------------------------
@register(
    "n5_gif_thumbnail_pipeline_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 16 + doc_id % 9 AS w, 12 + doc_id % 5 AS h
      FROM documents WHERE doc_id < 150
    ), px AS (
      SELECT doc_id, w, h, UNNEST(range(0, w*h)) AS i FROM dims
    ), rgb AS (
      SELECT doc_id, w, h, i,
             (doc_id*3 + (i % w)*5 + (i // w)*11) % 256 AS r,
             (doc_id*7 + (i % w)*13 + (i // w)*3) % 256 AS g,
             (doc_id*11 + (i % w)*2 + (i // w)*7) % 256 AS b
      FROM px
    ), quant AS (
      SELECT doc_id, w, h, i,
             (r // 32) * 32 AS rq,
             (g // 32) * 32 AS gq,
             (b // 64) * 64 AS bq
      FROM rgb
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM(rq) AS BIGINT) AS sum_r,
           CAST(SUM(gq) AS BIGINT) AS sum_g,
           CAST(SUM(bq) AS BIGINT) AS sum_b,
           CAST(SUM((i + 1) * (rq + 2*gq + 3*bq)) AS BIGINT) AS wsum
    FROM quant GROUP BY doc_id
    """,
    survey="N5",
)
def n5_gif_thumbnail_pipeline_real(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image archival pipeline with a certified **GIF ENCODE** stage —
    the first compressed IMAGE write path (the PNG stage wrote raw
    filtered scanlines through stdlib zlib; here the engine's own
    variable-width LZW compressor emits the bitstream): full-color RGB
    frames → **uniform 3-3-2 palette quantization** (r,g to 8 levels,
    b to 4 — the classic 256-entry uniform cube; index = high bits,
    SQL-expressible as integer floor-division) → **GIF ENCODE** over
    the quantized indices (operators/gif_codec: 9→12-bit code growth,
    CLEAR at 4096, sub-block framing; half the docs INTERLACED through
    the Appendix-E four-pass write) → GIF DECODE of the encoder's own
    bytes → per-image channel sums and the position-weighted fold,
    computed ONLY from round-tripped pixels.  Quantization is lossy but
    exact-deterministic; GIF over the indices is lossless — so the
    oracle replays quantization in closed form and any LZW code-width,
    dictionary-growth or interlace bug in the WRITE path breaks the
    hash.  Map-only at any corpus size; LZW-beats-raw is test-pinned."""
    import pandas as pd

    from ..operators.gif_codec import decode_gif, encode_gif

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id")
    )

    # the 256-entry uniform 3-3-2 cube is the same for every image
    pal332 = [
        (((k >> 5) & 7) * 32, ((k >> 2) & 7) * 32, (k & 3) * 64)
        for k in range(256)
    ]
    cols = ["doc_id", "width", "height", "n_px",
            "sum_r", "sum_g", "sum_b", "wsum"]

    def pipeline(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 16 + did % 9, 12 + did % 5
                # source RGB frame (closed form; stands in for a decode)
                idx = []
                for i in range(w * h):
                    x, y = i % w, i // w
                    r = (did*3 + x*5 + y*11) % 256
                    g = (did*7 + x*13 + y*3) % 256
                    b = (did*11 + x*2 + y*7) % 256
                    # 3-3-2 uniform quantization -> palette index
                    idx.append(((r >> 5) << 5) | ((g >> 5) << 2)
                               | (b >> 6))
                # the certified write path: encode, then trust ONLY the
                # bytes the in-engine LZW compressor produced
                ow, oh, rgb = decode_gif(
                    encode_gif(idx, w, h, pal332,
                               interlace=did % 2 == 1)
                )
                sr = sg = sb = ws = 0
                for i in range(ow * oh):
                    rr, gg, bb = rgb[3*i], rgb[3*i+1], rgb[3*i+2]
                    sr += rr
                    sg += gg
                    sb += bb
                    ws += (i + 1) * (rr + 2*gg + 3*bb)
                rows.append((did, ow, oh, ow * oh, sr, sg, sb, ws))
            yield pd.DataFrame(rows, columns=cols)

    return d.mapInPandas(
        pipeline,
        "doc_id long, width int, height int, n_px long, "
        "sum_r long, sum_g long, sum_b long, wsum long",
    )


# --------------------------------------------------------------------------
# N5 — JPEG ENCODE: the transform-coded image WRITE path, hash-certified
# --------------------------------------------------------------------------
@register(
    "n5_jpeg_archive_pipeline_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 8*(3 + doc_id % 3) AS w, 8*(2 + doc_id % 2) AS h
      FROM documents WHERE doc_id < 150
    ), px AS (
      SELECT doc_id, w, h, UNNEST(range(0, w*h)) AS i FROM dims
    ), v AS (
      SELECT doc_id, w, h, i,
             128 + 2*((doc_id*7 + ((i % w) // 8)*3
                       + ((i // w) // 8)*5) % 90 - 45) AS s
      FROM px
    ), g AS (
      SELECT doc_id, w, h, i, 2*(s - 128) + 128 AS gv FROM v
    ), o AS (
      SELECT doc_id, w, h, i, gv,
             LEAST(186, GREATEST(68, gv)) AS ov
      FROM g
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM(CASE WHEN gv > 186 OR gv < 68
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           CAST(SUM(ov) AS BIGINT) AS sum_px,
           CAST(MIN(ov) AS BIGINT) AS min_px,
           CAST(MAX(ov) AS BIGINT) AS max_px,
           CAST(SUM((i + 1) * ov) AS BIGINT) AS wsum
    FROM o GROUP BY doc_id
    """,
    survey="N5",
)
def n5_jpeg_archive_pipeline_real(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image archival pipeline with a certified **JPEG ENCODE** stage —
    the first TRANSFORM-CODED write path (PNG wrote raw scanlines, GIF
    wrote palette indices; here the engine's own encoder runs level
    shift → forward DCT → Annex-K quantization → zigzag → Huffman):
    closed-form grayscale frames (8x8-blockwise constant, the analysis
    device) → saturating 2x contrast stretch (int clamp to [68, 186];
    the clip COUNT is a certified output, so the rail events are
    oracle-checked like the FLAC limiter's) → **JPEG ENCODE**
    (operators/jpeg_encode.encode_jpeg_gray_pixels with the REAL
    Table K.1 DQT written to the stream; every 3rd doc adds DRI/RSTm
    restart markers with per-interval DC reset) → JPEG DECODE of the
    encoder's own bytes by the certified T.81 decoder → per-image
    checksums computed ONLY from round-tripped pixels.

    The oracle never sees a JPEG byte: Table K.1's DC step is 16, so a
    constant block at an EVEN level-shift offset quantizes to
    DC = (v-128)/2 exactly and reconstructs bit-exactly (16·DC/8 =
    2·DC, an exact float op) — the quantize→IDCT round trip is the
    identity on the fixture and any FDCT scaling, zigzag, DQT-order,
    DC-prediction, restart or Huffman WRITE bug breaks the hash.  The
    non-constant (genuinely lossy) path is pinned in tests against an
    independent numpy transform replay.  Map-only at any corpus
    size."""
    import pandas as pd

    from ..operators.jpeg_codec import decode_jpeg_gray
    from ..operators.jpeg_encode import encode_jpeg_gray_pixels

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id")
    )
    cols = ["doc_id", "width", "height", "n_px", "n_clipped",
            "sum_px", "min_px", "max_px", "wsum"]

    def pipeline(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 * (3 + did % 3), 8 * (2 + did % 2)
                src = []
                for i in range(w * h):
                    bx, by = (i % w) // 8, (i // w) // 8
                    src.append(
                        128 + 2 * ((did*7 + bx*3 + by*5) % 90 - 45)
                    )
                gained = [2 * (s - 128) + 128 for s in src]
                clipped = sum(
                    1 for gv in gained if gv > 186 or gv < 68
                )
                frame = [min(186, max(68, gv)) for gv in gained]
                # the certified write path: every checksum below comes
                # from bytes the in-engine transform coder produced
                W, H, rt = decode_jpeg_gray(
                    encode_jpeg_gray_pixels(
                        frame, w, h,
                        restart_interval=2 if did % 3 == 0 else 0,
                    )
                )
                px = list(rt)
                rows.append((
                    did, W, H, W * H, clipped, sum(px), min(px),
                    max(px), sum((i + 1) * p for i, p in enumerate(px)),
                ))
            yield pd.DataFrame(rows, columns=cols)

    return d.mapInPandas(
        pipeline,
        "doc_id long, width int, height int, n_px long, n_clipped long, "
        "sum_px long, min_px long, max_px long, wsum long",
    )


# --------------------------------------------------------------------------
# N5 — QOI ENCODE/DECODE: a complete modern lossless codec pair
# --------------------------------------------------------------------------
@register(
    "n5_qoi_archive_pipeline_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id, 24 + doc_id % 9 AS w, 12 + doc_id % 5 AS h
      FROM documents WHERE doc_id < 150
    ), px AS (
      SELECT doc_id, w, h, UNNEST(range(0, w*h)) AS i FROM dims
    ), rgb AS (
      SELECT doc_id, w, h, i,
             (doc_id*3 + (i % w)*5 + (i // w)*11) % 256 AS r,
             (doc_id*7 + (i % w)*13 + (i // w)*3) % 256 AS g,
             (doc_id*11 + (i % w)*2 + (i // w)*7) % 256 AS b
      FROM px
    ), gray AS (
      SELECT doc_id, w, h, i,
             (77*r + 150*g + 29*b) // 256 AS y
      FROM rgb
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM(y) AS BIGINT) AS sum_y,
           CAST(MIN(y) AS BIGINT) AS min_y,
           CAST(MAX(y) AS BIGINT) AS max_y,
           CAST(SUM((i + 1) * y) AS BIGINT) AS wsum
    FROM gray GROUP BY doc_id
    """,
    survey="N5",
)
def n5_qoi_archive_pipeline_real(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image archival pipeline through a complete **QOI** codec pair —
    a real modern format (qoiformat.org) with a redundancy model the
    PNG/GIF/JPEG paths don't exercise: a 64-slot hash-indexed running
    color cache, wraparound DIFF/LUMA delta ops, and run-length, all
    byte-aligned.  Stages: closed-form RGB frames → **BT.601 integer
    grayscale** ((77R + 150G + 29B) >> 8 — the standard fixed-point
    luma, exactly replayable in SQL) → **QOI ENCODE**
    (operators/qoi_codec — the engine's own op-priority encoder) →
    **QOI DECODE** of the encoder's own bytes → per-image checksums
    from round-tripped pixels only.  QOI is lossless, so any hash/
    cache-update, delta-bias, run-flush or end-marker bug in either
    direction breaks the hash against an oracle that never sees a QOI
    byte.  All five chunk ops fire on the fixture family (test-pinned,
    via the encoder's op counters); map-only at any corpus size."""
    import pandas as pd

    from ..operators.qoi_codec import decode_qoi, encode_qoi

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id")
    )
    cols = ["doc_id", "width", "height", "n_px",
            "sum_y", "min_y", "max_y", "wsum"]

    def pipeline(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 24 + did % 9, 12 + did % 5
                gray = []
                for i in range(w * h):
                    x, y = i % w, i // w
                    r = (did*3 + x*5 + y*11) % 256
                    g = (did*7 + x*13 + y*3) % 256
                    b = (did*11 + x*2 + y*7) % 256
                    yv = (77*r + 150*g + 29*b) // 256
                    gray += [yv, yv, yv]
                # the certified write path: trust ONLY the bytes the
                # in-engine QOI encoder produced
                W, H, rt = decode_qoi(encode_qoi(gray, w, h))
                ys = [rt[3*i] for i in range(W * H)]
                # lossless: all three channels round-trip identically
                assert rt[1::3] == rt[0::3] and rt[2::3] == rt[0::3]
                rows.append((
                    did, W, H, W * H, sum(ys), min(ys), max(ys),
                    sum((i + 1) * v for i, v in enumerate(ys)),
                ))
            yield pd.DataFrame(rows, columns=cols)

    return d.mapInPandas(
        pipeline,
        "doc_id long, width int, height int, n_px long, "
        "sum_y long, min_y long, max_y long, wsum long",
    )
