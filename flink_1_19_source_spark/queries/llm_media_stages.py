"""N5 multimodal pipeline stages + the first-tier real decodes.

Split out of queries/llm.py and queries/llm_media.py (the ~900-line
house bound): the REAL pipeline stages a media corpus runs after decode
(nearest-neighbor resize, every-Nth frame sampling, framed audio
features), the first-tier pure-stdlib decodes (PNG via zlib+filters,
WAV/PCM-16, uncompressed AVI) with their metadata/feature plumbing, and
the streaming decode-at-ingest twin.  All map-only mapInPandas over
binary columns — fan-out inside the Arrow batch; each query is
DuckDB-value-hash-oracled against closed-form pixel/sample generators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal
from ..registry import register
from ..tables import load_table


# --------------------------------------------------------------------------
# N5 — multimodal columns
# --------------------------------------------------------------------------
@register(
    "n5_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           MD5(text) AS digest,
           CAST(LENGTH(text) % 64 + 1 AS INTEGER) AS width,
           CAST(LENGTH(text) % 48 + 1 AS INTEGER) AS height
    FROM documents WHERE doc_id < 200
    """,
    survey="N5",
)
def n5_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media column → Arrow-batched mapInPandas feature
    extraction (deterministic fake decode; real codec is an explicit stub
    — see operators/multimodal.py)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = multimodal.attach_media(d, "doc_id", "text")
    return multimodal.extract_features(media)


@register(
    "n5_resize",
    oracle="""
    SELECT doc_id,
           CAST(256 AS INTEGER) AS out_width,
           CAST(192 AS INTEGER) AS out_height,
           MD5(text || ':256x192') AS resized_digest
    FROM documents WHERE doc_id < 100
    """,
    survey="N5",
)
def n5_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing (N5): binary payload in → derived record out
    through one mapInPandas pass; the resample kernel is the stubbed codec
    (deterministic fake digests payload+target size)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = multimodal.attach_media(d, "doc_id", "text")
    return multimodal.resize_images(media, 256, 192)


@register(
    "n5_frame_sample",
    oracle="""
    SELECT d.doc_id,
           CAST(f.no AS BIGINT) AS frame_no,
           CAST(f.no * 1000 AS BIGINT) AS frame_ts_ms,
           MD5(d.text || ':' || CAST(f.no AS VARCHAR)) AS frame_digest
    FROM documents d,
         LATERAL (SELECT UNNEST(range(0, CAST(CEIL(LEN(d.text) * 40 / 1000.0)
                                              AS BIGINT)))
                    AS no) f
    WHERE d.doc_id < 50
    """,
    survey="N5 R4",
)
def n5_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (N5): 1→N fan-out per payload inside the Arrow
    batch (one frame per second of synthesized 40 ms/byte timeline); the
    frame decode is the stubbed codec, digests are deterministic."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    media = multimodal.attach_video(d, "doc_id", "text")
    return multimodal.sample_frames(media, every_ms=1000)


@register(
    "n5_decode_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 7 + 3 AS h
      FROM documents WHERE doc_id < 150
    ), px AS (
      SELECT doc_id, w, h, UNNEST(range(0, w*h)) AS i FROM dims
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM((doc_id*31 + (i // w)*17 + (i % w)*7) % 256)
                AS BIGINT) AS sum_r,
           CAST(SUM((doc_id*31 + (i // w)*17 + (i % w)*7 + 5) % 256)
                AS BIGINT) AS sum_g,
           CAST(SUM((doc_id*31 + (i // w)*17 + (i % w)*7 + 10) % 256)
                AS BIGINT) AS sum_b,
           CAST(SUM((i + 1) * ((doc_id*31 + (i // w)*17 + (i % w)*7) % 256))
                AS BIGINT) AS wsum
    FROM px GROUP BY doc_id
    """,
    survey="N5",
)
def n5_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end (N5): per-doc synthetic RGB images are
    PNG-ENCODED in one mapInPandas pass (pure-stdlib codec, filter type
    cycling per scanline) and PNG-DECODED in a second — signature, chunk
    CRCs, zlib inflate, and all five scanline unfilters all on the hot
    path.  The oracle never sees a PNG byte: pixels are a closed form of
    (doc_id, x, y), so DuckDB recomputes the per-channel sums and a
    position-weighted checksum directly — any unfilter/stride/channel
    bug breaks the hash.  Both passes are map-only (no shuffle until the
    final per-doc agg, which the decode pass already folds per image)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id")
    )
    return _png_feature_pipeline(d)


def _png_feature_pipeline(d: DataFrame) -> DataFrame:
    """Shared encode→decode→features pipeline over a (doc_id) frame —
    batch and streaming inputs take the identical map-only plan."""
    import pandas as pd

    from ..operators.png_codec import encode_png

    def encode(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = did % 13 + 4, did % 7 + 3
                px = bytearray()
                for i in range(w * h):
                    base = did * 31 + (i // w) * 17 + (i % w) * 7
                    px += bytes(((base + c * 5) % 256) for c in range(3))
                payloads.append(encode_png(bytes(px), w, h))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads}
            )

    media = d.mapInPandas(encode, "doc_id long, media_bytes binary")

    cols = ["doc_id", "width", "height", "n_px", "sum_r", "sum_g", "sum_b", "wsum"]

    def decode(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h, pix = multimodal.decode_image(bytes(r.media_bytes), "png")
                sr = sg = sb = ws = 0
                for i in range(w * h):
                    red = pix[3 * i]
                    sr += red
                    sg += pix[3 * i + 1]
                    sb += pix[3 * i + 2]
                    ws += (i + 1) * red
                rows.append((int(r.doc_id), w, h, w * h, sr, sg, sb, ws))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        decode,
        "doc_id long, width int, height int, n_px long, "
        "sum_r long, sum_g long, sum_b long, wsum long",
    )



@register(
    "n5_audio_decode_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 50 + 20 AS n
      FROM documents WHERE doc_id < 150
    ), sam AS (
      SELECT doc_id, n, UNNEST(range(0, n)) AS i FROM dims
    ), vals AS (
      SELECT doc_id, n, (doc_id*37 + i*13) % 4001 - 2000 AS s FROM sam
    )
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS channels,
           CAST(MAX(n) AS BIGINT) AS n_samples,
           CAST(MAX(n) // 8 AS BIGINT) AS duration_ms,
           CAST(SUM(s) AS BIGINT) AS sum_amp,
           CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
           CAST(MAX(ABS(s)) AS BIGINT) AS peak
    FROM vals GROUP BY doc_id
    """,
    survey="N5",
)
def n5_audio_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end (N5, audio twin of n5_decode_real):
    deterministic per-doc PCM-16 waveforms are WAV-ENCODED in one
    mapInPandas pass (pure-stdlib RIFF codec) and WAV-DECODED in a
    second — RIFF framing, chunk walking, fmt validation, PCM unpack all
    on the hot path — then folded to per-clip features (sample count,
    duration, amplitude sums, peak).  The oracle never sees a WAV byte:
    samples are a closed form of (doc_id, i), so DuckDB recomputes the
    features directly and any framing/endianness/width bug breaks the
    hash.  Map-only until the per-doc fold inside the decode pass."""
    import pandas as pd

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

    cols = [
        "doc_id", "sample_rate", "channels", "n_samples",
        "duration_ms", "sum_amp", "sum_abs", "peak",
    ]

    def decode(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rate, ch, samples = multimodal.decode_audio(
                    bytes(r.media_bytes), "wav"
                )
                n = len(samples)
                rows.append(
                    (
                        int(r.doc_id), rate, ch, n, n * 1000 // rate // ch,
                        sum(samples), sum(abs(s) for s in samples),
                        max(abs(s) for s in samples),
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        decode,
        "doc_id long, sample_rate int, channels int, n_samples long, "
        "duration_ms long, sum_amp long, sum_abs long, peak long",
    )



@register(
    "s_media_decode_stream",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 7 + 3 AS h
      FROM documents WHERE doc_id < 150
    ), px AS (
      SELECT doc_id, w, h, UNNEST(range(0, w*h)) AS i FROM dims
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM((doc_id*31 + (i // w)*17 + (i % w)*7) % 256)
                AS BIGINT) AS sum_r,
           CAST(SUM((doc_id*31 + (i // w)*17 + (i % w)*7 + 5) % 256)
                AS BIGINT) AS sum_g,
           CAST(SUM((doc_id*31 + (i // w)*17 + (i % w)*7 + 10) % 256)
                AS BIGINT) AS sum_b,
           CAST(SUM((i + 1) * ((doc_id*31 + (i // w)*17 + (i % w)*7) % 256))
                AS BIGINT) AS wsum
    FROM px GROUP BY doc_id
    """,
    survey="N5-S S1",
    tags=("streaming",),
)
def s_media_decode_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING multimodal ingest (N5-S): documents replayed as a file
    stream are PNG-encoded and REAL-decoded on arrival — the same
    map-only `_png_feature_pipeline` plan as the batch twin
    n5_decode_real, running inside micro-batches with zero state (decode
    is embarrassingly parallel; the 100 TB shape is decode-at-ingest
    before anything shuffles).  Append emission; the drained stream
    hash-matches the batch oracle."""
    import os

    from ..streaming import replay
    from .streaming_queries import _drain_to_memory, _work_dir

    wd = _work_dir(sf_dir, "s_media")
    sdf = replay.replay_table(
        spark, sf_dir, "documents", os.path.join(wd, "src"),
        ts_col="doc_id", chunks=4, order_by=["doc_id"],
    )
    feats = _png_feature_pipeline(
        sdf.filter(F.col("doc_id") < 150).select("doc_id")
    )
    return _drain_to_memory(spark, feats, "s_media_q", "append", wd)



@register(
    "n5_video_decode_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 9 + 4 AS w, doc_id % 5 + 3 AS h,
             doc_id % 4 + 2 AS nf
      FROM documents WHERE doc_id < 120
    ), px AS (
      SELECT doc_id, w, h, nf, UNNEST(range(0, nf * w * h)) AS j FROM dims
    ), v AS (
      SELECT doc_id, w, h, nf, j,
             j // (w * h) AS f, (j % (w * h)) AS i
      FROM px
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width,
           CAST(MAX(h) AS INTEGER) AS height,
           CAST(25 AS INTEGER) AS fps,
           CAST(MAX(nf) AS BIGINT) AS n_frames,
           CAST(SUM((doc_id*31 + f*11 + (i // w)*17 + (i % w)*7) % 256)
                AS BIGINT) AS sum_r,
           CAST(SUM((doc_id*31 + f*11 + (i // w)*17 + (i % w)*7 + 10) % 256)
                AS BIGINT) AS sum_b,
           CAST(SUM((j + 1) * ((doc_id*31 + f*11 + (i // w)*17 + (i % w)*7)
                               % 256)) AS BIGINT) AS wsum
    FROM v GROUP BY doc_id
    """,
    survey="N5",
)
def n5_video_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode end-to-end (N5, closing the image/audio/video
    triad): deterministic multi-frame RGB clips are AVI-ENCODED in one
    mapInPandas pass (pure-stdlib RIFF container, raw DIB frames) and
    AVI-DECODED in a second — container walk, header validation, and
    the DIB storage conventions (bottom-up rows, BGR order, 4-byte row
    padding) all on the hot path; a decoder that skips the un-flip or
    the channel swap fails the hash.  Oracle recomputes per-channel and
    position-weighted sums from the closed-form (doc_id, frame, x, y)
    pixel generator; both passes map-only."""
    import pandas as pd

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

    cols = ["doc_id", "width", "height", "fps", "n_frames",
            "sum_r", "sum_b", "wsum"]

    def decode(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h, fps, frames = multimodal.decode_video(
                    bytes(r.media_bytes), "avi"
                )
                sr = sb = ws = 0
                j = 0
                for pix in frames:
                    for i in range(w * h):
                        red = pix[3 * i]
                        sr += red
                        sb += pix[3 * i + 2]
                        ws += (j + 1) * red
                        j += 1
                rows.append(
                    (int(r.doc_id), w, h, fps, len(frames), sr, sb, ws)
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        decode,
        "doc_id long, width int, height int, fps int, n_frames long, "
        "sum_r long, sum_b long, wsum long",
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
    "n5_thumbnail_pipeline_real",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 9 + 4 AS w, doc_id % 5 + 3 AS h,
             doc_id % 4 + 2 AS nf
      FROM documents WHERE doc_id < 120
    ), fr AS (
      SELECT doc_id, w, h, UNNEST(range(0, nf)) AS f FROM dims
    ), keep AS (
      SELECT * FROM fr WHERE f % 2 = 0
    ), ty AS (
      SELECT *, UNNEST(range(0, 6)) AS ty FROM keep
    ), txc AS (
      SELECT *, UNNEST(range(0, 8)) AS tx FROM ty
    ), px AS (
      SELECT doc_id, w, h, f, ty, tx, UNNEST(range(0, 3)) AS c FROM txc
    ), v AS (
      SELECT doc_id, f,
             (ty * 8 + tx) * 3 + c AS o,
             (doc_id*31 + f*11 + ((ty * h) // 6)*17
              + ((tx * w) // 8)*7 + c*5) % 256 AS val
      FROM px
    )
    SELECT doc_id, CAST(f AS INTEGER) AS frame_no,
           CAST(8 AS INTEGER) AS out_w, CAST(6 AS INTEGER) AS out_h,
           CAST(SUM(val) AS BIGINT) AS sum_rgb,
           CAST(SUM((o + 1) * val) AS BIGINT) AS wsum
    FROM v GROUP BY doc_id, f
    """,
    survey="N5",
)
def n5_thumbnail_pipeline_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail GENERATION at ingest — the first certified ENCODE-side
    codec stage (every earlier N5 query only reads): AVI video decode →
    every-2nd-frame sample → nearest-neighbor 8x6 RGB resize →
    **PNG ENCODE** (spec-conformant: per-row cycling filter types,
    zlib IDAT, CRC chunks) → PNG DECODE back → per-thumbnail checksums
    computed from the ROUND-TRIPPED bytes.  PNG is lossless, so the
    oracle replays the closed-form source pixels through the sample +
    floor-mapped resize directly — any encoder framing, filter, CRC or
    stride bug surfaces as a hash mismatch after the in-engine decode.
    One mapInPandas pass, fan-out inside the Arrow batch, no shuffle;
    at 100 TB this is the archival-thumbnail stage of a media corpus
    build, parallel by construction."""
    import numpy as np
    import pandas as pd

    from ..operators import multimodal
    from ..operators.avi_codec import encode_avi
    from ..operators.png_codec import decode_png, encode_png

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
                        base = (
                            did * 31 + f * 11 + (i // w) * 17 + (i % w) * 7
                        )
                        px += bytes(((base + c * 5) % 256) for c in range(3))
                    frames.append(bytes(px))
                payloads.append(encode_avi(frames, w, h))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads}
            )

    media = d.mapInPandas(encode, "doc_id long, media_bytes binary")
    ow, oh = 8, 6
    cols = ["doc_id", "frame_no", "out_w", "out_h", "sum_rgb", "wsum"]

    def thumbs(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h, fps, frames = multimodal.decode_video(
                    bytes(r.media_bytes), "avi"
                )
                sy = (np.arange(oh) * h) // oh
                sx = (np.arange(ow) * w) // ow
                for f in range(0, len(frames), 2):
                    rgb = np.frombuffer(frames[f], np.uint8).reshape(
                        h, w, 3
                    )
                    thumb = rgb[np.ix_(sy, sx)].tobytes()
                    png = encode_png(thumb, ow, oh)
                    dw, dh, back = decode_png(png)
                    assert (dw, dh) == (ow, oh)
                    flat = np.frombuffer(back, np.uint8).astype(np.int64)
                    ws = int(((np.arange(flat.size) + 1) * flat).sum())
                    rows.append(
                        (int(r.doc_id), f, ow, oh, int(flat.sum()), ws)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        thumbs,
        "doc_id long, frame_no int, out_w int, out_h int, "
        "sum_rgb long, wsum long",
    )


@register(
    "n5_corrupt_media_side_output",
    oracle="""
    WITH dims AS (
      SELECT doc_id, doc_id % 4 + 2 AS w, doc_id % 3 + 2 AS h
      FROM documents WHERE doc_id < 150
    ), px AS (
      SELECT doc_id, w, h, UNNEST(range(0, w * h * 3)) AS i FROM dims
      WHERE doc_id % 7 <> 3
    ), oksum AS (
      SELECT doc_id,
             CAST(SUM((doc_id*37 + ((i // 3) // w)*19 + ((i // 3) % w)*11
                       + (i % 3)*5) % 256) AS BIGINT) AS sum_rgb
      FROM px GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 7 = 3 THEN 'corrupt' ELSE 'ok' END
             AS status,
           o.sum_rgb
    FROM dims d LEFT JOIN oksum o ON o.doc_id = d.doc_id
    """,
    survey="N5 R6",
)
def n5_corrupt_media_side_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRUPT-MEDIA side output (R6 x N5) — the resilience contract a
    100 TB crawl ingest cannot skip: some fraction of fetched media is
    truncated or bit-rotted, and the pipeline must ROUTE failures to an
    error side instead of failing the job or silently dropping rows.
    Here every doc gets a closed-form PNG, docs with doc_id % 7 == 3
    are deterministically bit-flipped INSIDE their IDAT chunk (so the
    CRC check — not the parser — catches them), and the decode stage
    try/excepts per record: good rows carry their pixel checksum,
    corrupt rows land with status='corrupt' and a NULL sum — one output
    row per input either way, nothing lost.  The oracle pins BOTH
    sides: the corrupt set is exactly the planted one (a decoder that
    crashes the task, or one that 'recovers' bad CRCs, both break the
    hash) and the survivors' checksums are exact.  Map-only
    mapInPandas; the side output is a status column the sink splits on
    (the R6 pattern), zero extra passes."""
    import pandas as pd

    from ..operators.png_codec import decode_png, encode_png

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
                w, h = did % 4 + 2, did % 3 + 2
                px = bytearray()
                for i in range(w * h * 3):
                    px.append(
                        (did * 37 + ((i // 3) // w) * 19
                         + ((i // 3) % w) * 11 + (i % 3) * 5) % 256
                    )
                data = bytearray(encode_png(bytes(px), w, h))
                if did % 7 == 3:
                    k = data.index(b"IDAT") + 8  # first IDAT data byte
                    data[k] ^= 0xFF
                payloads.append(bytes(data))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_bytes": payloads}
            )

    media = d.mapInPandas(encode, "doc_id long, media_bytes binary")
    cols = ["doc_id", "status", "sum_rgb"]

    def decode(batches):
        import zlib

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    w, h, rgb = decode_png(bytes(r.media_bytes))
                    rows.append((int(r.doc_id), "ok", sum(rgb)))
                except (ValueError, zlib.error):
                    # decode failures route to the error side; anything
                    # else (a bug) still fails the task loudly
                    rows.append((int(r.doc_id), "corrupt", None))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        decode, "doc_id long, status string, sum_rgb long"
    )
