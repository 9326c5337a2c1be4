"""Multimodal-column plumbing (SURVEY §2.11 N5).

Images/audio/video ride through the engine as opaque ``binary`` columns
with a typed metadata struct. The Spark-side plumbing — schema, Arrow
batch shape, ``mapInPandas`` signature, partition behavior — is real and
tested; the *codec* step is stubbed (no image/audio libraries in this
container) behind ``decode_image`` which raises ``NotImplementedError``,
with ``fake_decode_features`` as the deterministic test double.

At 100 TB the binary payloads dominate I/O: keep them in their own
parquet column (column pruning skips them unless asked for), size
``spark.sql.files.maxPartitionBytes`` to bound per-task memory, and do
all feature extraction in one ``mapInPandas`` pass (Arrow-batched, no
per-row Python overhead).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("media_type", StringType()),   # image/audio/video
        StructField("format", StringType()),       # png/jpeg/wav/...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_media(df: DataFrame, id_col: str, payload_text_col: str) -> DataFrame:
    """Testdata has no real media files: synthesize an opaque binary
    payload (utf-8 bytes of the text column) plus a typed metadata struct.
    The engine treats the payload as opaque from here on — exactly how a
    real image column flows."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(payload_text_col), "UTF-8").alias("media_bytes"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake-rgb8").alias("format"),
            (F.length(F.col(payload_text_col)) % 64 + 1).cast("int").alias("width"),
            (F.length(F.col(payload_text_col)) % 48 + 1).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("media_meta"),
    )


def decode_image(payload: bytes, fmt: str) -> tuple[int, int, bytes]:
    """Real codec hook: returns (width, height, row-major RGB8 pixels).

    PNG decode is REAL — the pure-stdlib codec in ``png_codec`` (zlib +
    the public PNG spec: chunk CRCs, inflate, all five scanline filters).
    Baseline JPEG decode is REAL too — the pure stdlib+numpy T.81
    decoder in ``jpeg_codec`` handles grayscale (luminance replicated
    to RGB here), interleaved YCbCr color with 4:4:4/4:2:2/4:2:0
    chroma subsampling (replication upsample + exact-int64 YCbCr→RGB),
    progressive in grayscale AND color (spectral selection, general
    EOBRUN, interleaved progressive DC scans, successive approximation
    in grayscale).  GIF decode is REAL — the pure-stdlib GIF89a codec
    in ``gif_codec`` (variable-width LZW with dictionary rebuild,
    interlace), and so is subset-profile WebP LOSSLESS (``webp_codec``:
    VP8L prefix codes, LZ77 with the 2D distance map, subtract-green).
    Lossy WebP and AVIF stay environment-gapped (no
    imaging library in this container — PIL/cv2/imageio probed absent
    r6); swap in PIL/torchvision behind this same signature on a real
    cluster."""
    if fmt.lower() == "png":
        from .png_codec import decode_png

        return decode_png(payload)
    if fmt.lower() == "gif":
        from .gif_codec import decode_gif

        return decode_gif(payload)
    if fmt.lower() == "webp":
        from .webp_codec import decode_webp_lossless

        return decode_webp_lossless(payload)
    if fmt.lower() in ("jpeg", "jpg"):
        from .jpeg_codec import decode_jpeg

        w, h, ncomp, px = decode_jpeg(payload)
        if ncomp == 3:
            return w, h, px
        rgb = bytearray(3 * len(px))
        rgb[0::3] = px
        rgb[1::3] = px
        rgb[2::3] = px
        return w, h, bytes(rgb)
    raise NotImplementedError(
        f"{fmt} decoding requires an imaging library not present in this "
        "environment; png, gif, lossless webp and jpeg (baseline + "
        "progressive, gray + color) decode natively"
    )


def decode_audio(payload: bytes, fmt: str) -> tuple[int, int, list]:
    """Audio codec hook: returns (sample_rate, channels, pcm samples).

    WAV/PCM-16 decode is REAL (pure-stdlib RIFF codec in ``wav_codec``)
    and so is subset-profile FLAC (``flac_codec``: rice-coded residuals,
    fixed predictors, CRC-verified frames — 16-bit mono) and IMA ADPCM
    (the first lossy tier, ``adpcm_codec``); mp3/aac remain
    environment-gapped (psychoacoustic decoders need a real library)."""
    if fmt.lower() in ("wav", "wave"):
        from .wav_codec import decode_wav

        return decode_wav(payload)
    if fmt.lower() == "flac":
        from .flac_codec import decode_flac

        return decode_flac(payload)
    if fmt.lower() in ("adpcm", "ima-adpcm", "dvi4"):
        from .adpcm_codec import decode_adpcm_wav

        return decode_adpcm_wav(payload)
    raise NotImplementedError(
        f"{fmt} decoding requires an audio library not present in this "
        "environment; wav, subset FLAC and IMA ADPCM decode natively"
    )


def decode_video(payload: bytes, fmt: str) -> tuple[int, int, int, list]:
    """Video codec hook: returns (width, height, fps, RGB frames).

    Uncompressed AVI (raw 24-bpp DIB frames) decodes natively via the
    pure-stdlib RIFF codec in ``avi_codec`` — including the DIB
    bottom-up/BGR/row-padding conventions; compressed codecs
    (MJPEG/H.264/VP9) are environment-gapped."""
    if fmt.lower() == "avi":
        from .avi_codec import decode_avi

        return decode_avi(payload)
    raise NotImplementedError(
        f"{fmt} decoding requires a video library not present in this "
        "environment; uncompressed avi decodes natively"
    )


def fake_decode_features(doc_id: int, payload: bytes, width: int, height: int) -> dict:
    """Deterministic stand-in for decode + feature-extract: byte length and
    an md5 digest of the payload (stable across engines and runs)."""
    return {
        "doc_id": doc_id,
        "n_bytes": len(payload),
        "digest": hashlib.md5(payload).hexdigest(),
        "width": width,
        "height": height,
    }


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("resized_digest", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame_ts_ms", LongType()),
        StructField("frame_digest", StringType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing (1→1, payload-in → derived-out). The resampling
    kernel is the stubbed codec step (`decode_image`); the deterministic
    fake digests payload+target-size so the full Arrow path is testable.
    No shuffle: pure map over whatever partitioning the scan produced."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f":{width}x{height}".encode()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": width,
                    "out_height": height,
                    "resized_digest": [
                        hashlib.md5(bytes(b) + tag).hexdigest()
                        for b in pdf["media_bytes"]
                    ],
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int) -> DataFrame:
    """Frame sampling (1→N): one output row per sampled frame timestamp in
    [0, duration_ms). The frame *decode* is the stubbed codec step; the
    deterministic fake digests payload+frame_no. Fan-out happens inside
    the Arrow batch — no shuffle, no driver involvement; at 100 TB each
    task fans out its own videos."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, tss, digs = [], [], [], []
            for row in pdf.itertuples(index=False):
                dur = row.media_meta["duration_ms"]
                if dur is None:
                    continue
                payload = bytes(row.media_bytes)
                for no, ts in enumerate(range(0, int(dur), every_ms)):
                    ids.append(row.doc_id)
                    nos.append(no)
                    tss.append(ts)
                    digs.append(
                        hashlib.md5(payload + b":" + str(no).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_no": nos,
                    "frame_ts_ms": tss,
                    "frame_digest": digs,
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def attach_video(df: DataFrame, id_col: str, payload_text_col: str) -> DataFrame:
    """Video-flavored twin of attach_media: synthesizes a duration (40 ms
    per payload byte — deterministic) so frame sampling has a timeline."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(payload_text_col), "UTF-8").alias("media_bytes"),
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("fake-v1").alias("format"),
            F.lit(640).cast("int").alias("width"),
            F.lit(480).cast("int").alias("height"),
            (F.length(F.col(payload_text_col)).cast("long") * 40).alias("duration_ms"),
        ).alias("media_meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the opaque payload column.

    ``mapInPandas`` so each task processes whole Arrow batches — the
    per-batch Python cost is amortized over thousands of rows, and the
    operation is embarrassingly parallel (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                fake_decode_features(
                    row.doc_id,
                    bytes(row.media_bytes),
                    row.media_meta["width"],
                    row.media_meta["height"],
                )
                for row in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(run, FEATURE_SCHEMA)
