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
