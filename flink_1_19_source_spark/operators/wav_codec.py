"""Minimal pure-stdlib WAV (RIFF PCM) codec (SURVEY §2.11 N5 — real
audio decode).

Like the PNG codec (png_codec.py), this makes the N5 audio modality
*real* without any external library: WAV's container is the public RIFF
spec and PCM is raw little-endian integers — ``struct`` covers both.

Scope (honestly declared): PCM integer 16-bit, mono or stereo,
uncompressed (``wFormatTag = 1``).  Compressed codecs (MP3/AAC/FLAC)
remain environment-gapped exactly like JPEG on the image side.
"""

from __future__ import annotations

import struct


def encode_wav(
    samples: list[int], sample_rate: int, channels: int = 1
) -> bytes:
    """Encode interleaved 16-bit PCM samples as a canonical WAV file."""
    if channels not in (1, 2):
        raise ValueError(f"channels must be 1 or 2, got {channels}")
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channel count")
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} out of int16 range")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a PCM-16 WAV to (sample_rate, channels, interleaved samples).

    Validates the RIFF/WAVE framing and the declared chunk sizes; walks
    the chunk list (skipping unknown chunks like LIST/INFO, as the spec
    requires) to find ``fmt `` and ``data``.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len != len(data) - 8:
        raise ValueError(f"RIFF length {riff_len} != payload {len(data) - 8}")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError(f"truncated {ctype!r} chunk")
        if ctype == b"fmt ":
            tag, channels, rate, _byte_rate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV shape: format={tag} bits={bits} "
                    "(only uncompressed PCM-16)"
                )
            fmt = (rate, channels)
        elif ctype == b"data":
            pcm = body
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += 8 + ln + (ln & 1)
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if len(pcm) % 2:
        raise ValueError("odd PCM byte length for 16-bit samples")
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    return fmt[0], fmt[1], samples
