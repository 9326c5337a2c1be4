"""Minimal pure-stdlib AVI (RIFF) codec for uncompressed 24-bit video
(SURVEY §2.11 N5 — real video decode).

Completes the real-codec triad (png_codec.py images, wav_codec.py
audio): AVI is the public RIFF container spec and raw DIB frames are
plain pixel bytes, so uncompressed video decodes with ``struct`` alone.
The decode path has real spec work in it — DIB frames are stored
BOTTOM-UP, in BGR channel order, with rows padded to 4-byte boundaries —
so a decoder that "just copies bytes" produces flipped/blue-shifted
images and fails the closed-form oracle.

Scope (honestly declared): RIFF-AVI with a single ``vids`` stream of
``00db`` raw 24-bpp DIB frames.  Compressed codecs (MJPEG/H.264/VP9)
remain environment-gapped like JPEG/MP3.
"""

from __future__ import annotations

import struct

_FPS_SCALE = 1
_FPS_RATE = 25  # 25 fps


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _lst(list_type: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", list_type + data)


def _rgb_to_dib(pixels: bytes, width: int, height: int) -> bytes:
    """Row-major top-down RGB → bottom-up, BGR, 4-byte-padded DIB rows."""
    stride = width * 3
    pad = (-stride) % 4
    out = bytearray()
    for y in range(height - 1, -1, -1):
        row = pixels[y * stride : (y + 1) * stride]
        for x in range(width):
            r, g, b = row[3 * x : 3 * x + 3]
            out += bytes((b, g, r))
        out += bytes(pad)
    return bytes(out)


def _dib_to_rgb(dib: bytes, width: int, height: int) -> bytes:
    stride = width * 3
    pad = (-stride) % 4
    if len(dib) != (stride + pad) * height:
        raise ValueError(
            f"DIB frame size {len(dib)} != {(stride + pad) * height}"
        )
    out = bytearray(stride * height)
    for row_no in range(height):
        y = height - 1 - row_no  # bottom-up storage
        src = dib[row_no * (stride + pad) : row_no * (stride + pad) + stride]
        for x in range(width):
            b, g, r = src[3 * x : 3 * x + 3]
            out[y * stride + 3 * x : y * stride + 3 * x + 3] = bytes((r, g, b))
    return bytes(out)


def encode_avi(frames: list[bytes], width: int, height: int) -> bytes:
    """Encode top-down RGB8 frames as a single-stream uncompressed AVI."""
    stride = width * 3
    if any(len(f) != stride * height for f in frames):
        raise ValueError("frame size mismatch")
    frame_bytes = (stride + ((-stride) % 4)) * height
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 * _FPS_SCALE // _FPS_RATE,  # usec per frame
        frame_bytes * _FPS_RATE,  # max bytes/sec
        0,  # padding granularity
        0,  # flags: no idx1 index chunk is written, so AVIF_HASINDEX off
        len(frames),
        0,
        1,  # one stream
        frame_bytes,
        width,
        height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, _FPS_SCALE, _FPS_RATE, 0,
            len(frames), frame_bytes, 0, 0,
        ) + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, frame_bytes, 0, 0, 0, 0,
    )
    hdrl = _lst(
        b"hdrl",
        _chunk(b"avih", avih)
        + _lst(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _lst(
        b"movi",
        b"".join(
            _chunk(b"00db", _rgb_to_dib(f, width, height)) for f in frames
        ),
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Decode an uncompressed AVI to (width, height, fps, RGB frames).

    Walks the RIFF tree (skipping unknown chunks as the spec requires),
    validates the BITMAPINFOHEADER shape (24-bpp, uncompressed), and
    un-does the DIB storage conventions per frame."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/AVI header")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len != len(data) - 8:
        raise ValueError(f"RIFF length {riff_len} != payload {len(data) - 8}")

    width = height = None
    fps = _FPS_RATE
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal width, height, fps
        pos = 0
        while pos + 8 <= len(buf):
            fourcc = buf[pos : pos + 4]
            (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + ln]
            if len(body) != ln:
                raise ValueError(f"truncated {fourcc!r} chunk")
            if fourcc == b"LIST":
                walk(body[4:])  # skip the list type fourcc
            elif fourcc == b"strf":
                (size, w, h, planes, bpp, comp) = struct.unpack(
                    "<IiiHHI", body[:20]
                )
                if bpp != 24 or comp != 0:
                    raise ValueError(
                        f"unsupported AVI shape: bpp={bpp} compression={comp}"
                        " (only raw 24-bpp DIB)"
                    )
                width, height = w, h
            elif fourcc == b"strh" and body[:4] == b"vids":
                scale, rate = struct.unpack("<II", body[20:28])
                if scale:
                    fps = rate // scale
            elif fourcc == b"00db":
                frames.append(body)
            pos += 8 + ln + (ln & 1)  # chunks are word-aligned

    walk(data[12:])
    if width is None:
        raise ValueError("no strf header")
    rgb = [_dib_to_rgb(f, width, height) for f in frames]
    return width, height, fps, rgb
