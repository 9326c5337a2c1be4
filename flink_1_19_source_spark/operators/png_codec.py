"""Minimal pure-stdlib PNG codec (SURVEY §2.11 N5 — real image decode).

The container ships no imaging libraries (PIL/cv2/imageio all absent —
probed r6), but PNG is a public spec (RFC 2083 / W3C PNG) and its only
compression primitive is zlib, which IS stdlib.  So the N5 ``decode_image``
hook can be *real* for 8-bit truecolor PNG without any external
dependency: chunk framing with CRC-32 verification, zlib inflate, and all
five scanline filter types (None/Sub/Up/Average/Paeth) implemented per
the spec's reconstruction functions.

Scope (honestly declared): 8-bit color type 2 (RGB), non-interlaced —
the dominant shape for ML-corpus thumbnails.  Other bit depths / color
types / interlacing raise ``ValueError`` with the offending field, and
non-PNG formats (JPEG &c.) remain environment-gapped in
``multimodal.decode_image``.

The encoder cycles filter types per scanline (row % 5) so a round-trip
actually exercises every unfilter branch, and each filter's
encode/decode pair is additionally pinned one-sided in tests (known
Paeth-predictor vectors from the spec's tie-breaking rules) so a
mirror-image bug in both directions can't hide.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # 8-bit RGB


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor, spec tie-breaking order: left, above, upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_row(ftype: int, raw: bytes, prior: bytes) -> bytes:
    out = bytearray(len(raw))
    for i in range(len(raw)):
        left = raw[i - _BPP] if i >= _BPP else 0
        up = prior[i]
        ul = prior[i - _BPP] if i >= _BPP else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:
            pred = _paeth(left, up, ul)
        out[i] = (raw[i] - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, filt: bytes, prior: bytes) -> bytes:
    out = bytearray(len(filt))
    for i in range(len(filt)):
        left = out[i - _BPP] if i >= _BPP else 0
        up = prior[i]
        ul = prior[i - _BPP] if i >= _BPP else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        elif ftype == 4:
            pred = _paeth(left, up, ul)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[i] = (filt[i] + pred) & 0xFF
    return bytes(out)


def encode_png(pixels: bytes, width: int, height: int) -> bytes:
    """Encode row-major RGB8 bytes as a spec-conformant PNG.

    Filter type cycles per row (row % 5) so downstream decoders — ours in
    tests, any real one in production — exercise every filter branch.
    """
    if len(pixels) != width * height * _BPP:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{_BPP}"
        )
    stride = width * _BPP
    prior = bytes(stride)
    filtered = bytearray()
    for y in range(height):
        raw = pixels[y * stride : (y + 1) * stride]
        ftype = y % 5
        filtered.append(ftype)
        filtered += _filter_row(ftype, raw, prior)
        prior = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Decode a PNG to (width, height, row-major RGB8 bytes).

    Verifies the signature and every chunk CRC; supports 8-bit color
    type 2 (RGB), non-interlaced; concatenates multiple IDAT chunks as
    the spec requires.
    """
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, ctyp, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctyp, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG shape: depth=%d colortype=%d comp=%d "
                    "filter=%d interlace=%d (only 8-bit RGB non-interlaced)"
                    % (depth, ctyp, comp, filt, interlace)
                )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")
    filtered = zlib.decompress(bytes(idat))
    stride = width * _BPP
    if len(filtered) != height * (1 + stride):
        raise ValueError(
            f"inflated scanline data {len(filtered)} != {height}x(1+{stride})"
        )
    out = bytearray()
    prior = bytes(stride)
    for y in range(height):
        row = filtered[y * (1 + stride) : (y + 1) * (1 + stride)]
        recon = _unfilter_row(row[0], row[1:], prior)
        out += recon
        prior = recon
    return width, height, bytes(out)
