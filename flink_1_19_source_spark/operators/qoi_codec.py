"""QOI — the "Quite OK Image" format (qoiformat.org, public spec,
2022): a real-world lossless RGB(A) codec built from five byte-level
ops — RUN (run-length), INDEX (a 64-slot running color cache addressed
by a fixed hash), DIFF / LUMA (small wraparound per-channel deltas),
and literal RGB/RGBA.  Both directions implemented from the spec;
shares nothing with the PNG/GIF paths (different redundancy model:
per-pixel predictive ops instead of filters+DEFLATE or palette+LZW).

Encoder follows the reference encoder's op-priority rule: RUN while
the pixel repeats, else INDEX on a cache hit, else DIFF if all three
deltas fit 2 bits, else LUMA if the green delta fits 6 bits and the
red/blue deltas fit 4 bits relative to it, else literal RGB.
"""

from __future__ import annotations

import struct

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def _encode_ops(rgb: list[int], n_px: int) -> tuple[list[bytes], dict]:
    """Shared encoder core: the chunk list plus per-op counts (the test
    surface proving every op kind actually fired on a fixture)."""
    chunks: list[bytes] = []
    stats = {"run": 0, "index": 0, "diff": 0, "luma": 0, "rgb": 0}
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for i in range(n_px):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                chunks.append(bytes([0xC0 | (run - 1)]))
                stats["run"] += 1
                run = 0
            continue
        if run:
            chunks.append(bytes([0xC0 | (run - 1)]))
            stats["run"] += 1
            run = 0
        h = _hash(r, g, b, pa)
        if index[h] == (r, g, b, pa):
            chunks.append(bytes([h]))
            stats["index"] += 1
        else:
            index[h] = (r, g, b, pa)
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                chunks.append(
                    bytes([0x40 | ((dr + 2) << 4) | ((dg + 2) << 2)
                           | (db + 2)])
                )
                stats["diff"] += 1
            elif (
                -32 <= dg <= 31
                and -8 <= dr - dg <= 7
                and -8 <= db - dg <= 7
            ):
                chunks.append(
                    bytes([0x80 | (dg + 32),
                           ((dr - dg + 8) << 4) | (db - dg + 8)])
                )
                stats["luma"] += 1
            else:
                chunks.append(bytes([0xFE, r, g, b]))
                stats["rgb"] += 1
        pr, pg, pb = r, g, b
    if run:
        chunks.append(bytes([0xC0 | (run - 1)]))
        stats["run"] += 1
    return chunks, stats


def encode_qoi(rgb: list[int], width: int, height: int) -> bytes:
    """Encode interleaved 8-bit RGB (len = 3*width*height) as a QOI
    stream (channels=3, colorspace=0/sRGB)."""
    assert len(rgb) == 3 * width * height, (len(rgb), width, height)
    chunks, _ = _encode_ops(rgb, width * height)
    head = _MAGIC + struct.pack(">IIBB", width, height, 3, 0)
    return head + b"".join(chunks) + _END


def decode_qoi(data: bytes) -> tuple[int, int, bytes]:
    """Decode a QOI stream to (width, height, interleaved RGB bytes).
    Raises ValueError on bad magic, channels != 3, a truncated stream,
    or a missing end marker — the corrupt-media side-output contract."""
    if data[:4] != _MAGIC or len(data) < 14:
        raise ValueError("not a QOI stream")
    width, height, channels, _cs = struct.unpack(">IIBB", data[4:14])
    if channels != 3:
        raise ValueError(f"unsupported channels={channels}")
    n_px = width * height
    # Bound the allocation against the payload BEFORE trusting the
    # header: a QOI chunk byte emits at most 62 pixels (a full RUN), so
    # any (width, height) needing more pixels than 62x the payload
    # (len - 14 header - 8 end marker) is corrupt — ValueError per the
    # corrupt-media side-output contract, never a multi-GB bytearray.
    if n_px > 62 * max(0, len(data) - 22):
        raise ValueError(
            f"implausible QOI dimensions {width}x{height} "
            f"for a {len(data)}-byte stream"
        )
    out = bytearray(3 * n_px)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    while i < n_px:
        if pos >= len(data) - 8:
            raise ValueError("truncated QOI stream")
        byte = data[pos]
        pos += 1
        if byte == 0xFE:  # RGB
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == 0xFF:  # RGBA
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        elif byte >> 6 == 0b00:  # INDEX
            r, g, b, a = index[byte]
        elif byte >> 6 == 0b01:  # DIFF
            r = (r + ((byte >> 4) & 3) - 2) % 256
            g = (g + ((byte >> 2) & 3) - 2) % 256
            b = (b + (byte & 3) - 2) % 256
        elif byte >> 6 == 0b10:  # LUMA
            dg = (byte & 0x3F) - 32
            second = data[pos]
            pos += 1
            r = (r + dg + ((second >> 4) & 0xF) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (second & 0xF) - 8) % 256
        else:  # RUN
            run = (byte & 0x3F) + 1
            for _ in range(run):
                if i >= n_px:
                    raise ValueError("run past image end")
                out[3 * i], out[3 * i + 1], out[3 * i + 2] = r, g, b
                i += 1
            index[_hash(r, g, b, a)] = (r, g, b, a)
            continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[3 * i], out[3 * i + 1], out[3 * i + 2] = r, g, b
        i += 1
    if data[pos:pos + 8] != _END:
        raise ValueError("missing QOI end marker")
    return width, height, bytes(out)
