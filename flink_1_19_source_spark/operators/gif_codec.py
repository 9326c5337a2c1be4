"""Pure-stdlib GIF89a codec — REAL LZW image decode (N5).

Implements the public GIF89a specification (CompuServe 1990; the same
format every browser ships): logical screen descriptor, global color
table, image descriptor with optional interlace, and the variable-width
LZW entropy code — code widths growing 3..12 bits, CLEAR/EOI control
codes, dictionary rebuild on CLEAR, the deferred-clear rule, and the
KwKwK self-referential case — plus Appendix-E four-pass interlace
de-scrambling.

The matching encoder exists to manufacture real test bytes (a true
dictionary-building LZW, emitting CLEAR when the table hits 4096), so
the decoder is exercised on genuine growing-width streams, not
degenerate literal-only ones.

Scale note: like the PNG/JPEG tiers, per-image Python decode is the
correctness reference; at 100 TB the same decode_image hook swaps to a
native library. Decode is embarrassingly parallel — one image per task,
no cross-image state.
"""

from __future__ import annotations

_MAX_CODE = 4096  # 12-bit ceiling, per the spec


# ---------------------------------------------------------------------------
# bit streams (LSB-first — GIF packs codes little-endian, unlike JPEG)
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


# ---------------------------------------------------------------------------
# interlace (GIF89a Appendix E): pass rows 0,8,16.. / 4,12.. / 2,6.. / 1,3..
# ---------------------------------------------------------------------------
def _interlace_order(h: int) -> list[int]:
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return order


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    bw = _BitWriter()
    bw.write(clear, width)
    buf: tuple[int, ...] = ()
    for px in indices:
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        bw.write(table[buf], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= _MAX_CODE:
            bw.write(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        buf = (px,)
    if buf:
        bw.write(table[buf], width)
    bw.write(eoi, width)
    return bw.flush()


def _lzw_decode(data: bytes, min_code_size: int, n_px: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    out: list[int] = []

    def fresh() -> tuple[list[list[int] | None], int, int]:
        t: list[list[int] | None] = [[i] for i in range(clear)]
        t.extend([None, None])  # clear / eoi slots
        return t, len(t), min_code_size + 1

    table, next_code, width = fresh()
    prev: list[int] | None = None
    while len(out) < n_px:
        code = br.read(width)
        if code == clear:
            table, next_code, width = fresh()
            prev = None
            continue
        if code == eoi:
            break
        if code < next_code and table[code] is not None:
            entry = list(table[code])  # type: ignore[arg-type]
        elif code == next_code and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None and next_code < _MAX_CODE:
            table.append(prev + [entry[0]])
            next_code += 1
            # width grows when the NEXT code wouldn't fit (the encoder
            # bumps after assigning, so the decoder bumps at the same
            # table size — the classic off-by-one both sides must agree on)
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:n_px]


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------
def encode_gif(
    indices: list[int],
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    interlace: bool = False,
) -> bytes:
    """Encode palette indices (row-major) as a real GIF89a file."""
    if len(indices) != width * height:
        raise ValueError("index count != width*height")
    if not (1 <= width <= 0xFFFF and 1 <= height <= 0xFFFF):
        raise ValueError("GIF dimensions are 16-bit")
    npal = len(palette)
    depth = max(2, (npal - 1).bit_length())  # color table size = 2^depth
    if npal > (1 << depth):
        raise ValueError("palette too large for depth")
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, depth bits
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x80 | ((depth - 1) << 4) | (depth - 1))
    out += bytes([0, 0])  # background index, aspect
    for k in range(1 << depth):
        r, g, b = palette[k] if k < npal else (0, 0, 0)
        out += bytes([r, g, b])
    # image descriptor
    out.append(0x2C)
    out += (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x40 if interlace else 0x00)
    rows = indices
    if interlace:
        reordered: list[int] = []
        for y in _interlace_order(height):
            reordered.extend(indices[y * width:(y + 1) * width])
        rows = reordered
    min_code = max(2, depth)
    out.append(min_code)
    payload = _lzw_encode(rows, min_code)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, bytes]:
    """Decode a GIF87a/89a file -> (width, height, row-major RGB8).

    Handles the global color table, a local color table if present,
    interlaced images, extension blocks (skipped), and the full
    variable-width LZW stream. First image frame only (animation
    frames beyond the first are out of scope for the corpus tier)."""
    if data[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    flags = data[10]
    pos = 13
    gct: list[tuple[int, int, int]] = []
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        for k in range(n):
            gct.append((data[pos], data[pos + 1], data[pos + 2]))
            pos += 3
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            iw = int.from_bytes(data[pos + 4:pos + 6], "little")
            ih = int.from_bytes(data[pos + 6:pos + 8], "little")
            iflags = data[pos + 8]
            pos += 9
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = []
                for k in range(n):
                    pal.append((data[pos], data[pos + 1], data[pos + 2]))
                    pos += 3
            if not pal:
                raise ValueError("no color table")
            min_code = data[pos]
            pos += 1
            payload = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                payload += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(payload), min_code, iw * ih)
            if iflags & 0x40:  # de-interlace
                deint = [0] * (iw * ih)
                for src_row, y in enumerate(_interlace_order(ih)):
                    deint[y * iw:(y + 1) * iw] = (
                        idx[src_row * iw:(src_row + 1) * iw]
                    )
                idx = deint
            rgb = bytearray(3 * iw * ih)
            for i, p in enumerate(idx):
                r, g, bl = pal[p]
                rgb[3 * i] = r
                rgb[3 * i + 1] = g
                rgb[3 * i + 2] = bl
            return iw, ih, bytes(rgb)
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected block 0x{b:02x}")
    raise ValueError("no image data")
