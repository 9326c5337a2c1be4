"""Pure-stdlib WebP-lossless (VP8L) codec — subset profile (N5).

Implements the public WebP Lossless Bitstream Specification (Google,
2012; RIFF container per RFC 2083 conventions): the VP8L signature and
14-bit dimension header, canonical prefix codes transmitted either as
SIMPLE codes (1-2 symbols) or via the DEFLATE-style code-length code
(3-bit lengths in the fixed kOrder permutation, repeat ops 16/17/18),
the five-code entropy group (green+length+cache, red, blue, alpha,
distance), LZ77 back-references with the prefix+extra-bit value coding
and the 120-entry 2D neighborhood distance map, and the SUBTRACT-GREEN
transform.

Subset profile (declared, like the FLAC tier): one entropy group (no
meta-prefix image), no color cache, no predictor/color/palette
transforms — every stream the ENCODER emits is spec-conformant and any
stock WebP decoder reads it; the DECODER raises cleanly on features
outside the subset.

Scale note: per-image Python decode is the correctness reference; the
100 TB swap is libwebp behind the same decode_image hook.  Decode is
embarrassingly parallel — one image per task.
"""

from __future__ import annotations

import heapq
import struct

# 120-entry 2D neighborhood distance map (spec §4.2.2): (dx, dy) pairs,
# distance code c (1-based) maps to max(1, dy*width + dx).
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (-8, 3), (5, 7), (-5, 7), (7, 5),
    (-7, 5), (8, 4), (3, 8), (-3, 8), (8, 5), (-8, 5), (6, 7), (-6, 7),
]
assert len(_DIST_MAP) == 120
# kOrder for the code-length code (spec §5.2.2)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8,
             9, 10, 11, 12, 13, 14, 15, 16]

GREEN_ALPHABET = 256 + 24  # no color cache in the subset
_MAX_LEN_BITS = 15


class _BitWriter:
    """LSB-first bit packing (VP8L convention, unlike JPEG)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, width: int) -> None:
        self.acc |= (v & ((1 << width) - 1)) << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def code(self, bits_msb: int, length: int) -> None:
        # prefix codes are written MSB-of-code-first, one bit at a time
        for i in range(length - 1, -1, -1):
            self.bits((bits_msb >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bits(self, width: int) -> int:
        while self.n < width:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc |= b << self.n
            self.n += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return v


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical (DEFLATE numbering)."""
    pairs = sorted(
        (ln, sym) for sym, ln in enumerate(lengths) if ln > 0
    )
    codes = {}
    code = 0
    prev_len = 0
    for ln, sym in pairs:
        code <<= (ln - prev_len)
        codes[sym] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class _Tree:
    """Bit-at-a-time canonical prefix decoder (VP8L reads MSB-first)."""

    __slots__ = ("single", "table")

    def __init__(self, lengths: list[int]) -> None:
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            return
        self.single = None
        self.table = {}
        for sym, (code, ln) in _canonical_codes(lengths).items():
            self.table[(ln, code)] = sym

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        while True:
            code = (code << 1) | br.bits(1)
            ln += 1
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
            if ln > _MAX_LEN_BITS:
                raise ValueError("invalid prefix code")


def _huffman_lengths(
    freqs: dict[int, int], alphabet: int, limit: int = _MAX_LEN_BITS
) -> list[int]:
    """Depth-LIMITED Huffman code lengths: plain Huffman, and while any
    code exceeds ``limit`` the frequencies are halved (floor at 1) and
    the tree rebuilt — the classic flattening device (zlib uses the
    same idea); each halving strictly reduces the worst depth, so it
    terminates at the uniform code at the latest.  The limit matters
    twice in VP8L: symbol codes cap at 15 bits, and the code-length
    code's OWN lengths travel in 3-bit fields, capping it at 7."""
    nz = [(f, s) for s, f in freqs.items() if f > 0]
    lengths = [0] * alphabet
    if not nz:
        return lengths
    if len(nz) == 1:
        lengths[nz[0][1]] = 1
        return lengths
    cur = {s: f for f, s in nz}
    while True:
        heap = [(f, s, (s,)) for s, f in cur.items()]
        heapq.heapify(heap)
        depth = {s: 0 for s in cur}
        while len(heap) > 1:
            f1, _, g1 = heapq.heappop(heap)
            f2, t2, g2 = heapq.heappop(heap)
            for s in g1 + g2:
                depth[s] += 1
            heapq.heappush(heap, (f1 + f2, t2, g1 + g2))
        if max(depth.values()) <= limit:
            for s, d in depth.items():
                lengths[s] = d
            return lengths
        cur = {s: max(1, f // 2) for s, f in cur.items()}


def _value_to_prefix(v: int) -> tuple[int, int, int]:
    """Length/distance value -> (prefix_code, extra_bits, extra_val)
    (spec §4.2.1: codes 0-3 direct, then pairs doubling)."""
    if v < 1:
        raise ValueError("value must be >= 1")
    if v <= 4:
        return v - 1, 0, 0
    extra = (v - 1).bit_length() - 2
    offset = (2 + (((v - 1) >> extra) & 1)) << extra
    return (
        2 * extra + 2 + (((v - 1) >> extra) & 1),
        extra,
        v - offset - 1,
    )


def _prefix_to_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _write_code_lengths(bw: _BitWriter, lengths: list[int]) -> None:
    """Transmit a normal (non-simple) prefix code: 3-bit code-length-
    code lengths in kOrder, then symbol lengths coded with that code —
    zero-runs compressed with op 17/18, no max_symbol shortcut."""
    # build the code-length code over symbols 0..18 (lengths + ops)
    ops: list[tuple[int, int, int]] = []  # (symbol, extra_bits, extra)
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            run = 1
            while i + run < n and lengths[i + run] == 0:
                run += 1
            left = run
            while left >= 11:
                take = min(left, 138)
                ops.append((18, 7, take - 11))
                left -= take
            while left >= 3:
                take = min(left, 10)
                ops.append((17, 3, take - 3))
                left -= take
            for _ in range(left):
                ops.append((0, 0, 0))
            i += run
        else:
            ops.append((lengths[i], 0, 0))
            i += 1
    clfreq: dict[int, int] = {}
    for sym, _, _ in ops:
        clfreq[sym] = clfreq.get(sym, 0) + 1
    cl_lengths = _huffman_lengths(clfreq, 19, limit=7)
    if sum(1 for x in cl_lengths if x) == 1:
        # the CL decoder needs a readable code: give the lone symbol a
        # 1-bit code by adding a never-used partner of equal length
        lone = cl_lengths.index(1)
        partner = 0 if lone != 0 else 1
        cl_lengths[partner] = 1
        clfreq[partner] = 0
    # 4 bits: num_code_lengths - 4 (in kOrder, trailing zeros dropped)
    order_lengths = [cl_lengths[s] for s in _CL_ORDER]
    num = len(order_lengths)
    while num > 4 and order_lengths[num - 1] == 0:
        num -= 1
    bw.bits(num - 4, 4)
    for j in range(num):
        bw.bits(order_lengths[j], 3)
    bw.bits(0, 1)  # no max_symbol shortcut
    cl_codes = _canonical_codes(cl_lengths)
    for sym, extra_bits, extra in ops:
        c, ln = cl_codes[sym]
        bw.code(c, ln)
        if extra_bits:
            bw.bits(extra, extra_bits)


def _read_code_lengths(br: _BitReader, alphabet: int) -> list[int]:
    num = br.bits(4) + 4
    cl_lengths = [0] * 19
    for j in range(num):
        cl_lengths[_CL_ORDER[j]] = br.bits(3)
    if br.bits(1):  # max_symbol shortcut
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet
    tree = _Tree(cl_lengths)
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        sym = tree.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                lengths[i] = prev
                i += 1
        elif sym == 17:
            i += 3 + br.bits(3)
        else:
            i += 11 + br.bits(7)
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> None:
    syms = [s for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(syms) <= 2 and max(syms) <= 255:
        bw.bits(1, 1)  # simple
        bw.bits(len(syms) - 1, 1)
        if syms[0] <= 1 and len(syms) == 1:
            bw.bits(0, 1)  # 1-bit first symbol
            bw.bits(syms[0], 1)
        else:
            bw.bits(1, 1)  # 8-bit first symbol
            bw.bits(syms[0], 8)
        if len(syms) == 2:
            bw.bits(syms[1], 8)
        return
    bw.bits(0, 1)
    _write_code_lengths(bw, lengths)


def _read_prefix_code(br: _BitReader, alphabet: int) -> _Tree:
    if br.bits(1):  # simple
        num_symbols = br.bits(1) + 1
        if br.bits(1):
            s0 = br.bits(8)
        else:
            s0 = br.bits(1)
        lengths = [0] * alphabet
        if num_symbols == 1:
            lengths[s0] = 1
            t = _Tree(lengths)
            return t
        s1 = br.bits(8)
        lengths[s0] = 1
        lengths[s1] = 1
        return _Tree(lengths)
    return _Tree(_read_code_lengths(br, alphabet))


def _lz77(pixels: list[int], width: int) -> list[tuple]:
    """Greedy LZ77 over the ARGB pixel sequence: emit ('lit', argb) or
    ('copy', length, dist). Window bounded, min match 3."""
    n = len(pixels)
    index: dict[int, list[int]] = {}
    out = []
    i = 0
    while i < n:
        best_len = 0
        best_dist = 0
        if i + 2 < n:
            key = (pixels[i], pixels[i + 1], pixels[i + 2]).__hash__()
            for j in reversed(index.get(key, ())):
                if i - j > 1 << 17:
                    break
                length = 0
                while (i + length < n and length < 4096
                       and pixels[j + length] == pixels[i + length]):
                    length += 1
                if length >= 3 and length > best_len:
                    best_len = length
                    best_dist = i - j
                    if length >= 64:
                        break
        if best_len >= 3:
            out.append(("copy", best_len, best_dist))
            for k in range(i, min(i + best_len, n - 2)):
                key = (pixels[k], pixels[k + 1], pixels[k + 2]).__hash__()
                index.setdefault(key, []).append(k)
            i += best_len
        else:
            out.append(("lit", pixels[i]))
            if i + 2 < n:
                key = (pixels[i], pixels[i + 1], pixels[i + 2]).__hash__()
                index.setdefault(key, []).append(i)
            i += 1
    return out


def encode_webp_lossless(
    rgb: bytes, width: int, height: int, subtract_green: bool = True
) -> bytes:
    """Encode row-major RGB8 as a real lossless WebP (VP8L): optional
    SUBTRACT-GREEN transform, greedy LZ77, canonical prefix codes
    transmitted via the code-length code; no color cache, one entropy
    group.  Output parses in any stock WebP decoder."""
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length != 3*w*h")
    if not (1 <= width <= 1 << 14 and 1 <= height <= 1 << 14):
        raise ValueError("VP8L dimensions are 14-bit (1..16384)")
    pixels = []
    for i in range(width * height):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        if subtract_green:
            r = (r - g) & 0xFF
            b = (b - g) & 0xFF
        pixels.append((0xFF << 24) | (r << 16) | (g << 8) | b)

    tokens = _lz77(pixels, width)
    gfreq: dict[int, int] = {}
    rfreq: dict[int, int] = {}
    bfreq: dict[int, int] = {}
    afreq: dict[int, int] = {}
    dfreq: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            argb = t[1]
            gfreq[(argb >> 8) & 0xFF] = gfreq.get((argb >> 8) & 0xFF, 0) + 1
            rfreq[(argb >> 16) & 0xFF] = rfreq.get((argb >> 16) & 0xFF, 0) + 1
            bfreq[argb & 0xFF] = bfreq.get(argb & 0xFF, 0) + 1
            afreq[argb >> 24] = afreq.get(argb >> 24, 0) + 1
        else:
            _, length, dist = t
            lc, _, _ = _value_to_prefix(length)
            gfreq[256 + lc] = gfreq.get(256 + lc, 0) + 1
            dc, _, _ = _value_to_prefix(dist + 120)
            dfreq[dc] = dfreq.get(dc, 0) + 1

    glen = _huffman_lengths(gfreq, GREEN_ALPHABET)
    rlen = _huffman_lengths(rfreq, 256)
    blen = _huffman_lengths(bfreq, 256)
    alen = _huffman_lengths(afreq, 256)
    dlen = _huffman_lengths(dfreq, 40)
    gcodes = _canonical_codes(glen)
    rcodes = _canonical_codes(rlen)
    bcodes = _canonical_codes(blen)
    acodes = _canonical_codes(alen)
    dcodes = _canonical_codes(dlen)

    bw = _BitWriter()
    bw.bits(0x2F, 8)  # VP8L signature
    bw.bits(width - 1, 14)
    bw.bits(height - 1, 14)
    bw.bits(0, 1)  # alpha hint
    bw.bits(0, 3)  # version
    if subtract_green:
        bw.bits(1, 1)  # transform present
        bw.bits(2, 2)  # SUBTRACT_GREEN
    bw.bits(0, 1)  # no more transforms
    bw.bits(0, 1)  # no color cache
    bw.bits(0, 1)  # no meta-prefix image
    for lengths in (glen, rlen, blen, alen, dlen):
        _write_prefix_code(bw, lengths)

    def put(codes, sym):
        c, ln = codes[sym]
        if ln:
            bw.code(c, ln)
        # single-symbol codes cost zero bits (the decoder knows)

    single_g = sum(1 for x in glen if x) == 1
    for t in tokens:
        if t[0] == "lit":
            argb = t[1]
            if not single_g:
                put(gcodes, (argb >> 8) & 0xFF)
            if len(rcodes) > 1:
                put(rcodes, (argb >> 16) & 0xFF)
            if len(bcodes) > 1:
                put(bcodes, argb & 0xFF)
            if len(acodes) > 1:
                put(acodes, argb >> 24)
        else:
            _, length, dist = t
            lc, le, lv = _value_to_prefix(length)
            if not single_g:
                put(gcodes, 256 + lc)
            if le:
                bw.bits(lv, le)
            dc, de, dv = _value_to_prefix(dist + 120)
            if len(dcodes) > 1:
                put(dcodes, dc)
            if de:
                bw.bits(dv, de)
    payload = bw.flush()

    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_webp_lossless(data: bytes) -> tuple[int, int, bytes]:
    """Decode a subset-profile lossless WebP -> (width, height, RGB8).
    Supports the SUBTRACT-GREEN transform, one entropy group, LZ77
    back-references with the full prefix+extra value coding and the
    120-entry neighborhood distance map; raises cleanly on color
    cache, meta-prefix images, or other transforms (out of subset)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP RIFF")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        sz = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if cid == b"VP8L":
            payload = data[pos + 8:pos + 8 + sz]
            break
        if cid == b"VP8 " or cid == b"VP8X":
            raise ValueError("lossy/extended WebP out of subset")
        pos += 8 + sz + (sz & 1)
    if payload is None:
        raise ValueError("no VP8L chunk")
    br = _BitReader(payload)
    if br.bits(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    width = br.bits(14) + 1
    height = br.bits(14) + 1
    br.bits(1)  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    subtract_green = False
    while br.bits(1):  # transforms
        ttype = br.bits(2)
        if ttype == 2:
            subtract_green = True
        else:
            raise ValueError(
                f"transform {ttype} out of subset (predictor/color/"
                "palette need a full decoder)"
            )
    if br.bits(1):
        raise ValueError("color cache out of subset")
    if br.bits(1):
        raise ValueError("meta-prefix image out of subset")
    trees = [
        _read_prefix_code(br, GREEN_ALPHABET),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 40),
    ]
    n = width * height
    pixels: list[int] = []
    while len(pixels) < n:
        s = trees[0].read(br)
        if s < 256:
            g = s
            r = trees[1].read(br)
            b = trees[2].read(br)
            a = trees[3].read(br)
            pixels.append((a << 24) | (r << 16) | (g << 8) | b)
        elif s < 280:
            length = _prefix_to_value(s - 256, br)
            dcode = _prefix_to_value(trees[4].read(br), br)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = max(1, dy * width + dx)
            if dist > len(pixels):
                raise ValueError("LZ77 distance before image start")
            for _ in range(length):
                pixels.append(pixels[-dist])
                if len(pixels) > n:
                    raise ValueError("LZ77 copy past image end")
        else:
            raise ValueError("color-cache symbol in cache-free stream")
    rgb = bytearray(3 * n)
    for i, argb in enumerate(pixels):
        r = (argb >> 16) & 0xFF
        g = (argb >> 8) & 0xFF
        b = argb & 0xFF
        if subtract_green:
            r = (r + g) & 0xFF
            b = (b + g) & 0xFF
        rgb[3 * i] = r
        rgb[3 * i + 1] = g
        rgb[3 * i + 2] = b
    return width, height, bytes(rgb)
