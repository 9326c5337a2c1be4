"""Minimal pure-stdlib+numpy baseline JPEG codec (SURVEY §2.11 N5).

The container ships no imaging libraries, but baseline sequential JPEG
is a public spec (ITU-T T.81) whose primitives — canonical Huffman
coding, zigzag run-length coding, an 8×8 DCT — need nothing beyond the
standard library and numpy.  So the N5 ``decode_image`` hook can be
*real* for baseline JPEG too:

- **Decoder** (the genuine article, general within its declared scope):
  marker parse (SOI/DQT/SOF0/DHT/SOS/EOI), canonical Huffman tables
  built from the stream's own DHT segments, entropy decode with byte
  un-stuffing (FF 00), DC prediction + EXTEND, AC run/size with
  EOB/ZRL, dequantization, zigzag de-scan, full floating-point 8×8
  IDCT (numpy basis-matrix product), level shift and clamp.
  Scope: 8-bit baseline sequential, one GRAYSCALE component in a
  sequential scan or three YCbCr components in ONE interleaved scan
  with integer-ratio sampling factors (4:4:4 / 4:2:2 / 4:2:0 —
  per-component quant/Huffman selectors, per-component DC predictors,
  MCU interleave order per T.81 A.2.3, chroma upsample by sample
  replication, YCbCr→RGB in exact int64 arithmetic so an SQL oracle
  can replay every output pixel); PLUS grayscale PROGRESSIVE frames
  (SOF2, spectral selection with any band tiling, Ah=Al=0, per-scan
  Huffman tables, general cross-block EOBRUN) via a dedicated
  multi-scan path that accumulates coefficients and reconstructs at
  EOI; PLUS restart markers in sequential scans (DRI cadence, RSTm
  sequence-checked, DC predictors reset — T.81 E.2.4).  Other shapes
  raise ``ValueError`` with the offending field.  Successive approximation, color progressive
  and arithmetic coding remain environment-gapped (a real cluster
  swaps in libjpeg-turbo behind the same hook; per-image Python
  Huffman decode is a correctness reference, not the 100 TB
  throughput path).

- **Encoder** (the oracle's instrument): emits standard-structure
  baseline files — Annex K style Huffman tables written into DHT (the
  decoder trusts only the stream, so the files stay valid JPEG for any
  stock decoder), quantization table of all ones, one grayscale
  component.  The certification images are built from CONSTANT 8×8
  blocks: a constant block's FDCT is DC-only (DC = 8·(v−128), all AC
  zero), which with a unit quantizer survives quantize→dequantize→IDCT
  bit-exactly — so DuckDB can recompute every decoded pixel in closed
  form without ever seeing a JPEG byte.  The AC path (run/size coding,
  zigzag, EXTEND of negative coefficients) is exercised one-sided in
  tests against a straight numpy IDCT reference.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index = zigzag position, value = raster position
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K luminance Huffman tables (bits per code length 1..16, values)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# Annex K chrominance Huffman tables (K.3.3.2)
DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Progressive AC table: baseline Annex K has no EOBn symbols (0x10..0xE0),
# which progressive band scans need for cross-block EOB runs — so the
# progressive encoder writes its own canonical table into DHT (the decoder
# trusts only the stream): every symbol at length 9, codes 0..n-1, the
# all-ones word unused.  176 symbols = EOB0 + EOB1..EOB14 + ZRL + all
# (run, size) pairs with size 1..10.
AC_PROG_VALS = (
    [0x00]
    + [r << 4 for r in range(1, 15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
AC_PROG_BITS = [0] * 8 + [len(AC_PROG_VALS)] + [0] * 7

# Exact-integer YCbCr -> RGB (JFIF constants scaled by 10^6; round-half-up
# via +500000 then floor division).  The +_YCC_OFF shift keeps every
# numerator positive so floor division == truncating division and Python,
# numpy int64, Spark `div` and DuckDB `//` all agree bit-for-bit — the
# property the SQL oracle relies on.
_YCC_SCALE = 1_000_000
_YCC_OFF = 512


def ycbcr_to_rgb_exact(y: "np.ndarray", cb: "np.ndarray", cr: "np.ndarray"):
    """Vectorized exact-integer color conversion (int64 in, uint8 out)."""
    y = y.astype(np.int64)
    d_cb = cb.astype(np.int64) - 128
    d_cr = cr.astype(np.int64) - 128
    off = _YCC_OFF * _YCC_SCALE + 500_000
    r = (_YCC_SCALE * y + 1_402_000 * d_cr + off) // _YCC_SCALE - _YCC_OFF
    g = (
        _YCC_SCALE * y - 344_136 * d_cb - 714_136 * d_cr + off
    ) // _YCC_SCALE - _YCC_OFF
    b = (_YCC_SCALE * y + 1_772_000 * d_cb + off) // _YCC_SCALE - _YCC_OFF
    return (
        np.clip(r, 0, 255).astype(np.uint8),
        np.clip(g, 0, 255).astype(np.uint8),
        np.clip(b, 0, 255).astype(np.uint8),
    )


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical Huffman per T.81 C.2."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# IDCT basis: M[u, x] = C(u)/2 * cos((2x+1) u pi / 16); block = M.T @ S @ M
_M = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)



class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                raise ValueError(f"unexpected marker FF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | byte
        self.n += 8
        # keep only the pending bits: without this mask the accumulator
        # grows one byte per scan byte and every shift turns O(n) —
        # quadratic decode on realistically sized scans
        self.acc &= (1 << self.n) - 1

    def restart(self, m: int) -> None:
        """Consume an expected RSTm marker at an MCU boundary: discard
        the current byte's padding bits, then require FFD0+m verbatim —
        a missing or out-of-sequence restart marker means the entropy
        stream is corrupt (T.81 E.2.4)."""
        self.acc = 0
        self.n = 0
        if (self.pos + 1 >= len(self.data)
                or self.data[self.pos] != 0xFF
                or self.data[self.pos + 1] != 0xD0 + (m & 7)):
            got = self.data[self.pos:self.pos + 2].hex()
            raise ValueError(
                f"expected RST{m & 7} at scan offset {self.pos}, got {got}"
            )
        self.pos += 2

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _build_decode_table(bits: list[int], vals: list[int]):
    """(code, length) -> value map for stream-driven Huffman decode."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map SSSS additional bits to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_progressive(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a progressive (SOF2) JPEG — grayscale OR interleaved
    YCbCr color with integer chroma subsampling.

    Scan kinds (T.81 G.1): DC first (interleaved across components or
    single-component) with point transform Al; DC refinement (one raw
    bit per block, Ah=Al+1); AC band first scans (always
    single-component, general cross-block EOBRUN); AC refinement scans
    (correction bits for nonzero history, Ah=Al+1).  Coefficients
    accumulate across scans per component; dequant + IDCT run once at
    EOI, then chroma upsamples by replication and color converts with
    the exact int64 arithmetic — the same back end as the baseline
    color path.  Non-interleaved scans cover each component's OWN
    ceil-sized block grid inside the MCU-padded coefficient plane
    (T.81 A.2.2), which is where w/h not divisible by the MCU size
    bites."""
    pos = 2
    qtables: dict[int, list[int]] = {}
    raw_huff: dict[tuple[int, int], tuple] = {}
    w = h = 0
    comps: list[tuple[int, int, int, int]] = []  # (cid, Hi, Vi, Tq)
    coeffs: dict[int, "np.ndarray"] = {}
    grids: dict[int, tuple[int, int, int, int]] = {}  # pbw, pbh, nbw, nbh
    mcus_w = mcus_h = hmax = vmax = 0
    seen_dc: set[int] = set()
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker sync lost at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = list(seg[p + 1:p + 65])
                p += 65
            pos += seglen
        elif marker == 0xC2:
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit precision unsupported")
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component images unsupported")
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            if ncomp == 1:
                # single-component frames are scanned non-interleaved:
                # sampling factors play no role (T.81 A.2.2)
                cid0, _, _, tq0 = comps[0]
                comps = [(cid0, 1, 1, tq0)]
            hmax = max(hi for _, hi, _, _ in comps)
            vmax = max(vi for _, _, vi, _ in comps)
            for cid, hi, vi, _ in comps:
                if hmax % hi or vmax % vi:
                    raise ValueError(
                        f"non-integer sampling ratio for component {cid}"
                    )
            mcus_w = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_h = (h + 8 * vmax - 1) // (8 * vmax)
            for cid, hi, vi, _ in comps:
                pbw, pbh = mcus_w * hi, mcus_h * vi
                nbw = (-(-(w * hi) // hmax) + 7) // 8
                nbh = (-(-(h * vi) // vmax) + 7) // 8
                grids[cid] = (pbw, pbh, nbw, nbh)
                coeffs[cid] = np.zeros((pbh * pbw, 64), dtype=np.int64)
            pos += seglen
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nval = sum(bits)
                raw_huff[(tc, th)] = _build_decode_table(
                    bits, list(seg[p + 17:p + 17 + nval])
                )
                p += 17 + nval
            pos += seglen
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported in this "
                             "progressive path")
        elif marker == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF2")
            ns = seg[0]
            scan = []  # (cid, Td, Ta)
            for c in range(ns):
                cid, tt = seg[1 + 2 * c:3 + 2 * c]
                scan.append((cid, tt >> 4, tt & 0xF))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            br = _BitReader(data[pos + seglen:])
            by_id = {cid: (hi, vi) for cid, hi, vi, _ in comps}

            def comp_raster(cid: int) -> list[int]:
                # non-interleaved order: the component's own ceil grid,
                # mapped into its MCU-padded plane
                pbw, _, nbw, nbh = grids[cid]
                return [by * pbw + bx
                        for by in range(nbh) for bx in range(nbw)]

            if ss == 0:  # DC scan (first or refinement); Se must be 0
                if se != 0:
                    raise ValueError("DC scan must have Se=0")
                # slot sequence: interleaved MCU order, or raster for ns=1
                if ns == 1:
                    cid = scan[0][0]
                    slots = [(cid, b) for b in comp_raster(cid)]
                else:
                    slots = []
                    for my in range(mcus_h):
                        for mx in range(mcus_w):
                            for cid, _, _ in scan:
                                hi, vi = by_id[cid]
                                pbw = grids[cid][0]
                                for v in range(vi):
                                    for hh in range(hi):
                                        slots.append(
                                            (cid,
                                             (my * vi + v) * pbw
                                             + mx * hi + hh)
                                        )
                if ah == 0:  # first: DPCM of DC >> al
                    tabs = {cid: raw_huff[(0, td)] for cid, td, _ in scan}
                    pred = {cid: 0 for cid, _, _ in scan}
                    for cid, b in slots:
                        size = _huff_decode(br, tabs[cid])
                        pred[cid] += _extend(br.bits(size), size)
                        coeffs[cid][b, 0] = pred[cid] << al
                    seen_dc.update(cid for cid, _, _ in scan)
                else:  # refinement: one raw bit per block (G.1.2.1)
                    if ah != al + 1:
                        raise ValueError("DC refinement must step one bit")
                    for cid, b in slots:
                        if br.bit():
                            coeffs[cid][b, 0] |= 1 << al
            else:  # AC scans are single-component by definition
                if ns != 1:
                    raise ValueError("interleaved AC scan is illegal "
                                     "in progressive mode")
                cid, _, ta = scan[0]
                if cid not in seen_dc:
                    raise ValueError("AC scan before DC scan")
                C = coeffs[cid]
                ac_tab = raw_huff[(1, ta)]
                blocks = comp_raster(cid)
                if ah == 0:  # AC band first scan (point-transformed)
                    eobrun = 0
                    for b in blocks:
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            rs = _huff_decode(br, ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                eobrun = (1 << r) - 1 + (
                                    br.bits(r) if r else 0
                                )
                                break
                            k += r
                            if k > se:
                                raise ValueError("AC run past band end")
                            C[b, k] = _extend(br.bits(s), s) << al
                            k += 1
                    if eobrun:
                        raise ValueError("EOBRUN past last block")
                else:  # AC refinement scan (G.1.2.3)
                    if ah != al + 1:
                        raise ValueError("AC refinement must step one bit")
                    p1 = 1 << al
                    eobrun = 0

                    def refine(b: int, k: int) -> None:
                        # correction bit for a nonzero-history coefficient
                        if br.bit() and (abs(int(C[b, k])) & p1) == 0:
                            C[b, k] += p1 if C[b, k] > 0 else -p1

                    for b in blocks:
                        if eobrun:
                            eobrun -= 1
                            for k in range(ss, se + 1):
                                if C[b, k]:
                                    refine(b, k)
                            continue
                        k = ss
                        while k <= se:
                            rs = _huff_decode(br, ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0 and r < 15:  # EOBn
                                eobrun = (1 << r) - 1 + (
                                    br.bits(r) if r else 0
                                )
                                for kk in range(k, se + 1):
                                    if C[b, kk]:
                                        refine(b, kk)
                                k = se + 1
                                break
                            if s == 0:  # ZRL: 16 zero-history skips
                                val = 0
                                r = 16
                            else:
                                if s != 1:
                                    raise ValueError(
                                        "refinement magnitude must be 1"
                                    )
                                val = p1 if br.bit() else -p1
                                # r zero-history skips precede placement
                            while k <= se:
                                if C[b, k]:
                                    refine(b, k)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val:
                                if k > se:
                                    raise ValueError(
                                        "refinement placement past band end"
                                    )
                                C[b, k] = val
                                k += 1
                            elif k <= se:
                                # ZRL consumed its 16 zeros; position k
                                # is the 17th zero-history slot or band
                                # end
                                pass
                    if eobrun:
                        raise ValueError("EOBRUN past last block")
            # resume marker parse after the entropy bytes this scan used
            pos = pos + seglen + br.pos
        else:
            raise ValueError(f"unexpected marker FF{marker:02X} "
                             "in progressive stream")
    if not comps or not seen_dc:
        raise ValueError("missing SOF2/DC scan")
    planes = {}
    for cid, hi, vi, tq in comps:
        if tq not in qtables:
            raise ValueError(f"SOF2 references missing quant table {tq}")
        if cid not in seen_dc:
            raise ValueError(f"component {cid} never scanned")
        quant = np.array(qtables[tq], dtype=np.float64)
        pbw, pbh = grids[cid][0], grids[cid][1]
        img = np.zeros((pbh * 8, pbw * 8), dtype=np.uint8)
        C = coeffs[cid]
        for b in range(pbh * pbw):
            S = np.zeros(64, dtype=np.float64)
            S[ZIGZAG] = C[b].astype(np.float64) * quant
            block = _M.T @ S.reshape(8, 8) @ _M
            px = np.clip(np.round(block + 128.0), 0, 255).astype(np.uint8)
            by, bx = divmod(b, pbw)
            img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = px
        planes[cid] = img
    if len(comps) == 1:
        return w, h, 1, planes[comps[0][0]][:h, :w].tobytes()
    full = []
    for cid, hi, vi, _ in comps:
        pl = np.repeat(
            np.repeat(planes[cid], vmax // vi, axis=0), hmax // hi, axis=1
        )
        full.append(pl[:h, :w])
    r, g, b = ycbcr_to_rgb_exact(full[0], full[1], full[2])
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, 3, rgb.tobytes()


# back-compat alias: the historical gray-only entry point now routes
# through the general progressive decoder
_decode_progressive_gray = _decode_progressive


def _decode_block(br: _BitReader, dc_tab, ac_tab, pred: int,
                  quant: "np.ndarray") -> tuple[int, "np.ndarray"]:
    """Entropy-decode one block; returns (new DC predictor, 8x8 uint8
    pixels after dequant + de-zigzag + IDCT + level shift)."""
    zz = np.zeros(64, dtype=np.float64)
    size = _huff_decode(br, dc_tab)
    diff = _extend(br.bits(size), size)
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_tab)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(br.bits(size), size)
        k += 1
    S = np.zeros(64, dtype=np.float64)
    S[ZIGZAG] = zz * quant  # dequant + de-zigzag
    block = _M.T @ S.reshape(8, 8) @ _M
    px = np.clip(np.round(block + 128.0), 0, 255).astype(np.uint8)
    return pred, px


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline sequential JPEG (grayscale or YCbCr color).

    Returns (width, height, ncomp, pixels): row-major 8-bit luminance
    for ncomp=1, row-major interleaved RGB for ncomp=3 (chroma
    upsampled by sample replication, color-converted with the exact
    int64 arithmetic of :func:`ycbcr_to_rgb_exact`).  Trusts only the
    stream: quant + Huffman tables from DQT/DHT, dimensions and
    per-component sampling/quant selectors from SOF0, scan component
    order and table selectors from SOS, restart cadence from DRI
    (RSTm markers are sequence-checked and reset all DC predictors).
    Raises ValueError on progressive frames, 12-bit precision,
    non-integer sampling ratios, or partially-interleaved scans."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    restart_interval = 0
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    w = h = 0
    comps: list[tuple[int, int, int, int]] = []  # (cid, Hi, Vi, Tq)
    scan: list[tuple[int, int, int]] = []  # (cid, Td, Ta)
    scan_start = None
    while pos < len(data):
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG: marker cut off at end of data")
        if data[pos] != 0xFF:
            raise ValueError(f"marker sync lost at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = list(seg[p + 1:p + 65])
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit precision unsupported")
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component images unsupported")
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker == 0xC2:  # SOF2: progressive — dedicated multi-scan path
            return _decode_progressive(data)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError(f"non-baseline frame marker FF{marker:02X}")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nval = sum(bits)
                vals = list(seg[p + 17:p + 17 + nval])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + nval
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if ns != len(comps):
                raise ValueError(
                    "partially-interleaved scans unsupported "
                    f"(scan has {ns} of {len(comps)} components)"
                )
            for c in range(ns):
                cid, tt = seg[1 + 2 * c:3 + 2 * c]
                scan.append((cid, tt >> 4, tt & 0xF))
            scan_start = pos + seglen
            break
        pos += seglen
    if scan_start is None or not w:
        raise ValueError("missing SOS/SOF0")

    if len(comps) == 1:
        # A single-component scan is NON-interleaved (T.81 A.2.2): data
        # units are pure raster over the component's own block grid and
        # sampling factors play no role — normalize them away.
        cid0, _, _, tq0 = comps[0]
        comps = [(cid0, 1, 1, tq0)]
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    for cid, hi, vi, tq in comps:
        if hmax % hi or vmax % vi:
            raise ValueError(
                f"non-integer sampling ratio for component {cid}"
            )
        if tq not in qtables:
            raise ValueError(f"SOF0 references missing quant table {tq}")
    mcus_w = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_h = (h + 8 * vmax - 1) // (8 * vmax)

    planes: dict[int, np.ndarray] = {}
    tabs: dict[int, tuple] = {}
    for cid, td, ta in scan:
        hi, vi, tq = by_id[cid]
        planes[cid] = np.zeros(
            (mcus_h * vi * 8, mcus_w * hi * 8), dtype=np.uint8
        )
        dc_tab = htables.get((0, td))
        ac_tab = htables.get((1, ta))
        if dc_tab is None or ac_tab is None:
            raise ValueError(f"SOS references missing Huffman table for "
                             f"component {cid}")
        tabs[cid] = (dc_tab, ac_tab,
                     np.array(qtables[tq], dtype=np.float64))

    br = _BitReader(data[scan_start:])
    pred = {cid: 0 for cid, _, _ in scan}
    mcu_no = 0
    for my in range(mcus_h):
        for mx in range(mcus_w):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                br.restart((mcu_no // restart_interval - 1) & 7)
                pred = {cid: 0 for cid, _, _ in scan}
            mcu_no += 1
            for cid, _, _ in scan:  # T.81 A.2.3 interleave order
                hi, vi, _ = by_id[cid]
                dc_tab, ac_tab, quant = tabs[cid]
                for v in range(vi):
                    for hh in range(hi):
                        pred[cid], px = _decode_block(
                            br, dc_tab, ac_tab, pred[cid], quant
                        )
                        y0 = (my * vi + v) * 8
                        x0 = (mx * hi + hh) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = px

    if len(comps) == 1:
        return w, h, 1, planes[comps[0][0]][:h, :w].tobytes()

    # upsample chroma by sample replication, crop, exact color convert
    full = []
    for cid, hi, vi, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    r, g, b = ycbcr_to_rgb_exact(full[0], full[1], full[2])
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, 3, rgb.tobytes()


def decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    """Back-compat wrapper: decode a single-component baseline JPEG,
    returning (width, height, luminance bytes); ValueError on color."""
    w, h, ncomp, px = decode_jpeg(data)
    if ncomp != 1:
        raise ValueError("only single-component (grayscale)")
    return w, h, px
