"""JPEG ENCODE side (fixture writers for the N5 decode certifications).

The encoders that produce the spec-conformant baseline / progressive /
successive-approximation streams the decode queries certify against —
split out of operators/jpeg_codec.py (decode side) to keep modules
under the house size bound.  Shares the Annex-K tables and canonical
Huffman construction with the decoder.
"""

from __future__ import annotations

import struct

from .jpeg_codec import (
    AC_BITS,
    AC_BITS_C,
    AC_PROG_BITS,
    AC_PROG_VALS,
    AC_VALS,
    AC_VALS_C,
    DC_BITS,
    DC_BITS_C,
    DC_VALS,
    DC_VALS_C,
    ZIGZAG,
    _canonical_codes,
)

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)

    def restart(self, m: int) -> None:
        """Emit RSTm: 1-fill to a byte boundary (stuffed like any other
        entropy byte), then the bare FFD0+m marker — markers are never
        stuffed (T.81 B.1.1.5 / E.2.4)."""
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, 0xD0 + (m & 7)])


def _category(v: int) -> int:
    v = int(v)
    return 0 if v == 0 else abs(v).bit_length()


def _code_value(v: int, size: int) -> int:
    """The SSSS additional bits: negative values are encoded as
    v - 1 + 2^size (one's-complement style, T.81 F.1.2.1)."""
    return v if v >= 0 else v + (1 << size) - 1


def _segment(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _encode_block(bw: _BitWriter, blk: list[int], prev_dc: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Entropy-encode one zigzag-ordered quantized block; returns the new
    DC predictor (T.81 F.1.2: DC diff category + additional bits, AC
    run/size with ZRL and EOB)."""
    diff = blk[0] - prev_dc
    size = _category(diff)
    code, length = dc_codes[size]
    bw.put(code, length)
    if size:
        bw.put(_code_value(diff, size), size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if blk[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = blk[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.put(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        bw.put(code, length)
        bw.put(_code_value(v, size), size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.put(code, length)
    return blk[0]


def encode_jpeg_gray(coeff_blocks: list[list[int]], blocks_w: int,
                     blocks_h: int, restart_interval: int = 0) -> bytes:
    """Encode a grayscale baseline JPEG from per-block ZIGZAG-ordered
    quantized coefficient lists (64 ints each; quant table = all ones).
    Blocks are raster-ordered.  The standard-structure choice (Annex K
    Huffman tables in DHT, SOF0, one component) keeps the output a
    valid JPEG for any decoder.  ``restart_interval`` > 0 writes a DRI
    segment and an RSTm marker (m cycling 0-7) between every interval
    of MCUs, resetting the DC predictor — T.81 E.2.4."""
    assert len(coeff_blocks) == blocks_w * blocks_h
    w, h = blocks_w * 8, blocks_h * 8
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)

    bw = _BitWriter()
    prev_dc = 0
    for i, blk in enumerate(coeff_blocks):
        if restart_interval and i and i % restart_interval == 0:
            bw.restart((i // restart_interval - 1) & 7)
            prev_dc = 0
        prev_dc = _encode_block(bw, blk, prev_dc, dc_codes, ac_codes)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _segment(0xFFDB, bytes([0]) + bytes([1] * 64))  # DQT id0, unit
    if restart_interval:
        out += _segment(0xFFDD, struct.pack(">H", restart_interval))
    out += _segment(  # SOF0: 8-bit, h x w, 1 component, no subsampling
        0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )
    out += _segment(
        0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    )
    out += _segment(
        0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    )
    out += _segment(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def constant_block_coeffs(value: int) -> list[int]:
    """Zigzag coefficient list of a CONSTANT 8x8 block under a unit
    quantizer: DC = 8*(value-128) exactly (FDCT of a constant), all AC
    zero — the quantize/dequantize/IDCT round trip is bit-exact."""
    blk = [0] * 64
    blk[0] = 8 * (value - 128)
    return blk


def encode_jpeg_color_420(
    y_blocks: list[list[int]],
    cb_blocks: list[list[int]],
    cr_blocks: list[list[int]],
    mcus_w: int,
    mcus_h: int,
    width: int | None = None,
    height: int | None = None,
) -> bytes:
    """Encode a 4:2:0 YCbCr baseline JPEG with ONE interleaved scan.

    Inputs are zigzag-ordered quantized coefficient lists (quant tables
    all ones): ``y_blocks`` has 4 per MCU in T.81 A.2.3 order
    (``mcu*4 + v*2 + h``), ``cb_blocks``/``cr_blocks`` one per MCU.
    Standard structure throughout — Annex K luma tables as DC0/AC0,
    Annex K chroma tables as DC1/AC1, component ids 1/2/3 with sampling
    0x22/0x11/0x11 — so the output is a valid JPEG for any stock
    decoder.  ``width``/``height`` default to the full MCU grid
    (16*mcus) but may be smaller to exercise decoder cropping."""
    assert len(y_blocks) == 4 * mcus_w * mcus_h
    assert len(cb_blocks) == mcus_w * mcus_h
    assert len(cr_blocks) == mcus_w * mcus_h
    w = width if width is not None else 16 * mcus_w
    h = height if height is not None else 16 * mcus_h
    assert 16 * (mcus_w - 1) < w <= 16 * mcus_w
    assert 16 * (mcus_h - 1) < h <= 16 * mcus_h
    dc_y = _canonical_codes(DC_BITS, DC_VALS)
    ac_y = _canonical_codes(AC_BITS, AC_VALS)
    dc_c = _canonical_codes(DC_BITS_C, DC_VALS_C)
    ac_c = _canonical_codes(AC_BITS_C, AC_VALS_C)

    bw = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}  # per-component DC predictors
    for mcu in range(mcus_w * mcus_h):
        for i in range(4):
            pred[1] = _encode_block(bw, y_blocks[mcu * 4 + i], pred[1],
                                    dc_y, ac_y)
        pred[2] = _encode_block(bw, cb_blocks[mcu], pred[2], dc_c, ac_c)
        pred[3] = _encode_block(bw, cr_blocks[mcu], pred[3], dc_c, ac_c)

    out = bytearray(b"\xff\xd8")  # SOI
    # both unit quant tables in one DQT segment
    out += _segment(
        0xFFDB, bytes([0]) + bytes([1] * 64) + bytes([1]) + bytes([1] * 64)
    )
    out += _segment(  # SOF0: Y 2x2 Tq0, Cb/Cr 1x1 Tq1
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _segment(0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _segment(0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    out += _segment(
        0xFFC4, bytes([0x01]) + bytes(DC_BITS_C) + bytes(DC_VALS_C)
    )
    out += _segment(
        0xFFC4, bytes([0x11]) + bytes(AC_BITS_C) + bytes(AC_VALS_C)
    )
    out += _segment(  # SOS: 3 components, Y->tables 0, chroma->tables 1
        0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)

def encode_jpeg_gray_progressive(
    coeff_blocks: list[list[int]],
    blocks_w: int,
    blocks_h: int,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
) -> bytes:
    """Encode a grayscale PROGRESSIVE (spectral-selection) JPEG: an SOF2
    frame whose first scan carries every block's DC coefficient and each
    subsequent scan one AC band [Ss, Se] — T.81 G.1, with Ah=Al=0 (no
    successive approximation).  Per-block end-of-band is coded as EOB0
    (EOBRUN=1); the decoder handles general EOBRUN.  Bands must tile
    1..63 in order."""
    assert len(coeff_blocks) == blocks_w * blocks_h
    flat = [b for (a, b) in bands]
    assert [a for (a, _) in bands] == [1] + [x + 1 for x in flat[:-1]]
    assert flat[-1] == 63
    w, h = blocks_w * 8, blocks_h * 8
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_PROG_BITS, AC_PROG_VALS)

    out = bytearray(b"\xff\xd8")
    out += _segment(0xFFDB, bytes([0]) + bytes([1] * 64))
    out += _segment(  # SOF2: progressive DCT
        0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )
    out += _segment(0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _segment(
        0xFFC4, bytes([0x10]) + bytes(AC_PROG_BITS) + bytes(AC_PROG_VALS)
    )

    # scan 1: DC, Ss=Se=0
    bw = _BitWriter()
    prev = 0
    for blk in coeff_blocks:
        diff = blk[0] - prev
        prev = blk[0]
        size = _category(diff)
        code, length = dc_codes[size]
        bw.put(code, length)
        if size:
            bw.put(_code_value(diff, size), size)
    out += _segment(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0]))
    out += bw.flush()

    # one AC scan per band (AC scans are always single-component);
    # consecutive end-of-band events batch into EOBn codes spanning
    # blocks (T.81 G.1.2.2, what libjpeg emits) — the decoder's
    # cross-block EOBRUN path is the one real streams exercise
    def flush_eobrun(bw: _BitWriter, n: int) -> None:
        while n:
            r = min(14, n.bit_length() - 1)
            take = min(n, (1 << r) + (1 << r) - 1)
            code, length = ac_codes[r << 4]
            bw.put(code, length)
            if r:
                bw.put(take - (1 << r), r)
            n -= take

    for ss, se in bands:
        bw = _BitWriter()
        eobrun = 0
        for blk in coeff_blocks:
            last_nz = 0
            for k in range(se, ss - 1, -1):
                if blk[k]:
                    last_nz = k
                    break
            if last_nz == 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eobrun(bw, eobrun)
                    eobrun = 0
                continue
            flush_eobrun(bw, eobrun)
            eobrun = 0
            run = 0
            for k in range(ss, last_nz + 1):
                v = blk[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]
                    bw.put(code, length)
                    run -= 16
                size = _category(v)
                code, length = ac_codes[(run << 4) | size]
                bw.put(code, length)
                bw.put(_code_value(v, size), size)
                run = 0
            if last_nz < se:
                eobrun += 1
        flush_eobrun(bw, eobrun)
        out += _segment(0xFFDA, bytes([1, 1, 0x00, ss, se, 0]))
        out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


def _pt(v: int, al: int) -> int:
    """T.81 point transform for AC coefficients: magnitude shift toward
    zero, sign preserved (G.1.2.1)."""
    return v >> al if v >= 0 else -((-v) >> al)


def encode_jpeg_gray_progressive_sa(
    coeff_blocks: list[list[int]],
    blocks_w: int,
    blocks_h: int,
    al: int = 1,
    coarse_only: bool = False,
) -> bytes:
    """Encode a grayscale progressive JPEG with SUCCESSIVE APPROXIMATION
    (T.81 G.1.2): four scans — DC first at precision ``Al`` (values
    sent as DC >> Al), a DC refinement appending the low bit raw, the
    full 1..63 AC band at ``Al`` (point-transformed magnitudes), and an
    AC refinement whose (r, s=1) symbols mark NEWLY-significant ±2^Al'
    coefficients while correction bits refine already-nonzero history —
    buffered and flushed after the next symbol / ZRL / EOBn exactly as
    the decoder consumes them.  ``al`` refinement steps of one bit each
    (al=1 → one refinement per DC/AC).  Requires |coeff| < 2^10 so the
    first-scan categories fit the stream-written table."""
    assert len(coeff_blocks) == blocks_w * blocks_h
    assert al >= 1
    w, h = blocks_w * 8, blocks_h * 8
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_PROG_BITS, AC_PROG_VALS)

    out = bytearray(b"\xff\xd8")
    out += _segment(0xFFDB, bytes([0]) + bytes([1] * 64))
    out += _segment(
        0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )
    out += _segment(0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _segment(
        0xFFC4, bytes([0x10]) + bytes(AC_PROG_BITS) + bytes(AC_PROG_VALS)
    )

    # scan 1: DC first, Ah=0 Al=al — DPCM over DC >> al
    bw = _BitWriter()
    prev = 0
    for blk in coeff_blocks:
        v = blk[0] >> al  # DC point transform is an arithmetic shift
        diff = v - prev
        prev = v
        size = _category(diff)
        code, length = dc_codes[size]
        bw.put(code, length)
        if size:
            bw.put(_code_value(diff, size), size)
    out += _segment(0xFFDA, bytes([1, 1, 0x00, 0, 0, al]))
    out += bw.flush()

    # DC refinement scans: one raw bit per block per level
    for lvl in ([] if coarse_only else range(al - 1, -1, -1)):
        bw = _BitWriter()
        for blk in coeff_blocks:
            bw.put((blk[0] >> lvl) & 1, 1)
        out += _segment(
            0xFFDA, bytes([1, 1, 0x00, 0, 0, ((lvl + 1) << 4) | lvl])
        )
        out += bw.flush()

    # scan: AC first, band 1..63, Ah=0 Al=al
    def flush_eobrun(bw: _BitWriter, n: int, corr: list[int]) -> None:
        while n:
            r = min(14, n.bit_length() - 1)
            take = min(n, (1 << r) + (1 << r) - 1)
            code, length = ac_codes[r << 4]
            bw.put(code, length)
            if r:
                bw.put(take - (1 << r), r)
            n -= take
        for bit in corr:
            bw.put(bit, 1)
        corr.clear()

    bw = _BitWriter()
    eobrun = 0
    no_corr: list[int] = []
    for blk in coeff_blocks:
        pt = [_pt(blk[k], al) for k in range(64)]
        last_nz = 0
        for k in range(63, 0, -1):
            if pt[k]:
                last_nz = k
                break
        if last_nz == 0:
            eobrun += 1
            continue
        flush_eobrun(bw, eobrun, no_corr)
        eobrun = 0
        run = 0
        for k in range(1, last_nz + 1):
            v = pt[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]
                bw.put(code, length)
                run -= 16
            size = _category(v)
            code, length = ac_codes[(run << 4) | size]
            bw.put(code, length)
            bw.put(_code_value(v, size), size)
            run = 0
        if last_nz < 63:
            eobrun += 1
    flush_eobrun(bw, eobrun, no_corr)
    out += _segment(0xFFDA, bytes([1, 1, 0x00, 1, 63, al]))
    out += bw.flush()

    # AC refinement scans (Ah = lvl+1, Al = lvl), T.81 G.1.2.3.  The
    # encoder MIRRORS the decoder's walk exactly: correction bits for
    # already-nonzero history are written inline at the positions the
    # decoder will read them (during ZRL spans, during placement walks,
    # and — for end-of-band blocks — after the batched EOBn code in
    # block order).
    for lvl in ([] if coarse_only else range(al - 1, -1, -1)):
        ah = lvl + 1
        bw = _BitWriter()
        eobrun = 0
        eob_corr: list[int] = []

        def corr_bit(blk, k: int) -> int:
            return (abs(blk[k]) >> lvl) & 1

        def flush_eob(bw=bw) -> None:
            nonlocal eobrun, eob_corr
            if not eobrun:
                return
            assert eobrun <= 0x7FFF, "refinement EOBRUN overflow"
            r = eobrun.bit_length() - 1
            code, length = ac_codes[r << 4]
            bw.put(code, length)
            if r:
                bw.put(eobrun - (1 << r), r)
            for bit in eob_corr:
                bw.put(bit, 1)
            eobrun = 0
            eob_corr = []

        for blk in coeff_blocks:
            hist = [abs(blk[k]) >> ah != 0 for k in range(64)]
            newf = [
                (not hist[k]) and ((abs(blk[k]) >> lvl) & 1) == 1
                for k in range(64)
            ]
            if not any(newf[1:64]):
                eob_corr.extend(
                    corr_bit(blk, k) for k in range(1, 64) if hist[k]
                )
                eobrun += 1
                continue
            flush_eob()
            k = 1
            while k <= 63:
                # next new-significant position and the zero-history
                # run length before it
                nxt = None
                r_total = 0
                j2 = k
                while j2 <= 63:
                    if newf[j2]:
                        nxt = j2
                        break
                    if not hist[j2]:
                        r_total += 1
                    j2 += 1
                if nxt is None:
                    # end of band: the EOBn for this block batches with
                    # following all-EOB blocks; its remainder
                    # corrections ride first
                    eob_corr.extend(
                        corr_bit(blk, kk)
                        for kk in range(k, 64)
                        if hist[kk]
                    )
                    eobrun += 1
                    break
                while r_total > 15:
                    code, length = ac_codes[0xF0]
                    bw.put(code, length)
                    # decoder walk: corrections at every history
                    # position passed — including those AFTER the 16th
                    # zero slot, up to the zero the decoder breaks on
                    cnt = 0
                    while True:
                        if hist[k]:
                            bw.put(corr_bit(blk, k), 1)
                            k += 1
                            continue
                        if cnt == 16:
                            break
                        cnt += 1
                        k += 1
                    r_total -= 16
                code, length = ac_codes[(r_total << 4) | 1]
                bw.put(code, length)
                bw.put(1 if blk[nxt] > 0 else 0, 1)
                # decoder placement walk: corrections at history
                # positions, r_total zero-history slots, place at nxt
                rr = r_total
                while True:
                    if hist[k]:
                        bw.put(corr_bit(blk, k), 1)
                        k += 1
                        continue
                    if rr == 0:
                        break
                    rr -= 1
                    k += 1
                assert k == nxt, (k, nxt)
                k += 1
        flush_eob()
        out += _segment(0xFFDA, bytes([1, 1, 0x00, 1, 63, (ah << 4) | lvl]))
        out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)

def encode_jpeg_color_progressive_420(
    y_blocks: list[list[int]],
    cb_blocks: list[list[int]],
    cr_blocks: list[list[int]],
    mcus_w: int,
    mcus_h: int,
    width: int | None = None,
    height: int | None = None,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
) -> bytes:
    """Encode a 4:2:0 YCbCr PROGRESSIVE JPEG (SOF2, spectral selection,
    Ah=Al=0): one INTERLEAVED DC scan in MCU order (per-component DPCM
    predictors), then per-component AC band scans — non-interleaved by
    definition, covering each component's own ceil-sized block grid in
    raster order with cross-block EOBRUN coding.  Inputs are
    zigzag-ordered quantized coefficient lists in the same layout as
    :func:`encode_jpeg_color_420` (Y in T.81 A.2.3 MCU order, chroma one
    block per MCU); quant tables all ones."""
    assert len(y_blocks) == 4 * mcus_w * mcus_h
    assert len(cb_blocks) == mcus_w * mcus_h
    assert len(cr_blocks) == mcus_w * mcus_h
    w = width if width is not None else 16 * mcus_w
    h = height if height is not None else 16 * mcus_h
    assert 16 * (mcus_w - 1) < w <= 16 * mcus_w
    assert 16 * (mcus_h - 1) < h <= 16 * mcus_h
    dc_y = _canonical_codes(DC_BITS, DC_VALS)
    dc_c = _canonical_codes(DC_BITS_C, DC_VALS_C)
    ac_codes = _canonical_codes(AC_PROG_BITS, AC_PROG_VALS)
    flat = [b for (a, b) in bands]
    assert [a for (a, _) in bands] == [1] + [x + 1 for x in flat[:-1]]
    assert flat[-1] == 63

    out = bytearray(b"\xff\xd8")
    out += _segment(
        0xFFDB, bytes([0]) + bytes([1] * 64) + bytes([1]) + bytes([1] * 64)
    )
    out += _segment(  # SOF2: Y 2x2 Tq0, Cb/Cr 1x1 Tq1
        0xFFC2,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _segment(0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _segment(
        0xFFC4, bytes([0x01]) + bytes(DC_BITS_C) + bytes(DC_VALS_C)
    )
    out += _segment(
        0xFFC4, bytes([0x10]) + bytes(AC_PROG_BITS) + bytes(AC_PROG_VALS)
    )

    # scan 1: interleaved DC (Ss=Se=0, Ah=Al=0), MCU order
    bw = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}
    dc_tabs = {1: dc_y, 2: dc_c, 3: dc_c}

    def put_dc(cid: int, blk: list[int]) -> None:
        diff = blk[0] - pred[cid]
        pred[cid] = blk[0]
        size = _category(diff)
        code, length = dc_tabs[cid][size]
        bw.put(code, length)
        if size:
            bw.put(_code_value(diff, size), size)

    for mcu in range(mcus_w * mcus_h):
        for i in range(4):
            put_dc(1, y_blocks[mcu * 4 + i])
        put_dc(2, cb_blocks[mcu])
        put_dc(3, cr_blocks[mcu])
    out += _segment(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0]))
    out += bw.flush()

    def flush_eobrun(bw: _BitWriter, n: int) -> None:
        while n:
            r = min(14, n.bit_length() - 1)
            take = min(n, (1 << r) + (1 << r) - 1)
            code, length = ac_codes[r << 4]
            bw.put(code, length)
            if r:
                bw.put(take - (1 << r), r)
            n -= take

    # per-component AC band scans over the component's OWN ceil grid
    def comp_blocks(cid: int) -> list[list[int]]:
        if cid == 1:
            nbw, nbh = (w + 7) // 8, (h + 7) // 8
            return [
                y_blocks[((by // 2) * mcus_w + bx // 2) * 4
                         + (by % 2) * 2 + (bx % 2)]
                for by in range(nbh) for bx in range(nbw)
            ]
        src = cb_blocks if cid == 2 else cr_blocks
        cw, ch = -(-w // 2), -(-h // 2)
        nbw, nbh = (cw + 7) // 8, (ch + 7) // 8
        return [
            src[by * mcus_w + bx]
            for by in range(nbh) for bx in range(nbw)
        ]

    for cid in (1, 2, 3):
        blocks = comp_blocks(cid)
        for ss, se in bands:
            bw = _BitWriter()
            eobrun = 0
            for blk in blocks:
                last_nz = 0
                for k in range(se, ss - 1, -1):
                    if blk[k]:
                        last_nz = k
                        break
                if last_nz == 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun(bw, eobrun)
                        eobrun = 0
                    continue
                flush_eobrun(bw, eobrun)
                eobrun = 0
                run = 0
                for k in range(ss, last_nz + 1):
                    v = blk[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_codes[0xF0]
                        bw.put(code, length)
                        run -= 16
                    size = _category(v)
                    code, length = ac_codes[(run << 4) | size]
                    bw.put(code, length)
                    bw.put(_code_value(v, size), size)
                    run = 0
                if last_nz < se:
                    eobrun += 1
            flush_eobrun(bw, eobrun)
            out += _segment(0xFFDA, bytes([1, cid, 0x10, ss, se, 0]))
            out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# Pixel-domain encode: the real transform-coding write path (round 10)
# --------------------------------------------------------------------------

#: ITU-T T.81 Annex K Table K.1 — the example luminance quantization
#: table every baseline encoder ships, in RASTER order.  Its DC step is
#: 16, which the pipeline fixtures exploit: 16/8 = 2, so a constant
#: block whose level-shifted value is even survives quantize→IDCT
#: bit-exactly (the closed-form device the DuckDB oracle replays).
ANNEX_K_LUMA_Q = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]


def fdct_quantize_block(block_px, qtable_raster) -> list[int]:
    """One 8x8 block of 8-bit samples → zigzag-ordered QUANTIZED
    coefficients: level shift (−128), orthonormal forward DCT (the
    exact transpose of the decoder's IDCT basis, so the pair is an
    exact inverse in float64), then per-coefficient division by the
    raster-order quant table with round-half-away-from-zero — the
    deterministic rule a SQL oracle can replay in integers whenever the
    true quotient is representable."""
    import numpy as np

    from .jpeg_codec import _M

    B = np.asarray(block_px, dtype=np.float64).reshape(8, 8) - 128.0
    S = _M @ B @ _M.T  # forward DCT; decoder reconstructs M.T @ S @ M
    q = np.asarray(qtable_raster, dtype=np.float64).reshape(8, 8)
    x = S / q
    quant = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
    flat = quant.reshape(64)
    return [int(flat[ZIGZAG[i]]) for i in range(64)]


def encode_jpeg_gray_pixels(
    pixels,
    width: int,
    height: int,
    qtable_raster=None,
    restart_interval: int = 0,
) -> bytes:
    """Encode 8-bit grayscale PIXELS as a baseline JPEG — the complete
    transform-coding write path (level shift → FDCT → quantization →
    zigzag → Huffman), unlike :func:`encode_jpeg_gray` which takes
    pre-quantized coefficients (the fixture-writer convention of the
    decode certifications).  The DQT written is the REAL table used
    (default Annex K luminance), so any conforming decoder reconstructs
    the same image.  Dimensions must be block-aligned (the N5 pipeline
    fixtures are; edge padding is a framing, not transform, concern).
    ``restart_interval`` > 0 writes DRI and RSTm markers with per-
    interval DC prediction reset (T.81 E.2.4)."""
    if qtable_raster is None:
        qtable_raster = ANNEX_K_LUMA_Q
    assert width % 8 == 0 and height % 8 == 0, (width, height)
    blocks_w, blocks_h = width // 8, height // 8
    import numpy as np

    img = np.asarray(pixels, dtype=np.float64).reshape(height, width)
    coeff_blocks = []
    for by in range(blocks_h):
        for bx in range(blocks_w):
            blk = img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            coeff_blocks.append(fdct_quantize_block(blk, qtable_raster))

    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for i, blk in enumerate(coeff_blocks):
        if restart_interval and i and i % restart_interval == 0:
            bw.restart((i // restart_interval - 1) & 7)
            prev_dc = 0
        prev_dc = _encode_block(bw, blk, prev_dc, dc_codes, ac_codes)

    # DQT payload is zigzag-ordered per T.81 B.2.4.1
    qzz = bytes(int(qtable_raster[ZIGZAG[i]]) for i in range(64))
    out = bytearray(b"\xff\xd8")  # SOI
    out += _segment(0xFFDB, bytes([0]) + qzz)
    if restart_interval:
        out += _segment(0xFFDD, struct.pack(">H", restart_interval))
    out += _segment(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    out += _segment(
        0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    )
    out += _segment(
        0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    )
    out += _segment(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
