"""Pure-stdlib FLAC codec subset (SURVEY §2.11 N5 — compressed audio).

The container ships no audio libraries, but FLAC is a public format
(xiph.org spec / RFC 9639) whose subset-profile primitives — MSB-first
bit packing, rice-coded residuals, fixed linear predictors, CRC-8/16
framing — need nothing beyond the standard library.  So the N5
``decode_audio`` hook gets a REAL compressed-audio path next to
WAV/PCM.

Scope (declared, validated — everything else raises ``ValueError``):
16-bit mono, FIXED predictors order 0–4 with a single rice partition
per subframe, CONSTANT and VERBATIM subframes, fixed-blocksize frames.
Both CRCs are verified on decode — a flipped bit anywhere in a frame
surfaces, it doesn't produce plausible wrong samples.  LPC subframes,
stereo decorrelation and >16-bit depths are out of scope for the
in-container correctness reference (a production cluster swaps in
libFLAC behind the same hook); the bitstream this encoder emits is
spec-subset-valid for any stock decoder.

Encoding is fully deterministic: the fixed-predictor order minimizes
the summed absolute residual (ties → lower order) and the rice
parameter minimizes the exact encoded size (ties → smaller k), so the
same samples always produce the same bytes on every engine.
"""

from __future__ import annotations

import struct

_SYNC = 0x3FFE

# fixed-predictor residual: r[i] = s[i] - prediction(order)
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0, "unaligned"
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            b = (self.data[self.byte] >> (7 - self.bit)) & 1
            v = (v << 1) | b
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _utf8_number(n: int) -> bytes:
    """FLAC frame numbers use UTF-8 style variable-length coding
    (extended to 36 bits / 7 bytes; standard thresholds below)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, limit in ((2, 0x800), (3, 0x10000), (4, 0x200000),
                          (5, 0x4000000), (6, 0x80000000)):
        if n < limit:
            break
    else:
        raise ValueError(f"frame number {n} too large for UTF-8 coding")
    lead_mask = (0xFF00 >> nbytes) & 0xFF  # e.g. 0xC0 for 2, 0xE0 for 3
    first = lead_mask | (n >> (6 * (nbytes - 1)))
    cont = [
        0x80 | ((n >> (6 * i)) & 0x3F) for i in range(nbytes - 2, -1, -1)
    ]
    return bytes([first] + cont)


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 6:
        raise ValueError(f"bad UTF-8 coded number lead byte {first:02x}")
    n = first & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        n = (n << 6) | (c & 0x3F)
    return n


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (((-r) << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _best_rice_param(residuals: list[int]) -> int:
    best_k, best_bits = 0, None
    for k in range(15):
        bits = sum((_zigzag(r) >> k) + 1 + k for r in residuals)
        if best_bits is None or bits < best_bits:
            best_k, best_bits = k, bits
    return best_k


def encode_flac(samples: list[int], sample_rate: int = 8000,
                block_size: int = 256) -> bytes:
    """Encode 16-bit mono samples as a subset-profile FLAC stream:
    fLaC magic + STREAMINFO, then fixed-blocksize frames of FIXED
    subframes (best order 0-4 by summed |residual|, ties → lower
    order; CONSTANT when the block is flat) with one rice partition."""
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} out of 16-bit range")
    out = bytearray(b"fLaC")
    # STREAMINFO: last-metadata-block flag + type 0, length 34
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)   # channels - 1
    si.write(15, 5)  # bits-per-sample - 1
    si.write(len(samples), 36)
    out += bytes([0x80, 0, 0, 34]) + si.bytes() + b"\x00" * 16

    for fno, start in enumerate(range(0, len(samples), block_size)):
        blk = samples[start:start + block_size]
        hdr = _BitWriter()
        hdr.write(_SYNC, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy
        hdr.write(0b0111, 4)   # blocksize: 16-bit value at header end
        hdr.write(0b0000, 4)   # sample rate: from STREAMINFO
        hdr.write(0, 4)        # channel assignment: mono
        hdr.write(0b100, 3)    # sample size: 16 bits
        hdr.write(0, 1)        # reserved
        hdr.align()
        hbytes = bytearray(hdr.bytes())
        hbytes += _utf8_number(fno)
        hbytes += struct.pack(">H", len(blk) - 1)
        hbytes.append(_crc8(bytes(hbytes)))

        body = _BitWriter()
        if len(set(blk)) == 1:
            body.write(0, 1)
            body.write(0b000000, 6)  # CONSTANT
            body.write(0, 1)
            body.write(blk[0], 16)
        else:
            orders = {}
            for order, coefs in _FIXED_COEFS.items():
                if order >= len(blk):
                    continue
                res = [
                    blk[i] - sum(c * blk[i - 1 - j]
                                 for j, c in enumerate(coefs))
                    for i in range(order, len(blk))
                ]
                orders[order] = (sum(abs(r) for r in res), res)
            order = min(orders, key=lambda o: (orders[o][0], o))
            res = orders[order][1]
            body.write(0, 1)
            body.write(0b001000 | order, 6)  # FIXED, order
            body.write(0, 1)                 # no wasted bits
            for s in blk[:order]:            # warmup, raw
                body.write(s, 16)
            body.write(0b00, 2)              # rice method, 4-bit params
            body.write(0, 4)                 # partition order 0
            k = _best_rice_param(res)
            body.write(k, 4)
            for r in res:
                u = _zigzag(r)
                body.write_unary(u >> k)
                if k:
                    body.write(u & ((1 << k) - 1), k)
        body.align()
        frame = bytes(hbytes) + body.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def decode_flac(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a subset-profile FLAC stream; returns (sample_rate,
    channels, samples).  Verifies the magic, STREAMINFO shape, frame
    sync, both CRCs, and subframe/residual structure — any violation
    raises ``ValueError`` naming the field."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    sample_rate = channels = bps = None
    total = None
    block_size = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata block header")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            if blen != 34:
                raise ValueError(f"STREAMINFO length {blen} != 34")
            br = _BitReader(body)
            br.read(16)
            block_size = br.read(16)
            br.read(24)
            br.read(24)
            sample_rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
        pos += 4 + blen
        if last:
            break
    if sample_rate is None:
        raise ValueError("missing STREAMINFO")
    if channels != 1 or bps != 16:
        raise ValueError(
            f"subset decoder handles 16-bit mono, got {bps}-bit "
            f"{channels}-channel"
        )

    samples: list[int] = []
    while len(samples) < total:
        frame_start = pos
        br = _BitReader(data, pos)
        if br.read(14) != _SYNC:
            raise ValueError(f"lost frame sync at byte {frame_start}")
        br.read(1)
        br.read(1)
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan = br.read(4)
        ss_code = br.read(3)
        br.read(1)
        if chan != 0:
            raise ValueError("subset decoder: mono frames only")
        if ss_code != 0b100:
            raise ValueError("subset decoder: 16-bit frames only")
        _read_utf8_number(br)
        if bs_code == 0b0111:
            nblk = br.read(16) + 1
        elif bs_code == 0b0110:
            nblk = br.read(8) + 1
        elif bs_code >= 0b1000:
            nblk = 256 << (bs_code - 8)
        elif bs_code == 0b0001:
            nblk = 192
        elif 0b0010 <= bs_code <= 0b0101:
            nblk = 576 << (bs_code - 2)
        else:
            raise ValueError(f"reserved blocksize code {bs_code}")
        if sr_code not in (0b0000,):
            raise ValueError("subset decoder: sample rate from STREAMINFO")
        br.align()
        hdr_len = br.byte - frame_start
        crc8 = data[br.byte]
        if _crc8(data[frame_start:br.byte]) != crc8:
            raise ValueError(f"frame header CRC-8 mismatch at {frame_start}")
        br.byte += 1

        pad = br.read(1)
        if pad:
            raise ValueError("subframe padding bit set")
        stype = br.read(6)
        wasted = br.read(1)
        if wasted:
            raise ValueError("wasted-bits subframes unsupported")
        def s16(v: int) -> int:
            return v - 0x10000 if v & 0x8000 else v
        if stype == 0:  # CONSTANT
            v = s16(br.read(16))
            blk = [v] * nblk
        elif stype == 1:  # VERBATIM
            blk = [s16(br.read(16)) for _ in range(nblk)]
        elif 0b001000 <= stype <= 0b001100:  # FIXED order 0-4
            order = stype & 0x7
            warm = [s16(br.read(16)) for _ in range(order)]
            method = br.read(2)
            if method != 0:
                raise ValueError("rice2 escape coding unsupported")
            porder = br.read(4)
            if porder != 0:
                raise ValueError("subset decoder: one rice partition")
            k = br.read(4)
            if k == 0xF:
                raise ValueError("escaped raw partitions unsupported")
            res = []
            for _ in range(nblk - order):
                u = (br.read_unary() << k) | (br.read(k) if k else 0)
                res.append(_unzigzag(u))
            blk = list(warm)
            coefs = _FIXED_COEFS[order]
            for r in res:
                pred = sum(
                    c * blk[len(blk) - 1 - j] for j, c in enumerate(coefs)
                )
                blk.append(r + pred)
        else:
            raise ValueError(f"subframe type {stype:06b} unsupported "
                             "(LPC out of subset scope)")
        br.align()
        crc = struct.unpack(">H", data[br.byte:br.byte + 2])[0]
        if _crc16(data[frame_start:br.byte]) != crc:
            raise ValueError(f"frame CRC-16 mismatch at {frame_start}")
        pos = br.byte + 2
        samples.extend(blk)
    if len(samples) != total:
        raise ValueError(
            f"decoded {len(samples)} samples, STREAMINFO says {total}"
        )
    return sample_rate, 1, samples
