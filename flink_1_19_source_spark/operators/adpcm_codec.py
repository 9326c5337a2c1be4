"""Pure-stdlib IMA ADPCM (DVI4) codec in a WAV container — REAL lossy
compressed-audio decode (N5).

Implements the public IMA/DVI ADPCM algorithm (IMA Digital Audio Focus
and Technical Working Groups, 1992; WAV format tag 0x0011 as specified
in the Microsoft multimedia registration): 4-bit nibbles expand through
the 89-entry step-size table with the 8-entry index-adaptation table,
int16 predictor clamping, and the WAV block layout — each block opens
with a 4-byte header (initial predictor int16 LE, initial step index,
reserved zero) whose predictor IS sample 0, followed by nibble pairs
packed low-nibble-first.

Every operation is integer arithmetic, so a decoded stream is
bit-deterministic — which is what lets a SQL oracle replay the expander
table-by-table (queries/llm_media.n5_adpcm_decode_real).

Scale note: per-file Python decode is the correctness reference; the
100 TB swap is a native library behind the same decode_audio hook.
Decode is embarrassingly parallel — one clip per task.
"""

from __future__ import annotations

import struct

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def expand_nibble(pred: int, idx: int, nib: int) -> tuple[int, int]:
    """One IMA ADPCM expansion step: (predictor, step index) + 4-bit
    code -> (new predictor, new index). Pure integer; the exact
    arithmetic the SQL oracle replays."""
    step = STEP_TABLE[idx]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + INDEX_TABLE[nib & 7]))
    return pred, idx


def encode_adpcm_wav(
    blocks: "list[tuple[int, int, list[int]]]",
    sample_rate: int = 8000,
    block_align: int = 36,
) -> bytes:
    """Build a real format-0x0011 WAV from explicit blocks of
    (initial_predictor, initial_index, nibbles).  Nibble count per block
    must be exactly ``(block_align - 4) * 2`` (mono).  The caller choosing
    the nibbles directly is what makes the decoder certifiable in SQL —
    the oracle recomputes the expansion from the same nibble formula
    without ever seeing a byte."""
    spb = (block_align - 4) * 2 + 1  # samples per block incl. header
    data = bytearray()
    for pred, idx, nibs in blocks:
        if len(nibs) != (block_align - 4) * 2:
            raise ValueError("nibble count != (block_align-4)*2")
        if not -32768 <= pred <= 32767 or not 0 <= idx <= 88:
            raise ValueError("bad block header state")
        data += struct.pack("<hBB", pred, idx, 0)
        for i in range(0, len(nibs), 2):
            data.append((nibs[i] & 0xF) | ((nibs[i + 1] & 0xF) << 4))
    n_samples = spb * len(blocks)
    byte_rate = sample_rate * block_align // spb  # nominal
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, 1, sample_rate, byte_rate, block_align, 4,
        2, spb,
    )
    fact = struct.pack("<I", n_samples)
    riff = bytearray(b"WAVE")
    riff += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"fact" + struct.pack("<I", len(fact)) + fact
    riff += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_adpcm_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a format-0x0011 (IMA ADPCM) WAV -> (sample_rate, channels,
    int16 samples). Mono only (the corpus tier's shape); each block's
    header predictor is emitted as its first sample per the IMA spec."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        sz = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _br, block_align = struct.unpack("<HHIIH", fmt[:14])
    if tag != 0x0011:
        raise ValueError(f"not IMA ADPCM (tag 0x{tag:04x})")
    if channels != 1:
        raise ValueError("mono only")
    out: list[int] = []
    for off in range(0, len(data) - block_align + 1, block_align):
        blk = data[off:off + block_align]
        pred = struct.unpack("<h", blk[0:2])[0]
        idx = blk[2]
        if idx > 88:
            raise ValueError("corrupt step index")
        out.append(pred)
        for b in blk[4:]:
            for nib in (b & 0xF, b >> 4):
                pred, idx = expand_nibble(pred, idx, nib)
                out.append(pred)
    return rate, channels, out


def encode_nibble(pred: int, idx: int, sample: int) -> int:
    """One IMA ADPCM quantization step: pick the 4-bit code for
    ``sample`` given decoder state (pred, idx) — the standard
    successive-approximation against step, step/2, step/4 (IMA 1992
    reference encoder).  Pure integer, so the SQL oracle replays the
    ENCODER too, not just the expander; feed the result through
    expand_nibble to advance the shared state."""
    step = STEP_TABLE[idx]
    diff = sample - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    if diff >= step:
        nib |= 4
        diff -= step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nib |= 1
    return nib


def encode_adpcm_pcm(
    samples: "list[int]",
    sample_rate: int = 8000,
    block_align: int = 36,
) -> bytes:
    """IMA ADPCM ENCODE from PCM-16: the lossy compressed-audio WRITE
    path.  Sample 0 becomes each block's header predictor (lossless);
    every following sample quantizes to one nibble via encode_nibble
    with the state advanced by the same expand_nibble the decoder runs
    — encoder and decoder cannot drift.  Each block's header takes the
    NEXT source sample as its predictor (the IMA WAV convention: block
    starts are lossless) with the step index carried across blocks
    (index 0 at stream start).  Sample count must be
    k * (1 + (block_align - 4) * 2) for whole blocks."""
    spb = (block_align - 4) * 2  # nibbles (encoded samples) per block
    if len(samples) % (1 + spb) != 0:
        raise ValueError("sample count does not fill whole blocks")
    blocks = []
    pos = 0
    idx = 0
    while pos < len(samples):
        head_idx = idx
        pred = samples[pos]
        nibs = []
        for s in samples[pos + 1:pos + 1 + spb]:
            nib = encode_nibble(pred, idx, s)
            pred, idx = expand_nibble(pred, idx, nib)
            nibs.append(nib)
        blocks.append((samples[pos], head_idx, nibs))
        pos += 1 + spb
    return encode_adpcm_wav(blocks, sample_rate, block_align)
