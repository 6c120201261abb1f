"""Baseline JFIF (JPEG) encode/decode kernels — stdlib + numpy only.

Kills the repo's last capability stub (``multimodal.decode_payload``'s
``HAVE_PIL`` branch): the container has no PIL/libvips, so this module
implements the baseline-sequential JPEG pipeline itself, the same way the
round-6 PNG kernel implemented zlib-chunk PNG. Reference parity note: the
reference engine (``MapReduceFramework.cpp``) has no media handling at
all — this is part of the mandated multimodal-columns extension
(SURVEY §2.3), exercising the opaque-binary-column + Arrow-batched
``mapInPandas`` lane with a genuinely non-trivial codec.

What is REAL here (full baseline scope, both directions):

- **Encoder**: level shift, float FDCT per 8×8 block (DC taken from the
  exact integer pixel sum so quantization boundaries are numerically
  exact), uniform quantization with round-half-up, zigzag, DC
  differential coding, AC run-length coding with ZRL (16-zero runs) and
  EOB, canonical Huffman using the JPEG Annex K "typical" tables,
  byte stuffing (FF→FF00), JFIF/DQT/SOF0/DHT/SOS marker segments,
  4:2:0 chroma subsampling (encoder input is already YCbCr planes —
  color conversion is out of scope on purpose: the catalog payloads are
  defined in YCbCr so the DuckDB oracle can replay the quantization in
  closed form without replicating RGB↔YCbCr float rounding).
- **Decoder**: marker walk, DQT (8-bit) parse, SOF0 validation
  (progressive SOF2 and friends rejected), DHT canonical Huffman table
  reconstruction, SOS, entropy decode with a byte-unstuffing bit reader,
  DC prediction per component, dequantization, de-zigzag, float 2-D
  IDCT, round-half-up + clamp reconstruction, and nearest-neighbour
  chroma upsampling by the component sampling factors. Every
  malformed-input path raises ``ValueError`` (tests cover truncation,
  bad markers, progressive frames, bad Huffman codes, dimension
  mismatches).

Correctness strategy (the ``multimodal_jpeg_decode`` catalog entry):
payloads are synthesized per document from md5(text) as per-MCU-constant
YCbCr images (each 16×16 MCU one flat colour). A constant block's only
nonzero coefficient is DC, and with the DC quant step fixed at 16 the
whole encode→decode round trip collapses to the closed form

    decoded(v) = clamp(2 * floor((v - 128) / 2 + 0.5) + 128, 0, 255)

which the DuckDB oracle replays exactly — *visibly lossy* (odd-offset
values move), proving quantization actually ran, while staying
cross-engine exact (all arithmetic at exact binary floats). The AC /
ZRL / negative-magnitude entropy paths, which the flat catalog payloads
do not reach, are exercised by ``tests/test_multimodal_jpeg.py`` on
random rasters by comparing the decoder's recovered quantized
coefficients against the encoder's — the strongest possible check that
the Huffman/RLE layer is exactly invertible.

Scale: both kernels are Arrow-batched ``mapInPandas`` over a binary
column — the plan is a scan → two Python map stages with no shuffle; at
100 TB the work is embarrassingly parallel per input split, exactly the
shape a real media-decode pipeline wants.
"""

from __future__ import annotations

import math
import re
from collections.abc import Iterator
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.catalog import register
from ..sources.registry import load_table, spread_small_scan

# ---------------------------------------------------------------------------
# Constant tables (public JPEG spec, ITU-T T.81)
# ---------------------------------------------------------------------------

# Annex K "typical" Huffman tables: (bits[1..16], values). Using the
# published tables (rather than inventing our own) means self-generated
# streams and table-free third-party baseline files share one table set.
# Remaining real-world gap (documented, not hidden): DRI/restart markers
# are rejected (ADVICE r7), so restart-interval baseline files — common
# from hardware encoders — need the DRI lane before "reads any baseline
# JPEG" is a true claim. Fill-byte padding before markers IS tolerated.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
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

# Uniform quant step for both tables: DC step 16 makes the constant-MCU
# round trip closed-form (see module docstring); AC step 16 is simply a
# valid table — the catalog payloads quantize every AC to zero anyway,
# and the test path checks exact coefficient recovery at any step.
_QUANT_STEP = 16
_QUANT_TABLE = [_QUANT_STEP] * 64


def _zigzag_order() -> list[tuple[int, int]]:
    """(row, col) pairs in JPEG zigzag order, generated (not hardcoded)."""
    order = []
    for s in range(15):
        diag = [(s - j, j) for j in range(s + 1) if 0 <= s - j < 8 and 0 <= j < 8]
        # odd diagonals run top-right→bottom-left (row increasing), even
        # ones the reverse — T.81 figure 5 order: (0,0),(0,1),(1,0),(2,0)…
        order.extend(diag[::-1] if s % 2 else diag)
    return order


_ZIGZAG = _zigzag_order()
# flat (row*8+col) index of each zigzag position: one vectorized gather /
# scatter replaces the 64-iteration Python loops in the per-block paths.
_ZIG_TO_FLAT = np.array([r * 8 + c for (r, c) in _ZIGZAG], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """A[u, x] = 0.5 * c(u) * cos((2x+1)uπ/16); FDCT = A·f·Aᵀ, IDCT = Aᵀ·F·A."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return a


_DCT_A = _dct_matrix()


def _round_half_up(x: np.ndarray) -> np.ndarray:
    # floor(x + 0.5): the one rounding used on BOTH sides and in the
    # oracle — numpy's round() is banker's and would diverge at halves.
    return np.floor(x + 0.5)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


@lru_cache(maxsize=64)
def _huff_codes_cached(
    bits: tuple[int, ...], vals: tuple[int, ...]
) -> dict[int, tuple[int, int]]:
    return _huff_codes(list(bits), list(vals))


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical Huffman per T.81 Annex C."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits): category = bit length of |v|, negative
    values encoded as v - 1 in category low bits (one's complement)."""
    if v == 0:
        return 0, 0
    cat = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _dezigzag_table(qtable: list[int]) -> np.ndarray:
    """64-entry DQT list (stored in zigzag order) → 8×8 (row, col) array."""
    return _dezigzag_cached(tuple(qtable))


@lru_cache(maxsize=16)
def _dezigzag_cached(qtable: tuple[int, ...]) -> np.ndarray:
    # rebuilt per BLOCK before r13 (measured 25% of encode time); the
    # table is a function of the 64 DQT ints, so memoize on them.
    out = np.zeros((8, 8), dtype=np.float64)
    out.reshape(-1)[_ZIG_TO_FLAT] = np.asarray(qtable, dtype=np.float64)
    out.flags.writeable = False
    return out


def quantize_block(block: np.ndarray, qtable: list[int]) -> np.ndarray:
    """Float FDCT + round-half-up quantization of one 8×8 pixel block.

    ``qtable`` is the 64-entry DQT (zigzag-stored) list. The DC
    coefficient is computed from the exact integer pixel sum
    ((Σpx − 64·128)/8 is exact in binary floating point), so the
    round-half-up at a quantization boundary is deterministic — the
    property the closed-form oracle depends on. AC comes from the float
    FDCT; for the flat catalog blocks those are ~1e-12 and quantize to
    zero robustly.
    """
    shifted = block.astype(np.float64) - 128.0
    coeffs = _DCT_A @ shifted @ _DCT_A.T
    coeffs[0, 0] = (float(int(block.sum())) - 8192.0) / 8.0
    return _round_half_up(coeffs / _dezigzag_table(qtable)).astype(np.int64)


def _encode_block(
    w: _BitWriter,
    qcoef: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Entropy-code one quantized 8×8 block; returns the new DC predictor."""
    dc = int(qcoef[0, 0])
    cat, bits = _magnitude(dc - pred)
    code, ln = dc_codes[cat]
    w.write(code, ln)
    if cat:
        w.write(bits, cat)
    zz = qcoef.reshape(-1)[_ZIG_TO_FLAT][1:].tolist()
    run = 0
    nz = [i for i, v in enumerate(zz) if v]
    last_nonzero = nz[-1] if nz else -1
    for i in range(last_nonzero + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:  # ZRL: sixteen zeros
            code, ln = ac_codes[0xF0]
            w.write(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | cat]
        w.write(code, ln)
        w.write(bits, cat)
        run = 0
    if last_nonzero < 62:  # EOB unless the very last coefficient was nonzero
        code, ln = ac_codes[0x00]
        w.write(code, ln)
    return dc


def _marker(tag: int, payload: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dht_segment(cls: int, ident: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(cls << 4) | ident]) + bytes(bits) + bytes(vals)


def encode_baseline_jpeg(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray
) -> bytes:
    """Encode YCbCr planes (Y full-res h×w with h, w multiples of 16;
    Cb/Cr already subsampled to h/2 × w/2) as a baseline JFIF 4:2:0 file
    with the Annex K typical Huffman tables and the module quant table."""
    h, w = y.shape
    if h % 16 or w % 16:
        raise ValueError("encoder requires dimensions that are multiples of 16")
    if cb.shape != (h // 2, w // 2) or cr.shape != (h // 2, w // 2):
        raise ValueError("chroma planes must be subsampled 2x2")
    out = bytearray()
    out += b"\xFF\xD8"  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xDB, bytes([0x00]) + bytes(_QUANT_TABLE))  # DQT id 0
    out += _marker(0xDB, bytes([0x01]) + bytes(_QUANT_TABLE))  # DQT id 1
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    out += _marker(0xC0, sof)  # SOF0 baseline
    out += _marker(0xC4, _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS))
    out += _marker(0xC4, _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS))
    out += _marker(0xC4, _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS))
    out += _marker(0xC4, _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS))
    out += _marker(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    dc_l = _huff_codes_cached(tuple(_DC_LUMA_BITS), tuple(_DC_LUMA_VALS))
    ac_l = _huff_codes_cached(tuple(_AC_LUMA_BITS), tuple(_AC_LUMA_VALS))
    dc_c = _huff_codes_cached(tuple(_DC_CHROMA_BITS), tuple(_DC_CHROMA_VALS))
    ac_c = _huff_codes_cached(tuple(_AC_CHROMA_BITS), tuple(_AC_CHROMA_VALS))
    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(h // 16):
        for mx in range(w // 16):
            for by in range(2):  # 4 luma blocks per MCU, raster order
                for bx in range(2):
                    r0, c0 = my * 16 + by * 8, mx * 16 + bx * 8
                    blk = y[r0 : r0 + 8, c0 : c0 + 8]
                    q = quantize_block(blk, _QUANT_TABLE)
                    preds[0] = _encode_block(bw, q, preds[0], dc_l, ac_l)
            for ci, plane in ((1, cb), (2, cr)):
                r0, c0 = my * 8, mx * 8
                blk = plane[r0 : r0 + 8, c0 : c0 + 8]
                q = quantize_block(blk, _QUANT_TABLE)
                preds[ci] = _encode_block(bw, q, preds[ci], dc_c, ac_c)
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with FF00 byte unstuffing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("entropy stream truncated at FF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # a real marker inside entropy data = premature end
                    raise ValueError(f"unexpected marker FF{nxt:02X} in scan")
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, canonical Huffman."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code in scan")


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):  # negative branch of one's-complement coding
        return bits - (1 << cat) + 1
    return bits


# r13 entropy-decode fast path: the per-bit dict-probe reader above costs
# ~25 Python ops per bit (tuple hash per probe). The scan decoder below
# (a) pre-extracts and unstuffs the whole entropy segment once, and
# (b) decodes each Huffman symbol with ONE lookup in a 16-bit-prefix LUT
# (canonical codes are <= 16 bits, T.81 C.2). Error contract is kept
# bit-for-bit: every input that made the per-bit reader raise raises the
# SAME ValueError here, at the same consumed-bit position — the reader
# only raises lazily when a needed bit is missing, exactly like read_bit.
# (_BitReader/_read_huff stay: tests pin the stuffing mechanism on them.)


def _zz_i64(v: int) -> int:
    """Mirror the pre-r13 numpy-int64 zz buffer's assignment contract: a
    corrupt entropy stream can produce DC predictions / AC magnitudes past
    int64, which the old ``zz[k] = v`` raised on at the assignment point."""
    if -9223372036854775808 <= v <= 9223372036854775807:
        return v
    raise OverflowError("Python int too large to convert to C long")

_MARKER_RE = re.compile(rb"\xff[^\x00]")


@lru_cache(maxsize=64)
def _decode_lut(
    bits: tuple[int, ...], vals: tuple[int, ...]
) -> tuple[list[int], list[int]]:
    """16-bit-prefix LUT: peek -> (value, code length); length 0 = no code
    matches any prefix (the per-bit reader's "invalid Huffman code").
    Filled LONGEST length first so a (malformed, non-prefix-free) table
    resolves to the SHORTEST matching code — the probe order read_bit
    used."""
    lens = np.zeros(65536, dtype=np.int64)
    value = np.zeros(65536, dtype=np.int64)
    entries = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            entries.append((length, code, vals[k]))
            code += 1
            k += 1
        code <<= 1
    for length, code, val in sorted(entries, key=lambda e: -e[0]):
        lo = code << (16 - length)
        if lo >= 65536:  # unreachable entry of a malformed table
            continue
        hi = lo + (1 << (16 - length))
        lens[lo:hi] = length
        value[lo:hi] = val
    return value.tolist(), lens.tolist()


class _ScanBits:
    """LUT bit reader over the pre-unstuffed entropy segment."""

    __slots__ = ("data", "end", "pos", "acc", "n", "underflow_msg")

    def __init__(self, payload: bytes, pos: int) -> None:
        tail = payload[pos:]
        m = _MARKER_RE.search(tail)
        if m is not None:
            seg = tail[: m.start()]
            self.underflow_msg = (
                f"unexpected marker FF{tail[m.start() + 1]:02X} in scan"
            )
        elif tail.endswith(b"\xff"):
            seg = tail[:-1]
            self.underflow_msg = "entropy stream truncated at FF"
        else:
            seg = tail
            self.underflow_msg = "entropy stream truncated"
        self.data = seg.replace(b"\xff\x00", b"\xff")
        self.end = len(self.data)
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        p = self.pos
        take = min(4, self.end - p)
        self.acc = (self.acc << (8 * take)) | int.from_bytes(
            self.data[p : p + take], "big"
        )
        self.n += 8 * take
        self.pos = p + take

    def receive(self, k: int) -> int:
        while self.n < k:
            if self.pos >= self.end:
                raise ValueError(self.underflow_msg)
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def read_code(self, lut_val: list[int], lut_len: list[int]) -> int:
        while self.n < 16 and self.pos < self.end:
            self._fill()
        n = self.n
        if n >= 16:
            peek = (self.acc >> (n - 16)) & 0xFFFF
        else:
            peek = (self.acc << (16 - n)) & 0xFFFF
        ln = lut_len[peek]
        if ln == 0:
            if n >= 16:
                raise ValueError("invalid Huffman code in scan")
            raise ValueError(self.underflow_msg)  # ran dry mid-probe
        if ln > n:
            raise ValueError(self.underflow_msg)  # code needs missing bits
        self.n = n - ln
        self.acc &= (1 << self.n) - 1
        return lut_val[peek]


def decode_baseline_jpeg(payload: bytes, want_coeffs: bool = False) -> dict:
    """Parse + fully decode a baseline-sequential JFIF payload.

    Returns ``{"width", "height", "planes": {cid: np.uint8 full-res
    plane}, "n_mcus", "n_blocks", "samplings": {cid: (h, v)}}``; with
    ``want_coeffs=True`` also ``"coeffs": {cid: [8×8 int blocks in MCU
    order]}`` (the hook the exact-inversion tests use). Raises
    ``ValueError`` on every malformed input: bad SOI/markers, truncated
    segments, progressive/extended frames, 16-bit quant tables, missing
    tables, invalid Huffman codes, or a truncated entropy stream.
    """
    if len(payload) < 4 or payload[0:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # spec-legal 0xFF fill bytes may pad before any marker (T.81
        # B.1.1.2): the marker code is the first non-0xFF byte of the run
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        tag = payload[pos + 1] if pos + 1 < len(payload) else None
        if tag is None:
            raise ValueError("truncated marker")
        if tag == 0xD9:  # EOI before any scan
            raise ValueError("EOI before SOS")
        pos += 2
        if pos + 2 > len(payload):
            raise ValueError("truncated segment length")
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment body")
        if tag == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, ident = seg[p] >> 4, seg[p] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[ident] = list(seg[p + 1 : p + 65])
                if len(qtables[ident]) != 64:
                    raise ValueError("short quant table")
                p += 65
        elif tag == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, ident = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                if len(bits) != 16 or len(vals) != n:
                    raise ValueError("short Huffman table")
                htables[(cls, ident)] = (tuple(bits), tuple(vals))
                p += 17 + n
        elif tag == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, samp, qid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, qid))
            frame = (w, h, comps)
        elif tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                     0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline frame (progressive/extended) unsupported")
        elif tag == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif tag == 0xDA:  # SOS — entropy data follows the segment
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cid, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cid, tables >> 4, tables & 0x0F))
            pos += seglen
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    br = _ScanBits(payload, pos)
    preds = {cid: 0 for cid, _, _, _ in comps}
    # per-component block planes at that component's resolution
    blocks: dict[int, np.ndarray] = {}
    coeffs: dict[int, list[np.ndarray]] = {cid: [] for cid, *_ in comps}
    for cid, ch, cv, _ in comps:
        blocks[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64)
    scan_tables = {cid: (dc_id, ac_id) for cid, dc_id, ac_id in scan}
    dezig = {qid: _dezigzag_table(qt) for qid, qt in qtables.items()}
    # LUTs built lazily at each component's FIRST use — the same program
    # point where the per-block reader ran its presence checks — so a
    # payload that is missing a table AND corrupt in the entropy stream
    # raises the same error the per-bit reader raised (checks are
    # deterministic, so first-use checking is equivalent to every-block
    # checking).
    luts: dict[int, tuple] = {}
    n_blocks = 0
    ext = _extend
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, ch, cv, qid in comps:
                lt = luts.get(cid)
                if lt is None:
                    if qid not in dezig:
                        raise ValueError(f"missing quant table {qid}")
                    dc_id, ac_id = scan_tables[cid]
                    dc_tab = htables.get((0, dc_id))
                    ac_tab = htables.get((1, ac_id))
                    if dc_tab is None or ac_tab is None:
                        raise ValueError("missing Huffman table for scan")
                    lt = (_decode_lut(*dc_tab), _decode_lut(*ac_tab))
                    luts[cid] = lt
                (dc_val, dc_len), (ac_val, ac_len) = lt
                for by in range(cv):
                    for bx in range(ch):
                        zz = [0] * 64
                        cat = br.read_code(dc_val, dc_len)
                        diff = ext(br.receive(cat), cat)
                        preds[cid] += diff
                        zz[0] = _zz_i64(preds[cid])
                        k = 1
                        while k < 64:
                            sym = br.read_code(ac_val, ac_len)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k >= 64:
                                raise ValueError("AC run past block end")
                            zz[k] = _zz_i64(ext(br.receive(size), size))
                            k += 1
                        qblk = np.zeros(64, dtype=np.int64)
                        qblk[_ZIG_TO_FLAT] = zz
                        qblk = qblk.reshape(8, 8)
                        if want_coeffs:
                            coeffs[cid].append(qblk.copy())
                        deq = qblk.astype(np.float64) * dezig[qid]
                        pix = _DCT_A.T @ deq @ _DCT_A
                        r0 = (my * cv + by) * 8
                        c0 = (mx * ch + bx) * 8
                        blocks[cid][r0 : r0 + 8, c0 : c0 + 8] = pix
                        n_blocks += 1
    planes: dict[int, np.ndarray] = {}
    for cid, ch, cv, _ in comps:
        plane = np.clip(_round_half_up(blocks[cid] + 128.0), 0, 255)
        # nearest-neighbour upsample to full resolution, then crop
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        planes[cid] = plane[:h, :w].astype(np.uint8)
    result = {
        "width": w,
        "height": h,
        "planes": planes,
        "n_mcus": mcus_x * mcus_y,
        "n_blocks": n_blocks,
        "samplings": {cid: (ch, cv) for cid, ch, cv, _ in comps},
    }
    if want_coeffs:
        result["coeffs"] = coeffs
    return result


# ---------------------------------------------------------------------------
# Spark plumbing + catalog entry
# ---------------------------------------------------------------------------


def with_jpeg_source(docs: DataFrame) -> DataFrame:
    """JVM-side derivation of the per-document image description: 1–2 MCUs
    per side and one (Y, Cb, Cr) triple per MCU, all from md5(text) —
    mirrors the PNG entry's md5-pixel convention so the DuckDB oracle can
    replay the data without touching the container."""
    md5 = F.md5("text")
    byte = lambda k: F.conv(F.substring(md5, 2 * k + 1, 2), 16, 10).cast("int")  # noqa: E731
    base = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        "text",
        (byte(0) % 2 + 1).alias("wm"),
        (byte(1) % 2 + 1).alias("hm"),
    )
    base = base.withColumn("n_mcus", (F.col("wm") * F.col("hm")).cast("int"))
    mcu_vals = (
        "transform(sequence(0, n_mcus - 1), i -> "
        "cast(conv(substring(md5(text), 2 * ({0} + 3 * i) + 1, 2), 16, 10) as int))"
    )
    return (
        base.withColumn("y_vals", F.expr(mcu_vals.format(2)))
        .withColumn("cb_vals", F.expr(mcu_vals.format(3)))
        .withColumn("cr_vals", F.expr(mcu_vals.format(4)))
        .select("doc_id", "wm", "hm", "n_mcus", "y_vals", "cb_vals", "cr_vals")
    )


def encode_jpeg_payloads(df: DataFrame) -> DataFrame:
    """Arrow-batched encode: per-MCU-constant YCbCr planes → real baseline
    JFIF bytes. Python is mandatory here (Huffman entropy coding is not
    expressible as SQL expressions); the lane is the same plan-gated
    mapInPandas shape as every other multimodal kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                wm, hm = int(row.wm), int(row.hm)
                yv = np.array(row.y_vals, dtype=np.uint8).reshape(hm, wm)
                cbv = np.array(row.cb_vals, dtype=np.uint8).reshape(hm, wm)
                crv = np.array(row.cr_vals, dtype=np.uint8).reshape(hm, wm)
                y = np.kron(yv, np.ones((16, 16), dtype=np.uint8))
                cb = np.kron(cbv, np.ones((8, 8), dtype=np.uint8))
                cr = np.kron(crv, np.ones((8, 8), dtype=np.uint8))
                out.append((row.doc_id, encode_baseline_jpeg(y, cb, cr)))
            yield pd.DataFrame(out, columns=["doc_id", "payload"])

    return df.mapInPandas(kernel, schema="doc_id long, payload binary")


def decode_jpeg_images(df: DataFrame) -> DataFrame:
    """Arrow-batched decode over real JFIF payloads → per-image stats."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                d = decode_baseline_jpeg(bytes(row.payload))
                y, cb, cr = d["planes"][1], d["planes"][2], d["planes"][3]
                out.append(
                    (
                        row.doc_id, d["width"], d["height"],
                        d["width"] * d["height"], d["n_mcus"], d["n_blocks"],
                        float(y.mean()), int(y.min()), int(y.max()),
                        float(cb.mean()), float(cr.mean()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height", "n_pixels", "n_mcus",
                    "n_blocks", "y_mean", "y_min", "y_max", "cb_mean",
                    "cr_mean",
                ],
            )

    return df.mapInPandas(
        kernel,
        schema="doc_id long, width long, height long, n_pixels long, "
        "n_mcus long, n_blocks long, y_mean double, y_min long, "
        "y_max long, cb_mean double, cr_mean double",
    )


@register(
    "multimodal_jpeg_decode",
    oracle="""
        WITH src AS (
            SELECT doc_id,
                   ('0x' || substr(md5(text), 1, 2))::INT % 2 + 1 AS wm,
                   ('0x' || substr(md5(text), 3, 2))::INT % 2 + 1 AS hm,
                   md5(text) AS m
            FROM documents
            WHERE text IS NOT NULL
        ), vals AS (
            SELECT doc_id, wm, hm,
                   [('0x' || substr(m, 2 * (2 + 3 * i) + 1, 2))::INT
                    for i in range(0, wm * hm)] AS y_vals,
                   [('0x' || substr(m, 2 * (3 + 3 * i) + 1, 2))::INT
                    for i in range(0, wm * hm)] AS cb_vals,
                   [('0x' || substr(m, 2 * (4 + 3 * i) + 1, 2))::INT
                    for i in range(0, wm * hm)] AS cr_vals
            FROM src
        ), dec AS (
            -- closed-form DC-only round trip at quant step 16:
            -- decoded(v) = clamp(2*floor((v-128)/2 + 0.5) + 128, 0, 255)
            SELECT doc_id, wm, hm,
                   [least(255, greatest(0,
                        2 * floor((v - 128.0) / 2 + 0.5) + 128))
                    for v in y_vals] AS y_dec,
                   [least(255, greatest(0,
                        2 * floor((v - 128.0) / 2 + 0.5) + 128))
                    for v in cb_vals] AS cb_dec,
                   [least(255, greatest(0,
                        2 * floor((v - 128.0) / 2 + 0.5) + 128))
                    for v in cr_vals] AS cr_dec
            FROM vals
        )
        SELECT doc_id,
               CAST(16 * wm AS BIGINT) AS width,
               CAST(16 * hm AS BIGINT) AS height,
               CAST(256 * wm * hm AS BIGINT) AS n_pixels,
               CAST(wm * hm AS BIGINT) AS n_mcus,
               CAST(6 * wm * hm AS BIGINT) AS n_blocks,
               round(list_avg(y_dec), 6) AS y_mean,
               CAST(list_min(y_dec) AS BIGINT) AS y_min,
               CAST(list_max(y_dec) AS BIGINT) AS y_max,
               round(list_avg(cb_dec), 6) AS cb_mean,
               round(list_avg(cr_dec), 6) AS cr_mean
        FROM dec
    """,
    doc="REAL baseline-JPEG round trip, stdlib+numpy only: per-document "
    "YCbCr images (per-MCU-constant colour from md5) are encoded as "
    "genuine 4:2:0 JFIF files — float FDCT, quant step 16, zigzag, DC "
    "differential + AC run-length Huffman with the Annex K tables, byte "
    "stuffing — then fully decoded back (marker walk, DHT canonical "
    "Huffman, unstuffing bit reader, dequant, IDCT, chroma upsample). "
    "The oracle replays the visibly-lossy DC quantization in closed "
    "form, never touching the container; the AC/ZRL entropy paths the "
    "flat payloads cannot reach are pinned exactly by "
    "tests/test_multimodal_jpeg.py's coefficient-recovery round trip.",
    tags=("multimodal",),
)
def q_multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13: one-file corpus scans as ONE task, serializing the encode and
    # decode Python lanes (guide §2.5/§6) — spread to core parallelism
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    decoded = decode_jpeg_images(encode_jpeg_payloads(with_jpeg_source(docs)))
    return decoded.select(
        "doc_id", "width", "height", "n_pixels", "n_mcus", "n_blocks",
        F.round("y_mean", 6).alias("y_mean"), "y_min", "y_max",
        F.round("cb_mean", 6).alias("cb_mean"),
        F.round("cr_mean", 6).alias("cr_mean"),
    )


# ---------------------------------------------------------------------------
# AC-path entry (VERDICT r7 #4): payloads with WITHIN-MCU structure whose
# quantized coefficients are closed-form replayable, putting the Huffman
# run-length / ZRL / negative-magnitude lanes under the driver hash gate
# (the flat-MCU entry above can only reach the DC lane).
#
# Construction: s(x) = sign of cos((2x+1)·4π/16) = [+1,-1,-1,+1,+1,-1,-1,+1]
# is the u=4 DCT basis up to the constant 1/√2 — so the INTEGER pixel
# pattern  base + BY·s(x) + CY·s(x)·s(y)  has exactly three nonzero float
# FDCT coefficients per luma block: DC = 8·(base−128), (0,4) = 8·BY,
# (4,4) = 8·CY (all other products vanish by orthogonality; float residue
# ~1e-12 quantizes to 0 at step 16). With base−128, BY, CY all EVEN, each
# quantized value 8·v/16 = v/2 is an exact integer — no rounding boundary —
# and dequantization reproduces the coefficient exactly, so the decoded
# luma plane equals the source pixels bit-for-bit and the oracle is pure
# closed form. The entropy stream this reaches per luma block: DC diff,
# run-13 AC code with positive OR negative magnitude bits ((0,4) sits at
# zigzag 14), a ZRL (the 24-zero gap to (4,4) at zigzag 39), a run-8 code,
# and EOB — the full baseline AC lane.
# ---------------------------------------------------------------------------

_AC_SIGN = [1, -1, -1, 1, 1, -1, -1, 1]  # sign of the u=4 cosine basis


def with_jpeg_ac_source(docs: DataFrame) -> DataFrame:
    """JVM-side derivation of the structured-luma image description:
    per-document horizontal/checker amplitudes BY, CY (even, ±14) and
    per-MCU even-offset luma bases + constant chroma, all from md5(text)."""
    md5 = F.md5("text")
    byte = lambda k: F.conv(F.substring(md5, 2 * k + 1, 2), 16, 10).cast("int")  # noqa: E731
    base = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        "text",
        (byte(0) % 2 + 1).alias("wm"),
        (byte(1) % 2 + 1).alias("hm"),
        (2 * (byte(2) % 15 - 7)).alias("amp_h"),
        (2 * (byte(3) % 15 - 7)).alias("amp_hv"),
    )
    base = base.withColumn("n_mcus", (F.col("wm") * F.col("hm")).cast("int"))
    mcu_byte = (
        "transform(sequence(0, n_mcus - 1), i -> "
        "cast(conv(substring(md5(text), 2 * ({0} + 3 * i) + 1, 2), 16, 10) as int))"
    )
    return (
        base.withColumn(
            "bases",
            F.expr(
                "transform(" + mcu_byte.format(4) + ", v -> 96 + 2 * (v % 33))"
            ),
        )
        .withColumn("cb_vals", F.expr(mcu_byte.format(5)))
        .withColumn("cr_vals", F.expr(mcu_byte.format(6)))
        .select(
            "doc_id", "wm", "hm", "n_mcus", "amp_h", "amp_hv",
            "bases", "cb_vals", "cr_vals",
        )
    )


def encode_jpeg_ac_payloads(df: DataFrame) -> DataFrame:
    """Arrow-batched encode of the structured-luma planes → baseline JFIF."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        s16 = np.tile(np.array(_AC_SIGN, dtype=np.int64), 2)  # 16-wide
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                wm, hm = int(row.wm), int(row.hm)
                by_, cy_ = int(row.amp_h), int(row.amp_hv)
                bases = np.array(row.bases, dtype=np.int64).reshape(hm, wm)
                mcu_pattern = by_ * s16[None, :] + cy_ * (
                    s16[:, None] * s16[None, :]
                )
                y = (
                    np.kron(bases, np.ones((16, 16), dtype=np.int64))
                    + np.tile(mcu_pattern, (hm, wm))
                ).astype(np.uint8)
                cbv = np.array(row.cb_vals, dtype=np.uint8).reshape(hm, wm)
                crv = np.array(row.cr_vals, dtype=np.uint8).reshape(hm, wm)
                cb = np.kron(cbv, np.ones((8, 8), dtype=np.uint8))
                cr = np.kron(crv, np.ones((8, 8), dtype=np.uint8))
                out.append((row.doc_id, encode_baseline_jpeg(y, cb, cr)))
            yield pd.DataFrame(out, columns=["doc_id", "payload"])

    return df.mapInPandas(kernel, schema="doc_id long, payload binary")


def decode_jpeg_ac_stats(df: DataFrame) -> DataFrame:
    """Arrow-batched decode → stats that FINGERPRINT the AC lane: the
    horizontal contrast 2·Σ(Y·s(x))/n recovers the (0,4) coefficient's
    amplitude and the checker contrast Σ(Y·s(x)s(y))/n recovers (4,4) —
    a wrong run/ZRL/magnitude decode shifts them immediately."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base_sign = np.array(_AC_SIGN, dtype=np.int64)
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                d = decode_baseline_jpeg(bytes(row.payload))
                y, cb, cr = d["planes"][1], d["planes"][2], d["planes"][3]
                h, w = y.shape
                sx = np.tile(base_sign, w // 8)
                sy = np.tile(base_sign, h // 8)
                yi = y.astype(np.int64)
                n = h * w
                ss_h = int((yi * sx[None, :]).sum())
                ss_hv = int((yi * (sy[:, None] * sx[None, :])).sum())
                out.append(
                    (
                        row.doc_id, w, h, d["n_mcus"],
                        float(y.mean()), int(y.min()), int(y.max()),
                        2.0 * ss_h / n, 1.0 * ss_hv / n,
                        float(cb.mean()), float(cr.mean()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height", "n_mcus", "y_mean",
                    "y_min", "y_max", "y_h_contrast", "y_hv_contrast",
                    "cb_mean", "cr_mean",
                ],
            )

    return df.mapInPandas(
        kernel,
        schema="doc_id long, width long, height long, n_mcus long, "
        "y_mean double, y_min long, y_max long, y_h_contrast double, "
        "y_hv_contrast double, cb_mean double, cr_mean double",
    )


@register(
    "multimodal_jpeg_ac_decode",
    oracle="""
        WITH src AS (
            SELECT doc_id,
                   ('0x' || substr(m, 1, 2))::INT % 2 + 1 AS wm,
                   ('0x' || substr(m, 3, 2))::INT % 2 + 1 AS hm,
                   2 * (('0x' || substr(m, 5, 2))::INT % 15 - 7) AS amp_h,
                   2 * (('0x' || substr(m, 7, 2))::INT % 15 - 7) AS amp_hv,
                   m
            FROM (SELECT doc_id, md5(text) AS m FROM documents
                  WHERE text IS NOT NULL)
        ), vals AS (
            SELECT doc_id, wm, hm, amp_h, amp_hv,
                   [96 + 2 * (('0x' || substr(m, 2 * (4 + 3 * i) + 1, 2))::INT % 33)
                    for i in range(0, wm * hm)] AS bases,
                   [('0x' || substr(m, 2 * (5 + 3 * i) + 1, 2))::INT
                    for i in range(0, wm * hm)] AS cb_vals,
                   [('0x' || substr(m, 2 * (6 + 3 * i) + 1, 2))::INT
                    for i in range(0, wm * hm)] AS cr_vals
            FROM src
        ), dec AS (
            -- luma round-trips LOSSLESSLY (all-even construction, see the
            -- module comment); chroma is the DC closed form at step 16
            SELECT doc_id, wm, hm, amp_h, amp_hv, bases,
                   [least(255, greatest(0,
                        2 * floor((v - 128.0) / 2 + 0.5) + 128))
                    for v in cb_vals] AS cb_dec,
                   [least(255, greatest(0,
                        2 * floor((v - 128.0) / 2 + 0.5) + 128))
                    for v in cr_vals] AS cr_dec
            FROM vals
        )
        SELECT doc_id,
               CAST(16 * wm AS BIGINT) AS width,
               CAST(16 * hm AS BIGINT) AS height,
               CAST(wm * hm AS BIGINT) AS n_mcus,
               round(list_avg(bases), 6) AS y_mean,
               CAST(list_min(bases) - abs(amp_h) - abs(amp_hv) AS BIGINT) AS y_min,
               CAST(list_max(bases) + abs(amp_h) + abs(amp_hv) AS BIGINT) AS y_max,
               round(2.0 * amp_h, 6) AS y_h_contrast,
               round(1.0 * amp_hv, 6) AS y_hv_contrast,
               round(list_avg(cb_dec), 6) AS cb_mean,
               round(list_avg(cr_dec), 6) AS cr_mean
        FROM dec
    """,
    doc="JPEG round trip with WITHIN-MCU structure — the AC entropy lane "
    "under the driver hash gate (VERDICT r7 #4; multimodal_jpeg_decode's "
    "flat payloads reach only the DC path): per-document horizontal and "
    "checkerboard amplitudes ride the u=4 DCT basis sign pattern, giving "
    "every luma block exactly three nonzero quantized coefficients (DC, "
    "zigzag-14, zigzag-39) that encode through run-13/ZRL/run-8 AC codes "
    "with positive and negative magnitude bits and EOB, and — because all "
    "amplitudes are even — dequantize exactly, so the decoded contrast "
    "stats (which recover the AC amplitudes from the pixel plane) are "
    "closed-form in DuckDB. A wrong Huffman code, run length, ZRL, or "
    "magnitude sign anywhere in the lane shifts y_h_contrast or "
    "y_hv_contrast and fails the hash.",
    tags=("multimodal",),
)
def q_multimodal_jpeg_ac_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13: same Python-lane spread as the flat-MCU entry above
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    decoded = decode_jpeg_ac_stats(
        encode_jpeg_ac_payloads(with_jpeg_ac_source(docs))
    )
    return decoded.select(
        "doc_id", "width", "height", "n_mcus",
        F.round("y_mean", 6).alias("y_mean"), "y_min", "y_max",
        F.round("y_h_contrast", 6).alias("y_h_contrast"),
        F.round("y_hv_contrast", 6).alias("y_hv_contrast"),
        F.round("cb_mean", 6).alias("cb_mean"),
        F.round("cr_mean", 6).alias("cr_mean"),
    )
