"""Baseline JPEG entropy decoding + batched IDCT (METEOR MSU-MR LRPT).

The METEOR LRPT downlink compresses MSU-MR imagery with the *standard*
JPEG baseline luminance scheme (ITU-T T.81 Annex K tables) — the reference
hand-embeds those tables (plugins/meteor_support/meteor/instruments/msumr/
lrpt/tables.h) and decodes MCU-by-MCU with a per-bit scan + per-block int
IDCT (lrpt/{huffman,segment,idct}.cpp). Here the tables are *constructed*
from the public T.81 spec (canonical Huffman from BITS/HUFFVAL), entropy
decoding runs on host with a 16-bit peek LUT (sequential bit stream — host
work by design), and the dequant+IDCT over ALL collected blocks happens in
ONE batched device einsum (8x8 DCT basis matmuls -> MXU) at image-assembly
time.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np

# --- ITU-T T.81 Annex K: luminance tables (public spec constants) ----------

# K.1 — luminance quantization table, natural (row-major) order
QTABLE_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.float64)

# zig-zag index: ZIGZAG[natural_pos] = position in the zig-zag sequence
ZIGZAG = np.array([
    0, 1, 5, 6, 14, 15, 27, 28,
    2, 4, 7, 13, 16, 26, 29, 42,
    3, 8, 12, 17, 25, 30, 41, 43,
    9, 11, 18, 24, 31, 40, 44, 53,
    10, 19, 23, 32, 39, 45, 52, 54,
    20, 22, 33, 38, 46, 51, 55, 60,
    21, 34, 37, 47, 50, 56, 59, 61,
    35, 36, 48, 49, 57, 58, 62, 63], np.int64)

# K.3.1 — luminance DC: BITS (codes per length 1..16) and HUFFVAL
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# K.3.2 — luminance AC
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
assert len(AC_VALS) == sum(AC_BITS)


def _canonical_codes(bits: List[int]) -> List[Tuple[int, int]]:
    """BITS -> [(length, code), ...] in HUFFVAL order (T.81 C.2)."""
    out = []
    code = 0
    for length in range(1, len(bits) + 1):
        for _ in range(bits[length - 1]):
            out.append((length, code))
            code += 1
        code <<= 1
    return out


@lru_cache(maxsize=4)
def _peek_lut(kind: str) -> Tuple[np.ndarray, np.ndarray]:
    """16-bit peek LUT: value16 -> (symbol, code_length). symbol==-1 where no
    code matches (corrupt stream)."""
    bits, vals = (DC_BITS, DC_VALS) if kind == "dc" else (AC_BITS, AC_VALS)
    sym = np.full(1 << 16, -1, np.int32)
    ln = np.zeros(1 << 16, np.int32)
    for (length, code), v in zip(_canonical_codes(list(bits)), vals):
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        sym[lo:hi] = v
        ln[lo:hi] = length
    return sym, ln


def quantization_table(qf: float) -> np.ndarray:
    """Quality-factor-scaled luminance quant table, natural order.
    Matches the reference's scaling variant (lrpt/huffman.cpp:14-29:
    the 5000/qf branch is gated at 20<=qf<50, unlike stock IJG)."""
    if 20 <= qf < 50:
        scale = 5000.0 / qf
    else:
        scale = 200.0 - 2.0 * qf
    t = np.floor(scale / 100.0 * QTABLE_LUM + 0.5)
    return np.maximum(t, 1.0)


class BitReader:
    """MSB-first bit reader over a byte buffer (no JPEG byte-stuffing on
    the LRPT link)."""

    __slots__ = ("bits", "pos", "n")

    def __init__(self, data: bytes):
        arr = np.frombuffer(data, np.uint8)
        self.bits = np.unpackbits(arr)
        self.pos = 0
        self.n = self.bits.size

    def peek16(self) -> int:
        p = self.pos
        chunk = self.bits[p: p + 16]
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v << (16 - chunk.size)

    def take(self, k: int) -> int:
        p = self.pos
        if p + k > self.n:
            raise EOFError
        v = 0
        for b in self.bits[p: p + k]:
            v = (v << 1) | int(b)
        self.pos = p + k
        return v


def _extend(v: int, length: int) -> int:
    """T.81 F.12 EXTEND: map `length`-bit magnitude to signed value."""
    if length == 0:
        return 0
    if v < (1 << (length - 1)):
        return v - (1 << length) + 1
    return v


def decode_mcus(data: bytes, n_mcus: int) -> Tuple[np.ndarray, int]:
    """Entropy-decode up to n_mcus 8x8 blocks from a segment bitstream.

    Returns (coeffs (n_mcus, 64) int32 in ZIG-ZAG order, n_decoded).
    Decoding stops at the first corrupt/truncated block (the reference marks
    the segment partial, lrpt/segment.cpp FindDC/FindAC CFC path)."""
    dc_sym, dc_len = _peek_lut("dc")
    ac_sym, ac_len = _peek_lut("ac")
    out = np.zeros((n_mcus, 64), np.int32)
    rd = BitReader(data)
    last_dc = 0
    done = 0
    try:
        for i in range(n_mcus):
            p16 = rd.peek16()
            cat = int(dc_sym[p16])
            if cat < 0:
                break
            rd.take(int(dc_len[p16]))
            diff = _extend(rd.take(cat), cat) if cat else 0
            last_dc += diff
            out[i, 0] = last_dc
            k = 1
            while k < 64:
                p16 = rd.peek16()
                rs = int(ac_sym[p16])
                if rs < 0:
                    raise EOFError
                rd.take(int(ac_len[p16]))
                if rs == 0x00:          # EOB
                    break
                run, size = rs >> 4, rs & 0xF
                if rs == 0xF0:          # ZRL: 16 zeros
                    k += 16
                    continue
                k += run
                if k >= 64:
                    break
                out[i, k] = _extend(rd.take(size), size)
                k += 1
            done = i + 1
    except EOFError:
        pass
    return out, done


@lru_cache(maxsize=1)
def _dct_basis() -> np.ndarray:
    """8x8 type-II DCT basis C with C[k,n] = a_k cos((2n+1)kπ/16)."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = np.cos((2 * n + 1) * k * np.pi / 16.0)
    c[0] *= 1.0 / np.sqrt(2.0)
    return (c * 0.5).astype(np.float32)


def dequantize_idct(coeffs_zz: np.ndarray, qtables: np.ndarray) -> np.ndarray:
    """(N, 64) zig-zag coeffs + (N, 64) natural-order quant tables ->
    (N, 8, 8) uint8 pixels. One batched einsum over all blocks (device)."""
    if coeffs_zz.size == 0:
        return np.zeros((0, 8, 8), np.uint8)
    # de-zig-zag into natural order, then dequantize (both cheap host ops
    # compared to the transform); IDCT batched on device.
    natural = coeffs_zz[:, ZIGZAG].astype(np.float32) * qtables.astype(np.float32)
    blocks = natural.reshape(-1, 8, 8)

    import jax
    import jax.numpy as jnp
    C = _dct_basis()

    @jax.jit
    def idct(b):
        Cj = jnp.asarray(C)
        # x = C^T  B  C  (2-D inverse DCT), then level shift
        y = jnp.einsum("ki,nkl,lj->nij", Cj, b, Cj)
        return jnp.clip(jnp.round(y + 128.0), 0, 255)

    from satdump_tpu.utils import xfer
    out = xfer.get(idct(xfer.put(blocks)))
    return out.astype(np.uint8)
