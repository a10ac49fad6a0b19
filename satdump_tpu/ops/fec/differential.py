"""Differential codecs (ref src-core/common/codings/differential/).

Bit-level NRZ-M and QPSK differential decode, vectorized. Streaming state is
a single carried bit/symbol.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def nrzm_encode(bits: np.ndarray, last: int = 0) -> Tuple[np.ndarray, int]:
    """NRZ-M: output toggles when input bit is 1 (out[i] = out[i-1] ^ in[i])."""
    bits = np.asarray(bits, dtype=np.uint8)
    out = np.bitwise_xor.accumulate(bits) ^ last
    return out.astype(np.uint8), int(out[-1]) if len(out) else last


def nrzm_decode(bits: np.ndarray, last: int = 0) -> Tuple[np.ndarray, int]:
    """Inverse: in[i] = out[i] ^ out[i-1] (ref differential/nrzm.cpp)."""
    bits = np.asarray(bits, dtype=np.uint8)
    prev = np.concatenate([[last], bits[:-1]])
    return (bits ^ prev).astype(np.uint8), int(bits[-1]) if len(bits) else last


def qpsk_diff_decode(symbols: np.ndarray, last: int = 0) -> Tuple[np.ndarray, int]:
    """Differential decode of 2-bit QPSK symbols (gray-coded phase deltas)."""
    symbols = np.asarray(symbols, dtype=np.uint8)
    prev = np.concatenate([[last], symbols[:-1]])
    return ((symbols - prev) & 3).astype(np.uint8), int(symbols[-1]) if len(symbols) else last
