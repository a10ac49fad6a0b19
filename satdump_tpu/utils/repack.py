"""Bit repacking utilities (ref src-core/common/repack.h) — vectorized NumPy
instead of the reference's per-byte shift loops: unpack the whole buffer to a
bit matrix once, reshape to n-bit words, and dot with powers of two. Batched
over all lines/packets at once."""

from __future__ import annotations

import numpy as np


def repack_bytes_to_nbits(data: np.ndarray, nbits: int) -> np.ndarray:
    """data: (..., nbytes) uint8 -> (..., nwords) uint16/uint32 of
    big-endian-packed n-bit words (ref repackBytesTo10bits etc.)."""
    data = np.asarray(data, np.uint8)
    bits = np.unpackbits(data, axis=-1)
    nwords = bits.shape[-1] // nbits
    bits = bits[..., : nwords * nbits].reshape(*bits.shape[:-1], nwords, nbits)
    weights = (1 << np.arange(nbits - 1, -1, -1)).astype(np.uint32)
    words = bits.astype(np.uint32) @ weights
    return words.astype(np.uint16 if nbits <= 16 else np.uint32)


def repack_10bit(data: np.ndarray) -> np.ndarray:
    return repack_bytes_to_nbits(data, 10)


def repack_12bit(data: np.ndarray) -> np.ndarray:
    return repack_bytes_to_nbits(data, 12)


def repack_16bit(data: np.ndarray) -> np.ndarray:
    return repack_bytes_to_nbits(data, 16)


def pack_nbits_to_bytes(words: np.ndarray, nbits: int) -> np.ndarray:
    """Inverse of repack_bytes_to_nbits (for TX/test fixtures)."""
    words = np.asarray(words, np.uint32)
    shifts = np.arange(nbits - 1, -1, -1, dtype=np.uint32)
    bits = ((words[..., None] >> shifts) & 1).astype(np.uint8)
    bits = bits.reshape(*words.shape[:-1], -1)
    pad = (-bits.shape[-1]) % 8
    if pad:
        bits = np.concatenate(
            [bits, np.zeros((*bits.shape[:-1], pad), np.uint8)], axis=-1)
    return np.packbits(bits, axis=-1)
