"""DVB-S2 soft demapping + bit (de)interleaving, batched JAX.

Reference behavior: dvbs2/dvbs2_bb_to_soft.cpp (per-symbol LUT soft demap +
deinterleave) and codings/dvb-s2/s2_deinterleaver.cpp (column interleaver,
8PSK 3/5 column swap). Here the demap is exact max-log over all
constellation points — one (n_sym, n_states) distance matrix per frame, a
natural MXU shape — and the deinterleaver is a reshape/transpose.

LLR convention: positive = bit 1 ("soft symbol" convention, like the
reference's int8 softs). Negate before feeding ops/fec/ldpc (positive=0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from satdump_tpu.ops.dvbs2.defs import MOD_BITS, constellation


@partial(jax.jit, static_argnames=("m",))
def _maxlog_llr(y, points, m: int, noise_var):
    """y (..., n) complex, points (2^m,) -> LLRs (..., n, m) float32.
    LLR_k = (min dist over bit_k=0) - (min dist over bit_k=1): positive
    means bit 1 more likely."""
    d2 = jnp.abs(y[..., None] - points) ** 2          # (..., n, 2^m)
    idx = np.arange(points.shape[0])
    llrs = []
    for k in range(m):
        bit = (idx >> (m - 1 - k)) & 1
        d0 = jnp.min(jnp.where(bit == 0, d2, jnp.inf), axis=-1)
        d1 = jnp.min(jnp.where(bit == 1, d2, jnp.inf), axis=-1)
        llrs.append(d0 - d1)
    return jnp.stack(llrs, axis=-1) / jnp.maximum(noise_var, 1e-6)


def soft_demap(symbols: np.ndarray, kind: str, g1: float = 0.0,
               g2: float = 0.0, noise_var: float = 0.5) -> np.ndarray:
    """symbols (..., n) complex -> (..., n*m) float32 soft bits
    (positive = 1), bit-serial order (MSB of each symbol first)."""
    from satdump_tpu.utils import xfer
    m = MOD_BITS[kind]
    # complex h2d MUST go through xfer.put (a raw jnp.asarray of complex
    # kills the axon backend: UNIMPLEMENTED at device_put — found driving
    # the DVB-S2 pipeline on the real chip, SMOKE_r05)
    pts = xfer.put(np.asarray(constellation(kind, g1, g2), np.complex64))
    llr = _maxlog_llr(xfer.put(np.ascontiguousarray(symbols,
                                                    np.complex64)),
                      pts, m, noise_var)
    out = xfer.get(llr)
    return out.reshape(out.shape[:-2] + (-1,)).astype(np.float32)


def modulate(bits: np.ndarray, kind: str, g1: float = 0.0,
             g2: float = 0.0) -> np.ndarray:
    """TX fixture: bit-serial (..., n*m) -> symbols (..., n)."""
    m = MOD_BITS[kind]
    pts = constellation(kind, g1, g2)
    b = np.asarray(bits, np.int64).reshape(bits.shape[:-1] + (-1, m))
    idx = np.zeros(b.shape[:-1], np.int64)
    for k in range(m):
        idx = (idx << 1) | b[..., k]
    return pts[idx]


# ---------------------------------------------------------------------------
# Column (de)interleaver (EN 302 307-1 §5.3.3)
# ---------------------------------------------------------------------------
def _geometry(kind: str, n_ldpc: int, rate: str):
    m = MOD_BITS[kind]
    rows = n_ldpc // m
    # 8PSK 3/5: column read order 2,1,0 instead of 0,1,2
    if kind == "8psk" and rate == "3/5":
        order = [2, 1, 0]
    else:
        order = list(range(m))
    return m, rows, order


def interleave(bits: np.ndarray, kind: str, rate: str) -> np.ndarray:
    """Serial LDPC codeword bits (..., N) -> symbol-serial bits (..., N).
    Writes the codeword column-wise into m columns, reads row-wise."""
    m, rows, order = _geometry(kind, bits.shape[-1], rate)
    if m == 2:
        return bits  # QPSK: no interleaving
    cols = bits.reshape(bits.shape[:-1] + (m, rows))
    cols = cols[..., np.argsort(order), :]     # place column c at order[c]
    return np.swapaxes(cols, -1, -2).reshape(bits.shape)


def deinterleave(soft: np.ndarray, kind: str, rate: str) -> np.ndarray:
    """Symbol-serial soft bits (..., N) -> LDPC codeword order (..., N)."""
    m, rows, order = _geometry(kind, soft.shape[-1], rate)
    if m == 2:
        return soft
    rowsarr = soft.reshape(soft.shape[:-1] + (rows, m))
    cols = np.swapaxes(rowsarr, -1, -2)        # (..., m, rows)
    return cols[..., order, :].reshape(soft.shape)
