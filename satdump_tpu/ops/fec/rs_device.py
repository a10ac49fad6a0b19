"""Device-resident batched Reed-Solomon decoder (CCSDS RS(255,223)/(255,239)).

The NumPy codec in reed_solomon.py is the portable reference; this module is
the TPU formulation that keeps the whole CADU chain on-device (VERDICT r3:
"RS syndromes/Chien/Forney as batched device lanes"). Design:

* GF(256) multiply with *no gathers*: the xtime ladder — a·b = XOR_k b_k ·
  (a·x^k) with x·a computed by shift-and-conditional-XOR of the field
  polynomial — ~24 int32 VPU ops per element, fully vectorized over lanes.
* GF(2)-linear maps as bit-sliced matmuls on the MXU: the syndrome operator,
  Chien/derivative/Omega polynomial evaluation over all 255 locations, and
  the CCSDS dual-basis conversion (which is GF(2)-linear, so it FUSES into
  the syndrome matrix — dual-domain codewords are decoded without ever
  materializing the standard-domain bytes).
* Berlekamp-Massey as a shift-free recurrence: carrying B' = x^m·B turns the
  per-lane variable shift (a gather in the NumPy version) into a static
  1-coefficient roll.

Reference behavior: src-core/common/codings/reedsolomon/reedsolomon.cpp
(libcorrect wrapper, poly 0x187, fcr 112/120, prim 11, dual basis,
interleave 4/5). Everything here is jit-traceable with static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from satdump_tpu.ops.fec.reed_solomon import (PRIM_POLY, TO_DUAL, gf_tables)

_MSB_FIRST = np.arange(7, -1, -1)


def gf_mul_dev(a: jnp.ndarray, b: jnp.ndarray, poly: int = PRIM_POLY
               ) -> jnp.ndarray:
    """Elementwise GF(256) product of int32 arrays (broadcasting), gather-free.

    xtime ladder: accumulate a·x^k for each set bit of b. x·v = (v<<1) XOR
    poly when bit 8 pops out (poly includes the 0x100 term, clearing it)."""
    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)
    res = jnp.zeros(jnp.broadcast_shapes(a.shape, b.shape), jnp.int32)
    aa = jnp.broadcast_to(a, res.shape)
    for k in range(8):
        res = res ^ jnp.where((b >> k) & 1 == 1, aa, 0)
        if k < 7:
            aa = (aa << 1) ^ (((aa >> 7) & 1) * poly)
    return res


def gf_inv_dev(a: jnp.ndarray, poly: int = PRIM_POLY) -> jnp.ndarray:
    """Elementwise inverse a^254 (0 -> 0) via square-and-multiply:
    254 = 2+4+8+16+32+64+128 -> 7 squarings + 6 products."""
    sq = gf_mul_dev(a, a, poly)          # a^2
    res = sq
    for _ in range(6):                    # a^4 .. a^128, folded in
        sq = gf_mul_dev(sq, sq, poly)
        res = gf_mul_dev(res, sq, poly)
    return res


def _unpack_bits(x: jnp.ndarray) -> jnp.ndarray:
    """(..., n) int -> (..., n*8) 0/1 int32, MSB first per byte."""
    b = (x[..., None].astype(jnp.int32) >> jnp.asarray(_MSB_FIRST)) & 1
    return b.reshape(*x.shape[:-1], x.shape[-1] * 8)


def _bitmatmul(bits: jnp.ndarray, M: np.ndarray) -> jnp.ndarray:
    """GF(2) matmul (B, n) @ (n, m) -> (B, m) int32 in {0,1}: bf16 MXU
    multiply with exact f32 accumulation (inputs 0/1), mod 2 on int cast."""
    s = jnp.dot(bits.astype(jnp.bfloat16), jnp.asarray(M, jnp.bfloat16),
                preferred_element_type=jnp.float32)
    return s.astype(jnp.int32) & 1


def _pack_bits_gf(bits: jnp.ndarray, nbytes: int) -> jnp.ndarray:
    """(B, nbytes*8) 0/1 -> (B, nbytes) int32, MSB first. Strided slices,
    not reshape(...,8)*w+sum — the reduce-of-minor-reshape form can wedge
    the axon compiler (see cadu_chain packing note)."""
    out = jnp.zeros((bits.shape[0], nbytes), jnp.int32)
    for k in range(8):
        out = out + (bits[:, k::8] << (7 - k))
    return out


class RSDevice:
    """Batched device RS decoder; mirrors reed_solomon.ReedSolomon semantics
    (decode returns (corrected, nerrors) with -1 = uncorrectable, input left
    unmodified). `dual=True` decodes dual-basis (channel-domain) codewords
    directly — conversion is fused into the GF(2) operators."""

    def __init__(self, k: int = 223, dual: bool = True,
                 fcr: int | None = None, prim: int = 11,
                 poly: int = PRIM_POLY):
        self.n = 255
        self.k = k
        self.nroots = 255 - k
        self.t = self.nroots // 2
        self.fcr = fcr if fcr is not None else (112 if k == 223 else 120)
        self.prim = prim
        self.poly = poly
        self.dual = dual
        exp, log, mul = gf_tables(poly)
        nroots = self.nroots

        # --- syndrome operator (2040, nroots*8), dual conversion fused -----
        deg = 254 - np.arange(255)
        j = np.arange(nroots)
        expo = np.mod(deg[:, None].astype(np.int64)
                      * prim * (self.fcr + j)[None, :], 255)
        P = exp[expo].astype(np.uint8)                      # (255, nroots)
        basis = (1 << _MSB_FIRST).astype(np.uint8)          # MSB-first bit k
        if dual:
            # bit k set in the DUAL byte contributes from_dual(2^(7-k)) in
            # the standard domain (from_dual is GF(2)-linear)
            from satdump_tpu.ops.fec.reed_solomon import FROM_DUAL
            basis_std = FROM_DUAL[basis]
        else:
            basis_std = basis
        prod = mul[basis_std[None, :, None], P[:, None, :]]  # (255,8,nroots)
        Msyn = np.unpackbits(prod[..., None], axis=-1, count=8)
        self._Msyn = Msyn.reshape(255 * 8, nroots * 8).astype(np.float32)

        # --- Chien / derivative / Omega evaluation operators ----------------
        lpow = np.arange(255)
        i_l = np.arange(nroots + 1)
        Z = exp[np.mod(-prim * np.outer(lpow, i_l).astype(np.int64), 255)]
        # Chien: vals(B,255) bits = Lambda_bits (B,264) @ Mc (264, 2040)
        self._Mc = self._lin_eval_matrix(Z, mul)             # (264, 2040)
        # derivative: sum over odd i of Lambda_i x^(i-1) evaluated at
        # alpha^(-prim*l): coefficient matrix with even columns zeroed
        Zd = np.zeros_like(Z)
        for ii in range(1, nroots + 1, 2):
            Zd[:, ii] = exp[np.mod(-prim * (ii - 1) * lpow.astype(np.int64), 255)]
        self._Md = self._lin_eval_matrix(Zd, mul)
        # Omega eval: Om has nroots coeffs
        Zo = exp[np.mod(-prim * np.outer(lpow, np.arange(nroots)).astype(np.int64), 255)]
        self._Mo = self._lin_eval_matrix(Zo, mul)            # (256, 2040)
        # X^(1-fcr) factor per location
        self._xpow = exp[np.mod(prim * lpow.astype(np.int64) * (1 - self.fcr),
                                255)].astype(np.int32)
        # to_dual as XOR constants: contribution of bit k (MSB first)
        self._todual_bits = TO_DUAL[basis].astype(np.int32)  # (8,)

    @staticmethod
    def _lin_eval_matrix(Z: np.ndarray, mul: np.ndarray) -> np.ndarray:
        """Bit-sliced operator for v[l] = XOR_i gf_mul(c_i, Z[l, i]):
        (ncoef*8, 255*8) with MSB-first bit layout."""
        npts, ncoef = Z.shape
        basis = (1 << _MSB_FIRST).astype(np.uint8)
        # prod[i, k, l] = mul(2^(7-k), Z[l, i])
        prod = mul[basis[None, :, None], Z.T[:, None, :].astype(np.uint8)]
        bits = np.unpackbits(prod[..., None], axis=-1, count=8)  # (ncoef,8,npts,8)
        return bits.transpose(0, 1, 2, 3).reshape(ncoef * 8, npts * 8
                                                  ).astype(np.float32)

    # ------------------------------------------------------------------ core
    def syndromes(self, cw: jnp.ndarray) -> jnp.ndarray:
        """cw: (B, 255) int32 bytes (dual-domain iff self.dual).
        Returns (B, nroots) int32 standard-domain syndromes."""
        bits = _unpack_bits(cw)
        sb = _bitmatmul(bits, self._Msyn)
        return _pack_bits_gf(sb, self.nroots)

    def _to_dual_dev(self, x: jnp.ndarray) -> jnp.ndarray:
        """Standard -> dual, GF(2)-linear XOR ladder (no gathers)."""
        res = jnp.zeros_like(x)
        for k in range(8):
            bit = (x >> (7 - k)) & 1
            res = res ^ (bit * int(self._todual_bits[k]))
        return res

    def decode(self, cw: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """cw: (B, 255) uint8/int32 codewords (dual-domain iff self.dual).
        Returns (corrected (B,255) int32, nerrors (B,) int32; -1 = fail)."""
        cw = cw.astype(jnp.int32)
        B = cw.shape[0]
        nroots = self.nroots
        poly = self.poly

        S = self.syndromes(cw)                     # (B, nroots) standard
        no_errors = ~jnp.any(S != 0, axis=1)

        # Berlekamp-Massey as a lax.scan over the nroots iterations (an
        # unrolled Python loop compiles ~30x slower for identical runtime).
        # Shift-free variant: B' = x^m·B is carried pre-shifted, so the
        # per-lane variable shift is a static 1-coefficient roll.
        # SS[r, :, i] = S_{r-i} (0 for i > r), gathered once outside the scan
        r_idx = np.arange(nroots)[:, None] - np.arange(nroots + 1)[None, :]
        SS = jnp.where(jnp.asarray(r_idx >= 0),
                       S[:, np.clip(r_idx, 0, nroots - 1)], 0
                       ).transpose(1, 0, 2)              # (nroots, B, nr+1)

        def _xor_fold(x):
            # XOR-reduce the last axis (width padded to a power of two)
            w = x.shape[-1]
            p = 1 << (w - 1).bit_length()
            if p != w:
                x = jnp.concatenate(
                    [x, jnp.zeros(x.shape[:-1] + (p - w,), x.dtype)], -1)
            while x.shape[-1] > 1:
                h = x.shape[-1] // 2
                x = x[..., :h] ^ x[..., h:]
            return x[..., 0]

        def bm_step(carry, inp):
            Lam, Bp, L, b = carry
            SSr, r = inp
            d = _xor_fold(gf_mul_dev(Lam, SSr, poly))
            d_zero = d == 0
            grow = (~d_zero) & (2 * L <= r)
            coef = gf_mul_dev(d, gf_inv_dev(b, poly), poly)
            Lnew = Lam ^ gf_mul_dev(coef[:, None], Bp, poly)
            shift = lambda P: jnp.concatenate(
                [jnp.zeros((B, 1), jnp.int32), P[:, :-1]], axis=1)
            Bp = jnp.where(grow[:, None], shift(Lam), shift(Bp))
            b = jnp.where(grow, d, b)
            L = jnp.where(grow, r + 1 - L, L)
            Lam = jnp.where(d_zero[:, None], Lam, Lnew)
            return (Lam, Bp, L, b), None

        Lam0 = jnp.zeros((B, nroots + 1), jnp.int32).at[:, 0].set(1)
        Bp0 = jnp.zeros((B, nroots + 1), jnp.int32).at[:, 1].set(1)  # x·1
        (Lam, _, L, _), _ = jax.lax.scan(
            bm_step, (Lam0, Bp0, jnp.zeros((B,), jnp.int32),
                      jnp.ones((B,), jnp.int32)),
            (SS, jnp.arange(nroots)))

        # Omega = S * Lambda mod x^nroots via a Toeplitz of Lambda
        # (T[ii, j] = Lam_{ii-j}), one static gather + one xtime multiply
        lam_bits = _unpack_bits(Lam)                     # (B, 264)
        t_idx = np.arange(nroots)[:, None] - np.arange(nroots)[None, :]
        T = jnp.where(jnp.asarray(t_idx >= 0),
                      Lam[:, np.clip(t_idx, 0, nroots)], 0)  # (B, nr, nr)
        Om = _xor_fold(gf_mul_dev(S[:, None, :], T, poly))   # (B, nroots)

        # Chien + Forney over all 255 locations via bit-matmuls
        vals = _pack_bits_gf(_bitmatmul(lam_bits, self._Mc), 255)
        lam_d = _pack_bits_gf(_bitmatmul(lam_bits, self._Md), 255)
        om_val = _pack_bits_gf(_bitmatmul(_unpack_bits(Om), self._Mo), 255)
        is_root = vals == 0                               # (B, 255)
        nerr = jnp.sum(is_root.astype(jnp.int32), axis=1)

        xpow = jnp.asarray(self._xpow)[None, :]
        mag = gf_mul_dev(gf_mul_dev(xpow, om_val, poly),
                         gf_inv_dev(lam_d, poly), poly)
        mag = jnp.where(is_root, mag, 0)
        # error at Chien index l sits at byte 254-l -> reverse
        corr = mag[:, ::-1]
        if self.dual:
            corr = self._to_dual_dev(corr)
        corrected = cw ^ corr

        S2 = self.syndromes(corrected)
        ok = ~jnp.any(S2 != 0, axis=1)
        good = (ok & (L <= self.t)) | no_errors
        nerrors = jnp.where(no_errors, 0, jnp.where(good, nerr, -1))
        out = jnp.where(good[:, None], corrected, cw)
        return out, nerrors.astype(jnp.int32)

    def decode_interleaved(self, data: jnp.ndarray, depth: int
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """data: (B, 255*depth) byte-interleaved (codeword b = data[b::depth]).
        Returns (corrected (B, 255*depth), nerrors (B, depth))."""
        B = data.shape[0]
        cws = data.reshape(B, 255, depth).transpose(0, 2, 1).reshape(
            B * depth, 255)
        corrected, nerr = self.decode(cws)
        out = corrected.reshape(B, depth, 255).transpose(0, 2, 1).reshape(
            B, 255 * depth)
        return out, nerr.reshape(B, depth)
