"""Convolutional k=7 r=1/2 codec: encoder + batched soft Viterbi decoder.

Reference: src-core/common/codings/viterbi/{cc_encoder,cc_decoder}.cpp (the
VOLK `volk_8u_x4_conv_k7_r2_8u` SIMD trellis) and viterbi27.h / viterbi_1_2.h
streaming wrappers. Conventions match the reference: polynomials {79, 109}
(the bit-reversed-register form of CCSDS 171/133 octal), state = last K-1
input bits with newest bit in the LSB, soft symbols as uint8 where 0/255 are
confident and 128 is an erasure.

TPU design: the 64-state ACS update is fully vectorized over states *and* a
batch dimension (many streams / phase hypotheses in lanes); only the T time
steps are sequential (`lax.scan`). Traceback is a second reverse scan.
Streaming decode uses delayed emission with traceback depth D (standard
continuous Viterbi), carrying path metrics + D decision rows between blocks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

K = 7
NSTATES = 64
POLYA = 79    # 0b1001111
POLYB = 109   # 0b1101101
TRACEBACK = 96  # delayed-emission depth (>= 5*K is the usual rule)


def _parity(x: np.ndarray) -> np.ndarray:
    x = x ^ (x >> 4)
    x = x ^ (x >> 2)
    x = x ^ (x >> 1)
    return x & 1


def _expected_table() -> np.ndarray:
    """E[state, bit, 2] = expected output bits for transition (state, input bit)."""
    s = np.arange(NSTATES)[:, None]          # (64,1)
    b = np.arange(2)[None, :]                # (1,2)
    reg = (s << 1) | b                       # 7-bit register
    e0 = _parity(reg & POLYA)
    e1 = _parity(reg & POLYB)
    return np.stack([e0, e1], axis=-1).astype(np.uint8)  # (64,2,2)


_E = _expected_table()


def conv_encode(bits: np.ndarray, start_state: int = 0) -> np.ndarray:
    """Encode bits -> 2*len(bits) output bits (ref cc_encoder.cpp)."""
    bits = np.asarray(bits, dtype=np.uint8)
    out = np.empty(2 * len(bits), dtype=np.uint8)
    s = start_state
    for i, b in enumerate(bits):
        reg = ((s << 1) | int(b)) & 0x7F
        out[2 * i] = _parity(np.uint8(reg & POLYA))
        out[2 * i + 1] = _parity(np.uint8(reg & POLYB))
        s = reg & 0x3F
    return out


def conv_encode_batch(bits: np.ndarray) -> np.ndarray:
    """Vectorized NumPy encoder over (..., N) bit arrays."""
    bits = np.asarray(bits, dtype=np.uint8)
    n = bits.shape[-1]
    # register value at step i = bits[i-6..i] as a 7-bit number (newest = LSB)
    reg = np.zeros(bits.shape, dtype=np.int32)
    for k in range(K):
        shifted = np.zeros_like(bits)
        if k == 0:
            shifted = bits
        else:
            shifted[..., k:] = bits[..., :-k]
        reg |= shifted.astype(np.int32) << k
    e0 = _parity(reg & POLYA)
    e1 = _parity(reg & POLYB)
    out = np.empty(bits.shape[:-1] + (2 * n,), dtype=np.uint8)
    out[..., 0::2] = e0
    out[..., 1::2] = e1
    return out


class ViterbiState(NamedTuple):
    pm: jnp.ndarray         # (B, 64) float32 path metrics
    decisions: jnp.ndarray  # (D, B, 64) bool, last D decision rows


def viterbi_init(batch: int = 1, traceback: int = TRACEBACK) -> ViterbiState:
    pm = jnp.full((batch, NSTATES), 1e6, jnp.float32).at[:, 0].set(0.0)
    return ViterbiState(
        pm=pm,
        decisions=jnp.zeros((traceback, batch, NSTATES), jnp.bool_),
    )


# Precomputed trellis index tables (host constants)
_NS = np.arange(NSTATES)
_PRED0 = (_NS >> 1).astype(np.int32)            # predecessor with dropped bit 0
_PRED1 = ((_NS >> 1) | 32).astype(np.int32)     # predecessor with dropped bit 1
_BIT = (_NS & 1).astype(np.int32)               # input bit of transition into ns
# expected outputs for transition (pred, bit_of_ns): (64, 2)
_E0_T = _E[:, :, 0].astype(np.float32)  # [state, bit]
_E1_T = _E[:, :, 1].astype(np.float32)


@partial(jax.jit, static_argnames=("renorm",))
def viterbi_acs(pm: jnp.ndarray, soft: jnp.ndarray, renorm: bool = True
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ACS over a block. pm: (B,64). soft: (B,T,2) float32 in [0,255]
    (255 = confident 1). Returns (new_pm, decisions (T,B,64) bool).

    renorm=False drops the per-step min-subtract (a cross-state reduction
    each trellis step). Metrics are integer-valued and grow by <= 510/step,
    so for T <= ~32k steps they stay exact in f32 — the tiled lane decoder
    always qualifies; only unbounded streaming needs renorm."""
    # Butterfly formulation — NO gathers. State ns = 2m+b has predecessors
    # m (pm[:, :32]) and m+32 (pm[:, 32:]); the trellis permutation becomes
    # pure slice/reshape, which the VPU handles at full rate (XLA's gather
    # lowering is the bottleneck otherwise).
    e0 = jnp.asarray(_E0_T)  # (64,2) expected outputs per (state, bit)
    e1 = jnp.asarray(_E1_T)

    def step(pm, soft_t):
        s0 = soft_t[:, 0][:, None, None]  # (B,1,1)
        s1 = soft_t[:, 1][:, None, None]
        # bm[s,b] = |s0 - 255 e0| + |s1 - 255 e1|, split by predecessor half
        bmA = jnp.abs(s0 - 255.0 * e0[None, :32]) \
            + jnp.abs(s1 - 255.0 * e1[None, :32])      # (B,32,2)
        bmB = jnp.abs(s0 - 255.0 * e0[None, 32:]) \
            + jnp.abs(s1 - 255.0 * e1[None, 32:])
        cand_a = pm[:, :32, None] + bmA                # pred m
        cand_b = pm[:, 32:, None] + bmB                # pred m+32
        dec = (cand_b < cand_a).reshape(pm.shape[0], NSTATES)   # ns = 2m+b
        new_pm = jnp.minimum(cand_a, cand_b).reshape(pm.shape[0], NSTATES)
        if renorm:
            new_pm = new_pm - jnp.min(new_pm, axis=-1, keepdims=True)
        return new_pm, dec

    pm, decisions = jax.lax.scan(step, pm, jnp.swapaxes(soft, 0, 1))
    return pm, decisions


@jax.jit
def viterbi_traceback(pm: jnp.ndarray, decisions: jnp.ndarray) -> jnp.ndarray:
    """Traceback from best end state. decisions: (T,B,64). Returns bits (B,T).

    The survivor state is carried as a ONE-HOT (B,64) f32 vector so each
    step is multiply/reduce/reshape — no per-step gather (XLA gathers are
    the TPU bottleneck). prev(2m+b) = m or m+32 by the decision bit, which
    in one-hot form is a (B,32,2)->sum fold plus a masked concat."""
    B = pm.shape[0]
    oh0 = (pm == jnp.min(pm, axis=-1, keepdims=True)).astype(jnp.float32)
    # break ties towards the lowest state (argmin semantics)
    oh0 = (jnp.cumsum(oh0, axis=-1) * oh0 == 1.0).astype(jnp.float32)

    odd = (jnp.arange(NSTATES) & 1).astype(jnp.float32)

    def step(oh, dec_t):
        d = jnp.sum(dec_t.astype(jnp.float32) * oh, axis=-1)       # (B,)
        bit = jnp.sum(oh * odd, axis=-1).astype(jnp.uint8)         # state&1
        oh_m = jnp.sum(oh.reshape(B, 32, 2), axis=-1)              # state>>1
        oh_new = jnp.concatenate([oh_m * (1.0 - d)[:, None],
                                  oh_m * d[:, None]], axis=1)
        return oh_new, bit

    _, bits_rev = jax.lax.scan(step, oh0, decisions[::-1])
    return bits_rev[::-1].swapaxes(0, 1)  # (B,T)


def viterbi_decode_block(soft: jnp.ndarray, pm: jnp.ndarray | None = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-shot block decode. soft: (B,T,2) float in [0,255]. Returns
    (bits (B,T) uint8, final pm)."""
    if soft.ndim == 2:
        soft = soft[None]
    B = soft.shape[0]
    if pm is None:
        pm = jnp.zeros((B, NSTATES), jnp.float32)
    pm, dec = viterbi_acs(pm, soft)
    bits = viterbi_traceback(pm, dec)
    return bits, pm


class StreamViterbi:
    """Continuous r=1/2 k=7 Viterbi with delayed emission (ref Viterbi27,
    common/codings/viterbi/viterbi27.h:10-34).

    Host-side wrapper holding device state; decode(soft_pairs) returns the
    decoded bits delayed by `traceback` trellis steps.
    """

    def __init__(self, batch: int = 1, traceback: int = TRACEBACK):
        self.traceback = traceback
        self.batch = batch
        self.pm = jnp.zeros((batch, NSTATES), jnp.float32)
        self.dec_tail = jnp.zeros((traceback, batch, NSTATES), jnp.bool_)
        self.started = False

    def decode(self, soft: jnp.ndarray) -> np.ndarray:
        """soft: (B,T,2) float [0,255]. Returns (B, T) uint8 bits — the T bits
        ending `traceback` steps before the newest symbol (delayed emission);
        the first call's first `traceback` bits are left-padding zeros."""
        D = self.traceback
        self.pm, dec = viterbi_acs(self.pm, soft)
        window = jnp.concatenate([self.dec_tail, dec], axis=0)  # (D+T, B, 64)
        bits = viterbi_traceback(self.pm, window)               # (B, D+T)
        T = soft.shape[1]
        self.dec_tail = window[-D:]
        out = bits[:, :T]
        from satdump_tpu.utils import xfer
        return xfer.get(out).astype(np.uint8)


RE_DELAY = 63  # register-exchange emission delay (>= 9K bits)


@partial(jax.jit, static_argnames=("seg", "ovl", "unroll"))
def viterbi_decode_tiled_re(soft: jnp.ndarray, seg: int = 1024,
                            ovl: int = 128, unroll: int = 4) -> jnp.ndarray:
    """Lane-parallel continuous Viterbi with REGISTER-EXCHANGE survivor
    decoding: the ACS scan carries a 64-bit survivor register per state
    (hi/lo uint32 pair) exchanged along with the path metric, so bits are
    emitted directly from the scan — no decision storage, no traceback
    pass (half the sequential work of the traceback formulation; branch
    metrics in the linear |s-255e| = s + e(255-2s) form).

    At delay 63 (~9 constraint lengths) all survivor registers agree, so
    the emitted bit is read from state 0 unconditionally. Differences from
    the ML traceback decoder appear only beyond the operating region
    (measured: identical at channel BER <= 8%, +7% relative at 13%).

    soft: (T, 2) float32 in [0,255]. Returns (T,) uint8 (T multiple of seg).
    """
    T = soft.shape[0]
    L = T // seg
    idx = (jnp.arange(L)[:, None] * seg
           + jnp.arange(-ovl, seg + ovl)[None, :])
    win = soft[jnp.clip(idx, 0, T - 1)]
    win = jnp.where((idx < 0)[..., None] | (idx >= T)[..., None], 128.0, win)
    pm0 = jnp.zeros((L, NSTATES), jnp.float32)
    lo0 = jnp.zeros((L, NSTATES), jnp.uint32)
    hi0 = jnp.zeros((L, NSTATES), jnp.uint32)

    e0a = jnp.asarray(_E0_T[:32])
    e1a = jnp.asarray(_E1_T[:32])
    e0b = jnp.asarray(_E0_T[32:])
    e1b = jnp.asarray(_E1_T[32:])
    bitconst = jnp.asarray((np.arange(NSTATES) & 1), jnp.uint32)

    def step(carry, soft_t):
        pm, lo, hi = carry
        s0 = soft_t[:, 0][:, None, None]
        s1 = soft_t[:, 1][:, None, None]
        base = s0 + s1
        u0 = 255.0 - 2.0 * s0
        u1 = 255.0 - 2.0 * s1
        bmA = base + e0a[None] * u0 + e1a[None] * u1
        bmB = base + e0b[None] * u0 + e1b[None] * u1
        cand_a = pm[:, :32, None] + bmA
        cand_b = pm[:, 32:, None] + bmB
        dec = cand_b < cand_a
        # no per-step renorm: metrics grow <= 510/step and stay exact in
        # f32 for the bounded seg+2*ovl lane length (same argument as the
        # traceback path's renorm=False)
        new_pm = jnp.minimum(cand_a, cand_b).reshape(L, NSTATES)
        sel_lo = jnp.where(
            dec, jnp.broadcast_to(lo[:, 32:, None], dec.shape),
            jnp.broadcast_to(lo[:, :32, None], dec.shape)).reshape(L, NSTATES)
        sel_hi = jnp.where(
            dec, jnp.broadcast_to(hi[:, 32:, None], dec.shape),
            jnp.broadcast_to(hi[:, :32, None], dec.shape)).reshape(L, NSTATES)
        new_lo = (sel_lo << 1) | bitconst[None, :]
        new_hi = (sel_hi << 1) | (sel_lo >> 31)
        emit = (new_hi[:, 0] >> 31) & 1
        return (new_pm, new_lo, new_hi), emit.astype(jnp.uint8)

    _, emits = jax.lax.scan(step, (pm0, lo0, hi0),
                            jnp.swapaxes(win, 0, 1), unroll=unroll)
    bits = emits[ovl + RE_DELAY: ovl + RE_DELAY + seg].swapaxes(0, 1)
    return bits.reshape(-1).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("seg", "ovl"))
def viterbi_decode_tiled(soft: jnp.ndarray, seg: int = 1024, ovl: int = 128
                         ) -> jnp.ndarray:
    """Lane-parallel continuous Viterbi: decode a long stream by tiling it
    into overlapping segments decoded simultaneously in vector lanes.

    The reference decodes serially with one SIMD trellis kernel
    (cc_decoder.cpp volk_8u_x4_conv_k7_r2_8u); on TPU the win is turning the
    time dimension into lanes: the Viterbi algorithm is self-synchronizing,
    so a decoder started cold converges to the ML path within a few
    constraint lengths. Each lane decodes [l·seg − ovl, (l+1)·seg + ovl) and
    only the owned middle `seg` bits are kept; ovl = 128 ≈ 18·K makes the
    edge-effect error rate negligible. Sequential depth drops from T to
    seg + 2·ovl regardless of stream length.

    soft: (T, 2) float32 in [0,255]. Returns (T,) uint8 bits (T multiple of
    seg; pad the tail with 128-erasures upstream if needed).
    """
    T = soft.shape[0]
    L = T // seg
    # lane windows with halo on both sides (zero-metric cold start)
    idx = (jnp.arange(L)[:, None] * seg
           + jnp.arange(-ovl, seg + ovl)[None, :])            # (L, seg+2ovl)
    win = soft[jnp.clip(idx, 0, T - 1)]                        # (L, S, 2)
    # erase samples outside the stream so they don't bias edge lanes
    win = jnp.where((idx < 0)[..., None] | (idx >= T)[..., None], 128.0, win)
    pm0 = jnp.zeros((L, NSTATES), jnp.float32)
    pm, dec = viterbi_acs(pm0, win, renorm=False)
    bits = viterbi_traceback(pm, dec)                          # (L, S)
    return bits[:, ovl: ovl + seg].reshape(-1).astype(jnp.uint8)


def soft_int8_to_u8(soft: np.ndarray) -> np.ndarray:
    """Signed int8 soft (-127..127, + = bit 1) -> uint8 (0..255, 128 erasure)
    (ref signed_soft_to_unsigned, codings/viterbi/utils.cpp)."""
    return (soft.astype(np.int16) + 128).clip(0, 255).astype(np.uint8)
