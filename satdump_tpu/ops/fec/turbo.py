"""CCSDS turbo codes (131.0-B): rates 1/2, 1/3, 1/4, 1/6 at bases
223/446/892/1115 bytes (info blocks 1784/3568/7136/8920 bits).

Reference behavior: src-core/common/codings/turbo/ccsds_turbo.{h,cpp} + the
vendored deepspace-turbo C library (libs/deepspace-turbo/). This is a
from-scratch implementation of the same code family:

* two 16-state recursive systematic constituent encoders (feedback 0b0011
  register form), the CCSDS algorithmic permutation (ccsds_turbo.cpp:22-31),
  per-encoder trellis termination (memory feedback-driven tail), the
  upper/lower mux and the rate-1/2 alternating parity puncture
  (ccsds_turbo.h puncturing());
* decoding is iterative max-log-MAP (BCJR) — where the reference runs a
  per-sample double-precision C loop per frame, here both constituent
  decoders are batched over frames (lanes) with `lax.scan` over trellis
  steps, all 16 states vectorized.

Soft convention: positive LLR/soft value = bit 1 (the repo's int8 softs).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MEMORY = 4
NSTATES = 16
_BACKWARD = [0, 0, 1, 1]

_FWD = {
    "sys": [1, 0, 0, 1, 1],
    "p1": [1, 1, 0, 1, 1],
    "p2": [1, 0, 1, 0, 1],
    "p3": [1, 1, 1, 1, 1],
}

# (upper component list, lower component list) per nominal rate
_RATES: Dict[str, Tuple[List[str], List[str]]] = {
    "1/2": (["sys", "p1"], ["p1"]),
    "1/3": (["sys", "p1"], ["p1"]),
    "1/4": (["sys", "p2", "p3"], ["p1"]),
    "1/6": (["sys", "p1", "p2", "p3"], ["p1", "p3"]),
}

BASES = (223, 446, 892, 1115)


def ccsds_permutation(base: int) -> np.ndarray:
    """The CCSDS 131.0-B algorithmic interleaver (ccsds_turbo.cpp:16-31)."""
    p = [31, 37, 43, 47, 53, 59, 61, 67]
    k1, k2 = 8, base
    n = base * 8
    pi = np.zeros(n, np.int64)
    for s in range(1, n + 1):
        m = (s - 1) % 2
        i = (s - 1) // (2 * k2)
        j = (s - 1) // 2 - i * k2
        t = (19 * i + 1) % (k1 // 2)
        q = t % 8 + 1
        c = (p[q - 1] * j + 21 * m) % k2
        pi[s - 1] = 2 * (t + c * (k1 // 2) + 1) - m - 1
    return pi


def _feedback(state: int) -> int:
    # feedback = sum backward[i] * bit(state, memory-1-i)
    return (sum(_BACKWARD[i] * ((state >> (MEMORY - 1 - i)) & 1)
                for i in range(MEMORY))) % 2


def _state_update(state: int, inp: int) -> int:
    first = (_feedback(state) + inp) % 2
    return (state >> 1) | (first << (MEMORY - 1))


def _outputs(state: int, inp: int, comps: List[str]) -> List[int]:
    ns = _state_update(state, inp)
    first = (ns >> (MEMORY - 1)) & 1
    outs = []
    for name in comps:
        fwd = _FWD[name]
        o = fwd[0] * first
        for i in range(MEMORY):
            o = (o + fwd[i + 1] * ((state >> (MEMORY - 1 - i)) & 1)) % 2
        outs.append(o)
    return outs


@lru_cache(maxsize=None)
def _trellis(comps: Tuple[str, ...]):
    """next_state (16,2), out_bits (16,2,C), termination input (16,)."""
    ns = np.zeros((NSTATES, 2), np.int32)
    out = np.zeros((NSTATES, 2, len(comps)), np.int8)
    term = np.zeros(NSTATES, np.int32)
    for s in range(NSTATES):
        for b in range(2):
            ns[s, b] = _state_update(s, b)
            out[s, b] = _outputs(s, b, list(comps))
        term[s] = _feedback(s)  # input that zeroes the first register
    return ns, out, term


class CCSDSTurbo:
    """One (base, rate) CCSDS turbo code: encode (NumPy fixture) + batched
    iterative max-log-MAP decode (JAX)."""

    def __init__(self, base: int = 223, rate: str = "1/2"):
        if base not in BASES:
            raise ValueError(f"base must be one of {BASES}")
        if rate not in _RATES:
            raise ValueError(f"rate must be one of {sorted(_RATES)}")
        self.base, self.rate = base, rate
        self.info_length = base * 8
        self.pi = ccsds_permutation(base)
        up, lo = _RATES[rate]
        self.cu, self.cl = len(up), len(lo)
        self._up, self._lo = tuple(up), tuple(lo)
        steps = self.info_length + MEMORY
        self.mux_length = steps * (self.cu + self.cl)
        if rate == "1/2":
            k = np.arange(self.mux_length)
            bit_idx = k % 3
            blk = k // 3
            self._punct_keep = (bit_idx == 0) | \
                np.where(blk % 2 == 1, bit_idx != 1, bit_idx != 2)
            self.encoded_length = int(self._punct_keep.sum())
        else:
            self._punct_keep = np.ones(self.mux_length, bool)
            self.encoded_length = self.mux_length

    # -- encode (host fixture) ------------------------------------------------
    def _conv_encode(self, bits: np.ndarray, comps: Tuple[str, ...]
                     ) -> np.ndarray:
        """bits (B, K) -> (B, (K+4)*C) with feedback-driven termination."""
        ns_t, out_t, term_t = _trellis(comps)
        B, K = bits.shape
        state = np.zeros(B, np.int32)
        C = len(comps)
        out = np.zeros((B, K + MEMORY, C), np.int8)
        for i in range(K):
            b = bits[:, i].astype(np.int32)
            out[:, i] = out_t[state, b]
            state = ns_t[state, b]
        for i in range(K, K + MEMORY):
            b = term_t[state]
            out[:, i] = out_t[state, b]
            state = ns_t[state, b]
        assert (state == 0).all()
        return out

    def encode(self, frames: np.ndarray) -> np.ndarray:
        """frames (B, base) bytes -> (B, ceil(encoded_length/8)) bytes."""
        frames = np.atleast_2d(np.asarray(frames, np.uint8))
        bits = np.unpackbits(frames, axis=-1)
        return np.packbits(self.encode_bits(bits), axis=-1)

    def encode_bits(self, bits: np.ndarray) -> np.ndarray:
        """bits (B, info_length) -> (B, encoded_length) channel bits."""
        bits = np.atleast_2d(np.asarray(bits, np.uint8))
        inter = bits[:, self.pi]
        up = self._conv_encode(bits, self._up)        # (B, S, cu)
        lo = self._conv_encode(inter, self._lo)       # (B, S, cl)
        mux = np.concatenate([up, lo], axis=-1)       # (B, S, cu+cl)
        mux = mux.reshape(bits.shape[0], -1)
        return mux[:, self._punct_keep]

    # -- decode ---------------------------------------------------------------
    def depuncture(self, soft: np.ndarray) -> np.ndarray:
        """(B, encoded_length) soft -> (B, mux_length) with 0-LLR erasures."""
        soft = np.atleast_2d(np.asarray(soft, np.float32))
        out = np.zeros((soft.shape[0], self.mux_length), np.float32)
        out[:, self._punct_keep] = soft
        return out

    def decode(self, soft: np.ndarray, iterations: int = 10
               ) -> Tuple[np.ndarray, np.ndarray]:
        """soft (B, encoded_length) float LLRs (positive = bit 1) ->
        (bits (B, info_length) uint8, llr (B, info_length))."""
        full = self.depuncture(soft)
        B = full.shape[0]
        S = self.info_length + MEMORY
        mux = full.reshape(B, S, self.cu + self.cl)
        Lu = jnp.asarray(mux[:, :, : self.cu])        # (B, S, cu)
        Ll = jnp.asarray(mux[:, :, self.cu:])         # (B, S, cl)
        bits, llr = _turbo_decode(
            Lu, Ll, jnp.asarray(self.pi), self._up, self._lo,
            self.info_length, iterations)
        return np.asarray(bits, np.uint8), np.asarray(llr)


def _bcjr_tables(comps: Tuple[str, ...]):
    ns_t, out_t, _ = _trellis(comps)
    # signed outputs: +1 for bit 1, -1 for bit 0
    sgn = (2.0 * out_t.astype(np.float32) - 1.0)      # (16, 2, C)
    inp_sgn = np.stack([np.full(NSTATES, -1.0, np.float32),
                        np.full(NSTATES, 1.0, np.float32)], axis=1)
    return ns_t, sgn, inp_sgn


@partial(jax.jit, static_argnames=("comps", "has_sys"))
def _bcjr_maxlog(Lch: jnp.ndarray, La: jnp.ndarray, comps: Tuple[str, ...],
                 has_sys: bool) -> jnp.ndarray:
    """Batched max-log BCJR for one terminated RSC constituent.

    Lch: (B, S, C) channel LLRs per output component (positive = bit 1);
    La: (B, K) a-priori LLR of the input bits (S = K + MEMORY tail steps,
    tail a-priori = 0). Returns the APP LLR (B, K) of the input bits.
    """
    ns_t, sgn, _ = _bcjr_tables(comps)
    B, S, C = Lch.shape
    K = S - MEMORY
    ns = jnp.asarray(ns_t)                            # (16, 2)
    sg = jnp.asarray(sgn)                             # (16, 2, C)
    La_full = jnp.concatenate(
        [La, jnp.zeros((B, MEMORY), La.dtype)], axis=1)

    # branch metrics gamma (B, S, 16, 2)
    g = 0.5 * jnp.einsum("bsc,xyc->bsxy", Lch, sg)
    g = g + 0.5 * La_full[:, :, None, None] * jnp.asarray(
        [[-1.0, 1.0]], jnp.float32)[None, None]

    neg = jnp.float32(-1e9)
    # one-hot successor maps for gather-free alpha/beta updates
    oh_next = jnp.asarray(
        (ns_t[None, :, :] == np.arange(NSTATES)[:, None, None])
        .astype(np.float32))                          # (16next, 16, 2)

    def fwd(alpha, g_t):
        # alpha (B,16); g_t (B,16,2)
        m = alpha[:, :, None] + g_t                   # (B,16,2)
        # alpha'[s'] = max over (s,b) with ns[s,b]==s'
        cand = jnp.where(oh_next[None] > 0, m[:, None, :, :], neg)
        a2 = jnp.max(cand.reshape(B, NSTATES, -1), axis=-1)
        a2 = a2 - jnp.max(a2, axis=-1, keepdims=True)
        return a2, alpha

    a0 = jnp.full((B, NSTATES), neg).at[:, 0].set(0.0)
    _, alphas = jax.lax.scan(fwd, a0, jnp.swapaxes(g, 0, 1))
    alphas = jnp.swapaxes(alphas, 0, 1)               # (B, S, 16)

    def bwd(beta, g_t):
        # beta (B,16) over next states; beta'[s] = max_b g[s,b]+beta[ns[s,b]]
        bn = beta[:, ns]                              # (B,16,2)
        m = g_t + bn
        b2 = jnp.max(m, axis=-1)
        b2 = b2 - jnp.max(b2, axis=-1, keepdims=True)
        return b2, bn

    bT = jnp.full((B, NSTATES), neg).at[:, 0].set(0.0)
    _, betans = jax.lax.scan(bwd, bT, jnp.swapaxes(g, 0, 1)[::-1])
    betans = jnp.swapaxes(betans, 0, 1)[:, ::-1]      # (B, S, 16, 2)

    metric = alphas[:, :, :, None] + g + betans       # (B, S, 16, 2)
    app = (jnp.max(metric[:, :, :, 1], axis=-1)
           - jnp.max(metric[:, :, :, 0], axis=-1))    # (B, S)
    return app[:, :K]


@partial(jax.jit, static_argnames=("up", "lo", "K", "iterations"))
def _turbo_decode(Lu, Ll, pi, up, lo, K: int, iterations: int):
    B = Lu.shape[0]
    # upper systematic channel LLR (component 0 of the upper code)
    Lsys = Lu[:, :K, 0]
    inv = jnp.zeros_like(pi).at[pi].set(jnp.arange(pi.shape[0]))

    # lower decoder's "channel" includes no systematic output; its input
    # information comes entirely through the a-priori port
    La1 = jnp.zeros((B, K), jnp.float32)

    def body(La1, _):
        app1 = _bcjr_maxlog(Lu, La1, up, True)
        ext1 = app1 - La1 - Lsys
        La2 = (ext1 + Lsys)[:, pi]
        app2 = _bcjr_maxlog(Ll, La2, lo, False)
        ext2 = app2 - La2
        La1n = ext2[:, inv]
        return La1n, app2

    La1, app2 = jax.lax.scan(body, La1, None, length=iterations)
    llr = La1 + Lsys + (app2[-1] - (La1 + Lsys)[:, pi])[:, inv] * 0.0
    # final APP: rerun decoder 1 once with the final a-priori
    app = _bcjr_maxlog(Lu, La1, up, True)
    bits = (app > 0).astype(jnp.uint8)
    return bits, app
