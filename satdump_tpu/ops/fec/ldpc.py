"""LDPC: normalized min-sum decoder (batched) + GF(2) tools.

Reference: src-core/common/codings/ldpc/ (generic min-sum decoder with a
SIMD-plugin registry, alist/sparse tools, CCSDS matrix construction). Here
one decoder covers all codes: messages live on the E edges of H and every
update is vectorized over (batch, edges) with lanes = frames, matching the
reference's many-frames-at-once SIMD layout.

Decoder math (normalized min-sum, the same algorithm as the reference's
plugins/simd_extensions/*/ldpc_decoder):
  v->c:  q_e = Lv[var_e] + sum_{e' at var_e} r_e' - r_e
  c->v:  r_e = alpha * prod_sign(q at check, excl e) * min|q| (excl e)
Per-check exclusive min/sign uses a padded dense (C, dc_max) layout so the
inner step is reshape/reduce, not scatter. The edge<->dense permutations
are fixed per code, applied once per iteration via constant-index takes.

GF(2) encoding comes from a systematic generator derived from H by
Gaussian elimination (host NumPy, once per code).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class LDPCCode(NamedTuple):
    """Preprocessed parity-check structure (host constants)."""
    n: int
    m: int                       # number of checks
    dc_max: int
    dv_max: int
    # dense check layout: (m, dc_max) var index per check slot, -1 = pad
    chk_vars: np.ndarray
    # for each edge in check-major order: its variable
    edge_var: np.ndarray         # (E,)
    edge_slot: np.ndarray        # (E,) position of the edge in chk_vars
    edge_chk: np.ndarray         # (E,)
    H: np.ndarray                # (m, n) uint8 dense


def code_from_dense(H: np.ndarray) -> LDPCCode:
    H = np.asarray(H, np.uint8)
    m, n = H.shape
    chk_lists = [np.nonzero(H[c])[0] for c in range(m)]
    dc_max = max(len(l) for l in chk_lists)
    dv_max = int(H.sum(0).max())
    chk_vars = np.full((m, dc_max), -1, np.int32)
    edge_var, edge_slot, edge_chk = [], [], []
    for c, l in enumerate(chk_lists):
        for s, v in enumerate(l):
            chk_vars[c, s] = v
            edge_var.append(v)
            edge_slot.append(s)
            edge_chk.append(c)
    return LDPCCode(n=n, m=m, dc_max=dc_max, dv_max=dv_max,
                    chk_vars=chk_vars,
                    edge_var=np.asarray(edge_var, np.int32),
                    edge_slot=np.asarray(edge_slot, np.int32),
                    edge_chk=np.asarray(edge_chk, np.int32), H=H)


def make_regular_code(n: int, dv: int, dc: int, seed: int = 0) -> LDPCCode:
    """Random regular Gallager construction (test/bench fixture)."""
    assert n * dv % dc == 0
    m = n * dv // dc
    rng = np.random.default_rng(seed)
    H = np.zeros((m, n), np.uint8)
    for layer in range(dv):
        perm = rng.permutation(n)
        for i, v in enumerate(perm):
            H[(layer * n + i) // dc % m, v] ^= 1
    return code_from_dense(H)


@partial(jax.jit, static_argnames=("iters", "alpha"))
def _minsum_iters(llr, chk_vars, valid, iters: int, alpha: float):
    """llr (B, n) -> hard bits (B, n) uint8, parity-ok mask (B,)."""
    B, n = llr.shape
    m, dc = chk_vars.shape
    cv_safe = jnp.maximum(chk_vars, 0)

    def get_q(total, r):
        # q at dense check layout: (B, m, dc)
        tot_at = total[:, cv_safe]                    # (B, m, dc)
        return jnp.where(valid[None], tot_at - r, 0.0)

    def iteration(carry, _):
        total, r = carry
        q = get_q(total, r)
        aq = jnp.where(valid[None], jnp.abs(q), jnp.inf)
        sgn = jnp.where(valid[None], jnp.where(q < 0, -1.0, 1.0), 1.0)
        # exclusive min: min1/min2 trick
        m1 = jnp.min(aq, axis=-1, keepdims=True)
        # second min: mask out one argmin occurrence
        is_min = (aq == m1) & (jnp.cumsum((aq == m1), axis=-1) == 1)
        m2 = jnp.min(jnp.where(is_min, jnp.inf, aq), axis=-1, keepdims=True)
        excl_min = jnp.where(is_min, m2, m1)          # (B, m, dc)
        tot_sign = jnp.prod(sgn, axis=-1, keepdims=True)
        excl_sign = tot_sign * sgn                     # sign product excl e
        r_new = jnp.where(valid[None], alpha * excl_sign * excl_min, 0.0)
        # variable totals: llr + sum of r at each var (scatter-add over the
        # dense layout; fixed pattern per code)
        flat_v = cv_safe.reshape(-1)
        r_flat = r_new.reshape(B, -1)
        w = valid.reshape(-1)[None].astype(r_flat.dtype)
        total_new = llr + jax.vmap(
            lambda rf: jnp.zeros(n, llr.dtype).at[flat_v].add(rf))(r_flat * w)
        return (total_new, r_new), None

    total0 = llr
    r0 = jnp.zeros((B, m, dc), llr.dtype)
    (total, r), _ = jax.lax.scan(iteration, (total0, r0), None, length=iters)
    bits = (total < 0).astype(jnp.uint8)
    # parity check: xor of bits over each check
    bits_at = bits[:, cv_safe] * valid[None].astype(jnp.uint8)
    parity = jnp.sum(bits_at, axis=-1) % 2             # (B, m)
    ok = jnp.all(parity == 0, axis=-1)
    return bits, ok


class MinSumDecoder:
    """Batched normalized min-sum LDPC decoder (lanes = frames)."""

    def __init__(self, code: LDPCCode, iters: int = 25, alpha: float = 0.75):
        self.code = code
        self.iters = iters
        self.alpha = alpha
        self._chk_vars = jnp.asarray(code.chk_vars)
        self._valid = jnp.asarray(code.chk_vars >= 0)

    _warned_fallback = False

    def decode(self, llr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """llr (B, n) float (positive = bit 0, like the reference's soft
        convention after sign flip). Returns (bits (B, n) uint8, ok (B,))."""
        from satdump_tpu.utils import xfer
        llr_d = jnp.asarray(np.asarray(llr, np.float32))
        try:
            bits, ok = _minsum_iters(llr_d, self._chk_vars, self._valid,
                                     self.iters, self.alpha)
            return (xfer.get(bits).astype(np.uint8),
                    xfer.get(ok).astype(bool))
        except Exception as e:  # pragma: no cover - device-specific
            # the axon remote compiler is known to crash on this graph
            # (tools/tpu_smoke.py: remote_compile SIGSEGV); degrade to the
            # NumPy formulation rather than taking the pipeline down
            if not MinSumDecoder._warned_fallback:
                from satdump_tpu.core.log import logger
                logger.warning(f"LDPC device decode failed ({e}); "
                               "falling back to NumPy min-sum")
                MinSumDecoder._warned_fallback = True
            return self._decode_numpy(np.asarray(llr, np.float32))

    def _decode_numpy(self, llr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized NumPy normalized min-sum — same edge layout and
        update as _minsum_iters (the device path's golden model)."""
        chk_vars = np.asarray(self.code.chk_vars)
        valid = chk_vars >= 0
        cv = np.maximum(chk_vars, 0)
        B, n = llr.shape
        m, dc = chk_vars.shape
        total = llr.copy()
        r = np.zeros((B, m, dc), np.float32)
        for _ in range(self.iters):
            q = np.where(valid[None], total[:, cv] - r, 0.0)
            aq = np.where(valid[None], np.abs(q), np.inf)
            sgn = np.where(valid[None], np.where(q < 0, -1.0, 1.0), 1.0)
            m1 = np.min(aq, axis=-1, keepdims=True)
            is_min = (aq == m1) & (np.cumsum(aq == m1, axis=-1) == 1)
            m2 = np.min(np.where(is_min, np.inf, aq), axis=-1,
                        keepdims=True)
            excl_min = np.where(is_min, m2, m1)
            tot_sign = np.prod(sgn, axis=-1, keepdims=True)
            r = np.where(valid[None],
                         self.alpha * tot_sign * sgn * excl_min, 0.0
                         ).astype(np.float32)
            acc = np.zeros((B, n), np.float32)
            np.add.at(acc.reshape(B, n), (slice(None), cv.reshape(-1)),
                      (r * valid[None]).reshape(B, -1))
            total = llr + acc
        bits = (total < 0).astype(np.uint8)
        parity = (bits[:, cv] * valid[None]).sum(axis=-1) % 2
        return bits, np.all(parity == 0, axis=-1)


# ---------------------------------------------------------------------------
# GF(2) helpers: systematic generator from H (host, once per code)
# ---------------------------------------------------------------------------
def gf2_row_reduce(H: np.ndarray) -> Tuple[np.ndarray, list]:
    """Row-reduce H over GF(2). Returns (reduced H, pivot column list)."""
    H = H.copy().astype(np.uint8)
    m, n = H.shape
    pivots = []
    r = 0
    for c in range(n):
        if r >= m:
            break
        rows = np.nonzero(H[r:, c])[0]
        if rows.size == 0:
            continue
        pr = r + rows[0]
        if pr != r:
            H[[r, pr]] = H[[pr, r]]
        mask = H[:, c].copy()
        mask[r] = 0
        H[mask == 1] ^= H[r]
        pivots.append(c)
        r += 1
    return H, pivots


class SystematicEncoder:
    """Encode k-bit messages into n-bit codewords of the code defined by H.
    Message bits occupy the non-pivot columns; parity = solved pivots."""

    def __init__(self, code: LDPCCode):
        Hr, pivots = gf2_row_reduce(code.H)
        self.n = code.n
        self.pivots = np.asarray(pivots)
        self.free = np.asarray([c for c in range(code.n) if c not in set(pivots)])
        self.k = len(self.free)
        # parity[p] = sum over free columns of Hr[row(p), free] * msg
        rows = {c: r for r, c in enumerate(pivots)}
        self.P = np.stack([Hr[rows[c]][self.free] for c in pivots]) \
            if len(pivots) else np.zeros((0, self.k), np.uint8)

    def encode(self, msg: np.ndarray) -> np.ndarray:
        """msg (..., k) bits -> codeword (..., n) bits."""
        msg = np.asarray(msg, np.uint8)
        cw = np.zeros(msg.shape[:-1] + (self.n,), np.uint8)
        cw[..., self.free] = msg
        parity = (msg @ self.P.T) % 2
        cw[..., self.pivots] = parity
        return cw
