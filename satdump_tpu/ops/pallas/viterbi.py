"""Pallas k=7 r=1/2 Viterbi kernel: lane-parallel register-exchange ACS.

The XLA formulation (convolutional.viterbi_decode_tiled_re) spends 13.5 ms
per 2^21-sample bench block — 47% of the whole baseband->CADU chain
(tools/chainprofile.py, r5). Its per-step tensors are (L, 32, 2)/(L, 64)
with the trellis in the MINOR dims, so every VPU op runs half-empty and
each scan step pays XLA loop overhead.

This kernel flips the layout: STATES live in sublanes (64 rows), decode
LANES live in the 128-wide lane dim — every vector op is a full (64, 128)
vreg burst. Per grid step one 128-lane tile scans all S trellis steps with
path metrics + 64-bit survivor registers (hi/lo uint32) held in VMEM
scratch; soft inputs arrive as (S, 128) blocks through the auto-pipelined
BlockSpec. The butterfly needs no gathers/shuffles beyond a sublane
`jnp.repeat(x, 2, axis=0)`:

    new_pm[s] = min(pm[s>>1] + bm0[s],  pm[(s>>1) + 32] + bm1[s])
    pm[s>>1]      == repeat(pm[:32], 2)      (sublane up-replication)
    pm[(s>>1)+32] == repeat(pm[32:], 2)

Branch metrics are per-row constants e·(255−2·soft) + soft-sum, the linear
form of |soft − 255·e| (same as the XLA RE decoder). Bits emit from state
0's survivor register at delay 63 (RE_DELAY); identical output contract to
viterbi_decode_tiled_re.

Reference behavior: src-core/common/codings/viterbi/cc_decoder.cpp (the
VOLK SIMD trellis) — re-designed for the TPU VPU rather than translated.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from satdump_tpu.ops.fec.convolutional import (NSTATES, RE_DELAY, _E0_T,
                                               _E1_T)

LANES = 128


POLYA = 79   # 0b1001111 (convolutional.POLYA)
POLYB = 109  # 0b1101101


def _row_consts_traced():
    """Per-new-state expected outputs, (64, 1) f32: row s holds the parity
    of (reg & POLY) for the transition register reg = (pred<<1)|b with
    pred = s>>1 [+32], b = s&1 — generated IN-kernel from iota (Pallas
    kernels cannot capture host constants)."""
    s = jax.lax.broadcasted_iota(jnp.int32, (NSTATES, 1), 0)
    m = s >> 1
    b = s & 1

    def par(x):
        x = x ^ (x >> 4)
        x = x ^ (x >> 2)
        x = x ^ (x >> 1)
        return (x & 1).astype(jnp.float32)

    reg0 = (m << 1) | b
    reg1 = ((m + 32) << 1) | b
    return (par(reg0 & POLYA), par(reg0 & POLYB),
            par(reg1 & POLYA), par(reg1 & POLYB),
            (s & 1).astype(jnp.uint32))


def _kernel(w0_ref, w1_ref, out_ref, pm_ref, lo_ref, hi_ref, *,
            steps, emit_from, emit_n, unroll):
    pm_ref[:] = jnp.zeros((NSTATES, LANES), jnp.float32)
    lo_ref[:] = jnp.zeros((NSTATES, LANES), jnp.uint32)
    hi_ref[:] = jnp.zeros((NSTATES, LANES), jnp.uint32)

    e0p0, e1p0, e0p1, e1p1, bitc = _row_consts_traced()

    def body(t, _):
        s0 = w0_ref[pl.ds(t, 1), :]              # (1, LANES)
        s1 = w1_ref[pl.ds(t, 1), :]
        base = s0 + s1
        u0 = 255.0 - 2.0 * s0
        u1 = 255.0 - 2.0 * s1
        # branch metrics, (64, LANES): per-row constant × per-lane vector
        bm0 = base + e0p0 * u0 + e1p0 * u1       # pred = s>>1
        bm1 = base + e0p1 * u0 + e1p1 * u1       # pred = (s>>1) + 32
        pm = pm_ref[:]
        pm_a = jnp.repeat(pm[:32], 2, axis=0)    # pm[s>>1]
        pm_b = jnp.repeat(pm[32:], 2, axis=0)    # pm[(s>>1)+32]
        cand_a = pm_a + bm0
        cand_b = pm_b + bm1
        dec = cand_b < cand_a                    # (64, LANES)
        pm_ref[:] = jnp.minimum(cand_a, cand_b)
        lo = lo_ref[:]
        hi = hi_ref[:]
        sel_lo = jnp.where(dec, jnp.repeat(lo[32:], 2, axis=0),
                           jnp.repeat(lo[:32], 2, axis=0))
        sel_hi = jnp.where(dec, jnp.repeat(hi[32:], 2, axis=0),
                           jnp.repeat(hi[:32], 2, axis=0))
        new_lo = (sel_lo << 1) | bitc
        new_hi = (sel_hi << 1) | (sel_lo >> 31)
        lo_ref[:] = new_lo
        hi_ref[:] = new_hi

        # emit the bit at delay RE_DELAY from state 0's survivor register
        @pl.when((t >= emit_from) & (t < emit_from + emit_n))
        def _():
            out_ref[pl.ds(t - emit_from, 1), :] = (
                (new_hi[0:1, :] >> 31) & 1).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, steps, body, 0, unroll=unroll)


def _lane_windows(soft_col: jnp.ndarray, L: int, seg: int, ovl: int
                  ) -> jnp.ndarray:
    """(T,) f32 -> (seg + 2*ovl, Lp) windows w[t, l] = s[l*seg + t - ovl]
    (128-erasure fill outside the stream), built from ONE transposed
    reshape + three static slices — no gather. Lp = L padded to LANES."""
    Lp = -(-L // LANES) * LANES
    pad_lanes = Lp - L
    B = jnp.concatenate([
        jnp.full((seg,), 128.0, jnp.float32), soft_col,
        jnp.full(((1 + pad_lanes) * seg,), 128.0, jnp.float32)])
    A = B.reshape(Lp + 2, seg).T                  # A[t, c] = B[c*seg + t]
    return jnp.concatenate([
        A[seg - ovl:, 0:Lp],                      # u in [-ovl, 0)
        A[:, 1:Lp + 1],                           # u in [0, seg)
        A[:ovl, 2:Lp + 2],                        # u in [seg, seg+ovl)
    ], axis=0)                                    # (seg + 2*ovl, Lp)


@partial(jax.jit, static_argnames=("seg", "ovl", "interpret", "unroll"))
def viterbi_re_pallas(soft: jnp.ndarray, seg: int = 1024, ovl: int = 128,
                      interpret: bool = False, unroll: int = 1
                      ) -> jnp.ndarray:
    """Drop-in replacement for viterbi_decode_tiled_re: soft (T, 2) float32
    in [0, 255] (T a multiple of seg) -> (T,) uint8 decoded bits."""
    T = soft.shape[0]
    L = T // seg
    S = seg + 2 * ovl
    Lp = -(-L // LANES) * LANES
    w0 = _lane_windows(soft[:, 0], L, seg, ovl)   # (S, Lp)
    w1 = _lane_windows(soft[:, 1], L, seg, ovl)

    out = pl.pallas_call(
        partial(_kernel, steps=S, emit_from=ovl + RE_DELAY, emit_n=seg,
                unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((seg, Lp), jnp.int32),
        grid=(Lp // LANES,),
        in_specs=[
            pl.BlockSpec((S, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((seg, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NSTATES, LANES), jnp.float32),
            pltpu.VMEM((NSTATES, LANES), jnp.uint32),
            pltpu.VMEM((NSTATES, LANES), jnp.uint32),
        ],
        interpret=interpret,
    )(w0, w1)
    # out[t, l] = bit t of lane l -> stream order (l, t)
    return out.T[:L].reshape(-1).astype(jnp.uint8)
