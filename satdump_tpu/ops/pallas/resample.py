"""Pallas polyphase-resample kernel: fractional-grid symbol picking.

Replaces the HBM gather in ops/ffsync.ff_resample_at (8 Msymb/s via XLA
gather; tools/gathervariants.py) with a tiled kernel:

  per tile of T symbols:
    DMA  ext[base .. base+L)  HBM -> VMEM          (contiguous, aligned)
    sel  = onehot(local_src)   (T, L)              (VPU compare)
    W    = sel @ E8            (T, 16) via MXU     (E8 = 8 shifts x re/im)
    taps = onehot(branch) @ bank  (T, 8) via MXU
    y    = sum_t W[:, t] * taps[:, t]              (VPU)

The symbol grid is arithmetic (p_k = start + k*omega), so each tile's
sources live in one contiguous, statically-sized window — the dynamic part
is only the tile's base offset (a scalar DMA address). omega is bounded by
sps*(1±2%), which sizes the static window.

Reference semantics mirrored: ops/ffsync.ff_resample_at (group-delay shift,
validity masking happens in the XLA caller).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NTAPS = 8
NFILT = 128
T_TILE = 512


def _l_window(sps_max: float) -> int:
    """Static VMEM window length per tile: worst-case source span + DMA
    alignment slack (base is rounded down to a 128 multiple) + taps."""
    need = int(np.ceil(T_TILE * sps_max)) + 2 * NTAPS + 256
    return ((need + 127) // 128) * 128


def _kernel(start_ref, omega_ref, extr_hbm, exti_hbm, bank_ref,
            outr_ref, outi_ref, bufr, bufi, semr, semi, *, L, n_ext):
    i = pl.program_id(0)
    start = start_ref[0]
    omega = omega_ref[0]
    k0 = (i * T_TILE).astype(jnp.float32)

    base_f = start + k0 * omega
    base = jnp.floor(base_f).astype(jnp.int32) - NTAPS
    base = jnp.clip(base, 0, n_ext - L)
    base = (base // 128) * 128          # aligned DMA start

    cr = pltpu.make_async_copy(extr_hbm.at[pl.ds(base, L)], bufr, semr)
    ci = pltpu.make_async_copy(exti_hbm.at[pl.ds(base, L)], bufi, semi)
    cr.start()
    ci.start()

    # per-symbol source positions (all 2-D iotas per TPU constraint)
    # (Mosaic only supports integer iota)
    k = jax.lax.broadcasted_iota(jnp.int32, (T_TILE, 1), 0).astype(jnp.float32)
    p = start + (k0 + k) * omega + NTAPS / 2
    ip = jnp.floor(p)
    frac = p - ip
    src = ip.astype(jnp.int32)
    branch = jnp.clip(jnp.round(frac * NFILT).astype(jnp.int32), 0, NFILT - 1)
    local = jnp.clip(src - base, 0, L - NTAPS - 1)              # (T,1)

    # taps via one-hot MXU matmul: (T,128) @ (128,8)
    bidx = jax.lax.broadcasted_iota(jnp.int32, (T_TILE, NFILT), 1)
    taps = jnp.dot((bidx == branch).astype(jnp.float32), bank_ref[:],
                   preferred_element_type=jnp.float32)          # (T,8)

    cr.wait()
    ci.wait()

    # E8: 8 shifted copies of the window, real|imag stacked -> (L, 16)
    er = bufr[:]                                                # (L,)
    ei = bufi[:]
    # (roll-by-0 lowers to a zero-size slice Mosaic rejects; special-case it)
    cols = [(jnp.roll(er, -t) if t else er)[:, None] for t in range(NTAPS)] + \
           [(jnp.roll(ei, -t) if t else ei)[:, None] for t in range(NTAPS)]
    E8 = jnp.concatenate(cols, axis=1)                          # (L, 16)

    lidx = jax.lax.broadcasted_iota(jnp.int32, (T_TILE, L), 1)
    sel = (lidx == local).astype(jnp.float32)                   # (T, L)
    W = jnp.dot(sel, E8, preferred_element_type=jnp.float32)    # (T, 16)

    # out blocks are (1, 8, T/8): TPU requires trailing block dims
    # divisible by (8, 128) or equal to the array dims
    outr_ref[0] = jnp.sum(W[:, :NTAPS] * taps, axis=1).reshape(8, T_TILE // 8)
    outi_ref[0] = jnp.sum(W[:, NTAPS:] * taps, axis=1).reshape(8, T_TILE // 8)


@partial(jax.jit, static_argnames=("out_cap", "sps_max", "interpret"))
def resample_arith_grid(ext: jnp.ndarray, start: jnp.ndarray,
                        omega: jnp.ndarray, bank: jnp.ndarray, *,
                        out_cap: int, sps_max: float,
                        interpret: bool = False) -> jnp.ndarray:
    """Polyphase-interpolate complex `ext` at p_k = start + k*omega
    (+NTAPS/2 group-delay shift, as ff_resample_at) for k < out_cap.

    ext: (n_ext,) complex64. bank: (128, 8) f32. Returns (out_cap,)
    complex64 — caller applies the validity mask.
    """
    n_ext = ext.shape[0]
    L = _l_window(sps_max)
    ntiles = pl.cdiv(out_cap, T_TILE)
    # pad ext so every tile's window is in range
    pad = max(ntiles * T_TILE * int(np.ceil(sps_max)) + L + 256 - n_ext, 0)
    extp = jnp.concatenate([ext, jnp.zeros(pad, ext.dtype)]) if pad else ext
    n_ext_p = n_ext + pad

    extr = jnp.real(extp).astype(jnp.float32)
    exti = jnp.imag(extp).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # extr (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),   # exti (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bank
        ],
        out_specs=[
            pl.BlockSpec((1, 8, T_TILE // 8), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, T_TILE // 8), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((L,), jnp.float32),
            pltpu.VMEM((L,), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    outr, outi = pl.pallas_call(
        partial(_kernel, L=L, n_ext=n_ext_p),
        out_shape=[jax.ShapeDtypeStruct((ntiles, 8, T_TILE // 8), jnp.float32),
                   jax.ShapeDtypeStruct((ntiles, 8, T_TILE // 8), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.atleast_1d(start.astype(jnp.float32)),
      jnp.atleast_1d(omega.astype(jnp.float32)),
      extr, exti, bank.astype(jnp.float32))
    y = (outr + 1j * outi).astype(jnp.complex64).reshape(-1)
    return y[:out_cap]
