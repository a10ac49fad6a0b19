"""Pallas polyphase-resample kernel: fractional-grid symbol picking.

Replaces the HBM gather in ops/ffsync.ff_resample_at (8 Msymb/s via XLA
gather; tools/gathervariants.py) with a tiled kernel:

  per tile of T symbols:
    DMA  ext[base .. base+L)  HBM -> VMEM          (contiguous, tile-aligned)
    taps = onehot(branch) @ bank   (T, 8)  via MXU
    A    = banded weights: A[k, l] = taps[k, l - local_k]  (8 VPU passes)
    y    = A @ [real | imag]       (T, 2)  via MXU

Measured on v5e (tools/ffprofile2.py): 114 Msymb/s vs 8 Msymb/s for the
XLA gather formulation.

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
    alignment slack (base is rounded down to a 1024-element 1-D tile) + taps."""
    # slack: 1024 for the tile-aligned base rounding + taps margin
    need = int(np.ceil(T_TILE * sps_max)) + 2 * NTAPS + 1024 + 64
    # 1-D VMEM slices must align to the (8x128)=1024-element tile
    return ((need + 1023) // 1024) * 1024


def _kernel(start_ref, omega_ref, extr_hbm, exti_hbm, bank_ref,
            outr_ref, outi_ref, bufr, bufi, semr, semi, *, L, n_ext):
    i = pl.program_id(0)
    start = start_ref[0]
    omega = omega_ref[0]
    k0 = (i * T_TILE).astype(jnp.float32)

    base_f = start + k0 * omega
    base = jnp.floor(base_f).astype(jnp.int32) - NTAPS
    base = jnp.clip(base, 0, n_ext - L)
    base = (base // 1024) * 1024        # aligned to the 1-D VMEM tile

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

    # Banded weight matrix A[k, l] = taps[k, l - local_k] (0 elsewhere),
    # built by 8 VPU compare-accumulates — Mosaic rejects shifted 1-D
    # slices/rolls ("input offsets outside of the first tile"), so the tap
    # window folds into the selection instead of shifting the signal.
    delta = jax.lax.broadcasted_iota(jnp.int32, (T_TILE, L), 1) - local
    A = jnp.zeros((T_TILE, L), jnp.float32)
    for t in range(NTAPS):
        A = A + jnp.where(delta == t, taps[:, t][:, None], 0.0)

    # one MXU matmul against the [real | imag] window
    EI = jnp.concatenate([bufr[:][:, None], bufi[:][:, None]], axis=1)  # (L,2)
    Y = jnp.dot(A, EI, preferred_element_type=jnp.float32)              # (T,2)

    # out blocks are (1, 8, T/8): TPU requires trailing block dims
    # divisible by (8, 128) or equal to the array dims
    outr_ref[0] = Y[:, 0].reshape(8, T_TILE // 8)
    outi_ref[0] = Y[:, 1].reshape(8, T_TILE // 8)


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
