"""FIR filtering as overlap-save FFT convolution — the TPU-native form.

Replaces the reference's VOLK dot-product FIR (common/dsp/filter/fir.h:16) and
overlap-save FFT filter (common/dsp/filter/fft_filter.h). Causal semantics
match the reference FIRBlock: y[n] = sum_k taps[k] * x[n-k], with (ntaps-1)
samples of history carried between blocks.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
from satdump_tpu.utils import xfer
import numpy as np


class FIRState(NamedTuple):
    history: jnp.ndarray  # last (ntaps-1) input samples


def fir_init(ntaps: int, dtype=jnp.complex64) -> FIRState:
    return FIRState(xfer.zeros((ntaps - 1,), dtype))


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def fir_apply(state: FIRState, x: jnp.ndarray, taps: jnp.ndarray,
              fft_size: int | None = None) -> Tuple[FIRState, jnp.ndarray]:
    """Causal FIR of one block via overlap-save.

    x: (N,) complex64 or float32. taps: (ntaps,) float32 (host constant).
    Returns y with y[n] = sum_k taps[k]*xext[n-k] where xext prepends history.
    """
    ntaps = taps.shape[0]
    n = x.shape[-1]
    ext = jnp.concatenate([state.history, x])          # N + ntaps - 1
    total = n + ntaps - 1
    nfft = fft_size or max(256, _next_pow2(total))
    is_complex = jnp.iscomplexobj(x)

    if is_complex:
        X = jnp.fft.fft(ext, nfft)
        H = jnp.fft.fft(taps.astype(jnp.float32), nfft)
        y = jnp.fft.ifft(X * H)[ntaps - 1: ntaps - 1 + n].astype(x.dtype)
    else:
        X = jnp.fft.rfft(ext, nfft)
        H = jnp.fft.rfft(taps.astype(jnp.float32), nfft)
        y = jnp.fft.irfft(X * H, nfft)[ntaps - 1: ntaps - 1 + n].astype(x.dtype)
    return FIRState(ext[n:]), y


def fir_direct(state: FIRState, x: jnp.ndarray, taps: jnp.ndarray
               ) -> Tuple[FIRState, jnp.ndarray]:
    """Direct-form causal FIR (small ntaps): correlation over shifted slices."""
    ntaps = taps.shape[0]
    n = x.shape[-1]
    ext = jnp.concatenate([state.history, x])
    # y[n] = sum_k taps[k] * ext[n + ntaps-1 - k]
    y = jnp.zeros((n,), dtype=x.dtype)
    for k in range(ntaps):
        y = y + taps[k] * jax_slice(ext, ntaps - 1 - k, n)
    return FIRState(ext[n:]), y


def jax_slice(a: jnp.ndarray, start: int, size: int) -> jnp.ndarray:
    return a[start: start + size]


def decimating_fir_apply(state: FIRState, x: jnp.ndarray, taps: jnp.ndarray,
                         decim: int) -> Tuple[FIRState, jnp.ndarray]:
    """FIR + keep every decim-th output (ref filter/decimating_fir.h).
    Block length must be a multiple of decim to keep the phase aligned."""
    state, y = fir_apply(state, x, taps)
    return state, y[::decim]


def design_fft_size(block_size: int, ntaps: int) -> int:
    return _next_pow2(block_size + ntaps - 1)


def np_fir_reference(x: np.ndarray, taps: np.ndarray) -> np.ndarray:
    """NumPy golden model: causal FIR with zero initial history."""
    full = np.convolve(x, taps)
    return full[: len(x)]
