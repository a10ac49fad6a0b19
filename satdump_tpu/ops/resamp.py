"""Resampling: power-of-2 decimation + rational polyphase resampler.

TPU-native reformulation of the reference SmartResamplerBlock
(common/dsp/resamp/smart_resampler.h:11, rational_resampler.h): instead of a
per-sample polyphase loop, we compute all output positions for a block at
once — integer source index + branch phase arrays — and evaluate every output
as a gather + ntaps-dot, which XLA vectorizes on the VPU. Exact rational
position tracking (numerator carried mod L) guarantees zero drift across
blocks.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from satdump_tpu.ops.firdes import low_pass, polyphase_bank, windowed_sinc
from satdump_tpu.utils import xfer


def design_resampler_taps(interp: int, decim: int, ntaps_per_phase: int = 8) -> np.ndarray:
    """Prototype lowpass for L/M resampling, cutoff at 0.5/max(L,M) of the
    upsampled rate, gain L (standard polyphase design; ref
    rational_resampler.h uses an equivalent windowed design)."""
    count = interp * ntaps_per_phase
    omega = math.pi / max(interp, decim)
    return windowed_sinc(count, omega, norm=float(interp))


class RationalResamplerState(NamedTuple):
    history: jnp.ndarray   # (ntaps-1,) input history
    pos_num: jnp.ndarray   # int32: next output position numerator (units 1/L)


def rational_resampler_init(interp: int, ntaps_per_phase: int = 8,
                            dtype=jnp.complex64) -> RationalResamplerState:
    return RationalResamplerState(
        history=xfer.zeros((ntaps_per_phase - 1,), dtype),
        pos_num=jnp.zeros((), jnp.int32),
    )


def rational_resampler(state: RationalResamplerState, x: jnp.ndarray,
                       bank: jnp.ndarray, interp: int, decim: int,
                       out_cap: int | None = None
                       ) -> Tuple[RationalResamplerState, jnp.ndarray, jnp.ndarray]:
    """Resample a block by interp/decim.

    bank: (interp, ntaps) polyphase bank from `polyphase_bank(proto, interp)`.
    Returns (state', y[out_cap], valid[out_cap]).

    Output m sits at input position (pos_num + m*decim)/interp; the integer
    part indexes the input (with ntaps-1 history prepended), the remainder
    selects the polyphase branch.
    """
    L, ntaps = bank.shape
    assert L == interp
    bank = jnp.asarray(bank)  # in-trace: np consts embed w/o axon D2H fetch
    n = x.shape[-1]
    if out_cap is None:
        out_cap = int(np.ceil(n * interp / decim)) + 1

    ext = jnp.concatenate([state.history, x])  # n + ntaps - 1

    m = jnp.arange(out_cap, dtype=jnp.int32)
    pos = state.pos_num + m * decim            # in units of 1/L input samples
    src = pos // L                             # integer input index
    phase = pos % L                            # polyphase branch
    valid = src < n

    # window rows: ext[src + k] for k in 0..ntaps-1 (src is aligned so that
    # history supplies the causal taps)
    idx = jnp.clip(src[:, None] + jnp.arange(ntaps)[None, :], 0, n + ntaps - 2)
    windows = ext[idx]                         # (out_cap, ntaps)
    taps = bank[phase]                         # (out_cap, ntaps)
    y = jnp.sum(windows * taps, axis=-1)
    y = jnp.where(valid, y, 0)

    n_out = jnp.sum(valid.astype(jnp.int32))
    new_pos = state.pos_num + n_out * decim - n * L
    return (RationalResamplerState(history=ext[n:], pos_num=new_pos.astype(jnp.int32)),
            y.astype(x.dtype), valid)


def make_rational(pair_srate_in: float, srate_out: float) -> Tuple[int, int]:
    """Reduce srate_out/srate_in to an integer interp/decim pair."""
    frac = (srate_out, pair_srate_in)
    # use exact integers when both rates are integral, else a fine grid
    if float(frac[0]).is_integer() and float(frac[1]).is_integer():
        a, b = int(frac[0]), int(frac[1])
    else:
        a, b = int(round(frac[0] * 1000)), int(round(frac[1] * 1000))
    g = math.gcd(a, b)
    return a // g, b // g
