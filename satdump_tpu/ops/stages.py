"""Stateless-per-block DSP stages: pure ``(state, x) -> (state, y)`` JAX fns.

Each stage mirrors a reference dsp:: block (file:line cited per function) but
is reformulated for batched block processing: recurrences that are *linear*
(DC blocker, NCO phase) use closed forms or associative scans so the whole
block computes in parallel on the VPU; only genuinely nonlinear feedback is
left to `lax.scan` (see costas.py / clock_recovery.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from satdump_tpu.utils import xfer


# ---------------------------------------------------------------------------
# Frequency shift (complex NCO)  — ref common/dsp/utils/freq_shift.cpp
# ---------------------------------------------------------------------------
class FreqShiftState(NamedTuple):
    phase: jnp.ndarray  # scalar float32, radians


def freq_shift_init() -> FreqShiftState:
    return FreqShiftState(jnp.zeros((), jnp.float32))


def freq_shift(state: FreqShiftState, x: jnp.ndarray, phase_delta: float
               ) -> Tuple[FreqShiftState, jnp.ndarray]:
    """Mix with exp(j*(phase0 + n*delta)). delta in rad/sample (static)."""
    n = jnp.arange(x.shape[-1], dtype=jnp.float32)
    ph = state.phase + n * phase_delta
    y = x * jnp.exp(1j * ph).astype(x.dtype)
    new_phase = jnp.mod(state.phase + x.shape[-1] * phase_delta, 2 * jnp.pi)
    return FreqShiftState(new_phase.astype(jnp.float32)), y


# ---------------------------------------------------------------------------
# DC blocker — ref common/dsp/utils/correct_iq.cpp (single-pole moving avg)
# ---------------------------------------------------------------------------
class DCBlockState(NamedTuple):
    acc: jnp.ndarray  # complex64 (or float32) accumulator


def dc_block_init(dtype=jnp.complex64) -> DCBlockState:
    return DCBlockState(xfer.zeros((), dtype))


def dc_block(state: DCBlockState, x: jnp.ndarray, alpha: float = 0.0001
             ) -> Tuple[DCBlockState, jnp.ndarray]:
    """y[n] = x[n] - acc[n],  acc[n] = (1-alpha)*acc[n-1] + alpha*x[n].

    The accumulator is a first-order *linear* recurrence, so we evaluate it
    with an associative scan (log-depth, fully parallel) instead of the
    reference's per-sample loop.
    """
    beta = 1.0 - alpha
    a = jnp.full(x.shape, beta, dtype=jnp.float32)
    b = (alpha * x).astype(x.dtype)
    # fold initial condition into the first element
    b = b.at[..., 0].add(beta * state.acc)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar.astype(x.dtype) * bl + br

    _, acc = jax.lax.associative_scan(combine, (a, b), axis=-1)
    y = x - acc
    return DCBlockState(acc[..., -1]), y


# ---------------------------------------------------------------------------
# AGC — ref common/dsp/utils/agc.cpp
# ---------------------------------------------------------------------------
class AGCState(NamedTuple):
    gain: jnp.ndarray  # scalar float32


def agc_init(gain: float = 1.0) -> AGCState:
    return AGCState(jnp.asarray(gain, jnp.float32))


def agc_scan(state: AGCState, x: jnp.ndarray, rate: float = 1e-2,
             reference: float = 1.0, max_gain: float = 65536.0
             ) -> Tuple[AGCState, jnp.ndarray]:
    """Faithful per-sample AGC (ref agc.cpp:17-44): nonlinear recurrence,
    evaluated with lax.scan. Use agc_block() on the fast path."""

    def body(gain, xi):
        out = xi * gain.astype(xi.dtype)
        gain = gain + rate * (reference - jnp.abs(out))
        gain = jnp.minimum(gain, max_gain) if max_gain > 0 else gain
        return gain, out

    gain, y = jax.lax.scan(body, state.gain, x)
    return AGCState(gain), y


def agc_block(state: AGCState, x: jnp.ndarray, rate: float = 1e-2,
              reference: float = 1.0, max_gain: float = 65536.0,
              sub: int = 4096) -> Tuple[AGCState, jnp.ndarray]:
    """Feedforward AGC: normalize per sub-block by smoothed mean magnitude.

    TPU-native replacement for the per-sample loop: the loop's fixed point is
    gain = reference / mean|x|, so we compute mean|x| per sub-block, smooth it
    with the block-level equivalent of `rate`, and apply one gain per
    sub-block. Converges to the same operating point for stationary signals.
    """
    n = x.shape[-1]
    nsub = n // sub
    xs = x[: nsub * sub].reshape(nsub, sub)
    mag = jnp.mean(jnp.abs(xs), axis=-1)  # (nsub,)

    # EMA over sub-blocks of the *target* gain, seeded with carried gain.
    target = reference / jnp.maximum(mag, 1e-12)
    target = jnp.minimum(target, max_gain) if max_gain > 0 else target
    alpha = jnp.float32(min(1.0, rate * sub))  # per-sub-block smoothing

    def body(g, t):
        g = (1 - alpha) * g + alpha * t
        return g, g

    gain_last, gains = jax.lax.scan(body, state.gain, target)
    y = (xs * gains[:, None].astype(xs.dtype)).reshape(-1)
    if nsub * sub < n:
        tail = x[nsub * sub:] * gain_last.astype(x.dtype)
        y = jnp.concatenate([y, tail])
    return AGCState(gain_last), y


# ---------------------------------------------------------------------------
# Quadrature (FM) demod — ref common/dsp/demod/quadrature_demod.cpp
# ---------------------------------------------------------------------------
class QuadDemodState(NamedTuple):
    last: jnp.ndarray  # complex64, previous sample


def quadrature_demod_init() -> QuadDemodState:
    return QuadDemodState(xfer.ones((), jnp.complex64))


def quadrature_demod(state: QuadDemodState, x: jnp.ndarray, gain: float
                     ) -> Tuple[QuadDemodState, jnp.ndarray]:
    """y[n] = gain * arg(x[n] * conj(x[n-1])) — phase-difference discriminator.

    Equivalent to the reference's wrapped atan2 phase-difference loop
    (quadrature_demod.cpp:37-50) but parallel: the wrap-to-(-pi,pi] is exactly
    arg of the conjugate product. `gain` here is the *multiplier* (the
    reference stores 1/gain and multiplies, we take the final multiplier).
    """
    prev = jnp.concatenate([state.last[None], x[:-1]])
    y = gain * jnp.angle(x * jnp.conj(prev))
    return QuadDemodState(x[-1]), y.astype(jnp.float32)


# ---------------------------------------------------------------------------
# OQPSK delay-one-imag — ref common/dsp/demod/delay_one_imag.h
# ---------------------------------------------------------------------------
class DelayImagState(NamedTuple):
    last_imag: jnp.ndarray  # float32


def delay_one_imag_init() -> DelayImagState:
    return DelayImagState(jnp.zeros((), jnp.float32))


def delay_one_imag(state: DelayImagState, x: jnp.ndarray
                   ) -> Tuple[DelayImagState, jnp.ndarray]:
    im_prev = jnp.concatenate([state.last_imag[None], jnp.imag(x)[:-1]])
    y = (jnp.real(x) + 1j * im_prev).astype(x.dtype)
    return DelayImagState(jnp.imag(x)[-1]), y


# ---------------------------------------------------------------------------
# M2M4 SNR estimator — ref common/dsp/utils/snr_estimator.cpp
# ---------------------------------------------------------------------------
def snr_m2m4(x: jnp.ndarray) -> jnp.ndarray:
    """Block moment-based SNR estimate in dB (non-data-aided, M2M4)."""
    p = jnp.abs(x) ** 2
    m2 = jnp.mean(p)
    m4 = jnp.mean(p ** 2)
    es = jnp.sqrt(jnp.maximum(2 * m2 * m2 - m4, 0.0))
    noise = jnp.maximum(m2 - es, 1e-20)
    return 10.0 * jnp.log10(jnp.maximum(es / noise, 1e-20))


# ---------------------------------------------------------------------------
# Soft symbol quantization — ref module_psk_demod.cpp:203-213 + clamp
# ---------------------------------------------------------------------------
def to_soft_int8(sym: jnp.ndarray, scale: float) -> jnp.ndarray:
    """float -> int8 soft bits with the reference's clamp semantics
    (module_demod_base.h clamp(): <-128 -> -127, >127 -> 127, else trunc)."""
    v = sym * scale
    v = jnp.clip(v, -127.0, 127.0)
    return v.astype(jnp.int8)


def qpsk_soft_interleave(sym: jnp.ndarray, scale: float = 100.0) -> jnp.ndarray:
    """Complex symbols -> interleaved int8 [re,im,re,im,...] (x100 clamp)."""
    out = jnp.stack([jnp.real(sym), jnp.imag(sym)], axis=-1).reshape(-1)
    return to_soft_int8(out, scale)


def bpsk_soft(sym: jnp.ndarray, scale: float = 50.0) -> jnp.ndarray:
    """BPSK uses only the real branch, x50 (module_psk_demod.cpp:198-202)."""
    return to_soft_int8(jnp.real(sym), scale)


class FFTPanState(NamedTuple):
    avg: jnp.ndarray   # (nbins,) running average magnitude (linear)


def fft_pan_init(nbins: int = 512) -> FFTPanState:
    return FFTPanState(avg=xfer.zeros((nbins,), jnp.float32))


def fft_pan(state: FFTPanState, x: jnp.ndarray, rate: float = 0.1
            ) -> Tuple[FFTPanState, jnp.ndarray]:
    """Streaming averaged spectrum for displays/status (ref
    common/dsp/fft/fft_pan.{h,cpp}): segment the block into nbins-point
    FFTs, average the shifted magnitudes, and fold them into an
    exponential running average. Returns (state', spectrum_dB (nbins,))."""
    nbins = state.avg.shape[0]
    nseg = x.shape[-1] // nbins
    segs = x[: nseg * nbins].reshape(nseg, nbins)
    mag = jnp.abs(jnp.fft.fftshift(jnp.fft.fft(segs, axis=-1), axes=-1))
    m = jnp.mean(mag, axis=0) / nbins
    avg = state.avg * (1.0 - rate) + m * rate
    db = 20.0 * jnp.log10(jnp.maximum(avg, 1e-12))
    return FFTPanState(avg=avg), db


def doppler_correct(state: FreqShiftState, x: jnp.ndarray,
                    doppler_hz: jnp.ndarray, samplerate: float
                    ) -> Tuple[FreqShiftState, jnp.ndarray]:
    """Doppler pre-correction stage (ref common/dsp/utils/doppler_correct.h):
    mix the block by the negated predicted Doppler profile. doppler_hz may
    be a scalar (constant over the block) or a per-sample array from the
    tracker (tracking/tracker.py doppler_shift); the NCO phase carries
    across blocks for continuity."""
    d = jnp.asarray(doppler_hz, jnp.float32)
    if d.ndim == 0:
        d = jnp.full((x.shape[-1],), d)
    phase_inc = -2.0 * jnp.pi * d / samplerate
    phase = state.phase + jnp.cumsum(phase_inc)
    y = x * jnp.exp(1j * phase).astype(x.dtype)
    new_phase = jnp.mod(phase[-1], 2 * jnp.pi)
    return FreqShiftState(phase=new_phase), y
