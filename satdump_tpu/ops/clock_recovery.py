"""Mueller & Müller symbol-timing recovery (ref common/dsp/clock_recovery/clock_recovery_mm.cpp).

Faithful block-sequential formulation: the reference consumes a variable
number of input samples per output symbol (data-dependent `inc += floor(mu)`),
which we express as a `lax.scan` over a *fixed capacity* of output slots with
a valid mask — the standard TPU pattern for data-dependent output counts
(SURVEY.md §7 "hard parts"). Interpolation uses the same 128-branch nuttall
windowed-sinc polyphase bank (firdes.mm_interpolator_bank).

The feedforward (Oerder&Meyr) fast path lives in ops/ffsync.py.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from satdump_tpu.ops.firdes import mm_interpolator_bank
from satdump_tpu.utils import xfer


class MMState(NamedTuple):
    mu: jnp.ndarray        # float32, fractional interpolation phase [0,1)
    omega: jnp.ndarray     # float32, samples/symbol estimate
    inc: jnp.ndarray       # int32, input offset carried into the next block
    history: jnp.ndarray   # (ntaps,) last input samples
    p_regs: jnp.ndarray    # (3,) complex64: p_0T, p_1T, p_2T
    c_regs: jnp.ndarray    # (3,) complex64: c_0T, c_1T, c_2T
    last_sample: jnp.ndarray  # float32 (real-mode M&M)


def mm_init(omega: float, mu: float = 0.5, ntaps: int = 8,
            dtype=jnp.complex64) -> MMState:
    return MMState(
        mu=jnp.asarray(mu, jnp.float32),
        omega=jnp.asarray(omega, jnp.float32),
        inc=jnp.zeros((), jnp.int32),
        history=xfer.zeros((ntaps - 1,), dtype),
        p_regs=xfer.zeros((3,), jnp.complex64),
        c_regs=xfer.zeros((3,), jnp.complex64),
        last_sample=jnp.zeros((), jnp.float32),
    )


def mm_params_from_loop(omega: float, clock_alpha: float = 8.7e-3,
                        omega_relative_limit: float = 0.005):
    """Gain derivation as in module_psk_demod.cpp:43-47."""
    gain_mu = clock_alpha
    gain_omega = clock_alpha * clock_alpha / 4.0
    return dict(omega=omega, gain_omega=gain_omega, gain_mu=gain_mu,
                omega_relative_limit=omega_relative_limit)


def mm_clock_recovery(state: MMState, x: jnp.ndarray, *,
                      omega_mid: float, gain_omega: float, gain_mu: float,
                      omega_relative_limit: float,
                      bank: jnp.ndarray | None = None,
                      out_cap: int | None = None,
                      complex_mode: bool = True
                      ) -> Tuple[MMState, jnp.ndarray, jnp.ndarray]:
    """One block of M&M clock recovery.

    Returns (state', symbols[out_cap], valid[out_cap] bool). Symbols past the
    valid count are zeros. out_cap defaults to ceil(n / (omega_mid*(1-limit)))+2.
    """
    if bank is None:
        bank = mm_interpolator_bank()  # host np: device-resident closure consts break axon lowering
    nfilt, ntaps = bank.shape
    n = x.shape[-1]
    if out_cap is None:
        out_cap = int(np.ceil(n / (omega_mid * (1.0 - omega_relative_limit)))) + 2

    # [history(ntaps-1) | input(n)] — matches ref buffer layout
    # (clock_recovery_mm.cpp:47: input copied to &buffer[ntaps-1])
    ext = jnp.concatenate([state.history[: ntaps - 1], x])
    omega_limit = omega_relative_limit * omega_mid

    def body(carry, _):
        mu, omega, inc, p_regs, c_regs, last_sample = carry
        valid = inc < n

        imu = jnp.clip(jnp.round(mu * nfilt).astype(jnp.int32), 0, nfilt - 1)
        taps = jax.lax.dynamic_slice(bank, (imu, 0), (1, ntaps))[0]
        # ref indexes buffer[inc .. inc+ntaps-1] where buffer holds ntaps-1
        # history samples in front (clock_recovery_mm.cpp:47,75)
        window = jax.lax.dynamic_slice(ext, (jnp.clip(inc, 0, n - 1),), (ntaps,))
        sample = jnp.sum(window * taps)

        if complex_mode:
            # Register delay line (clock_recovery_mm.cpp:56-61,101-106): after
            # propagation p_1T = old p_0T, p_2T = old p_1T (same for c_*), so
            # phase_error = Re[(p0-p_2T)conj(c_1T) - (c0-c_2T)conj(p_1T)]
            #             = Re[(p0-p_regs[1])conj(c_regs[0]) - (c0-c_regs[1])conj(p_regs[0])]
            p_0T = sample
            c_0T = (jnp.where(jnp.real(p_0T) > 0, 1.0, 0.0)
                    + 1j * jnp.where(jnp.imag(p_0T) > 0, 1.0, 0.0)).astype(jnp.complex64)
            phase_error = jnp.real((p_0T - p_regs[1]) * jnp.conj(c_regs[0])
                                   - (c_0T - c_regs[1]) * jnp.conj(p_regs[0]))
            new_p_regs = jnp.stack([p_0T, p_regs[0], p_regs[1]])
            new_c_regs = jnp.stack([c_0T, c_regs[0], c_regs[1]])
            out = p_0T
            new_last = last_sample
        else:
            s = jnp.real(sample)
            phase_error = jnp.sign(last_sample) * s - jnp.sign(s) * last_sample
            new_last = s
            new_p_regs, new_c_regs = p_regs, c_regs
            out = sample

        phase_error = jnp.clip(phase_error, -1.0, 1.0)
        omega_new = omega + gain_omega * phase_error
        omega_new = omega_mid + jnp.clip(omega_new - omega_mid, -omega_limit, omega_limit)
        mu_new = mu + omega_new + gain_mu * phase_error
        inc_new = inc + jnp.floor(mu_new).astype(jnp.int32)
        mu_new = mu_new - jnp.floor(mu_new)
        inc_new = jnp.maximum(inc_new, 0)

        # only commit updates on valid steps
        mu = jnp.where(valid, mu_new, mu)
        omega = jnp.where(valid, omega_new, omega)
        inc = jnp.where(valid, inc_new, inc)
        p_regs = jnp.where(valid, new_p_regs, p_regs)
        c_regs = jnp.where(valid, new_c_regs, c_regs)
        last_sample = jnp.where(valid, new_last, last_sample)
        return (mu, omega, inc, p_regs, c_regs, last_sample), (out, valid)

    carry0 = (state.mu, state.omega, state.inc, state.p_regs, state.c_regs,
              state.last_sample)
    (mu, omega, inc, p_regs, c_regs, last_sample), (syms, valid) = jax.lax.scan(
        body, carry0, None, length=out_cap)

    syms = jnp.where(valid, syms, 0)
    new_state = MMState(
        mu=mu, omega=omega,
        inc=jnp.maximum(inc - n, 0),
        history=ext[n:],
        p_regs=p_regs, c_regs=c_regs, last_sample=last_sample,
    )
    return new_state, syms, valid


class GardnerState(NamedTuple):
    mu: jnp.ndarray
    omega: jnp.ndarray
    inc: jnp.ndarray
    history: jnp.ndarray
    last_sample: jnp.ndarray   # complex64


def gardner_init(omega: float, mu: float = 0.5, ntaps: int = 8,
                 dtype=jnp.complex64) -> GardnerState:
    return GardnerState(
        mu=jnp.asarray(mu, jnp.float32),
        omega=jnp.asarray(omega, jnp.float32),
        inc=jnp.zeros((), jnp.int32),
        history=xfer.zeros((ntaps - 1,), dtype),
        last_sample=jnp.zeros((), jnp.complex64),
    )


def gardner_clock_recovery(state: GardnerState, x: jnp.ndarray, *,
                           omega_mid: float, gain_omega: float,
                           gain_mu: float, omega_relative_limit: float,
                           bank: jnp.ndarray | None = None,
                           out_cap: int | None = None
                           ) -> Tuple[GardnerState, jnp.ndarray, jnp.ndarray]:
    """Gardner timing-error-detector clock recovery, block-sequential scan
    (ref common/dsp/clock_recovery/clock_recovery_gardner.cpp:33-100):
    per output symbol interpolate the on-time sample and the zero-crossing
    (mid-symbol) sample half a symbol earlier; the TED is
    Re{zc} * (Re{last} - Re{cur}) + Im-part analogue."""
    if bank is None:
        bank = mm_interpolator_bank()  # host np const
    nfilt, ntaps = bank.shape
    n = x.shape[-1]
    if out_cap is None:
        out_cap = int(np.ceil(
            n / (omega_mid * (1.0 - omega_relative_limit)))) + 2
    ext = jnp.concatenate([state.history[: ntaps - 1], x])
    omega_limit = omega_relative_limit * omega_mid

    def body(carry, _):
        mu, omega, inc, last_sample = carry
        valid = inc < n

        # zero-crossing point half a symbol back (gardner.cpp:50-58)
        muz = mu - omega / 2.0
        offzc = jnp.floor(omega / 2.0).astype(jnp.int32)
        mupos = jnp.mod(muz + offzc.astype(jnp.float32), 1.0)
        neg = mupos < 0
        mupos = jnp.where(neg, mupos + 1.0, mupos)
        offzc = jnp.where(neg, offzc + 1, offzc)
        imuz = jnp.clip(jnp.round(mupos * nfilt).astype(jnp.int32),
                        0, nfilt - 1)
        imu = jnp.clip(jnp.round(mu * nfilt).astype(jnp.int32), 0, nfilt - 1)

        taps_zc = jax.lax.dynamic_slice(bank, (imuz, 0), (1, ntaps))[0]
        taps_on = jax.lax.dynamic_slice(bank, (imu, 0), (1, ntaps))[0]
        win_zc = jax.lax.dynamic_slice(
            ext, (jnp.clip(inc - offzc, 0, n - 1),), (ntaps,))
        win_on = jax.lax.dynamic_slice(
            ext, (jnp.clip(inc, 0, n - 1),), (ntaps,))
        zc = jnp.sum(win_zc * taps_zc)
        sample = jnp.sum(win_on * taps_on)

        phase_error = (jnp.real(zc) * (jnp.real(last_sample) - jnp.real(sample))
                       + jnp.imag(zc) * (jnp.imag(last_sample) - jnp.imag(sample)))
        phase_error = jnp.clip(phase_error, -1.0, 1.0)

        omega_new = omega + gain_omega * phase_error
        omega_new = omega_mid + jnp.clip(omega_new - omega_mid,
                                         -omega_limit, omega_limit)
        mu_new = mu + omega_new + gain_mu * phase_error
        inc_new = jnp.maximum(inc + jnp.floor(mu_new).astype(jnp.int32), 0)
        mu_new = mu_new - jnp.floor(mu_new)

        mu = jnp.where(valid, mu_new, mu)
        omega = jnp.where(valid, omega_new, omega)
        inc = jnp.where(valid, inc_new, inc)
        last_sample = jnp.where(valid, sample, last_sample)
        return (mu, omega, inc, last_sample), (sample, valid)

    carry0 = (state.mu, state.omega, state.inc, state.last_sample)
    (mu, omega, inc, last_sample), (syms, valid) = jax.lax.scan(
        body, carry0, None, length=out_cap)
    syms = jnp.where(valid, syms, 0)
    return GardnerState(mu=mu, omega=omega, inc=jnp.maximum(inc - n, 0),
                        history=ext[n:], last_sample=last_sample), syms, valid
