"""Costas carrier-recovery loop, orders 2/4/8 (ref common/dsp/pll/costas_loop.cpp).

Two implementations:

* `costas_scan` — faithful per-sample feedback loop as a `lax.scan`. Exact
  match to the reference's update equations (costas_loop.cpp:24-67): use for
  golden parity and low-rate pipelines.
* feedforward carrier sync lives in ops/ffsync.py — the TPU fast path
  (FFT-of-x^M coarse estimate + Viterbi&Viterbi per sub-block phase), which
  has no per-sample sequential dependence at all.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class CostasState(NamedTuple):
    phase: jnp.ndarray  # float32 scalar
    freq: jnp.ndarray   # float32 scalar (rad/sample)


def costas_init() -> CostasState:
    return CostasState(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))


def costas_gains(loop_bw: float) -> Tuple[float, float]:
    """alpha/beta from loop bandwidth (ref costas_loop.cpp:8-12)."""
    damping = math.sqrt(2.0) / 2.0
    denom = 1.0 + 2.0 * damping * loop_bw + loop_bw * loop_bw
    alpha = (4 * damping * loop_bw) / denom
    beta = (4 * loop_bw * loop_bw) / denom
    return alpha, beta


def _error(order: int, v: jnp.ndarray) -> jnp.ndarray:
    re, im = jnp.real(v), jnp.imag(v)
    if order == 2:
        return re * im
    if order == 4:
        return jnp.sign(re) * im - jnp.sign(im) * re
    if order == 8:
        K = math.sqrt(2.0) - 1.0
        return jnp.where(
            jnp.abs(re) >= jnp.abs(im),
            jnp.sign(re) * im - jnp.sign(im) * re * K,
            jnp.sign(re) * im * K - jnp.sign(im) * re,
        )
    raise ValueError(f"unsupported Costas order {order}")


def costas_scan(state: CostasState, x: jnp.ndarray, loop_bw: float, order: int,
                freq_limit: float = 1.0) -> Tuple[CostasState, jnp.ndarray]:
    """Per-sample Costas loop (faithful). x: (N,) complex64 -> y: (N,) complex64."""
    alpha, beta = costas_gains(loop_bw)

    def body(carry, xi):
        phase, freq = carry
        mixed = xi * jnp.exp(-1j * phase).astype(xi.dtype)
        err = jnp.clip(_error(order, mixed), -1.0, 1.0)
        freq = freq + beta * err
        phase = phase + freq + alpha * err
        phase = jnp.mod(phase + 2 * jnp.pi, 4 * jnp.pi) - 2 * jnp.pi
        freq = jnp.clip(freq, -freq_limit, freq_limit)
        return (phase, freq), mixed

    (phase, freq), y = jax.lax.scan(body, (state.phase, state.freq), x)
    return CostasState(phase, freq), y


class PLLState(NamedTuple):
    phase: jnp.ndarray
    freq: jnp.ndarray


def pll_init() -> PLLState:
    return PLLState(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))


def pll_carrier_scan(state: PLLState, x: jnp.ndarray, loop_bw: float,
                     max_offset: float = 3.14) -> Tuple[PLLState, jnp.ndarray]:
    """Carrier-tracking PLL (ref common/dsp/pll/pll_carrier_tracking.cpp):
    locks to a residual carrier via arg(x * e^{-j phase}) error, outputs the
    carrier-wiped signal."""
    alpha, beta = costas_gains(loop_bw)

    def body(carry, xi):
        phase, freq = carry
        mixed = xi * jnp.exp(-1j * phase).astype(xi.dtype)
        err = jnp.angle(mixed)
        freq = jnp.clip(freq + beta * err, -max_offset, max_offset)
        phase = phase + freq + alpha * err
        phase = jnp.mod(phase + 2 * jnp.pi, 4 * jnp.pi) - 2 * jnp.pi
        return (phase, freq), mixed

    (phase, freq), y = jax.lax.scan(body, (state.phase, state.freq), x)
    return PLLState(phase, freq), y
