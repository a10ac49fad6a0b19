#!/usr/bin/env python
"""Benchmark: feedforward QPSK baseband->bits throughput on one chip.

Measures the flagship compute path (the chain behind the MetOp AHRPT /
METEOR LRPT configs): AGC + RRC matched filter (overlap-save FFT) + FFT CFO
estimate + V&V phase + O&M timing + polyphase symbol pick + soft quantize +
lane-parallel Viterbi k=7 r=1/2.

Prints ONE JSON line. `vs_baseline` is measured throughput / 6 Msamp/s — the
reference's implied real-time requirement (MetOp AHRPT live decode at 6 Msps,
resources/pipelines/MetOp.json; SatDump publishes no faster number, see
BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from satdump_tpu.ops import ffsync
    from satdump_tpu.ops.fec import convolutional as cc
    from satdump_tpu.ops.firdes import mm_interpolator_bank, root_raised_cosine

    n = 1 << 22
    sps = 2.0
    rrc = jnp.asarray(root_raised_cosine(1.0, sps, 1.0, 0.5, 31))
    bank = jnp.asarray(mm_interpolator_bank())
    cap = int(np.ceil(n / (sps * 0.99))) + 2
    nbits = (cap // 1024) * 1024

    def forward(state, x):
        state, syms, valid, snr = ffsync.ff_psk_demod_block(
            state, x, order=4, sps=sps, rrc_taps=rrc, bank=bank, out_cap=cap)
        soft = jnp.stack([jnp.real(syms), jnp.imag(syms)], axis=-1)
        soft = jnp.clip(soft * 100.0, -127, 127)
        u8 = (soft + 128.0).reshape(-1, 2)[: nbits]
        bits = cc.viterbi_decode_tiled(u8, seg=1024, ovl=128)
        return state, bits

    step = jax.jit(forward)
    rng = np.random.default_rng(7)
    x = jnp.asarray(((rng.standard_normal(n) + 1j * rng.standard_normal(n))
                     * 0.5).astype(np.complex64))
    state = ffsync.ff_clock_init()

    # warmup / compile
    state, bits = step(state, x)
    jax.block_until_ready(bits)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, bits = step(state, x)
    jax.block_until_ready(bits)
    dt = time.perf_counter() - t0

    msps = n * iters / dt / 1e6
    print(json.dumps({
        "metric": "qpsk_baseband_to_bits_throughput_1chip",
        "value": round(msps, 2),
        "unit": "Msamp/s",
        "vs_baseline": round(msps / 6.0, 2),
    }))


if __name__ == "__main__":
    main()
