#!/usr/bin/env python
"""Benchmark: feedforward QPSK baseband->bits throughput on one chip.

Measures the flagship compute path (the chain behind the MetOp AHRPT /
METEOR LRPT configs): AGC + RRC matched filter (overlap-save FFT) + FFT CFO
estimate + V&V phase + O&M timing + polyphase symbol pick + soft quantize +
lane-parallel Viterbi k=7 r=1/2.

Methodology (shaped by the axon tunnel's quirks — see utils/xfer.py):
the whole measurement is ON-DEVICE: a single jitted `lax.scan` over K
*distinct* pre-staged IQ blocks (distinct inputs defeat any execution
caching; one program per K defeats per-call memoization), synchronized by
FETCHING the f32 scalar result (the tunnel's block_until_ready does not
wait — only a d2h fetch joins the stream). Throughput is computed from the
run-time difference between a K2-block and a K1-block program, cancelling
fixed dispatch/launch/fetch overhead.

Prints ONE JSON line. `vs_baseline` is measured throughput / 6 Msamp/s — the
reference's implied real-time requirement (MetOp AHRPT live decode at 6 Msps,
resources/pipelines/MetOp.json; SatDump publishes no faster number, see
BASELINE.md).
"""

import json
import time

import numpy as np


def _build(n, sps, K):
    import jax
    import jax.numpy as jnp

    from satdump_tpu.ops import ffsync
    from satdump_tpu.ops.fec import convolutional as cc
    from satdump_tpu.ops.firdes import mm_interpolator_bank, root_raised_cosine

    rrc = root_raised_cosine(1.0, sps, 1.0, 0.5, 31)  # host np const
    bank = mm_interpolator_bank()
    cap = int(np.ceil(n / (sps * 0.99))) + 2
    nbits = (cap // 1024) * 1024

    def block_step(state, x):
        state, syms, valid, snr = ffsync.ff_psk_demod_block(
            state, x, order=4, sps=sps, rrc_taps=rrc, bank=bank, out_cap=cap)
        soft = jnp.stack([jnp.real(syms), jnp.imag(syms)], axis=-1)
        soft = jnp.clip(soft * 100.0, -127, 127)
        u8 = (soft + 128.0).reshape(-1, 2)[: nbits]
        bits = cc.viterbi_decode_tiled_re(u8, seg=1024, ovl=128)
        return state, jnp.sum(bits.astype(jnp.float32))

    def run(xs):  # xs: (K, n) complex64
        st = ffsync.ff_clock_init(rrc_ntaps=31)
        st, sums = jax.lax.scan(block_step, st, xs)
        # Real data dependency on every block's Viterbi output: a *0.0 here
        # would let XLA dead-code-eliminate the entire demod+FEC chain.
        return st.nco_phase + jnp.sum(sums)

    return jax.jit(run)


def main():
    import jax

    from satdump_tpu.utils import xfer

    n = 1 << 21
    sps = 2.0
    K1, K2 = 2, 10
    rng = np.random.default_rng(7)
    xs = ((rng.standard_normal((K2, n)) + 1j * rng.standard_normal((K2, n)))
          * 0.5).astype(np.complex64)
    d1 = xfer.put(xs[:K1])
    d2 = xfer.put(xs)

    run1 = _build(n, sps, K1)
    run2 = _build(n, sps, K2)

    # The axon tunnel's block_until_ready does NOT synchronize (dispatch is
    # fire-and-forget; only a d2h fetch joins the stream — tools/axon_probe.py
    # matmul_time: BUR 0.1ms vs fetch 170ms for 27 TFLOP). Time by fetching
    # the f32 scalar result; the K2-K1 delta cancels dispatch+fetch overhead.
    def fetch(f, a):
        return float(np.asarray(f(a)))

    # compile + warm
    fetch(run1, d1)
    fetch(run2, d2)

    def best3(f, a):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fetch(f, a)
            ts.append(time.perf_counter() - t0)
        return float(min(ts))

    t1 = best3(run1, d1)
    t2 = best3(run2, d2)

    dt = max(t2 - t1, 1e-9)
    msps = n * (K2 - K1) / dt / 1e6

    # Roofline/MFU (SURVEY §5: first-class): algorithmic flops per input
    # sample of the direct-form chain (what the math requires, not what the
    # FFT formulation spends) — MF 31-tap cplx*real FIR (124), modulation
    # strip+FFT CFO (~123), V&V (~30), O&M timing (~20), polyphase pick
    # (8 taps, 32/sym -> 16), quantize (4), Viterbi 64-state ACS+RE
    # (~14*64/bit -> 448). DSP chains are VPU/elementwise-bound, so MFU
    # against the bf16 MXU peak is inherently small — reported for the
    # roofline trend, not as a target.
    flops_per_sample = 124 + 123 + 30 + 20 + 16 + 4 + 448
    gflops = msps * 1e6 * flops_per_sample / 1e9
    peak_bf16_gflops = 197e3  # v5e MXU peak
    print(json.dumps({
        "metric": "qpsk_baseband_to_bits_throughput_1chip",
        "value": round(msps, 2),
        "unit": "Msamp/s",
        "vs_baseline": round(msps / 6.0, 2),
        "algorithmic_gflops": round(gflops, 1),
        "mfu": round(gflops / peak_bf16_gflops, 5),
    }))


if __name__ == "__main__":
    main()
