#!/usr/bin/env python
"""Benchmark: feedforward QPSK baseband->CADU throughput on one chip.

Measures the FULL flagship pipeline (the chain behind the MetOp AHRPT /
METEOR LRPT configs), every stage device-resident in one jitted program:
AGC + RRC matched filter (overlap-save FFT) + FFT CFO estimate + V&V phase
+ O&M timing + polyphase symbol pick + soft quantize + lane-parallel
Viterbi k=7 r=1/2 + ASM deframing (all-offsets correlation) + CCSDS
derandomize + batched device RS(255,223) x4 + CADU byte packing — i.e.
baseband in, packed CADU words out (BASELINE.md: "Msamp/s/chip
baseband->CADU (QPSK)"; previous rounds measured baseband->bits only).

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


def _build(n, sps):
    """-> (demod_jit, chain, init_state): two chained device programs.
    Fusing demod+FEC into one jitted scan is semantically identical but the
    axon REMOTE compiler takes >9 min on the combined graph; two programs
    compile in ~1 min total and the soft hand-off stays device-resident."""
    import jax
    import jax.numpy as jnp

    from satdump_tpu.ops import ffsync
    from satdump_tpu.ops.fec.cadu_chain import SEG, CaduChain
    from satdump_tpu.ops.firdes import mm_interpolator_bank, root_raised_cosine

    rrc = root_raised_cosine(1.0, sps, 1.0, 0.5, 31)  # host np const
    bank = mm_interpolator_bank()
    cap = int(np.ceil(n / (sps * 0.99))) + 2
    # power-of-two chunk: the axon remote compiler takes 166 s on the
    # 1033*SEG variant vs 37 s at 1<<20; the ~2.4% of symbols past the
    # chunk are excluded from the reported sample count (main())
    chunk_pairs = min(1 << 20, cap // SEG * SEG)

    chain = CaduChain(cadu_bits=8192, chunk_pairs=chunk_pairs, rs_i=4)

    def demod_block(ff_st, x, prev_dep):
        ff_st, syms, valid, snr = ffsync.ff_psk_demod_block(
            ff_st, x + (prev_dep * 0).astype(x.dtype),  # serialize blocks
            order=4, sps=sps, rrc_taps=rrc, bank=bank, out_cap=cap)
        soft = jnp.stack([jnp.real(syms), jnp.imag(syms)], axis=-1)
        soft = jnp.clip(soft * 100.0, -127, 127)
        pairs = soft[: chunk_pairs]                     # (pairs, 2) f32
        n_pairs = jnp.minimum(jnp.sum(valid.astype(jnp.int32)),
                              chunk_pairs).astype(jnp.int32)
        return ff_st, pairs, n_pairs

    demod_jit = jax.jit(demod_block)

    def init_state():
        return (ffsync.ff_clock_init(rrc_ntaps=31),
                jnp.zeros((chain.carry_bits,), jnp.int32),
                jnp.zeros((128, 2), jnp.float32),
                jnp.zeros((), jnp.int32))

    return demod_jit, chain, init_state


def main():
    from satdump_tpu.utils import xfer

    n = 1 << 21
    sps = 2.0
    K1, K2 = 2, 10
    rng = np.random.default_rng(7)
    xs = ((rng.standard_normal((K2, n)) + 1j * rng.standard_normal((K2, n)))
          * 0.5).astype(np.complex64)
    import jax.numpy as jnp

    dxs = [xfer.put(x) for x in xs]

    demod_jit, chain, init_state = _build(n, sps)
    rot = xfer.put(np.asarray([1.0, 0.0], np.float32))
    swap = xfer.put(np.float32(0.0))

    # The axon tunnel's block_until_ready does NOT synchronize (dispatch is
    # fire-and-forget; only a d2h fetch joins the stream — tools/axon_probe.py
    # matmul_time: BUR 0.1ms vs fetch 170ms for 27 TFLOP). Per-block state
    # carries serialize the dispatch chain; the trailing fetch of a scalar
    # from the LAST block joins every prior dispatch. The K2-K1 delta
    # cancels the fixed fetch/launch overhead.
    def run(k):
        ff_st, bit_carry, soft_ctx, nrzm_carry = init_state()
        dep = None
        for i in range(k):
            ff_st, pairs, n_pairs = demod_jit(
                ff_st, dxs[i], dep if dep is not None else jnp.float32(0))
            (words, fdist, rs_errs, r, inv, nhits, bit_carry, soft_ctx,
             nrzm_carry, ber) = chain._step(
                pairs, soft_ctx, rot, swap, bit_carry, nrzm_carry, n_pairs)
            dep = ber + jnp.sum(words[:1, :1].astype(jnp.float32)) \
                + jnp.sum(rs_errs[:1, :1].astype(jnp.float32)) \
                + fdist[0].astype(jnp.float32)
        return float(np.asarray(dep))

    # compile + warm
    run(K1)
    run(K2)

    def best3(k):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(k)
            ts.append(time.perf_counter() - t0)
        return float(min(ts))

    t1 = best3(K1)
    t2 = best3(K2)

    dt = max(t2 - t1, 1e-9)
    # samples actually carried through to CADUs: the chain consumes
    # chunk_pairs of the ~n/sps symbols each block produces
    cap = int(np.ceil(n / (sps * 0.99))) + 2
    eff_n = int(n * min(1.0, (1 << 20) / cap))
    msps = eff_n * (K2 - K1) / dt / 1e6

    # Roofline/MFU (SURVEY §5: first-class): algorithmic flops per input
    # sample of the direct-form chain (what the math requires, not what the
    # FFT formulation spends) — MF 31-tap cplx*real FIR (124), modulation
    # strip+FFT CFO (~123), V&V (~30), O&M timing (~20), polyphase pick
    # (8 taps, 32/sym -> 16), quantize (4), Viterbi 64-state ACS+RE
    # (~14*64/bit -> 448), deframe all-offset correlation (~16/bit -> 8),
    # RS syndromes+BM+Chien+Forney (~40 GF ops/byte at 24 int ops -> ~60).
    flops_per_sample = 124 + 123 + 30 + 20 + 16 + 4 + 448 + 8 + 60
    gflops = msps * 1e6 * flops_per_sample / 1e9
    peak_bf16_gflops = 197e3  # v5e MXU peak
    print(json.dumps({
        "metric": "qpsk_baseband_to_cadu_throughput_1chip",
        "value": round(msps, 2),
        "unit": "Msamp/s",
        "vs_baseline": round(msps / 6.0, 2),
        "algorithmic_gflops": round(gflops, 1),
        "mfu": round(gflops / peak_bf16_gflops, 5),
    }))


if __name__ == "__main__":
    main()
