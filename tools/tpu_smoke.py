"""Serialized TPU smoke: jit every shipped demod/FEC device stage ONCE on
the real axon backend at tiny shapes and report pass/fail per stage.

The pytest suite pins the CPU backend (the axon tunnel is single-client),
so without this, only the QPSK flagship chain ever runs on real TPU
hardware (VERDICT r4 weak #4 — round-3's costas-on-axon lowering surprise
motivates checking EVERY stage). Run alone — never concurrently with
bench.py or another JAX process:

    python tools/tpu_smoke.py            # all stages
    python tools/tpu_smoke.py --only ldpc,ffsync_oqpsk
"""
import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = []


def stage(name):
    def deco(fn):
        fn._stage_name = name
        STAGES.append(fn)
        return fn
    return deco


STAGES = []


# --------------------------------------------------------------- demods ----
def _ffsync_stage(order, oqpsk=False, alpha=0.5):
    """One jitted program per stage: eager op-by-op dispatch both crawls
    through the remote compiler AND can poison d2h via eager complex
    constants (observed) — everything device-side must live in ONE jit,
    exactly like bench.py."""
    import jax
    import jax.numpy as jnp
    from satdump_tpu.ops import ffsync
    from satdump_tpu.ops.firdes import mm_interpolator_bank, root_raised_cosine
    from satdump_tpu.utils import xfer
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(1 << 14) + 1j * rng.standard_normal(1 << 14)
         ).astype(np.complex64) * 0.5
    rrc = root_raised_cosine(1.0, 2.0, 1.0, alpha, 31)
    bank = mm_interpolator_bank()

    @jax.jit
    def go(x):
        st = ffsync.ff_clock_init(rrc_ntaps=31)
        st, syms, valid, snr = ffsync.ff_psk_demod_block(
            st, x, order=order, sps=2.0, oqpsk=oqpsk, rrc_taps=rrc,
            bank=bank, out_cap=8300)
        return jnp.sum(jnp.abs(syms))

    return float(xfer.get(go(xfer.put(x))))


@stage("ffsync_qpsk")
def s_ffsync_qpsk():
    return _ffsync_stage(4)


@stage("ffsync_oqpsk")
def s_ffsync_oqpsk():
    return _ffsync_stage(4, oqpsk=True)


@stage("ffsync_8psk")
def s_ffsync_8psk():
    return _ffsync_stage(8, alpha=0.35)


@stage("fm_quadrature")
def s_fm():
    import jax
    import jax.numpy as jnp
    from satdump_tpu.utils import xfer
    rng = np.random.default_rng(0)
    x = np.exp(1j * np.cumsum(rng.standard_normal(1 << 14) * 0.3)
               ).astype(np.complex64)

    @jax.jit
    def quad(x):
        d = x[1:] * jnp.conj(x[:-1])
        return jnp.sum(jnp.arctan2(jnp.imag(d), jnp.real(d)))
    return float(xfer.get(quad(xfer.put(x))))


@stage("costas_scan")
def s_costas():
    # known-unsupported on the tunnel backend for some orders; record
    # the real current behavior rather than guessing
    import jax.numpy as jnp
    from satdump_tpu.ops.costas import costas_init, costas_scan
    from satdump_tpu.utils import xfer
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
         ).astype(np.complex64)
    import jax

    @jax.jit
    def go(x):
        st = costas_init()
        st, y = costas_scan(st, x, loop_bw=0.005, order=4)
        return jnp.sum(jnp.abs(y))

    return float(xfer.get(go(xfer.put(x))))


@stage("resample_strip")
def s_strip():
    import jax.numpy as jnp
    from satdump_tpu.ops import ffsync
    from satdump_tpu.ops.firdes import mm_interpolator_bank
    from satdump_tpu.utils import xfer
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(1 << 14) + 1j * rng.standard_normal(1 << 14)
         ).astype(np.complex64)
    import jax
    bank = np.asarray(mm_interpolator_bank())

    @jax.jit
    def go(x):
        y, valid = ffsync.resample_strip(
            x, jnp.float32(0.25), jnp.float32(2.0002), bank,
            out_cap=8000, sps=2.0, n_in=1 << 14)
        return jnp.sum(jnp.abs(y))

    return float(xfer.get(go(xfer.put(x))))


@stage("pallas_resample")
def s_pallas_resample():
    import jax.numpy as jnp
    from satdump_tpu.ops.firdes import mm_interpolator_bank
    from satdump_tpu.ops.pallas.resample import resample_arith_grid
    from satdump_tpu.utils import xfer
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(1 << 14) + 1j * rng.standard_normal(1 << 14)
         ).astype(np.complex64)
    y = resample_arith_grid(
        xfer.put(x), jnp.float32(0.25), jnp.float32(2.1003),
        jnp.asarray(mm_interpolator_bank()), out_cap=4096, sps_max=2.2)
    return float(xfer.get(jnp.sum(jnp.abs(y))))


@stage("pallas_viterbi")
def s_pallas_viterbi():
    import jax.numpy as jnp
    from satdump_tpu.ops.pallas.viterbi import viterbi_re_pallas
    from satdump_tpu.utils import xfer
    rng = np.random.default_rng(0)
    soft = rng.uniform(0, 255, (4096, 2)).astype(np.float32)
    bits = viterbi_re_pallas(xfer.put(soft), seg=1024, ovl=128)
    return float(xfer.get(jnp.sum(bits.astype(jnp.float32))))


# ------------------------------------------------------------------ FEC ----
@stage("viterbi_xla_re")
def s_viterbi_xla():
    import jax.numpy as jnp
    from satdump_tpu.ops.fec import convolutional as cc
    from satdump_tpu.utils import xfer
    rng = np.random.default_rng(0)
    soft = rng.uniform(0, 255, (4096, 2)).astype(np.float32)
    bits = cc.viterbi_decode_tiled_re(xfer.put(soft), seg=1024, ovl=128)
    return float(xfer.get(jnp.sum(bits.astype(jnp.float32))))


@stage("cadu_chain")
def s_cadu_chain():
    from satdump_tpu.ops.fec.cadu_chain import CaduChain
    rng = np.random.default_rng(0)
    chain = CaduChain(cadu_bits=8192, chunk_pairs=1 << 14, rs_i=4)
    st = chain.init_state()
    soft = rng.integers(-127, 128, 2 << 14).astype(np.int8)
    cadus, rs_errs, stats = chain.work(st, soft, 0, False)
    return float(stats["ber"])


@stage("rs_device")
def s_rs_device():
    import jax.numpy as jnp
    from satdump_tpu.ops.fec.rs_device import RSDevice
    from satdump_tpu.utils import xfer
    rng = np.random.default_rng(0)
    import jax
    rs = RSDevice(k=223, dual=True)
    cw = rng.integers(0, 256, (8, 255)).astype(np.int32)

    @jax.jit
    def go(cw):
        out, nerr = rs.decode(cw)
        return jnp.sum(nerr.astype(jnp.float32))

    return float(xfer.get(go(xfer.put(cw))))


@stage("ldpc_minsum")
def s_ldpc():
    import jax.numpy as jnp
    from satdump_tpu.ops.fec.ldpc import MinSumDecoder, make_regular_code
    from satdump_tpu.utils import xfer
    rng = np.random.default_rng(0)
    from satdump_tpu.ops.fec.ldpc import _minsum_iters
    import jax
    code = make_regular_code(256, 3, 6)
    dec = MinSumDecoder(code, iters=10)
    llr = rng.standard_normal((4, 256)).astype(np.float32) * 4

    @jax.jit
    def go(llr):
        bits, ok = _minsum_iters(llr, dec._chk_vars, dec._valid,
                                 dec.iters, dec.alpha)
        return jnp.sum(bits.astype(jnp.float32))

    return float(xfer.get(go(xfer.put(llr))))


@stage("ldpc_ccsds_ar4ja")
def s_ldpc_ccsds():
    import jax.numpy as jnp
    from satdump_tpu.ops.fec.ldpc_ccsds import make_ar4ja
    from satdump_tpu.ops.fec.ldpc import MinSumDecoder
    from satdump_tpu.utils import xfer
    rng = np.random.default_rng(0)
    from satdump_tpu.ops.fec.ldpc import _minsum_iters
    import jax
    code, punct = make_ar4ja("1/2", 1024)
    dec = MinSumDecoder(code, iters=5)
    llr = rng.standard_normal((1, code.n)).astype(np.float32) * 4

    @jax.jit
    def go(llr):
        bits, ok = _minsum_iters(llr, dec._chk_vars, dec._valid,
                                 dec.iters, dec.alpha)
        return jnp.sum(bits.astype(jnp.float32))

    return float(xfer.get(go(xfer.put(llr))))


@stage("turbo_ccsds")
def s_turbo():
    from satdump_tpu.ops.fec.turbo import CCSDSTurbo
    rng = np.random.default_rng(0)
    t = CCSDSTurbo(base=223, rate="1/2")
    bits = rng.integers(0, 2, (1, 223 * 8)).astype(np.uint8)
    enc = t.encode_bits(bits)
    soft = np.where(enc > 0, 4.0, -4.0).astype(np.float32)
    dec, llr = t.decode(soft, iterations=2)
    return float(np.sum(dec))


@stage("dvbs2_demap_16apsk")
def s_dvbs2_demap():
    # device form of the max-log demap (soft_demod is the host golden)
    import jax
    import jax.numpy as jnp
    from satdump_tpu.ops.constellation import bits_per_symbol, get_points
    from satdump_tpu.utils import xfer
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
         ).astype(np.complex64)
    pts = get_points("16apsk", 3.15)
    m = bits_per_symbol("16apsk")
    one_masks = np.stack([((np.arange(len(pts)) >> b) & 1) == 1
                          for b in range(m - 1, -1, -1)])

    @jax.jit
    def go(x):
        d2 = jnp.abs(x[:, None] - jnp.asarray(pts)[None]) ** 2 / 0.1
        acc = jnp.float32(0)
        for b in range(m):
            mask = jnp.asarray(one_masks[b])
            llr = jnp.min(jnp.where(mask[None], jnp.inf, d2), axis=-1)                 - jnp.min(jnp.where(mask[None], d2, jnp.inf), axis=-1)
            acc = acc + jnp.sum(jnp.abs(llr))
        return acc

    return float(xfer.get(go(xfer.put(x))))


@stage("dvbs2_ldpc")
def s_dvbs2_ldpc():
    import jax.numpy as jnp
    from satdump_tpu.ops.dvbs2.ldpc import get_ldpc
    from satdump_tpu.utils import xfer
    rng = np.random.default_rng(0)
    from satdump_tpu.ops.fec.ldpc import _minsum_iters
    import jax
    dec = get_ldpc("short", "1/2", iters=5)
    llr = rng.standard_normal((1, dec.N)).astype(np.float32) * 4

    @jax.jit
    def go(llr):
        bits, ok = _minsum_iters(llr, dec.dec._chk_vars, dec.dec._valid,
                                 dec.dec.iters, dec.dec.alpha)
        return jnp.sum(bits.astype(jnp.float32))

    return float(xfer.get(go(xfer.put(llr))))


@stage("deframe_correlate")
def s_deframe():
    import jax.numpy as jnp
    from satdump_tpu.ops.fec.cadu_chain import _asm_distance
    import jax
    from satdump_tpu.utils import xfer
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 1 << 16).astype(np.int32)
    pattern = np.unpackbits(
        np.array([0x1A, 0xCF, 0xFC, 0x1D], np.uint8)).astype(np.int32)
    f = jax.jit(lambda b: jnp.sum(_asm_distance(b, pattern)))
    return float(xfer.get(f(xfer.put(bits)).astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    # NOTE: do NOT probe jax.devices()/default_backend() up front — on the
    # axon tunnel, touching the backend before the first h2d transfer
    # permanently poisons every later d2h fetch in the process
    # (utils/xfer.py, tools/axon_probe7.py). The FIRST device op must be a
    # host->device transfer (bench.py stages its inputs before building);
    # prime one before any stage can run a device-side init.
    from satdump_tpu.utils import xfer
    xfer.put(np.zeros(8, np.float32))
    # ...and the first COMPLEX device object must come from the pairs+
    # combine put as well (bench.py stages complex inputs before building;
    # a jitted complex fill as the first complex op poisons d2h the same
    # way — observed: every later fetch returns UNIMPLEMENTED)
    xfer.put(np.zeros(8, np.complex64))

    n_pass = n_fail = 0
    for fn in STAGES:
        name = fn._stage_name
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            v = fn()
            dt = time.time() - t0
            ok = np.isfinite(v)
            print(f"{'PASS' if ok else 'FAIL'}  {name:22s} "
                  f"{dt:6.1f}s  value={v:.4g}", flush=True)
            n_pass += ok
            n_fail += not ok
        except Exception as e:
            dt = time.time() - t0
            msg = str(e).split("\n")[0][:120]
            print(f"FAIL  {name:22s} {dt:6.1f}s  {type(e).__name__}: {msg}",
                  flush=True)
            if os.environ.get("SMOKE_TRACE"):
                traceback.print_exc()
            n_fail += 1
    import jax
    print(f"\nbackend: {jax.default_backend()}", flush=True)
    print(f"{n_pass} passed, {n_fail} failed", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
