"""Per-stage on-device profile of the full bench.py baseband->CADU chain.

Times each stage of the flagship QPSK chain IN ISOLATION with the same
K2-K1 methodology as bench.py (scan over K distinct pre-staged blocks,
trailing scalar fetch joins the stream; K2-K1 delta cancels fixed
launch/fetch overhead). Stage shapes match bench.py exactly:
n = 2^21 samples/block, sps = 2, chunk_pairs = 2^20, CADU 8192 bits,
RS(255,223) I=4.

Run on the real axon TPU:  python tools/chainprofile.py
Add --quick for K=(1,3) instead of (2,8).

Output: Msamp/s per stage (input-sample-equivalent rate: each stage's
wall time is expressed against the n=2^21 input samples it serves per
block, so 1/rate sums across stages to the whole-chain 1/rate).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--stages", type=str, default="",
                    help="comma-separated subset to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from satdump_tpu.ops import ffsync
    from satdump_tpu.ops.fec import convolutional as cc
    from satdump_tpu.ops.fec.cadu_chain import SEG, HALO, CaduChain, \
        _asm_distance, _conv_encode_dev
    from satdump_tpu.ops.firdes import mm_interpolator_bank, \
        root_raised_cosine
    from satdump_tpu.utils import xfer

    n = 1 << 21
    sps = 2.0
    chunk_pairs = 1 << 20
    rrc = root_raised_cosine(1.0, sps, 1.0, 0.5, 31)
    bank = mm_interpolator_bank()
    cap = int(np.ceil(n / (sps * 0.99))) + 2
    chain = CaduChain(cadu_bits=8192, chunk_pairs=chunk_pairs, rs_i=4)

    # ---------------- demod-side stages (input: (n,) complex) -------------
    def stage_agc(x):
        g = 1.0 / jnp.maximum(jnp.mean(jnp.abs(x)), 1e-12)
        return x * g.astype(x.dtype)

    def stage_rrc(x):
        return ffsync._segmented_mf(x, rrc)

    def stage_rrc_direct(x):
        return ffsync._direct_mf(x, rrc)

    def stage_cfo(x):
        f = ffsync.cfo_estimate(x, 4, suppress_nyquist_image=True)
        return ffsync.cfo_correct(x, f, 0.0)

    def stage_vv(x):
        ph_t, _ = ffsync.vv_phase_track(x, 4, 1024)
        return x * jnp.exp(-1j * ph_t).astype(x.dtype)

    def stage_om(x):
        tau0, skew = ffsync.om_timing_fit(x, sps, 2048)
        return x * (1.0 + 0.0 * tau0)

    def stage_pick(x):
        # resample only (strip path at sps=2), fixed start/omega
        ext = jnp.concatenate([jnp.zeros(7, x.dtype), x])
        syms, valid = ffsync.resample_strip(
            ext, jnp.float32(0.25), jnp.float32(sps * 1.0001),
            np.asarray(bank), out_cap=cap, sps=sps, n_in=n)
        return syms

    def stage_quant(x):
        s = x[:chunk_pairs]
        soft = jnp.stack([jnp.real(s), jnp.imag(s)], axis=-1)
        return jnp.clip(soft * 100.0, -127, 127)

    # ---------------- FEC-side stages (input: (chunk_pairs, 2) f32) -------
    vit_pairs = chain.vit_pairs

    def prep_u8(p):
        u8 = p + 128.0
        return jnp.concatenate(
            [u8, jnp.full((vit_pairs - u8.shape[0], 2), 128.0)])

    def stage_viterbi(p):
        # the path the chain actually ships on TPU (Pallas RE kernel)
        u8p = prep_u8(p)
        from satdump_tpu.ops.ffsync import _on_tpu
        if _on_tpu():
            from satdump_tpu.ops.pallas.viterbi import viterbi_re_pallas
            return viterbi_re_pallas(u8p, seg=SEG, ovl=HALO
                                     ).astype(jnp.float32)
        return cc.viterbi_decode_tiled_re(
            u8p, seg=SEG, ovl=HALO, unroll=1).astype(jnp.float32)

    def stage_viterbi_xla(p):
        u8p = prep_u8(p)
        return cc.viterbi_decode_tiled_re(
            u8p, seg=SEG, ovl=HALO, unroll=4).astype(jnp.float32)

    def stage_ber(p):
        u8p = prep_u8(p)
        raw = (u8p[: chunk_pairs, 0] > 127.5).astype(jnp.int32)
        W = 2048
        w0 = chunk_pairs // 2
        reenc = _conv_encode_dev(jax.lax.slice(raw, (w0 - 8,), (w0 + W,)))
        return jnp.sum(reenc).astype(jnp.float32)

    N_stream = chain.carry_bits + chunk_pairs
    F = chain.F

    def stage_deframe(p):
        bits = (p[:, 0] > 0).astype(jnp.int32)
        stream = jnp.concatenate(
            [jnp.zeros((chain.carry_bits,), jnp.int32), bits])
        dist = _asm_distance(stream, chain.pattern)
        K = (N_stream - 31) // chain.L
        d2 = jax.lax.slice(dist, (0,), (K * chain.L,)).reshape(K, chain.L)
        hits_n = jnp.sum((d2 == 0).astype(jnp.int32), axis=0)
        hits_i = jnp.sum((d2 == 32).astype(jnp.int32), axis=0)
        r = jnp.argmax(hits_n + hits_i).astype(jnp.int32)
        ext = jnp.concatenate([stream, jnp.zeros((chain.L,), jnp.int32)])
        fr = jax.lax.dynamic_slice(ext, (r,), (F * chain.L,)
                                   ).reshape(F, chain.L)
        fbytes = jnp.zeros((F, chain.cadu_bytes), jnp.int32)
        for k in range(8):
            fbytes = fbytes + (fr[:, k::8] << (7 - k))
        return jnp.sum(fbytes).astype(jnp.float32)

    def stage_rs(p):
        # realistic: F frames x rs_i codewords from the soft input bytes
        b = (p[: F * 255 * 4 // 2].reshape(-1) * 0).astype(jnp.int32) \
            if False else None
        raw = (p.reshape(-1)[: F * chain.cadu_bytes] > 0).astype(jnp.int32)
        fbytes = raw.reshape(F, chain.cadu_bytes) * 255
        payload = fbytes[:, 4: 4 + 255 * 4]
        corrected, rs_errs = chain.rs.decode_interleaved(payload, 4)
        return jnp.sum(rs_errs).astype(jnp.float32)

    DEMOD = {"agc": stage_agc, "rrc": stage_rrc,
             "rrc_direct": stage_rrc_direct, "cfo": stage_cfo,
             "vv": stage_vv, "om": stage_om, "pick": stage_pick,
             "quant": stage_quant}
    FEC = {"viterbi": stage_viterbi, "viterbi_xla": stage_viterbi_xla,
           "ber": stage_ber, "deframe": stage_deframe, "rs": stage_rs}
    ALT = {"rrc_direct", "viterbi_xla"}   # variants, not chain stages

    sel = set(args.stages.split(",")) if args.stages else None

    K1, K2 = (1, 3) if args.quick else (2, 8)
    rng = np.random.default_rng(0)

    def build(stage, complex_in):
        def run(xs):
            def body(acc, p):
                if complex_in:
                    v = (p[..., 0] + 1j * p[..., 1]).astype(jnp.complex64)
                else:
                    v = p
                y = stage(v + (acc * 0).astype(v.dtype))  # serialize blocks
                return acc + jnp.sum(jnp.abs(y).astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return acc
        return jax.jit(run)

    xs_c = (rng.standard_normal((K2, n, 2)) * 0.5).astype(np.float32)
    xs_s = rng.integers(-127, 128, (K2, chunk_pairs, 2)).astype(np.float32)
    dc = [xfer.put(xs_c[:K1]), xfer.put(xs_c)]
    dsft = [xfer.put(xs_s[:K1]), xfer.put(xs_s)]

    def t_best(f, a, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(a)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    results = {}
    for name, st in list(DEMOD.items()) + list(FEC.items()):
        if sel and name not in sel:
            continue
        complex_in = name in DEMOD
        data = dc if complex_in else dsft
        f1, f2 = build(st, complex_in), build(st, complex_in)
        tc0 = time.perf_counter()
        float(np.asarray(f1(data[0])))   # compile K1
        float(np.asarray(f2(data[1])))   # compile K2
        tcomp = time.perf_counter() - tc0
        dt = max(t_best(f2, data[1]) - t_best(f1, data[0]), 1e-9)
        msps = n * (K2 - K1) / dt / 1e6
        ms_per_block = dt / (K2 - K1) * 1e3
        results[name] = msps
        print(f"{name:10s}: {msps:9.1f} Msamp/s   {ms_per_block:8.3f} ms/blk"
              f"   (compile {tcomp:.0f}s)", flush=True)

    if not sel:
        inv = sum(1.0 / v for k, v in results.items() if k not in ALT)
        print(f"{'SUM(1/r)':10s}: {1.0 / inv:9.1f} Msamp/s predicted "
              f"full-chain (variants excluded)", flush=True)


if __name__ == "__main__":
    main()
