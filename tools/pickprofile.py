"""Micro-profile of the strip resampler's internals on the axon device:
which of (segment-window gather | taps one-hot matmul | banded strip
loop) owns the 4.1 ms (tools/chainprofile.py `pick`).

Run alone (single-client tunnel):  python tools/pickprofile.py [--quick]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from satdump_tpu.ops import ffsync
    from satdump_tpu.ops.firdes import mm_interpolator_bank
    from satdump_tpu.utils import xfer

    n = 1 << 21
    sps = 2.0
    bank = np.asarray(mm_interpolator_bank())
    nfilt, ntaps = bank.shape
    out_cap = int(np.ceil(n / (sps * 0.99))) + 2
    geo = ffsync._strip_geometry(sps, ntaps)
    G, D = geo
    s0 = 2
    nseg = -(-out_cap // G)
    cap = nseg * G
    Lw = s0 * G + D + ntaps + 8
    M = D + ntaps

    K1, K2 = (1, 3) if args.quick else (2, 6)
    rng = np.random.default_rng(0)
    xs = (rng.standard_normal((K2, n, 2)) * 0.5).astype(np.float32)
    dc = xfer.put(xs)

    start_v = 0.25
    omega_v = sps * 1.0001

    def mk_ext(x):
        return jnp.concatenate([jnp.zeros(7, x.dtype), x])

    def sub_full(x):
        ext = mk_ext(x)
        y, v = ffsync.resample_strip(ext, jnp.float32(start_v),
                                     jnp.float32(omega_v), bank,
                                     out_cap=out_cap, sps=sps, n_in=n)
        return jnp.sum(jnp.abs(y))

    def sub_seggather(x):
        ext = mk_ext(x)
        pad = max(cap * s0 + Lw + 64 - ext.shape[0], 0)
        extp = jnp.concatenate([ext, jnp.zeros(pad, ext.dtype)])
        s_idx = jnp.arange(nseg, dtype=jnp.float32) * G
        c_s = jnp.floor(start_v + s_idx * omega_v).astype(jnp.int32)
        c_s = jnp.clip(c_s, 0, extp.shape[0] - Lw)
        seg = jax.vmap(
            lambda c: jax.lax.dynamic_slice(extp, (c,), (Lw,)))(c_s)
        return jnp.sum(jnp.abs(seg))

    def sub_taps(x):
        k = jnp.arange(cap, dtype=jnp.float32) + jnp.real(x[0])
        p = start_v + k * omega_v + ntaps / 2
        frac = p - jnp.floor(p)
        branch = jnp.clip(jnp.round(frac * nfilt).astype(jnp.int32),
                          0, nfilt - 1)
        taps = jnp.dot(jax.nn.one_hot(branch, nfilt, dtype=jnp.bfloat16),
                       jnp.asarray(bank, jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return jnp.sum(taps)

    def sub_strips(x):
        # strips + banded weights on a PRE-materialized contiguous fake seg
        ext = mk_ext(x)
        pad = max(nseg * Lw - ext.shape[0], 0)
        seg = jnp.concatenate([ext, jnp.zeros(pad, ext.dtype)]
                              )[: nseg * Lw].reshape(nseg, Lw)
        d = (jnp.arange(nseg * G).reshape(nseg, G) % (D - 1)).astype(
            jnp.int32)
        taps = jnp.broadcast_to(
            jnp.asarray(bank[0], jnp.float32), (nseg, G, ntaps))
        planes = [seg[:, r::s0] for r in range(s0)]
        y = jnp.zeros((nseg, G), ext.dtype)
        for m in range(M):
            Xm = planes[m % s0][:, m // s0: m // s0 + G]
            md = m - d
            w = jnp.zeros((nseg, G), jnp.float32)
            for t in range(ntaps):
                w = w + jnp.where(md == t, taps[..., t], 0.0)
            y = y + Xm * w
        return jnp.sum(jnp.abs(y))

    SUBS = {"full": sub_full, "seg_gather": sub_seggather,
            "taps_matmul": sub_taps, "strips_loop": sub_strips}

    def build(fn):
        def run(xs):
            def body(acc, p):
                v = (p[..., 0] + 1j * p[..., 1]).astype(jnp.complex64)
                return acc + fn(v + (acc * 0).astype(v.dtype)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return acc
        return jax.jit(run)

    for name, fn in SUBS.items():
        f1, f2 = build(fn), build(fn)
        t0 = time.time()
        float(np.asarray(f1(dc[:K1])))
        float(np.asarray(f2(dc)))
        tc = time.time() - t0

        def t_best(f, a):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(f(a)))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        dt = max(t_best(f2, dc) - t_best(f1, dc[:K1]), 1e-9)
        ms = dt / (K2 - K1) * 1e3
        print(f"{name:12s}: {ms:7.3f} ms/blk  (compile {tc:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
