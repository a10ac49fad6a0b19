"""Diagnostic probe for the axon TPU tunnel's execution semantics.

One case per subprocess (device-to-host breakage is permanent per process).
Usage: python tools/axon_probe.py CASE
Cases cover: basic jit compile+fetch, donated buffers, pallas kernel smoke,
large-transfer timing. This is the single consolidated diagnostic kept from
the round-1 probe series."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

case = sys.argv[1]
t_start = time.perf_counter()

def fetch(x, label):
    t0 = time.perf_counter()
    try:
        v = np.asarray(x)
        print(f"{label}: fetch ok {time.perf_counter()-t0:.3f}s sum={float(np.sum(v)):.4g}", flush=True)
        return True
    except Exception as e:
        print(f"{label}: fetch FAIL {type(e).__name__} {time.perf_counter()-t0:.3f}s", flush=True)
        return False

if case == "matmul_time":
    # ground truth: does BUR wait? 4096^3 matmul x 100 in a scan ~ 1.4 TFLOP
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    def run(a, iters):
        def body(m, _):
            return m @ m * jnp.bfloat16(1e-4), None
        m, _ = jax.lax.scan(body, a, None, length=iters)
        return jnp.sum(m.astype(jnp.float32))
    f10 = jax.jit(lambda a: run(a, 10))
    f200 = jax.jit(lambda a: run(a, 200))
    s = f10(a); jax.block_until_ready(s)
    t0 = time.perf_counter(); s1 = f10(a); jax.block_until_ready(s1); t1 = time.perf_counter()-t0
    s = f200(a); jax.block_until_ready(s)
    t0 = time.perf_counter(); s2 = f200(a); jax.block_until_ready(s2); t2 = time.perf_counter()-t0
    print(f"BUR: 10 iters {t1*1e3:.1f}ms, 200 iters {t2*1e3:.1f}ms -> "
          f"{'BUR WAITS' if t2 > 3*t1 else 'BUR DOES NOT WAIT'}", flush=True)
    fetch(s1, "matmul sum (10)")
    t0 = time.perf_counter(); v = np.asarray(f200(a)); t2f = time.perf_counter()-t0
    print(f"fetch-timed 200 iters: {t2f*1e3:.1f}ms", flush=True)
elif case == "demod_small":
    from satdump_tpu.ops import ffsync
    from satdump_tpu.ops.firdes import mm_interpolator_bank, root_raised_cosine
    from satdump_tpu.utils import xfer
    n = 1 << 16
    rrc = root_raised_cosine(1.0, 2.0, 1.0, 0.5, 31)
    bank = mm_interpolator_bank()
    cap = int(np.ceil(n/1.98))+2
    rng = np.random.default_rng(0)
    x = xfer.put(((rng.standard_normal(n)+1j*rng.standard_normal(n))*0.5).astype(np.complex64))
    st = ffsync.ff_clock_init()
    f = jax.jit(lambda s, x: jnp.sum(jnp.abs(
        ffsync.ff_psk_demod_block(s, x, order=4, sps=2.0, rrc_taps=rrc, bank=bank, out_cap=cap)[1])))
    s = f(st, x); jax.block_until_ready(s)
    fetch(s, "demod_small scalar")
elif case in ("cfo", "vv", "om", "resamp", "fir", "viterbi"):
    from satdump_tpu.ops import ffsync
    from satdump_tpu.ops.firdes import mm_interpolator_bank, root_raised_cosine
    from satdump_tpu.ops.fir import fir_apply, fir_init
    from satdump_tpu.ops.fec import convolutional as cc
    from satdump_tpu.utils import xfer
    n = 1 << 16
    rng = np.random.default_rng(0)
    x = xfer.put(((rng.standard_normal(n)+1j*rng.standard_normal(n))*0.5).astype(np.complex64))
    if case == "cfo":
        s = jax.jit(lambda x: ffsync.cfo_estimate(x, 4))(x)
    elif case == "vv":
        s = jax.jit(lambda x: jnp.sum(ffsync.vv_phase_track(x, 4, 256)))(x)
    elif case == "om":
        s = jax.jit(lambda x: ffsync.om_timing_fit(x, 2.0, 512)[0])(x)
    elif case == "resamp":
        bank = mm_interpolator_bank()
        cap = n // 2
        def g(x):
            pos = jnp.arange(cap, dtype=jnp.float32) * 2.0
            ext = jnp.concatenate([jnp.zeros(7, x.dtype), x])
            return jnp.sum(jnp.abs(ffsync.ff_resample_at(ext, pos, bank, n)[0]))
        s = jax.jit(g)(x)
    elif case == "fir":
        rrc = root_raised_cosine(1.0, 2.0, 1.0, 0.5, 31)
        s = jax.jit(lambda x: jnp.sum(jnp.abs(fir_apply(fir_init(31), x, jnp.asarray(rrc))[1])))(x)
    elif case == "viterbi":
        u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, (1<<14, 2)).astype(np.float32))
        s = jax.jit(lambda u: jnp.sum(cc.viterbi_decode_tiled(u, seg=1024, ovl=128).astype(jnp.float32)))(u8)
    jax.block_until_ready(s)
    fetch(s, case)
print(f"total {time.perf_counter()-t_start:.1f}s", flush=True)
