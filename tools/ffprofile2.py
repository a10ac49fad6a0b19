import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from satdump_tpu.ops import ffsync
from satdump_tpu.ops.firdes import mm_interpolator_bank, root_raised_cosine

n = 1 << 21
rrc = root_raised_cosine(1.0, 2.0, 1.0, 0.5, 31)
bank = mm_interpolator_bank()
cap = int(np.ceil(n / (2.0 * 0.99))) + 2

def stage_vv(x):
    ph_t, _ = ffsync.vv_phase_track(x, 4, 1024)
    return x * jnp.exp(-1j * ph_t).astype(x.dtype)

def stage_resamp(x):
    st = ffsync.ff_clock_init()
    st2, syms, valid = ffsync.ff_clock_recovery(st, x, sps=2.0, bank=bank, out_cap=cap, use_kernel=True)
    return syms

def stage_full(x):
    st = ffsync.ff_clock_init()
    _, syms, valid, snr = ffsync.ff_psk_demod_block(
        st, x, order=4, sps=2.0, rrc_taps=rrc, bank=bank, out_cap=cap)
    return jnp.abs(syms)

STAGES = {"vv": stage_vv, "resamp": stage_resamp, "full": stage_full}

def build(fn):
    def run(xs):
        def body(acc, p):
            x = (p[..., 0] + 1j * p[..., 1]).astype(jnp.complex64)
            return acc + jnp.sum(jnp.abs(fn(x)).astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc
    return jax.jit(run)

rng = np.random.default_rng(0)
xs = (rng.standard_normal((8, n, 2)) * 0.5).astype(np.float32)
d8 = jax.device_put(xs); d2 = jax.device_put(xs[:2])
for name, stfn in STAGES.items():
    f2, f8 = build(stfn), build(stfn)
    float(np.asarray(f2(d2))); float(np.asarray(f8(d8)))
    def tt(f, arg):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(np.asarray(f(arg))); ts.append(time.perf_counter()-t0)
        return min(ts)
    dt = max(tt(f8, d8) - tt(f2, d2), 1e-9)
    print(f"{name}: {n*6/dt/1e6:.1f} Msps", flush=True)
