"""Time resampler-gather formulations on the axon TPU (delta method)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from satdump_tpu.ops.firdes import mm_interpolator_bank

n = 1 << 21
cap = n // 2
bank_np = mm_interpolator_bank().astype(np.float32)  # (128, 8)
NF, NT = bank_np.shape

def positions(x):
    # data-dependent start/skew like the real path
    tau0 = jnp.real(x[0]) * 0.1
    om = 2.0 * (1.0 + jnp.imag(x[1]) * 1e-4)
    p = tau0 + jnp.arange(cap, dtype=jnp.float32) * om + NT / 2
    ip = jnp.floor(p)
    src = jnp.clip(ip.astype(jnp.int32), 0, n - 1)
    br = jnp.clip(jnp.round((p - ip) * NF).astype(jnp.int32), 0, NF - 1)
    return src, br

def taps_onehot(br):
    oh = jax.nn.one_hot(br, NF, dtype=jnp.float32)        # (cap, 128)
    return oh @ jnp.asarray(bank_np)                      # (cap, 8) via MXU

def v_current(x):
    ext = jnp.concatenate([jnp.zeros(NT - 1, x.dtype), x])
    src, br = positions(x)
    idx = src[:, None] + jnp.arange(NT)[None, :]
    win = ext[idx]
    taps = jnp.asarray(bank_np)[br]
    return jnp.sum(win * taps, axis=-1)

def v_onehot_taps(x):
    ext = jnp.concatenate([jnp.zeros(NT - 1, x.dtype), x])
    src, br = positions(x)
    idx = src[:, None] + jnp.arange(NT)[None, :]
    win = ext[idx]
    return jnp.sum(win * taps_onehot(br), axis=-1)

def v_1d_gathers(x):
    ext = jnp.concatenate([jnp.zeros(NT - 1, x.dtype), x])
    src, br = positions(x)
    taps = taps_onehot(br)
    y = jnp.zeros(cap, x.dtype)
    for t in range(NT):
        y = y + ext[src + t] * taps[:, t]
    return y

def v_take(x):
    ext = jnp.concatenate([jnp.zeros(NT - 1, x.dtype), x])
    src, br = positions(x)
    taps = taps_onehot(br)
    y = jnp.zeros(cap, x.dtype)
    for t in range(NT):
        y = y + jnp.take(ext, src + t, indices_are_sorted=True) * taps[:, t]
    return y

def v_parity(x):
    # src ~ 2k + d: reshape ext into (n//2, 2) rows, gather rows k + dk
    ext = jnp.concatenate([jnp.zeros(NT - 1, x.dtype), x,
                           jnp.zeros(NT + 1, x.dtype)])
    src, br = positions(x)
    taps = taps_onehot(br)
    rows = src // 2
    # window of 8 starting at src = rows*2 + (src&1): load 5 consecutive rows
    exr = ext[: (ext.shape[0] // 2) * 2].reshape(-1, 2)
    R = exr.shape[0]
    ridx = jnp.clip(rows[:, None] + jnp.arange(5)[None, :], 0, R - 1)
    blk = exr[ridx].reshape(cap, 10)            # (cap, 10)
    off = (src & 1)
    # select 8 of 10 with shift 0 or 1: via where
    w0 = blk[:, 0:8]
    w1 = blk[:, 1:9]
    win = jnp.where((off == 1)[:, None], w1, w0)
    return jnp.sum(win * taps, axis=-1)

VARIANTS = {"current": v_current, "onehot_taps": v_onehot_taps,
            "gather1d": v_1d_gathers, "take_sorted": v_take,
            "parity_rows": v_parity}

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
which = sys.argv[1:] or list(VARIANTS)
ref = None
for name in which:
    fn = VARIANTS[name]
    f2, f8 = build(fn), build(fn)
    a = float(np.asarray(f2(d2))); float(np.asarray(f8(d8)))
    def t(f, arg):
        return min(time.perf_counter() - t0 if False else 0 for _ in ()) if False else None
    def tt(f, arg):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(np.asarray(f(arg))); ts.append(time.perf_counter()-t0)
        return min(ts)
    dt = max(tt(f8, d8) - tt(f2, d2), 1e-9)
    print(f"{name}: {n*6/dt/1e6:.1f} Msps (chk {a:.1f})", flush=True)
