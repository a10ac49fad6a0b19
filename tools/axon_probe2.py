import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from satdump_tpu.utils import xfer

case = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 16
rng = np.random.default_rng(0)
x = xfer.put(((rng.standard_normal(n)+1j*rng.standard_normal(n))*0.5).astype(np.complex64))

F = {
    "abs_sum": lambda x: jnp.sum(jnp.abs(x)),
    "pow4_sum": lambda x: jnp.sum(jnp.abs((x/jnp.maximum(jnp.abs(x),1e-12))**4)),
    "fft_sum": lambda x: jnp.sum(jnp.abs(jnp.fft.fft(x))),
    "fft_argmax": lambda x: jnp.argmax(jnp.abs(jnp.fft.fft(x))).astype(jnp.float32),
    "argmax": lambda x: jnp.argmax(jnp.abs(x)).astype(jnp.float32),
    "dyn_slice": lambda x: jnp.sum(jnp.abs(jax.lax.dynamic_slice(x, (jnp.argmax(jnp.abs(x)) % 16,), (16,)))),
    "interp": lambda x: jnp.sum(jnp.interp(jnp.arange(n, dtype=jnp.float32),
                                           jnp.arange(n//256, dtype=jnp.float32)*256.0,
                                           jnp.real(x[:n//256]))),
    "cumsum": lambda x: jnp.sum(jnp.cumsum(jnp.real(x))),
    "mod_gather": lambda x: jnp.sum(jnp.abs(x[(jnp.argmax(jnp.abs(x)) + jnp.arange(8)) % n])),
}
f = jax.jit(F[case])
s = f(x)
t0 = time.perf_counter()
try:
    v = float(np.asarray(s))
    print(f"{case} n={n}: ok {time.perf_counter()-t0:.2f}s v={v:.5g}", flush=True)
except Exception as e:
    print(f"{case} n={n}: FAIL {type(e).__name__}", flush=True)
