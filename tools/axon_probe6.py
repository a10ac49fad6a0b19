import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

which = sys.argv[1]
if which == "pkgimport":
    import satdump_tpu  # noqa
import jax, jax.numpy as jnp
n = 65536
rng = np.random.default_rng(0)
xc = ((rng.standard_normal(n)+1j*rng.standard_normal(n))*0.5).astype(np.complex64)
pairs = xc.view(np.float32).reshape(n, 2)
x = jax.jit(lambda p: (p[...,0]+1j*p[...,1]).astype(jnp.complex64))(jnp.asarray(pairs))
s = jax.jit(lambda x: jnp.sum(jnp.abs(x)))(x)
try:
    print(f"{which}: ok v={float(np.asarray(s)):.5g}", flush=True)
except Exception as e:
    print(f"{which}: FAIL {str(e).splitlines()[0]}", flush=True)
