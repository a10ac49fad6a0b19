import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

which = sys.argv[1]
if which == "czeros":
    z = jnp.zeros((7,), jnp.complex64)   # eager complex constant
elif which == "czeros_jit":
    z = jax.jit(lambda: jnp.zeros((7,), jnp.complex64))()
elif which == "ffinit":
    sys.path.insert(0, "/root/repo")
    from satdump_tpu.ops import ffsync
    z = ffsync.ff_clock_init()
s = jax.jit(lambda: jnp.sum(jnp.arange(8, dtype=jnp.float32)))()
try:
    print(f"{which}: ok v={float(np.asarray(s)):.5g}", flush=True)
except Exception as e:
    print(f"{which}: FAIL {str(e).splitlines()[0]}", flush=True)
