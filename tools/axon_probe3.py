import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

case = sys.argv[1]; n = int(sys.argv[2])
rng = np.random.default_rng(0)
xc = ((rng.standard_normal(n)+1j*rng.standard_normal(n))*0.5).astype(np.complex64)
pairs = xc.view(np.float32).reshape(n, 2)

def tryfetch(s, label):
    try:
        v = float(np.asarray(s))
        print(f"{label} n={n}: ok v={v:.5g}", flush=True)
    except Exception as e:
        print(f"{label} n={n}: FAIL {type(e).__name__}", flush=True)

if case == "combine2jit":  # current xfer.put style: combine jit -> abs_sum jit
    xd = jax.jit(lambda p: (p[...,0]+1j*p[...,1]).astype(jnp.complex64))(jnp.asarray(pairs))
    s = jax.jit(lambda x: jnp.sum(jnp.abs(x)))(xd)
    tryfetch(s, case)
elif case == "inside1jit":  # f32 pairs in, combine inside the SAME jit
    s = jax.jit(lambda p: jnp.sum(jnp.abs((p[...,0]+1j*p[...,1]).astype(jnp.complex64))))(jnp.asarray(pairs))
    tryfetch(s, case)
elif case == "f32only":     # no complex anywhere
    s = jax.jit(lambda p: jnp.sum(jnp.abs(p)))(jnp.asarray(pairs))
    tryfetch(s, case)
elif case == "complexout":  # complex OUTPUT of a jit, fetch f32 later
    xd = jax.jit(lambda p: (p[...,0]+1j*p[...,1]).astype(jnp.complex64))(jnp.asarray(pairs))
    s = jax.jit(lambda x: jnp.sum(jnp.real(x)))(xd)
    tryfetch(s, case)
elif case == "rawcomplex":  # raw complex h2d
    xd = jnp.asarray(xc)
    s = jax.jit(lambda x: jnp.sum(jnp.abs(x)))(xd)
    tryfetch(s, case)
