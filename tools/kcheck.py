import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from satdump_tpu.ops import ffsync
from satdump_tpu.ops.firdes import mm_interpolator_bank, root_raised_cosine

n = 1 << 18
rrc = root_raised_cosine(1.0, 2.0, 1.0, 0.5, 31)
bank = mm_interpolator_bank()
cap = int(np.ceil(n / (2.0 * 0.99))) + 2
rng = np.random.default_rng(3)
xs = (rng.standard_normal((n, 2)) * 0.5).astype(np.float32)

def run(p, uk):
    x = (p[..., 0] + 1j * p[..., 1]).astype(jnp.complex64)
    st = ffsync.ff_clock_init()
    _, syms, valid, _ = ffsync.ff_psk_demod_block(
        st, x, order=4, sps=2.0, rrc_taps=rrc, bank=bank, out_cap=cap,
        use_kernel=uk)
    syms = jnp.where(valid, syms, 0)
    return jnp.stack([jnp.sum(jnp.abs(syms)), jnp.sum(valid.astype(jnp.float32)),
                      jnp.max(jnp.abs(syms))])
d = jax.device_put(xs)
a = np.asarray(jax.jit(lambda p: run(p, False))(d))
b = np.asarray(jax.jit(lambda p: run(p, True))(d))
print("xla   :", a)
print("kernel:", b)
rel = abs(a[0]-b[0])/a[0]
print("rel sum diff", rel)
assert a[1] == b[1], "valid count mismatch"
assert rel < 1e-3
print("TPU PARITY OK")
