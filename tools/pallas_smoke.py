import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + 1.0

@jax.jit
def f(x):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)

x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
y = f(x)
v = np.asarray(y)
assert np.allclose(v, np.arange(8*128).reshape(8,128)*2+1)
print("pallas smoke OK", v[0, :3])
