"""Host<->device transfer shims for the axon TPU tunnel.

The tunnel backend (JAX platform "axon") has a transfer quirk: a complex64
host->device transfer permanently breaks every later device->host transfer in
the process ("UNIMPLEMENTED: TPU backend error"), and some non-f32 fetches
are unreliable. Device-side complex math is fine — only the *transfers* are.

Workaround (this module):
* upload complex as an f32 (..., 2) pair and combine on device inside a jit;
* download via an on-device conversion to float32 (astype for small ints,
  bitcast for int32/uint32 exactness, real/imag pair for complex), then cast
  back on host.

On every other platform these helpers degrade to plain asarray/device_put.
All pipeline modules cross the boundary through `put()` / `get()`.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=1)
def _is_axon() -> bool:
    """True on the tunnel TPU backend. NOTE: the axon PJRT plugin's
    devices report platform "tpu" (only the registration name is
    "axon"), so match either — the converted-download routes are valid
    (just unnecessary) on any real TPU, while missing them on the tunnel
    makes every complex/int fetch die with UNIMPLEMENTED (this exact bug
    shipped until r5: bench only fetches f32, so it never noticed)."""
    import jax
    try:
        return jax.devices()[0].platform in ("axon", "tpu")
    except Exception:
        return False


@lru_cache(maxsize=1)
def _combine_fn():
    import jax
    import jax.numpy as jnp
    return jax.jit(lambda p: (p[..., 0] + 1j * p[..., 1]).astype(jnp.complex64))


@lru_cache(maxsize=4)
def _download_fn(kind: str):
    import jax
    import jax.numpy as jnp
    if kind == "complex":
        return jax.jit(lambda x: jnp.stack(
            [jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32)],
            axis=-1))
    if kind == "bitcast32":
        return jax.jit(lambda x: jax.lax.bitcast_convert_type(x, jnp.float32))
    return jax.jit(lambda x: x.astype(jnp.float32))


@lru_cache(maxsize=256)
def _fill_fn(shape: tuple, dtype_str: str, value: complex):
    import jax
    import jax.numpy as jnp
    dt = jnp.dtype(dtype_str)
    return jax.jit(lambda: jnp.full(shape, value, dt))


def _shape_tuple(shape) -> tuple:
    return (shape,) if isinstance(shape, int) else tuple(shape)


def _tracing() -> bool:
    try:
        import jax.core
        return not jax.core.trace_state_clean()
    except Exception:
        return False


def zeros(shape, dtype="complex64"):
    """Device zeros, safe as the FIRST device op of an axon process.

    Eager ``jnp.zeros(..., complex64)`` is a complex h2d constant transfer
    which permanently poisons every later device->host fetch on the tunnel
    (tools/axon_probe8.py `czeros` FAIL), and a JITTED fill as the
    process's first device op does the same (SMOKE_r05: the CLI pipeline
    path on axon died on exactly this). The only empirically safe opener
    is `put` (pairs+combine for complex) — so the eager path routes
    through it; under tracing this becomes a plain traced constant."""
    if _tracing():
        import jax.numpy as jnp
        return jnp.zeros(_shape_tuple(shape), jnp.dtype(str(np.dtype(dtype))))
    return put(np.zeros(_shape_tuple(shape), np.dtype(dtype)))


def ones(shape, dtype="complex64"):
    """See `zeros`."""
    if _tracing():
        import jax.numpy as jnp
        return jnp.ones(_shape_tuple(shape), jnp.dtype(str(np.dtype(dtype))))
    return put(np.ones(_shape_tuple(shape), np.dtype(dtype)))


def put(x: np.ndarray):
    """Host array -> device array (safe for complex64 on axon).

    Always uses the f32-pair route for complex64 (harmless elsewhere) and
    NEVER calls jax.devices() first: empirically, probing the axon backend
    before the first h2d transfer poisons all later d2h fetches in the
    process (tools/axon_probe7.py: `put` FAIL vs `combinefn` ok). The pairs
    are materialized as a contiguous copy — transferring a view of the
    complex buffer was also implicated."""
    import jax.numpy as jnp
    x = np.asarray(x)
    if x.dtype == np.complex64:
        pairs = np.ascontiguousarray(x).reshape(-1).view(np.float32) \
            .reshape(x.shape + (2,)).copy()
        return _combine_fn()(jnp.asarray(pairs))
    return jnp.asarray(x)


def get(x) -> np.ndarray:
    """Device array -> host np array (exact; safe on axon)."""
    if isinstance(x, np.ndarray):
        return x
    dt = np.dtype(x.dtype)
    if not _is_axon() or dt == np.float32:
        return np.asarray(x)
    if dt == np.complex64:
        pairs = np.asarray(_download_fn("complex")(x))
        return (pairs[..., 0] + 1j * pairs[..., 1]).astype(np.complex64)
    if dt in (np.dtype(np.int32), np.dtype(np.uint32)):
        f = np.asarray(_download_fn("bitcast32")(x))
        return f.view(np.uint32).astype(dt) if dt == np.dtype(np.uint32) \
            else f.view(np.int32)
    if dt in (np.dtype(np.uint8), np.dtype(np.int8), np.dtype(np.bool_),
              np.dtype(np.uint16), np.dtype(np.int16), np.dtype(np.bfloat16)
              if hasattr(np, "bfloat16") else np.dtype(np.int16)):
        f = np.asarray(_download_fn("astype")(x))
        return f.astype(dt)
    # fall back: try astype-f32 (may lose precision for 64-bit, which the
    # TPU path never produces — x64 is disabled)
    return np.asarray(_download_fn("astype")(x)).astype(dt)
