"""Pallas resample kernel vs the XLA gather path (interpret mode on CPU).

Tolerance note: the kernel may pick an interpolator branch one step away
from the XLA path on exact rounding boundaries (1-ulp FMA difference in
position math). A one-branch step changes a symbol by <= the bank's
adjacent-branch delta — far below soft-symbol noise; the correctness
contract is bit-exactness after FEC (SURVEY.md §7)."""

import numpy as np
import jax.numpy as jnp

from satdump_tpu.ops import ffsync
from satdump_tpu.ops.firdes import mm_interpolator_bank
from satdump_tpu.ops.pallas.resample import resample_arith_grid


def test_kernel_matches_xla(rng):
    n = 1 << 14
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    bank = mm_interpolator_bank().astype(np.float32)
    ext = jnp.concatenate([jnp.zeros(7, jnp.complex64), jnp.asarray(x)])
    start, omega = np.float32(0.37), np.float32(2.0004)
    cap = int(n / 2.001) - 8
    pos = (start + np.arange(cap, dtype=np.float32) * omega).astype(np.float32)
    ref, valid = ffsync.ff_resample_at(ext, jnp.asarray(pos), bank, n)
    got = resample_arith_grid(ext, jnp.float32(start), jnp.float32(omega),
                              jnp.asarray(bank), out_cap=cap, sps_max=2.04,
                              interpret=True)
    ref = np.asarray(ref)[np.asarray(valid)]
    got = np.asarray(got)[np.asarray(valid)]
    err = np.abs(ref - got)
    # most symbols bit-identical; the rest within one branch step
    assert (err < 1e-5).mean() > 0.9, (err < 1e-5).mean()
    assert err.max() < 0.1, err.max()


def test_kernel_skew(rng):
    """Nonzero clock skew: sources drift across tile boundaries."""
    n = 1 << 14
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    bank = mm_interpolator_bank().astype(np.float32)
    ext = jnp.concatenate([jnp.zeros(7, jnp.complex64), jnp.asarray(x)])
    start, omega = np.float32(1.8), np.float32(2.0 * (1.0 + 0.008))
    cap = int(n / (2.0 * 1.01)) - 8
    pos = (start + np.arange(cap, dtype=np.float32) * omega).astype(np.float32)
    ref, valid = ffsync.ff_resample_at(ext, jnp.asarray(pos), bank, n)
    got = resample_arith_grid(ext, jnp.float32(start), jnp.float32(omega),
                              jnp.asarray(bank), out_cap=cap, sps_max=2.04,
                              interpret=True)
    ref = np.asarray(ref)[np.asarray(valid)]
    got = np.asarray(got)[np.asarray(valid)]
    err = np.abs(ref - got)
    assert (err < 1e-5).mean() > 0.9
    assert err.max() < 0.1
