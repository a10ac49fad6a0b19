"""Multi-chip scale-out: channel × time-block sharding over a device mesh.

The reference has *no* mechanism to split one contiguous sample stream across
machines (SURVEY.md §5 "long-context"): its concurrency is thread-per-block on
one host. Here scale-out is native: a 2D ``jax.sharding.Mesh`` with axes

* ``ch`` — independent channels/VFOs (trivially parallel, like the reference's
  VFO splitter `common/dsp/path/splitter_vfo.h` but across chips), and
* ``t``  — consecutive time-blocks of ONE stream, with an overlap-save *halo*:
  each shard receives the tail of its predecessor via ``ppermute`` over ICI,
  runs the demod on [halo | own block] so filter history, AGC, carrier and
  timing estimators warm up inside the halo, and emits only symbols whose
  sample position falls in its owned region. Feedback-free sync (ops/ffsync)
  makes this exact up to estimator noise; bit-exactness is restored after FEC
  (the BASELINE correctness bound).

Phase/ambiguity stitching across t-shards is the deframer's job, exactly as it
is between sequential blocks in the single-chip path (rotated-ASM search).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from satdump_tpu.ops import ffsync
from satdump_tpu.ops.fec import convolutional as cc
from satdump_tpu.ops.firdes import mm_interpolator_bank, root_raised_cosine


def make_mesh(n_devices: int | None = None, n_ch: int | None = None) -> Mesh:
    """Build a (ch, t) mesh over the available devices. Channels get the
    smaller axis (most deployments decode a few channels at very high rates)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n_ch is None:
        n_ch = 2 if n % 2 == 0 and n > 2 else 1
    n_t = n // n_ch
    arr = np.array(devs[:n]).reshape(n_ch, n_t)
    return Mesh(arr, axis_names=("ch", "t"))


def _halo_exchange_prev(x: jnp.ndarray, halo: int, axis: str, nt: int
                        ) -> jnp.ndarray:
    """Give every t-shard the last `halo` samples of its predecessor
    (zeros for the first shard). x: (..., n) local block."""
    tail = x[..., -halo:]
    perm = [(i, (i + 1) % nt) for i in range(nt)]
    prev_tail = jax.lax.ppermute(tail, axis, perm)
    idx = jax.lax.axis_index(axis)
    return jnp.where(idx == 0, jnp.zeros_like(prev_tail), prev_tail)


def build_sharded_qpsk_step(mesh: Mesh, *, sps: float, block: int,
                            halo: int = 8192, rrc_alpha: float = 0.5,
                            rrc_ntaps: int = 31, order: int = 4,
                            sub_phase: int = 1024, sub_timing: int = 2048):
    """Returns a jitted function ``step(x) -> (soft, valid, bits)`` where

    * x: (CH, T·block) complex64, sharded P("ch", "t") — CH channel streams,
      each split into T time-shards of `block` samples;
    * soft: per-shard demodulated int8 softs (interleaved IQ), fixed capacity
      with a valid mask, sharded P("t", "ch", ...);
    * bits: per-channel Viterbi k=7 r=1/2 decoded bits for the shard's
      symbols (lane-parallel ACS — each (ch,t) shard decodes its segment).

    Seam correctness (the new design territory from SURVEY.md §5):

    1. *Timing*: every shard estimates the symbol grid on its own
       [halo | block] window; since all shards observe the same underlying
       clock, their grids coincide on the same global instants (within
       estimator noise ≪ T_sym/2). Ownership is a global-coordinate window —
       shard i emits symbols at positions [halo−D, halo+block−D) of its local
       window (D = interp taps, keeping the right edge inside available
       data) — so the union over shards has no duplicated/dropped symbols.
    2. *Carrier*: each shard's V&V phase leaves an arbitrary 2π/M rotation.
       Both sides of a seam demodulate the overlap samples; correlating the
       phase-corrected baseband (ppermute of the tail over ICI) measures the
       relative rotation, quantized to the constellation grid; an all_gather
       + prefix-sum makes every shard's rotation consistent with shard 0.

    This is the framework's "full training step" analogue: demod + FEC over
    the whole mesh in one XLA program, halos and seam-stitching riding ICI.
    """
    rrc = root_raised_cosine(1.0, sps, 1.0, rrc_alpha, rrc_ntaps)  # host np const
    bank = mm_interpolator_bank()  # host np const
    nfilt, ntaps = bank.shape
    n_ext = halo + block
    cap = int(np.ceil(block / (sps * 0.99))) + 4
    D = float(ntaps)              # ownership boundary shift (samples)
    W = min(halo // 2, 4096)      # seam-overlap correlation window
    period = 2 * np.pi / order
    theta0 = float(np.pi / 4) if order == 4 else 0.0
    nbits = cap - 8
    nt = mesh.shape["t"]

    def shard_fn(x):
        # local view of the global (CH, T·block) array: (local_ch, block)
        xloc = x.reshape(-1, block)
        ext = jnp.concatenate(
            [_halo_exchange_prev(xloc, halo, "t", nt), xloc], axis=-1)

        def demod_one(xi):
            # block AGC + matched filter (overlap-save FFT over the window)
            g = 1.0 / jnp.maximum(jnp.mean(jnp.abs(xi)), 1e-12)
            xi = xi * g.astype(xi.dtype)
            nfft = 1 << int(np.ceil(np.log2(n_ext + rrc.shape[0] - 1)))
            xf = jnp.fft.ifft(jnp.fft.fft(xi, nfft)
                              * jnp.fft.fft(rrc.astype(jnp.float32), nfft)
                              )[: n_ext].astype(jnp.complex64)
            # carrier: per-shard CFO + V&V phase (ambiguity fixed at seams)
            f = ffsync.cfo_estimate(xf, order, suppress_nyquist_image=(sps < 2.1))
            xc = ffsync.cfo_correct(xf, f)
            ph_t, _ = ffsync.vv_phase_track(xc, order, sub_phase,
                                            const_rotation=theta0)
            xp = xc * jnp.exp(-1j * ph_t).astype(xc.dtype)
            # timing: global-consistent grid, own window [halo−D, halo+block−D)
            tau0, skew = ffsync.om_timing_fit(xp, sps, sub_timing)
            omega = sps * (1.0 + skew)
            k0 = jnp.ceil((halo - D - tau0) / omega)
            first = tau0 + k0 * omega       # local pos of my first symbol
            pos = first + jnp.arange(cap, dtype=jnp.float32) * omega
            padded = jnp.concatenate([jnp.zeros((ntaps - 1,), xp.dtype), xp])
            syms, v_interp = ffsync.ff_resample_at(padded, pos, bank, n_ext)
            return syms, v_interp, pos, first, xp

        syms, v_interp, pos, first, xp = jax.vmap(demod_one)(ext)

        # --- seam symbol-count exactness ----------------------------------
        # Each shard's grid is an independent estimate; deciding ownership
        # from one's OWN grid alone can drop/duplicate ONE symbol when the
        # two grids straddle the boundary by ±ε (VERDICT r4 weak #2: 11/12
        # CADUs, one lost at a seam). Make the boundary decision single-
        # sourced: the SUCCESSOR's first emitted symbol position (global
        # coords) is ppermuted backwards, and the predecessor emits strictly
        # below it — the union over shards is then exactly one symbol per
        # true grid point, no coin-flips at seams.
        idx_t = jax.lax.axis_index("t")
        g_off = idx_t.astype(jnp.float32) * block - halo  # local -> global
        first_g = first + g_off                           # (local_ch,)
        nxt_first_g = jax.lax.ppermute(
            first_g, "t", [(i, (i - 1) % nt) for i in range(nt)])
        # Emit strictly below the successor's first symbol, excluding my
        # grid's copy of THAT symbol: the two shards' grids agree only to
        # estimator noise ε, so the exclusion margin must be ≫ ε and < one
        # symbol — half a symbol period. The last shard has no successor
        # and emits to the static stream edge.
        cut_g = jnp.where(idx_t == nt - 1,
                          jnp.full_like(nxt_first_g, nt * block - D),
                          nxt_first_g - 0.5 * sps)
        valid = v_interp & (pos + g_off < cut_g[:, None])

        # --- seam phase stitching -----------------------------------------
        # overlap: my ext[halo−W:halo] == predecessor's ext[-W:]
        prev_tail = jax.lax.ppermute(
            xp[:, -W:], "t", [(i, (i + 1) % nt) for i in range(nt)])
        rel = jnp.sum(xp[:, halo - W: halo] * jnp.conj(prev_tail), axis=-1)
        alpha = jnp.round(jnp.angle(rel) / period) * period  # (local_ch,)
        alphas = jax.lax.all_gather(alpha, "t")              # (nt, local_ch)
        alphas = alphas.at[0].set(0.0)                       # shard 0 = ref
        rot = jnp.cumsum(alphas, axis=0)[jax.lax.axis_index("t")]
        syms = syms * jnp.exp(-1j * rot)[:, None].astype(syms.dtype)

        # soft int8 (x100 interleaved IQ, module_psk_demod.cpp:203-213)
        soft = jnp.stack([jnp.real(syms), jnp.imag(syms)], axis=-1)
        soft = jnp.clip(soft * 100.0, -127, 127).astype(jnp.int8)

        # lane-parallel Viterbi over channels: pairs of softs -> bits
        s2 = soft.reshape(soft.shape[0], -1)[:, : 2 * nbits]
        u8 = (s2.astype(jnp.float32) + 128.0).reshape(soft.shape[0], nbits, 2)
        pm = jnp.zeros((soft.shape[0], cc.NSTATES), jnp.float32)
        pm, dec = cc.viterbi_acs(pm, u8)
        bits = cc.viterbi_traceback(pm, dec)

        return (soft.reshape(1, soft.shape[0], -1),
                valid.reshape(1, valid.shape[0], -1),
                bits.reshape(1, bits.shape[0], -1))

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=P("ch", "t"),
                       out_specs=(P("t", "ch", None), P("t", "ch", None),
                                  P("t", "ch", None)),
                       check_vma=False)
    return jax.jit(fn)


def shard_input(x: np.ndarray, mesh: Mesh) -> jax.Array:
    """Place a (CH, N) host array onto the mesh as P('ch','t')."""
    return jax.device_put(x, NamedSharding(mesh, P("ch", "t")))
