"""Pallas register-exchange Viterbi kernel vs the XLA reference decoder.

The kernel (ops/pallas/viterbi.py) is the TPU fast path of the fused CADU
chain; on CPU it runs in interpret mode and must be BIT-IDENTICAL to
convolutional.viterbi_decode_tiled_re (same RE_DELAY truncation, same
lane/halo tiling)."""

import jax.numpy as jnp
import numpy as np
import pytest

from satdump_tpu.ops.fec import convolutional as cc
from satdump_tpu.ops.pallas.viterbi import viterbi_re_pallas


def _soft_from_bits(bits, rng, noise=12.0):
    enc = cc.conv_encode_batch(bits)
    soft = np.where(enc > 0, 235.0, 20.0) + rng.normal(0, noise, enc.shape)
    return np.clip(soft, 0, 255).astype(np.float32).reshape(-1, 2)


@pytest.mark.parametrize("nbits,noise", [(4096, 0.0), (8192, 12.0),
                                         (8192, 40.0)])
def test_pallas_matches_xla_re(rng, nbits, noise):
    bits = rng.integers(0, 2, nbits).astype(np.uint8)
    soft = _soft_from_bits(bits, rng, noise)
    ref = np.asarray(cc.viterbi_decode_tiled_re(
        jnp.asarray(soft), seg=1024, ovl=128, unroll=1))
    got = np.asarray(viterbi_re_pallas(
        jnp.asarray(soft), seg=1024, ovl=128, interpret=True))
    np.testing.assert_array_equal(got, ref)
    if noise <= 12.0:
        assert (ref != bits).mean() == 0.0


def test_pallas_nonmultiple_lane_count(rng):
    """L=5 lanes (not a multiple of 128): the lane padding must not leak
    into the decoded stream."""
    nbits = 5 * 1024
    bits = rng.integers(0, 2, nbits).astype(np.uint8)
    soft = _soft_from_bits(bits, rng, 10.0)
    got = np.asarray(viterbi_re_pallas(
        jnp.asarray(soft), seg=1024, ovl=128, interpret=True))
    assert got.shape == (nbits,)
    assert (got != bits).mean() == 0.0


def test_pallas_erasure_padding(rng):
    """Erasure (128) tail — the CADU chain pads chunks this way."""
    nbits = 2048
    bits = rng.integers(0, 2, nbits).astype(np.uint8)
    soft = _soft_from_bits(bits, rng, 0.0)
    soft = np.concatenate(
        [soft, np.full((1024, 2), 128.0, np.float32)])
    ref = np.asarray(cc.viterbi_decode_tiled_re(
        jnp.asarray(soft), seg=1024, ovl=128, unroll=1))
    got = np.asarray(viterbi_re_pallas(
        jnp.asarray(soft), seg=1024, ovl=128, interpret=True))
    np.testing.assert_array_equal(got, ref)
    assert (got[:nbits] != bits).mean() == 0.0
