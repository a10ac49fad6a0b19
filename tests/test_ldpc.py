"""LDPC min-sum decoder tests: encode (GF(2) systematic) -> AWGN-ish LLRs ->
decode; parity detection; batch lanes."""

import numpy as np

from satdump_tpu.ops.fec.ldpc import (MinSumDecoder, SystematicEncoder,
                                      code_from_dense, make_regular_code)


def test_gf2_encoder_satisfies_parity(rng):
    code = make_regular_code(96, 3, 6, seed=1)
    enc = SystematicEncoder(code)
    msg = rng.integers(0, 2, (16, enc.k)).astype(np.uint8)
    cw = enc.encode(msg)
    assert ((cw @ code.H.T) % 2 == 0).all()


def test_minsum_corrects_errors(rng):
    code = make_regular_code(96, 3, 6, seed=1)
    enc = SystematicEncoder(code)
    dec = MinSumDecoder(code, iters=30)
    B = 8
    msg = rng.integers(0, 2, (B, enc.k)).astype(np.uint8)
    cw = enc.encode(msg)
    # BPSK LLRs: +4 for bit 0, -4 for bit 1, with a few flipped bits
    llr = np.where(cw == 0, 4.0, -4.0).astype(np.float32)
    for b in range(B):
        flips = rng.choice(code.n, 4, replace=False)
        llr[b, flips] = -llr[b, flips] * 0.8
    bits, ok = dec.decode(llr)
    assert ok.all(), ok
    np.testing.assert_array_equal(bits, cw)


def test_minsum_flags_failures(rng):
    code = make_regular_code(96, 3, 6, seed=1)
    enc = SystematicEncoder(code)
    dec = MinSumDecoder(code, iters=8)
    msg = rng.integers(0, 2, (2, enc.k)).astype(np.uint8)
    cw = enc.encode(msg)
    llr = np.where(cw == 0, 1.0, -1.0).astype(np.float32)
    # destroy half the first frame
    llr[0, : code.n // 2] = -llr[0, : code.n // 2]
    bits, ok = dec.decode(llr)
    assert not ok[0]
    assert ok[1]
    np.testing.assert_array_equal(bits[1], cw[1])


def test_code_from_dense_roundtrip():
    H = np.array([[1, 1, 0, 1, 0, 0],
                  [0, 1, 1, 0, 1, 0],
                  [1, 0, 1, 0, 0, 1]], np.uint8)
    code = code_from_dense(H)
    assert code.n == 6 and code.m == 3 and code.dc_max == 3
    np.testing.assert_array_equal(code.H, H)


def test_numpy_fallback_matches_device(rng):
    """The NumPy min-sum fallback (used when the axon remote compiler
    crashes on the device graph, tools/tpu_smoke.py) must match the
    jitted formulation bit-for-bit."""
    from satdump_tpu.ops.fec.ldpc import (MinSumDecoder, SystematicEncoder,
                                          make_regular_code)
    code = make_regular_code(256, 3, 6, seed=1)
    enc = SystematicEncoder(code)
    dec = MinSumDecoder(code, iters=12)
    bits = rng.integers(0, 2, (4, enc.k)).astype(np.uint8)
    cw = enc.encode(bits)
    llr = np.where(cw > 0, -4.0, 4.0) + rng.normal(0, 1.2, cw.shape)
    llr = llr.astype(np.float32)
    b_dev, ok_dev = dec.decode(llr)
    b_np, ok_np = dec._decode_numpy(llr)
    np.testing.assert_array_equal(b_dev, b_np)
    np.testing.assert_array_equal(ok_dev, ok_np)
    assert ok_dev.any()
