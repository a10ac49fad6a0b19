"""CCSDS turbo codes (131.0-B): permutation/trellis construction, batched
max-log-MAP decode at representative Eb/N0, and the ccsds_turbo_decoder
module loopback (ASM correlator + batched decode)."""

import numpy as np
import pytest

from satdump_tpu.ops.fec.turbo import CCSDSTurbo, ccsds_permutation


def test_permutation_is_a_permutation():
    for base in (223, 446, 892, 1115):
        pi = ccsds_permutation(base)
        assert sorted(pi.tolist()) == list(range(base * 8))


def test_codeword_lengths_match_reference():
    # d_codeword_size table from module_ccsds_turbo_decoder.cpp
    expect = {("1/2", 223): 3576, ("1/3", 223): 5364, ("1/4", 223): 7152,
              ("1/6", 223): 10728, ("1/6", 1115): 53544,
              ("1/2", 1115): 17848}
    for (rate, base), n in expect.items():
        t = CCSDSTurbo(base, rate)
        assert t.encoded_length == n, (rate, base)


def _awgn_llr(rng, cw, ebn0_db, rate_actual):
    x = 2.0 * cw.astype(np.float32) - 1.0
    sigma = np.sqrt(1.0 / (2 * rate_actual * 10 ** (ebn0_db / 10)))
    y = x + sigma * rng.standard_normal(cw.shape)
    return (2 * y / sigma ** 2).astype(np.float32)


@pytest.mark.parametrize("rate,ebn0", [("1/2", 2.0), ("1/3", 1.5),
                                       ("1/4", 1.0), ("1/6", 0.5)])
def test_turbo_decode_awgn(rng, rate, ebn0):
    t = CCSDSTurbo(223, rate)
    frames = rng.integers(0, 256, (4, 223), dtype=np.uint8)
    bits = np.unpackbits(frames, axis=-1)
    cw = t.encode_bits(bits)
    llr = _awgn_llr(rng, cw, ebn0, t.info_length / t.encoded_length)
    dec, _ = t.decode(llr, iterations=8)
    assert (dec == bits).all(), f"turbo {rate} failed at {ebn0} dB"


def test_turbo_encode_systematic(rng):
    """Component 0 of the upper code is the systematic bit stream."""
    t = CCSDSTurbo(223, "1/3")
    bits = rng.integers(0, 2, (1, t.info_length), dtype=np.uint8)
    cw = t.encode_bits(bits)
    sys = cw[0].reshape(-1, 3)[: t.info_length, 0]
    assert np.array_equal(sys, bits[0])


@pytest.mark.slow
def test_turbo_decoder_module(tmp_path, rng):
    """soft stream with ASM-framed randomized turbo codewords -> frames
    bit-exact, CRC accounted (ref module process loop)."""
    from satdump_tpu.ops.fec.crc import crc_ccitt
    from satdump_tpu.ops.fec.randomization import derand_ccsds_soft_bits
    from satdump_tpu.pipeline.modules.ccsds.turbo_decoder import (
        TURBO_ASM, CCSDSTurboDecoderModule, _asm_bits)

    base, rate = 223, "1/2"
    t = CCSDSTurbo(base, rate)
    asm_val, asm_len = TURBO_ASM[rate]
    frames = rng.integers(0, 256, (6, base), dtype=np.uint8)
    for fr in frames:  # valid CRC-16 in the last two bytes
        c = crc_ccitt.compute(fr[: base - 2])
        fr[base - 2] = c >> 8
        fr[base - 1] = c & 0xFF
    bits = np.unpackbits(frames, axis=-1)
    cw = t.encode_bits(bits)
    cw = derand_ccsds_soft_bits(cw)      # channel randomization
    stream_bits = np.concatenate(
        [np.concatenate([_asm_bits(asm_val, asm_len), c]) for c in cw])
    soft = (stream_bits.astype(np.int16) * 180 - 90).astype(np.int8)
    # noise + a random prefix offset
    soft = np.concatenate([rng.integers(-50, 50, 777).astype(np.int8), soft])
    soft = np.clip(soft + rng.normal(0, 12, len(soft)), -127, 127
                   ).astype(np.int8)
    path = tmp_path / "x.soft"
    soft.tofile(path)

    mod = CCSDSTurboDecoderModule(str(path), str(tmp_path / "o"), {
        "constellation": "bpsk", "turbo_base": base, "turbo_rate": rate})
    mod.process()
    got = np.fromfile(mod.d_output_file, np.uint8).reshape(-1, base + 4)
    assert len(got) >= 5
    assert mod.stats["crc_ok"] >= 5
    sent = {f.tobytes() for f in frames}
    assert all(g[4:].tobytes() in sent for g in got)
