"""FEC codec tests: encode->corrupt->decode loopbacks + reference vectors."""

import numpy as np
import jax.numpy as jnp
import pytest

from satdump_tpu.ops.fec import convolutional as cc
from satdump_tpu.ops.fec import randomization, differential, rotation, crc
from satdump_tpu.ops.fec.reed_solomon import ReedSolomon, TO_DUAL, FROM_DUAL, gf_mul
from satdump_tpu.ops.fec.deframer import CCSDSDeframer, asm_bits, correlate_bits, CCSDS_ASM


# ---------------------------------------------------------------- viterbi --
def test_conv_encode_batch_matches_scalar(rng):
    bits = rng.integers(0, 2, 100).astype(np.uint8)
    np.testing.assert_array_equal(cc.conv_encode(bits), cc.conv_encode_batch(bits))


def _soft_from_bits(enc, flip_idx=(), noise=0.0, rng=None):
    soft = enc.astype(np.float32) * 255.0
    for i in flip_idx:
        soft[i] = 255.0 - soft[i]
    if noise and rng is not None:
        soft = np.clip(soft + rng.normal(0, noise * 255, soft.shape), 0, 255)
    return soft


def test_viterbi_clean_roundtrip(rng):
    bits = rng.integers(0, 2, 512).astype(np.uint8)
    enc = cc.conv_encode_batch(bits)
    soft = _soft_from_bits(enc).reshape(1, -1, 2)
    dec, _ = cc.viterbi_decode_block(jnp.asarray(soft))
    # traceback from arbitrary end state: allow the last few bits to differ
    np.testing.assert_array_equal(np.asarray(dec)[0, :-7], bits[:-7])


def test_viterbi_corrects_errors(rng):
    bits = rng.integers(0, 2, 1024).astype(np.uint8)
    enc = cc.conv_encode_batch(bits)
    # flip 5% of symbols
    flips = rng.choice(len(enc), size=len(enc) // 20, replace=False)
    soft = _soft_from_bits(enc, flips).reshape(1, -1, 2)
    dec, _ = cc.viterbi_decode_block(jnp.asarray(soft))
    errs = np.count_nonzero(np.asarray(dec)[0, :-7] != bits[:-7])
    assert errs == 0


def test_viterbi_batched_lanes(rng):
    B = 4
    bits = rng.integers(0, 2, (B, 256)).astype(np.uint8)
    enc = cc.conv_encode_batch(bits)
    soft = enc.astype(np.float32).reshape(B, -1, 2) * 255.0
    dec, _ = cc.viterbi_decode_block(jnp.asarray(soft))
    np.testing.assert_array_equal(np.asarray(dec)[:, :-7], bits[:, :-7])


def test_stream_viterbi_continuous(rng):
    """Streaming decode across block boundaries must equal one-shot decode."""
    bits = rng.integers(0, 2, 4096).astype(np.uint8)
    enc = cc.conv_encode_batch(bits)
    flips = rng.choice(len(enc), size=len(enc) // 30, replace=False)
    soft = _soft_from_bits(enc, flips)

    sv = cc.StreamViterbi(batch=1, traceback=96)
    outs = []
    pairs = soft.reshape(-1, 2)
    for i in range(0, len(pairs), 1024):
        outs.append(sv.decode(jnp.asarray(pairs[None, i:i + 1024])))
    dec = np.concatenate([o[0] for o in outs])
    # output delayed by traceback depth D: dec[D:] == bits[:-D]
    D = 96
    errs = np.count_nonzero(dec[D:] != bits[:-D])
    assert errs == 0


# ------------------------------------------------------------------- rand --
def test_ccsds_pn_first_bytes():
    # published CCSDS PN start (ref randomization.cpp table)
    expect = [0xFF, 0x48, 0x0E, 0xC0, 0x9A, 0x0D, 0x70, 0xBC]
    np.testing.assert_array_equal(randomization.CCSDS_PN[:8], expect)


def test_derand_involution(rng):
    data = rng.integers(0, 256, 1020).astype(np.uint8)
    once = randomization.derand_ccsds(data)
    twice = randomization.derand_ccsds(once)
    np.testing.assert_array_equal(twice, data)


# ------------------------------------------------------------------- diff --
def test_nrzm_roundtrip(rng):
    bits = rng.integers(0, 2, 1000).astype(np.uint8)
    enc, last = differential.nrzm_encode(bits)
    dec, _ = differential.nrzm_decode(enc)
    np.testing.assert_array_equal(dec, bits)
    # streaming: two halves equal whole
    e1, l1 = differential.nrzm_encode(bits[:500])
    e2, _ = differential.nrzm_encode(bits[500:], l1)
    np.testing.assert_array_equal(np.concatenate([e1, e2]), enc)
    d1, c1 = differential.nrzm_decode(enc[:500])
    d2, _ = differential.nrzm_decode(enc[500:], c1)
    np.testing.assert_array_equal(np.concatenate([d1, d2]), bits)


# --------------------------------------------------------------- rotation --
def test_rotation_roundtrip(rng):
    soft = rng.integers(-127, 128, 64).astype(np.int8)
    # 4 x 90deg = identity
    s = soft.copy()
    for _ in range(4):
        s = rotation.rotate_soft(s, rotation.PHASE_90)
    np.testing.assert_array_equal(s, np.clip(soft, -127, 127))
    # 180 twice = identity
    s = rotation.rotate_soft(rotation.rotate_soft(soft, rotation.PHASE_180), rotation.PHASE_180)
    np.testing.assert_array_equal(s, np.clip(soft, -127, 127))


# --------------------------------------------------------------------- rs --
def test_dual_basis_tables_match_reference():
    # spot values from reedsolomon.cpp ToDualBasis/FromDualBasis
    assert TO_DUAL[0] == 0x00 and TO_DUAL[1] == 0x7B and TO_DUAL[2] == 0xAF
    assert TO_DUAL[3] == 0xD4 and TO_DUAL[4] == 0x99 and TO_DUAL[16] == 0x86
    assert FROM_DUAL[0] == 0x00 and FROM_DUAL[1] == 0xCC and FROM_DUAL[2] == 0xAC
    np.testing.assert_array_equal(FROM_DUAL[TO_DUAL], np.arange(256))


def test_gf_mul_basics():
    assert gf_mul(0, 5) == 0 and gf_mul(7, 0) == 0
    assert gf_mul(1, 200) == 200
    # commutativity + distributivity spot check
    a, b, c = 37, 91, 200
    assert gf_mul(a, b) == gf_mul(b, a)
    assert gf_mul(a, b ^ c) == (int(gf_mul(a, b)) ^ int(gf_mul(a, c)))


@pytest.mark.parametrize("k", [223, 239])
def test_rs_clean_roundtrip(k, rng):
    rs = ReedSolomon(k=k)
    msg = rng.integers(0, 256, (3, k)).astype(np.uint8)
    cw = rs.encode(msg)
    # syndromes of a clean codeword must be zero
    assert not rs.syndromes(cw).any()
    dec, nerr = rs.decode(cw)
    np.testing.assert_array_equal(dec, cw)
    np.testing.assert_array_equal(nerr, 0)


@pytest.mark.parametrize("k,t", [(223, 16), (239, 8)])
def test_rs_corrects_errors(k, t, rng):
    rs = ReedSolomon(k=k)
    msg = rng.integers(0, 256, (4, k)).astype(np.uint8)
    cw = rs.encode(msg)
    bad = cw.copy()
    for r in range(4):
        pos = rng.choice(255, size=t, replace=False)
        bad[r, pos] ^= rng.integers(1, 256, t).astype(np.uint8)
    dec, nerr = rs.decode(bad)
    np.testing.assert_array_equal(dec, cw)
    assert (nerr == t).all()


def test_rs_detects_uncorrectable(rng):
    rs = ReedSolomon(k=223)
    msg = rng.integers(0, 256, (1, 223)).astype(np.uint8)
    cw = rs.encode(msg)
    bad = cw.copy()
    pos = rng.choice(255, size=40, replace=False)  # way beyond t=16
    bad[0, pos] ^= rng.integers(1, 256, 40).astype(np.uint8)
    dec, nerr = rs.decode(bad)
    assert nerr[0] == -1


def test_rs_interleaved_dual_basis(rng):
    rs = ReedSolomon(k=223)
    depth = 4
    msgs = rng.integers(0, 256, 223 * depth).astype(np.uint8)
    inter = rs.encode_interleaved(msgs, ccsds_dual=True, depth=depth)
    assert inter.shape == (255 * depth,)
    bad = inter.copy()
    bad[rng.choice(len(bad), 30, replace=False)] ^= 0x55
    out, nerr = rs.decode_interleaved(bad, ccsds_dual=True, depth=depth)
    np.testing.assert_array_equal(out, inter)
    assert (nerr >= 0).all()


# --------------------------------------------------------------- deframer --
def _make_bitstream(frames_bytes, pre=100, gap=0, rng=None):
    bits = [rng.integers(0, 2, pre).astype(np.uint8)] if pre else []
    for f in frames_bytes:
        bits.append(np.unpackbits(f))
        if gap:
            bits.append(rng.integers(0, 2, gap).astype(np.uint8))
    return np.concatenate(bits)


def test_correlate_bits():
    pat = asm_bits(0x1ACFFC1D)
    bits = np.concatenate([np.zeros(17, np.uint8), pat, np.ones(20, np.uint8)])
    dist = correlate_bits(bits, pat)
    assert dist[17] == 0
    assert np.count_nonzero(dist == 0) == 1


def test_deframer_basic(rng):
    cadu_bits = 1024 * 8
    payload = rng.integers(0, 256, (5, 1024)).astype(np.uint8)
    asm = np.array([0x1A, 0xCF, 0xFC, 0x1D], np.uint8)
    frames = [np.concatenate([asm, p[4:]]) for p in payload]
    stream = _make_bitstream(frames, pre=333, rng=rng)
    df = CCSDSDeframer(cadu_bits)
    out = df.work(stream)
    assert len(out) == 5
    for got, want in zip(out, frames):
        np.testing.assert_array_equal(got, want)


def test_deframer_streaming_and_inversion(rng):
    cadu_bits = 1024 * 8
    asm = np.array([0x1A, 0xCF, 0xFC, 0x1D], np.uint8)
    frames = [np.concatenate([asm, rng.integers(0, 256, 1020).astype(np.uint8)])
              for _ in range(6)]
    stream = _make_bitstream(frames, pre=55, rng=rng) ^ 1  # inverted polarity
    df = CCSDSDeframer(cadu_bits)
    out = []
    for i in range(0, len(stream), 3000):
        out += df.work(stream[i:i + 3000])
    assert len(out) == 6
    for got, want in zip(out, frames):
        np.testing.assert_array_equal(got, want)


# -------------------------------------------------------------------- crc --
def test_crc_ccitt_vector():
    # standard CRC-CCITT (FALSE) check value for "123456789"
    assert crc.crc_ccitt.compute(b"123456789") == 0x29B1


def test_viterbi_tiled_matches_full(rng):
    """Lane-parallel tiled Viterbi (the TPU throughput path) must match the
    full sequential decode at and below the operating noise level."""
    import jax.numpy as jnp
    from satdump_tpu.ops.fec import convolutional as cc

    T = 8192
    bits = rng.integers(0, 2, T).astype("uint8")
    enc = cc.conv_encode_batch(bits)
    for sigma, max_ber in ((60.0, 0.0), (100.0, 0.02)):
        soft = (enc.astype("float32") * 255
                + rng.normal(0, sigma, (2 * T,))).clip(0, 255).reshape(T, 2)
        tiled = cc.viterbi_decode_tiled(jnp.asarray(soft), seg=1024, ovl=128)
        full, _ = cc.viterbi_decode_block(jnp.asarray(soft))
        ber_t = (tiled != bits).mean()
        ber_f = (full[0] != bits).mean()
        assert ber_t <= max(float(ber_f) * 1.1, max_ber), (sigma, ber_t, ber_f)


def test_deframer_seam_counts_match_contiguous(rng):
    """ASM good/invalid counters must not double-count at block seams
    (frames split across work() calls)."""
    cadu_bits = 1024 * 8
    asm = np.array([0x1A, 0xCF, 0xFC, 0x1D], np.uint8)
    frames = [np.concatenate([asm, rng.integers(0, 256, 1020).astype(np.uint8)])
              for _ in range(20)]
    stream = _make_bitstream(frames, pre=55, rng=rng)

    df_one = CCSDSDeframer(cadu_bits)
    out_one = df_one.work(stream)

    df_blk = CCSDSDeframer(cadu_bits)
    out_blk = []
    # deliberately awkward block size: splits most frames mid-frame
    for i in range(0, len(stream), 5000):
        out_blk += df_blk.work(stream[i:i + 5000])
    assert len(out_one) == len(out_blk)
    assert df_one.st.d_good == df_blk.st.d_good
    assert df_one.st.d_invalid == df_blk.st.d_invalid
    assert df_one.st.state == df_blk.st.state


def test_manchester_roundtrip(rng):
    from satdump_tpu.ops.fec.codings_misc import (manchester_decode,
                                                  manchester_encode,
                                                  manchester_phase)
    bits = rng.integers(0, 2, 999, dtype=np.uint8)
    chips = manchester_encode(bits)
    assert manchester_phase(chips) == 0
    assert np.array_equal(manchester_decode(chips), bits)
    # offset stream: phase detector finds the half-bit slip
    assert manchester_phase(chips[1:]) == 1
    assert np.array_equal(manchester_decode(chips[1:], 1), bits[1:])


def test_lfsr_maximal_length():
    from satdump_tpu.ops.fec.codings_misc import LFSR
    # a 5-bit register admits a maximal (2^5-1) sequence for some primitive
    # feedback mask (lfsr.h: "maximal length ... if supplied with a
    # primitive polynomial") — find one and check the period
    best = 0
    best_mask = 1
    for mask in range(1, 32):
        l = LFSR(mask=mask, seed=1, reg_len=5)
        states = set()
        st = l.reg
        p = 0
        while st not in states:
            states.add(st)
            l.next_bit()
            st = l.reg
            p += 1
        if p > best:
            best, best_mask = p, mask
    assert best == 31
    # the output sequence repeats with the register period
    l = LFSR(mask=best_mask, seed=1, reg_len=5)
    seq = l.sequence(124)
    per = None
    for p in range(1, 63):
        if np.array_equal(seq[: len(seq) - p], seq[p:]):
            per = p
            break
    assert per is not None and per <= 31


def test_simple_deframer(rng):
    from satdump_tpu.ops.fec.codings_misc import SimpleDeframer
    frames = rng.integers(0, 2, (3, 160), dtype=np.uint8)
    sync = 0x1ACF
    sw = ((sync >> np.arange(15, -1, -1)) & 1).astype(np.uint8)
    for f in frames:
        f[:16] = sw
    stream = np.concatenate([rng.integers(0, 2, 37, dtype=np.uint8)] +
                            [f for f in frames])
    d = SimpleDeframer(sync, 16, 160, threshold=0)
    got = []
    got += d.work(stream[:200])
    got += d.work(stream[200:])
    assert len(got) == 3
    for g, f in zip(got, frames):
        assert np.array_equal(np.unpackbits(g), f)


def test_hdlc_deframer(rng):
    from satdump_tpu.ops.fec.codings_misc import HDLCDeframer
    from satdump_tpu.ops.fec.crc import crc_ccitt

    def make_frame(payload: np.ndarray) -> np.ndarray:
        crc = crc_ccitt.compute(payload)
        full = np.concatenate([payload,
                               [crc & 0xFF, crc >> 8]]).astype(np.uint8)
        # LSB-first bits + stuffing
        bits = np.unpackbits(full[:, None], axis=1)[:, ::-1].reshape(-1)
        out = []
        ones = 0
        for b in bits:
            out.append(b)
            ones = ones + 1 if b else 0
            if ones == 5:
                out.append(0)
                ones = 0
        flag = [0, 1, 1, 1, 1, 1, 1, 0]
        return np.asarray(flag + out + flag, np.uint8)

    payloads = [rng.integers(0, 256, n, dtype=np.uint8) for n in (20, 64)]
    stream = np.concatenate(
        [rng.integers(0, 2, 23, dtype=np.uint8)] +
        [make_frame(p) for p in payloads] +
        [rng.integers(0, 2, 17, dtype=np.uint8)])
    d = HDLCDeframer(length_min=5, length_max=256)
    got = d.work(stream)
    assert len(got) == 2
    for g, p in zip(got, payloads):
        assert np.array_equal(g, p)


def test_nrzi_nrzs_roundtrip(rng):
    from satdump_tpu.ops.fec import differential as dd
    bits = rng.integers(0, 2, 500, dtype=np.uint8)
    for enc, dec in [(dd.nrzi_encode, dd.nrzi_decode),
                     (dd.nrzs_encode, dd.nrzs_decode)]:
        e, st = enc(bits)
        o, _ = dec(e)
        assert np.array_equal(o, bits)
