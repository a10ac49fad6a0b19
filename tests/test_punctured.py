"""Punctured Viterbi (rates 2/3..7/8), generic soft correlator, and the
simple-PSK decoder module — loopback tests (ref viterbi_punc.h / depunc.h,
generic_correlator.cpp, module_ccsds_simple_psk_decoder.cpp)."""

import numpy as np
import pytest

from satdump_tpu import sim
from satdump_tpu.ops.fec import convolutional as cc
from satdump_tpu.ops.fec.correlator import CorrelatorGeneric
from satdump_tpu.ops.fec.deframer import asm_bits, CCSDS_ASM
from satdump_tpu.ops.fec.depuncture import Depuncturer, puncture, ERASE
from satdump_tpu.ops.fec.differential import QPSKDiff
from satdump_tpu.ops.fec.rotation import PHASE_0, PHASE_90, PHASE_180, rotate_soft
from satdump_tpu.pipeline.modules.ccsds.viterbi_sync import Viterbi12Sync

RATES = ["2/3", "3/4", "5/6", "7/8"]


# ------------------------------------------------------------ depuncture --
@pytest.mark.parametrize("rate", RATES)
def test_depunc_static_inverts_puncture(rate, rng):
    """puncture() then depunc_static() must restore every surviving value
    in its original position, with ERASE everywhere else."""
    d = Depuncturer(rate)
    full = rng.integers(0, 256, 480).astype(np.uint8)
    full[full == ERASE] = 0
    for shift in range(d.numstates * 2):
        punc = puncture(full, rate, shift)
        out = d.depunc_static(punc, shift)
        kept = out != ERASE
        # values at non-erasure positions equal the original stream prefix
        pre = 1 if shift > d.numstates - 1 else 0
        np.testing.assert_array_equal(out[kept], full[pre:len(out)][kept[pre:]])


@pytest.mark.parametrize("rate", RATES)
def test_depunc_cont_matches_static(rate, rng):
    """Streaming depuncture over ragged blocks == one-shot static, up to the
    carried odd tail."""
    d = Depuncturer(rate)
    data = rng.integers(0, 256, 1001).astype(np.uint8)
    for shift in range(d.numstates * 2):
        ref = Depuncturer(rate).depunc_static(data, shift)
        d2 = Depuncturer(rate)
        d2.set_shift(shift)
        parts = []
        i = 0
        for blk in (7, 64, 1, 333, 500, 96):
            parts.append(d2.depunc_cont(data[i:i + blk]))
            i += blk
        out = np.concatenate(parts)
        assert len(out) % 2 == 0
        np.testing.assert_array_equal(out, ref[:len(out)])


@pytest.mark.parametrize("rate", RATES)
def test_punctured_rate_ratio(rate, rng):
    """len(punctured)/len(unpunctured) must equal the nominal rate ratio."""
    k, n = map(int, rate.split("/"))
    full = rng.integers(0, 256, 2 * 8 * 21 * 10).astype(np.uint8)
    punc = puncture(full, rate)
    # rate k/n from a mother 1/2 code: n coded bits survive per k info bits,
    # versus 2k unpunctured => ratio n/(2k)
    np.testing.assert_allclose(len(punc) / len(full), n / (2 * k), rtol=0.02)


# ---------------------------------------------------- punctured viterbi --
@pytest.mark.parametrize("rate", RATES)
def test_viterbi_punctured_loopback(rate, rng):
    """bits -> conv encode -> puncture -> BPSK softs (+phase flip) ->
    Viterbi12Sync(rate) recovers the bits after lock."""
    bits = rng.integers(0, 2, 16384).astype(np.uint8)
    enc = cc.conv_encode_batch(bits)
    punc = puncture(enc, rate)
    soft = sim.symbols_to_soft_int8(punc)
    soft = rotate_soft(soft, PHASE_180, False)  # decoder must search this out
    vit = Viterbi12Sync(0.35, 10, [PHASE_0, PHASE_180], rate=rate)
    out = vit.work(soft)
    assert vit.getState() == 1, f"no lock at rate {rate}"
    assert len(out) > len(bits) * 0.9
    # find alignment (traceback delay drops leading bits)
    sig = np.packbits(bits[100:164]).tobytes()
    hay = np.packbits(out).tobytes()
    # bit-level alignment search
    matched = False
    for d in range(200):
        if len(out) > d + 2000 and np.array_equal(out[d:d + 2000], bits[100:2100]):
            matched = True
            break
    # alignment search over the first bits of `out` against bits[offset]
    if not matched:
        for off in range(300):
            if np.array_equal(out[:2000], bits[off:off + 2000]):
                matched = True
                break
    assert matched, f"decoded stream misaligned at rate {rate} (sig={sig[:8]!r}, hay={hay[:8]!r})"


@pytest.mark.parametrize("rate", ["3/4", "7/8"])
def test_viterbi_punctured_with_errors(rate, rng):
    """Punctured decode still corrects sparse channel errors."""
    bits = rng.integers(0, 2, 16384).astype(np.uint8)
    punc = puncture(cc.conv_encode_batch(bits), rate)
    soft = sim.symbols_to_soft_int8(punc).astype(np.int16)
    flips = rng.choice(len(soft), size=len(soft) // 200, replace=False)
    soft[flips] = -soft[flips]
    vit = Viterbi12Sync(0.35, 10, [PHASE_0], rate=rate)
    out = vit.work(soft.astype(np.int8))
    assert vit.getState() == 1
    # output trails the input by the traceback depth: align out[d:] to bits
    best = min(np.mean(out[d:d + 4000] != bits[:4000]) for d in range(300))
    assert best < 1e-3, f"decoded BER {best} at rate {rate}"


# ------------------------------------------------------------ correlator --
@pytest.mark.parametrize("modulation,phase_true", [
    ("bpsk", PHASE_0), ("bpsk", PHASE_180),
    ("qpsk", PHASE_0), ("qpsk", PHASE_90), ("qpsk", PHASE_180),
])
def test_correlator_finds_syncword(modulation, phase_true, rng):
    sync = asm_bits(CCSDS_ASM, 32)
    if modulation == "qpsk":
        sync = np.concatenate([sync, sync])[:64]  # 64 softs for qpsk frame sync
    corr = CorrelatorGeneric(modulation, sync)
    L = corr.syncword_length
    n = 4096
    pos_true = 1234
    noise = rng.integers(-40, 40, n).astype(np.int8)
    replica = np.where(sync > 0, 100, -100).astype(np.int8)
    # embed the syncword, then rotate the whole stream by the test phase
    buf = noise.copy()
    buf[pos_true:pos_true + L] = replica
    # rotating by phase_true means the correlator should *report* phase_true
    # as the correction to apply (rotate_soft is its own inverse pairing)
    inv = {PHASE_0: PHASE_0, PHASE_90: PHASE_90 if modulation == "qpsk" else PHASE_0,
           PHASE_180: PHASE_180}[phase_true]
    rot = rotate_soft(buf, _inverse_phase(phase_true), False)
    pos, phase, swap, cor = corr.correlate(rot)
    assert pos == pos_true
    assert cor > 0.7
    if modulation == "bpsk" or phase_true in (PHASE_0, PHASE_180):
        assert phase == phase_true
    assert swap is False or swap == 0


def _inverse_phase(ph):
    from satdump_tpu.ops.fec.rotation import PHASE_0, PHASE_90, PHASE_180, PHASE_270
    return {PHASE_0: PHASE_0, PHASE_90: PHASE_270,
            PHASE_180: PHASE_180, PHASE_270: PHASE_90}[ph]


# ------------------------------------------------------------- qpsk diff --
def qpsk_diff_encode(bits: np.ndarray, swap: bool = True) -> np.ndarray:
    """TX inverse of diff::QPSKDiff for the loopback test: produce the symbol
    stream whose differential decode yields `bits`."""
    n = len(bits) // 2
    if swap:
        ou = (bits[1:n * 2:2] << 1) | bits[0:n * 2:2]
    else:
        ou = (bits[0:n * 2:2] << 1) | bits[1:n * 2:2]
    syms = np.zeros(n + 2, np.uint8)  # two priming symbols (dropped at RX)
    for i, o in enumerate(ou):
        prev = syms[i + 1]
        # invert the decode mapping by brute force over 4 candidates
        for cand in range(4):
            xin_1, yin_1 = prev & 2, prev & 1
            xin, yin = cand & 2, cand & 1
            if ((xin >> 1) ^ yin) == 1:
                val = ((yin_1 ^ yin) << 1) + ((xin_1 ^ xin) >> 1)
            else:
                val = (xin_1 ^ xin) + (yin_1 ^ yin)
            if val == o:
                syms[i + 2] = cand
                break
        else:
            raise AssertionError("no candidate symbol")
    return syms


@pytest.mark.parametrize("swap", [True, False])
def test_qpsk_diff_roundtrip(swap, rng):
    bits = rng.integers(0, 2, 2000).astype(np.uint8)
    syms = qpsk_diff_encode(bits, swap)
    dec = QPSKDiff(swap=swap)
    # feed in ragged blocks to exercise the carry
    out = np.concatenate([dec.work(syms[:3]), dec.work(syms[3:700]),
                          dec.work(syms[700:701]), dec.work(syms[701:])])
    np.testing.assert_array_equal(out, bits[:len(out)])
    assert len(out) == len(bits)


# ----------------------------------------------------- simple psk module --
def _run_simple_psk(tmp_path, soft, params):
    from satdump_tpu.pipeline.module import module_registry, register_all_modules
    register_all_modules()
    mod_cls = module_registry.get("ccsds_simple_psk_decoder")
    soft_path = tmp_path / "test.soft"
    soft.astype(np.int8).tofile(soft_path)
    mod = mod_cls(str(soft_path), str(tmp_path / "out"), params)
    mod.process()
    return np.fromfile(mod.d_output_file, np.uint8).reshape(-1, 1024)


def test_simple_psk_bpsk_loopback(tmp_path, rng):
    cadus = sim.make_cadus(12, rng)
    bits = sim.encode_cadu_stream_uncoded(cadus)
    soft = sim.symbols_to_soft_int8(bits)
    out = _run_simple_psk(tmp_path, soft, {
        "constellation": "bpsk", "cadu_size": 8192, "rs_i": 4,
        "derandomize": True,
    })
    assert len(out) >= 10
    # deframer locks after a few frames; every emitted frame must match
    matches = sum(any(np.array_equal(o, c) for c in cadus) for o in out)
    assert matches >= len(out) - 2


def test_simple_psk_bpsk_inverted_nrzm(tmp_path, rng):
    """Polarity-inverted stream + NRZ-M differential coding."""
    cadus = sim.make_cadus(12, rng)
    bits = sim.encode_cadu_stream_uncoded(cadus, nrzm=True)
    soft = -sim.symbols_to_soft_int8(bits)  # NRZ-M is polarity-immune
    out = _run_simple_psk(tmp_path, soft, {
        "constellation": "bpsk", "cadu_size": 8192, "rs_i": 4,
        "derandomize": True, "nrzm": True,
    })
    matches = sum(any(np.array_equal(o, c) for c in cadus) for o in out)
    assert matches >= 8


def test_simple_psk_qpsk_dual_deframer(tmp_path, rng):
    """QPSK without differential coding: one of the two deframers (0/90 deg)
    must lock, under an unknown 90-degree constellation rotation."""
    cadus = sim.make_cadus(12, rng)
    bits = sim.encode_cadu_stream_uncoded(cadus)
    # map bit pairs to QPSK softs with the module's expected order:
    # out[0::2]=q_bit, out[1::2]=i_bit  =>  i soft carries bits[1::2]
    n = len(bits) // 2
    soft = np.zeros(n * 2, np.int8)
    soft[0::2] = (bits[1:n * 2:2].astype(np.int16) * 200 - 100).astype(np.int8)
    soft[1::2] = (bits[0:n * 2:2].astype(np.int16) * 200 - 100).astype(np.int8)
    out = _run_simple_psk(tmp_path, soft, {
        "constellation": "qpsk", "cadu_size": 8192, "rs_i": 4,
        "derandomize": True,
    })
    matches = sum(any(np.array_equal(o, c) for c in cadus) for o in out)
    assert matches >= 8


# ------------------------------------------------ conv_concat punctured --
@pytest.mark.parametrize("rate", ["3/4", "7/8"])
def test_conv_concat_punctured_cadus(tmp_path, rate, rng):
    """Full module loopback at punctured rates: CADUs -> conv+puncture ->
    BPSK softs -> ccsds_conv_concat_decoder(conv_rate) -> bit-exact CADUs."""
    from satdump_tpu.pipeline.module import module_registry, register_all_modules
    register_all_modules()
    cadus = sim.make_cadus(10, rng)
    chan = sim.encode_cadu_stream(cadus, conv_rate=rate)
    soft = sim.symbols_to_soft_int8(chan)
    soft_path = tmp_path / "test.soft"
    soft.tofile(soft_path)
    mod = module_registry.get("ccsds_conv_concat_decoder")(
        str(soft_path), str(tmp_path / "out"), {
            "constellation": "bpsk", "cadu_size": 8192, "rs_i": 4,
            "derandomize": True, "conv_rate": rate,
        })
    mod.process()
    out = np.fromfile(mod.d_output_file, np.uint8).reshape(-1, 1024)
    assert len(out) >= 8, f"only {len(out)} CADUs at rate {rate}"
    matches = sum(any(np.array_equal(o, c) for c in cadus) for o in out)
    assert matches >= len(out) - 1
