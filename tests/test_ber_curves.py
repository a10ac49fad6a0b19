"""BER-vs-SNR validation (SURVEY §4 implication (2), VERDICT r1 #7):
mod -> channel -> demod -> Viterbi loopbacks swept over Es/N0, asserting the
measured channel BER stays within ~1 dB of QPSK theory and that the
feedforward (fast) chain matches the Costas/M&M chain's post-FEC frame
recovery down toward threshold."""

import math

import numpy as np
import pytest

from satdump_tpu import sim
from satdump_tpu.io import write_baseband
from satdump_tpu.pipeline.pipeline import Pipeline, PipelineStep
from satdump_tpu.pipeline.runner import run_pipeline

SAMPLERATE, SYMBOLRATE = 220_000.0, 100_000.0


def qfunc(x):
    return 0.5 * math.erfc(x / math.sqrt(2.0))


def qpsk_ber_theory(esn0_db):
    """Per-bit error rate of coherent QPSK at Es/N0 (Eb/N0 = Es/N0 - 3dB,
    BER = Q(sqrt(2 Eb/N0)) = Q(sqrt(Es/N0)))."""
    return qfunc(math.sqrt(10 ** (esn0_db / 10)))


def _pipeline(fast: bool):
    return Pipeline(
        id="ber_t", name="BER test",
        steps=[
            PipelineStep("baseband", ""),
            PipelineStep("soft", "psk_demod", {
                "constellation": "qpsk", "symbolrate": SYMBOLRATE,
                "rrc_alpha": 0.5, "pll_bw": 0.005, "fast": fast,
            }),
            PipelineStep("cadu", "metop_ahrpt_decoder", {}),
        ],
        parameters={})


def _run(tmp_path, rng, esn0_db, fast, n_cadus=20, seed=11):
    cadus = sim.make_cadus(n_cadus, rng)
    chan_bits = sim.encode_cadu_stream(cadus)
    syms = sim.bits_to_qpsk_symbols(chan_bits)
    tx = sim.qpsk_modulate(syms, sps=SAMPLERATE / SYMBOLRATE)
    # ChannelModel's snr_db is measured on the shaped signal's mean power,
    # which equals Es/sps for unit-energy symbols -> per-symbol Es/N0 at the
    # matched-filter output is snr_db + 10log10(sps).
    sps_gain = 10 * math.log10(SAMPLERATE / SYMBOLRATE)
    chan = sim.ChannelModel(snr_db=esn0_db - sps_gain, freq_offset=2e-4,
                            phase=0.4, seed=seed)
    bb = chan.apply(tx)
    tag = f"{'f' if fast else 'c'}{esn0_db}"
    bb_path = tmp_path / f"{tag}.cf32"
    write_baseband(bb_path, "cf32", bb)
    out = run_pipeline(_pipeline(fast), str(bb_path),
                       str(tmp_path / f"out{tag}"),
                       user_params={"samplerate": SAMPLERATE,
                                    "buffer_size": 1 << 17})
    got = np.fromfile(out, dtype=np.uint8)
    got = got[: len(got) // 1024 * 1024].reshape(-1, 1024)
    matched = sum(bool((cadus == g).all(axis=1).any()) for g in got)
    return matched, len(got), cadus


@pytest.mark.slow
@pytest.mark.parametrize("esn0_db", [8.0, 5.0])
def test_channel_ber_within_1db_of_theory(tmp_path, rng, esn0_db):
    """Measure the raw channel BER via the Viterbi re-encode estimator on
    the demodulated softs; the implied Es/N0 must be within 1 dB of what
    was injected (sync implementation loss bound)."""
    from satdump_tpu.pipeline.modules.ccsds.viterbi_sync import Viterbi12Sync

    cadus = sim.make_cadus(30, rng)
    chan_bits = sim.encode_cadu_stream(cadus)
    syms = sim.bits_to_qpsk_symbols(chan_bits)
    tx = sim.qpsk_modulate(syms, sps=SAMPLERATE / SYMBOLRATE)
    sps_gain = 10 * math.log10(SAMPLERATE / SYMBOLRATE)
    chan = sim.ChannelModel(snr_db=esn0_db - sps_gain, freq_offset=2e-4,
                            phase=0.4, seed=7)
    bb = chan.apply(tx)
    bb_path = tmp_path / "x.cf32"
    write_baseband(bb_path, "cf32", bb)

    out = run_pipeline(_pipeline(fast=False), str(bb_path),
                       str(tmp_path / "o"),
                       user_params={"samplerate": SAMPLERATE,
                                    "buffer_size": 1 << 17})
    soft = np.fromfile(str(tmp_path / "o" / "ber_t.soft"), np.int8)
    from satdump_tpu.ops.fec.depuncture import BER_SCALE
    v = Viterbi12Sync(0.3, 10, rate="1/2")
    v.work(soft)
    ber = v.ber / BER_SCALE["1/2"]   # v.ber is the reference's scaled metric
    assert v.getState() == 1, "Viterbi never locked"
    # theory at injected Es/N0 and at 1 dB worse: measured must fall below
    # the 1 dB-degraded curve
    assert ber <= qpsk_ber_theory(esn0_db - 1.0), \
        f"BER {ber:.4f} worse than theory-1dB " \
        f"{qpsk_ber_theory(esn0_db - 1.0):.4f} at {esn0_db} dB"
    # sanity floor: not absurdly below the ideal curve either (would mean
    # the injected SNR calibration is off)
    if esn0_db <= 5.0:
        assert ber >= qpsk_ber_theory(esn0_db + 1.5) * 0.2


@pytest.mark.slow
def test_fast_chain_matches_classic_near_threshold(tmp_path, rng):
    """Post-FEC frame recovery of the feedforward chain must track the
    feedback chain within 15% at a low operating point (equivalence claim
    in ops/ffsync.py docstring)."""
    esn0 = 5.0
    m_fast, n_fast, _ = _run(tmp_path, rng, esn0, fast=True, n_cadus=60)
    m_classic, n_classic, cadus = _run(tmp_path, rng, esn0, fast=False,
                                       n_cadus=60)
    # both chains must recover the bulk of the pass (lock acquisition is
    # allowed to eat the head of the stream)
    assert m_classic >= 40, f"classic chain only {m_classic}/60 CADUs"
    assert m_fast >= 40, f"fast chain only {m_fast}/60 CADUs"
    assert abs(m_fast - m_classic) <= max(5, 0.2 * m_classic), \
        f"fast {m_fast} vs classic {m_classic}"
    # both recover only valid frames
    assert m_fast == n_fast and m_classic == n_classic
