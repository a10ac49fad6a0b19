"""PM and FSK demodulator loopbacks (ref module_pm_demod.cpp /
module_fsk_demod.cpp chains)."""

import numpy as np
import pytest

from satdump_tpu.io import write_baseband
from satdump_tpu.ops import firdes


def _shaped_bpsk(bits, sps, alpha=0.5, ntaps=63):
    sym = 1.0 - 2.0 * bits.astype(np.float32)
    interp = int(round(sps))
    up = np.zeros(len(sym) * interp, np.float32)
    up[::interp] = sym
    taps = firdes.root_raised_cosine(1.0, interp, 1.0, alpha, ntaps)
    return np.convolve(up, taps * interp, "same")


def _align_ber(soft, tx_bits):
    """BER after cross-correlation alignment (demod delay + polarity are
    unknown); measured on the second half (past loop acquisition)."""
    s = np.sign(soft.astype(np.float32))
    tb = 1.0 - 2.0 * tx_bits.astype(np.float32)
    c = np.correlate(s, tb, "full")
    k = int(np.argmax(np.abs(c)))
    lag = k - (len(tb) - 1)
    pol = np.sign(c[k]) or 1.0
    a = s[max(lag, 0):]
    b = tb[max(-lag, 0):]
    n = min(len(a), len(b))
    return float(np.mean(a[n // 2: n] * pol != b[n // 2: n]))


@pytest.mark.slow
def test_pm_demod_loopback(tmp_path, rng):
    from satdump_tpu.pipeline.modules.demod.pm import PMDemodModule
    fs, rs = 80_000.0, 8_000.0
    sps = fs / rs
    bits = rng.integers(0, 2, 4000, dtype=np.uint8)
    b = _shaped_bpsk(bits, sps)
    n = np.arange(len(b))
    # BPSK subcarrier at the symbol rate, phase-modulated on the carrier
    sub = b * np.cos(2 * np.pi * (rs / fs) * n)
    x = np.exp(1j * (2 * np.pi * 0.001 * n + 1.0 * sub)).astype(np.complex64)
    noise = (rng.standard_normal(len(x)) + 1j * rng.standard_normal(len(x)))
    x = (x + 0.02 * noise).astype(np.complex64)
    bb = tmp_path / "pm.cf32"
    write_baseband(bb, "cf32", x)

    mod = PMDemodModule(str(bb), str(tmp_path / "o"), {
        "samplerate": fs, "symbolrate": rs, "pll_bw": 0.01,
        "rrc_alpha": 0.5, "costas_bw": 0.005, "buffer_size": 1 << 15})
    mod.process()
    soft = np.fromfile(mod.d_output_file, np.int8)
    assert len(soft) > 3000
    ber = _align_ber(soft, bits)
    assert ber < 0.02, f"PM loopback BER {ber:.3f}"


@pytest.mark.slow
def test_fsk_demod_loopback(tmp_path, rng):
    from satdump_tpu.pipeline.modules.demod.fsk import FSKDemodModule
    fs, rs = 96_000.0, 9_600.0
    sps = fs / rs
    bits = rng.integers(0, 2, 4000, dtype=np.uint8)
    sym = 2.0 * bits.astype(np.float32) - 1.0
    freq = np.repeat(sym, int(sps)) * 0.1  # deviation 0.1 cycles/sample
    phase = 2 * np.pi * np.cumsum(freq)
    x = np.exp(1j * phase).astype(np.complex64)
    x = (x + 0.05 * (rng.standard_normal(len(x))
                     + 1j * rng.standard_normal(len(x)))).astype(np.complex64)
    bb = tmp_path / "fsk.cf32"
    write_baseband(bb, "cf32", x)

    mod = FSKDemodModule(str(bb), str(tmp_path / "o"), {
        "samplerate": fs, "symbolrate": rs, "basic_shaping": True,
        "buffer_size": 1 << 15})
    mod.process()
    soft = np.fromfile(mod.d_output_file, np.int8)
    assert len(soft) > 3000
    ber = _align_ber(soft, bits)
    assert ber < 0.02, f"FSK loopback BER {ber:.3f}"
