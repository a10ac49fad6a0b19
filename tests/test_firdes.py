"""Tap design golden tests vs SciPy / analytic properties."""

import numpy as np
import scipy.signal as sig

from satdump_tpu.ops import firdes


def test_rrc_matches_commpy_formula():
    # RRC taps should be symmetric, peak at center, unit DC gain
    taps = firdes.root_raised_cosine(1.0, 6e6, 2.333e6, 0.5, 31)
    assert len(taps) == 31
    np.testing.assert_allclose(taps, taps[::-1], atol=1e-6)
    assert np.argmax(taps) == 15
    np.testing.assert_allclose(np.sum(taps), 1.0, rtol=1e-5)


def test_rrc_nyquist_property():
    # RRC convolved with itself = RC, which has zero ISI at symbol spacing
    sps = 4
    taps = firdes.root_raised_cosine(1.0, sps, 1.0, 0.35, 8 * sps + 1)
    rc = np.convolve(taps, taps)
    center = len(rc) // 2
    # samples at multiples of sps away from center should be ~0
    for k in range(1, 4):
        assert abs(rc[center + k * sps]) < 1e-2 * rc[center]


def test_lowpass_response():
    taps = firdes.low_pass(1.0, 100.0, 20.0, 5.0)
    w, h = sig.freqz(taps, fs=100.0)
    assert np.all(np.abs(h[w < 15]) > 0.9)
    assert np.all(np.abs(h[w > 26]) < 0.1)
    np.testing.assert_allclose(np.abs(h[0]), 1.0, rtol=1e-3)


def test_windowed_sinc_nuttall():
    # matches the reference construction: peak near center, low sidelobes
    taps = firdes.windowed_sinc(1024, np.pi / 128, norm=128.0)
    assert len(taps) == 1024
    np.testing.assert_allclose(taps, taps[::-1], atol=1e-5)
    # as a 128-branch interpolation prototype, total sum ≈ nfilt (1 per branch)
    np.testing.assert_allclose(np.sum(taps), 128.0, rtol=0.05)


def test_polyphase_bank_layout():
    rtaps = np.arange(12, dtype=np.float32)
    bank = firdes.polyphase_bank(rtaps, 4)
    assert bank.shape == (4, 3)
    # ref layout: bank[(nfilt-1) - (i % nfilt), i // nfilt] = rtaps[i]
    for i in range(12):
        assert bank[(4 - 1) - (i % 4), i // 4] == rtaps[i]


def test_mm_interpolator_bank_shape():
    bank = firdes.mm_interpolator_bank()
    assert bank.shape == (128, 8)
    # each branch should have ~unit gain (interpolation filter)
    gains = bank.sum(axis=1)
    np.testing.assert_allclose(gains, 1.0, atol=0.05)
