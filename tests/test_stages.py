"""DSP stage golden tests against NumPy sequential models (the reference's
per-sample semantics re-implemented literally in NumPy)."""

import numpy as np
import jax.numpy as jnp

from satdump_tpu.ops import stages, fir


def _np_dc_block(x, alpha, acc0=0):
    beta = 1 - alpha
    acc = acc0
    y = np.empty_like(x)
    for i in range(len(x)):
        acc = acc * beta + x[i] * alpha
        y[i] = x[i] - acc
    return y, acc


def test_dc_block_matches_sequential(rng):
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096) + 0.7 - 0.3j
         ).astype(np.complex64)
    st = stages.dc_block_init()
    st, y = stages.dc_block(st, jnp.asarray(x), alpha=0.001)
    ref, acc = _np_dc_block(x.astype(np.complex128), 0.001)
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-3)
    np.testing.assert_allclose(complex(st.acc), acc, atol=2e-3)
    # DC actually removed (allow the ~1/alpha-sample settling transient)
    assert abs(np.mean(np.asarray(y)[3000:])) < 0.1


def test_dc_block_state_continuity(rng):
    x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192) + 0.5).astype(np.complex64)
    st = stages.dc_block_init()
    st1, y1 = stages.dc_block(st, jnp.asarray(x[:4096]), alpha=0.001)
    st1, y2 = stages.dc_block(st1, jnp.asarray(x[4096:]), alpha=0.001)
    st2, yall = stages.dc_block(stages.dc_block_init(), jnp.asarray(x), alpha=0.001)
    np.testing.assert_allclose(np.concatenate([y1, y2]), np.asarray(yall), atol=1e-4)


def test_freq_shift(rng):
    x = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)).astype(np.complex64)
    delta = 0.1
    st = stages.freq_shift_init()
    st, y = stages.freq_shift(st, jnp.asarray(x), delta)
    n = np.arange(1000)
    ref = x * np.exp(1j * n * delta)
    np.testing.assert_allclose(np.asarray(y), ref.astype(np.complex64), atol=1e-3)
    # continuity: second block starts where first ended (mod 2pi)
    st, y2 = stages.freq_shift(st, jnp.asarray(x), delta)
    ref2 = x * np.exp(1j * (1000 * delta + n * delta))
    np.testing.assert_allclose(np.asarray(y2), ref2.astype(np.complex64), atol=1e-2)


def _np_agc(x, rate, reference, gain0, max_gain):
    gain = gain0
    y = np.empty_like(x)
    for i in range(len(x)):
        out = x[i] * gain
        gain += rate * (reference - abs(out))
        if max_gain > 0 and gain > max_gain:
            gain = max_gain
        y[i] = out
    return y, gain


def test_agc_scan_matches_sequential(rng):
    x = (0.1 * (rng.standard_normal(2048) + 1j * rng.standard_normal(2048))).astype(np.complex64)
    st = stages.agc_init()
    st, y = stages.agc_scan(st, jnp.asarray(x), rate=1e-2)
    ref, gain = _np_agc(x.astype(np.complex128), 1e-2, 1.0, 1.0, 65536.0)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-3)
    np.testing.assert_allclose(float(st.gain), gain, rtol=1e-3)


def test_agc_block_converges(rng):
    x = (0.05 * (rng.standard_normal(1 << 16) + 1j * rng.standard_normal(1 << 16))).astype(np.complex64)
    st = stages.agc_init()
    st, y = stages.agc_block(st, jnp.asarray(x), rate=1e-2)
    tail = np.asarray(y)[-16384:]
    assert 0.8 < np.mean(np.abs(tail)) < 1.2


def test_quadrature_demod(rng):
    # FM: instantaneous freq recovered
    fdev = 0.3  # rad/sample
    msg = np.sin(2 * np.pi * np.arange(5000) / 500)
    phase = np.cumsum(fdev * msg)
    x = np.exp(1j * phase).astype(np.complex64)
    st = stages.quadrature_demod_init()
    st, y = stages.quadrature_demod(st, jnp.asarray(x), gain=1.0 / fdev)
    np.testing.assert_allclose(np.asarray(y)[10:], msg[10:], atol=0.02)


def test_fir_overlap_save_matches_numpy(rng):
    taps = np.hanning(31).astype(np.float32)
    x = (rng.standard_normal(10000) + 1j * rng.standard_normal(10000)).astype(np.complex64)
    st = fir.fir_init(len(taps))
    st, y1 = fir.fir_apply(st, jnp.asarray(x[:5000]), jnp.asarray(taps))
    st, y2 = fir.fir_apply(st, jnp.asarray(x[5000:]), jnp.asarray(taps))
    y = np.concatenate([np.asarray(y1), np.asarray(y2)])
    ref = fir.np_fir_reference(x, taps)
    np.testing.assert_allclose(y, ref, atol=1e-2)


def test_fir_real(rng):
    taps = np.hanning(17).astype(np.float32)
    x = rng.standard_normal(4000).astype(np.float32)
    st = fir.fir_init(len(taps), dtype=jnp.float32)
    st, y = fir.fir_apply(st, jnp.asarray(x), jnp.asarray(taps))
    ref = fir.np_fir_reference(x, taps)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-3)


def test_snr_estimator():
    rng = np.random.default_rng(1)
    for true_snr_db in [5.0, 15.0]:
        n = 1 << 16
        sig_pow = 1.0
        noise_pow = sig_pow / (10 ** (true_snr_db / 10))
        sym = (rng.integers(0, 2, n) * 2 - 1) + 1j * (rng.integers(0, 2, n) * 2 - 1)
        sym = sym.astype(np.complex64) / np.sqrt(2)
        noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
        noise *= np.sqrt(noise_pow / 2)
        est = float(stages.snr_m2m4(jnp.asarray(sym + noise)))
        assert abs(est - true_snr_db) < 1.5


def test_soft_quantization():
    sym = jnp.asarray(np.array([0.5 + 0.25j, -2.0 + 1.3j], dtype=np.complex64))
    soft = stages.qpsk_soft_interleave(sym, 100.0)
    np.testing.assert_array_equal(np.asarray(soft), [50, 25, -127, 127])
    b = stages.bpsk_soft(jnp.asarray(np.array([0.4, -3.0], dtype=np.float32)), 50.0)
    np.testing.assert_array_equal(np.asarray(b), [20, -127])


def test_gardner_clock_recovery(rng):
    """Gardner TED locks on a shaped BPSK stream and recovers symbols
    (ref clock_recovery_gardner.cpp)."""
    import jax.numpy as jnp

    from satdump_tpu.ops import clock_recovery as cr
    from satdump_tpu.ops import firdes
    sps = 2.37
    bits = rng.integers(0, 2, 4000, dtype=np.uint8)
    sym = (1.0 - 2.0 * bits).astype(np.float32)
    interp = 100
    up = np.zeros(len(sym) * interp, np.complex64)
    up[::interp] = sym
    taps = firdes.root_raised_cosine(1.0, interp, 1.0, 0.5, 801)
    shaped = np.convolve(up, taps * interp, "same")
    step = int(interp / sps)
    sps_actual = interp / step
    x = shaped[::step][: 8192].astype(np.complex64)

    st = cr.gardner_init(omega=sps_actual)
    st, syms, valid = cr.gardner_clock_recovery(
        st, jnp.asarray(x), omega_mid=sps_actual,
        gain_omega=8.7e-3 ** 2 / 4,
        gain_mu=8.7e-3, omega_relative_limit=0.01)
    s = np.asarray(syms)[np.asarray(valid)]
    # after acquisition the symbols sit near +-1 (eye open)
    tail = np.real(s[len(s) // 2:])
    assert (np.abs(np.abs(tail) - 1.0) < 0.35).mean() > 0.9


def test_constellation_registry(rng):
    from satdump_tpu.ops.constellation import (bits_per_symbol, get_points,
                                               hard_demod, make_soft_lut,
                                               soft_demod)
    for kind, m in [("bpsk", 1), ("qpsk", 2), ("8psk", 3),
                    ("16apsk", 4), ("32apsk", 5)]:
        g1, g2 = (3.15, 0.0) if kind == "16apsk" else \
            ((2.84, 5.27) if kind == "32apsk" else (0.0, 0.0))
        pts = get_points(kind, g1, g2)
        assert len(pts) == 2 ** m and bits_per_symbol(kind) == m
        # noiseless hard demod inverts the mapping
        idx = rng.integers(0, len(pts), 500)
        got = hard_demod(pts[idx], kind, g1, g2)
        assert np.array_equal(got, idx)
        # soft demod signs agree with the symbol bits at high SNR
        llr = soft_demod(pts[idx], kind, g1, g2, noise_var=0.01)
        bits = ((idx[:, None] >> np.arange(m - 1, -1, -1)) & 1)
        assert np.array_equal((llr > 0).astype(int), bits)
    lut_bits, perr = make_soft_lut("qpsk", resolution=64)
    assert lut_bits.shape == (64, 64, 2)
    assert np.abs(perr).max() <= np.pi
