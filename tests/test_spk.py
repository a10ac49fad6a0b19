"""SPK/DAF ephemeris reader (geo/spk.py) — synthetic type-2 kernels.
The reference's calceph role (init.cpp:154-160) for deep-space pipelines."""

import numpy as np
import pytest

from satdump_tpu.geo.spk import SPK, write_spk_type2


def _cheb_fit(f, t0, t1, ncoef):
    """Chebyshev fit of f over [t0, t1] (numpy polynomial.chebyshev)."""
    from numpy.polynomial import chebyshev as C
    ts = (t0 + t1) / 2 + (t1 - t0) / 2 * np.cos(
        np.pi * (np.arange(ncoef * 4) + 0.5) / (ncoef * 4))
    x = (ts - (t0 + t1) / 2) / ((t1 - t0) / 2)
    return C.chebfit(x, f(ts), ncoef - 1)


def _orbit(et):
    """A toy heliocentric orbit, km."""
    w = 2 * np.pi / 1e6
    return np.stack([1.5e8 * np.cos(w * et), 1.5e8 * np.sin(w * et),
                     1e6 * np.sin(3 * w * et)], axis=-1)


def test_spk_type2_roundtrip(tmp_path):
    init, intlen, nrec, ncoef = 0.0, 86400.0, 8, 12
    coeffs = np.zeros((nrec, 3, ncoef))
    for i in range(nrec):
        t0, t1 = init + i * intlen, init + (i + 1) * intlen
        for c in range(3):
            coeffs[i, c] = _cheb_fit(lambda t: _orbit(t)[..., c],
                                     t0, t1, ncoef)
    p = tmp_path / "toy.bsp"
    write_spk_type2(str(p), [
        {"target": 399, "center": 0, "init": init, "intlen": intlen,
         "coeffs": coeffs}])
    spk = SPK.load(str(p))
    assert len(spk.segments) == 1
    s = spk.segments[0]
    assert (s.target, s.center, s.dtype) == (399, 0, 2)
    for et in (1000.0, 86400.0 * 3.3, 86400.0 * 7.9):
        got = spk.position(399, 0, et)
        np.testing.assert_allclose(got, _orbit(et), rtol=1e-9, atol=1e-3)


def test_spk_chained_centers(tmp_path):
    """Moon (301) relative to EMB (3) + EMB relative to SSB (0):
    position(301, 0) chains both segments."""
    init, intlen, nrec, ncoef = 0.0, 43200.0, 4, 10

    def emb(et):
        return _orbit(et)

    def moon_rel(et):
        w = 2 * np.pi / 2e5
        et = np.asarray(et)
        return np.stack([3.8e5 * np.cos(w * et), 3.8e5 * np.sin(w * et),
                         np.zeros_like(et)], axis=-1)

    def fit(f):
        out = np.zeros((nrec, 3, ncoef))
        for i in range(nrec):
            t0, t1 = init + i * intlen, init + (i + 1) * intlen
            for c in range(3):
                out[i, c] = _cheb_fit(lambda t: f(t)[..., c], t0, t1, ncoef)
        return out

    p = tmp_path / "chain.bsp"
    write_spk_type2(str(p), [
        {"target": 3, "center": 0, "init": init, "intlen": intlen,
         "coeffs": fit(emb)},
        {"target": 301, "center": 3, "init": init, "intlen": intlen,
         "coeffs": fit(moon_rel)}])
    spk = SPK.load(str(p))
    et = 100000.0
    np.testing.assert_allclose(spk.position(301, 0, et),
                               emb(et) + moon_rel(et), rtol=1e-8, atol=1e-2)
    np.testing.assert_allclose(spk.position(301, 3, et), moon_rel(et),
                               rtol=1e-8, atol=1e-3)
    # relative between two targets with a shared root
    np.testing.assert_allclose(spk.position(3, 301, et), -moon_rel(et),
                               rtol=1e-8, atol=1e-3)
