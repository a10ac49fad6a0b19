"""Per-instrument calibrators (products/calibrators.py) vs the reference
per-pixel formulas (mhs/hirs/ascat/iasi_img/msumr calibrator headers)."""

import numpy as np
import pytest

from satdump_tpu.products.calibration import (CALIBRATION_INVALID_VALUE,
                                              get_calibrator,
                                              temperature_to_radiance)


class _Holder:
    def __init__(self, abs_index, wavenumber, bit_depth=16):
        self.abs_index = abs_index
        self.wavenumber = wavenumber
        self.bit_depth = bit_depth


class _Prod:
    def __init__(self, wn):
        self.images = [_Holder(i, w) for i, w in enumerate(wn)]


def test_mhs_quadratic_per_line():
    plpc = [[{"a0": 1.0, "a1": 0.5, "a2": 0.001} for _ in range(5)],
            [{"a0": -999.99, "a1": 0, "a2": 0} for _ in range(5)]]
    cal = get_calibrator("noaa_mhs", _Prod([5.0] * 5),
                         {"vars": {"perLine_perChannel": plpc}})
    counts = np.array([[10, 0], [7, 8]], np.uint16)
    out = cal.compute(2, counts)
    assert out[0, 0] == pytest.approx(1.0 + 0.5 * 10 + 0.001 * 100)
    assert out[0, 1] == CALIBRATION_INVALID_VALUE          # zero count
    assert (out[1] == CALIBRATION_INVALID_VALUE).all()     # bad line


def test_hirs_linear_and_visible():
    plpc = [[] for _ in range(20)]
    plpc[3] = [{"a0": 2.0, "a1": 0.25}]
    cal = get_calibrator("noaa_hirs", _Prod([10.0] * 20),
                         {"vars": {"perLine_perChannel": plpc,
                                   "perChannel": {"a0": 0.0, "a1": 0.001}}})
    out = cal.compute(3, np.array([[8, 0]], np.uint16))
    assert out[0, 0] == pytest.approx(2.0 + 0.25 * 8)
    assert out[0, 1] == CALIBRATION_INVALID_VALUE
    vis = cal.compute(19, np.array([[500, 2000]], np.uint16))
    assert vis[0, 0] == pytest.approx(0.5)
    assert vis[0, 1] == CALIBRATION_INVALID_VALUE          # albedo > 1


def test_ascat_float_decode():
    cal = get_calibrator("metop_ascat", _Prod([0]), {})
    out = cal.compute(0, np.array([[0x3F80, 0xBF80]], np.uint16))
    assert out[0, 0] == 1.0 and out[0, 1] == -1.0


def test_iasi_img_two_point():
    wn = 2000.0
    cal = get_calibrator(
        "metop_iasi_img", _Prod([wn]),
        {"vars": [{"bbt": 290.0, "cold_counts": 1000.0,
                   "warm_counts": 9000.0}]})
    c = np.full((64, 4), 9000.0)
    out = cal.compute(0, c)
    assert out[0, 0] == pytest.approx(temperature_to_radiance(290.0, wn))
    c2 = np.full((64, 4), 1000.0)
    out2 = cal.compute(0, c2)
    assert out2[0, 0] == pytest.approx(temperature_to_radiance(2.73, wn),
                                       rel=1e-6)


def test_msumr_ir_two_point():
    wn = 900.0
    views = [None, None, None,
             [[1000.0, 1000.0], [9000.0, 9000.0]]] + [None, None]
    temps = [{"analog_tlm": {"cold_temp1": 225.0, "cold_temp2": 225.0,
                             "hot_temp1": 312.0, "hot_temp2": 312.0}},
             None]
    cal = get_calibrator("meteor_msumr",
                         _Prod([0, 0, 0, wn, 0, 0]),
                         {"vars": {"views": views, "temps": temps}})
    out = cal.compute(3, np.array([[1000.0], [9000.0]]))
    assert out[0, 0] == pytest.approx(temperature_to_radiance(225.0, wn))
    assert out[1, 0] == pytest.approx(temperature_to_radiance(312.0, wn))


def test_msumr_visible():
    cal = get_calibrator(
        "meteor_msumr", _Prod([2500.0] + [0] * 5),
        {"vars": {"vis": [[0.0, 50.0], [0.0, 60.0], [0.0, 70.0],
                          [47, 573]]}})
    out = cal.compute(0, np.array([[572.0]]))
    assert out[0, 0] > 0
    zero = cal.compute(0, np.array([[47.0]]))
    assert zero[0, 0] == 0.0


def test_jpss_atms_two_point():
    """ATMS counts -> radiance via per-scan cold/warm views; exact
    two-point inversion (ref atms_calibrator.cpp, PRT term simplified)."""
    from satdump_tpu.products.calibration import (calibrate_channel,
                                                  freq_to_wavenumber,
                                                  temperature_to_radiance)
    from satdump_tpu.products.calibrators import ATMS_FREQ_GHZ
    from satdump_tpu.products.image_product import ImageProduct

    ch = 15                                  # 88.2 GHz
    wn = freq_to_wavenumber(ATMS_FREQ_GHZ[ch] * 1e9)
    rc = temperature_to_radiance(2.7279, wn)
    rw = temperature_to_radiance(285.0, wn)
    cold_cnt, warm_cnt = 1000.0, 30000.0
    gain = (rw - rc) / (warm_cnt - cold_cnt)

    # pick counts whose expected BT is 240 K
    r240 = temperature_to_radiance(240.0, wn)
    cnt = cold_cnt + (r240 - rc) / gain
    img = np.full((3, 96), round(cnt), np.uint16)
    p = ImageProduct()
    p.instrument_name = "atms"
    for c in range(22):
        p.add_channel(np.zeros((3, 96), np.uint16) if c != ch else img,
                      str(c + 1),
                      wavenumber=freq_to_wavenumber(
                          ATMS_FREQ_GHZ[c] * 1e9),
                      calibration_type="emissive_radiance", bit_depth=16)
    p.set_calibration("jpss_atms", {"vars": {
        "cold_counts": [[cold_cnt] * 22] * 3,
        "warm_counts": [[warm_cnt] * 22] * 3,
        "warm_temp": 285.0}})
    bt = calibrate_channel(p, str(ch + 1), "brightness_temperature")
    assert abs(float(bt[1, 40]) - 240.0) < 0.1


def test_generic_xrit_lut():
    """Generic xRIT calibration-table calibrator: spline through the
    published (count, value) points (ref generic_xrit_calibrator.h)."""
    from satdump_tpu.products.calibration import calibrate_channel
    from satdump_tpu.products.image_product import ImageProduct

    p = ImageProduct()
    p.instrument_name = "ami"
    img = np.array([[0, 256, 512, 768, 1020]], np.uint16)
    p.add_channel(img, "ir105", bit_depth=10,
                  calibration_type="brightness_temperature")
    p.set_calibration("generic_xrit", {"vars": {
        "ir105": [[0, 330.0], [512, 250.0], [1023, 180.0]],
        "to_complete": True}})
    v = calibrate_channel(p, "ir105")
    assert v[0, 2] == pytest.approx(250.0, abs=1.0)
    assert 170 < v[0, 4] < 200 and 280 < v[0, 1] < 300
    # bits_for_calib rescales the LUT domain
    p.set_calibration("generic_xrit", {"vars": {
        "ir105": [[0, 330.0], [128, 250.0], [255, 180.0]],
        "bits_for_calib": {"ir105": 8}}})
    v8 = calibrate_channel(p, "ir105")
    assert v8[0, 2] == pytest.approx(250.0, abs=2.0)
