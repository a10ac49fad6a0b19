"""Projection + calibration tests."""

import numpy as np

from satdump_tpu.geo import projs
from satdump_tpu.geo.reproject import reproject_equirect
from satdump_tpu.products import calibration as cal


def _roundtrip(cfg, lon, lat, tol=1e-6):
    x, y = projs.forward(cfg, lon, lat)
    lon2, lat2 = projs.inverse(cfg, x, y)
    np.testing.assert_allclose(lon2, lon, atol=tol)
    np.testing.assert_allclose(lat2, lat, atol=tol)


def test_proj_roundtrips(rng):
    lon = rng.uniform(-60, 60, 200)
    lat = rng.uniform(-60, 60, 200)
    _roundtrip({"type": "equirectangular", "lon0": 10.0}, lon, lat)
    _roundtrip({"type": "webmerc"}, lon, lat)
    _roundtrip({"type": "stereo", "lat0": 90.0}, lon, rng.uniform(20, 80, 200))
    _roundtrip({"type": "geos", "lon0": 0.0}, lon * 0.9, lat * 0.9, tol=1e-3)


def test_geos_limb_invisible():
    # the far side of the earth is not visible from GEO
    x, y = projs.forward({"type": "geos", "lon0": 0.0},
                         np.array([180.0]), np.array([0.0]))
    assert np.isnan(x).all()


def test_reproject_equirect_identity():
    img = (np.arange(64 * 128).reshape(64, 128) % 255).astype(np.uint8)
    georef = {"lon_min": -10.0, "lon_max": 10.0,
              "lat_min": -5.0, "lat_max": 5.0}
    out, g = reproject_equirect(img, georef,
                                {"type": "equirectangular"}, out_width=128,
                                out_height=64)
    # equirect->equirect over the same box is ~identity
    err = np.abs(out.astype(int)[4:-4, 4:-4] - img.astype(int)[4:-4, 4:-4])
    assert err.mean() < 2.0


def test_planck_roundtrip():
    v = 900.0  # cm^-1, AVHRR ch5-ish
    t = np.array([220.0, 280.0, 310.0])
    L = cal.temperature_to_radiance(t, v)
    back = cal.radiance_to_temperature(L, v)
    np.testing.assert_allclose(back, t, rtol=1e-9)


def test_sun_angle_subsolar():
    # 2000-03-20 ~07:35 UTC (equinox): sun over the equator near lon ~65E
    t = 953537700.0
    el_eq = cal.get_sun_angle(t, 0.0, 66.0)
    assert el_eq > 85.0, el_eq
    # antipode: far below horizon
    assert cal.get_sun_angle(t, 0.0, -114.0) < -80.0


def test_linear_calibrator_and_bt():
    from satdump_tpu.products.image_product import ImageProduct
    p = ImageProduct()
    p.instrument_name = "avhrr_3"
    counts = np.full((4, 8), 500, np.uint16)
    p.add_channel(counts, "4", wavenumber=929.0, calibration_type="emissive_radiance")
    p.set_calibration("linear", {"coefs": {"0": {"a": 0.1, "b": 10.0}}})
    rad = cal.calibrate_channel(p, "4")
    np.testing.assert_allclose(rad, 60.0)
    bt = cal.calibrate_channel(p, "4", "brightness_temperature")
    assert 200 < bt.mean() < 320
