"""Geo layer tests: geodetic transforms round-trip; SGP4 vs known orbit
properties (period, altitude, ground-track sanity) for a real NOAA TLE."""

import numpy as np

from satdump_tpu.geo import SGP4, TLE, ecef_to_lla, lla_to_ecef, look_angles
from satdump_tpu.geo.geodetic import gmst, unix_to_jd, vincenty_distance

# NOAA 19 TLE (historical, public)
N19_L1 = "1 33591U 09005A   21100.47420639  .00000090  00000-0  74103-4 0  9998"
N19_L2 = "2 33591  99.1922 114.0067 0013577 245.5357 114.4418 14.12500029627277"


def test_lla_ecef_roundtrip(rng):
    lat = rng.uniform(-89, 89, 100)
    lon = rng.uniform(-180, 180, 100)
    alt = rng.uniform(0, 1000, 100)
    xyz = lla_to_ecef(lat, lon, alt)
    back = ecef_to_lla(xyz)
    np.testing.assert_allclose(back[:, 0], lat, atol=1e-6)
    np.testing.assert_allclose(back[:, 1], lon, atol=1e-6)
    np.testing.assert_allclose(back[:, 2], alt, atol=1e-3)


def test_gmst_j2000():
    # GMST at J2000.0 epoch ~ 280.46 deg
    th = np.degrees(gmst(2451545.0))
    assert abs(th - 280.46) < 0.01


def test_tle_parse():
    t = TLE.parse("NOAA 19", N19_L1, N19_L2)
    assert t.norad == 33591
    assert abs(t.inclination - 99.1922) < 1e-9
    assert abs(t.mean_motion - 14.125) < 1e-3
    assert abs(t.bstar - 0.74103e-4) < 1e-9
    assert t.epoch_year == 2021


def test_sgp4_orbit_sanity():
    t = TLE.parse("NOAA 19", N19_L1, N19_L2)
    prop = SGP4(t)
    # over one orbit: radius must stay near the sun-synchronous LEO shell
    ts = t.epoch_unix + np.linspace(0, 102 * 60, 400)
    teme = prop.propagate_tsince((ts - t.epoch_unix) / 60.0)
    r = np.linalg.norm(teme, axis=-1)
    assert np.all(r > 6378 + 800) and np.all(r < 6378 + 900), (r.min(), r.max())
    # period: z crosses zero ascending every ~T; mean motion 14.125 rev/day
    period_min = 1440.0 / 14.125
    z0 = teme[:, 2]
    # position at one full period later should be close to initial (within
    # J2 drift over one orbit: a few tens of km)
    p0 = prop.propagate_tsince(0.0)
    p1 = prop.propagate_tsince(period_min)
    assert np.linalg.norm(p1 - p0) < 300.0
    # sub-satellite latitude bounded by inclination
    lla = ecef_to_lla(prop.position_ecef(ts))
    assert np.max(np.abs(lla[:, 0])) < 99.2 - 8.0  # sun-sync: |lat| <= 180-i


def test_look_angles_overhead():
    # satellite directly above the observer -> elevation ~ 90
    obs = (45.0, 7.0, 0.2)
    sat = lla_to_ecef(45.0, 7.0, 850.0)
    az_el = look_angles(*obs, sat)
    assert az_el[1] > 89.0
    assert abs(az_el[2] - 849.8) < 2.0


def test_vincenty_equator_degree():
    # 1 degree of longitude at the equator ~ 111.32 km
    d = vincenty_distance(0.0, 0.0, 0.0, 1.0)
    assert abs(d - 111.32) < 0.05


def test_interpolate_timestamps_x8():
    from satdump_tpu.geo.raytrace import interpolate_timestamps, prepare_proj_timestamps
    ts = np.array([100.0, -1.0, 103.2])
    out = interpolate_timestamps(ts, 8, 0.2)
    assert out.shape == (24,)
    # centered: i in [-4, 4) around each base timestamp
    np.testing.assert_allclose(out[:8], 100.0 + np.arange(-4, 4) * 0.2)
    assert np.all(out[8:16] == -1.0)
    np.testing.assert_allclose(out[16:], 103.2 + np.arange(-4, 4) * 0.2)

    cfg = {"timestamps": ts, "interpolate_timestamps": 8,
           "interpolate_timestamps_scantime": 0.2}
    out2 = prepare_proj_timestamps(cfg)["timestamps"]
    np.testing.assert_allclose(out2, out)


def test_timestamp_filter_simple():
    from satdump_tpu.geo.raytrace import filter_timestamps_cfg
    ts = np.array([1000.0, 1001.6, 99999.0, 1004.8, 1006.4])
    out = filter_timestamps_cfg(ts, {"type": "simple", "scan_time": 1.6,
                                     "max_diff": 10.0})
    # reference semantics (timestamp_filtering.cpp): first element rejected
    # (last starts at -1), outlier rejected, element after outlier rejected
    # (last >= v), survivors kept
    np.testing.assert_allclose(out, [-1, 1001.6, -1, -1, 1006.4])
