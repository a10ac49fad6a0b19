"""Raytrace + TPS warp tests."""

import numpy as np

from satdump_tpu.geo import SGP4, TLE
from satdump_tpu.geo.raytrace import (NormalLineRaytracer, compute_gcps,
                                      ray_ellipsoid_intersect)
from satdump_tpu.geo.warp import ThinPlateSpline, warp_to_equirect

N19_L1 = "1 33591U 09005A   21100.47420639  .00000090  00000-0  74103-4 0  9998"
N19_L2 = "2 33591  99.1922 114.0067 0013577 245.5357 114.4418 14.12500029627277"


def _tle():
    return TLE.parse("NOAA 19", N19_L1, N19_L2)


def test_ray_intersect_nadir():
    # straight down from 800 km over the equator hits the surface below
    origin = np.array([[6378.137 + 800.0, 0.0, 0.0]])
    direction = np.array([[-1.0, 0.0, 0.0]])
    p, hit = ray_ellipsoid_intersect(origin, direction)
    assert hit.all()
    assert abs(np.linalg.norm(p[0]) - 6378.137) < 0.5


def test_normal_line_nadir_matches_subpoint():
    tle = _tle()
    prop = SGP4(tle)
    ts = tle.epoch_unix + np.arange(16) * 0.5
    cfg = {"timestamps": ts.tolist(), "image_width": 2048, "scan_angle": 110.6}
    rt = NormalLineRaytracer(cfg, tle)
    # center pixel = nadir: must be very close to the sub-satellite point
    lat, lon = rt.get_latlon(np.full(16, 1024.0), np.arange(16.0))
    sp = prop.subpoint(ts)
    assert np.all(np.abs(lat - sp[:, 0]) < 0.2), np.abs(lat - sp[:, 0]).max()
    assert np.all(np.abs(lon - sp[:, 1]) < 0.2)


def test_normal_line_scan_geometry():
    tle = _tle()
    ts = tle.epoch_unix + np.arange(4) * 0.5
    cfg = {"timestamps": ts.tolist(), "image_width": 2048, "scan_angle": 110.6}
    rt = NormalLineRaytracer(cfg, tle)
    lat_c, lon_c = rt.get_latlon(np.array([1024.0]), np.array([0.0]))
    lat_l, lon_l = rt.get_latlon(np.array([0.0]), np.array([0.0]))
    lat_r, lon_r = rt.get_latlon(np.array([2047.0]), np.array([0.0]))
    # edges resolve, are distinct, and are roughly symmetric about nadir
    from satdump_tpu.geo.geodetic import vincenty_distance
    dl = vincenty_distance(lat_c[0], lon_c[0], lat_l[0], lon_l[0])
    dr = vincenty_distance(lat_c[0], lon_c[0], lat_r[0], lon_r[0])
    assert 800 < dl < 2000, dl    # AVHRR swath half-width ~1450 km
    assert abs(dl - dr) / dl < 0.1


def test_compute_gcps():
    tle = _tle()
    ts = tle.epoch_unix + np.arange(64) * 0.5
    cfg = {"timestamps": ts.tolist(), "image_width": 2048,
           "scan_angle": 110.6, "tle": tle.to_json()}
    g = compute_gcps(cfg, 2048, 64)
    assert g.shape[0] > 200
    assert np.isfinite(g).all()


def test_tps_recovers_affine():
    rng = np.random.default_rng(5)
    src = rng.uniform(0, 100, (30, 2))
    dst = src @ np.array([[1.2, 0.1], [-0.1, 0.8]]) + [5.0, -3.0]
    tps = ThinPlateSpline(src, dst)
    q = rng.uniform(10, 90, (200, 2))
    out = tps(q)
    expect = q @ np.array([[1.2, 0.1], [-0.1, 0.8]]) + [5.0, -3.0]
    assert np.abs(out - expect).max() < 1e-6


def test_warp_to_equirect_roundtrip():
    tle = _tle()
    ts = tle.epoch_unix + np.arange(128) * 0.5
    cfg = {"timestamps": ts.tolist(), "image_width": 512,
           "scan_angle": 110.6, "tle": tle.to_json()}
    img = (np.arange(128)[:, None] * np.ones(512)[None, :] * 500).astype(np.uint16)
    g = compute_gcps(cfg, 512, 128, nx=11, ny=25)
    warped, georef = warp_to_equirect(img, g, out_width=256)
    assert warped.shape[1] == 256
    assert warped.dtype == img.dtype
    assert (warped > 0).mean() > 0.1     # a meaningful share of pixels mapped
    assert georef["lat_min"] < georef["lat_max"]
