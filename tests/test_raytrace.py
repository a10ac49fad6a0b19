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


def test_per_ifov_geometry():
    """IASI-IMG-style per-IFOV raytracer: cell centers sweep the scan,
    in-cell rasters stay near their cell, swath width is plausible
    (ref normal_per_ifov.cpp)."""
    from satdump_tpu.geo.geodetic import vincenty_distance
    from satdump_tpu.geo.raytrace import NormalPerIFOVRaytracer

    tle = _tle()
    n_scans, n_ifov, cell = 4, 30, 64
    ts = (tle.epoch_unix
          + np.repeat(np.arange(n_scans) * 8.0, n_ifov)
          + np.tile(np.linspace(0, 6.0, n_ifov), n_scans))
    cfg = {"timestamps": ts.tolist(), "image_width": n_ifov * cell,
           "scan_angle": 99.6, "ifov_count": n_ifov, "ifov_x_size": cell,
           "ifov_y_size": cell, "ifov_x_scan_angle": 3,
           "ifov_y_scan_angle": 3}
    rt = NormalPerIFOVRaytracer(cfg, tle)

    # scan centerline approximately tracks the sub-satellite point
    prop = SGP4(tle)
    mid = n_ifov * cell / 2.0
    lat_c, lon_c = rt.get_latlon(np.array([mid]), np.array([cell / 2.0]))
    sp = prop.subpoint(np.array([ts[n_ifov // 2]]))
    assert vincenty_distance(lat_c[0], lon_c[0], sp[0, 0], sp[0, 1]) < 120

    # swath edges resolve and are roughly symmetric, ~IASI swath (2130 km)
    lat_l, lon_l = rt.get_latlon(np.array([2.0]), np.array([cell / 2.0]))
    lat_r, lon_r = rt.get_latlon(np.array([n_ifov * cell - 3.0]),
                                 np.array([cell / 2.0]))
    dl = vincenty_distance(lat_c[0], lon_c[0], lat_l[0], lon_l[0])
    dr = vincenty_distance(lat_c[0], lon_c[0], lat_r[0], lon_r[0])
    assert 700 < dl < 1800, dl
    assert abs(dl - dr) / dl < 0.15

    # within one IFOV cell, pixels stay close (a cell is ~3 deg ~ 45 km);
    # across a cell boundary the jump reflects the next stare position
    la1, lo1 = rt.get_latlon(np.array([10.0]), np.array([10.0]))
    la2, lo2 = rt.get_latlon(np.array([50.0]), np.array([50.0]))
    d_in = vincenty_distance(la1[0], lo1[0], la2[0], lo2[0])
    assert d_in < 200, d_in

    # every grid point resolves
    gx, gy = np.meshgrid(np.linspace(0, n_ifov * cell - 1, 40),
                         np.linspace(0, n_scans * cell - 1, 12))
    lat, lon = rt.get_latlon(gx.ravel(), gy.ravel())
    assert np.isfinite(lat).all() and np.isfinite(lon).all()


def test_manual_line_spline_pointing():
    """Manual pointing-table raytracer: spline passes through the knots;
    nadir knot maps to the sub-point (ref manual_line.cpp)."""
    from satdump_tpu.geo.geodetic import vincenty_distance
    from satdump_tpu.geo.raytrace import ManualLineRaytracer

    tle = _tle()
    ts = tle.epoch_unix + np.arange(8) * 0.5
    # symmetric roll table, zero pitch: behaves like a plain scanner
    pts = {"0": [-35.0, 0.0, 0.0], "512": [0.0, 0.0, 0.0],
           "1023": [35.0, 0.0, 0.0]}
    cfg = {"timestamps": ts.tolist(), "image_width": 1024, "points": pts}
    rt = ManualLineRaytracer(cfg, tle)
    prop = SGP4(tle)
    lat_c, lon_c = rt.get_latlon(np.array([512.0]), np.array([1.0]))
    sp = prop.subpoint(np.array([ts[1]]))
    assert vincenty_distance(lat_c[0], lon_c[0], sp[0, 0], sp[0, 1]) < 30

    lat_l, lon_l = rt.get_latlon(np.array([0.0]), np.array([1.0]))
    lat_r, lon_r = rt.get_latlon(np.array([1023.0]), np.array([1.0]))
    dl = vincenty_distance(lat_c[0], lon_c[0], lat_l[0], lon_l[0])
    dr = vincenty_distance(lat_c[0], lon_c[0], lat_r[0], lon_r[0])
    assert 400 < dl < 1300 and abs(dl - dr) / dl < 0.1


def test_atms_product_projects_onto_map(tmp_path):
    """VERDICT r4 missing #3 'done' check: an ATMS-style sounder product
    (normal_single_line, 96 px) produces plausible GCPs and projects onto
    an equirect map through the standard product projection path."""
    from satdump_tpu.geo.raytrace import compute_gcps
    from satdump_tpu.geo.warp import warp_to_equirect

    tle = _tle()
    n_lines = 48
    ts = tle.epoch_unix + np.arange(n_lines) * 2.66
    cfg = {"type": "normal_single_line", "scan_angle": 105.6,
           "image_width": 96, "timestamps": ts.tolist(),
           "tle": tle.to_json()}
    gcps = compute_gcps(cfg, 96, n_lines, nx=9, ny=12)
    assert len(gcps) > 60
    # swath: ATMS edge-to-edge ~2600 km -> lat/lon spread must be degrees
    assert np.ptp(gcps[:, 3]) > 3.0
    img = np.linspace(0, 65535, 96 * n_lines).reshape(n_lines, 96
                                                      ).astype(np.uint16)
    out, georef = warp_to_equirect(img, gcps, out_width=256)
    assert out.shape[1] == 256 and (out > 0).mean() > 0.05
    assert georef["lat_max"] > georef["lat_min"]
    assert georef["lon_max"] > georef["lon_min"]
