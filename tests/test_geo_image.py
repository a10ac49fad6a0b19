"""Geo/image parity additions: tmerc/tpers projections, earth-curvature and
bowtie corrections, shapefile/GeoJSON readers, map overlays, GeoTIFF IO."""

import json

import numpy as np
import pytest

from satdump_tpu.geo import projs


def test_tmerc_roundtrip():
    lon = np.array([-40.0, 10.0, 55.0, -120.0])
    lat = np.array([12.0, -35.0, 61.0, 0.5])
    cfg = {"type": "tmerc", "lon0": 9.0}
    x, y = projs.forward(cfg, lon, lat)
    lo, la = projs.inverse(cfg, x, y)
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)


def test_tpers_roundtrip_and_visibility():
    cfg = {"type": "tpers", "lon0": 0.0, "lat0": 20.0, "altitude": 3.6e7}
    lon = np.array([-40.0, 10.0, 55.0, -120.0])
    lat = np.array([12.0, -35.0, 61.0, 0.5])
    x, y = projs.forward(cfg, lon, lat)
    assert np.isnan(x[3])                    # far side not visible
    m = np.isfinite(x)
    lo, la = projs.inverse(cfg, x[m], y[m])
    np.testing.assert_allclose(lo, lon[m], atol=1e-8)
    np.testing.assert_allclose(la, lat[m], atol=1e-8)
    # LEO altitude: only near-nadir points visible
    cfg_leo = {"type": "tpers", "lon0": 10.0, "lat0": -35.0,
               "altitude": 8e5}
    x2, _ = projs.forward(cfg_leo, lon, lat)
    assert np.isfinite(x2[1]) and np.isnan(x2[0])


def test_earth_curvature_correction(rng):
    from satdump_tpu.image.geometry import (correct_earth_curvature,
                                            earth_curvature_table)
    img = rng.integers(0, 255, (3, 10, 2048), dtype=np.uint8)
    out, rev = correct_earth_curvature(img, 820.0, 2900.0, 1.0)
    assert out.shape == (3, 10, 2900)
    # the mapping is monotonic and spans the input width
    cf = earth_curvature_table(2048, 820.0, 2900.0, 1.0)
    assert (np.diff(cf) > 0).all()
    assert cf[0] < 10 and cf[-1] > 2038
    # center stays put: output center column maps to the input center
    assert abs(cf[1450] - 1024) < 2


def test_bowtie_correction(rng):
    from satdump_tpu.image.geometry import correct_generic_bowtie
    # a scan whose rows are constant: bowtie resample must keep values
    scan_h, w = 10, 64
    img = np.repeat(np.arange(4 * scan_h, dtype=np.uint16)[:, None], w,
                    axis=1)
    out = correct_generic_bowtie(img, scan_h, 1.0 / 3.0, 2.0 / 3.0)
    assert out.shape == img.shape
    # center column is near-unchanged (full center counts)
    assert np.abs(out[:, w // 2].astype(int)
                  - img[:, w // 2].astype(int)).max() <= 4
    # edge columns compress toward scan centers: first output line of each
    # scan pulls from a later source line
    assert out[0, 0] >= img[0, 0]


def test_shapefile_point_reader():
    from satdump_tpu.geo.shapefile import read_shapefile
    t, geoms = read_shapefile(
        "/root/reference/resources/maps/ne_10m_populated_places_simple.shp")
    assert t == 1
    pts = geoms[0]
    assert pts.shape[0] > 1000
    assert (np.abs(pts[:, 0]) <= 180).all()
    assert (np.abs(pts[:, 1]) <= 90).all()


def test_geojson_reader_and_overlay(tmp_path):
    from satdump_tpu.geo.shapefile import read_geojson
    from satdump_tpu.image.overlay import draw_map_overlay, draw_latlon_grid
    gj = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": {
            "type": "LineString",
            "coordinates": [[-10.0, 0.0], [10.0, 0.0], [10.0, 20.0]]}},
        {"type": "Feature", "geometry": {
            "type": "Polygon",
            "coordinates": [[[0, 0], [5, 0], [5, 5], [0, 0]]]}},
    ]}
    p = tmp_path / "m.geojson"
    p.write_text(json.dumps(gj))
    lines = read_geojson(p)
    assert len(lines) == 2

    img = np.zeros((180, 360, 3), np.uint8)

    def to_xy(lon, lat):
        return (np.asarray(lon) + 180.0, 90.0 - np.asarray(lat))

    draw_map_overlay(img, to_xy, str(p), (0, 255, 0))
    assert (img[90, 175] == [0, 255, 0]).all()   # on the equator segment
    before = img.sum()
    draw_latlon_grid(img, to_xy, (255, 0, 0), spacing_deg=30)
    assert img.sum() > before


def test_geotiff_roundtrip(tmp_path, rng):
    from satdump_tpu.image.geotiff import read_geotiff_tags, save_geotiff
    img = rng.integers(0, 255, (40, 60), dtype=np.uint8)
    p = tmp_path / "x.tif"
    save_geotiff(img, p, lon_min=-30.0, lat_max=60.0,
                 lon_res=0.25, lat_res=0.5)
    t = read_geotiff_tags(p)
    assert t["width"] == 60 and t["height"] == 40
    assert t["lon_min"] == -30.0 and t["lat_max"] == 60.0
    assert t["geo_keys"][2048] == 4326
    # pixels readable by a third-party decoder (PIL)
    from PIL import Image
    assert np.array_equal(np.array(Image.open(p)), img)


def test_smart_warp_matches_simple_warp(rng):
    """Tiled smart warp must agree with the global warp away from tile
    boundaries (ref smart_warp.cpp vs warp.cpp single-pass)."""
    from satdump_tpu.geo.warp import smart_warp_to_equirect, warp_to_equirect
    h, w = 64, 96
    img = rng.integers(0, 255, (h, w), dtype=np.uint8)
    # GCPs from a smooth affine-ish mapping img(x,y) -> lon/lat
    xs, ys = np.meshgrid(np.linspace(0, w - 1, 8), np.linspace(0, h - 1, 8))
    lon = 10.0 + xs * 0.01 + ys * 0.002
    lat = 45.0 - ys * 0.01 + xs * 0.001
    gcps = np.stack([xs.ravel(), ys.ravel(), lon.ravel(), lat.ravel()], -1)
    full, georef1 = warp_to_equirect(img, gcps, out_width=256)
    tiled, georef2 = smart_warp_to_equirect(img, gcps, out_width=256,
                                            tile=64, gcps_per_tile=40)
    assert georef1 == georef2
    assert tiled.shape == full.shape
    nz = (full > 0) & (tiled > 0)
    assert nz.mean() > 0.5
    diff = np.abs(full.astype(int) - tiled.astype(int))[nz]
    assert float(np.mean(diff)) < 2.0
