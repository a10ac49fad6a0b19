"""Any-pair reprojection: geos-projected source -> equirect/stereo targets."""

import numpy as np

from satdump_tpu.geo import projs
from satdump_tpu.geo.reproject import reproject


def _geos_source(n=96, lon0=140.0):
    """Synthetic geos image whose pixel value encodes latitude."""
    scalar = 120000.0
    cfg = {"type": "geos", "lon0": lon0, "sweep_x": False,
           "scalar_x": scalar, "scalar_y": -scalar,
           "offset_x": -scalar * (n / 2), "offset_y": scalar * (n / 2),
           "width": n, "height": n}
    u, v = np.meshgrid(np.arange(n), np.arange(n))
    px = u * cfg["scalar_x"] + cfg["offset_x"]
    py = v * cfg["scalar_y"] + cfg["offset_y"]
    lon, lat = projs.geos_inverse(px, py, lon0=lon0)
    img = np.where(np.isfinite(lat), (np.nan_to_num(lat) + 90.0) * 300.0,
                   0.0).astype(np.uint16)
    return img, cfg


def test_geos_to_equirect_lat_field():
    img, cfg = _geos_source()
    out, georef = reproject(img, cfg, {"type": "equirectangular"},
                            out_width=200)
    assert georef["width"] == 200 and out.shape[1] == 200
    gx = np.linspace(georef["x_min"], georef["x_max"], georef["width"])
    gy = np.linspace(georef["y_max"], georef["y_min"], georef["height"])
    mx, my = np.meshgrid(gx, gy)
    lon, lat = projs.equirect_inverse(mx, my)
    got = out.astype(float) / 300.0 - 90.0
    # compare only where all four bilinear source neighbors are on-disk
    # (at the limb the sample legitimately blends with off-disk zeros)
    from satdump_tpu.geo.reproject import src_pixel_coords
    sx, sy = src_pixel_coords(cfg, lon, lat)
    with np.errstate(invalid="ignore"):
        x0 = np.nan_to_num(np.floor(sx), nan=-9).astype(int)
        y0 = np.nan_to_num(np.floor(sy), nan=-9).astype(int)
    n = img.shape[0]
    inb = (x0 >= 0) & (x0 < n - 1) & (y0 >= 0) & (y0 < n - 1)
    x0c, y0c = np.clip(x0, 0, n - 2), np.clip(y0, 0, n - 2)
    mask = inb & (img[y0c, x0c] > 0) & (img[y0c, x0c + 1] > 0) \
        & (img[y0c + 1, x0c] > 0) & (img[y0c + 1, x0c + 1] > 0)
    assert mask.mean() > 0.3
    err = np.abs(got[mask] - lat[mask])
    assert np.median(err) < 0.05
    assert np.percentile(err, 95) < 0.5


def test_geos_to_stereo_runs():
    img, cfg = _geos_source()
    out, georef = reproject(img, cfg, {"type": "stereo", "lat0": 90.0,
                                       "lon0": 140.0}, out_width=128)
    assert (out > 0).any()
