"""Firstparty ingest: synthetic .nat / HSD / netCDF / HDF fixtures.

Each fixture is generated from the published format layout (the same
offsets the parsers consume), then ingested and checked pixel-for-pixel —
the same loopback pattern the decode-chain tests use.
"""

import bz2
import struct

import numpy as np
import pytest

from satdump_tpu.products.calibration import calibrate_channel
from satdump_tpu.products.firstparty import (hdf_nc, hsd_ahi, ingest_file,
                                             ingest_files, nat_seviri)
from satdump_tpu.utils.repack import pack_nbits_to_bytes

# ---------------------------------------------------------------- SEVIRI .nat


def _put(buf, off, text):
    b = text.encode()
    buf[off:off + len(b)] = b


def make_seviri_nat(vis_x=10, vis_y=4, hrv_x=30, hrv_y=12):
    headerpos, trailerpos, datapos = 5200, 5300, 6000
    size = 38 + headerpos + 1 + 60134 + 700 + 326058 + 101 + 72 + 192 + 16
    buf = bytearray(b" " * size)

    _put(buf, 604, f"15HEADERPosition : 0 {headerpos}")
    _put(buf, 666, f"15DATAPosition : 0 {datapos}")
    _put(buf, 728, f"15TRAILERPosition : 0 {trailerpos}")
    _put(buf, 2314, "ASTI : MSG4")
    _put(buf, 2394, "LLOS : 9.5")
    _put(buf, 2634, "SSBT : 20240101120000.000Z")
    _put(buf, 4394, "SelectedBandIDs : XX---------X")
    _put(buf, 4794, f"NumberLinesVISIR : {vis_y}")
    _put(buf, 4874, f"NumberColumnsVISIR : {vis_x}")
    _put(buf, 4954, f"NumberLinesHRV : {hrv_y}")
    _put(buf, 5034, f"NumberColumnsHRV : {hrv_x}")

    # calibration: slope=0.02*(ch+1), offset=-1.0
    cal_off = 38 + headerpos + 1 + 60134 + 700 + 326058 + 101 + 72
    coefs = []
    for ch in range(12):
        coefs += [0.02 * (ch + 1), -1.0]
    buf[cal_off:cal_off + 192] = struct.pack(">24d", *coefs)

    # trailer: all-zero actual window (upper case, column offset 0)
    tro = 38 + trailerpos + 1 + 2 + 14 + 12 + 192 + 72 + 16
    buf[tro:tro + 32] = struct.pack(">8i", *([0] * 8))

    def line_pkt(px):
        payload = pack_nbits_to_bytes(np.asarray(px, np.uint16), 10).tobytes()
        pkt = bytearray(65 + len(payload))
        pkt[18:22] = struct.pack(">I", len(payload) + 15 + 27)
        pkt[65:] = payload
        return bytes(pkt)

    vis = {ch: np.arange(vis_y * vis_x).reshape(vis_y, vis_x) % 1024
           for ch in (0, 1)}
    hrv = (7 * np.arange(hrv_y * hrv_x).reshape(hrv_y, hrv_x)) % 1024
    data = bytearray()
    for line in range(vis_y):
        for ch in (0, 1):
            data += line_pkt(vis[ch][line])
        for rep in range(3):
            data += line_pkt(hrv[line * 3 + rep])
    buf[datapos:datapos + len(data)] = data
    return bytes(buf), vis, hrv


def test_seviri_nat_roundtrip(tmp_path):
    raw, vis, hrv = make_seviri_nat()
    p = nat_seviri.parse_seviri_nat(raw)
    assert p is not None and p.instrument_name == "seviri"
    assert p.get_product_source() == "MSG-4"
    assert abs(p.get_product_timestamp() - 1704110400.0) < 1
    names = [h.channel_name for h in p.images]
    assert names == ["1", "2", "12"]
    for ch in (0, 1):
        got = p.get_channel(str(ch + 1)).image
        np.testing.assert_array_equal(
            got, (vis[ch][::-1, ::-1].astype(np.uint16)) << 6)
    got = p.get_channel("12").image
    np.testing.assert_array_equal(got, (hrv[::-1, ::-1].astype(np.uint16)) << 6)
    assert p.get_proj_cfg()["type"] == "geos"
    assert abs(p.get_proj_cfg()["lon0"] - 9.5) < 1e-9

    # calibration: counts>>6 through slope/offset for channel 4 idx 0
    cal = calibrate_channel(p, "1")
    expect = -1.0 + vis[0][::-1, ::-1].astype(float) * 0.02
    mask = vis[0][::-1, ::-1] != 0
    np.testing.assert_allclose(cal[mask], expect[mask], rtol=1e-12)


# -------------------------------------------------------------- Himawari HSD


def make_hsd_segment(seg_no, nsegs=2, ncols=8, nlines=4, channel=1,
                     bit_depth=11):
    lens = [64, 16, 48, 8, 48, 8, 8, 8, 8, 8, 8]
    offs = np.cumsum([0] + lens).tolist()
    buf = bytearray(offs[-1])
    for i, ln in enumerate(lens):
        buf[offs[i]] = i + 1
        buf[offs[i] + 1:offs[i] + 3] = struct.pack("<H", ln)

    _put(buf, offs[0] + 6, "Himawari-9")
    buf[offs[0] + 6 + 10] = 0
    buf[offs[0] + 46:offs[0] + 54] = struct.pack("<d", 60310.5)  # MJD
    buf[offs[1] + 5:offs[1] + 9] = struct.pack("<HH", ncols, nlines)
    buf[offs[1] + 9] = 0
    buf[offs[2] + 3:offs[2] + 27] = struct.pack(
        "<diiff", 140.7, 20466275, 20466275, 2750.5, 2750.5)
    buf[offs[2] + 27:offs[2] + 43] = struct.pack("<dd", 42164.0, 6378.137)
    buf[offs[4] + 3:offs[4] + 5] = struct.pack("<H", channel)
    buf[offs[4] + 5:offs[4] + 13] = struct.pack("<d", 0.47)
    buf[offs[4] + 13] = bit_depth
    buf[offs[4] + 19:offs[4] + 35] = struct.pack("<dd", 0.3, -2.0)
    buf[offs[4] + 35:offs[4] + 43] = struct.pack("<d", 0.002)
    buf[offs[6] + 3] = nsegs
    buf[offs[6] + 4] = seg_no  # sequence number (u8)
    # +5: FIRST LINE NUMBER of this segment (u16, 1-based) — the real HSD
    # placement key (ahi_hsd.cpp:71), not a segment index
    buf[offs[6] + 5:offs[6] + 7] = struct.pack(
        "<H", (seg_no - 1) * nlines + 1)

    px = ((seg_no * 1000 + np.arange(ncols * nlines)) % 2047).astype("<u2")
    px[3] = 65535  # fill pixel -> 0
    return bytes(buf) + px.tobytes(), px


def test_hsd_two_segments(tmp_path):
    f1, px1 = make_hsd_segment(1)
    f2, px2 = make_hsd_segment(2)
    paths = []
    for i, f in enumerate((f1, f2)):
        path = tmp_path / f"HS_H09_B01_S{i+1}.DAT.bz2"
        path.write_bytes(bz2.compress(f))
        paths.append(str(path))
    prods = ingest_files(paths)
    assert len(prods) == 1
    p = prods[0]
    assert p.instrument_name == "ahi"
    assert p.get_product_source() == "Himawari-9"
    img = p.get_channel("1").image
    assert img.shape == (8, 8)
    exp = np.concatenate([
        np.where(px1 >= 65534, 0, px1).astype(np.uint16).reshape(4, 8),
        np.where(px2 >= 65534, 0, px2).astype(np.uint16).reshape(4, 8)]) << 5
    np.testing.assert_array_equal(img, exp)
    cfg = p.get_proj_cfg()
    assert cfg["type"] == "geos" and abs(cfg["lon0"] - 140.7) < 1e-9
    # reflective channel (kappa>0) -> albedo = kappa*radiance, applied
    # unconditionally as the reference does (abi_nc_calibrator.h:49-50)
    cal = calibrate_channel(p, "1")
    rad = -2.0 + exp.astype(float) * (0.3 / 32.0)
    np.testing.assert_allclose(cal, 0.002 * rad, rtol=1e-9)


# ------------------------------------------------------------- HDF5 / netCDF

h5py = pytest.importorskip("h5py")


def make_abi_nc(path, band=7, shape=(6, 8), kappa=np.nan):
    img = (np.arange(shape[0] * shape[1], dtype=np.uint16
                     ).reshape(shape) * 300) % 16383
    img[0, 0] = 16383  # fill
    with h5py.File(path, "w") as f:
        rad = f.create_dataset("Rad", data=img)
        rad.attrs["scale_factor"] = np.float64(0.1)
        rad.attrs["add_offset"] = np.float64(-1.0)
        rad.attrs["sensor_band_bit_depth"] = np.int32(14)
        f.create_dataset("band_id", data=np.array([band], np.int8))
        f.create_dataset("kappa0", data=np.array([kappa]))
        x = f.create_dataset("x", data=np.arange(shape[1], dtype=np.int16))
        x.attrs["scale_factor"] = np.float64(5.6e-5)
        x.attrs["add_offset"] = np.float64(-0.1)
        y = f.create_dataset("y", data=np.arange(shape[0], dtype=np.int16))
        y.attrs["scale_factor"] = np.float64(-5.6e-5)
        y.attrs["add_offset"] = np.float64(0.1)
        gp = f.create_dataset("goes_imager_projection", data=np.int8(0))
        gp.attrs["perspective_point_height"] = np.float64(35786023.0)
        gp.attrs["longitude_of_projection_origin"] = np.float64(-75.0)
        f.attrs["platform_ID"] = np.bytes_("G16")
        f.attrs["time_coverage_start"] = np.bytes_("2024-03-05T17:30:00.5Z")
    return img


def test_abi_nc(tmp_path):
    path = tmp_path / "OR_ABI-L1b-RadF-M6C07_G16.nc"
    img = make_abi_nc(str(path))
    p = ingest_file(str(path))
    assert p is not None and p.instrument_name == "abi"
    assert p.get_product_source() == "G16"
    h = p.get_channel("7")
    exp = (np.where(img >= 16383, 0, img).astype(np.uint16)) << 2
    np.testing.assert_array_equal(h.image, exp)
    cfg = p.get_proj_cfg()
    assert cfg["sweep_x"] is True and abs(cfg["lon0"] + 75.0) < 1e-9
    cal = calibrate_channel(p, "7")  # IR: radiance
    np.testing.assert_allclose(cal, -1.0 + exp.astype(float) * 0.1 / 4.0,
                               rtol=1e-9)


def test_abi_nc_multiband_merge(tmp_path):
    """One .nc per band (the normal distribution) -> ONE multi-channel
    product, as the reference's ABINcProcessor accumulates
    (abi_nc.cpp:168-190); earlier bands must not be overwritten."""
    from satdump_tpu.products.firstparty import ingest_files
    p2 = tmp_path / "OR_ABI-L1b-RadF-M6C02_G16.nc"
    p7 = tmp_path / "OR_ABI-L1b-RadF-M6C07_G16.nc"
    img2 = make_abi_nc(str(p2), band=2, shape=(12, 16), kappa=0.0015)
    img7 = make_abi_nc(str(p7), band=7)
    prods = ingest_files([str(p2), str(p7)])
    assert len(prods) == 1
    p = prods[0]
    assert {h.channel_name for h in p.images} == {"2", "7"}
    exp7 = (np.where(img7 >= 16383, 0, img7).astype(np.uint16)) << 2
    np.testing.assert_array_equal(p.get_channel("7").image, exp7)
    # band 7 (6x8) maps onto the base 12x16 grid via its transform
    t = p.get_channel("7").ch_transform
    assert t.ax == 2.0 and t.ay == 2.0
    # reflective band: kappa applied, no x100
    cal2 = calibrate_channel(p, "2")
    exp2 = (np.where(img2 >= 16383, 0, img2).astype(np.uint16)) << 2
    np.testing.assert_allclose(
        cal2, 0.0015 * (-1.0 + exp2.astype(float) * 0.1 / 4.0), rtol=1e-9)
    # IR band still plain radiance (is_spectral=false for ABI .nc)
    cal7 = calibrate_channel(p, "7")
    np.testing.assert_allclose(cal7, -1.0 + exp7.astype(float) * 0.1 / 4.0,
                               rtol=1e-9)


def test_fy4_agri_hdf(tmp_path):
    path = tmp_path / "FY4A-AGRI-L1.hdf"
    img = (np.arange(64, dtype=np.uint16).reshape(8, 8) * 9) % 4096
    lut = np.linspace(180.0, 320.0, 4096)
    with h5py.File(path, "w") as f:
        g = f.create_group("Data")
        g.create_dataset("NOMChannel01", data=img)
        f.create_group("Calibration").create_dataset(
            "CALChannel01", data=lut)
    p = ingest_file(str(path))
    assert p.instrument_name == "agri"
    np.testing.assert_array_equal(p.get_channel("1").image, img)
    cal = calibrate_channel(p, "1")
    np.testing.assert_allclose(cal, lut[img], rtol=1e-12)


def test_hdf_generic_fallback(tmp_path):
    path = tmp_path / "random_l1.h5"
    a = np.random.default_rng(0).normal(size=(16, 16))
    with h5py.File(path, "w") as f:
        f.create_group("obs").create_dataset("tb_89ghz", data=a)
    p = ingest_file(str(path))
    assert p.instrument_name == "hdf"
    assert p.images[0].channel_name == "obs_tb_89ghz"
    assert p.images[0].image.shape == (16, 16)


def test_cli_ingest(tmp_path):
    from satdump_tpu.cli import main
    path = tmp_path / "OR_ABI-L1b-RadF-M6C13_G18.nc"
    make_abi_nc(str(path))
    out = tmp_path / "out"
    rc = main(["ingest", str(path), "-o", str(out)])
    assert rc == 0
    assert (out / "dataset.json").exists()
    assert (out / "abi" / "product.cbor").exists()
