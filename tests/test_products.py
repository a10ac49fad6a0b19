"""Products layer tests: save/load round trip, expression compositor,
image processing ops (golden vs NumPy)."""

import numpy as np
import pytest

from satdump_tpu.products.product import DataSet, load_product
from satdump_tpu.products.image_product import ChannelTransform, ImageProduct


def _mk_product(rng):
    p = ImageProduct()
    p.instrument_name = "avhrr_3"
    ch1 = rng.integers(0, 1024, (64, 128)).astype(np.uint16)
    ch2 = rng.integers(0, 1024, (64, 128)).astype(np.uint16)
    p.add_channel(ch1 << 6, "1", bit_depth=16, wavenumber=1600.0)
    p.add_channel(ch2 << 6, "2", bit_depth=16,
                  ch_transform=ChannelTransform.affine(1.0, 1.0, 0.5, 0.0))
    p.set_proj_cfg_tle_timestamps(
        {"type": "normal_line", "scan_angle": 110.8},
        {"name": "NOAA 19", "line1": "1 ...", "line2": "2 ..."},
        [1700000000.0 + i / 6.0 for i in range(64)])
    return p


def test_image_product_roundtrip(tmp_path, rng):
    p = _mk_product(rng)
    p.save(str(tmp_path / "AVHRR"))

    q = load_product(str(tmp_path / "AVHRR" / "product.json"))
    assert isinstance(q, ImageProduct)
    assert q.instrument_name == "avhrr_3"
    assert len(q.images) == 2
    assert np.array_equal(q.get_channel("1").image, p.get_channel("1").image)
    assert q.get_channel("2").ch_transform.bx == 0.5
    assert q.has_proj_cfg()
    cfg = q.get_proj_cfg(1)
    assert cfg["width"] == 128 and cfg["height"] == 64
    assert q.get_product_source() == "NOAA 19"
    # median timestamp became the product timestamp
    assert abs(q.get_product_timestamp() - (1700000000.0 + 31.5 / 6.0)) < 0.2


def test_dataset_roundtrip(tmp_path):
    ds = DataSet("MetOp-B", 1700000000.0)
    ds.products_list = ["AVHRR", "MHS"]
    ds.save(str(tmp_path))
    ds2 = DataSet.load(str(tmp_path / "dataset.json"))
    assert ds2.satellite_name == "MetOp-B"
    assert ds2.products_list == ["AVHRR", "MHS"]


def test_expression_compositor(rng):
    from satdump_tpu.image.expression import compile_expression
    a = rng.random((32, 32)).astype(np.float32)
    b = rng.random((32, 32)).astype(np.float32)
    f = compile_expression("ch2, ch2, ch1")
    out = f({"ch1": a, "ch2": b})
    assert out.shape == (32, 32, 3)
    np.testing.assert_allclose(out[..., 0], np.clip(b, 0, 1), atol=1e-6)
    np.testing.assert_allclose(out[..., 2], np.clip(a, 0, 1), atol=1e-6)

    g = compile_expression("(ch2 - ch1) / (ch2 + ch1 + 0.001)")
    out2 = g({"ch1": a, "ch2": b})
    ref = np.clip((b - a) / (b + a + 0.001), 0, 1)
    np.testing.assert_allclose(out2, ref, atol=1e-5)

    h = compile_expression("max(ch1, ch2) * 0.5 + min(ch1, 0.3)")
    out3 = h({"ch1": a, "ch2": b})
    ref3 = np.clip(np.maximum(a, b) * 0.5 + np.minimum(a, 0.3), 0, 1)
    np.testing.assert_allclose(out3, ref3, atol=1e-5)


def test_expression_rejects_evil():
    from satdump_tpu.core.exceptions import SatdumpError
    from satdump_tpu.image.expression import compile_expression
    a = np.zeros((4, 4), np.float32)
    with pytest.raises(SatdumpError):
        compile_expression("__import__('os')")({"ch1": a})
    with pytest.raises(SatdumpError):
        compile_expression("ch1.mean()")({"ch1": a})


def test_processing_ops(rng):
    from satdump_tpu.image import processing as ip
    img = (rng.random((40, 40)) * 65535).astype(np.uint16)
    eq = ip.equalize(img)
    assert eq.dtype == np.uint16 and eq.shape == img.shape
    # equalized histogram is flatter: CDF closer to linear
    h_eq = np.cumsum(np.histogram(eq, 64, (0, 65535))[0]) / eq.size
    lin = np.linspace(1 / 64, 1, 64)
    h_raw = np.cumsum(np.histogram(img, 64, (0, 65535))[0]) / img.size
    assert np.abs(h_eq - lin).mean() <= np.abs(h_raw - lin).mean() + 1e-3

    bc = ip.brightness_contrast(img, 0.2, 0.1)
    assert bc.dtype == np.uint16
    assert bc.astype(np.int64).mean() > img.astype(np.int64).mean()

    rgb = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    wb = ip.white_balance(rgb)
    assert wb.shape == rgb.shape

    # median blur kills salt-and-pepper
    noisy = img.copy()
    noisy[5, 5] = 65535
    mb = ip.median_blur(noisy, 3)
    assert mb[5, 5] < 65535

    inv = ip.linear_invert(img)
    np.testing.assert_allclose(inv, 65535 - img, atol=1)


def test_expression_nary_min_max(rng):
    from satdump_tpu.image.expression import compile_expression
    a = rng.random((4, 5)).astype(np.float32)
    b = rng.random((4, 5)).astype(np.float32)
    c = rng.random((4, 5)).astype(np.float32)
    env = {"ch1": a, "ch2": b, "ch3": c}
    out = compile_expression("min(ch1, ch2, ch3)")(env)
    np.testing.assert_allclose(out, np.minimum(np.minimum(a, b), c), rtol=1e-6)
    out1 = compile_expression("max(ch1)")(env)
    np.testing.assert_allclose(out1, np.clip(a, 0, 1), rtol=1e-6)
