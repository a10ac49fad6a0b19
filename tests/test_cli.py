"""CLI + products processor tests (ref CLI surface: core/cli/cli.cpp:41-56)."""

import json

import numpy as np
import pytest

from satdump_tpu.cli import _collect_kv, main


def test_collect_kv():
    assert _collect_kv(["--samplerate", "6e6", "--flag", "--name=x",
                        "--n", "3"]) == {
        "samplerate": 6e6, "flag": True, "name": "x", "n": 3}


def test_collect_kv_rejects_positional():
    with pytest.raises(SystemExit):
        _collect_kv(["oops"])


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "noaa_apt" in out
    assert "metop_ahrpt" in out
    assert "psk_demod" in out


def test_cli_probe(capsys):
    assert main(["probe"]) == 0
    j = json.loads(capsys.readouterr().out)
    assert j["device_count"] >= 1


def test_cli_unknown_pipeline():
    assert main(["pipeline", "definitely_not_real", "baseband",
                 "in.cf32", "out"]) == 2


def test_process_product(tmp_path, capsys):
    from satdump_tpu.products.image_product import ImageProduct

    rng = np.random.default_rng(3)
    p = ImageProduct()
    p.instrument_name = "avhrr_3"
    for name in ["1", "2", "3a", "3b", "4", "5"]:
        p.add_channel((rng.random((32, 64)) * 65535).astype(np.uint16), name)
    pdir = tmp_path / "AVHRR"
    p.save(str(pdir))

    assert main(["process", str(pdir)]) == 0
    made = list(pdir.glob("avhrr_3_*.png"))
    assert len(made) >= 3  # 221, 321, ch4_thermal autogen presets

    # preset cache: second run writes nothing new
    from satdump_tpu.products.processor import process_path
    assert process_path(str(pdir)) == []


def test_process_dataset(tmp_path):
    from satdump_tpu.products.image_product import ImageProduct
    from satdump_tpu.products.product import DataSet
    from satdump_tpu.products.processor import process_path

    rng = np.random.default_rng(4)
    p = ImageProduct()
    p.instrument_name = "avhrr_3"
    for name in ["1", "2", "3a", "3b", "4", "5"]:
        p.add_channel((rng.random((16, 32)) * 65535).astype(np.uint16), name)
    p.save(str(tmp_path / "AVHRR"))
    ds = DataSet("MetOp-B", 0.0)
    ds.products_list.append("AVHRR")
    ds.save(str(tmp_path))

    written = process_path(str(tmp_path))
    assert len(written) >= 3
