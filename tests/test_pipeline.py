"""Pipeline engine tests: JSON loading (own + reference files) and the
soft->cadu decode chain end-to-end (bit-exact after FEC)."""

import os
from pathlib import Path

import numpy as np
import pytest

from satdump_tpu import sim
from satdump_tpu.pipeline.pipeline import parse_pipeline_file, Pipeline

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")


def test_parse_own_pipelines():
    p = parse_pipeline_file(REPO / "resources/pipelines/MetOp.json")
    assert "metop_ahrpt" in p
    pl = p["metop_ahrpt"]
    assert pl.steps[0].level == "baseband"
    assert pl.steps[1].module_id == "psk_demod"
    assert pl.steps[1].parameters["constellation"] == "qpsk"
    assert pl.level_index("baseband") == 0
    merged = pl.prepare_parameters(pl.steps[1], {"samplerate": 3e6})
    assert merged["samplerate"] == 3e6
    assert merged["symbolrate"] == 2333333


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
@pytest.mark.parametrize("fname", ["NOAA.json", "MetOp.json", "Meteor-M.json", "GOES.json"])
def test_parse_reference_pipelines(fname):
    """Our parser must read the reference's actual pipeline files unchanged."""
    p = parse_pipeline_file(REFERENCE / "resources/pipelines" / fname)
    assert len(p) >= 1
    for pl in p.values():
        assert pl.steps, pl.id
        assert pl.steps[0].level in ("baseband", "file")


def test_module_registry():
    from satdump_tpu.pipeline.module import register_all_modules, module_registry
    register_all_modules()
    for mid in ["psk_demod", "noaa_apt_demod", "noaa_apt_decoder",
                "ccsds_conv_concat_decoder", "metop_ahrpt_decoder",
                "meteor_lrpt_decoder", "fm_demod"]:
        assert mid in module_registry


def _run_decoder_on_soft(tmp_path, soft, module_id="metop_ahrpt_decoder", params=None):
    from satdump_tpu.pipeline.module import register_all_modules, module_registry
    register_all_modules()
    soft_path = tmp_path / "in.soft"
    soft.astype(np.int8).tofile(soft_path)
    cls = module_registry.get(module_id)
    mod = cls(str(soft_path), str(tmp_path / "out"), params or {})
    mod.init()
    mod.process()
    mod.stop()
    cadus = np.fromfile(mod.d_output_file, dtype=np.uint8)
    return cadus.reshape(-1, 1024), mod.getModuleStats()


def test_soft_to_cadu_clean(tmp_path, rng):
    """Ideal softs -> decoder must reproduce every CADU bit-exactly."""
    cadus = sim.make_cadus(12, rng)
    chan_bits = sim.encode_cadu_stream(cadus)
    soft = sim.symbols_to_soft_int8(chan_bits)
    got, stats = _run_decoder_on_soft(tmp_path, soft)
    # first frame may fall inside viterbi warm-up; all locked frames bit-exact
    assert len(got) >= 10
    matched = sum(bool((c == g).all()) for g in got for c in cadus)
    assert matched == len(got)
    assert stats["viterbi_ber"] < 0.05


def test_soft_to_cadu_phase_rotated(tmp_path, rng):
    """90-degree rotated constellation must be found by the phase search."""
    cadus = sim.make_cadus(8, rng)
    chan_bits = sim.encode_cadu_stream(cadus)
    soft = sim.symbols_to_soft_int8(chan_bits)
    # rotate IQ pairs by 90 deg: (i,q) -> (-q, i)
    i, q = soft[0::2].copy(), soft[1::2].copy()
    rot = np.empty_like(soft)
    rot[0::2], rot[1::2] = -q, i
    got, stats = _run_decoder_on_soft(tmp_path, rot)
    assert len(got) >= 6
    matched = sum(bool((c == g).all()) for g in got for c in cadus)
    assert matched == len(got)


def test_soft_to_cadu_noisy(tmp_path, rng):
    """Noisy softs: RS must clean residual Viterbi errors; frames bit-exact."""
    cadus = sim.make_cadus(12, rng)
    chan_bits = sim.encode_cadu_stream(cadus)
    clean = sim.symbols_to_soft_int8(chan_bits).astype(np.float32)
    noisy = clean + rng.normal(0, 55.0, clean.shape)  # ~5.2 dB Es/N0 per bit branch
    soft = np.clip(noisy, -127, 127).astype(np.int8)
    got, stats = _run_decoder_on_soft(tmp_path, soft)
    assert len(got) >= 9
    matched = sum(bool((c == g).all()) for g in got for c in cadus)
    assert matched == len(got)
    assert stats["rs_avg"] >= 0


def test_soft_to_cadu_nrzm(tmp_path, rng):
    cadus = sim.make_cadus(8, rng)
    chan_bits = sim.encode_cadu_stream(cadus, nrzm=True)
    soft = sim.symbols_to_soft_int8(chan_bits)
    got, stats = _run_decoder_on_soft(
        tmp_path, soft, module_id="meteor_lrpt_decoder", params={"diff_decode": True})
    assert len(got) >= 6
    matched = sum(bool((c == g).all()) for g in got for c in cadus)
    assert matched == len(got)


def test_ziq_roundtrip(tmp_path, rng):
    from satdump_tpu.io.ziq import is_ziq, read_ziq, write_ziq
    # keep |x| < 1: the int formats clip at full-scale (ref ziq.cpp x127)
    x = ((rng.standard_normal(1000) + 1j * rng.standard_normal(1000)) * 0.15
         ).astype(np.complex64)
    x = np.clip(x.real, -0.95, 0.95) + 1j * np.clip(x.imag, -0.95, 0.95)
    x = x.astype(np.complex64)
    for bits, tol in [(8, 1 / 127 + 1e-3), (16, 1e-4), (32, 0)]:
        for comp in (True, False):
            p = tmp_path / f"t{bits}{comp}.ziq"
            write_ziq(p, x, samplerate=6e6, bits_per_sample=bits,
                      compress=comp, annotation={"frequency": 137.1e6})
            assert is_ziq(p)
            y, sr, ann = read_ziq(p)
            assert sr == 6e6
            assert ann["frequency"] == 137.1e6
            assert np.abs(y - x).max() <= tol + 1e-9


def test_ziq_block_reader(tmp_path, rng):
    from satdump_tpu.io import BasebandReader, detect_baseband_format, write_ziq
    x = ((rng.standard_normal(3000) + 1j * rng.standard_normal(3000)) * 0.1
         ).astype(np.complex64)
    p = tmp_path / "r.ziq"
    write_ziq(p, x, samplerate=1e6, bits_per_sample=16)
    assert detect_baseband_format(p) == "ziq"
    rd = BasebandReader(p, "ziq", block_size=1024)
    assert rd.samplerate == 1e6
    got = rd.read_all()
    assert got.shape[0] == 3000
    assert np.abs(got - x).max() < 1e-4


def test_json_inc_include(tmp_path):
    """A pipeline whose whole `work` dict comes from a .json.inc include must
    load (textual substitution semantics, ref pipeline.cpp:25-67)."""
    from satdump_tpu.pipeline.pipeline import parse_pipeline_file
    (tmp_path / "common.json.inc").write_text(
        '{"baseband": {}, "soft": {"module": "psk_demod", '
        '"parameters": {"constellation": "qpsk"}}}')
    (tmp_path / "pipes.json").write_text(
        '{"test_inc": {"name": "T", "work": "common.json.inc"}}')
    pipes = parse_pipeline_file(tmp_path / "pipes.json")
    assert "test_inc" in pipes
    p = pipes["test_inc"]
    assert [s.level for s in p.steps] == ["baseband", "soft"]
    assert p.steps[1].module_id == "psk_demod"


def test_mission_pipeline_breadth():
    """VERDICT r1 #9: >= 25 mission pipelines load and every referenced
    module id resolves in the registry."""
    from satdump_tpu.pipeline.module import (module_registry,
                                             register_all_modules)
    from satdump_tpu.pipeline.pipeline import (load_pipelines_dir,
                                               pipeline_registry)
    register_all_modules()
    load_pipelines_dir("resources/pipelines")
    ids = [k for k, _ in pipeline_registry.items()]
    assert len(ids) >= 25, f"only {len(ids)} pipelines"
    for pid in ids:
        p = pipeline_registry.get(pid)
        for st in p.steps:
            if st.module_id:
                assert module_registry.get_opt(st.module_id) is not None, \
                    (pid, st.module_id)


def test_runner_autoprocesses_products(tmp_path, rng):
    """The offline runner must auto-run the products processor when the
    last module writes dataset.json (ref pipeline_run.cpp:172-207) —
    composites appear from one `pipeline` invocation."""
    from test_metop import _avhrr_packet, _metop_cadus
    from satdump_tpu.pipeline.pipeline import PipelineStep
    from satdump_tpu.pipeline.runner import run_pipeline

    lines = rng.integers(0, 1024, (5, 2048, 5), dtype=np.uint16)
    pkts = [_avhrr_packet(lines[i], ch3a=True, seq=i, ms=166 * i)
            for i in range(5)]
    cadu_path = tmp_path / "x.cadu"
    _metop_cadus(pkts).tofile(cadu_path)

    pipe = Pipeline(id="metop_test", name="t", steps=[
        PipelineStep("cadu", ""),
        PipelineStep("products", "metop_instruments", {}),
    ], parameters={})
    out = tmp_path / "out"
    run_pipeline(pipe, str(cadu_path), str(out), start_level="cadu")
    assert (out / "dataset.json").exists()
    pngs = list((out / "AVHRR").glob("avhrr_3_*.png"))
    assert pngs, "runner did not auto-generate composites"
