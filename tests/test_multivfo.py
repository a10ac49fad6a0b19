"""Multi-VFO live: two simultaneous carriers in one wideband stream decode
through two per-VFO live pipelines (VERDICT r4 missing #5; ref
src-interface/recorder/recorder.h:174-178 add_vfo_live/add_vfo_reco)."""

import numpy as np
import pytest

from satdump_tpu import sim
from satdump_tpu.pipeline.multivfo import MultiVFOLive
from satdump_tpu.pipeline.pipeline import Pipeline, PipelineStep


def _qpsk_bb(rng, n_cadus, seed):
    cadus = sim.make_cadus(n_cadus, rng)
    syms = sim.bits_to_qpsk_symbols(sim.encode_cadu_stream(cadus))
    tx = sim.qpsk_modulate(syms, sps=2.0)
    bb = sim.ChannelModel(snr_db=20.0, freq_offset=0.0, phase=0.3,
                          seed=seed).apply(tx)
    return cadus, bb


def _pipe(pid):
    return Pipeline(
        id=pid, name=pid,
        steps=[
            PipelineStep("baseband", ""),
            PipelineStep("soft", "psk_demod", {
                "constellation": "qpsk", "symbolrate": 100_000.0,
                "rrc_alpha": 0.5, "pll_bw": 0.005, "fast": True,
            }),
            PipelineStep("cadu", "metop_ahrpt_decoder", {}),
        ],
        parameters={})


@pytest.mark.slow
def test_two_vfos_decode_two_carriers(tmp_path, rng):
    wide_sr = 1_600_000.0
    sym_sr = 200_000.0           # per-carrier baseband rate (sps=2)
    f1, f2 = -400_000.0, +300_000.0

    cadus1, bb1 = _qpsk_bb(rng, 12, seed=5)
    cadus2, bb2 = _qpsk_bb(rng, 12, seed=6)

    # upsample each baseband x8 into the wideband grid (zero-order hold is
    # fine: the VFO low-pass keeps only the in-band images' center copy)
    up = int(wide_sr / sym_sr)
    n = max(len(bb1), len(bb2)) * up
    t = np.arange(n) / wide_sr
    wide = np.zeros(n, np.complex64)
    for bb, f in ((bb1, f1), (bb2, f2)):
        z = np.repeat(bb, up)[:n]
        wide[: len(z)] += (z * np.exp(2j * np.pi * f * t[: len(z)])
                           ).astype(np.complex64)
    wide *= 0.5

    mv = MultiVFOLive(wide_sr, str(tmp_path), block_size=1 << 17)
    r1 = mv.add_vfo("a", f1, _pipe("vfo_a"), {"symbolrate": 100_000.0},
                    vfo_samplerate=sym_sr)
    r2 = mv.add_vfo("b", f2, _pipe("vfo_b"), {"symbolrate": 100_000.0},
                    vfo_samplerate=sym_sr)
    assert r1 == pytest.approx(sym_sr) and r2 == pytest.approx(sym_sr)

    for off in range(0, len(wide), 1 << 17):
        mv.push(wide[off: off + (1 << 17)])
    outs = mv.stop()

    for name, truth in (("a", cadus1), ("b", cadus2)):
        cadu_files = [o for o in outs[name] if o.endswith(".cadu")]
        assert cadu_files, f"VFO {name}: no cadu output"
        got = np.fromfile(cadu_files[0], np.uint8)
        got = got[: len(got) // 1024 * 1024].reshape(-1, 1024)
        matched = sum(bool((truth == g).all(axis=1).any()) for g in got)
        assert matched >= 8, f"VFO {name}: only {matched}/12 frames"


def test_vfo_recorder(tmp_path, rng):
    """add_vfo_reco semantics: a VFO can be recorded raw instead of (or
    alongside) decoding."""
    wide_sr = 800_000.0
    mv = MultiVFOLive(wide_sr, str(tmp_path), block_size=1 << 16)
    actual = mv.add_vfo_recorder("rec", 100_000.0, 200_000.0)
    assert actual == pytest.approx(200_000.0)
    x = (0.1 * (rng.standard_normal(1 << 17)
                + 1j * rng.standard_normal(1 << 17))).astype(np.complex64)
    mv.push(x)
    mv.stop()
    rec = tmp_path / "rec.cf32"
    assert rec.exists()
    n = rec.stat().st_size // 8
    assert abs(n - (1 << 17) // 4) < 1024
