"""Orbcomm STX loopback (models/orbcomm.py vs plugins/orbcomm_support)."""

import json

import numpy as np

from satdump_tpu.models.orbcomm import (OrbcommPlotterModule,
                                        OrbcommSTXDeframerModule,
                                        STXDeframer, calc_freq,
                                        frame_to_channel_bits, gps_to_unix,
                                        make_ephemeris_packet,
                                        make_fcs_packet, make_frame,
                                        orbcomm_fcs, parse_frame,
                                        reverse_bits)


def test_fcs(rng):
    for n in (12, 24):
        body = rng.integers(0, 256, n - 2, dtype=np.uint8)
        pkt = make_fcs_packet(body, n)
        assert orbcomm_fcs(pkt) == 0
        pkt2 = pkt.copy()
        pkt2[3] ^= 0x10
        assert orbcomm_fcs(pkt2) != 0


def test_calc_freq():
    assert abs(calc_freq(0x30) - (137.0 + 0x130 * 0.0025)) < 1e-9
    assert abs(calc_freq(0x60) - (137.0 + 0x60 * 0.0025)) < 1e-9
    assert abs(calc_freq(100, small=False) - 137.25) < 1e-9


def test_gps_to_unix():
    # post-2017 era: 18 leap seconds
    assert gps_to_unix(2200, 0) == 2200 * 604800 + 315964800 - 18


def test_ephemeris_roundtrip():
    pkt = make_ephemeris_packet(108, 1700000000, (5000.0, -3000.0, 4000.0))
    assert orbcomm_fcs(pkt) == 0
    frame = make_frame([(2, pkt)])
    out = parse_frame(frame)
    eph = [p for p in out if p["type"] == "ephemeris"]
    assert len(eph) == 1
    assert eph[0]["scid"] == 108
    assert eph[0]["timestamp"] == 1700000000
    # 20-bit quantization of +-8378 km -> ~16 m resolution
    assert abs(eph[0]["x"] - 5000.0) < 0.02
    assert abs(eph[0]["y"] + 3000.0) < 0.02
    assert abs(eph[0]["z"] - 4000.0) < 0.02
    # slot 0 parses as the on-air sync packet
    assert any(p["type"] == "sync" for p in out)


def test_deframer(rng):
    frames = [make_frame([(2, make_ephemeris_packet(
        100 + i, 1700000000 + i, (7000.0, 100.0 * i, -2000.0)))])
        for i in range(3)]
    bits = np.concatenate([rng.integers(0, 2, 777, dtype=np.uint8)]
                          + [frame_to_channel_bits(f) for f in frames]
                          + [rng.integers(0, 2, 500, dtype=np.uint8)])
    got = STXDeframer().work(bits)
    got = reverse_bits(got)
    assert len(got) == 3
    for i in range(3):
        np.testing.assert_array_equal(got[i], frames[i])


def test_deframer_inverted(rng):
    frame = make_frame([(2, make_ephemeris_packet(
        101, 1700000000, (7000.0, 0.0, -2000.0)))])
    bits = 1 - frame_to_channel_bits(frame)          # whole stream inverted
    bits = np.concatenate([rng.integers(0, 2, 333, dtype=np.uint8), bits])
    got = reverse_bits(STXDeframer().work(bits))
    assert len(got) == 1
    np.testing.assert_array_equal(got[0], frame)


def test_stx_modules(tmp_path, rng):
    frames = [make_frame([(2, make_ephemeris_packet(
        105, 1700000000 + i, (6800.0, 1000.0, 1500.0)))])
        for i in range(2)]
    bits = np.concatenate([rng.integers(0, 2, 600, dtype=np.uint8)]
                          + [frame_to_channel_bits(f) for f in frames])
    soft = np.where(bits > 0, 60, -60).astype(np.int8)
    p = tmp_path / "x.soft"
    soft.tofile(p)
    mod = OrbcommSTXDeframerModule(str(p), str(tmp_path / "out"), {})
    mod.process()
    assert mod.stats["frames"] == 2
    mod2 = OrbcommPlotterModule(mod.d_output_file, str(tmp_path / "out2"),
                                {})
    mod2.process()
    assert mod2.stats["ephemeris"] == 2
    pkts = json.loads((tmp_path / "orbcomm.json").read_text())
    eph = [p for p in pkts if p["type"] == "ephemeris"]
    assert eph[0]["scid"] == 105
    assert abs(eph[0]["lat"]) <= 90 and abs(eph[0]["lon"]) <= 180
