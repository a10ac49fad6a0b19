"""M10 radiosonde loopback (models/radiosonde.py vs plugins/
radiosonde_support/m10/)."""

import numpy as np

from satdump_tpu.models.radiosonde import (M10DecoderModule, encode_frame,
                                           find_frames, frame_crc_check,
                                           frame_descramble, frame_scramble,
                                           manchester_decode, parse_frame)


def test_scramble_roundtrip(rng):
    f = rng.integers(0, 256, (3, 104), dtype=np.uint8)
    np.testing.assert_array_equal(frame_descramble(frame_scramble(f)), f)


def test_descramble_matches_reference_loop(rng):
    """Oracle: the sequential loop of m10.cpp:18-28."""
    f = rng.integers(0, 256, 104, dtype=np.uint8)
    ref = f.copy()
    topbit = 0
    for i in range(104):
        tmp = (int(ref[i]) << 7) & 0xFF
        ref[i] = int(ref[i]) ^ 0xFF ^ (topbit | int(ref[i]) >> 1)
        topbit = tmp
    np.testing.assert_array_equal(frame_descramble(f), ref)


def test_encode_decode_frame():
    payload = {"timestamp": 1750000000, "lat": 48.8566, "lon": 2.3522,
               "alt": 12345.678, "sat_count": 9}
    chan = encode_frame(payload)
    assert chan.shape == (1664,)
    frame = frame_descramble(manchester_decode(chan))
    assert frame_crc_check(frame)
    p = parse_frame(frame)
    assert p["type"] == 0x9F
    assert p["timestamp"] == payload["timestamp"]
    assert abs(p["lat"] - payload["lat"]) < 1e-6
    assert abs(p["lon"] - payload["lon"]) < 1e-6
    assert abs(p["alt"] - payload["alt"]) < 1e-3
    assert p["sat_count"] == 9


def test_find_frames_in_noise(rng):
    """Two frames buried in random bits, one with 2 sync bit errors."""
    noise = rng.integers(0, 2, 5000, dtype=np.uint8)
    f1 = encode_frame({"timestamp": 1700000000, "lat": 10.0, "lon": 20.0,
                       "alt": 100.0})
    f2 = encode_frame({"timestamp": 1700000001, "lat": 10.1, "lon": 20.1,
                       "alt": 110.0})
    f2 = f2.copy()
    f2[[3, 17]] ^= 1          # sync bit errors (tolerance = 2)
    stream = np.concatenate([noise[:2000], f1, noise[2000:3000], f2,
                             noise[3000:]])
    frames = find_frames(stream)
    assert len(frames) == 2
    ps = [parse_frame(f) for f in frames]
    assert ps[0]["lat"] != ps[1]["lat"]


def test_m10_decoder_module(tmp_path, rng):
    chans = [encode_frame({"timestamp": 1700000000 + i, "lat": 45.0 + i,
                           "lon": 7.0, "alt": 5000.0 + 10 * i})
             for i in range(3)]
    bits = np.concatenate([rng.integers(0, 2, 500, dtype=np.uint8)]
                          + chans + [rng.integers(0, 2, 500, dtype=np.uint8)])
    soft = np.where(bits > 0, 50, -50).astype(np.int8)
    p = tmp_path / "x.soft"
    soft.tofile(p)
    mod = M10DecoderModule(str(p), str(tmp_path / "out"), {})
    mod.process()
    assert mod.stats["frames"] == 3
    assert mod.stats["positions"] == 3
    import json
    track = json.loads((tmp_path / "m10_track.json").read_text())
    np.testing.assert_allclose([t["lat"] for t in track],
                               [45.0, 46.0, 47.0], atol=1e-6)
