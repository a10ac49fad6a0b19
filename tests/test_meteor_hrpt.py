"""METEOR-M HRPT: CADU deframer + MSU-MR/BIS-M instruments on synthetic
CADUs (mirrors plugins/meteor_support/meteor/ in reverse)."""

import numpy as np
import pytest

from satdump_tpu.models import meteor_hrpt as mh
from satdump_tpu.products.product import load_product


def _pack_10bit(words: np.ndarray) -> np.ndarray:
    bits = ((words[:, None] >> np.arange(9, -1, -1)) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(-1))


def mk_msumr_frame(rng, hms=(10, 30, 5), serial=3):
    frame = np.zeros(mh.MSUMR_FRAME, np.uint8)
    sync = np.frombuffer(mh.MSUMR_SYNC.to_bytes(8, "big"), np.uint8)
    frame[:8] = sync
    frame[8], frame[9], frame[10] = hms
    frame[11] = 128                      # fractional second
    frame[12] = serial << 4
    cal = rng.integers(0, 1024, 12).astype(np.uint16)
    frame[35:50] = _pack_10bit(cal)
    img = rng.integers(0, 1024, (6, 1572)).astype(np.uint16)
    data = np.zeros((393, 30), np.uint8)
    for ch in range(6):
        data[:, ch * 5: (ch + 1) * 5] = \
            _pack_10bit(img[ch]).reshape(393, 5)
    frame[50: 50 + 393 * 30] = data.reshape(-1)
    return frame, img


def mk_bism_frame(day_seconds: int) -> np.ndarray:
    frame = np.zeros(mh.BISM_FRAME, np.uint8)
    frame[:4] = np.frombuffer(mh.BISM_SYNC.to_bytes(4, "big"), np.uint8)
    frame[4] = 0
    frame[6:10] = np.frombuffer(
        int(day_seconds).to_bytes(4, "little"), np.uint8)
    return frame


def streams_to_cadus(msumr_stream: np.ndarray, bism_stream: np.ndarray):
    """Pack the instrument byte streams into CADU slices."""
    per_m = sum(n for _, n in mh._MSUMR_SLICES)
    per_b = sum(n for _, n in mh._BISM_SLICES)
    n = max(-(-len(msumr_stream) // per_m), -(-len(bism_stream) // per_b))
    msumr_stream = np.concatenate(
        [msumr_stream, np.zeros(n * per_m - len(msumr_stream), np.uint8)])
    bism_stream = np.concatenate(
        [bism_stream, np.zeros(n * per_b - len(bism_stream), np.uint8)])
    cadus = np.zeros((n, mh.CADU_SIZE), np.uint8)
    cadus[:, 0:4] = [0x1A, 0xCF, 0xFC, 0x1D]
    mp = bp = 0
    for i in range(n):
        for off, ln in mh._MSUMR_SLICES:
            cadus[i, off: off + ln] = msumr_stream[mp: mp + ln]
            mp += ln
        for off, ln in mh._BISM_SLICES:
            cadus[i, off: off + ln] = bism_stream[bp: bp + ln]
            bp += ln
    return cadus


def test_meteor_hrpt_decoder(tmp_path, rng):
    cadus = streams_to_cadus(rng.integers(0, 256, 4000).astype(np.uint8),
                             np.zeros(0, np.uint8))
    bits = np.unpackbits(cadus.reshape(-1))
    bits = np.concatenate([rng.integers(0, 2, 333).astype(np.uint8), bits])
    soft = np.where(bits > 0, -90, 90).astype(np.int8)    # inverted polarity
    p = tmp_path / "m.soft"
    soft.tofile(p)
    mod = mh.MeteorHRPTDecoderModule(str(p), str(tmp_path / "out"), {})
    mod.process()
    got = np.fromfile(mod.d_output_file, np.uint8).reshape(-1, 1024)
    assert len(got) >= len(cadus) - 1
    assert np.array_equal(got[0], cadus[0]) or np.array_equal(got[0],
                                                              cadus[1])


def test_meteor_instruments_hrpt(tmp_path, rng):
    day_clock = 5000 * 86400 + 12 * 3600        # noon, arbitrary day
    frames, imgs = zip(*[mk_msumr_frame(rng, hms=(10, 30, i), serial=3)
                         for i in range(8)])
    msumr_stream = np.concatenate(frames)
    bism_stream = np.concatenate([mk_bism_frame(day_clock)] * 4)
    cadus = streams_to_cadus(msumr_stream, bism_stream)
    p = tmp_path / "m.cadu"
    cadus.tofile(p)
    mod = mh.MeteorInstrumentsModule(str(p), str(tmp_path / "out" / "x"),
                                     {"year_override": 2024})
    mod.process()
    assert mod.stats["msumr_lines"] == 8
    assert mod.stats["satellite"] == "METEOR-M2-3"
    prod = load_product(str(tmp_path / "out" / "MSU-MR"))
    assert len(prod.images) == 6
    for ch in range(6):
        assert np.array_equal(prod.images[ch].image >> 6,
                              np.stack([im[ch] for im in imgs]))
    ts = prod.contents["timestamps"]
    assert len(ts) == 8
    # BIS-M day (Moscow) + 10:30:SS + 128/255 - 3 h
    base = mh.BISMReader(2024).timestamp_offset + day_clock
    day = base - (base % 86400)
    assert abs(ts[0] - (day + 10 * 3600 + 30 * 60 + 0 + 128 / 255 - 10800)) \
        < 1e-6


def mk_mtvza_frame(rng, counter):
    """One MTVZA 248-byte frame (mtvza_reader.cpp layout) with random
    sample words; returns (frame, words8, words128) for expectation."""
    frame = np.zeros(mh.MTVZA_FRAME, np.uint8)
    frame[:4] = np.frombuffer(mh.MTVZA_SYNC.to_bytes(4, "big"), np.uint8)
    frame[4] = 255
    frame[5] = counter
    w8 = rng.integers(0, 65536, 60, dtype=np.uint32)
    w128 = rng.integers(0, 65536, 60, dtype=np.uint32)
    # default (non-endian_mode) format is LITTLE-endian sample words
    # (mtvza_reader.cpp:33: high byte at +1 when !endian_mode)
    for p in range(60):
        frame[8 + p * 2] = w8[p] & 0xFF
        frame[8 + p * 2 + 1] = w8[p] >> 8
        frame[128 + p * 2] = w128[p] & 0xFF
        frame[128 + p * 2 + 1] = w128[p] >> 8
    return frame, w8, w128


def test_mtvza_reader(rng):
    r = mh.MTVZAReader()
    r.latest_msumr_timestamp = 1234.5
    words = {}
    for counter in range(2, 27):
        frame, w8, w128 = mk_mtvza_frame(rng, counter)
        words[counter] = (w8, w128)
        r.work(frame)
    assert r.lines == 1
    assert r.timestamps == [1234.5]
    # full-res channels 5,6: pos = 5 + ch*4 + i, distinct per i
    for ch in (5, 6):
        got = r.get_channel(ch)[0]
        for counter in range(2, 27):
            w8, w128 = words[counter]
            col = (counter - 2) * 8
            for i in range(4):
                pos = 5 + (ch - 5) * 4 + i
                if col + i < 100:
                    assert got[col + i] == (int(w8[pos]) - 32768) & 0xFFFF
                if col + 4 + i < 100:
                    assert got[col + 4 + i] == \
                        (int(w128[pos]) - 32768) & 0xFFFF
    # low-res channel 0: same pos repeated
    got = r.get_channel(0)[0]
    w8, _ = words[2]
    assert (got[:4] == (int(w8[0]) - 32768) & 0xFFFF).all()


def test_meteor_instruments_mtvza_product(tmp_path, rng):
    """MTVZA frames interleaved into CADUs -> MTVZA product saved."""
    day_clock = 5000 * 86400 + 12 * 3600
    frames, _ = zip(*[mk_msumr_frame(rng, hms=(10, 30, i), serial=3)
                      for i in range(2)])
    mt_frames = [mk_mtvza_frame(rng, c)[0] for c in range(2, 27)] * 2
    mtvza_stream = np.concatenate(mt_frames)
    msumr_stream = np.concatenate(frames)
    bism_stream = np.concatenate([mk_bism_frame(day_clock)] * 4)

    per_m = sum(n for _, n in mh._MSUMR_SLICES)
    per_b = sum(n for _, n in mh._BISM_SLICES)
    per_t = sum(n for _, n in mh._MTVZA_SLICES)
    n = max(-(-len(msumr_stream) // per_m), -(-len(bism_stream) // per_b),
            -(-len(mtvza_stream) // per_t))
    msumr_stream = np.concatenate(
        [msumr_stream, np.zeros(n * per_m - len(msumr_stream), np.uint8)])
    bism_stream = np.concatenate(
        [bism_stream, np.zeros(n * per_b - len(bism_stream), np.uint8)])
    mtvza_stream = np.concatenate(
        [mtvza_stream, np.zeros(n * per_t - len(mtvza_stream), np.uint8)])
    cadus = np.zeros((n, mh.CADU_SIZE), np.uint8)
    cadus[:, 0:4] = [0x1A, 0xCF, 0xFC, 0x1D]
    mp = bp = tp = 0
    for i in range(n):
        for off, ln in mh._MSUMR_SLICES:
            cadus[i, off: off + ln] = msumr_stream[mp: mp + ln]
            mp += ln
        for off, ln in mh._BISM_SLICES:
            cadus[i, off: off + ln] = bism_stream[bp: bp + ln]
            bp += ln
        for off, ln in mh._MTVZA_SLICES:
            cadus[i, off: off + ln] = mtvza_stream[tp: tp + ln]
            tp += ln
    p = tmp_path / "m.cadu"
    cadus.tofile(p)
    mod = mh.MeteorInstrumentsModule(str(p), str(tmp_path / "out" / "x"),
                                     {"year_override": 2024})
    mod.process()
    assert mod.stats["mtvza_lines"] == 2
    prod = load_product(str(tmp_path / "out" / "MTVZA"))
    assert len(prod.images) == 30
    assert prod.images[0].image.shape == (2, 100)


def test_msumr_product_calibration(tmp_path, rng):
    """The MSU-MR product carries meteor_msumr calibration (views from the
    10-bit calibration words + temps from analog telemetry) and calibrates
    IR channels to radiance."""
    day_clock = 5000 * 86400 + 12 * 3600
    frames = []
    for i in range(4):
        f, _ = mk_msumr_frame(rng, hms=(10, 30, i), serial=3)
        f[13] = 0b00001111                  # analog telemetry line
        # cold ~258K: b = -(258.15-273.15)/0.5 = 30; hot ~313K: b = -80
        f[14 + 8] = f[14 + 9] = f[14 + 10] = 30
        f[14 + 11] = f[14 + 12] = f[14 + 13] = (-80) & 0xFF
        frames.append(f)
    msumr_stream = np.concatenate(frames)
    bism_stream = np.concatenate([mk_bism_frame(day_clock)] * 4)
    cadus = streams_to_cadus(msumr_stream, bism_stream)
    p = tmp_path / "m.cadu"
    cadus.tofile(p)
    mod = mh.MeteorInstrumentsModule(str(p), str(tmp_path / "out" / "x"),
                                     {"year_override": 2024})
    mod.process()
    prod = load_product(str(tmp_path / "out" / "MSU-MR"))
    calib = prod.contents.get("calibration", {})
    assert calib.get("calibrator") == "meteor_msumr"
    v = calib["vars"]
    assert len(v["views"]) == 6 and len(v["views"][0][0]) == 4
    t = v["temps"][0]["analog_tlm"]
    assert t["cold_temp1"] == pytest.approx(-30 * 0.5 + 273.15)
    assert t["hot_temp1"] == pytest.approx(80 * 0.5 + 273.15)
    # end-to-end calibrate an IR channel
    from satdump_tpu.products.calibration import get_calibrator
    cal = get_calibrator("meteor_msumr", prod, calib)
    out = cal.compute(3, prod.images[3].image >> 6)
    assert np.isfinite(out).any()
