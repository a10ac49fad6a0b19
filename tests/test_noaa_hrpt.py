"""NOAA POES HRPT: minor-frame deframer + AVHRR HRPT reader + the
noaa_hrpt_decoder / noaa_instruments modules end-to-end."""

import numpy as np
import pytest

from satdump_tpu.models.noaa_hrpt import (FRAME_WORDS, HRPT_SYNC, SYNC_WORDS,
                                          AVHRRReaderHRPT, NOAADeframer)


def _make_frame(rng, line=None, ch3a=False, day=100, ms=43_200_000):
    words = rng.integers(0, 1024, FRAME_WORDS, dtype=np.uint16)
    words[:6] = SYNC_WORDS
    words[6] = (words[6] & ~np.uint16(1)) | np.uint16(ch3a)
    words[8] = day << 1
    words[9] = (ms >> 20) & 0x7F
    words[10] = (ms >> 10) & 0x3FF
    words[11] = ms & 0x3FF
    if line is not None:
        words[750: 750 + 2048 * 5] = line.reshape(-1)
    return words


def _frames_to_bits(frames):
    w = np.concatenate(frames).astype(np.uint16)
    bits = ((w[:, None] >> np.arange(9, -1, -1)) & 1).astype(np.uint8)
    return bits.reshape(-1)


def test_deframer_finds_frames(rng):
    lines = rng.integers(0, 1024, (3, 2048, 5), dtype=np.uint16)
    frames = [_make_frame(rng, lines[i]) for i in range(3)]
    bits = np.concatenate([rng.integers(0, 2, 337, dtype=np.uint8),
                           _frames_to_bits(frames)])
    # flip a few sync bits of frame 1 (threshold tolerance)
    d = NOAADeframer(threshold=5)
    got = []
    got += d.work(bits[:20000])
    got += d.work(bits[20000:])
    assert len(got) == 3
    for g, f in zip(got, frames):
        assert np.array_equal(g[6:], f[6:])


def test_avhrr_hrpt_reader(rng):
    lines = rng.integers(0, 1024, (4, 2048, 5), dtype=np.uint16)
    r = AVHRRReaderHRPT(year=2021)
    for i in range(4):
        r.work_noaa(_make_frame(rng, lines[i], ch3a=(i % 2 == 0),
                                ms=1000 * i))
    chans = r.channels()
    ch3a = np.arange(4) % 2 == 0
    assert np.array_equal(chans[0] >> 6, lines[:, :, 0])
    assert np.array_equal(chans[2][ch3a] >> 6, lines[ch3a, :, 2])
    assert np.array_equal(chans[3][~ch3a] >> 6, lines[~ch3a, :, 2])
    assert r.timestamps[1] - r.timestamps[0] == pytest.approx(1.0)


@pytest.mark.slow
def test_noaa_hrpt_modules_end_to_end(tmp_path, rng):
    from satdump_tpu.models.noaa_hrpt import (NOAAHRPTDecoderModule,
                                              NOAAInstrumentsDecoderModule)
    from satdump_tpu.products.product import load_product

    lines = rng.integers(0, 1024, (5, 2048, 5), dtype=np.uint16)
    frames = [_make_frame(rng, lines[i], ms=166 * i) for i in range(5)]
    bits = _frames_to_bits(frames)
    soft = (bits.astype(np.int16) * 100 - 50).astype(np.int8)
    soft = np.concatenate([rng.integers(-40, 40, 513).astype(np.int8), soft])
    p = tmp_path / "x.soft"
    soft.tofile(p)

    dec = NOAAHRPTDecoderModule(str(p), str(tmp_path / "o"),
                                {"deframer_thresold": 5})
    dec.process()
    assert dec.stats["frames"] == 5

    ins = NOAAInstrumentsDecoderModule(dec.d_output_file,
                                       str(tmp_path / "out"),
                                       {"satellite": "NOAA-19"})
    ins.process()
    assert ins.stats["avhrr_lines"] == 5
    prod = load_product(str(tmp_path / "AVHRR"))
    assert np.array_equal(prod.get_channel("1").image >> 6, lines[:, :, 0])
