"""Headless BitView analyzer (ref plugins/bitview_app)."""

import json

import numpy as np

from satdump_tpu.utils import bitview


def _cadu_bits(rng, n_frames=40, frame_bytes=128):
    frames = rng.integers(0, 256, (n_frames, frame_bytes), dtype=np.uint8)
    frames[:, 0:4] = [0x1A, 0xCF, 0xFC, 0x1D]
    return np.unpackbits(frames)


def test_period_autodetect(rng):
    bits = _cadu_bits(rng)
    cands = bitview.estimate_period(bits, min_period=64)
    assert cands[0] == 128 * 8      # the frame length is the top peak


def test_transforms(rng):
    bits = rng.integers(0, 2, 4096).astype(np.uint8)
    # diff decode inverts NRZ-M encode
    from satdump_tpu.ops.fec.differential import nrzm_encode
    enc, _ = nrzm_encode(bits)
    np.testing.assert_array_equal(bitview.diff_decode(enc), bits)
    # reverse twice = identity
    np.testing.assert_array_equal(
        bitview.reverse_bits(bitview.reverse_bits(bits)), bits)
    # deinterleave undoes a row-major interleave of 4 streams
    streams = bits[: 4000].reshape(4, 1000)
    inter = streams.T.reshape(-1)
    np.testing.assert_array_equal(bitview.deinterleave(inter, 4),
                                  streams.reshape(-1))
    # take/skip
    ts = bitview.take_skip(np.arange(20) % 2, take=3, skip=2)
    assert len(ts) == 12


def test_vcid_split_and_apid_demux(rng):
    frames = rng.integers(0, 256, (10, 1024), dtype=np.uint8)
    frames[:, 4] = 0x40
    frames[:5, 5] = 0x01
    frames[5:, 5] = 0x2A
    out = bitview.vcid_split(frames.reshape(-1))
    assert set(out) == {1, 42}
    assert len(out[1]) == 5 and len(out[42]) == 5

    pkts = [bytes([0x08, 0x01, 0, 0, 0, 1, 9]),
            bytes([0x08, 0x01, 0, 1, 0, 1, 9]),
            bytes([0x0B, 0xFF, 0, 0, 0, 1, 9])]
    by_apid = bitview.apid_demux(pkts)
    assert len(by_apid[0x001]) == 2 and len(by_apid[0x3FF]) == 1


def test_cli_bitview(tmp_path, rng):
    from satdump_tpu.cli import main
    bits = _cadu_bits(rng, n_frames=64, frame_bytes=64)
    p = tmp_path / "stream.bin"
    np.packbits(bits).tofile(p)
    out = tmp_path / "bv.png"
    rc = main(["bitview", str(p), "-o", str(out)])
    assert rc == 0 and out.exists()
    from satdump_tpu.image.io import load_img
    img = load_img(out)
    assert img.shape[1] == 64 * 8
