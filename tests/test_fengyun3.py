"""FY-3 VIRR loopback (models/fengyun3.py vs virr_reader.cpp)."""

import numpy as np

from satdump_tpu.models.fengyun3 import (FY3InstrumentsDecoderModule,
                                         VIRR_FRAME_BITS, VIRR_SYNC,
                                         VIRR_SYNC_BITS, VIRRReader)
from satdump_tpu.utils.repack import pack_nbits_to_bytes


def mk_virr_frame(rng, days=1234, ms=5_000_000):
    frame = np.zeros(VIRR_FRAME_BITS // 8, np.uint8)
    sync_bits = np.array([(VIRR_SYNC >> (VIRR_SYNC_BITS - 1 - i)) & 1
                          for i in range(VIRR_SYNC_BITS)], np.uint8)
    # frame as emitted by SimpleDeframer starts with the sync bits
    img = rng.integers(0, 1024, (2048, 10), dtype=np.uint16)
    packed = pack_nbits_to_bytes(img.reshape(-1), 10)
    frame[436: 436 + len(packed[:25600])] = packed[:25600]
    # timestamp: bytes b[k] recovered as (f[26041+off]&0x3F)<<2 | f[26042+off]>>6
    tbytes = np.zeros(8, np.uint8)
    tbytes[1] = (days >> 10) & 0b11
    tbytes[2] = (days >> 2) & 0xFF
    tbytes[3] = ((days & 0b11) << 6) | ((ms >> 24) & 0b11)
    tbytes[4] = (ms >> 16) & 0xFF
    tbytes[6] = (ms >> 8) & 0xFF
    tbytes[7] = ms & 0xFF
    for k, off in zip((0, 1, 2, 3, 4, 6, 7), range(7)):
        frame[26041 + off] |= (tbytes[k] >> 2) & 0b111111
        frame[26042 + off] |= (tbytes[k] & 0b11) << 6
    return frame, img


def test_virr_reader_roundtrip(rng):
    r = VIRRReader()
    frame, img = mk_virr_frame(rng)
    r.work(frame)
    assert r.lines == 1
    for ch in range(10):
        np.testing.assert_array_equal(r.get_channel(ch)[0] // 64,
                                      img[:, ch])
    assert abs(r.timestamps[0] - (1234 * 86400 + 5000 + 12 * 3600)) < 1e-6


def test_fy3_instruments_module(tmp_path, rng):
    frames = [mk_virr_frame(rng)[0] for _ in range(3)]
    stream_bits = np.concatenate(
        [np.concatenate([np.array([(VIRR_SYNC >> (59 - i)) & 1
                                   for i in range(60)], np.uint8),
                         np.unpackbits(f)[60:]]) for f in frames])
    stream = np.packbits(stream_bits)
    per = 882
    ncadu = -(-len(stream) // per)
    stream = np.concatenate([stream, np.zeros(ncadu * per - len(stream),
                                              np.uint8)])
    cadus = np.zeros((ncadu, 1024), np.uint8)
    cadus[:, 0:4] = [0x1A, 0xCF, 0xFC, 0x1D]
    cadus[:, 5] = 5                    # VCID 5
    cadus[:, 14: 14 + per] = stream.reshape(ncadu, per)
    p = tmp_path / "x.cadu"
    cadus.tofile(p)
    mod = FY3InstrumentsDecoderModule(str(p), str(tmp_path / "out"), {})
    mod.process()
    assert mod.stats["virr_lines"] >= 2
    from satdump_tpu.products.product import load_product
    prod = load_product(str(tmp_path / "VIRR"))
    assert len(prod.images) == 10
    assert prod.images[0].image.shape[1] == 2048
