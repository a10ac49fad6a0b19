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


def test_mersi2_reader_scan_placement(rng):
    """Synthetic MERSI-2 bit stream: head frame timestamp + scan frames
    with known 12-bit lines land at the right (channel, line) positions."""
    from satdump_tpu.models.fengyun3 import MERSI2Reader
    r = MERSI2Reader()

    def head_frame(days=100, ms=3_600_000):
        f = np.zeros(r.head_size // 8, np.uint8)
        t = np.zeros(8, np.uint8)
        t[0], t[1] = days >> 8, days & 0xFF
        t[2], t[3], t[4], t[5] = (ms >> 24) & 0xFF, (ms >> 16) & 0xFF, \
            (ms >> 8) & 0xFF, ms & 0xFF
        # inverse of _process_head's nibble shuffle
        f[12] |= t[0] >> 4;  f[13] |= (t[0] & 0xF) << 4
        f[13] |= t[1] >> 4;  f[11] |= (t[1] & 0xF) << 4
        f[11] |= t[2] >> 4;  f[12] |= (t[2] & 0xF) << 4
        f[9] |= t[3] >> 4;   f[10] |= (t[3] & 0xF) << 4
        f[10] |= t[4] >> 4;  f[8] |= (t[4] & 0xF) << 4
        f[8] |= t[5] >> 4;   f[9] |= (t[5] & 0xF) << 4
        return f

    from satdump_tpu.utils.repack import pack_nbits_to_bytes

    def scan_frame(marker, words):
        is250 = marker < r.counter_250_end
        size = (r.scan250_size if is250 else r.scan1000_size) // 8
        f = np.zeros(size, np.uint8)
        f[0] = marker >> 2
        f[1] = (marker & 0b11) << 6
        packed = pack_nbits_to_bytes(words, 12)
        # imagery at byte offset + 6 bits: place so that the reader's
        # 6-bit-left-shift recovers `packed`
        region = f[r.img_off_bytes:]
        shifted = np.zeros(len(packed) + 1, np.uint8)
        shifted[0] = packed[0] >> 6
        shifted[1:] = ((packed.astype(np.uint16) << 2) & 0xFF
                       ).astype(np.uint8)
        shifted[1:] |= np.concatenate([packed[1:] >> 6, [0]]).astype(np.uint8)
        region[: len(shifted)] = shifted[: len(region)]
        return f

    sync_head = np.array([(r.HEAD_SYNC >> (47 - i)) & 1 for i in range(48)],
                         np.uint8)
    sync_scan = np.array([(r.SCAN_SYNC >> (27 - i)) & 1 for i in range(28)],
                         np.uint8)
    w250 = rng.integers(0, 4096, r.w250).astype(np.uint16)
    w1000 = rng.integers(0, 4096, r.w1000).astype(np.uint16)
    stream_bits = np.concatenate(
        [sync_head, np.unpackbits(head_frame()),
         sync_scan, np.unpackbits(scan_frame(0, w250)),          # ch0 line0
         sync_scan, np.unpackbits(scan_frame(41, w250)),         # ch1 line1
         sync_scan, np.unpackbits(scan_frame(r.counter_250_end + 12,
                                             w1000))])           # 1km ch1 l2
    r.work(np.packbits(stream_bits))
    assert r.segments == 0
    exp_ts = (10957 + 100) * 86400.0 + 3600.0 + 12 * 3600
    assert abs(r.timestamps[0] - exp_ts) < 1e-3
    np.testing.assert_array_equal(r.get_channel(0)[0], w250 << 4)
    np.testing.assert_array_equal(r.get_channel(1)[1], w250 << 4)
    np.testing.assert_array_equal(r.get_channel(r.c250 + 1)[2], w1000 << 4)


def _fengyun_diff_encode(bits: np.ndarray) -> tuple:
    """Inverse of fengyun_diff_decode: brute-force each symbol's (x, y)."""
    from satdump_tpu.models.fengyun3 import fengyun_diff_decode
    b1, b0 = bits[0::2], bits[1::2]
    n = len(b1)
    x = np.zeros(n + 1, np.uint8)
    y = np.zeros(n + 1, np.uint8)
    for k in range(n):
        for xx in (0, 1):
            for yy in (0, 1):
                xd, yd = xx ^ x[k], yy ^ y[k]
                cond = (xx ^ yy) == 1
                bb1 = yd if cond else xd
                bb0 = xd if cond else yd
                if bb1 == b1[k] and bb0 == b0[k]:
                    x[k + 1], y[k + 1] = xx, yy
                    break
            else:
                continue
            break
    return x, y


def test_fengyun_diff_roundtrip(rng):
    from satdump_tpu.models.fengyun3 import fengyun_diff_decode
    bits = rng.integers(0, 2, 2000).astype(np.uint8)
    x, y = _fengyun_diff_encode(bits)
    dec = fengyun_diff_decode(x, y)
    np.testing.assert_array_equal(dec, bits[: len(dec)])


def test_fengyun_ahrpt_decoder(tmp_path, rng):
    """CADUs -> dual-rail conv-encoded FY-3 AHRPT softs -> decoder."""
    from satdump_tpu import sim
    from satdump_tpu.models.fengyun3 import FengyunAHRPTDecoderModule
    from satdump_tpu.ops.fec import convolutional as cc
    from satdump_tpu.ops.fec.randomization import derand_ccsds

    cadus = sim.make_cadus(8, rng)
    tx = cadus.copy()
    tx[:, 4:] = derand_ccsds(tx[:, 4:])
    bits = np.unpackbits(tx.reshape(-1))
    x, y = _fengyun_diff_encode(bits)
    ei = cc.conv_encode_batch(x)
    eq = cc.conv_encode_batch(y)
    soft = np.empty(2 * min(len(ei), len(eq)), np.int8)
    soft[0::2] = np.where(ei[: len(soft) // 2] > 0, 90, -90)
    soft[1::2] = np.where(eq[: len(soft) // 2] > 0, 90, -90)
    p = tmp_path / "f.soft"
    soft.tofile(p)
    mod = FengyunAHRPTDecoderModule(str(p), str(tmp_path / "out"), {})
    mod.process()
    got = np.fromfile(mod.d_output_file, np.uint8).reshape(-1, 1024)
    matched = sum(bool((cadus == g).all(axis=1).any()) for g in got)
    assert matched >= 7, f"decoded {matched}/8"


# ---------------------------------------------------------------------------
# MWHS-2 / MWTS-2 (VCID-12 CCSDS sounders)
# ---------------------------------------------------------------------------
def _cds_time(days, ms, us=0):
    return bytes([days >> 8, days & 0xFF]) + int(ms).to_bytes(4, "big") \
        + bytes([us >> 8, us & 0xFF])


def mk_mwhs2_packets(scan_idx, days=2000, base_ms=1_000_000):
    """Four packets (markers 0..3) of one MWHS-2 scan; channel ch pixel i
    carries value 100*ch + i + scan_idx."""
    from satdump_tpu.ccsds import CCSDSHeader, CCSDSPacket
    pkts = []
    ms = base_ms + scan_idx * 2667
    for marker in range(4):
        pl = bytearray(1018)
        pl[0:8] = _cds_time(days, ms)
        pl[35] = marker << 2
        words = np.zeros(468, np.uint16)
        ngrp = 3 if marker == 3 else 4
        for g in range(ngrp):
            ch = marker * 4 + g
            words[106 * g: 106 * g + 98] = 100 * ch + np.arange(98) + scan_idx
        pl[50: 50 + 2 * 468] = words.astype(">u2").tobytes()
        p = CCSDSPacket(header=CCSDSHeader(apid=16), payload=pl)
        pkts.append(p)
    return pkts


def mk_mwts2_packets(scan_idx, days=2000, base_ms=2_000_000):
    """Markers 1..4 of one MWTS-2 scan; channel ch pixel i carries
    1000 + 16*i + ch + scan_idx."""
    from satdump_tpu.ccsds import CCSDSHeader, CCSDSPacket
    pkts = []
    ms = base_ms + scan_idx * 5333
    for marker in range(1, 5):
        pl = bytearray(1018)
        pl[0] = marker << 4
        pl[4:12] = _cds_time(days, ms)
        words = np.zeros(492, np.uint16)
        if marker >= 2:
            px = np.arange(30) + 30 * (marker - 2)
            blk = 1000 + 16 * px[:, None] + np.arange(16)[None, :] + scan_idx
            words[: 30 * 16] = blk.reshape(-1)
        pl[38: 38 + 2 * 492] = words.astype(">u2").tobytes()
        pkts.append(CCSDSPacket(header=CCSDSHeader(apid=7), payload=pl))
    return pkts


def test_mwhs2_reader():
    from satdump_tpu.models.fengyun3 import MWHS2Reader
    r = MWHS2Reader()
    for s in range(3):
        for p in mk_mwhs2_packets(s):
            r.work(p)
    assert r.lines == 3
    for ch in (0, 4, 8, 14):
        img = r.get_channel(ch)
        assert img.shape == (3, 98)
        for s in range(3):
            np.testing.assert_array_equal(
                img[s], 100 * ch + np.arange(98) + s)
    t0 = 2000 * 86400 + 1000 + 12 * 3600 + 10957 * 86400
    assert abs(r.timestamps[0] - t0) < 1e-6


def test_mwts2_reader():
    from satdump_tpu.models.fengyun3 import MWTS2Reader
    r = MWTS2Reader()
    for s in range(2):
        for p in mk_mwts2_packets(s):
            r.work(p)
    assert r.lines == 2
    for ch in (0, 7, 15):
        img = r.get_channel(ch)
        assert img.shape == (2, 90)
        for s in range(2):
            np.testing.assert_array_equal(
                img[s], 1000 + 16 * np.arange(90) + ch + s)


def test_fy3_vcid12_module(tmp_path):
    """MWHS-2 + MWTS-2 packets muxed onto VCID 12 (insert zone, 882-byte
    zones) decode through the full module to both sounder products."""
    from satdump_tpu.ccsds.mux import make_cadus_for_vcid
    pkts = []
    for s in range(3):
        pkts += mk_mwhs2_packets(s)
    for s in range(2):
        pkts += mk_mwts2_packets(s)
    cadus = make_cadus_for_vcid(pkts, vcid=12, mpdu_data_size=882,
                                has_insert_zone=True, total_size=1024)
    p = tmp_path / "x.cadu"
    cadus.astype(np.uint8).tofile(p)
    mod = FY3InstrumentsDecoderModule(str(p), str(tmp_path / "out"), {})
    mod.process()
    assert mod.stats["mwhs2_lines"] == 3
    assert mod.stats["mwts2_lines"] == 2
    from satdump_tpu.products.product import load_product
    prod = load_product(str(tmp_path / "MWHS-2"))
    assert len(prod.images) == 15
    assert prod.images[0].image.shape == (3, 98)
    prod = load_product(str(tmp_path / "MWTS-2"))
    assert len(prod.images) == 16
    assert prod.images[0].image.shape == (2, 90)
