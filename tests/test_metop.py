"""MetOp AVHRR path: synthetic VCID-9 CADUs (mux-built, mirroring
tests/test_meteor.py) -> metop_instruments module -> ImageProduct; plus the
AVHRR/3 radiometric calibrator math (ref avhrr_calibrator.h)."""

import json
from pathlib import Path

import numpy as np
import pytest

from satdump_tpu.ccsds import CCSDSHeader, CCSDSPacket
from satdump_tpu.ccsds.mux import mux_packets
from satdump_tpu.models.metop import (AVHRRReader, NoaaAVHRR3Calibrator,
                                      MetOpInstrumentsDecoderModule)
from satdump_tpu.utils.repack import pack_nbits_to_bytes


def _avhrr_packet(line10bit: np.ndarray, ch3a: bool, seq: int,
                  day: int = 20000, ms: int = 0) -> CCSDSPacket:
    """Build one AVHRR HRPT source packet: 14-byte header (CDS time first)
    + 10-bit words with the 2048x5 image zone at word 55."""
    words = np.zeros(10355, np.uint16)
    words[55: 55 + 2048 * 5] = line10bit.reshape(-1)
    body = pack_nbits_to_bytes(words, 10)[:12944]
    hdr = bytes([day >> 8, day & 0xFF,
                 (ms >> 24) & 0xFF, (ms >> 16) & 0xFF, (ms >> 8) & 0xFF,
                 ms & 0xFF, 0, 0, 0, 0, 0, 0, 0, 0])
    payload = bytearray(hdr + bytes(body))
    payload += b"\x00" * (12960 - len(payload))
    h = CCSDSHeader(apid=103 if ch3a else 104, packet_sequence_count=seq,
                    packet_length=len(payload) - 1)
    return CCSDSPacket(header=h, payload=payload)


def _metop_cadus(packets) -> np.ndarray:
    """MetOp AHRPT CADUs: ASM(4) + VCDU(6) + insert zone(2) + M-PDU(2) +
    882B data (+128B RS slot left zero) = 1024 bytes, VCID 9, SCID 11."""
    zones = mux_packets(packets, mpdu_data_size=882)
    out = np.zeros((len(zones), 1024), np.uint8)
    scid, vcid = 11, 9
    for i, (fhp, data) in enumerate(zones):
        out[i, 0:4] = [0x1A, 0xCF, 0xFC, 0x1D]
        out[i, 4] = (1 << 6) | ((scid >> 2) & 0b111111)
        out[i, 5] = ((scid & 0b11) << 6) | (vcid & 0b111111)
        out[i, 6:9] = [(i >> 16) & 0xFF, (i >> 8) & 0xFF, i & 0xFF]
        out[i, 10:12] = 0  # insert zone
        out[i, 12] = (fhp >> 8) & 0b111
        out[i, 13] = fhp & 0xFF
        out[i, 14:896] = np.frombuffer(data, np.uint8)
    return out


def test_avhrr_reader_roundtrip(rng):
    """Lines fed as packets come back bit-exact per channel, with the
    3a/3b switch handled (ref avhrr_reader.cpp line2image)."""
    lines = rng.integers(0, 1024, (6, 2048, 5), dtype=np.uint16)
    r = AVHRRReader()
    for i in range(6):
        r.work(_avhrr_packet(lines[i], ch3a=(i % 2 == 0), seq=i,
                             ms=1000 * i))
    assert r.lines == 6
    chans = r.channels()
    ch3a = np.arange(6) % 2 == 0
    # channels 1,2 (slots 0,1) present on every line
    for slot in (0, 1):
        assert np.array_equal(chans[slot] >> 6, lines[:, :, slot])
    # slot 2 goes to 3a on ch3a lines, 3b otherwise
    assert np.array_equal(chans[2][ch3a] >> 6, lines[ch3a, :, 2])
    assert np.array_equal(chans[3][~ch3a] >> 6, lines[~ch3a, :, 2])
    # slots 3,4 -> channels 4,5 on every line
    assert np.array_equal(chans[4] >> 6, lines[:, :, 3])
    assert np.array_equal(chans[5] >> 6, lines[:, :, 4])
    # CDS timestamps decoded
    assert r.timestamps[1] - r.timestamps[0] == pytest.approx(1.0)


def test_metop_instruments_module(tmp_path, rng):
    """CADU file -> metop_instruments -> AVHRR ImageProduct + dataset."""
    lines = rng.integers(0, 1024, (5, 2048, 5), dtype=np.uint16)
    pkts = [_avhrr_packet(lines[i], ch3a=True, seq=i, ms=166 * i)
            for i in range(5)]
    cadus = _metop_cadus(pkts)
    cadu_path = tmp_path / "x.cadu"
    cadus.tofile(cadu_path)

    mod = MetOpInstrumentsDecoderModule(str(cadu_path), str(tmp_path / "out"),
                                        {})
    mod.process()
    assert mod.stats["avhrr_lines"] == 5
    assert mod.stats["satellite"] == "MetOp-B"

    ds = json.loads((tmp_path / "dataset.json").read_text())
    assert "AVHRR" in ds["products"]
    from satdump_tpu.products.product import load_product
    p = load_product(str(tmp_path / "AVHRR" / "product.json"))
    ch1 = p.get_channel("1")
    assert np.array_equal(ch1.image >> 6, lines[:, :, 0])
    assert p.has_proj_cfg()


def test_avhrr_calibrator_vis_and_ir():
    """Vectorized calibrator matches the reference per-pixel math
    (avhrr_calibrator.h calc_rad / visible dual-slope)."""
    class P:  # minimal product stub
        images = [type("H", (), {"bit_depth": 10})()]

    cfg = {"vars": {"perChannel": [
        # visible: dual slope
        {"slope_lo": 0.055, "int_lo": -2.2, "slope_hi": 0.16,
         "int_hi": -55.0, "F": 139.87},
        {"slope_lo": 0.06, "int_lo": -2.4, "slope_hi": 0.17,
         "int_hi": -60.0, "F": 232.2},
        {"slope_lo": 0.03, "int_lo": -1.2, "slope_hi": 0.09,
         "int_hi": -30.0, "F": 11.0},
        # IR: two-point + quadratic
        {"Ns": -5.53, "Nbb": 95.0, "Spc": 985.0, "Blb": 400.0,
         "b": [5.7, -0.11, 0.00057]},
        {"Ns": -2.22, "Nbb": 100.0, "Spc": 980.0, "Blb": 420.0,
         "b": [3.58, -0.05, 0.00025]},
        {"Ns": -1.6, "Nbb": 105.0, "Spc": 975.0, "Blb": 440.0,
         "b": [2.9, -0.04, 0.0002]},
    ]}}
    cal = NoaaAVHRR3Calibrator(P(), cfg)

    counts = np.array([[100.0, 500.0, 900.0]])
    # visible channel 0: crossover = (int_hi-int_lo)/(slope_lo-slope_hi)
    pc = cfg["vars"]["perChannel"][0]
    cross = (pc["int_hi"] - pc["int_lo"]) / (pc["slope_lo"] - pc["slope_hi"])
    exp = []
    for c in counts[0]:
        refl = (pc["slope_lo"] * c + pc["int_lo"]) / 100.0 if c <= cross \
            else (pc["slope_hi"] * c + pc["int_hi"]) / 100.0
        exp.append((pc["F"] / np.pi) * refl * cal.RADIANCE_FACTORS[0])
    np.testing.assert_allclose(cal.compute(0, counts)[0], exp, rtol=1e-12)

    # IR channel 4
    pc = cfg["vars"]["perChannel"][4]
    c = counts[0]
    nlin = pc["Ns"] + (pc["Nbb"] - pc["Ns"]) * (pc["Spc"] - c) / \
        (pc["Spc"] - pc["Blb"])
    exp = nlin + pc["b"][0] + pc["b"][1] * nlin + pc["b"][2] * nlin ** 2
    np.testing.assert_allclose(cal.compute(4, counts)[0], exp, rtol=1e-12)

    # zero counts are invalid
    assert cal.compute(4, np.array([0.0]))[0] == -9999.9


def test_avhrr_calibrator_per_line():
    class P:
        images = [type("H", (), {"bit_depth": 10})()]

    per_line = [
        [None, None, None] + [{"Ns": -5.0 + l, "Nbb": 90.0 + l,
                               "Spc": 980.0, "Blb": 400.0}
                              for _ in range(3)]
        for l in range(2)
    ]
    cfg = {"vars": {
        "perChannel": [{}, {}, {},
                       {"b": [0.0, 0.0, 0.0]},
                       {"b": [0.0, 0.0, 0.0]},
                       {"b": [0.0, 0.0, 0.0]}],
        "perLine_perChannel": per_line}}
    cal = NoaaAVHRR3Calibrator(P(), cfg)
    counts = np.full((2, 4), 700.0)
    out = cal.compute(3, counts)
    for l in range(2):
        Ns, Nbb, Spc, Blb = -5.0 + l, 90.0 + l, 980.0, 400.0
        exp = Ns + (Nbb - Ns) * (Spc - 700.0) / (Spc - Blb)
        np.testing.assert_allclose(out[l], exp, rtol=1e-12)


def _mhs_packet(line90x5: np.ndarray, seq: int, ms: int = 0) -> CCSDSPacket:
    """MetOp MHS packet: 14-byte CCSDS secondary header (CDS time first),
    then the 1286-byte SCI packet with the image zone at byte 49."""
    sci = np.zeros(1286, np.uint8)
    fovs = np.zeros((90, 12), np.uint8)
    fovs[:, 2:12:2] = (line90x5 >> 8).astype(np.uint8)
    fovs[:, 3:12:2] = (line90x5 & 0xFF).astype(np.uint8)
    sci[49: 49 + 90 * 12] = fovs.reshape(-1)
    hdr = bytes([20000 >> 8, 20000 & 0xFF,
                 (ms >> 24) & 0xFF, (ms >> 16) & 0xFF, (ms >> 8) & 0xFF,
                 ms & 0xFF, 0, 0, 0, 0, 0, 0, 0, 0])
    payload = bytearray(hdr + sci.tobytes() + b"\x00\x00")  # +CRC
    h = CCSDSHeader(apid=34, packet_sequence_count=seq,
                    packet_length=len(payload) - 1)
    return CCSDSPacket(header=h, payload=payload)


def test_mhs_reader_and_module(tmp_path, rng):
    from satdump_tpu.models.metop import MHSReader
    lines = rng.integers(0, 65535, (4, 90, 5), dtype=np.uint16)
    r = MHSReader()
    for i in range(4):
        r.work_metop(_mhs_packet(lines[i], i, ms=1000 * i))
    chans = r.channels()
    for c in range(5):
        assert np.array_equal(chans[c], lines[:, :, c])

    # through the module: VCID-12 CADUs
    pkts = [_mhs_packet(lines[i], i, ms=166 * i) for i in range(4)]
    zones = mux_packets(pkts, mpdu_data_size=882)
    cadus = np.zeros((len(zones), 1024), np.uint8)
    scid, vcid = 11, 12
    for i, (fhp, data) in enumerate(zones):
        cadus[i, 0:4] = [0x1A, 0xCF, 0xFC, 0x1D]
        cadus[i, 4] = (1 << 6) | ((scid >> 2) & 0b111111)
        cadus[i, 5] = ((scid & 0b11) << 6) | (vcid & 0b111111)
        cadus[i, 6:9] = [(i >> 16) & 0xFF, (i >> 8) & 0xFF, i & 0xFF]
        cadus[i, 12] = (fhp >> 8) & 0b111
        cadus[i, 13] = fhp & 0xFF
        cadus[i, 14:896] = np.frombuffer(data, np.uint8)
    cadu_path = tmp_path / "m.cadu"
    cadus.tofile(cadu_path)
    mod = MetOpInstrumentsDecoderModule(str(cadu_path), str(tmp_path / "out"),
                                        {})
    mod.process()
    assert mod.stats["mhs_lines"] == 4
    from satdump_tpu.products.product import load_product
    p = load_product(str(tmp_path / "MHS"))
    assert np.array_equal(p.get_channel("3").image, lines[:, :, 2])


def _iasi_packet(blk64: np.ndarray, counter: int, day=20000, ms=0) -> CCSDSPacket:
    """IASI imaging packet: CDS time + counter at [16] + 12-bit 64x64 block
    at [50] (iasi_imaging_reader.cpp layout; blk64[y, i] word order)."""
    payload = bytearray(6196)
    payload[0:8] = bytes([day >> 8, day & 0xFF, (ms >> 24) & 0xFF,
                          (ms >> 16) & 0xFF, (ms >> 8) & 0xFF, ms & 0xFF,
                          0, 0])
    payload[16] = counter
    packed = pack_nbits_to_bytes(blk64.reshape(-1).astype(np.uint16), 12)
    payload[50: 50 + 6144] = bytes(packed[:6144])
    h = CCSDSHeader(apid=150, packet_sequence_count=counter,
                    packet_length=len(payload) - 1)
    return CCSDSPacket(header=h, payload=payload)


def test_iasi_img_reader(rng):
    """Uniform cold/warm views make the scan normalization an identity:
    output equals input, calibration IFOVs cropped."""
    from satdump_tpu.models.metop import IASIIMGReader
    r = IASIIMGReader()
    blocks = {}
    # the image is counter-mirrored, so the calibration views at image
    # columns 0-5 correspond to the LAST counters (36,35 cold; 33,32 warm)
    for counter in range(1, 37):
        if counter in (36, 35):
            blk = np.full((64, 64), 100, np.uint16)      # cold views
        elif counter in (33, 32):
            blk = np.full((64, 64), 900, np.uint16)      # warm views
        else:
            blk = rng.integers(120, 880, (64, 64)).astype(np.uint16)
        blocks[counter] = blk
        r.work(_iasi_packet(blk, counter))
    assert r.lines == 1
    img = r.get_ir_channel()
    assert img.shape == (64, 30 * 64)
    # view v (1..30): image columns (after cropping the 6 calibration
    # views) start at 36*64 - 64*v - 384; row i col 63-y holds blk[y,i]<<4
    for v in (1, 10, 30):
        blk = blocks[v]
        x0 = 36 * 64 - 64 * v - 384
        seg = img[:, x0: x0 + 64]
        np.testing.assert_array_equal(seg, (blk.T[:, ::-1].astype(np.uint32)
                                            << 4).astype(np.uint16))


def _ascat_packet(samples: np.ndarray, apid: int, day=20000, ms=0) -> CCSDSPacket:
    payload = bytearray(654)
    payload[0:8] = bytes([day >> 8, day & 0xFF, (ms >> 24) & 0xFF,
                          (ms >> 16) & 0xFF, (ms >> 8) & 0xFF, ms & 0xFF,
                          0, 0])
    payload[140: 140 + 512] = samples.astype(">u2").tobytes()
    h = CCSDSHeader(apid=apid, packet_length=len(payload) - 1)
    h.raw = h.encode()
    # make the vertical parity valid so timestamps are accepted
    buf = h.raw + bytes(payload[:-2])
    words = np.frombuffer(buf[: len(buf) // 2 * 2], ">u2")
    ck = int(np.bitwise_xor.reduce(words))
    payload[-2] = ck >> 8
    payload[-1] = ck & 0xFF
    return CCSDSPacket(header=h, payload=payload)


def test_ascat_reader(rng):
    from satdump_tpu.models.metop import ASCATReader, _ieee_halfish_to_float
    r = ASCATReader()
    lines = rng.integers(0, 65536, (3, 256), dtype=np.uint32).astype(np.uint16)
    for i in range(3):
        r.work(_ascat_packet(lines[i], 208 + 2))   # beam 3
    assert r.lines[2] == 3
    np.testing.assert_array_equal(r.get_channel_img(2), lines)
    assert all(t > 0 for t in r.timestamps[2])
    # float format spot checks (ascat_reader.h parse_uint_to_float)
    assert _ieee_halfish_to_float(np.array([0x3F80], np.uint16))[0] == 1.0
    assert _ieee_halfish_to_float(np.array([0xBF80], np.uint16))[0] == -1.0
    assert _ieee_halfish_to_float(np.array([0x7F80], np.uint16))[0] == 0.0


def _gome_packet(bands_data: np.ndarray, counter: int, day=20000, ms=0):
    """bands_data: (2, 4, 1024) uint16 detector readouts."""
    hdr_words = np.zeros(478 + 680 + 2 * 4 * 1025, np.uint16)
    hdr_words[6] = counter
    base = 478 + 680
    blk = np.zeros((2, 4, 1025), np.uint16)
    blk[:, :, 1:] = bands_data
    hdr_words[base: base + 2 * 4 * 1025] = blk.reshape(-1)
    payload = bytearray(14)
    payload[0:8] = bytes([day >> 8, day & 0xFF, (ms >> 24) & 0xFF,
                          (ms >> 16) & 0xFF, (ms >> 8) & 0xFF, ms & 0xFF,
                          0, 0])
    payload += hdr_words.astype(">u2").tobytes()
    payload += bytes(max(0, 18732 - len(payload)))
    h = CCSDSHeader(apid=384, packet_sequence_count=counter,
                    packet_length=len(payload) - 1)
    return CCSDSPacket(header=h, payload=payload)


def test_gome_reader(rng):
    from satdump_tpu.models.metop import GOMEReader
    data = {c: rng.integers(0, 65536, (2, 4, 1024), dtype=np.uint32
                            ).astype(np.uint16) for c in range(16)}
    r = GOMEReader()
    for c in range(16):
        r.work(_gome_packet(data[c], c))
    assert r.lines == 1
    # band 0 (det 0, channels 0..658): global channel 10
    img = r.get_channel(10)
    assert img.shape == (1, 32)
    for c in range(16):
        assert img[0, 31 - (c * 2 + 0)] == data[c][0, 0, 10]
        assert img[0, 31 - (c * 2 + 1)] == data[c][1, 0, 10]


def test_amsu_metop_packets(rng):
    """MetOp AMSU APID-39/40 packets: idle-word filtering + line parse
    (amsu_reader.cpp:108-147)."""
    from satdump_tpu.models.noaa_tip import AMSUReader
    r = AMSUReader()
    # A1: build filtered stream so that _work_a1 sees known words: frame
    # layout uses indices 16+2j per 34-byte group (13 ch x 30 fov)
    a1 = np.zeros(1048, np.uint8)
    vals = rng.integers(2, 60000, (13, 30), dtype=np.uint32)
    idx = np.arange(0, 1020, 34)
    for j in range(13):
        a1[idx + 16 + 2 * j] = vals[j] >> 8
        a1[idx + 16 + 2 * j + 1] = vals[j] & 0xFF
    # pack into a packet: payload[14..] big-endian words, offset quirk:
    # the reader takes (p[i+1]<<8)|p[i+2] for i=13,15,...
    payload = bytearray(2096)
    payload[14: 14 + len(a1)] = bytes(a1)
    h = CCSDSHeader(apid=39, packet_length=2096 - 1)
    h.raw = h.encode()
    pkt = CCSDSPacket(header=h, payload=payload)
    r.work_metop(pkt)
    assert r.linesA1 == 1
    got = np.stack([r.get_channel_a1(c)[0] for c in range(13)])
    np.testing.assert_array_equal(got, vals.astype(np.uint16))
