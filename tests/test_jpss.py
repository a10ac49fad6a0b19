"""JPSS VIIRS/ATMS synthetic loopbacks (models/jpss.py vs
plugins/jpss_support semantics): AEC-compressed VIIRS segments reassemble
bit-exact, differential channels reconstruct, ATMS scanlines decode, and
the jpss_instruments module emits products."""

import numpy as np
import pytest

from satdump_tpu.ccsds import CCSDSHeader, CCSDSPacket
from satdump_tpu.ccsds.mux import mux_packets
from satdump_tpu.models.jpss import (ATMSReader, VIIRS_CHANNELS, VIIRSReader,
                                     JPSSInstrumentsDecoderModule)
from satdump_tpu.xrit.rice import rice_encode


def _cds_time(day: int, ms: int) -> bytes:
    return bytes([day >> 8, day & 0xFF, (ms >> 24) & 0xFF, (ms >> 16) & 0xFF,
                  (ms >> 8) & 0xFF, ms & 0xFF, 0, 0])


def _viirs_segment_packets(name: str, det_lines: np.ndarray, day: int = 20000,
                           ms: int = 0, seq0: int = 0):
    """det_lines: (zone_height, total_oversampled_width) int16 — raw samples
    BEFORE aggregation, split per zone. One header packet + one body packet
    per detector, mirroring channel_reader.cpp field offsets."""
    ch = VIIRS_CHANNELS[name]
    sync_pattern = 0xDEADBEEF
    pkts = []
    hdr_payload = bytearray(_cds_time(day, ms))
    hdr_payload += bytes([ch.zone_height])            # number_of_packets
    hdr_payload += bytes(20)
    h = CCSDSHeader(apid=ch.apid, sequence_flag=1,
                    packet_sequence_count=seq0,
                    packet_length=len(hdr_payload) - 1)
    pkts.append(CCSDSPacket(header=h, payload=hdr_payload))

    for det in range(ch.zone_height):
        body = bytearray(88)
        body[19] = det
        body[20:24] = sync_pattern.to_bytes(4, "big")
        col = 0
        for z in range(6):
            w = ch.zone_width[z] * ch.oversample[z]
            samples = det_lines[det, col: col + w].astype(np.uint16) & 0x7FFF
            col += w
            enc = rice_encode(samples, 15, 8, rsi=128)
            checksum_offset = 4 + len(enc)
            rec = bytearray()
            rec.append(0)                     # fill_size
            rec.append(0)
            rec += checksum_offset.to_bytes(2, "big")
            rec += enc
            rec += bytes(4)                   # checksum (unchecked)
            rec += sync_pattern.to_bytes(4, "big")
            body += rec
        hb = CCSDSHeader(apid=ch.apid, sequence_flag=0,
                         packet_sequence_count=seq0 + 1 + det,
                         packet_length=len(body) - 1)
        pkts.append(CCSDSPacket(header=hb, payload=body))
    return pkts


def _reader_image_rows(name, det_lines):
    """Expected recomposed rows for one segment (line-reversed, aggregated,
    scaled)."""
    ch = VIIRS_CHANNELS[name]
    rows = np.zeros((ch.zone_height, ch.total_width), np.uint16)
    for det in range(ch.zone_height):
        col = 0
        out = []
        for z in range(6):
            w = ch.zone_width[z] * ch.oversample[z]
            v = det_lines[det, col: col + w].astype(np.int64) & 0x7FFF
            col += w
            if ch.oversample[z] > 1:
                v = v.reshape(-1, ch.oversample[z])
                v = v.sum(axis=1) // ch.oversample[z]
            out.append(v)
        rows[ch.zone_height - 1 - det] = np.clip(
            np.concatenate(out) * ch.scale, 0, 65535)
    return rows


def _total_oversampled(name):
    ch = VIIRS_CHANNELS[name]
    return sum(w * o for w, o in zip(ch.zone_width, ch.oversample))


def test_viirs_reader_roundtrip_m6(rng):
    """No-aggregation channel: samples come back exactly (x scale)."""
    name = "M6"
    w = _total_oversampled(name)
    det = (rng.integers(0, 4096, (16, w))).astype(np.uint16)
    r = VIIRSReader(VIIRS_CHANNELS[name])
    for p in _viirs_segment_packets(name, det):
        r.feed(p)
    assert len(r.segments) == 1
    img = r.get_image()
    np.testing.assert_array_equal(img[:16], _reader_image_rows(name, det))


def test_viirs_reader_aggregated_m4(rng):
    """Aggregated zones decimate-average (channel_reader.cpp:100-113)."""
    name = "M4"
    w = _total_oversampled(name)
    det = (rng.integers(0, 8000, (16, w))).astype(np.uint16)
    r = VIIRSReader(VIIRS_CHANNELS[name])
    for p in _viirs_segment_packets(name, det):
        r.feed(p)
    img = r.get_image()
    np.testing.assert_array_equal(img[:16], _reader_image_rows(name, det))


def test_viirs_differential_decode(rng):
    """M5 coded relative to M4: value = m5 + m4 - 16383."""
    m4 = (rng.integers(4000, 8000, (16, _total_oversampled("M4")))
          ).astype(np.uint16)
    truth = rng.integers(2000, 9000, (16, _total_oversampled("M5")))
    # encode m5 as residual: coded = truth - m4_agg + 16383, per sample.
    # aggregation makes exact inversion messy; use agg=1 zones only by
    # matching m4's aggregated output as the prediction source
    r4 = VIIRSReader(VIIRS_CHANNELS["M4"])
    for p in _viirs_segment_packets("M4", m4):
        r4.feed(p)
    ch5 = VIIRS_CHANNELS["M5"]
    pred = np.zeros((16, ch5.total_width), np.int64)
    for det in range(16):
        col = 0
        out = []
        for z in range(6):
            w = ch5.zone_width[z] * ch5.oversample[z]
            v = r4.segments[0].detector_data[det][z][: ch5.zone_width[z]]
            out.append(v)
            col += w
        pred[det] = np.concatenate(out)
    # truth restricted to zone widths (what the reader emits)
    t_eff = np.zeros_like(pred)
    col = 0
    tc = 0
    for z in range(6):
        w = ch5.zone_width[z]
        t_eff[:, col: col + w] = truth[:, tc: tc + w]
        col += w
        tc += ch5.zone_width[z] * ch5.oversample[z]
    coded = (t_eff - pred + 16383)
    # re-expand coded into oversampled layout for the packet builder
    det_lines = np.zeros((16, _total_oversampled("M5")), np.uint16)
    col = 0
    cc = 0
    for z in range(6):
        w = ch5.zone_width[z]
        o = ch5.oversample[z]
        det_lines[:, cc: cc + w * o: o] = coded[:, col: col + w]
        if o > 1:  # repeat so aggregation averages back to the value
            for k in range(1, o):
                det_lines[:, cc + k: cc + w * o: o] = coded[:, col: col + w]
        col += w
        cc += w * o
    r5 = VIIRSReader(VIIRS_CHANNELS["M5"])
    for p in _viirs_segment_packets("M5", det_lines):
        r5.feed(p)
    r5.differential_decode(r4, 1)
    img = r5.get_image()
    expected = np.zeros((16, ch5.total_width), np.uint16)
    for det in range(16):
        expected[15 - det] = np.clip(t_eff[det] * ch5.scale, 0, 65535)
    np.testing.assert_array_equal(img[:16], expected)


def _atms_scan_packets(chans: np.ndarray, line: int, seq0: int = 0):
    """chans: (22, 104) — 96 earth + 4 cold + 4 warm views."""
    pkts = []
    for sp in range(104):
        payload = bytearray(_cds_time(20000, 1000 * line))
        payload += bytes(2)
        payload.append(0x80 if sp == 0 else 0)   # scan sync flag
        payload.append(0)
        for c in range(22):
            payload += int(chans[c, sp]).to_bytes(2, "big")
        payload += bytes(56 - len(payload)) if len(payload) < 56 else b""
        h = CCSDSHeader(apid=528, sequence_flag=3,
                        packet_sequence_count=seq0 + sp,
                        packet_length=len(payload) - 1)
        pkts.append(CCSDSPacket(header=h, payload=payload))
    return pkts


def test_atms_reader(rng):
    chans = rng.integers(0, 65535, (3, 22, 104), dtype=np.uint16)
    r = ATMSReader()
    for ln in range(3):
        for p in _atms_scan_packets(chans[ln], ln, seq0=ln * 104):
            r.work(p)
    assert r.lines == 3
    for c in range(22):
        got = r.get_channel(c)
        # earth views are scan-reversed: position sp -> column 95-sp
        np.testing.assert_array_equal(got, chans[:, c, :96][:, ::-1])


def test_jpss_instruments_module(tmp_path, rng):
    """CADUs (VCID 16 VIIRS + VCID 1 ATMS) -> module -> products."""
    name = "M6"
    det = (rng.integers(0, 4096, (16, _total_oversampled(name)))
           ).astype(np.uint16)
    viirs_pkts = _viirs_segment_packets(name, det)
    atms_chans = rng.integers(0, 65535, (22, 104), dtype=np.uint16)
    atms_pkts = _atms_scan_packets(atms_chans, 0)

    def make_cadus(pkts, vcid):
        zones = mux_packets(pkts, mpdu_data_size=1094)
        out = np.zeros((len(zones), 1279), np.uint8)
        scid = 159  # NOAA-20
        for i, (fhp, data) in enumerate(zones):
            out[i, 0:4] = [0x1A, 0xCF, 0xFC, 0x1D]
            out[i, 4] = (1 << 6) | ((scid >> 2) & 0b111111)
            out[i, 5] = ((scid & 0b11) << 6) | (vcid & 0b111111)
            out[i, 6:9] = [(i >> 16) & 0xFF, (i >> 8) & 0xFF, i & 0xFF]
            out[i, 19] = (fhp >> 8) & 0b111
            out[i, 20] = fhp & 0xFF
            out[i, 21:21 + 1094] = np.frombuffer(data, np.uint8)
        return out

    cadus = np.concatenate([make_cadus(viirs_pkts, 16),
                            make_cadus(atms_pkts, 1)])
    p = tmp_path / "x.cadu"
    cadus.tofile(p)
    mod = JPSSInstrumentsDecoderModule(str(p), str(tmp_path / "out"), {})
    mod.process()
    assert mod.stats["satellite"].startswith("NOAA 20")
    assert mod.stats["atms_lines"] == 1
    assert mod.stats["viirs_channels"] >= 1
    from satdump_tpu.products.product import load_product
    vp = load_product(str(tmp_path / "VIIRS"))
    ch = vp.get_channel("m6")
    assert ch.image.shape[1] == 3200
    ap = load_product(str(tmp_path / "ATMS"))
    assert ap.get_channel("5").image.shape == (1, 96)


def test_omps_nadir_reader(rng):
    """OMPS frame: szip-compressed 32-bit words -> channels
    (omps_nadir_reader.cpp:30-70)."""
    from satdump_tpu.models.jpss import omps_nadir_reader
    from satdump_tpu.xrit.rice import rice_encode
    r = omps_nadir_reader()
    vals = rng.integers(0, 60000, (339, 142), dtype=np.int64)
    words = np.zeros(74 + 339 * 142, np.uint32)
    words[74:] = vals.reshape(-1)
    comp = rice_encode(words, 32, 32, rsi=8)
    # reference strips 149 header AND 149 trailer bytes
    frame = bytearray(149) + comp + bytearray(149)
    # feed as packets: first (seq 1) then continuation, then a new seq-1
    # packet triggers processing of the previous frame
    h1 = CCSDSHeader(apid=616, sequence_flag=1)
    r.work(CCSDSPacket(header=h1, payload=bytearray(frame[:1000])))
    h0 = CCSDSHeader(apid=616, sequence_flag=0)
    r.work(CCSDSPacket(header=h0, payload=bytearray(frame[1000:])))
    h2 = CCSDSHeader(apid=616, sequence_flag=1)
    r.work(CCSDSPacket(header=h2, payload=bytearray(
        _cds_time(20000, 0) + bytes(8))))
    assert r.lines == 1
    got = np.stack([r.get_channel(c)[0] for c in range(339)])
    np.testing.assert_array_equal(got, np.minimum(vals, 65535
                                                  ).astype(np.uint16))
