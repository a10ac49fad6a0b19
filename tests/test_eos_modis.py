"""EOS MODIS reader/module loopbacks (models/eos.py vs modis_reader.cpp)."""

import numpy as np
import pytest

from satdump_tpu.ccsds import CCSDSHeader, CCSDSPacket
from satdump_tpu.ccsds.mux import mux_packets
from satdump_tpu.models.eos import (EOSInstrumentsDecoderModule, MODISReader,
                                    _modis_crc)
from satdump_tpu.utils.repack import pack_nbits_to_bytes


def _day_packet(words415: np.ndarray, position: int, seq: int,
                scan_count: int = 1, day=20000, ms=0) -> CCSDSPacket:
    words = np.zeros(416, np.uint16)
    words[:415] = words415
    words[415] = _modis_crc(words[:415])
    payload = bytearray(12)
    payload[0:2] = int(day).to_bytes(2, "big")
    payload[2:6] = int(ms).to_bytes(4, "big")
    payload[8] = (0 << 4) | ((scan_count & 0b111) << 1)   # DAY_GROUP
    efc = position + 1
    payload[9] = (efc >> 4) & 0x7F
    payload[10] = (efc & 0xF) << 4
    payload[11] = 0
    payload += bytes(pack_nbits_to_bytes(words, 12))
    payload += bytes(max(0, 636 - len(payload)))
    h = CCSDSHeader(apid=64, sequence_flag=seq,
                    packet_length=len(payload) - 1)
    return CCSDSPacket(header=h, payload=payload)


def test_modis_day_scan_assembly(rng):
    """One scan, positions 0..7, both packet halves: channels land exactly
    per the reference index formulas (modis_reader.cpp:124-165)."""
    P = 8
    r = MODISReader()
    data = {}
    for pos in range(P):
        for seq in (1, 2):
            w = rng.integers(0, 4096, 415).astype(np.uint16)
            data[(pos, seq)] = w
            r.work(_day_packet(w, pos, seq))
    assert r.lines == 10 and r.day_count == P * 2

    img1000 = [r.get_image_1000m(c) for c in range(31)]
    img500 = [r.get_image_500m(c) for c in range(5)]
    img250 = [r.get_image_250m(c) for c in range(2)]
    for pos in range(P):
        for seq in (1, 2):
            w = data[(pos, seq)]
            base = 5 if seq == 1 else 0
            for f in range(5):
                blk = w[(4 - f) * 83: (4 - f) * 83 + 83]
                row = base + f
                for c in range(31):
                    assert img1000[c][row, pos] == blk[52 + c] << 4
                for c in range(5):
                    for i in range(2):
                        for y in range(2):
                            assert img500[c][row * 2 + (1 - y), pos * 2 + i] \
                                == blk[32 + c * 4 + i * 2 + y] << 4
                for c in range(2):
                    for i in range(4):
                        for y in range(4):
                            assert img250[c][row * 4 + (3 - y), pos * 4 + i] \
                                == blk[c * 16 + i * 4 + y] << 4


def test_modis_crc_rejects_corruption(rng):
    r = MODISReader()
    pkt = _day_packet(rng.integers(0, 4096, 415).astype(np.uint16), 0, 1)
    pkt.payload[20] ^= 0xFF
    r.work(pkt)
    assert r.lines == 0 or (r._rows1000[-1] == 0).all()


def test_eos_module_aqua(tmp_path, rng):
    pkts = []
    for pos in range(4):
        for seq in (1, 2):
            pkts.append(_day_packet(
                rng.integers(0, 4096, 415).astype(np.uint16), pos, seq))
    zones = mux_packets(pkts, mpdu_data_size=884)
    cadus = np.zeros((len(zones), 1024), np.uint8)
    for i, (fhp, data) in enumerate(zones):
        cadus[i, 0:4] = [0x1A, 0xCF, 0xFC, 0x1D]
        cadus[i, 5] = 30                      # Aqua MODIS VCID
        cadus[i, 10] = (fhp >> 8) & 0b111
        cadus[i, 11] = fhp & 0xFF
        cadus[i, 12:12 + 884] = np.frombuffer(data, np.uint8)
    p = tmp_path / "x.cadu"
    cadus.tofile(p)
    mod = EOSInstrumentsDecoderModule(str(p), str(tmp_path / "out"),
                                      {"satellite": "aqua"})
    mod.process()
    assert mod.stats["modis_lines"] == 10
    from satdump_tpu.products.product import load_product
    prod = load_product(str(tmp_path / "MODIS"))
    assert len(prod.images) == 38
    assert prod.get_channel("1").image.shape == (40, 1354 * 4)
    assert prod.get_channel("8").image.shape == (10, 1354)


def test_aqua_db_decoder(tmp_path, rng):
    """Aqua DB loopback: CADUs -> dual-rail NRZ-M OQPSK softs -> decoder."""
    from satdump_tpu import sim
    from satdump_tpu.models.eos import AquaDBDecoderModule
    from satdump_tpu.ops.fec import differential

    cadus = sim.make_cadus(8, rng)
    bits = sim.encode_cadu_stream_uncoded(cadus)   # randomize + unpack
    bi, _ = differential.nrzm_encode(bits[0::2])
    bq, _ = differential.nrzm_encode(bits[1::2])
    soft = np.empty(2 * len(bi), np.int8)
    soft[0::2] = np.where(bi > 0, 90, -90)
    soft[1::2] = np.where(bq > 0, 90, -90)
    p = tmp_path / "a.soft"
    soft.tofile(p)
    mod = AquaDBDecoderModule(str(p), str(tmp_path / "out"), {})
    mod.process()
    got = np.fromfile(mod.d_output_file, np.uint8).reshape(-1, 1024)
    matched = sum(bool((cadus == g).all(axis=1).any()) for g in got)
    assert matched >= 7
