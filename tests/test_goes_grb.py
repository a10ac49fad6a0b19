"""GOES-R GRB loopback: synthetic GRB payloads -> CCSDS packets -> CADUs ->
goes_grb_data_decoder -> ABI/SUVI/GLM products; plus the BBFrame -> CADU
extractor resync. Mirrors the reference semantics in
plugins/goes_support/goes/grb/ (PUG-GRB-vol4 structures)."""

import json
import struct
import zlib
from pathlib import Path

import numpy as np
import pytest

from satdump_tpu.ccsds import CCSDSHeader, CCSDSPacket
from satdump_tpu.ccsds.mux import mux_packets
from satdump_tpu.image.io import load_img
from satdump_tpu.image.j2k import compress_j2k, decompress_j2k
from satdump_tpu.models.goes_grb import (ABI_CHANNEL_PARAMS, BBFRAME_SIZE,
                                         CADU_SIZE, GRB_EPOCH,
                                         GRBCaduExtractorModule,
                                         GRBDataDecoderModule)


def _grb_packet(apid: int, variant: int, body: bytes, seq: int = 0) -> CCSDSPacket:
    """[8B GRB secondary header | body | CRC32] with a standalone seq flag."""
    sec = bytes([0, 0, 0, 0, 0, 0, (1 << 3) | (variant >> 2),
                 ((variant & 0b11) << 6)])
    payload = sec + body
    h = CCSDSHeader(apid=apid, sequence_flag=3, packet_sequence_count=seq,
                    packet_length=0)
    h.packet_length = len(payload) + 4 - 1
    h.raw = h.encode()
    crc = zlib.crc32(h.raw + payload) & 0xFFFFFFFF
    return CCSDSPacket(header=h, payload=bytearray(payload + crc.to_bytes(4, "big")))


def _image_payload_header(ts_s: int, width: int, height: int, x: int, y: int,
                          comp: int, dqf_off: int) -> bytes:
    return bytes([comp]) + ts_s.to_bytes(4, "big") + (0).to_bytes(4, "big") \
        + (0).to_bytes(2, "big") + (0).to_bytes(3, "big") \
        + x.to_bytes(4, "big") + y.to_bytes(4, "big") \
        + height.to_bytes(4, "big") + width.to_bytes(4, "big") \
        + dqf_off.to_bytes(4, "big")


def _generic_payload_header(ts_s: int) -> bytes:
    return bytes([0]) + ts_s.to_bytes(4, "big") + (0).to_bytes(4, "big") \
        + bytes(8) + (0).to_bytes(4, "big")


def _cadus_vcid(pkts, vcid: int) -> np.ndarray:
    """GRB CADUs: 2048 bytes, M-PDU data zone 2034 at offset 12."""
    zones = mux_packets(pkts, mpdu_data_size=2034)
    out = np.zeros((len(zones), CADU_SIZE), np.uint8)
    for i, (fhp, data) in enumerate(zones):
        out[i, 0:4] = [0x1A, 0xCF, 0xFC, 0x1D]
        out[i, 4] = (1 << 6)
        out[i, 5] = vcid & 0b111111
        out[i, 6:9] = [(i >> 16) & 0xFF, (i >> 8) & 0xFF, i & 0xFF]
        out[i, 10] = (fhp >> 8) & 0b111
        out[i, 11] = fhp & 0xFF
        out[i, 12:12 + 2034] = np.frombuffer(data, np.uint8)
    return out


def _abi_blocks_packets(img: np.ndarray, apid: int, depth: int, ts: int,
                        comp: int, rows_per_block: int = 32):
    """Split an image into GRB image payloads, one packet per block."""
    pkts = []
    for seq, y in enumerate(range(0, img.shape[0], rows_per_block)):
        blk = img[y: y + rows_per_block]
        if comp == 0:
            raw = blk.astype("<u2").tobytes()
        else:
            raw = compress_j2k(blk.astype(np.uint16))
        hdr = _image_payload_header(ts, blk.shape[1], blk.shape[0], 0, y,
                                    comp, len(raw))
        pkts.append(_grb_packet(apid, 2, hdr + raw, seq))
    return pkts


@pytest.mark.parametrize("comp", [0, 1])
def test_grb_abi_image_assembly(tmp_path, rng, comp):
    """ABI MESO-1 ch13 blocks (raw and J2K) reassemble to the exact image
    scaled to 16 bits (abi_image_assembler.cpp pushBlock semantics)."""
    apid = 0xDC          # mode 6, MESO_1, channel 13 (2 km -> 500x500)
    depth = ABI_CHANNEL_PARAMS[13][1]
    img = rng.integers(0, 1 << depth, (500, 500), dtype=np.uint16)
    ts = 800000000
    pkts = _abi_blocks_packets(img, apid, depth, ts, comp)
    # a second timestamp flushes the first image
    pkts += _abi_blocks_packets(img[:32] ^ 1, apid, depth, ts + 60, comp)
    cadus = _cadus_vcid(pkts, vcid=5)
    cadu_path = tmp_path / "grb.cadu"
    cadus.tofile(cadu_path)

    mod = GRBDataDecoderModule(str(cadu_path), str(tmp_path / "out" / "x"), {})
    mod.process()
    assert mod.stats["abi_blocks"] == len(pkts)
    pngs = sorted((tmp_path / "out" / "ABI" / "MESO1").rglob("ABI_*_13_*.png"))
    assert pngs, "no ABI image written"
    got = load_img(pngs[0])
    assert got.shape == (500, 500)
    np.testing.assert_array_equal(got, img << (16 - depth))


def test_grb_glm_flash_json(tmp_path):
    """GLM flash frame -> parsed JSON records (glm_parser.cpp layout)."""
    recs = struct.pack("<Q", 2)
    for fid in (7, 9):
        recs += struct.pack("<5H2f3H", fid, 1, 2, 3, 4, 12.5, -45.25,
                            100, 200, 0)
    pkt = _grb_packet(0x302, 0, _generic_payload_header(1000) + recs)
    cadus = _cadus_vcid([pkt], vcid=6)
    p = tmp_path / "glm.cadu"
    cadus.tofile(p)
    mod = GRBDataDecoderModule(str(p), str(tmp_path / "out" / "x"), {})
    mod.process()
    files = list((tmp_path / "out" / "GLM" / "Flash").glob("*.json"))
    assert len(files) == 1
    data = json.loads(files[0].read_text())
    assert data["number_of_flashes"] == 2
    assert data["records"][1]["flash_id"] == 9
    assert data["records"][0]["flash_lon"] == -45.25


def test_grb_crc_reject(tmp_path):
    """A corrupted packet must be discarded by the CRC check
    (payload_assembler.cpp crc_valid)."""
    pkt = _grb_packet(0x302, 0, _generic_payload_header(1000)
                      + struct.pack("<Q", 0))
    pkt.payload[10] ^= 0xFF      # corrupt after CRC was computed
    cadus = _cadus_vcid([pkt], vcid=6)
    p = tmp_path / "bad.cadu"
    cadus.tofile(p)
    mod = GRBDataDecoderModule(str(p), str(tmp_path / "out" / "x"), {})
    mod.process()
    assert mod.stats["glm"] == 0


def test_grb_cadu_extractor_resync(tmp_path, rng):
    """CADUs packed into BBFrames with a misaligned head: the extractor must
    re-sync on the ASM and recover every whole CADU
    (module_goes_grb_cadu_extractor.cpp:48-88)."""
    n = 24
    cadus = rng.integers(0, 256, (n, CADU_SIZE), dtype=np.uint8)
    cadus[:, 0:4] = [0x1A, 0xCF, 0xFC, 0x1D]
    stream = np.concatenate([rng.integers(0, 256, 137, dtype=np.uint8),
                             cadus.reshape(-1)])
    payload_per_bb = BBFRAME_SIZE - 10
    nbb = -(-len(stream) // payload_per_bb)
    bb = np.zeros((nbb, BBFRAME_SIZE), np.uint8)
    flat = np.concatenate([stream, np.zeros(nbb * payload_per_bb - len(stream),
                                            np.uint8)])
    bb[:, 10:] = flat.reshape(nbb, payload_per_bb)
    p = tmp_path / "x.bbframe"
    bb.tofile(p)

    mod = GRBCaduExtractorModule(str(p), str(tmp_path / "out"), {})
    mod.process()
    got = np.fromfile(mod.d_output_file, np.uint8).reshape(-1, CADU_SIZE)
    matched = sum(bool((cadus == g).all(axis=1).any()) for g in got)
    assert matched >= n - 1          # tail CADU may be cut by BB padding
    assert mod.stats["synced"]


def test_j2k_roundtrip_16bit(rng):
    img = rng.integers(0, 4096, (64, 96), dtype=np.uint16)
    back = decompress_j2k(compress_j2k(img))
    np.testing.assert_array_equal(back, img)
