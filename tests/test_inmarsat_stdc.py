"""Inmarsat STD-C: frame coding roundtrips, packet parsing, and the
decoder+parser modules end to end on synthetic frames.

TX fixtures mirror plugins/inmarsat_support/stdc/ in reverse: packets with
the descriptor/CRC envelope are packed into 640-byte frames, scrambled,
convolutionally encoded ({109,79}), interleaved, row-permuted and given the
per-row sync symbols."""

import json
import os

import numpy as np
import pytest

from satdump_tpu.ops import inmarsat_stdc as stdc
from satdump_tpu.pipeline.modules.inmarsat import stdc_pkts as pkts
from satdump_tpu.pipeline.modules.inmarsat.stdc_decoder import \
    STDCDecoderModule
from satdump_tpu.pipeline.modules.inmarsat.stdc_parser import (
    STDCParserModule, STDPacketParser)


# -- TX packet builders -------------------------------------------------------

def mk_short(ptype: int, body: bytes) -> bytes:
    length = 1 + len(body) + 2
    assert length <= 16 and ptype < 8
    return pkts.append_crc(bytes([(ptype << 4) | (length - 1)]) + body
                           + b"\0\0")


def mk_medium(ptype: int, body: bytes) -> bytes:
    length = 2 + len(body) + 2
    return pkts.append_crc(bytes([0x80 | ptype, length - 2]) + body + b"\0\0")


def mk_bulletin_board(frame_number: int) -> bytes:
    body = bytes([1,                                   # network version
                  frame_number >> 8, frame_number & 0xFF,
                  3 << 2, 0x00,
                  (1 << 5) | (2 << 2),                 # NCS, local id 2
                  (1 << 6) | 4,                        # AOR-E, LES 4
                  0xE0,                                # 600bd, oper, in svc
                  0x60, 0x00,                          # SafetyNet + InmC
                  25])
    return mk_short(0x07, body)


def mk_message_data(lcn: int, seq: int, text: str) -> bytes:
    body = bytes([(1 << 6) | 4, lcn, seq]) + text.encode("ascii")
    return mk_medium(0x2A, body)


def mk_egc(ptype: int, msg_seq: int, pkt_seq: int, cont: bool,
           text: str) -> bytes:
    svc = 0x00                               # all ships, 3-byte address
    body = bytes([svc, (cont << 7) | (1 << 5) | 3,
                  msg_seq >> 8, msg_seq & 0xFF, pkt_seq,
                  0]) + b"\x01\x02\x03" + text.encode("ascii")
    return mk_medium(ptype, body)


def mk_frame(packets: list) -> np.ndarray:
    buf = b"".join(packets)
    assert len(buf) <= stdc.FRAME_SIZE_BYTES
    return np.frombuffer(buf + b"\0" * (stdc.FRAME_SIZE_BYTES - len(buf)),
                         np.uint8)


def frames_to_soft(frames: list, rng, snr_scale=0.0, invert=False
                   ) -> np.ndarray:
    """Frames -> channel-bit soft symbols with leading/trailing noise."""
    bits = np.concatenate([stdc.encode_frame(f) for f in frames])
    soft = np.where(bits > 0, 100, -100).astype(np.float64)
    if snr_scale > 0:
        soft = soft + rng.normal(0, snr_scale * 100, len(soft))
    if invert:
        soft = -soft
    noise = rng.integers(-50, 50, 700)
    return np.concatenate([noise, soft, noise]).clip(-127, 127).astype(np.int8)


# -- coding-layer roundtrips --------------------------------------------------

def test_scramble_roundtrip(rng):
    pkt = rng.integers(0, 256, stdc.FRAME_SIZE_BYTES).astype(np.uint8)
    assert np.array_equal(stdc.descramble(stdc.scramble(pkt)), pkt)


def test_permute_interleave_roundtrip(rng):
    coded = rng.integers(0, 2, stdc.ENCODED_FRAME_SIZE_NOSYNC).astype(np.uint8)
    frame = stdc.interleave_frame(coded)
    # sync symbols live in the received domain rows
    rows = frame.reshape(64, 162)
    assert np.array_equal(rows[:, 0], stdc.SYNCWORD)
    assert np.array_equal(rows[:, 1], stdc.SYNCWORD)
    back = stdc.deinterleave(stdc.depermute(frame.astype(np.int8)))
    assert np.array_equal(back.astype(np.uint8), coded)


def test_frame_match_and_decode(rng):
    frame_bytes = rng.integers(0, 256, stdc.FRAME_SIZE_BYTES).astype(np.uint8)
    soft = frames_to_soft([frame_bytes], rng)
    scores = stdc.frame_match_scores(soft)
    hits = stdc.find_frames(soft)
    assert len(hits) == 1
    off, inverted = hits[0]
    assert off == 700 and not inverted
    assert scores[off] == 128.0
    data, ber = stdc.decode_frame(soft[off: off + stdc.ENCODED_FRAME_SIZE])
    assert ber < 0.05
    assert np.array_equal(data, frame_bytes)


def test_frame_decode_inverted_noisy(rng):
    frame_bytes = rng.integers(0, 256, stdc.FRAME_SIZE_BYTES).astype(np.uint8)
    soft = frames_to_soft([frame_bytes], rng, snr_scale=0.45, invert=True)
    hits = stdc.find_frames(soft)
    assert len(hits) == 1 and hits[0][1] is True
    off = hits[0][0]
    inv = (-soft[off: off + stdc.ENCODED_FRAME_SIZE].astype(np.int16)) \
        .clip(-127, 127).astype(np.int8)
    data, ber = stdc.decode_frame(inv)
    assert np.array_equal(data, frame_bytes)


# -- packet layer -------------------------------------------------------------

def test_parse_bulletin_board():
    raw = np.frombuffer(mk_bulletin_board(5000), np.uint8)
    o = pkts.parse_bulletin_board(raw, len(raw))
    assert o["frame_number"] == 5000
    assert abs(o["seconds_of_day"] - 43200) < 1
    assert o["channel_type_name"] == "NCS"
    assert o["sat_id"] == 1 and o["les_id"] == 4
    assert "Vizada-Telenor, Norway" in o["les_name"]
    assert o["status"]["return_link_speed"] == 600
    assert o["services"]["SafetyNet"] and not o["services"]["FleetNet"]


def test_parse_crc_rejects_corruption():
    raw = bytearray(mk_bulletin_board(100))
    raw[3] ^= 0xFF
    with pytest.raises(pkts.PacketError):
        pkts.parse_bulletin_board(np.frombuffer(bytes(raw), np.uint8),
                                  len(raw))


def test_packet_walk_and_multiframe():
    inner = mk_bulletin_board(1234)
    mf_total = len(inner) + 2
    # multiframe fragments carry the inner packet WITHOUT its CRC: the
    # reassembly completes at inner_length-2 bytes and the zero-padded tail
    # passes the inner parse via the sent_crc==0 escape (pkt_parser.cpp:9-33,
    # packets_structs.h:120-122)
    part1, part2 = inner[:6], inner[6:-2]
    mf1 = mk_medium(0x3D, part1)
    mf2 = mk_medium(0x3E, part2)
    frame = mk_frame([mk_message_data(3, 0, "HELLO "), mf1, mf2])
    got = []
    STDPacketParser(got.append).parse_main_pkt(frame, 86400 * 100.0)
    types = [g["descriptor"]["type"] for g in got]
    assert types == [0x2A, 0x07]
    assert got[0]["message"] == "HELLO "
    assert got[1]["frame_number"] == 1234


def test_egc_parse():
    raw = np.frombuffer(mk_egc(0x31, 77, 0, True, "NAV WARNING "), np.uint8)
    o = pkts.parse_egc(raw, len(raw))
    assert o["message_sequence_number"] == 77
    assert o["continuation"] is True
    assert o["message"] == "NAV WARNING "
    assert o["priority"] == "Safety"
    assert o["address_raw"] == [1, 2, 3]


# -- modules end to end -------------------------------------------------------

def test_stdc_modules_end_to_end(tmp_path, rng):
    frames = [
        mk_frame([mk_bulletin_board(1000),
                  mk_message_data(3, 0, "THE QUICK BROWN "),
                  mk_egc(0x31, 7, 0, True, "SECURITE: "),
                  mk_egc(0x32, 7, 0, False, "ICE REPORT")]),
        mk_frame([mk_bulletin_board(1002),      # +2 frames = 17.3 s later
                  mk_message_data(3, 1, "FOX JUMPS OVER")]),
        mk_frame([mk_bulletin_board(1010)]),    # +69 s: flushes the channel
    ]
    soft = frames_to_soft(frames, rng, snr_scale=0.3)
    soft_path = tmp_path / "test.soft"
    soft.tofile(soft_path)

    dec = STDCDecoderModule(str(soft_path), str(tmp_path / "out"), {})
    dec.process()
    assert dec.stats["frames"] == 3
    assert dec.stats["viterbi_ber"] < 0.1
    frm = np.fromfile(dec.d_output_file, np.uint8)
    assert np.array_equal(frm.reshape(3, -1), np.stack(frames))

    par = STDCParserModule(dec.d_output_file, str(tmp_path / "msg" / "x"),
                           {"start_timestamp": 86400 * 1000})
    par.process()
    assert par.stats["frames"] == 3
    out = tmp_path / "msg"
    full = sorted((out / "Full Message").glob("*.json"))
    assert len(full) == 1
    msg = json.loads(full[0].read_text())
    assert msg["message"] == "THE QUICK BROWN FOX JUMPS OVER"
    egc = sorted((out / "EGC Message").glob("*.json"))
    assert len(egc) == 1
    assert json.loads(egc[0].read_text())["message"] == \
        "SECURITE: ICE REPORT"
    assert (out / "Bulletin Board").exists()
