"""Inmarsat Aero: coding roundtrips, the decoder module on synthetic frames
(P-channel BPSK, R/T OQPSK and the punctured C channel), and the signal-unit
/ ACARS parser. TX fixtures mirror plugins/inmarsat_support/aero/ in
reverse."""

import json

import numpy as np
import pytest

from satdump_tpu.ops import inmarsat_aero as aero
from satdump_tpu.ops.fec.correlator import build_replicas
from satdump_tpu.pipeline.modules.inmarsat.aero_decoder import \
    AeroDecoderModule
from satdump_tpu.pipeline.modules.inmarsat.aero_parser import (
    ACARSParser, AeroParserModule, append_crc, check_crc, is_acars_data,
    parse_isu_user_data)


def test_interleave_roundtrip(rng):
    for cols in (6, 9, 78):
        data = rng.integers(-100, 100, 64 * cols).astype(np.int8)
        assert np.array_equal(
            aero.deinterleave(aero.interleave(data, cols), cols), data)


def test_derand_roundtrip(rng):
    seq = aero.randomization_seq(1152)
    payload = rng.integers(0, 256, 72).astype(np.uint8)
    for rev in (True, False):
        raw = aero.rand_bytes_tx(payload, seq, reverse=rev)
        assert np.array_equal(aero.derand_bytes(raw, seq, reverse=rev),
                              payload)


def test_depuncture_matches_reference_walk(rng):
    soft = rng.integers(-100, 100, 4095).astype(np.int8)
    out = aero.depuncture(soft, shift=2)
    # reference loop port for the oracle (decode_utils.cpp:18-40)
    exp = []
    for i in range(len(soft)):
        if (i + 2) % 3 == 0:
            exp.append(int(soft[i]) + 127)
        elif (i + 2) % 3 == 1:
            exp.append(int(soft[i]) + 127)
            exp.append(128)
        else:
            exp.append(int(soft[i]) + 127)
    assert np.array_equal(out, np.array(exp, np.uint8))
    assert len(out) == 5460


def test_c84_pack_unpack_roundtrip(rng):
    voice = rng.integers(0, 256, 300).astype(np.uint8)
    blocks = rng.integers(0, 256, 36).astype(np.uint8)
    packed = aero.pack_c84(voice, blocks)
    v2, b2 = aero.unpack_c84(packed)
    assert np.array_equal(v2, voice)
    assert np.array_equal(b2, blocks)


def _soft_stream(frames_bits, rng, pad=500):
    soft = np.concatenate(
        [np.where(b > 0, 100, -100) for b in frames_bits]).astype(np.float64)
    noise = rng.integers(-40, 40, pad)
    return np.concatenate([noise, soft, noise]).clip(-127, 127) \
        .astype(np.int8)


def test_aero_decoder_p_channel(tmp_path, rng):
    """0.6k P channel: BPSK, cols 6, blocks 3 -> 72-byte frames."""
    cfg = dict(oqpsk=False, dummy_bits=0, inter_cols=6, inter_blocks=3)
    payloads = [rng.integers(0, 256, 72).astype(np.uint8) for _ in range(3)]
    frames = [aero.encode_frame(p, **cfg, rng=rng) for p in payloads]
    soft = _soft_stream(frames, rng)
    p = tmp_path / "a.soft"
    soft.tofile(p)
    mod = AeroDecoderModule(str(p), str(tmp_path / "out"), cfg)
    mod.process()
    assert mod.stats["frames"] == 3
    got = np.fromfile(mod.d_output_file, np.uint8).reshape(3, 72)
    assert np.array_equal(got, np.stack(payloads))


def test_aero_decoder_oqpsk_rotated(tmp_path, rng):
    """10.5k channel: OQPSK, cols 78 -> 312-byte frames, stream rotated to
    exercise the ambiguity correction."""
    cfg = dict(oqpsk=True, dummy_bits=178, inter_cols=78, inter_blocks=1)
    payloads = [rng.integers(0, 256, 312).astype(np.uint8) for _ in range(2)]
    frames = [aero.encode_frame(p, **cfg, rng=rng) for p in payloads]
    soft = _soft_stream(frames, rng).astype(np.float32)
    # rotate the whole stream +90 deg (replica 0's ambiguity)
    c = (soft[0::2] + 1j * soft[1::2]) * np.exp(1j * np.pi / 2)
    rot = np.empty_like(soft)
    rot[0::2], rot[1::2] = c.real, c.imag
    p = tmp_path / "a.soft"
    rot.clip(-127, 127).astype(np.int8).tofile(p)
    mod = AeroDecoderModule(str(p), str(tmp_path / "out"), cfg)
    mod.process()
    assert mod.stats["frames"] == 2
    got = np.fromfile(mod.d_output_file, np.uint8).reshape(2, 312)
    assert np.array_equal(got, np.stack(payloads))


def test_aero_decoder_c_channel(tmp_path, rng):
    """8.4k C channel: punctured Viterbi + voice/data demux -> 336 bytes."""
    cfg = dict(is_c=True, oqpsk=True, dummy_bits=0, inter_cols=4,
               inter_blocks=16, ber_thresold=0.25)
    voice = rng.integers(0, 256, 300).astype(np.uint8)
    blocks = rng.integers(0, 256, 36).astype(np.uint8)
    packed = aero.pack_c84(voice, blocks)
    frame = aero.encode_frame(packed, oqpsk=True, dummy_bits=0,
                              inter_cols=4, inter_blocks=16, is_c=True,
                              rng=rng)
    soft = _soft_stream([frame, frame], rng).astype(np.float32)
    # OQPSK replica set carries no unrotated variant: present the stream at
    # +90 deg like a real OQPSK demod output
    c = (soft[0::2] + 1j * soft[1::2]) * np.exp(1j * np.pi / 2)
    rot = np.empty_like(soft)
    rot[0::2], rot[1::2] = c.real, c.imag
    p = tmp_path / "a.soft"
    rot.clip(-127, 127).astype(np.int8).tofile(p)
    mod = AeroDecoderModule(str(p), str(tmp_path / "out"), cfg)
    mod.process()
    assert mod.stats["frames"] == 2
    got = np.fromfile(mod.d_output_file, np.uint8).reshape(2, 336)
    assert np.array_equal(got[0, :36], blocks)
    assert np.array_equal(got[0, 36:], voice)


# -- parser -------------------------------------------------------------------

def _odd_parity(c: int) -> int:
    return c | 0x80 if bin(c & 0x7F).count("1") % 2 == 0 else c


def mk_acars_payload(reg: str, label: str, text: str) -> np.ndarray:
    body = [0xFF, 0xFF, 0x01, ord("2")]
    body += [_odd_parity(ord(ch)) for ch in reg.rjust(7, ".")]
    body += [ord("!"), ord(label[0]), ord(label[1]), ord("1"), 0x02]
    body += [_odd_parity(ord(ch)) for ch in text]
    body += [0x03, 0x00, 0x00, 0x7F]
    return np.array(body, np.uint8)


def payload_to_sus(payload: np.ndarray, rng) -> list:
    """ISU (2 bytes) + SSU chain (8 bytes each, last seq 0)."""
    rest = payload[2:]
    n_ssu = -(-len(rest) // 8)
    last = len(rest) - (n_ssu - 1) * 8
    isu = bytes([0x71, 0x12, 0x34, 0x56, 0x01, 0x20,
                 n_ssu & 0x3F, last << 4]) + payload[:2].tobytes()
    sus = [append_crc(isu)]
    for i in range(n_ssu):
        chunk = rest[i * 8: (i + 1) * 8].tobytes().ljust(8, b"\0")
        seq = 0 if i == n_ssu - 1 else n_ssu - 1 - i
        sus.append(append_crc(bytes([0xC0 | seq, 0x12]) + chunk))
    return sus


def test_su_crc():
    su = append_crc(bytes(range(10)))
    assert check_crc(np.frombuffer(su, np.uint8))
    bad = bytearray(su)
    bad[2] ^= 1
    assert not check_crc(np.frombuffer(bytes(bad), np.uint8))


def test_acars_assembly(rng):
    payload = mk_acars_payload("N12345", "H1", "POSITION REPORT 51N 004W")
    assert is_acars_data(payload)
    parser = ACARSParser()
    msg = parser.parse(payload)
    assert msg["plane_reg"].endswith("N12345")
    assert msg["label"] == "H1"
    assert msg["message"] == "POSITION REPORT 51N 004W"


def test_aero_parser_module(tmp_path, rng):
    payload = mk_acars_payload("G-ABCD", "Q0", "HELLO AERO")
    sus = payload_to_sus(payload, rng)
    frm = tmp_path / "a.frm"
    frm.write_bytes(b"".join(sus))
    mod = AeroParserModule(str(frm), str(tmp_path / "msg" / "x"),
                           {"start_timestamp": 86400 * 1000})
    mod.process()
    assert mod.stats["acars"] == 1
    files = sorted((tmp_path / "msg" / "ACARS").glob("*.json"))
    assert len(files) == 1
    msg = json.loads(files[0].read_text())
    assert msg["message"] == "HELLO AERO"
    assert msg["signal_unit"]["aes_id"] == 0x123456
