"""Unit-notation parser/formatter (utils/unit_parser.cpp,
format_notated.cpp) and Fazzt file-broadcast reassembly
(mpeg_ts/fazzt_processor.cpp)."""

import numpy as np

from satdump_tpu.utils.units import (format_notated, parse_frequency,
                                     parse_unit, UNIT_METER)
from satdump_tpu.utils.mpeg_ts import FazztProcessor


def test_parse_frequency():
    assert parse_frequency("1701.3 MHz") == 1701.3e6
    assert parse_frequency("1.7G") == 1.7e9
    assert parse_frequency("137912500") == 137912500.0
    assert parse_frequency("401k") == 401e3
    assert parse_frequency("8kHz") == 8000.0
    assert parse_frequency("12 Hz") == 12.0
    assert parse_frequency("qpsk") is None
    assert parse_frequency("fy3d") is None


def test_parse_unit_longest_first():
    # "kHz" must not be eaten by the "Hz" rule ("k" left -> stod fails)
    assert parse_frequency("2.4kHz") == 2400.0
    assert parse_unit("3km", UNIT_METER) == 3000.0
    assert parse_unit("5mm", UNIT_METER) == 0.005


def test_format_notated():
    assert format_notated(1.7e9, "Hz") == "1.7 GHz"
    assert format_notated(6e6, "sps") == "6 Msps"
    assert format_notated(512.0, "Hz") == "512 Hz"
    assert format_notated(0.25, "s") == "250 ms"
    # no-units variant switches a decade later
    assert format_notated(9.0e6) == "9000k"


def _head(fid, name, parts, size, payload=512):
    f = bytearray(1431)
    f[1] = 0x03
    f[2:4] = (90).to_bytes(2, "little")
    f[4:8] = fid.to_bytes(4, "little")
    f[72:74] = parts.to_bytes(2, "little")
    nm = name.encode()
    f[84: 84 + len(nm)] = nm
    at = 84 + len(nm) + 56
    f[at: at + 4] = size.to_bytes(4, "little")
    return bytes(f)


def _body(fid, part, data):
    f = bytearray(16 + len(data))
    f[1] = 0x01
    f[2:4] = (16).to_bytes(2, "little")
    f[4:8] = fid.to_bytes(4, "little")
    f[8:10] = part.to_bytes(2, "little")
    f[16:] = data
    return bytes(f)


def _tail(fid):
    f = bytearray(16)
    f[1] = 0xFF
    f[2:4] = (8).to_bytes(2, "little")
    f[4:8] = fid.to_bytes(4, "little")
    return bytes(f)


def test_fazzt_reassembly(rng):
    P = 64
    proc = FazztProcessor(payload_size=P)
    payload = bytes(rng.integers(0, 256, 3 * P - 17, dtype=np.uint8))
    assert proc.work(_head(7, "test1.bin", 3, len(payload))) == []
    for part in (2, 0, 1):   # out of order
        chunk = payload[part * P: (part + 1) * P]
        assert proc.work(_body(7, part, chunk)) == []
    out = proc.work(_tail(7))
    assert len(out) == 1
    assert out[0].name == "test1.bin"
    assert bytes(out[0].data) == payload


def test_fazzt_ignores_unknown_and_short():
    proc = FazztProcessor(payload_size=64)
    assert proc.work(b"\x00\x01") == []                 # too short
    assert proc.work(_body(9, 0, b"x" * 64)) == []      # body w/o head
    assert proc.work(_tail(9)) == []                    # tail w/o head
    # head with tiny filename is rejected (ref: filename.size() > 4)
    assert proc.work(_head(9, "a.b", 1, 10)) == []
    assert proc.work(_tail(9)) == []


def test_fazzt_stale_pruning():
    t = [0.0]
    proc = FazztProcessor(payload_size=16, max_time=10.0,
                          clock=lambda: t[0])
    proc.work(_head(1, "stale.bin", 1, 8))
    t[0] = 100.0
    for _ in range(1000):   # trigger the periodic prune
        proc.work(_body(2, 0, b""))
    assert proc.work(_tail(1)) == []
