"""GK-2A xRIT: DES, key-file decryption, encrypted-image end-to-end
(xrit/gk2a.py vs gk2a_support/ semantics)."""

import numpy as np
import pytest

from satdump_tpu.ccsds.mux import make_cadus_for_vcid
from satdump_tpu.utils.des import DES
from satdump_tpu.xrit import (ImageStructureRecord, build_xrit_file,
                              packetize_xrit_file)
from satdump_tpu.xrit.gk2a import (GK2ALRITDataDecoderModule, _crc16_ccitt,
                                   decrypt_key_file, load_key_file)


class _RawRecord:
    """Arbitrary header record for fixtures."""

    def __init__(self, rtype: int, body: bytes):
        self.rtype = rtype
        self.body = body

    def encode(self) -> bytes:
        ln = 3 + len(self.body)
        return bytes([self.rtype, ln >> 8, ln & 0xFF]) + self.body


def _key_header(key_index: int) -> _RawRecord:
    return _RawRecord(7, key_index.to_bytes(4, "big"))


def _seg_header(seq: int, total: int, line: int = 0) -> _RawRecord:
    return _RawRecord(128, bytes([seq, total, line >> 8, line & 0xFF]))


def test_des_fips_vector():
    d = DES(bytes.fromhex("133457799BBCDFF1"))
    assert d.encrypt_block(bytes.fromhex("0123456789ABCDEF")) == \
        bytes.fromhex("85E813540F0AB405")


def test_key_file_decrypt_roundtrip(rng):
    """Build an encrypted key file the way the ground segment would and
    recover the keys (key_decryptor.cpp)."""
    mac = "0123456789AB"
    kdes = DES((int(mac, 16) << 16).to_bytes(8, "big"))
    keys = {i + 1: bytes(rng.integers(0, 256, 8, dtype=np.uint32
                                      ).astype(np.uint8))
            for i in range(30)}
    body = b""
    for idx, key in keys.items():
        body += idx.to_bytes(2, "big") + kdes.encrypt_block(key) + bytes(8)
    raw = bytes(8) + body
    raw += _crc16_ccitt(raw).to_bytes(2, "big")
    got = decrypt_key_file(raw, mac)
    assert got == keys


def test_gk2a_encrypted_image_e2e(tmp_path, rng):
    """Encrypted uncompressed AMI segments -> module (with key file) ->
    assembled PNG; without keys the file lands in LRIT_ENCRYPTED."""
    img = rng.integers(0, 256, (64, 128)).astype(np.uint8)
    key = bytes(rng.integers(0, 256, 8, dtype=np.uint32).astype(np.uint8))
    kidx = 3
    des = DES(key)

    # decrypted xrit-rx-format key file: count + (index LE, key) records
    kf = tmp_path / "keys.bin"
    kf.write_bytes(bytes([0, 1]) + kidx.to_bytes(2, "little") + key)

    pkts = []
    for seg in range(2):
        part = img[seg * 32: (seg + 1) * 32]
        enc = b"".join(des.encrypt_block(bytes(part.tobytes()[i: i + 8]))
                       for i in range(0, part.size, 8))
        name = f"IMG_FD_xx_IR105_20260101_000000_{seg:03d}.lrit"
        raw = build_xrit_file(name, enc, [
            ImageStructureRecord(bit_per_pixel=8, columns_count=128,
                                 lines_count=32, compression_flag=0),
            _key_header(kidx), _seg_header(seg, 2)])
        pkts += packetize_xrit_file(raw, apid=220 + seg, seq_start=seg * 50)
    cadus = make_cadus_for_vcid(pkts, vcid=0)
    cadus = np.pad(cadus, ((0, 0), (0, 1024 - cadus.shape[1])))  # RS slot
    p = tmp_path / "x.cadu"
    cadus.astype(np.uint8).tofile(p)

    mod = GK2ALRITDataDecoderModule(str(p), str(tmp_path / "out" / "x"),
                                    {"gk2a_keys": str(kf)})
    mod.process()
    assert mod.stats["images"] == 1
    from satdump_tpu.image.io import load_img
    pngs = list((tmp_path / "out" / "IMAGES" / "AMI").glob("*.png"))
    assert len(pngs) == 1
    got = load_img(pngs[0])
    # DES padding may add tail bytes per segment; image region must match
    np.testing.assert_array_equal(got[:64, :128], img)

    # without keys: file preserved encrypted
    mod2 = GK2ALRITDataDecoderModule(str(p), str(tmp_path / "out2" / "x"), {})
    mod2.process()
    assert mod2.stats["images"] == 0
    assert list((tmp_path / "out2" / "LRIT_ENCRYPTED").glob("*"))


def test_gk2a_jpeg_segment(tmp_path, rng):
    """JPEG-compressed (flag 2) unencrypted segment decodes and assembles."""
    import io
    from PIL import Image
    img = np.full((32, 128), 180, np.uint8)
    img[8:16, 32:64] = 40
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95)
    name = "IMG_FD_xx_VI006_20260101_00000_000.lrit"
    raw = build_xrit_file(name, buf.getvalue(), [
        ImageStructureRecord(bit_per_pixel=8, columns_count=128,
                             lines_count=32, compression_flag=2),
        _seg_header(0, 1)])
    pkts = packetize_xrit_file(raw, apid=221)
    cadus = make_cadus_for_vcid(pkts, vcid=0)
    cadus = np.pad(cadus, ((0, 0), (0, 1024 - cadus.shape[1])))
    p = tmp_path / "x.cadu"
    cadus.astype(np.uint8).tofile(p)
    mod = GK2ALRITDataDecoderModule(str(p), str(tmp_path / "out" / "x"), {})
    mod.process()
    assert mod.stats["images"] == 1
    from satdump_tpu.image.io import load_img
    got = load_img(next((tmp_path / "out" / "IMAGES" / "AMI").glob("*.png")))
    assert abs(int(got[0, 0]) - 180) < 12 and abs(int(got[10, 40]) - 40) < 12


def _pad1024(cadus):
    return np.pad(cadus, ((0, 0), (0, 1024 - cadus.shape[1])))


def test_himawari_segments(tmp_path, rng):
    """HimawariCast: 10 16-bit BE segments assemble with auto bit-shift."""
    from satdump_tpu.xrit.geo import HimawariCastDataDecoderModule
    img = rng.integers(0, 1024, (10 * 11, 55)).astype(np.uint16)  # 10-bit
    pkts = []
    for seg in range(10):
        part = img[seg * 11: (seg + 1) * 11]
        name = f"IMG_DK01VIS_202601010000_{seg + 1:03d}"
        raw = build_xrit_file(name, part.astype(">u2").tobytes(), [
            ImageStructureRecord(bit_per_pixel=16, columns_count=55,
                                 lines_count=11, compression_flag=0)])
        pkts += packetize_xrit_file(raw, apid=230 + seg, seq_start=seg * 90)
    cadus = _pad1024(make_cadus_for_vcid(pkts, vcid=0))
    p = tmp_path / "h.cadu"
    cadus.astype(np.uint8).tofile(p)
    mod = HimawariCastDataDecoderModule(str(p), str(tmp_path / "out" / "x"),
                                        {})
    mod.process()
    assert mod.stats["images"] == 1
    from satdump_tpu.image.io import load_img
    got = load_img(next((tmp_path / "out" / "IMAGES" / "AHI").glob("*.png")))
    np.testing.assert_array_equal(got, img << 6)   # 10-bit -> <<6


def test_elektro_jpeg_segments(tmp_path):
    """ELEKTRO: MSG-style segment headers + JPEG payloads assemble."""
    import io
    from PIL import Image
    from satdump_tpu.xrit.geo import ElektroLRITDataDecoderModule
    img = np.full((20, 64), 120, np.uint8)
    img[5:10, 10:30] = 220
    pkts = []
    for seg in range(2):
        part = img[seg * 10: (seg + 1) * 10]
        buf = io.BytesIO()
        Image.fromarray(part).save(buf, "JPEG", quality=97)
        name = f"H-000-GOMS3_-GOMS3________-00_9_076E-00000{seg}___-202601010000-__"
        sid = bytes([128, 0, 16, 0, 3, 4,          # sc_id, channel_id 4
                     0, seg, 0, 0, 0, 1, 0])       # seq, start 0, end 1
        raw = build_xrit_file(name, buf.getvalue(), [
            ImageStructureRecord(bit_per_pixel=8, columns_count=64,
                                 lines_count=10, compression_flag=2),
            _RawRecord(128, sid[3:])])
        pkts += packetize_xrit_file(raw, apid=240 + seg, seq_start=seg * 90)
    cadus = _pad1024(make_cadus_for_vcid(pkts, vcid=0))
    p = tmp_path / "e.cadu"
    cadus.astype(np.uint8).tofile(p)
    mod = ElektroLRITDataDecoderModule(str(p), str(tmp_path / "out" / "x"),
                                       {})
    mod.process()
    assert mod.stats["images"] == 1
    from satdump_tpu.image.io import load_img
    got = load_img(next((tmp_path / "out" / "IMAGES" / "MSU-GS").glob("*")))
    assert got.shape == (20, 64)
    assert abs(int(got[7, 20]) - 220) < 10 and abs(int(got[0, 0]) - 120) < 10


def test_jpeg12_roundtrip(rng):
    """Native 12-bit JPEG decoder vs the NumPy fixture encoder (the
    reference vendors a 12-bit libjpeg for GK-2A/FY-4/EPIC payloads,
    src-core/image/jpeg12_utils.cpp; PIL refuses precision 12)."""
    from satdump_tpu.image.jpeg12 import compress_jpeg12, decompress_jpeg12
    y, x = np.mgrid[0:40, 0:56]
    img = ((np.sin(x / 9.0) * np.cos(y / 6.0) * 1200 + 2048)
           + rng.normal(0, 3, (40, 56))).clip(0, 4095).astype(np.uint16)
    data = compress_jpeg12(img, 12, quality_div=4)
    out = decompress_jpeg12(data)
    assert out is not None and out.dtype == np.uint16
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4 and err.max() < 40

    # PIL genuinely cannot read it -> the native path is load-bearing
    import io as _io
    import pytest as _pytest
    from PIL import Image
    with _pytest.raises(Exception):
        Image.open(_io.BytesIO(data)).load()


def test_gk2a_12bit_jpeg_segment(tmp_path, rng):
    """A GK-2A AMI segment carrying a 12-bit JPEG decodes into imagery."""
    from satdump_tpu.image.jpeg12 import compress_jpeg12
    from satdump_tpu.xrit.gk2a import GK2ALRITDataDecoderModule
    img = ((np.mgrid[0:20, 0:64][1] * 60) % 4095).astype(np.uint16)
    payload = compress_jpeg12(img, 12, quality_div=8)
    name = "IMG_FD_xx_VI006_20260101_00000_000.lrit"
    raw = build_xrit_file(name, payload, [
        ImageStructureRecord(bit_per_pixel=12, columns_count=64,
                             lines_count=20, compression_flag=2),
        _seg_header(0, 1)])
    pkts = packetize_xrit_file(raw, apid=221)
    cadus = _pad1024(make_cadus_for_vcid(pkts, vcid=0))
    p2 = tmp_path / "g.cadu"
    cadus.astype(np.uint8).tofile(p2)
    mod = GK2ALRITDataDecoderModule(str(p2), str(tmp_path / "out" / "x"), {})
    mod.process()
    assert mod.stats["images"] == 1
    from satdump_tpu.image.io import load_img
    got = load_img(next((tmp_path / "out" / "IMAGES" / "AMI").glob("*")))
    assert got.shape == (20, 64)
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 30
