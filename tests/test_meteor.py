"""METEOR MSU-MR LRPT tests: JPEG entropy codec round-trip + reader/module.

Golden model: a minimal baseline-JPEG *encoder* built directly from the
T.81 spec (canonical Huffman from the same BITS/HUFFVAL, forward DCT +
quantization) — segments we encode must decode back bit-exactly through
satdump_tpu.image.jpeg, and a synthetic CADU stream must come out of the
meteor_msumr_lrpt module as an image product.
"""

import numpy as np
import pytest

from satdump_tpu.image import jpeg


# --- tiny spec-side JPEG encoder (test fixture) -----------------------------

def _enc_codes(bits, vals):
    codes = {}
    code = 0
    i = 0
    for length in range(1, len(bits) + 1):
        for _ in range(bits[length - 1]):
            codes[vals[i]] = (length, code)
            i += 1
            code += 1
        code <<= 1
    return codes


DC_CODES = _enc_codes(jpeg.DC_BITS, jpeg.DC_VALS)
AC_CODES = _enc_codes(jpeg.AC_BITS, jpeg.AC_VALS)


class BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, value, length):
        for i in range(length - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self):
        pad = (-len(self.bits)) % 8
        arr = np.array(self.bits + [1] * pad, np.uint8)
        return np.packbits(arr).tobytes()


def _category(v):
    return 0 if v == 0 else int(np.floor(np.log2(abs(v)))) + 1


def _put_coeff(w, v, length):
    if length == 0:
        return
    if v < 0:
        v = v + (1 << length) - 1
    w.put(v, length)


def encode_blocks(coeffs_zz: np.ndarray) -> bytes:
    """(N, 64) zig-zag-order quantized coefficients -> entropy bitstream."""
    w = BitWriter()
    last_dc = 0
    for blk in coeffs_zz:
        diff = int(blk[0]) - last_dc
        last_dc = int(blk[0])
        cat = _category(diff)
        ln, code = DC_CODES[cat]
        w.put(code, ln)
        _put_coeff(w, diff, cat)
        # AC run-length
        nz = np.nonzero(blk[1:])[0]
        k = 1
        for idx in nz:
            pos = int(idx) + 1
            run = pos - k
            while run >= 16:
                ln, code = AC_CODES[0xF0]
                w.put(code, ln)
                run -= 16
            v = int(blk[pos])
            size = _category(v)
            ln, code = AC_CODES[(run << 4) | size]
            w.put(code, ln)
            _put_coeff(w, v, size)
            k = pos + 1
        if k < 64:
            ln, code = AC_CODES[0x00]   # EOB
            w.put(code, ln)
    return w.tobytes()


def quantize_forward(pixels: np.ndarray, qf: float) -> np.ndarray:
    """(N, 8, 8) uint8 -> (N, 64) zig-zag quantized coefficients."""
    C = jpeg._dct_basis()
    x = pixels.astype(np.float64) - 128.0
    dct = np.einsum("ik,nkl,jl->nij", C, x, C)
    q = jpeg.quantization_table(qf)
    nat = np.round(dct.reshape(-1, 64) / q).astype(np.int32)
    zz = np.zeros_like(nat)
    zz[:, jpeg.ZIGZAG] = nat
    return zz


# --- tests -------------------------------------------------------------------

def test_entropy_roundtrip(rng):
    coeffs = np.zeros((14, 64), np.int32)
    # sparse random coefficients incl. negative + long zero runs
    for i in range(14):
        coeffs[i, 0] = rng.integers(-200, 200)
        for pos in rng.choice(np.arange(1, 64), 6, replace=False):
            coeffs[i, pos] = int(rng.integers(-40, 40))
    data = encode_blocks(coeffs)
    dec, done = jpeg.decode_mcus(data, 14)
    assert done == 14
    np.testing.assert_array_equal(dec, coeffs)


def test_jpeg_pixel_roundtrip(rng):
    pixels = (rng.random((14, 8, 8)) * 255).astype(np.uint8)
    qf = 90.0
    zz = quantize_forward(pixels, qf)
    data = encode_blocks(zz)
    dec, done = jpeg.decode_mcus(data, 14)
    assert done == 14
    q = np.tile(jpeg.quantization_table(qf), (14, 1))
    out = jpeg.dequantize_idct(dec, q)
    # lossy codec: mean abs error bounded at high quality
    err = np.abs(out.astype(int) - pixels.astype(int)).mean()
    assert err < 8.0, err


def _make_segment_payload(pixels: np.ndarray, mcun: int, qf: float,
                          ts=(0, 0, 0)) -> bytes:
    zz = quantize_forward(pixels, qf)
    body = encode_blocks(zz)
    day, ms, us = ts
    hdr = bytes([day >> 8, day & 0xFF,
                 (ms >> 24) & 0xFF, (ms >> 16) & 0xFF, (ms >> 8) & 0xFF, ms & 0xFF,
                 us >> 8, us & 0xFF,
                 mcun, 0x00, 0x00, 0xFF, 0xF0, int(qf)])
    return hdr + body


def test_segment_decode(rng):
    pixels = (rng.random((14, 8, 8)) * 255).astype(np.uint8)
    from satdump_tpu.models.meteor import Segment
    seg = Segment(_make_segment_payload(pixels, 0, 90.0), False, True)
    assert seg.valid and not seg.partial and seg.n_blocks == 14


def test_msumr_module_end_to_end(tmp_path, rng):
    """Synthesize VCID-5 CADUs carrying one channel of segments through the
    real M-PDU layout, run meteor_msumr_lrpt, check the product image."""
    from satdump_tpu.ccsds import CCSDSHeader
    from satdump_tpu.models.meteor import MeteorMSUMRLRPTModule

    # 4 lines x 14 segments, APID 64 (channel 1), QF 90
    img_h, img_w = 4 * 8, 14 * 112
    truth = (np.linspace(0, 255, img_h * img_w).reshape(img_h, img_w)
             ).astype(np.uint8)
    packets = []
    seq = 0
    for line in range(4):
        for s in range(14):
            strip = truth[line * 8:(line + 1) * 8, s * 112:(s + 1) * 112]
            mcus = strip.reshape(8, 14, 8).transpose(1, 0, 2)  # (14,8,8)
            payload = _make_segment_payload(np.ascontiguousarray(mcus),
                                            (s * 14) % 256, 90.0)
            h = CCSDSHeader(apid=64, packet_sequence_count=seq,
                            packet_length=len(payload) - 1)
            packets.append(h.encode() + payload)
            seq += 1
        # telemetry + 2 skipped channels in the 43-loop: 43 - 14 = 29 seq slots
        seq += 29

    # pack packets into M-PDUs (882B data zone, 2B insert zone, fhp header)
    stream = b"".join(packets)
    cadus = []
    pos = 0
    pkt_starts = []
    off = 0
    for pkt in packets:
        pkt_starts.append(off)
        off += len(pkt)
    si = 0
    while pos < len(stream):
        zone = stream[pos: pos + 882]
        zone += b"\x00" * (882 - len(zone))
        # first header pointer: first packet start inside this zone
        fhp = 2047
        while si < len(pkt_starts) and pkt_starts[si] < pos:
            si += 1
        if si < len(pkt_starts) and pkt_starts[si] < pos + 882:
            fhp = pkt_starts[si] - pos
        cadu = bytearray(1024)
        cadu[0:4] = b"\x1a\xcf\xfc\x1d"
        cadu[4] = 0  # version/scid
        cadu[5] = 5  # vcid 5
        cadu[10:12] = b"\x00\x00"  # insert zone
        cadu[12] = (fhp >> 8) & 0b111
        cadu[13] = fhp & 0xFF
        cadu[14:14 + 882] = zone
        cadus.append(bytes(cadu))
        pos += 882

    cadu_file = tmp_path / "test.cadu"
    cadu_file.write_bytes(b"".join(cadus))

    mod = MeteorMSUMRLRPTModule(str(cadu_file), str(tmp_path / "out"),
                                {"m2x_mode": True, "satellite": "METEOR-M2-4"})
    mod.process()
    assert mod.stats["channels"] == 1
    assert mod.stats["lines"] == img_h

    from satdump_tpu.products.product import load_product
    p = load_product(str(tmp_path / "MSU-MR" / "product.json"))
    ch = p.get_channel("1")
    got = (ch.image >> 8).astype(np.uint8)
    assert got.shape == (img_h, img_w)
    err = np.abs(got[:, :].astype(int) - truth.astype(int)).mean()
    assert err < 8.0, err
