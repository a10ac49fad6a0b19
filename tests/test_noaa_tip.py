"""NOAA TIP/AIP instruments: HIRS element/channel shuffle, AMSU-A
re-framing, SEM counter demux, DSB deframer — all on synthetic frames
mirroring plugins/noaa_metop_support/noaa/ in reverse."""

import numpy as np

from satdump_tpu.models import noaa_tip as nt
from satdump_tpu.models.noaa_hrpt import (NOAADSBDecoderModule,
                                          NOAAInstrumentsDecoderModule)


def mk_hirs_tip(mf: int, elnum: int, w13: np.ndarray, encoder=100,
                days=200, ms=43_200_000) -> np.ndarray:
    """One TIP frame carrying one HIRS element (inverse of
    hirs_reader.cpp:26-66)."""
    frame = np.zeros(104, np.uint8)
    frame[0], frame[1] = 0xED, 0xE2
    frame[4] = (mf >> 8) & 1
    frame[5] = mf & 0xFF
    if mf == 0:
        frame[8] = days >> 1
        frame[9] = ((days & 1) << 7) | ((ms >> 24) & 7)
        frame[10] = (ms >> 16) & 0xFF
        frame[11] = (ms >> 8) & 0xFF
        frame[12] = ms & 0xFF
    d = np.zeros(36, np.uint8)
    d[0] = encoder
    d[2] = (elnum >> 1) & 0x1F
    # bits of d[3..35]: [elnum&1, sync, 260 word bits, valid flag, 0]
    bits = np.zeros(264, np.uint8)
    bits[0] = elnum & 1
    bits[1] = 1
    wbits = ((w13[:, None] >> np.arange(12, -1, -1)) & 1).astype(np.uint8)
    bits[2:262] = wbits.reshape(-1)
    bits[262] = 1                       # element-valid flag (d[35] bit 1)
    d[3:36] = np.packbits(bits)
    frame[nt.HIRS_POSITIONS] = d
    return frame


def test_hirs_reader_line(rng):
    img = rng.integers(0, 8192, (20, 56)).astype(np.uint16)
    reader = nt.HIRSReader(2024)
    for elnum in range(56):
        w13 = img[nt.HIRS_CHANNELS, 55 - elnum]
        reader.work(mk_hirs_tip(elnum, elnum, w13))
    assert reader.line == 1
    for ch in range(20):
        assert np.array_equal(reader.get_channel(ch)[0], img[ch])
    # timestamp from minor frame 0: 2024 epoch + day 199 + 12:00
    ts = reader.last_timestamp
    assert ts == nt.TIPTimeParser(2024).get(200, 43_200_000)
    assert reader.timestamps[0] == ts    # mf//64 == 0 for the closing frame?


def test_hirs_sign_decode():
    # encoder 30 (<57) triggers the sign-magnitude decode
    w13 = np.zeros(20, np.uint16)
    w13[0] = (1 << 12) | 100             # -> 100 + 4095
    w13[1] = 96                          # -> |4096 - 96|
    reader = nt.HIRSReader(2024)
    reader.work(mk_hirs_tip(10, 55, w13[nt.HIRS_CHANNELS], encoder=30))
    assert reader.line == 1
    assert reader.get_channel(0)[0, 0] == 100 + 4095
    assert reader.get_channel(1)[0, 0] == 4096 - 96


def mk_aip_frames(a1_stream: np.ndarray, a2_stream: np.ndarray):
    """AIP frames carrying the A1/A2 byte streams at offsets 8/34
    (amsu_reader.cpp:55-80)."""
    n = max(-(-len(a1_stream) // 26), -(-len(a2_stream) // 14))
    a1 = np.concatenate([a1_stream,
                         np.zeros(n * 26 - len(a1_stream), np.uint8)])
    a2 = np.concatenate([a2_stream,
                         np.zeros(n * 14 - len(a2_stream), np.uint8)])
    frames = []
    for i in range(n):
        f = np.zeros(104, np.uint8)
        f[8: 34] = a1[i * 26: (i + 1) * 26]
        f[34: 48] = a2[i * 14: (i + 1) * 14]
        frames.append(f)
    return frames


def _even_counts(rng, shape):
    return (rng.integers(0, 32768, shape).astype(np.uint16) & 0xFFFE)


def test_amsu_reader(rng):
    a1_counts = _even_counts(rng, (13, 30))
    a2_counts = _even_counts(rng, (2, 30))
    a1 = np.zeros(1240, np.uint8)
    a1[0:3] = 0xFF
    for j in range(13):
        idx = np.arange(0, 1020, 34) + 16 + 2 * j
        a1[idx] = a1_counts[j] >> 8
        a1[idx + 1] = a1_counts[j] & 0xFF
    a2 = np.zeros(312, np.uint8)
    a2[0:3] = 0xFF
    idx = np.arange(0, 240, 8)
    a2[idx + 12] = a2_counts[0] >> 8
    a2[idx + 13] = a2_counts[0] & 0xFF
    a2[idx + 14] = a2_counts[1] >> 8
    a2[idx + 15] = a2_counts[1] & 0xFF
    reader = nt.AMSUReader()
    reader.last_TIP_timestamp = 1000.0
    for f in mk_aip_frames(a1, a2):
        reader.work_noaa(f)
    assert reader.linesA1 == 1 and reader.linesA2 == 1
    for j in range(13):
        assert np.array_equal(reader.get_channel_a1(j)[0], a1_counts[j])
    for j in range(2):
        assert np.array_equal(reader.get_channel_a2(j)[0], a2_counts[j])
    assert reader.timestamps_a1[0] >= 1000.0


def test_sem_reader():
    reader = nt.SEMReader(2024)
    f = np.zeros(104, np.uint8)
    f[4], f[5] = 0, 3                   # mf = 3 -> channels 5, 6
    f[20], f[21] = 0xA0, 0x0B
    reader.work(f)
    assert reader.channels[5] == [0xA0 ^ 0xFF]
    assert reader.channels[6] == [0x0B ^ 0xFF]


def test_dsb_decoder_and_instruments(tmp_path, rng):
    img = rng.integers(0, 8192, (20, 56)).astype(np.uint16)
    tips = [mk_hirs_tip(elnum, elnum, img[nt.HIRS_CHANNELS, 55 - elnum])
            for elnum in range(56)]
    bits = np.unpackbits(np.concatenate(tips))
    bits = np.concatenate([rng.integers(0, 2, 93).astype(np.uint8), bits])
    soft = np.where(bits > 0, -100, 100).astype(np.int8)   # inverted
    p = tmp_path / "d.soft"
    soft.tofile(p)
    dec = NOAADSBDecoderModule(str(p), str(tmp_path / "out"), {})
    dec.process()
    assert dec.stats["frame_count"] == 56
    got = np.fromfile(dec.d_output_file, np.uint8).reshape(56, 104)
    assert np.array_equal(got, np.stack(tips))

    ins = NOAAInstrumentsDecoderModule(
        dec.d_output_file, str(tmp_path / "prod" / "x"),
        {"dsb_mode": True, "year_override": 2024})
    ins.process()
    assert ins.stats["hirs_lines"] == 1
    from satdump_tpu.products.product import load_product
    prod = load_product(str(tmp_path / "prod" / "HIRS"))
    assert np.array_equal(prod.images[0].image[0], img[0])


def test_extract_tip_from_hrpt_minor_frame(rng):
    from satdump_tpu.models.noaa_hrpt import FRAME_WORDS, extract_tip_frames
    tips = [mk_hirs_tip(i, i, rng.integers(0, 8192, 20).astype(np.uint16))
            for i in range(5)]
    words = np.zeros(FRAME_WORDS, np.uint16)
    words[6] = 1 << 7                    # frmnum = 1 (TIP)
    words[103: 103 + 520] = np.concatenate(tips).astype(np.uint16) << 2
    frmnum, got = extract_tip_frames(words)
    assert frmnum == 1 and len(got) == 5
    for g, t in zip(got, tips):
        assert np.array_equal(g, t)


def test_gac_pn_generator():
    import hashlib
    from satdump_tpu.models.noaa_hrpt import gac_pn_bytes, gac_pn_sequence
    pn = gac_pn_sequence()
    assert len(pn) == 1023 and int(pn.sum()) == 511      # complemented m-seq
    pb = gac_pn_bytes()
    # digest of the reference-table-derived byte expansion (verified once
    # against gac_pn.h + module_noaa_gac_decoder.cpp:55-62)
    assert hashlib.sha256(pb.tobytes()).hexdigest()[:16] == \
        "3ea5dc57108a05cc"


def test_gac_decoder_roundtrip(tmp_path, rng):
    from satdump_tpu.models.noaa_hrpt import (GAC_FRAME_BITS, GAC_ASM,
                                              NOAAGACDecoderModule,
                                              gac_pn_bytes)
    pn = gac_pn_bytes()
    frames = []
    for _ in range(4):
        frm = rng.integers(0, 256, 4159).astype(np.uint8)
        frm[0:4] = np.frombuffer(GAC_ASM.to_bytes(4, "big"), np.uint8)
        frm[4:8] = [0x1D, 0x83, 0xC9, 0x5A]    # rest of the 60-bit sync
        # bits 32..59 are sync (not PN'd); PN starts at bit 60
        frames.append(frm)
    tx_bits = np.concatenate(
        [np.unpackbits(f ^ pn)[:GAC_FRAME_BITS] for f in frames])
    tx_bits = np.concatenate([rng.integers(0, 2, 71).astype(np.uint8),
                              tx_bits])
    soft = np.where(tx_bits > 0, 90, -90).astype(np.int8)
    p = tmp_path / "g.soft"
    soft.tofile(p)
    mod = NOAAGACDecoderModule(str(p), str(tmp_path / "out"), {})
    mod.process()
    assert mod.stats["frame_count"] >= 3
    got = np.fromfile(mod.d_output_file, np.uint8).reshape(-1, 4159)
    # the 33270-bit frame leaves the last byte's 2 LSBs outside the frame
    assert np.array_equal(got[0][:-1], frames[0][:-1])
    assert (got[0][-1] & 0xFC) == (frames[0][-1] & 0xFC)


def test_gac_instruments(tmp_path, rng):
    img_line = rng.integers(0, 1024, (409, 5)).astype(np.uint16)
    words = np.zeros(3327, np.uint16)
    words[8] = 150 << 1                       # day of year
    words[9], words[10], words[11] = 0, 0, 0
    words[6] = 1                              # ch3a on
    words[1182: 1182 + 409 * 5] = img_line.reshape(-1)
    bits = ((words[:, None] >> np.arange(9, -1, -1)) & 1).astype(np.uint8)
    frame = np.packbits(bits.reshape(-1))[:4159]
    frame = np.concatenate([frame, np.zeros(4159 - len(frame), np.uint8)])
    p = tmp_path / "g.frm"
    np.concatenate([frame, frame]).tofile(p)
    mod = NOAAInstrumentsDecoderModule(
        str(p), str(tmp_path / "out" / "x"),
        {"gac_mode": True, "year_override": 2024})
    mod.process()
    assert mod.stats["avhrr_lines"] == 2
    from satdump_tpu.products.product import load_product
    prod = load_product(str(tmp_path / "out" / "AVHRR"))
    assert prod.images[0].image.shape == (2, 409)
    assert np.array_equal(prod.images[0].image[0] >> 6, img_line[:, 0])
