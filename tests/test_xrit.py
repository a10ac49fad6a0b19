"""xRIT transport (demux + file assembly), Rice codec, and the GOES LRIT
data decoder (ref plugins/xrit_support/xrit/transport/xrit_demux.cpp,
plugins/goes_support/goes/hrit/module_goes_lrit_data_decoder*.cpp)."""

import numpy as np
import pytest

from satdump_tpu.ccsds.mux import make_cadus_for_vcid
from satdump_tpu.xrit import (AnnotationRecord, ImageStructureRecord,
                              NOAALRITHeader, PrimaryHeader,
                              SegmentIdentificationHeader, TimeStampRecord,
                              XRITDemux, build_xrit_file, packetize_xrit_file)
from satdump_tpu.xrit.rice import rice_decode, rice_encode


# ------------------------------------------------------------------- rice --
@pytest.mark.parametrize("kind", ["smooth", "space", "random", "const"])
def test_rice_roundtrip(kind, rng):
    if kind == "smooth":
        line = np.clip(128 + np.cumsum(rng.normal(0, 3, 5424)),
                       0, 255).astype(np.uint8)
    elif kind == "space":
        line = np.zeros(2000, np.uint8)
        line[500:1500] = np.clip(180 + rng.normal(0, 5, 1000),
                                 0, 255).astype(np.uint8)
    elif kind == "random":
        line = rng.integers(0, 256, 777).astype(np.uint8)
    else:
        line = np.full(512, 77, np.uint8)
    dec = rice_decode(rice_encode(line), len(line))
    np.testing.assert_array_equal(dec, line)


def test_rice_corrupt_returns_none():
    # uncompressed-block ID with a truncated stream must fail cleanly
    assert rice_decode(b"\xff", 100) is None


def test_rice_16bit(rng):
    line = np.clip(512 + np.cumsum(rng.normal(0, 8, 600)),
                   0, 1023).astype(np.uint16)
    dec = rice_decode(rice_encode(line, bits_per_pixel=10), len(line),
                      bits_per_pixel=10)
    np.testing.assert_array_equal(dec, line)


# ------------------------------------------------------------- transport --
def _image_file(name, img, extra_records=(), vcid_apid=None):
    records = [ImageStructureRecord(bit_per_pixel=8,
                                    columns_count=img.shape[1],
                                    lines_count=img.shape[0],
                                    compression_flag=0)]
    records += list(extra_records)
    return build_xrit_file(name, img.tobytes(), records)


def test_xrit_demux_file_bit_exact(rng):
    """Files -> packets -> CADUs -> demux -> files, byte-exact."""
    imgs = [rng.integers(0, 256, (40, 100)).astype(np.uint8)
            for _ in range(3)]
    raws, pkts = [], []
    for i, img in enumerate(imgs):
        raw = _image_file(f"img_{i}.lrit", img)
        raws.append(raw)
        pkts += packetize_xrit_file(raw, apid=100 + i, seq_start=i * 50)
    cadus = make_cadus_for_vcid(pkts, vcid=5)
    demux = XRITDemux()
    files = []
    for c in cadus:
        files += demux.work(c)
    assert len(files) == 3
    by_name = {f.filename: f for f in files}
    for i, img in enumerate(imgs):
        f = by_name[f"img_{i}.lrit"]
        assert bytes(f.lrit_data) == raws[i]
        isr = f.get_header(ImageStructureRecord)
        assert (isr.columns_count, isr.lines_count) == (100, 40)
        np.testing.assert_array_equal(
            np.frombuffer(f.data, np.uint8).reshape(40, 100), img)


def test_xrit_demux_corrupt_crc(rng):
    # non-image file: a bad continuation CRC aborts the file entirely
    raw = build_xrit_file("t.txt", rng.integers(0, 256, 4000).astype(
        np.uint8).tobytes(), [], file_type_code=2)
    pkts = packetize_xrit_file(raw, apid=50)
    assert len(pkts) > 2
    pkts[1].payload[-1] ^= 0xFF
    demux = XRITDemux()
    files = []
    for c in make_cadus_for_vcid(pkts, vcid=5):
        files += demux.work(c)
    assert files == []

    # image file: a bad CRC mid-file is recoverable (ref xrit_demux.cpp:60),
    # the payload is still appended and the file completes
    img = rng.integers(0, 256, (40, 100)).astype(np.uint8)
    raw2 = _image_file("x.lrit", img)
    pkts2 = packetize_xrit_file(raw2, apid=51)
    pkts2[1].payload[-1] ^= 0xFF
    demux2 = XRITDemux()
    files2 = []
    for c in make_cadus_for_vcid(pkts2, vcid=5):
        files2 += demux2.work(c)
    assert len(files2) == 1 and bytes(files2[0].lrit_data) == raw2


def test_xrit_filler_vcid_and_apid(rng):
    """VCID 63 CADUs and APID 2047 packets are ignored."""
    demux = XRITDemux()
    filler = np.zeros(1024, np.uint8)
    filler[0:4] = [0x1A, 0xCF, 0xFC, 0x1D]
    filler[4] = 1 << 6
    filler[5] = 63
    assert demux.work(filler) == []


# ------------------------------------------------------------ GOES module --
def _goes_segmented_stream(rng, nseg=4, width=200, seg_lines=25,
                           compressed=False):
    """Synthesize an ABI image split into Rice-or-raw segments."""
    full = np.clip(120 + np.cumsum(rng.normal(0, 2, (nseg * seg_lines, width)),
                                   axis=1), 0, 255).astype(np.uint8)
    pkts = []
    for s in range(nseg):
        seg_img = full[s * seg_lines: (s + 1) * seg_lines]
        records = [
            ImageStructureRecord(bit_per_pixel=8, columns_count=width,
                                 lines_count=seg_lines,
                                 compression_flag=1 if compressed else 0),
            SegmentIdentificationHeader(image_identifier=7,
                                        segment_sequence_number=s,
                                        max_segment=nseg, max_column=width,
                                        max_row=nseg * seg_lines),
            NOAALRITHeader(product_id=16, product_subid=13,
                           noaa_specific_compression=1 if compressed else 0),
            TimeStampRecord(days=25000, milliseconds_of_day=43200),
        ]
        name = f"OR_ABI-L2-CMIPF-M6C13_G16_s2022{s}.lrit"
        if compressed:
            # header-only file body; data arrives as per-packet Rice lines
            raw_hdr = build_xrit_file(name, b"", records)
            pkts += _packetize_rice(raw_hdr, seg_img, apid=300 + s,
                                    seq_start=s * 1000)
        else:
            raw = build_xrit_file(name, seg_img.tobytes(), records)
            pkts += packetize_xrit_file(raw, apid=300 + s, seq_start=s * 1000)
    return full, pkts


def _packetize_rice(header_bytes, seg_img, apid, seq_start):
    """First packet carries the headers; each following packet is one
    Rice-compressed scanline (the GOES HRIT on-air format)."""
    from satdump_tpu.ccsds import CCSDSHeader, CCSDSPacket
    from satdump_tpu.xrit import compute_crc
    pkts = []
    tp = (0).to_bytes(2, "big") + (len(header_bytes) * 8).to_bytes(8, "big")
    c0 = tp + header_bytes
    pl = bytearray(c0 + compute_crc(c0).to_bytes(2, "big"))
    pkts.append(CCSDSPacket(header=CCSDSHeader(
        apid=apid, sequence_flag=1,
        packet_sequence_count=seq_start & 0x3FFF), payload=pl))
    for i, line in enumerate(seg_img):
        c = rice_encode(line)
        pl = bytearray(c + compute_crc(c).to_bytes(2, "big"))
        flag = 2 if i == len(seg_img) - 1 else 0
        pkts.append(CCSDSPacket(header=CCSDSHeader(
            apid=apid, sequence_flag=flag,
            packet_sequence_count=(seq_start + 1 + i) & 0x3FFF), payload=pl))
    return pkts


@pytest.mark.parametrize("compressed", [False, True])
def test_goes_lrit_decoder_assembles_abi(tmp_path, compressed, rng):
    from satdump_tpu.pipeline.module import module_registry, \
        register_all_modules
    register_all_modules()
    full, pkts = _goes_segmented_stream(rng, compressed=compressed)
    cadus = make_cadus_for_vcid(pkts, vcid=13)
    # .cadu files are 1024-byte frames: 896 header+data + 128 RS parity
    cadus = np.pad(cadus, ((0, 0), (0, 1024 - cadus.shape[1])))
    cadu_path = tmp_path / "t.cadu"
    cadus.astype(np.uint8).tofile(cadu_path)
    mod = module_registry.get("goes_lrit_data_decoder")(
        str(cadu_path), str(tmp_path / "out" / "x"), {})
    mod.process()
    assert mod.stats["images"] >= 1
    from satdump_tpu.image.io import load_img
    import glob
    pngs = glob.glob(str(tmp_path / "out" / "IMAGES" / "GOES-16_13_*.png"))
    assert pngs, "assembled ABI image missing"
    img = np.asarray(load_img(pngs[0])).squeeze()
    np.testing.assert_array_equal(img, full)
    # products contract: dataset.json + loadable ImageProduct
    import json, os
    ds = json.load(open(tmp_path / "out" / "dataset.json"))
    assert ds["products"]
    from satdump_tpu.products.product import load_product
    prod = load_product(os.path.join(tmp_path / "out", ds["products"][0], "product.json"))
    np.testing.assert_array_equal(
        np.asarray(prod.get_channel("13").image).squeeze(), full)


def test_goesrecv_publisher(tmp_path, rng):
    """CADU file -> publisher -> framed-TCP subscriber receives 892-byte
    payloads (module_goesrecv_publisher.cpp)."""
    import threading
    from satdump_tpu.io.net import FramedTCPClient
    from satdump_tpu.pipeline.modules.xrit_net import GOESRecvPublisherModule

    cadus = rng.integers(0, 256, (5, 1024), dtype=np.uint32).astype(np.uint8)
    p = tmp_path / "x.cadu"
    cadus.tofile(p)
    mod = GOESRecvPublisherModule(str(p), str(tmp_path / "o"),
                                  {"nanomsg_port": 0, "client_wait": 5.0})
    got = []
    th = threading.Thread(target=mod.process)
    th.start()
    import time
    for _ in range(100):
        if mod.port:
            try:
                cl = FramedTCPClient("127.0.0.1", mod.port)
                break
            except Exception:
                time.sleep(0.05)
        time.sleep(0.02)
    while len(got) < 5:
        f = cl.recv()
        if f is None:
            break
        got.append(np.frombuffer(f, np.uint8))
    th.join(timeout=5)
    assert mod.stats["frames"] == 5
    assert len(got) == 5
    for i in range(5):
        np.testing.assert_array_equal(got[i], cadus[i, 4: 4 + 892])


def test_s2udp_cadu_extractor_ts_input(tmp_path, rng):
    """TS packets carrying UDP datagrams with CADUs at offset 40 ->
    extractor recovers them (module_s2udp_xrit_cadu_extractor.cpp:69)."""
    from satdump_tpu.pipeline.modules.xrit_net import \
        S2UDPxRITCADUExtractorModule

    cadus = rng.integers(0, 256, (3, 1024), dtype=np.uint32).astype(np.uint8)
    cadus[:, :4] = [0x1A, 0xCF, 0xFC, 0x1D]
    pid = 0x3F5
    ts_pkts = []
    cc = 0
    for cadu in cadus:
        payload = bytes(40) + bytes(cadu)      # MPE+IP+UDP headers stub
        first = True
        for off in range(0, len(payload), 184):
            chunk = payload[off: off + 184]
            hdr = bytes([0x47,
                         (0x40 if first else 0) | (pid >> 8), pid & 0xFF,
                         0x10 | (cc & 0xF)])
            cc += 1
            first = False
            ts_pkts.append(hdr + chunk.ljust(184, b"\xff"))
    p = tmp_path / "x.ts"
    with open(p, "wb") as f:
        f.write(b"".join(ts_pkts))
    mod = S2UDPxRITCADUExtractorModule(
        str(p), str(tmp_path / "out"), {"pid": pid, "ts_input": True})
    mod.process()
    got = np.fromfile(mod.d_output_file, np.uint8).reshape(-1, 1024)
    assert mod.stats["cadus"] == 3
    np.testing.assert_array_equal(got, cadus)
