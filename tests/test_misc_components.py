"""Small-component parity: CBOR product store, header autodetect, text
overlays, GFSK modulator, punctiform products."""

import numpy as np
import pytest

from satdump_tpu.utils import cbor


def test_cbor_roundtrip():
    obj = {"a": 1, "b": -42, "big": 2 ** 40, "f": 3.5, "s": "héllo",
           "arr": [1, 2.25, True, False, None, "x"],
           "nested": {"k": [0, {"deep": 7}]},
           "raw": b"\x00\x01\xff"}
    assert cbor.decode(cbor.encode(obj)) == obj


def test_cbor_interop_known_bytes():
    # RFC 8949 appendix examples
    assert cbor.encode(0) == b"\x00"
    assert cbor.encode(23) == b"\x17"
    assert cbor.encode(24) == b"\x18\x18"
    assert cbor.encode(-1) == b"\x20"
    assert cbor.encode("a") == b"\x61\x61"
    assert cbor.encode([1, 2, 3]) == b"\x83\x01\x02\x03"
    assert cbor.decode(b"\xf9\x3c\x00") == 1.0          # half float
    assert cbor.decode(b"\xfb\x40\x09\x21\xfb\x54\x44\x2d\x18") == \
        pytest.approx(3.141592653589793)


def test_product_cbor_store(tmp_path):
    from satdump_tpu.products.product import Product, load_product
    p = Product()
    p.instrument_name = "test_inst"
    p.set_product_timestamp(123.5)
    p.save(str(tmp_path), cbor=True)
    assert (tmp_path / "product.cbor").exists()
    q = load_product(str(tmp_path / "product.cbor"))
    assert q.instrument_name == "test_inst"
    assert q.get_product_timestamp() == 123.5
    # directory form picks the cbor file
    q2 = load_product(str(tmp_path))
    assert q2.instrument_name == "test_inst"


def test_punctiform_product(tmp_path):
    from satdump_tpu.products.product import load_product
    from satdump_tpu.products.punctiform_product import PunctiformProduct
    p = PunctiformProduct()
    p.instrument_name = "stdc"
    p.add_channel("msg_rate", [0.0, 1.0], [[48.0, 2.0, 0.0],
                                           [48.1, 2.1, 0.0]], [5.0, 7.0])
    p.save(str(tmp_path))
    q = load_product(str(tmp_path / "product.json"))
    assert isinstance(q, PunctiformProduct)
    i = q.get_channel_index("msg_rate")
    assert q.get_sample_position(i, 1) == [48.1, 2.1, 0.0]
    assert q.data[i].data == [5.0, 7.0]


def test_detect_header_wav_and_ziq(tmp_path, rng):
    import wave

    from satdump_tpu.io.detect import apply_header_params, try_parse_header
    from satdump_tpu.io.ziq import write_ziq
    wav_p = tmp_path / "x.wav"
    with wave.open(str(wav_p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(48000)
        w.writeframes(np.zeros(256, np.int16).tobytes())
    info = try_parse_header(str(wav_p))
    assert info.valid and info.samplerate == 48000 and info.fmt == "cs16"

    x = (rng.standard_normal(100) + 1j * rng.standard_normal(100)
         ).astype(np.complex64)
    ziq_p = tmp_path / "x.ziq"
    write_ziq(ziq_p, x, samplerate=250000, bits_per_sample=8)
    info = try_parse_header(str(ziq_p))
    assert info.valid and info.fmt == "ziq" and info.samplerate == 250000

    params = apply_header_params({}, str(wav_p))
    assert params["samplerate"] == 48000
    assert params["baseband_format"] == "cs16"
    # extension fallback
    (tmp_path / "y.cs8").write_bytes(b"\x00" * 16)
    assert try_parse_header(str(tmp_path / "y.cs8")).fmt == "cs8"


def test_text_overlay():
    from satdump_tpu.image.text import draw_text
    img = np.zeros((40, 120, 3), np.uint8)
    out = draw_text(img, "NOAA 19", (4, 4), (0, 255, 0))
    assert out.sum() > 0
    assert (out[:, :, 1] > 0).any() and not (out[:, :, 0] > 0).any()


def test_gfsk_modulate_demod(rng, tmp_path):
    """GFSK TX fixture demodulates back through the FSK chain."""
    from satdump_tpu.io import write_baseband
    from satdump_tpu.ops.txmod import gfsk_modulate
    from satdump_tpu.pipeline.modules.demod.fsk import FSKDemodModule
    bits = rng.integers(0, 2, 4000, dtype=np.uint8)
    x = gfsk_modulate(bits, sensitivity=1.0)          # 2 sps
    # upsample x4 to give the demod some sps room
    x8 = np.repeat(x, 4)
    bb = tmp_path / "g.cf32"
    write_baseband(bb, "cf32", x8)
    mod = FSKDemodModule(str(bb), str(tmp_path / "o"), {
        "samplerate": 8.0, "symbolrate": 1.0, "basic_shaping": True,
        "buffer_size": 1 << 13})
    mod.process()
    soft = np.fromfile(mod.d_output_file, np.int8)
    assert len(soft) > 3000
    s = np.sign(soft.astype(np.float32))
    tb = 2.0 * bits - 1.0
    c = np.correlate(s, tb, "full")
    k = int(np.argmax(np.abs(c)))
    assert abs(c[k]) / min(len(s), len(bits)) > 0.9


def test_ts_demux_and_mpe(rng):
    from satdump_tpu.utils.mpeg_ts import (TSDemux, mpe_extract_ip,
                                           parse_ts_headers)
    # build a 2-packet payload unit on PID 0x155 + noise PIDs
    payload = rng.integers(0, 256, 300, dtype=np.uint8)

    def ts_pkt(pid, pusi, cont, data):
        p = np.zeros(188, np.uint8)
        p[0] = 0x47
        p[1] = (pusi << 6) | (pid >> 8)
        p[2] = pid & 0xFF
        p[3] = 0x10 | (cont & 0xF)
        p[4: 4 + len(data)] = data
        return p

    pkts = [ts_pkt(0x155, 1, 0, payload[:184]),
            ts_pkt(0x300, 0, 0, rng.integers(0, 256, 184, dtype=np.uint8)),
            ts_pkt(0x155, 0, 1, payload[184:]),
            ts_pkt(0x155, 1, 2, payload[:184])]   # next unit flushes first
    ts = np.stack(pkts)
    hdr = parse_ts_headers(ts)
    assert list(hdr["pid"]) == [0x155, 0x300, 0x155, 0x155]
    d = TSDemux(pid=0x155)
    units = d.work(ts) + d.flush()
    assert len(units) == 2
    got = np.frombuffer(units[0], np.uint8)
    assert np.array_equal(got[:300], payload)

    # MPE section wrapping an IPv4/UDP datagram
    ip_payload = b"hello-geonetcast"
    ip_hdr = bytearray(20)
    ip_hdr[0] = 0x45
    total = 20 + len(ip_payload)
    ip_hdr[2:4] = total.to_bytes(2, "big")
    ip_hdr[9] = 17
    ip_hdr[12:16] = bytes([10, 0, 0, 1])
    ip_hdr[16:20] = bytes([239, 1, 2, 3])
    dgram = bytes(ip_hdr) + ip_payload
    sec_len = 9 + len(dgram) + 4
    sec = bytearray(12)
    sec[0] = 0x3E
    sec[1] = 0xB0 | (sec_len >> 8)
    sec[2] = sec_len & 0xFF
    section = bytes(sec) + dgram + b"\x00" * 4
    out = mpe_extract_ip(section)
    assert out is not None
    mpe, ip, pl = out
    assert ip.protocol == 17 and ip.target_ip == (239, 1, 2, 3)
    assert pl == ip_payload


def test_init_satdump_fires_started_event():
    from satdump_tpu.core.events import SatdumpStartedEvent, event_bus
    from satdump_tpu.core.init import init_satdump
    got = []
    event_bus.register_handler(SatdumpStartedEvent, lambda e: got.append(1))
    init_satdump()
    init_satdump()   # idempotent
    assert len(got) <= 1   # may be 0 if another test initialized first
    from satdump_tpu.pipeline.pipeline import pipeline_registry
    assert len(list(pipeline_registry.items())) >= 25


def test_webhook_sink(tmp_path):
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from satdump_tpu.core.events import (PipelineDoneProcessingEvent,
                                         event_bus)
    from satdump_tpu.core.webhook import WebhookSink
    got = []

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            got.append(_json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.handle_request)
    t.start()
    WebhookSink(f"http://127.0.0.1:{srv.server_address[1]}/hook",
                run_async=False)
    event_bus.fire_event(PipelineDoneProcessingEvent("noaa_apt", "/tmp/x"))
    t.join(timeout=5)
    srv.server_close()
    assert got and got[0]["pipeline"] == "noaa_apt"


def test_qoi_pnm_io(tmp_path, rng):
    from satdump_tpu.image.io import load_img, save_img
    rgb = rng.integers(0, 255, (24, 36, 3), dtype=np.uint8)
    for ext in ("qoi", "ppm"):
        save_img(rgb, tmp_path / f"x.{ext}")
        assert np.array_equal(load_img(tmp_path / f"x.{ext}"), rgb)
    g16 = rng.integers(0, 65535, (20, 30), dtype=np.uint16)
    save_img(g16, tmp_path / "g.pgm")
    assert np.array_equal(load_img(tmp_path / "g.pgm"), g16)


def test_soft2hard_roundtrip(tmp_path, rng):
    from satdump_tpu.pipeline.modules.convert import (Hard2SoftModule,
                                                      Soft2HardModule,
                                                      read_soft_symbols)
    soft = rng.integers(-100, 100, 8000).astype(np.int8)
    p = tmp_path / "x.soft"
    soft.tofile(p)
    m = Soft2HardModule(str(p), str(tmp_path / "o"), {})
    m.process()
    hard = np.fromfile(m.d_output_file, np.uint8)
    assert np.array_equal(np.unpackbits(hard), (soft > 0).astype(np.uint8))
    m2 = Hard2SoftModule(m.d_output_file, str(tmp_path / "o2"), {})
    m2.process()
    s2 = np.fromfile(m2.d_output_file, np.int8)
    assert np.array_equal(s2 > 0, soft > 0)
    assert np.array_equal(read_soft_symbols(str(p)), soft)


def test_doppler_correct_stage():
    import jax.numpy as jnp

    from satdump_tpu.ops import stages
    fs = 10000.0
    n = 4096
    dop = 137.0
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * dop * t).astype(np.complex64)
    st = stages.freq_shift_init()
    st, y = stages.doppler_correct(st, jnp.asarray(x),
                                   jnp.full(n, dop, np.float32), fs)
    y = np.asarray(y)
    # residual rotation ~ 0 after correction
    assert np.abs(np.angle(np.mean(y[10:] * np.conj(y[9:-1])))) < 1e-3


def test_sample_source_registry(tmp_path, rng):
    from satdump_tpu.io import write_baseband
    from satdump_tpu.io.sources import get_source, list_sources
    x = (rng.standard_normal(5000) + 1j * rng.standard_normal(5000)
         ).astype(np.complex64)
    p = tmp_path / "x.cf32"
    write_baseband(p, "cf32", x)
    src = get_source(str(p))
    assert src.source_type == "file"
    got = np.concatenate(list(src.blocks()))
    np.testing.assert_allclose(got, x, atol=1e-6)
    assert "remote" in list_sources()
    r = get_source("tcp://127.0.0.1:12345")
    assert r.source_type == "remote" and r.port == 12345


def test_vfo_channelizer(rng):
    from satdump_tpu.ops.vfo import VFOChannelizer
    fs = 1_000_000.0
    n = 1 << 16
    t = np.arange(2 * n) / fs
    # two tones at +200k and -150k
    x = (np.exp(2j * np.pi * 200e3 * t)
         + np.exp(2j * np.pi * -150e3 * t)).astype(np.complex64)
    ch = VFOChannelizer(fs, block_size=n)
    r1 = ch.add_vfo("a", 200e3, 125e3)
    r2 = ch.add_vfo("b", -150e3, 125e3)
    outs = [ch.work(x[:n]), ch.work(x[n:])]
    a = np.concatenate([o["a"] for o in outs])[200:]
    b = np.concatenate([o["b"] for o in outs])[200:]
    # each VFO sees its own tone at DC (slow rotation), the other rejected
    rot_a = np.abs(np.mean(a / np.maximum(np.abs(a), 1e-9)))
    rot_b = np.abs(np.mean(b / np.maximum(np.abs(b), 1e-9)))
    assert rot_a > 0.95 and rot_b > 0.95
    assert np.abs(a).mean() > 0.5 and np.abs(b).mean() > 0.5


def test_mqtt_publish_subscribe():
    """Round-trip through an in-process mini broker (utils/mqtt_client.h
    stats-sink role: CONNECT/SUBSCRIBE/PUBLISH at QoS 0)."""
    import socket
    import struct
    import threading

    from satdump_tpu.utils.mqtt import MQTTClient, _decode_len

    srv = socket.socket()
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(2)
    port = srv.getsockname()[1]
    subscribers = []

    def broker():
        conns = []
        for _ in range(2):
            c, _a = srv.accept()
            conns.append(c)
            h = c.recv(1)
            n = _decode_len(c)
            c.recv(n)                       # CONNECT body
            c.sendall(bytes([0x20, 2, 0, 0]))  # CONNACK
        # serve a few packets from each
        for _ in range(4):
            for c in conns:
                c.settimeout(0.2)
                try:
                    h = c.recv(1)
                except socket.timeout:
                    continue
                if not h:
                    continue
                n = _decode_len(c)
                body = c.recv(n) if n else b""
                typ = h[0] & 0xF0
                if typ == 0x80:             # SUBSCRIBE
                    pid = body[:2]
                    c.sendall(bytes([0x90, 3]) + pid + bytes([0]))
                    subscribers.append(c)
                elif typ == 0x30:           # PUBLISH -> relay
                    for s in subscribers:
                        s.sendall(h + bytes([n]) + body)

    t = threading.Thread(target=broker, daemon=True)
    t.start()
    sub = MQTTClient("127.0.0.1", port, client_id="sub")
    pub = MQTTClient("127.0.0.1", port, client_id="pub")
    sub.subscribe("satdump/stats")
    pub.publish("satdump/stats", b'{"snr": 12.5}')
    topic, payload = sub.recv_publish()
    assert topic == "satdump/stats"
    assert payload == b'{"snr": 12.5}'
    pub.disconnect()
    sub.disconnect()
    srv.close()


def test_ziq2_roundtrip(tmp_path, rng):
    from satdump_tpu.io.ziq import read_ziq2, write_ziq2, is_ziq2
    from satdump_tpu.io.baseband import BasebandReader, \
        detect_baseband_format
    from satdump_tpu.io.detect import try_parse_header
    x = (rng.normal(0, 0.3, 20000) + 1j * rng.normal(0, 0.3, 20000)) \
        .astype(np.complex64)
    p = tmp_path / "t.ziq2"
    write_ziq2(p, x, samplerate=250_000, bits_per_sample=16,
               pkt_samples=4096)
    assert is_ziq2(p)
    assert detect_baseband_format(p) == "ziq2"
    info = try_parse_header(str(p))
    assert info.valid and info.samplerate == 250_000 and info.fmt == "ziq2"
    y, rate = read_ziq2(p)
    assert rate == 250_000 and len(y) == len(x)
    assert np.max(np.abs(y - x)) < 2e-4        # 16-bit quantization
    rd = BasebandReader(p, "ziq2")
    assert rd.samplerate == 250_000
    blks = list(rd.blocks())
    got = np.concatenate([b.samples[:b.valid] for b in blks])
    assert len(got) == len(x)
