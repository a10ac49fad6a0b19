"""Live layer: remote-IQ protocol codec + framed TCP transport, network
frame server/client modules, the live pipeline runner fed over TCP by a
second thread (the two-process shape of VERDICT r1 #8), and the HTTP
status endpoint."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from satdump_tpu import sim
from satdump_tpu.io.net import (FramedTCPClient, FramedTCPServer,
                                RemoteIQClient, RemoteIQServer,
                                decode_iq_pkt, encode_iq_pkt)


def test_iq_pkt_roundtrip(rng):
    x = ((rng.standard_normal(1000) + 1j * rng.standard_normal(1000)) * 0.3
         ).astype(np.complex64)
    for depth, tol in [(8, 3e-2), (16, 1e-4), (32, 0.0)]:
        y = decode_iq_pkt(encode_iq_pkt(x, depth))
        assert y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=tol)


def test_framed_tcp_roundtrip():
    srv = FramedTCPServer(0)
    got = []

    def client_thread():
        c = FramedTCPClient("127.0.0.1", srv.port)
        got.append(c.recv())
        c.send(b"pong")
        c.close()

    t = threading.Thread(target=client_thread)
    t.start()
    srv.wait_client(timeout=5)
    srv.send(b"ping")
    assert srv.recv() == b"pong"
    t.join(timeout=5)
    assert got == [b"ping"]
    srv.close()


def test_network_server_client_modules(tmp_path, rng):
    """frames file -> network_server(TCP) -> network_client -> identical."""
    from satdump_tpu.pipeline.modules.network import (NetworkClientModule,
                                                      NetworkServerModule)
    frames = rng.integers(0, 256, 1024 * 20, dtype=np.uint8)
    in_path = tmp_path / "in.cadu"
    frames.tofile(in_path)

    import socket
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    srv = NetworkServerModule(str(in_path), str(tmp_path / "srv"),
                              {"server_port": port, "pkt_size": 1024})
    cli = NetworkClientModule("", str(tmp_path / "cli"),
                              {"client_port": port, "pkt_size": 1024,
                               "max_packets": 20})
    t = threading.Thread(target=srv.process)
    t.start()
    cli.process()
    t.join(timeout=10)
    got = np.fromfile(cli.d_output_file, np.uint8)
    assert np.array_equal(got, frames)
    assert srv.stats["packets_sent"] == 20
    assert cli.stats["packets_received"] == 20


@pytest.mark.slow
def test_live_pipeline_over_tcp(tmp_path, rng):
    """Two-actor live decode: one thread serves an impaired QPSK baseband
    over the remote-IQ protocol; the live pipeline decodes CADUs as blocks
    arrive and exposes stats over HTTP (ref live_pipeline.cpp +
    webserver.cpp /status)."""
    from satdump_tpu.core.http_status import StatusServer
    from satdump_tpu.pipeline.live import LivePipeline
    from satdump_tpu.pipeline.pipeline import Pipeline, PipelineStep

    samplerate, symbolrate = 220_000.0, 100_000.0
    cadus = sim.make_cadus(24, rng)
    chan_bits = sim.encode_cadu_stream(cadus)
    syms = sim.bits_to_qpsk_symbols(chan_bits)
    tx = sim.qpsk_modulate(syms, sps=samplerate / symbolrate)
    chan = sim.ChannelModel(snr_db=15.0, freq_offset=2e-4, phase=0.5, seed=4)
    bb = chan.apply(tx)

    iq_srv = RemoteIQServer(port=0, bit_depth=16)

    def serve():
        iq_srv.wait_client(timeout=10)
        for off in range(0, len(bb), 65536):
            iq_srv.send_samples(bb[off: off + 65536])
        iq_srv.end()

    t = threading.Thread(target=serve)
    t.start()

    pipe = Pipeline(
        id="live_t", name="Live test",
        steps=[
            PipelineStep("baseband", ""),
            PipelineStep("soft", "psk_demod", {
                "constellation": "qpsk", "symbolrate": symbolrate,
                "rrc_alpha": 0.5, "pll_bw": 0.005,
            }),
            PipelineStep("cadu", "metop_ahrpt_decoder", {}),
        ],
        parameters={})
    lp = LivePipeline(pipe, str(tmp_path),
                      user_params={"samplerate": samplerate,
                                   "buffer_size": 1 << 17})
    status = StatusServer(lambda: lp.stats, port=0)
    status.start()

    client = RemoteIQClient("127.0.0.1", iq_srv.port)
    lp.start()
    polled = None
    for i, blk in enumerate(client.blocks()):
        lp.push(blk)
        if i == 3:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{status.port}/status", timeout=5) as r:
                polled = json.loads(r.read())
    outs = lp.stop()
    client.close()
    t.join(timeout=10)
    status.stop()
    iq_srv.close()

    cadu_files = [o for o in outs if o.endswith(".cadu")]
    assert cadu_files
    got = np.fromfile(cadu_files[0], np.uint8)
    got = got[: len(got) // 1024 * 1024].reshape(-1, 1024)
    matched = sum(bool((cadus == g).all(axis=1).any()) for g in got)
    assert matched >= 18, f"live decode only {matched} CADUs"
    assert matched == len(got)
    assert polled is not None and "modules" in polled
    assert polled["samples"] > 0
