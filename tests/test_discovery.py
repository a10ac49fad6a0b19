"""UDP discovery loopback: server replies to a matching request."""

from satdump_tpu.io.discovery import (UDPDiscoveryConfig, UDPDiscoveryServer,
                                      discover_udp_servers)


def test_udp_discovery_loopback():
    cfg = UDPDiscoveryConfig(req_port=48651, rep_port=48652,
                             req_pkt=b"SATDUMP_REMOTE?",
                             rep_pkt=b"SATDUMP_REMOTE!",
                             discover_port=5656)
    with UDPDiscoveryServer(cfg):
        found = discover_udp_servers(cfg, wait_ms=800, address="127.0.0.1")
    assert ("127.0.0.1", 5656) in found


def test_udp_discovery_ignores_wrong_packet():
    cfg = UDPDiscoveryConfig(req_port=48653, rep_port=48654,
                             req_pkt=b"GOOD", rep_pkt=b"OK",
                             discover_port=9)
    bad = UDPDiscoveryConfig(req_port=48653, rep_port=48654,
                             req_pkt=b"EVIL", rep_pkt=b"OK", discover_port=9)
    with UDPDiscoveryServer(cfg):
        found = discover_udp_servers(bad, wait_ms=400, address="127.0.0.1")
    assert found == []
