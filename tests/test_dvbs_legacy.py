"""DVB-S legacy chain (EN 300 421): deinterleaver, RS(204,188) over
GF(0x11D), energy dispersal, TS comb sync, and the dvbs_demod module
loopback with rate autodetection."""

import numpy as np
import pytest

from satdump_tpu.ops import dvbs
from satdump_tpu.ops.fec import convolutional as cc


def test_rs204_roundtrip(rng):
    rs = dvbs.DVBSReedSolomon()
    pkts = rng.integers(0, 256, (6, 188), dtype=np.uint8)
    cws = rs.encode(pkts)
    assert cws.shape == (6, 204)
    # up to t=8 byte errors per codeword corrected
    bad = cws.copy()
    for row in bad:
        pos = rng.choice(204, 8, replace=False)
        row[pos] ^= rng.integers(1, 256, 8).astype(np.uint8)
    dec, nerr = rs.decode(bad)
    assert (nerr == 8).all()
    assert np.array_equal(dec, pkts)


def test_interleaver_roundtrip(rng):
    tx = dvbs.ConvInterleaver()
    rx = dvbs.ConvDeinterleaver()
    data = rng.integers(0, 256, 204 * 40, dtype=np.uint8)
    out = rx.work(tx.work(data))
    delay = (dvbs.I_DEPTH - 1) * dvbs.M_CELL * dvbs.I_DEPTH
    assert np.array_equal(out[delay:], data[: len(data) - delay])


def test_energy_dispersal_involution(rng):
    grp = rng.integers(0, 256, (8, 188), dtype=np.uint8)
    grp[:, 0] = dvbs.SYNC
    grp[0, 0] = dvbs.SYNC_INV
    once = dvbs.energy_dispersal(grp)
    assert np.array_equal(dvbs.energy_dispersal(once), grp)
    assert (once[:, 0] == grp[:, 0]).all()   # sync bytes untouched


def test_find_ts_sync(rng):
    data = rng.integers(0, 256, 204 * 24, dtype=np.uint8)
    off = 777
    for k in range(20):
        data[off + k * 204] = dvbs.SYNC_INV if k % 8 == 0 else dvbs.SYNC
    assert dvbs.find_ts_sync(data) == off


def _dvbs_tx(ts_pkts: np.ndarray, rate: str, rng) -> np.ndarray:
    """TS -> DVB-S QPSK symbols (EN 300 421 TX: randomize -> RS ->
    interleave -> conv encode (punctured) -> Gray QPSK)."""
    from satdump_tpu.ops.fec.depuncture import puncture
    n_grp = len(ts_pkts) // 8
    rnd = []
    for g in range(n_grp):
        grp = ts_pkts[g * 8:(g + 1) * 8].copy()
        grp[0, 0] = dvbs.SYNC_INV
        rnd.append(dvbs.energy_dispersal(grp))   # involution = randomize
    rnd = np.concatenate(rnd).reshape(-1, 188)
    rs = dvbs.DVBSReedSolomon()
    cws = rs.encode(rnd)
    inter = dvbs.ConvInterleaver().work(cws.reshape(-1))
    bits = np.unpackbits(inter)
    enc = cc.conv_encode_batch(bits[None])[0]
    if rate != "1/2":
        enc = puncture(enc, rate)
    from satdump_tpu import sim
    enc = enc[: len(enc) // 2 * 2]
    return sim.bits_to_qpsk_symbols(enc)


@pytest.mark.slow
@pytest.mark.parametrize("rate", ["1/2", "3/4"])
def test_dvbs_demod_module(tmp_path, rng, rate):
    from satdump_tpu import sim
    from satdump_tpu.io import write_baseband
    from satdump_tpu.pipeline.modules.dvbs2.dvbs import DVBSDemodModule

    ts = rng.integers(0, 256, (64, 188), dtype=np.uint8)
    ts[:, 0] = dvbs.SYNC
    syms = _dvbs_tx(ts, rate, rng)
    bb = sim.qpsk_modulate(syms, sps=2.2, rrc_alpha=0.35)
    chan = sim.ChannelModel(snr_db=17.0, freq_offset=1e-4, phase=0.3, seed=6)
    path = tmp_path / "dvbs.cf32"
    write_baseband(path, "cf32", chan.apply(bb))

    mod = DVBSDemodModule(str(path), str(tmp_path / "o"), {
        "samplerate": 220_000, "symbolrate": 100_000,
        "conv_rate": "auto", "buffer_size": 1 << 17})
    mod.process()
    assert mod.stats["viterbi_rate"] == rate
    got = np.fromfile(mod.d_output_file, np.uint8)
    got = got[: len(got) // 188 * 188].reshape(-1, 188)
    assert len(got) >= 24, f"only {len(got)} TS packets"
    sent = {r.tobytes() for r in ts}
    ok = sum(g.tobytes() in sent for g in got)
    assert ok == len(got), f"{len(got) - ok} corrupted TS packets"
