"""Sharded (multi-chip) demod+FEC tests on the 8-device virtual CPU mesh —
the CI stand-in for a pod slice (SURVEY.md §4 implication (4))."""

import jax
import numpy as np
import pytest

from satdump_tpu import sim
from satdump_tpu.parallel import build_sharded_qpsk_step, make_mesh, shard_input


@pytest.mark.slow
def test_sharded_qpsk_demod_to_cadu(rng):
    """2 channels × 4 time-shards: modulated CADU stream in, per-shard softs
    out; stitched soft stream must decode back to the original CADUs (frame
    loss allowed only at shard seams)."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8, n_ch=2)
    nt = mesh.shape["t"]
    sps, block = 2.2, 1 << 16

    n_total = nt * block
    streams, truths = [], []
    for ch in range(2):
        cadus = sim.make_cadus(30, rng)
        chan_bits = sim.encode_cadu_stream(cadus)
        syms = sim.bits_to_qpsk_symbols(chan_bits)
        tx = sim.qpsk_modulate(syms, sps=sps)
        chan = sim.ChannelModel(snr_db=20.0, freq_offset=2e-4, phase=0.3 * ch,
                                seed=10 + ch)
        bb = chan.apply(tx)
        bb = np.tile(bb, int(np.ceil(n_total / len(bb))))[:n_total]
        streams.append(bb)
        truths.append(cadus)
    x = np.stack(streams)  # (2, nt*block)

    step = build_sharded_qpsk_step(mesh, sps=sps, block=block)
    soft, valid, bits = step(shard_input(x, mesh))
    soft = np.asarray(soft)    # (nt, 2, cap*2)
    valid = np.asarray(valid)  # (nt, 2, cap)

    from satdump_tpu.pipeline.modules.ccsds.viterbi_sync import Viterbi12Sync
    from satdump_tpu.ops.fec.deframer import CCSDSDeframer
    from satdump_tpu.ops.fec.randomization import derand_ccsds
    from satdump_tpu.ops.fec.reed_solomon import ReedSolomon
    from satdump_tpu.ops.fec.rotation import PHASE_0, PHASE_90

    rs = ReedSolomon(k=223)
    for ch in range(2):
        # stitch shard-ordered valid softs back into one stream
        pieces = []
        for t in range(nt):
            v = valid[t, ch]
            s = soft[t, ch].reshape(-1, 2)[v]
            pieces.append(s.reshape(-1))
        stream = np.concatenate(pieces).astype(np.int8)

        vit = Viterbi12Sync(0.3, 10, [PHASE_0, PHASE_90])
        defra = CCSDSDeframer(8192, 0x1ACFFC1D)
        got = []
        bs = vit.work(stream)
        for cadu in defra.work(bs):
            cadu = np.array(cadu, np.uint8)
            cadu[4:] = derand_ccsds(cadu[4:])
            corrected, errs = rs.decode_interleaved(cadu[4:4 + 1020], True, 4)
            if (errs >= 0).all():
                cadu[4:4 + 1020] = corrected
                got.append(cadu)
        got = np.array(got)
        # ~14.5 frames fit in the stream (4 shards × ~59.6k softs / 16384)
        assert len(got) >= 13, f"ch{ch}: only {len(got)} CADUs"
        matched = sum(bool((truths[ch] == g).all(axis=1).any()) for g in got)
        assert matched >= len(got) - nt, f"ch{ch}: {len(got)-matched} corrupt"


def test_mesh_construction():
    mesh = make_mesh(8)
    assert mesh.shape["ch"] * mesh.shape["t"] == 8
    mesh1 = make_mesh(1)
    assert mesh1.shape["ch"] == 1 and mesh1.shape["t"] == 1
