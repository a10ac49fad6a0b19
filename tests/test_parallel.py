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


@pytest.mark.slow
def test_multichip_demod_through_offline_runner(tmp_path, rng):
    """VERDICT r1 #10: the offline pipeline runner exercises the SAME
    sharded code path as dryrun_multichip — psk_demod with multichip=true
    on the 8-device CPU mesh, then the standard decoder, bit-exact CADUs."""
    from satdump_tpu.io import write_baseband
    from satdump_tpu.pipeline.pipeline import Pipeline, PipelineStep
    from satdump_tpu.pipeline.runner import run_pipeline

    assert len(jax.devices()) >= 8
    samplerate, symbolrate = 200_000.0, 100_000.0  # sps = 2.0 (no resample)
    cadus = sim.make_cadus(40, rng)
    chan_bits = sim.encode_cadu_stream(cadus)
    syms = sim.bits_to_qpsk_symbols(chan_bits)
    tx = sim.qpsk_modulate(syms, sps=2.0)
    chan = sim.ChannelModel(snr_db=18.0, freq_offset=1e-4, phase=0.4, seed=9)
    bb = chan.apply(tx)
    bb_path = tmp_path / "mc.cf32"
    write_baseband(bb_path, "cf32", bb)

    pipe = Pipeline(
        id="mc_t", name="Multichip test",
        steps=[
            PipelineStep("baseband", ""),
            PipelineStep("soft", "psk_demod", {
                "constellation": "qpsk", "symbolrate": symbolrate,
                "rrc_alpha": 0.5, "pll_bw": 0.005,
                "fast": True, "multichip": True,
            }),
            PipelineStep("cadu", "metop_ahrpt_decoder", {}),
        ],
        parameters={})
    out = run_pipeline(pipe, str(bb_path), str(tmp_path / "out"),
                       user_params={"samplerate": samplerate,
                                    "buffer_size": 1 << 15})
    got = np.fromfile(out, dtype=np.uint8)
    got = got[: len(got) // 1024 * 1024].reshape(-1, 1024)
    matched = sum(bool((cadus == g).all(axis=1).any()) for g in got)
    assert matched >= 30, f"multichip runner decoded only {matched} CADUs"
    assert matched == len(got)


@pytest.mark.slow
@pytest.mark.parametrize("lead", [0, 1237, 5120, 12287])
def test_multichip_zero_frame_loss_at_seams(tmp_path, rng, lead):
    """VERDICT r4 weak #2: NO frame may be lost at any shard-seam position.
    The stream is shifted by `lead` noise samples so frame boundaries land
    at different offsets relative to the t-shard seams; every single frame
    must still decode bit-exact (seam symbol ownership is single-sourced
    via the successor-first ppermute in timeshard.py, and the tail margin
    keeps the final symbols interpolatable)."""
    from satdump_tpu.io import write_baseband
    from satdump_tpu.pipeline.pipeline import Pipeline, PipelineStep
    from satdump_tpu.pipeline.runner import run_pipeline

    assert len(jax.devices()) >= 8
    cadus = sim.make_cadus(12, rng)
    syms = sim.bits_to_qpsk_symbols(sim.encode_cadu_stream(cadus))
    tx = sim.qpsk_modulate(syms, sps=2.0)
    bb = sim.ChannelModel(snr_db=20.0, freq_offset=1e-4, phase=0.4,
                          seed=5).apply(tx)
    if lead:
        noise = (0.05 * (rng.standard_normal(lead)
                         + 1j * rng.standard_normal(lead))
                 ).astype(np.complex64)
        bb = np.concatenate([noise, bb])
    bb_path = tmp_path / "mc.cf32"
    write_baseband(bb_path, "cf32", bb)
    pipe = Pipeline(
        id="mc_seam", name="seam test",
        steps=[
            PipelineStep("baseband", ""),
            PipelineStep("soft", "psk_demod", {
                "constellation": "qpsk", "symbolrate": 100_000.0,
                "rrc_alpha": 0.5, "pll_bw": 0.005,
                "fast": True, "multichip": True,
            }),
            PipelineStep("cadu", "metop_ahrpt_decoder", {}),
        ],
        parameters={})
    out = run_pipeline(pipe, str(bb_path), str(tmp_path / "out"),
                       user_params={"samplerate": 200_000.0})
    got = np.fromfile(out, dtype=np.uint8)
    got = got[: len(got) // 1024 * 1024].reshape(-1, 1024)
    matched = sum(bool((cadus == g).all(axis=1).any()) for g in got)
    assert matched == len(got) == 12, \
        f"lead={lead}: {matched}/{len(got)} of 12 frames"


def test_sharded_step_collective_structure():
    """VERDICT r4 weak #3: assert the STRUCTURAL cost of the sharded
    program — the collectives it lowers to and what rides them. The step
    must use exactly point-to-point permutes for halos/seams plus ONE tiny
    all-gather (per-shard seam rotations); an accidental all-gather of
    sample data (or any all-reduce/all-to-all) is a regression this test
    catches without needing wall-clock on a shared-core CPU mesh."""
    mesh = make_mesh(8, n_ch=1)
    block, halo = 1 << 14, 2048
    step = build_sharded_qpsk_step(mesh, sps=2.0, block=block, halo=halo)
    x = shard_input(np.zeros((1, 8 * block), np.complex64), mesh)
    hlo = jax.jit(step).lower(x).compile().as_text()
    n_permute = hlo.count("collective-permute(")
    n_gather = hlo.count("all-gather(")
    n_reduce = hlo.count("all-reduce(") + hlo.count("all-to-all(")
    # 3 permutes: halo exchange, seam-overlap tail, successor-first-symbol
    assert n_permute == 3, f"expected 3 collective-permutes, got {n_permute}"
    assert n_gather <= 1, f"expected <=1 all-gather, got {n_gather}"
    assert n_reduce == 0, f"unexpected all-reduce/all-to-all: {n_reduce}"
    # bytes over ICI per step: halo (c64) + seam tail (c64) + scalars —
    # must stay a small fraction of the per-shard block bytes
    W = min(halo // 2, 4096)
    ici_bytes = 8 * (halo + W) + 4 * 2
    assert ici_bytes < 0.8 * 8 * block, "halo+seam traffic not a small " \
        "fraction of block bytes — halo/W sizing regressed"


@pytest.mark.slow
def test_sharded_scaling_efficiency(rng):
    """Wall-clock of the sharded step at 1 vs 8 t-shards over the same total
    samples. On the virtual CPU mesh all shards share the host's cores, so
    this only *reports* the ratio (the hardware measurement is the driver's
    job); it asserts the 8-shard program completes and stays within 4x of
    the 1-shard run (sanity against pathological collectives)."""
    import time

    assert len(jax.devices()) >= 8
    sps, block = 2.0, 1 << 15
    total = 8 * block
    x = (0.5 * (rng.standard_normal(total) + 1j * rng.standard_normal(total))
         ).astype(np.complex64).reshape(1, total)

    times = {}
    for nt in (1, 8):
        mesh = make_mesh(nt, n_ch=1)
        step = build_sharded_qpsk_step(mesh, sps=sps, block=total // nt,
                                       halo=2048)
        xin = shard_input(x, mesh)
        jax.block_until_ready(step(xin))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(step(xin))
        times[nt] = (time.perf_counter() - t0) / 3
    ratio = times[1] / times[8]
    print(f"sharded scaling (CPU mesh, informational): "
          f"t1={times[1]*1e3:.1f}ms t8={times[8]*1e3:.1f}ms "
          f"speedup={ratio:.2f}x")
    assert times[8] < times[1] * 4.0
