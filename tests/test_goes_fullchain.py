"""GOES HRIT full chain (BASELINE config 4): synthetic ABI segments ->
xRIT files -> CCSDS packets -> VCDU CADUs (+RS, randomized, NRZ-M, conv) ->
BPSK baseband -> the ACTUAL goes_hrit-style pipeline (psk_demod ->
ccsds_conv_concat_decoder -> goes_lrit_data_decoder) -> assembled image
bit-exact."""

import numpy as np
import pytest

from satdump_tpu import sim
from satdump_tpu.ccsds.mux import make_cadus_for_vcid
from satdump_tpu.io import write_baseband
from satdump_tpu.ops.fec.reed_solomon import ReedSolomon
from satdump_tpu.pipeline.pipeline import Pipeline, PipelineStep
from satdump_tpu.pipeline.runner import run_pipeline
from satdump_tpu.xrit import (ImageStructureRecord, NOAALRITHeader,
                              SegmentIdentificationHeader, TimeStampRecord,
                              build_xrit_file, packetize_xrit_file)


def _abi_packets(rng, nseg=3, width=160, seg_lines=20):
    full = np.clip(120 + np.cumsum(rng.normal(0, 2, (nseg * seg_lines,
                                                     width)), axis=1),
                   0, 255).astype(np.uint8)
    pkts = []
    for s in range(nseg):
        seg = full[s * seg_lines: (s + 1) * seg_lines]
        records = [
            ImageStructureRecord(bit_per_pixel=8, columns_count=width,
                                 lines_count=seg_lines, compression_flag=0),
            SegmentIdentificationHeader(image_identifier=3,
                                        segment_sequence_number=s,
                                        max_segment=nseg, max_column=width,
                                        max_row=nseg * seg_lines),
            NOAALRITHeader(product_id=16, product_subid=13,
                           noaa_specific_compression=0),
            TimeStampRecord(days=25000, milliseconds_of_day=43200),
        ]
        raw = build_xrit_file(f"OR_ABI-L2-CMIPF-M6C13_G16_s30{s}.lrit",
                              seg.tobytes(), records)
        pkts += packetize_xrit_file(raw, apid=300 + s, seq_start=s * 1000)
    return full, pkts


@pytest.mark.slow
def test_goes_hrit_baseband_to_images(tmp_path, rng):
    full, pkts = _abi_packets(rng)
    # transmit twice: demod/deframer lock acquisition consumes the head of
    # the stream; the second copy decodes complete (same image id, so the
    # assembler overwrites with identical data)
    plain = make_cadus_for_vcid(pkts + pkts, vcid=7,
                                mpdu_data_size=884)       # (n, 896)
    rs = ReedSolomon(k=223)
    payload = rs.encode_interleaved(plain[:, 4:], ccsds_dual=True, depth=4)
    cadus = np.concatenate(
        [plain[:, :4], payload], axis=1).astype(np.uint8)      # (n, 1024)
    bits = sim.encode_cadu_stream(cadus, randomize=True, nrzm=True)
    # a real pass ends in noise after LOS, not on a frame boundary
    bits = np.concatenate([bits, rng.integers(0, 2, 4096).astype(np.uint8)])
    syms = (2.0 * bits.astype(np.float32) - 1.0).astype(np.complex64)
    tx = sim.qpsk_modulate(syms, sps=2.2, rrc_alpha=0.5)       # BPSK pulse
    chan = sim.ChannelModel(snr_db=14.0, freq_offset=1e-4, phase=0.3,
                            seed=8)
    bb_path = tmp_path / "goes.cf32"
    write_baseband(bb_path, "cf32", chan.apply(tx))

    pipe = Pipeline(
        id="goes_t", name="GOES HRIT test",
        steps=[
            PipelineStep("baseband", ""),
            PipelineStep("soft", "psk_demod", {
                "constellation": "bpsk", "symbolrate": 100_000.0,
                "rrc_alpha": 0.5, "pll_bw": 0.02,
            }),
            PipelineStep("cadu", "ccsds_conv_concat_decoder", {
                "constellation": "bpsk", "cadu_size": 8192,
                "derandomize": True, "nrzm": True, "rs_i": 4,
                "rs_type": "rs223", "rs_usecheck": True,
            }),
            PipelineStep("products", "goes_lrit_data_decoder", {
                "write_images": True,
            }),
        ],
        parameters={})
    run_pipeline(pipe, str(bb_path), str(tmp_path / "out"),
                 user_params={"samplerate": 220_000.0,
                              "buffer_size": 1 << 17})

    from satdump_tpu.image.io import load_img
    pngs = sorted((tmp_path / "out").rglob("*.png"))
    assert pngs, "no images produced"
    imgs = [load_img(p) for p in pngs]
    best = max(imgs, key=lambda a: a.size)
    assert best.shape == full.shape
    # CADU losses at stream head may cost the first segment's lines; the
    # overlap must be large and bit-exact where present
    same = (best == full)
    assert same.mean() > 0.95, f"only {same.mean():.2f} of pixels match"
