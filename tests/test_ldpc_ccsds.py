"""CCSDS LDPC constructions (AR4JA + C2) and the ccsds_ldpc_decoder module
(ref make_ccsds.cpp, ccsds_ldpc.cpp, module_ccsds_ldpc_decoder.cpp)."""

import numpy as np
import pytest

from satdump_tpu.ops.fec.ldpc_ccsds import (CCSDSLDPC, make_ar4ja, make_c2,
                                            C2_N, C2_M)
from satdump_tpu.ops.fec.randomization import derand_ccsds_soft
from satdump_tpu.pipeline.module import module_registry, register_all_modules


def _noisy_soft(frame_bits, rng, mag=80, sigma=30):
    s = (frame_bits.astype(np.float32) * 2 - 1) * mag
    s = s + rng.normal(0, sigma, s.shape)
    return np.clip(s, -127, 127).astype(np.int8)


# -------------------------------------------------------------- structure --
@pytest.mark.parametrize("rate,M,n", [("1/2", 512, 2560), ("2/3", 256, 1792),
                                      ("4/5", 128, 1408)])
def test_ar4ja_structure(rate, M, n):
    code, m = make_ar4ja(rate, 1024)
    assert m == M and code.n == n and code.m == 3 * M
    # AR4JA: every variable has degree >= 1; check count = 3M
    assert code.edge_chk.max() == 3 * M - 1


def test_c2_structure():
    code = make_c2()
    assert code.n == C2_N and code.m == C2_M
    # every check row has degree exactly 32 (2 per circulant x 16 subblocks)
    assert code.dc_max == 32 and len(code.edge_var) == 32704


@pytest.mark.parametrize("rate,block", [("1/2", 1024), ("2/3", 1024),
                                        ("4/5", 1024), ("1/2", 4096)])
def test_ar4ja_k_matches_block(rate, block):
    ld = CCSDSLDPC(rate, block)
    assert ld.data_bits == block


# --------------------------------------------------------------- loopback --
@pytest.mark.parametrize("rate", ["1/2", "2/3", "4/5"])
def test_ar4ja_encode_decode(rate, rng):
    ld = CCSDSLDPC(rate, 1024, iters=30)
    enc = ld.encoder()
    data = rng.integers(0, 2, (4, ld.data_bits)).astype(np.uint8)
    fr = ld.encode_frames(enc, data)
    bits, ok = ld.decode_frames(_noisy_soft(fr, rng, sigma=35))
    assert ok.all()
    np.testing.assert_array_equal(bits, fr)
    # systematic: data occupies the leading codeword positions
    np.testing.assert_array_equal(fr[:, : ld.data_bits], data)


def test_c2_encode_decode(rng):
    ld = CCSDSLDPC("7/8", iters=25)
    enc = ld.encoder()
    data = rng.integers(0, 2, (4, ld.data_bits)).astype(np.uint8)
    fr = ld.encode_frames(enc, data)
    assert fr.shape[1] == 8160
    bits, ok = ld.decode_frames(_noisy_soft(fr, rng, sigma=28))
    assert ok.all()
    np.testing.assert_array_equal(bits, fr)


def test_big_block_zero_codeword(rng):
    """16384-block codes are decode-only; the zero codeword is valid for any
    linear code, so decode(noisy zeros) must return zeros."""
    ld = CCSDSLDPC("1/2", 16384, iters=20)
    soft = np.clip(-80 + rng.normal(0, 35, (2, ld.frame_bits)),
                   -127, 127).astype(np.int8)
    bits, ok = ld.decode_frames(soft)
    assert ok.all() and (bits == 0).all()


def test_derand_soft_matches_byte_domain(rng):
    """Soft derand then hard-slice == hard-slice then byte derand."""
    from satdump_tpu.ops.fec.randomization import derand_ccsds
    soft = rng.integers(-127, 128, 2040).astype(np.int8)
    # ~x maps 0 <-> -1, whose hard slice (x > 0) is ambiguous — same edge
    # case in the reference's derand_ccsds_soft; keep the fixture away
    soft[(soft == 0) | (soft == -1)] = 1
    hard1 = np.packbits((derand_ccsds_soft(soft) > 0).astype(np.uint8))
    hard0 = np.packbits((soft > 0).astype(np.uint8))
    np.testing.assert_array_equal(hard1, derand_ccsds(hard0))


# ----------------------------------------------------------------- module --
def _ldpc_frame_stream(ld, enc, n_frames, rng, asm_val, asm_size,
                       derand=True):
    """TX fixture: data -> LDPC frames + soft ASM, PN-randomized."""
    data = rng.integers(0, 2, (n_frames, ld.data_bits)).astype(np.uint8)
    frames = ld.encode_frames(enc, data)
    asm = ((asm_val >> np.arange(asm_size - 1, -1, -1)) & 1).astype(np.uint8)
    out = []
    for i in range(n_frames):
        fb = frames[i]
        soft = ((fb.astype(np.int16) * 2 - 1) * 100).astype(np.int8)
        if derand:
            soft = derand_ccsds_soft(soft)  # involution
        asm_soft = ((asm.astype(np.int16) * 2 - 1) * 100).astype(np.int8)
        out.append(np.concatenate([asm_soft, soft]))
    return np.concatenate(out), frames, data


@pytest.mark.parametrize("rate,block", [("7/8", 0), ("1/2", 1024)])
def test_ldpc_decoder_module(tmp_path, rate, block, rng):
    register_all_modules()
    from satdump_tpu.pipeline.modules.ccsds.ldpc_decoder import (ASM_AR4JA,
                                                                 ASM_C2)
    ld = CCSDSLDPC(rate, block, iters=20)
    enc = ld.encoder()
    asm_val, asm_size = (ASM_C2, 32) if rate == "7/8" else (ASM_AR4JA, 64)
    stream, frames, _ = _ldpc_frame_stream(ld, enc, 6, rng, asm_val, asm_size)
    # prepend garbage so the correlator must find the first frame
    stream = np.concatenate([rng.integers(-40, 40, 777).astype(np.int8),
                             stream])
    soft_path = tmp_path / "t.soft"
    stream.tofile(soft_path)
    mod = module_registry.get("ccsds_ldpc_decoder")(
        str(soft_path), str(tmp_path / "o"), {
            "constellation": "bpsk", "ldpc_rate": rate,
            "ldpc_block_size": block, "ldpc_iterations": 20,
        })
    mod.process()
    row = asm_size // 8 + ld.frame_bits // 8
    out = np.fromfile(mod.d_output_file, np.uint8).reshape(-1, row)
    assert len(out) >= 5
    asm_bytes = np.frombuffer(int(asm_val).to_bytes(asm_size // 8, "big"),
                              np.uint8)
    for r in out:
        np.testing.assert_array_equal(r[: asm_size // 8], asm_bytes)
    # decoded payloads must match the transmitted frames
    want = {np.packbits(f).tobytes() for f in frames}
    got = sum(r[asm_size // 8:].tobytes() in want for r in out)
    assert got >= len(out) - 1
