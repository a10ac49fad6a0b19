"""Generic CCSDS turbo decoder module: .soft -> .frm.

Reference: src-core/pipeline/modules/ccsds/module_ccsds_turbo_decoder.cpp —
correlate the rate-specific attached sync marker (CCSDS 131.0-B ASMs) over
the soft stream, soft-derandomize the codeword, run the turbo decoder, and
write [0x1ACFFC1D | base bytes] frames with a CRC-16 validity stat.

TPU formulation: the correlator evaluates every offset and rotation in one
batched pass; all codewords of a chunk are decoded in ONE batched max-log-
BCJR call (frames in lanes) instead of the reference's per-frame C loop.
"""

from __future__ import annotations

import numpy as np

from satdump_tpu.core.exceptions import PipelineError
from satdump_tpu.core.log import logger
from satdump_tpu.ops.fec.correlator import CorrelatorGeneric
from satdump_tpu.ops.fec.crc import crc_ccitt
from satdump_tpu.ops.fec.randomization import derand_ccsds_soft
from satdump_tpu.ops.fec.rotation import rotate_soft
from satdump_tpu.ops.fec.turbo import CCSDSTurbo
from satdump_tpu.pipeline.module import ProcessingModule, register_module

# CCSDS 131.0-B attached sync markers per nominal code rate
TURBO_ASM = {
    "1/2": (0x034776C7272895B0, 64),
    "1/3": (0x25D5C0CE8990F6C9461BF79C, 96),
    "1/4": (0x034776C7272895B0FCB88938D8D76A4F, 128),
    "1/6": (0x25D5C0CE8990F6C9461BF79CDA2A3F31766F0936B9E40863, 192),
}


def _asm_bits(val: int, nbits: int) -> np.ndarray:
    return ((val >> np.arange(nbits - 1, -1, -1)) & 1).astype(np.uint8)


@register_module
class CCSDSTurboDecoderModule(ProcessingModule):
    id = "ccsds_turbo_decoder"

    def __init__(self, input_file, output_file_hint, parameters):
        super().__init__(input_file, output_file_hint, parameters)
        self.const = str(self.param("constellation", "bpsk"))
        if self.const not in ("bpsk", "qpsk"):
            raise PipelineError(f"turbo decoder: constellation {self.const}")
        self.base = int(self.param("turbo_base", required=True))
        self.rate = str(self.param("turbo_rate", required=True))
        self.iters = int(self.param("turbo_iters", 10))
        self.derand = bool(self.param("derandomize", True))
        self.corr_thr = float(self.param("correlator_threshold", 0.5))
        if self.rate not in TURBO_ASM:
            raise PipelineError(f"turbo rate {self.rate}")
        self.turbo = CCSDSTurbo(self.base, self.rate)
        asm_val, asm_len = TURBO_ASM[self.rate]
        self.asm_len = asm_len
        self.correlator = CorrelatorGeneric(self.const,
                                            _asm_bits(asm_val, asm_len))
        # soft values per codeword+asm unit in the stream
        self.unit = asm_len + self.turbo.encoded_length
        self.block = int(self.param("buffer_size", 0)
                         or max(1 << 20, 8 * self.unit))

    def process(self):
        out_path = self.d_output_file_hint + ".frm"
        self.d_output_file = out_path
        soft = np.fromfile(self.d_input_file, dtype=np.int8)
        nframes = 0
        crc_ok = 0
        pos = 0
        with open(out_path, "wb") as fout:
            while pos + 2 * self.unit <= len(soft):
                chunk = soft[pos: pos + self.block]
                p, phase, swap, corr = self.correlator.correlate(chunk)
                if corr < self.corr_thr:
                    pos += self.block - self.unit
                    continue
                aligned = rotate_soft(chunk[p:], phase, swap)
                n_cw = (len(aligned)) // self.unit
                if n_cw == 0:
                    pos += max(p, 1)
                    continue
                units = aligned[: n_cw * self.unit].reshape(n_cw, self.unit)
                cw_soft = units[:, self.asm_len:]
                if self.derand:
                    cw_soft = derand_ccsds_soft(cw_soft)
                llr = cw_soft.astype(np.float32) / 32.0
                bits, _ = self.turbo.decode(llr, iterations=self.iters)
                frames = np.packbits(bits, axis=-1)       # (n_cw, base)
                for fr in frames:
                    comp = crc_ccitt.compute(fr[: self.base - 2])
                    want = (int(fr[self.base - 2]) << 8) | int(fr[self.base - 1])
                    crc_ok += int(comp == want)
                    out = np.concatenate(
                        [np.array([0x1A, 0xCF, 0xFC, 0x1D], np.uint8), fr])
                    fout.write(out.tobytes())
                    nframes += 1
                pos += p + n_cw * self.unit
        self.stats = {"frames": nframes, "crc_ok": crc_ok}
        logger.info(f"Turbo decoded {nframes} frames ({crc_ok} CRC ok)")
