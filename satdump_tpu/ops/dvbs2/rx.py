"""DVB-S2 receive chain: clock-recovered symbols -> BBFrames -> TS.

Batched composition of plsync + demap + LDPC + BCH (the body of the
reference's module_dvbs2_demod.cpp process_s2/process_s2_bch threads,
restructured so every heavy stage runs on all frames of a block at once).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from satdump_tpu.ops.dvbs2 import defs
from satdump_tpu.ops.dvbs2.bch import get_bch
from satdump_tpu.ops.dvbs2.demap import deinterleave, soft_demap
from satdump_tpu.ops.dvbs2.ldpc import get_ldpc
from satdump_tpu.ops.dvbs2.plsync import (decode_pls, find_frame_offset,
                                          recover_payload)
from satdump_tpu.ops.dvbs2.scrambling import bb_derandomize


class DVBS2Demod:
    """Stateful symbol-stream -> BBFrame decoder for one MODCOD."""

    def __init__(self, modcod: int, shortframes: bool = False,
                 pilots: bool = False, ldpc_iters: int = 30):
        self.cfg = defs.get_modcod_cfg(modcod, shortframes, pilots)
        self.frame_len = defs.plframe_len(self.cfg)
        self.bch = get_bch(self.cfg.frame, self.cfg.rate)
        self.ldpc = get_ldpc(self.cfg.frame, self.cfg.rate, iters=ldpc_iters)
        self.kbch = self.bch.kbch
        self._carry = np.zeros(0, np.complex64)
        self.stats: Dict[str, float] = {
            "frames": 0, "ldpc_ok": 0, "bch_ok": 0, "bch_corrected": 0,
            "detected_modcod": -1, "detected_shortframes": False,
            "detected_pilots": False}

    def process(self, symbols: np.ndarray) -> np.ndarray:
        """Symbol block (1 sps, any length) -> (B, kbch/8) BBFrames
        (descrambled, header+datafield). Carries partial frames across
        calls."""
        x = np.concatenate([self._carry, np.asarray(symbols, np.complex64)])
        off, score = find_frame_offset(x, self.frame_len)
        n_frames = (len(x) - off) // self.frame_len
        if n_frames == 0:
            self._carry = x[-2 * self.frame_len:] if len(x) else x
            return np.zeros((0, self.kbch // 8), np.uint8)
        used = off + n_frames * self.frame_len
        self._carry = x[used:].copy()
        frames = x[off: used].reshape(n_frames, self.frame_len)

        payloads = []
        noise_vars = []
        for f in frames:
            pls, cfo, phase = decode_pls(f[: defs.HDR_LEN])
            self.stats["detected_modcod"] = pls >> 2
            self.stats["detected_shortframes"] = bool(pls & 2)
            self.stats["detected_pilots"] = bool(pls & 1)
            pay = recover_payload(f, self.cfg, cfo, phase)
            payloads.append(pay)
            # noise estimate from corrected header residual
            n = np.arange(defs.HDR_LEN)
            h = f[: defs.HDR_LEN] * np.exp(-1j * (cfo * n + phase))
            ref = np.concatenate([defs.sof_symbols(),
                                  defs.pls_symbols()[pls]])
            noise_vars.append(float(np.mean(np.abs(h - ref) ** 2)))
        payloads = np.stack(payloads)                  # (B, slots*90)
        nv = max(float(np.median(noise_vars)), 1e-3)

        soft = soft_demap(payloads, self.cfg.constellation,
                          self.cfg.g1, self.cfg.g2, noise_var=nv)
        cw_soft = deinterleave(soft, self.cfg.constellation, self.cfg.rate)
        bits, ok = self.ldpc.decode(-cw_soft)          # positive = bit 0
        self.stats["frames"] += n_frames
        self.stats["ldpc_ok"] += int(ok.sum())

        nbch_bits = bits[:, : self.ldpc.K]
        corrected, ncorr = self.bch.decode(nbch_bits)
        good = ncorr >= 0
        self.stats["bch_ok"] += int(good.sum())
        self.stats["bch_corrected"] += int(ncorr[good].sum())
        kbits = corrected[good, : self.kbch]
        if kbits.shape[0] == 0:
            return np.zeros((0, self.kbch // 8), np.uint8)
        frames_bytes = np.packbits(kbits, axis=-1)
        return bb_derandomize(frames_bytes)
