"""DVB-S2 demodulator module: baseband -> .bbframe.

Reference: plugins/dvb_support/dvbs2/module_dvbs2_demod.{h,cpp} — its chain
is AGC -> RRC -> freq shift -> PL sync (own thread) -> pilot PLL -> clock
recovery -> per-frame soft demap -> LDPC (repeated trials) -> BCH (optional
own thread) -> BBFrame out. Parameter surface matches (symbolrate, rrc_alpha,
modcod, shortframes, pilots, ldpc_trials/iters...).

TPU formulation: the front end (freq shift / resample / AGC / RRC / O&M
feedforward timing) is one jitted per-block function with carried state; the
PL layer (satdump_tpu.ops.dvbs2.rx.DVBS2Demod) finds PLFRAMEs by batched
differential correlation, recovers per-frame CFO/phase feedforward from the
header + pilots, and runs LDPC/BCH batched over all frames of the block —
no per-sample PLL threads.
"""

from __future__ import annotations

import jax
import numpy as np

from satdump_tpu.core.log import logger
from satdump_tpu.ops import ffsync, fir, firdes, resamp, stages
from satdump_tpu.ops.dvbs2.rx import DVBS2Demod
from satdump_tpu.pipeline.module import register_module
from satdump_tpu.pipeline.modules.demod.base import BaseDemodModule
from satdump_tpu.utils import xfer


@register_module
class DVBS2DemodModule(BaseDemodModule):
    id = "dvbs2_demod"

    # DVB-S2 front end resamples to exactly 2 samples/symbol
    MIN_SPS = 2.0
    MAX_SPS = 2.0

    def __init__(self, input_file, output_file_hint, parameters):
        super().__init__(input_file, output_file_hint, parameters)
        self.rrc_alpha = float(self.param("rrc_alpha", required=True))
        self.rrc_taps = int(self.param("rrc_taps", 31))
        self.modcod = int(self.param("modcod", required=True))
        self.shortframes = bool(self.param("shortframes", False))
        self.pilots = bool(self.param("pilots", False))
        self.ldpc_iters = int(self.param("ldpc_iters", 0) or
                              10 * int(self.param("ldpc_trials", 3)))
        self.block_base = int(self.param("buffer_size", 0) or (1 << 18))

    def _build(self):
        self.compute_rates()
        self.block_size = self.choose_block_size(self.block_base)
        rrc = firdes.root_raised_cosine(
            1.0, self.final_samplerate, self.d_symbolrate, self.rrc_alpha,
            self.rrc_taps)
        bank = firdes.mm_interpolator_bank()
        sps = self.final_sps
        do_shift = self.d_frequency_shift != 0
        shift_delta = 2 * np.pi * self.d_frequency_shift / self.d_samplerate
        do_resample = self.resample
        if do_resample:
            interp, decim = resamp.make_rational(
                self.d_samplerate, self.final_samplerate)
            r_proto = resamp.design_resampler_taps(interp, decim)
            r_bank = firdes.polyphase_bank(r_proto, interp)
            out_n = self.block_size * interp // decim
        else:
            interp = decim = 1
            r_bank = None
            out_n = self.block_size
        dc_block = self.d_dc_block
        agc_rate = self.d_agc_rate
        ff_cap = int(np.ceil(out_n / (sps * 0.99))) + 2

        def step(state, x):
            fs_st, dc_st, rs_st, agc_st, fir_st, ck_st = state
            if do_shift:
                fs_st, x = stages.freq_shift(fs_st, x, shift_delta)
            if dc_block:
                dc_st, x = stages.dc_block(dc_st, x, alpha=1e-4)
            if do_resample:
                rs_st, x, _ = resamp.rational_resampler(
                    rs_st, x, r_bank, interp, decim, out_cap=out_n)
            agc_st, x = stages.agc_scan(agc_st, x, rate=agc_rate)
            fir_st, x = fir.fir_apply(fir_st, x, rrc)
            # timing only: carrier recovery belongs to the PL layer
            # (header/pilot-anchored, per frame)
            ck_st, syms, valid = ffsync.ff_clock_recovery(
                ck_st, x, sps=sps, bank=bank, out_cap=ff_cap)
            return (fs_st, dc_st, rs_st, agc_st, fir_st, ck_st), syms, valid

        self._step = jax.jit(step, donate_argnums=0)
        self._state = (
            stages.freq_shift_init(),
            stages.dc_block_init(),
            resamp.rational_resampler_init(
                interp, r_bank.shape[1] if do_resample else 8),
            stages.agc_init(),
            fir.fir_init(len(rrc)),
            ffsync.ff_clock_init(),
        )

    def process(self):
        self._build()
        out_path = self.d_output_file_hint + ".bbframe"
        self.d_output_file = out_path
        reader = self.open_input(self.block_size)
        dem = DVBS2Demod(self.modcod, self.shortframes, self.pilots,
                         ldpc_iters=self.ldpc_iters)
        logger.info(f"DVB-S2 MODCOD {self.modcod} "
                    f"({dem.cfg.constellation} {dem.cfg.rate} "
                    f"{'short' if self.shortframes else 'normal'}"
                    f"{' +pilots' if self.pilots else ''}); "
                    f"samplerate {self.d_samplerate} -> "
                    f"{self.final_samplerate} (sps {self.final_sps:.2f})")
        nframes = 0
        with open(out_path, "wb") as f:
            for blk in reader.blocks():
                self._state, syms, valid = self._step(
                    self._state, xfer.put(blk.samples))
                s = xfer.get(syms)[xfer.get(valid)]
                if blk.last and blk.valid < self.block_size:
                    keep = int(len(s) * blk.valid / self.block_size) + 2
                    s = s[:min(keep, len(s))]
                frames = dem.process(s)
                if frames.shape[0]:
                    f.write(frames.tobytes())
                    nframes += frames.shape[0]
        self.stats = dict(dem.stats)
        self.stats["bbframes"] = nframes
        logger.info(f"Decoded {nframes} BBFrames "
                    f"(LDPC ok {dem.stats['ldpc_ok']}/{dem.stats['frames']}, "
                    f"BCH ok {dem.stats['bch_ok']})")
