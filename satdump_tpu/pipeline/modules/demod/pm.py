"""PM demodulator module: baseband -> .soft (BPSK softs).

Reference: src-core/pipeline/modules/demod/module_pm_demod.cpp — chain:
[resample] -> AGC -> carrier-tracking PLL (locks to the residual carrier)
-> PM->BPSK (keep imag, mix down by the subcarrier rate,
common/dsp/demod/pm_to_bpsk.cpp) -> RRC -> Costas(2) -> M&M clock recovery
-> int8 x50 real softs. Unlocks NOAA HRPT/DSB and the PM L-band birds.

The whole per-block chain is one jitted function with carried loop state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from satdump_tpu.core.log import logger
from satdump_tpu.ops import clock_recovery, costas, fir, firdes, resamp, stages
from satdump_tpu.pipeline.module import register_module
from satdump_tpu.pipeline.modules.demod.base import BaseDemodModule
from satdump_tpu.utils import xfer


@register_module
class PMDemodModule(BaseDemodModule):
    id = "pm_demod"

    MAX_SPS = 10.0  # ref: do NOT resample unless really necessary

    def __init__(self, input_file, output_file_hint, parameters):
        super().__init__(input_file, output_file_hint, parameters)
        self.pll_bw = float(self.param("pll_bw", required=True))
        self.pll_max_offset = float(self.param("pll_max_offset", 0.5))
        self.rrc_alpha = float(self.param("rrc_alpha", required=True))
        self.rrc_taps = int(self.param("rrc_taps", 31))
        self.costas_bw = float(self.param("costas_bw", 0.004))
        clock_alpha = float(self.param("clock_alpha", 8.7e-3))
        self.clock_gain_omega = float(
            self.param("clock_gain_omega", clock_alpha ** 2 / 4.0))
        self.clock_mu = float(self.param("clock_mu", 0.5))
        self.clock_gain_mu = float(self.param("clock_gain_mu", clock_alpha))
        self.clock_omega_limit = float(
            self.param("clock_omega_relative_limit", 0.005))
        self.subcarrier_offset = float(self.param("subcarrier_offset", 0))
        self.block_base = int(self.param("buffer_size", 0) or (1 << 18))

    def _build(self):
        self.compute_rates()
        self.block_size = self.choose_block_size(self.block_base)
        sps = self.final_sps
        rrc = firdes.root_raised_cosine(
            1.0, self.final_samplerate, self.d_symbolrate, self.rrc_alpha,
            self.rrc_taps)
        bank = firdes.mm_interpolator_bank()
        sub_rate = self.subcarrier_offset or self.d_symbolrate
        sub_delta = -2 * np.pi * sub_rate / self.final_samplerate
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
        agc_rate = self.d_agc_rate
        pll_bw, pll_max = self.pll_bw, self.pll_max_offset
        costas_bw = self.costas_bw
        gain_omega, gain_mu = self.clock_gain_omega, self.clock_gain_mu
        omega_limit = self.clock_omega_limit
        mm_cap = int(np.ceil(out_n / (sps * (1 - omega_limit)))) + 2

        def step(state, x):
            (fs_st, dc_st, rs_st, agc_st, pll_st, sub_st, fir_st, cs_st,
             mm_st) = state
            if do_shift:
                fs_st, x = stages.freq_shift(fs_st, x, shift_delta)
            if self.d_dc_block:
                dc_st, x = stages.dc_block(dc_st, x, alpha=1e-4)
            if do_resample:
                rs_st, x, _ = resamp.rational_resampler(
                    rs_st, x, r_bank, interp, decim, out_cap=out_n)
            agc_st, x = stages.agc_scan(agc_st, x, rate=agc_rate)
            pll_st, x = costas.pll_carrier_scan(pll_st, x, pll_bw,
                                                max_offset=pll_max)
            # PM -> BPSK: keep the quadrature (phase) arm, mix the BPSK
            # subcarrier at sub_rate down to baseband (pm_to_bpsk.cpp)
            x = (1j * jnp.imag(x)).astype(jnp.complex64)
            sub_st, x = stages.freq_shift(sub_st, x, -sub_delta)
            fir_st, x = fir.fir_apply(fir_st, x, rrc)
            cs_st, x = costas.costas_scan(cs_st, x, costas_bw, 2)
            mm_st, syms, valid = clock_recovery.mm_clock_recovery(
                mm_st, x, omega_mid=sps, gain_omega=gain_omega,
                gain_mu=gain_mu, omega_relative_limit=omega_limit,
                bank=bank, out_cap=mm_cap)
            snr = stages.snr_m2m4(jnp.where(valid, syms, 0))
            return (fs_st, dc_st, rs_st, agc_st, pll_st, sub_st, fir_st,
                    cs_st, mm_st), syms, valid, snr

        self._step = jax.jit(step, donate_argnums=0)
        self._state = (
            stages.freq_shift_init(),
            stages.dc_block_init(),
            resamp.rational_resampler_init(
                interp, r_bank.shape[1] if do_resample else 8),
            stages.agc_init(),
            costas.pll_init(),
            stages.freq_shift_init(),
            fir.fir_init(len(rrc)),
            costas.costas_init(),
            clock_recovery.mm_init(omega=sps, mu=self.clock_mu),
        )

    def stream_start(self) -> None:
        self._build()
        self._nsyms = 0
        self._snr = -100.0
        self._peak_snr = -100.0
        logger.info(f"PM demod; samplerate {self.d_samplerate} -> "
                    f"{self.final_samplerate} (sps {self.final_sps:.2f})")

    def stream_work(self, samples: np.ndarray, valid: int | None = None,
                    last: bool = False) -> np.ndarray:
        self._state, syms, vmask, snr = self._step(self._state,
                                                   xfer.put(samples))
        s = xfer.get(syms)[xfer.get(vmask)]
        if last and valid is not None and valid < self.block_size:
            keep = int(len(s) * valid / self.block_size) + 2
            s = s[:min(keep, len(s))]
        self._snr = float(snr)
        self._peak_snr = max(self._peak_snr, self._snr)
        out = np.clip(s.real * 50.0, -127, 127).astype(np.int8)
        self._nsyms += len(s)
        self.stats = {"snr": self._snr, "peak_snr": self._peak_snr,
                      "symbols": self._nsyms}
        return out

    def process(self):
        self.stream_start()
        out_path = self.d_output_file_hint + ".soft"
        self.d_output_file = out_path
        reader = self.open_input(self.block_size)
        with open(out_path, "wb") as f:
            for blk in reader.blocks():
                f.write(self.stream_work(blk.samples, valid=blk.valid,
                                         last=blk.last).tobytes())
        logger.info(f"PM demodulated {self._nsyms} symbols, "
                    f"SNR {self._snr:.1f} dB")
