"""FSK demodulator module: baseband -> .soft (real int8 x50).

Reference: src-core/pipeline/modules/demod/module_fsk_demod.cpp — chain:
[resample] -> AGC -> quadrature demod -> DC block -> AGC2 -> RRC (or basic
boxcar when basic_shaping) -> M&M clock recovery (float) -> int8 x50.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from satdump_tpu.core.log import logger
from satdump_tpu.ops import clock_recovery, fir, firdes, resamp, stages
from satdump_tpu.pipeline.module import register_module
from satdump_tpu.pipeline.modules.demod.base import BaseDemodModule
from satdump_tpu.utils import xfer


@register_module
class FSKDemodModule(BaseDemodModule):
    id = "fsk_demod"

    MAX_SPS = 8.0
    OUT_SCALE = 50.0
    USE_AGC2 = True

    def __init__(self, input_file, output_file_hint, parameters):
        super().__init__(input_file, output_file_hint, parameters)
        self.rrc_alpha = float(self.param("rrc_alpha", 0.5))
        self.rrc_taps = int(self.param("rrc_taps", 31))
        self.basic_shaping = bool(self.param("basic_shaping", False))
        clock_alpha = float(self.param("clock_alpha", 8.7e-3))
        self.clock_gain_omega = float(
            self.param("clock_gain_omega", clock_alpha ** 2 / 4.0))
        self.clock_mu = float(self.param("clock_mu", 0.5))
        self.clock_gain_mu = float(self.param("clock_gain_mu", clock_alpha))
        self.clock_omega_limit = float(
            self.param("clock_omega_relative_limit", 0.005))
        self.block_base = int(self.param("buffer_size", 0) or (1 << 18))

    def _build(self):
        self.compute_rates()
        self.block_size = self.choose_block_size(self.block_base)
        sps = self.final_sps
        if self.basic_shaping:
            taps = np.full(max(int(sps), 1), 0.1, np.float32)
        else:
            taps = firdes.root_raised_cosine(
                1.0, self.final_samplerate, self.d_symbolrate,
                self.rrc_alpha, self.rrc_taps)
        bank = firdes.mm_interpolator_bank()
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
        gain_omega, gain_mu = self.clock_gain_omega, self.clock_gain_mu
        omega_limit = self.clock_omega_limit
        mm_cap = int(np.ceil(out_n / (sps * (1 - omega_limit)))) + 2

        def step(state, x):
            fs_st, rs_st, agc_st, qd_st, dc_st, agc2_st, fir_st, mm_st = state
            if do_shift:
                fs_st, x = stages.freq_shift(fs_st, x, shift_delta)
            if do_resample:
                rs_st, x, _ = resamp.rational_resampler(
                    rs_st, x, r_bank, interp, decim, out_cap=out_n)
            agc_st, x = stages.agc_scan(agc_st, x, rate=agc_rate)
            qd_st, f = stages.quadrature_demod(qd_st, x, 1.0)
            fc = f.astype(jnp.complex64)
            dc_st, fc = stages.dc_block(dc_st, fc, alpha=1e-3)
            if self.USE_AGC2:
                agc2_st, fc = stages.agc_scan(agc2_st, fc, rate=0.1)
            fir_st, fc = fir.fir_apply(fir_st, fc, taps)
            mm_st, syms, valid = clock_recovery.mm_clock_recovery(
                mm_st, fc, omega_mid=sps, gain_omega=gain_omega,
                gain_mu=gain_mu, omega_relative_limit=omega_limit,
                bank=bank, out_cap=mm_cap, complex_mode=False)
            return (fs_st, rs_st, agc_st, qd_st, dc_st, agc2_st, fir_st,
                    mm_st), syms, valid

        self._step = jax.jit(step, donate_argnums=0)
        self._state = (
            stages.freq_shift_init(),
            resamp.rational_resampler_init(
                interp, r_bank.shape[1] if do_resample else 8),
            stages.agc_init(),
            stages.quadrature_demod_init(),
            stages.dc_block_init(),
            stages.agc_init(),
            fir.fir_init(len(taps)),
            clock_recovery.mm_init(omega=sps, mu=self.clock_mu),
        )

    def stream_start(self) -> None:
        self._build()
        self._nsyms = 0
        logger.info(f"FSK demod; samplerate {self.d_samplerate} -> "
                    f"{self.final_samplerate} (sps {self.final_sps:.2f})")

    def stream_work(self, samples: np.ndarray, valid: int | None = None,
                    last: bool = False) -> np.ndarray:
        self._state, syms, vmask = self._step(self._state, xfer.put(samples))
        s = xfer.get(syms)[xfer.get(vmask)]
        if last and valid is not None and valid < self.block_size:
            keep = int(len(s) * valid / self.block_size) + 2
            s = s[:min(keep, len(s))]
        out = np.clip(np.real(s) * self.OUT_SCALE, -127, 127).astype(np.int8)
        self._nsyms += len(s)
        self.stats = {"symbols": self._nsyms}
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
        logger.info(f"FSK demodulated {self._nsyms} symbols")


@register_module
class SDPSKDemodModule(FSKDemodModule):
    """SDPSK: quadrature demod -> DC block -> RRC -> M&M on the real
    frequency signal, x400 soft scale (module_sdpsk_demod.cpp:60-122).
    SDPSK's +-pi/2-per-symbol phase steps make the discriminator output a
    binary waveform, so the FSK chain applies verbatim minus its second AGC.
    """

    id = "sdpsk_demod"
    OUT_SCALE = 400.0
    USE_AGC2 = False
