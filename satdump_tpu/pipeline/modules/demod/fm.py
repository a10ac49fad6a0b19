"""FM (quadrature) demodulators: generic fm_demod and noaa_apt_demod.

Reference: plugins/analog_support/noaa_apt/module_noaa_apt_demod.cpp —
baseband [dc] -> AGC -> rational resample to the audio rate -> quadrature
demod (gain pi for APT: hz_to_rad(sr/2, sr)) -> clamp +-1 -> mono int16 WAV.
"""

from __future__ import annotations

import wave

import jax
import jax.numpy as jnp
import numpy as np

from satdump_tpu.core.log import logger
from satdump_tpu.ops import firdes, resamp, stages
from satdump_tpu.pipeline.module import register_module
from satdump_tpu.pipeline.modules.demod.base import BaseDemodModule
from satdump_tpu.utils import xfer


@register_module
class FMDemodModule(BaseDemodModule):
    """Generic FM -> WAV demodulator (audio_samplerate = symbolrate param)."""

    id = "fm_demod"
    MIN_SPS = 1.0
    MAX_SPS = 1000.0

    def __init__(self, input_file, output_file_hint, parameters):
        super().__init__(input_file, output_file_hint, parameters)
        self.block_base = int(self.param("buffer_size", 0) or (1 << 18))

    def _build(self):
        # APT-style: keep input rate through AGC, then resample to symbolrate
        self.compute_rates()
        audio_rate = self.d_symbolrate
        interp, decim = resamp.make_rational(self.final_samplerate, audio_rate)
        self.block_size = self.choose_block_size(self.block_base)
        # align block so the audio resampler also emits constant counts
        import math
        if (self.block_size * interp) % decim:
            self.block_size *= decim // math.gcd(self.block_size, decim)
        proto = resamp.design_resampler_taps(interp, decim)
        r_bank = firdes.polyphase_bank(proto, interp)  # host np const
        out_n = self.block_size * interp // decim
        agc_rate = self.d_agc_rate
        dc_block = self.d_dc_block
        # QuadratureDemodBlock(gain = hz_to_rad(sr/2, sr)) multiplies by 1/gain
        quad_gain = 1.0 / np.pi

        def step(state, x):
            dc_st, agc_st, rs_st, qd_st = state
            if dc_block:
                dc_st, x = stages.dc_block(dc_st, x, alpha=1e-4)
            agc_st, x = stages.agc_block(agc_st, x, rate=agc_rate)
            rs_st, x, _ = resamp.rational_resampler(rs_st, x, r_bank, interp, decim,
                                                    out_cap=out_n)
            qd_st, y = stages.quadrature_demod(qd_st, x, gain=quad_gain)
            y = jnp.clip(y, -1.0, 1.0)
            return (dc_st, agc_st, rs_st, qd_st), y

        self._step = jax.jit(step, donate_argnums=0)
        self._state = (
            stages.dc_block_init(),
            stages.agc_init(),
            resamp.rational_resampler_init(interp, r_bank.shape[1]),
            stages.quadrature_demod_init(),
        )
        self.audio_rate = audio_rate
        self.out_n = out_n

    def process(self):
        self._build()
        out_path = self.d_output_file_hint + ".wav"
        self.d_output_file = out_path
        reader = self.open_input(self.block_size)
        logger.info(f"FM demod {self.d_samplerate} Hz -> {self.audio_rate} Hz audio")
        w = wave.open(out_path, "wb")
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(self.audio_rate))
        n_out = 0
        for blk in reader.blocks():
            self._state, y = self._step(self._state, xfer.put(blk.samples))
            audio = xfer.get(y)
            if blk.last and blk.valid < self.block_size:
                keep = int(len(audio) * blk.valid / self.block_size)
                audio = audio[:keep]
            pcm = np.clip(audio * 32767.0, -32767, 32767).astype(np.int16)
            w.writeframes(pcm.tobytes())
            n_out += len(pcm)
        w.close()
        self.stats = {"audio_samples": n_out}
        logger.info(f"Wrote {n_out} audio samples to {out_path}")


@register_module
class NOAAAPTDemodModule(FMDemodModule):
    id = "noaa_apt_demod"


@register_module
class AMDemodModule(FMDemodModule):
    """AM envelope -> WAV (ref plugins/analog_support/generic/
    analog_am_demod.cpp: AGC -> resample -> carrier PLL -> |x|; the
    envelope is carrier-phase invariant, so the feedforward chain here is
    AGC -> resample -> |x| -> DC block, device-resident)."""

    id = "am_demod"

    def _build(self):
        super()._build()  # reuse rate/resampler setup, then swap the step
        self.compute_rates()
        audio_rate = self.d_symbolrate
        interp, decim = resamp.make_rational(self.final_samplerate, audio_rate)
        proto = resamp.design_resampler_taps(interp, decim)
        r_bank = firdes.polyphase_bank(proto, interp)
        out_n = self.block_size * interp // decim
        agc_rate = self.d_agc_rate

        def step(state, x):
            agc_st, rs_st, dc_st = state
            agc_st, x = stages.agc_block(agc_st, x, rate=agc_rate)
            rs_st, x, _ = resamp.rational_resampler(rs_st, x, r_bank, interp,
                                                    decim, out_cap=out_n)
            env = jnp.abs(x).astype(jnp.complex64)
            dc_st, env = stages.dc_block(dc_st, env, alpha=1e-3)
            y = jnp.clip(jnp.real(env), -1.0, 1.0)
            return (agc_st, rs_st, dc_st), y

        self._step = jax.jit(step, donate_argnums=0)
        self._state = (
            stages.agc_init(),
            resamp.rational_resampler_init(interp, r_bank.shape[1]),
            stages.dc_block_init(),
        )


@register_module
class SSBDemodModule(FMDemodModule):
    """SSB (USB/LSB) -> WAV (ref analog_ssb_demod.cpp: resample -> shift
    by -+bw/2 -> band filter -> Re). parameter `sideband`: usb|lsb."""

    id = "ssb_demod"

    def _build(self):
        super()._build()
        self.compute_rates()
        audio_rate = self.d_symbolrate
        interp, decim = resamp.make_rational(self.final_samplerate, audio_rate)
        proto = resamp.design_resampler_taps(interp, decim)
        r_bank = firdes.polyphase_bank(proto, interp)
        out_n = self.block_size * interp // decim
        agc_rate = self.d_agc_rate
        sideband = str(self.param("sideband", "usb")).lower()
        sign = -1.0 if sideband == "usb" else 1.0
        # shift the wanted sideband's center down to baseband audio
        phase_delta = sign * np.pi * 0.5  # bw/2 = audio_rate/4 at audio rate

        def step(state, x):
            agc_st, rs_st, fs_st = state
            agc_st, x = stages.agc_block(agc_st, x, rate=agc_rate)
            rs_st, x, _ = resamp.rational_resampler(rs_st, x, r_bank, interp,
                                                    decim, out_cap=out_n)
            fs_st, x = stages.freq_shift(fs_st, x, phase_delta)
            y = jnp.clip(jnp.real(x), -1.0, 1.0)
            return (agc_st, rs_st, fs_st), y

        self._step = jax.jit(step, donate_argnums=0)
        self._state = (
            stages.agc_init(),
            resamp.rational_resampler_init(interp, r_bank.shape[1]),
            stages.freq_shift_init(),
        )
