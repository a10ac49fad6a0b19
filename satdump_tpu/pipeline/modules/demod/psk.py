"""PSK demodulator module: baseband -> .soft int8 symbols.

Reference: src-core/pipeline/modules/demod/module_psk_demod.cpp. Same chain:
[freq_shift] -> [dc] -> [resample] -> AGC -> RRC -> [carrier PLL] -> Costas
(order 2/4/8) -> [post-Costas DC] -> [OQPSK delay] -> M&M clock recovery ->
int8 quantize (x50 real-only for BPSK, x100 interleaved IQ otherwise,
module_psk_demod.cpp:196-213). The whole per-block chain is one jitted pure
function with carried loop state; block shapes are fixed so it compiles once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from satdump_tpu.core.exceptions import PipelineError
from satdump_tpu.core.log import logger
from satdump_tpu.ops import clock_recovery, costas, ffsync, fir, firdes, resamp, stages
from satdump_tpu.pipeline.module import register_module
from satdump_tpu.pipeline.modules.demod.base import BaseDemodModule
from satdump_tpu.utils import xfer

_ORDER = {"bpsk": 2, "qpsk": 4, "oqpsk": 4, "8psk": 8}


@register_module
class PSKDemodModule(BaseDemodModule):
    id = "psk_demod"

    def __init__(self, input_file, output_file_hint, parameters):
        super().__init__(input_file, output_file_hint, parameters)
        self.constellation = str(self.param("constellation", required=True))
        if self.constellation not in _ORDER:
            raise PipelineError(f"unknown constellation {self.constellation}")
        self.rrc_alpha = float(self.param("rrc_alpha", required=True))
        self.rrc_taps = int(self.param("rrc_taps", 31))
        self.loop_bw = float(self.param("pll_bw", required=True))
        self.post_costas_dc = bool(self.param("post_costas_dc", False))
        clock_alpha = float(self.param("clock_alpha", 8.7e-3))
        self.clock_gain_omega = float(self.param("clock_gain_omega", clock_alpha ** 2 / 4.0))
        self.clock_mu = float(self.param("clock_mu", 0.5))
        self.clock_gain_mu = float(self.param("clock_gain_mu", clock_alpha))
        self.clock_omega_limit = float(self.param("clock_omega_relative_limit", 0.005))
        self.is_bpsk = self.constellation == "bpsk"
        self.is_oqpsk = self.constellation == "oqpsk"
        if self.is_oqpsk:
            self.MIN_SPS, self.MAX_SPS = 1.6, 2.4
        self.block_base = int(self.param("buffer_size", 0) or (1 << 18))
        # `fast` selects the feedforward sync chain (ops/ffsync.py) — no
        # per-sample recurrences; the TPU throughput path and the DEFAULT.
        # `fast: false` opts into the classic per-sample Costas/M&M scan
        # chain (reference-parity loops) — runs on every backend incl. TPU
        # (SMOKE_r05) but as a sequential scan it is orders of magnitude
        # slower there; a speed warning is logged.
        self.fast = bool(self.param("fast", True))
        # `multichip: true` shards consecutive time-blocks of the stream
        # over the device mesh (parallel/timeshard.py — halo exchange +
        # seam phase stitching over ICI); requires fast + >1 device.
        self.multichip = bool(self.param("multichip", False))
        # Doppler pre-correction (ref module_demod_base.h doppler option +
        # doppler_correct.h): a provider fn(sample_pos, n) -> Hz array set
        # by the live/autotrack layer (tracking predictions), mixed out
        # on-device before the sync chain.
        self.doppler_provider = None

    # -- multichip: time-sharded demod over the device mesh ------------------
    def _build_multichip(self) -> bool:
        import jax
        if not self.fast or jax.device_count() < 2 or self.resample \
                or self.d_frequency_shift or self.is_bpsk:
            return False
        from satdump_tpu.parallel import make_mesh
        self._mesh = make_mesh(n_ch=1)
        self._n_t = self._mesh.shape["t"]
        return True

    def _process_multichip(self):
        from satdump_tpu.parallel import build_sharded_qpsk_step, shard_input
        out_path = self.d_output_file_hint + ".soft"
        self.d_output_file = out_path
        from satdump_tpu.io.baseband import read_baseband
        data, _ = read_baseband(self.d_input_file, self.d_format)
        # one sharded step over the whole recording: seam phase-stitching
        # collectives keep every shard's rotation consistent with shard 0,
        # so the emitted soft stream is globally coherent (timeshard.py).
        # +64 sample margin: the polyphase interpolator cannot emit symbols
        # within ntaps/2 of the final sample, so a recording whose length
        # divides exactly into shards would lose its last ~ntaps/2/sps
        # symbols (and with them the final frame) without trailing zeros.
        block = -(-(len(data) + 64) // (self._n_t * 4096)) * 4096
        halo = min(8192, block // 4)
        step = build_sharded_qpsk_step(
            self._mesh, sps=self.final_sps, block=block, halo=halo,
            rrc_alpha=self.rrc_alpha, rrc_ntaps=self.rrc_taps,
            order=_ORDER[self.constellation])
        super_n = self._n_t * block
        logger.info(f"multichip: mesh(t={self._n_t}), shard block {block}, "
                    f"halo {halo}")
        chunk = np.concatenate(
            [data, np.zeros(super_n - len(data), np.complex64)]) \
            if len(data) < super_n else data[:super_n]
        soft, valid, _bits = step(shard_input(
            chunk.reshape(1, super_n), self._mesh))
        soft = np.asarray(soft)            # (t, 1, cap*2) int8
        valid = np.asarray(valid)          # (t, 1, cap)
        nsyms = 0
        with open(out_path, "wb") as f:
            for t in range(self._n_t):
                s = soft[t, 0].reshape(-1, 2)[valid[t, 0]]
                f.write(s.astype(np.int8).tobytes())
                nsyms += len(s)
        self.stats = {"symbols": nsyms, "mesh_t": self._n_t}
        logger.info(f"multichip demodulated {nsyms} symbols "
                    f"over {self._n_t} t-shards")

    # -- the jitted per-block chain -----------------------------------------
    def _build(self):
        self.compute_rates()
        self.block_size = self.choose_block_size(self.block_base)
        order = _ORDER[self.constellation]
        rrc = firdes.root_raised_cosine(
            1.0, self.final_samplerate, self.d_symbolrate, self.rrc_alpha, self.rrc_taps)
        self.rrc_ntaps = len(rrc)
        taps = rrc  # host np: device consts break axon lowering
        bank = firdes.mm_interpolator_bank()
        sps = self.final_sps
        do_shift = self.d_frequency_shift != 0
        shift_delta = 2 * np.pi * self.d_frequency_shift / self.d_samplerate
        do_resample = self.resample
        if do_resample:
            interp, decim = resamp.make_rational(self.d_samplerate, self.final_samplerate)
            r_proto = resamp.design_resampler_taps(interp, decim)
            r_bank = firdes.polyphase_bank(r_proto, interp)
            r_ntaps = r_bank.shape[1]
            out_n = self.block_size * interp // decim
        else:
            interp = decim = 1
            r_bank = None
            out_n = self.block_size
        agc_rate = self.d_agc_rate
        loop_bw = self.loop_bw
        dc_block = self.d_dc_block
        post_dc = self.post_costas_dc
        is_oqpsk = self.is_oqpsk
        gain_omega, gain_mu = self.clock_gain_omega, self.clock_gain_mu
        omega_limit = self.clock_omega_limit
        mm_out_cap = int(np.ceil(out_n / (sps * (1 - omega_limit)))) + 2

        if not self.fast and ffsync._on_tpu():
            # r3 believed costas_scan could not lower on the TPU backend;
            # r5's tpu_smoke traced that to EAGER dispatch poisoning the
            # tunnel — the fully-jitted classic chain compiles and runs
            # (SMOKE_r05). It remains a sequential per-sample scan, so
            # warn about speed but honor the user's choice.
            logger.warning(
                "classic per-sample demod chain (fast=false) runs as a "
                "sequential scan on TPU — expect orders of magnitude below "
                "the feedforward fast path")
        if self.fast:
            order = _ORDER[self.constellation]
            is_oqpsk = self.is_oqpsk
            ff_cap = int(np.ceil(out_n / (sps * 0.99))) + 2
            do_doppler = self.doppler_provider is not None
            in_rate = self.d_samplerate

            def fast_step(state, x, dop):
                fs_st, dc_st, rs_st, ff_st, dp_st = state
                if do_doppler:
                    dp_st, x = stages.doppler_correct(dp_st, x, dop, in_rate)
                if do_shift:
                    fs_st, x = stages.freq_shift(fs_st, x, shift_delta)
                if dc_block:
                    dc_st, x = stages.dc_block(dc_st, x, alpha=1e-4)
                if do_resample:
                    rs_st, x, _valid = resamp.rational_resampler(
                        rs_st, x, r_bank, interp, decim, out_cap=out_n)
                ff_st, syms, valid, snr = ffsync.ff_psk_demod_block(
                    ff_st, x, order=order, sps=sps, rrc_taps=taps, bank=bank,
                    out_cap=ff_cap, oqpsk=is_oqpsk)
                return (fs_st, dc_st, rs_st, ff_st, dp_st), syms, valid, snr

            jitted = jax.jit(fast_step, donate_argnums=0)
            self._step = lambda st, x: jitted(st, x, self._doppler_block())
            self._state = (
                stages.freq_shift_init(),
                stages.dc_block_init(),
                resamp.rational_resampler_init(interp, r_bank.shape[1] if do_resample else 8),
                ffsync.ff_clock_init(rrc_ntaps=self.rrc_ntaps),
                stages.freq_shift_init(),
            )
            self._sample_pos = 0
            return

        def step(state, x):
            (fs_st, dc_st, rs_st, agc_st, fir_st, cs_st, pdc_st, dly_st, mm_st) = state
            if do_shift:
                fs_st, x = stages.freq_shift(fs_st, x, shift_delta)
            if dc_block:
                dc_st, x = stages.dc_block(dc_st, x, alpha=1e-4)
            if do_resample:
                rs_st, x, _valid = resamp.rational_resampler(
                    rs_st, x, r_bank, interp, decim, out_cap=out_n)
            agc_st, x = stages.agc_scan(agc_st, x, rate=agc_rate)
            fir_st, x = fir.fir_apply(fir_st, x, taps)
            cs_st, x = costas.costas_scan(cs_st, x, loop_bw, order)
            if post_dc:
                pdc_st, x = stages.dc_block(pdc_st, x, alpha=1e-4)
            if is_oqpsk:
                dly_st, x = stages.delay_one_imag(dly_st, x)
            mm_st, syms, valid = clock_recovery.mm_clock_recovery(
                mm_st, x, omega_mid=sps, gain_omega=gain_omega, gain_mu=gain_mu,
                omega_relative_limit=omega_limit, bank=bank, out_cap=mm_out_cap)
            snr = stages.snr_m2m4(jnp.where(valid, syms, 0))
            state = (fs_st, dc_st, rs_st, agc_st, fir_st, cs_st, pdc_st, dly_st, mm_st)
            return state, syms, valid, snr

        self._step = jax.jit(step, donate_argnums=0)
        self._state = (
            stages.freq_shift_init(),
            stages.dc_block_init(),
            resamp.rational_resampler_init(interp, r_bank.shape[1] if do_resample else 8),
            stages.agc_init(),
            fir.fir_init(self.rrc_ntaps),
            costas.costas_init(),
            stages.dc_block_init(),
            stages.delay_one_imag_init(),
            clock_recovery.mm_init(omega=sps, mu=self.clock_mu),
        )

    def _doppler_block(self):
        """Per-block predicted Doppler (Hz) from the provider, advancing the
        absolute sample position; scalar 0 when Doppler is off."""
        if self.doppler_provider is None:
            return np.float32(0.0)
        pos = getattr(self, "_sample_pos", 0)
        dop = np.asarray(self.doppler_provider(pos, self.block_size),
                         np.float32)
        self._sample_pos = pos + self.block_size
        return dop

    # -- streaming interface (shared by the offline and live runners) -------
    def stream_start(self) -> None:
        self._build()
        self._nsyms = 0
        self._peak_snr = -100.0
        self._snr = -100.0
        logger.info(f"Constellation: {self.constellation}; samplerate "
                    f"{self.d_samplerate} -> {self.final_samplerate} "
                    f"(sps {self.final_sps:.2f}); block {self.block_size}")

    def stream_work(self, samples: np.ndarray, valid: int | None = None,
                    last: bool = False) -> np.ndarray:
        """One fixed-size complex64 block (pad the tail with zeros) ->
        int8 soft symbols."""
        self._state, syms, vmask, snr = self._step(self._state,
                                                   xfer.put(samples))
        s = xfer.get(syms)[xfer.get(vmask)]
        if last and valid is not None and valid < self.block_size:
            # padded tail: drop symbols sourced from the zero padding
            keep = int(len(s) * valid / self.block_size) + 2
            s = s[:min(keep, len(s))]
        self._snr = float(snr)
        self._peak_snr = max(self._peak_snr, self._snr)
        if self.is_bpsk:
            out = xfer.get(stages.bpsk_soft(xfer.put(s.real), 50.0))
        else:
            out = np.empty(2 * len(s), np.int8)
            out[0::2] = np.clip(s.real * 100.0, -127, 127).astype(np.int8)
            out[1::2] = np.clip(s.imag * 100.0, -127, 127).astype(np.int8)
        self._nsyms += len(s)
        self.stats = {"snr": self._snr, "peak_snr": self._peak_snr,
                      "symbols": self._nsyms}
        return out

    def process(self):
        if self.multichip:
            self.compute_rates()
            self.block_size = self.choose_block_size(self.block_base)
            if self._build_multichip():
                return self._process_multichip()
            logger.warning("multichip requested but unavailable "
                           "(need fast + >1 device + no resample); "
                           "falling back to single-device path")
        self.stream_start()
        out_path = self.d_output_file_hint + ".soft"
        self.d_output_file = out_path
        reader = self.open_input(self.block_size)
        with open(out_path, "wb") as f:
            for blk in reader.blocks():
                out = self.stream_work(blk.samples, valid=blk.valid,
                                       last=blk.last)
                f.write(out.tobytes())
        logger.info(f"Demodulated {self._nsyms} symbols, "
                    f"SNR {self._snr:.1f} dB")
