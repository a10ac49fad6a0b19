"""VFO splitter/channelizer: one wideband stream -> N narrowband DDCs.

Reference: common/dsp/path/splitter_vfo.h (the recorder/autotrack per-VFO
DDC: copy + freq shift + resample per VFO, each on its own thread). TPU
form: each VFO is a jitted freq-shift + decimating low-pass chain with
carried state; all VFOs run batched per block from the same host loop."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from satdump_tpu.ops import fir, firdes, stages


@dataclass
class VFO:
    name: str
    freq_offset: float        # Hz from stream center
    decim: int
    state: tuple


class VFOChannelizer:
    def __init__(self, samplerate: float, block_size: int = 1 << 18):
        self.samplerate = samplerate
        self.block_size = block_size
        self.vfos: Dict[str, VFO] = {}
        self._steps: Dict[str, callable] = {}

    def add_vfo(self, name: str, freq_offset: float, out_samplerate: float
                ) -> float:
        """Add a DDC; out rate is samplerate/decim for the nearest integer
        decimation. Returns the actual output samplerate."""
        decim = max(int(round(self.samplerate / out_samplerate)), 1)
        if self.block_size % decim:
            # keep static shapes: snap decim to a divisor of the block
            while self.block_size % decim:
                decim -= 1
        actual = self.samplerate / decim
        taps = firdes.low_pass(1.0, self.samplerate, actual * 0.4,
                               actual * 0.2)
        delta = 2 * np.pi * freq_offset / self.samplerate

        def step(state, x):
            fs_st, fir_st = state
            fs_st, x = stages.freq_shift(fs_st, x, -delta)
            fir_st, y = fir.decimating_fir_apply(fir_st, x, taps, decim)
            return (fs_st, fir_st), y

        self._steps[name] = jax.jit(step, donate_argnums=0)
        self.vfos[name] = VFO(name, freq_offset, decim,
                              (stages.freq_shift_init(),
                               fir.fir_init(len(taps))))
        return actual

    def del_vfo(self, name: str) -> None:
        self.vfos.pop(name, None)
        self._steps.pop(name, None)

    def work(self, x: np.ndarray) -> Dict[str, np.ndarray]:
        """One block (block_size samples) -> per-VFO decimated baseband."""
        from satdump_tpu.utils import xfer
        xd = xfer.put(np.asarray(x, np.complex64))
        out = {}
        for name, vfo in self.vfos.items():
            vfo.state, y = self._steps[name](vfo.state, xd)
            out[name] = xfer.get(y)
        return out
