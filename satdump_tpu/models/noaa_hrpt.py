"""NOAA POES HRPT chain: .soft (PM demod) -> minor frames -> AVHRR products.

Reference: plugins/noaa_metop_support/noaa/ — NOAADeframer (60-bit minor
frame sync 0x0A116FD719D83C95, 11090 10-bit words, noaa_deframer.cpp),
module_noaa_hrpt_decoder (soft bits -> uint16 word frames) and
module_noaa_instruments (AVHRR at word 750, timestamp words 8-11,
avhrr_reader.cpp work_noaa). Deframing is correlate-everywhere + batched
10-bit repack instead of the reference's per-bit state machine."""

from __future__ import annotations

import calendar
from pathlib import Path
from typing import List

import numpy as np

from satdump_tpu.core.log import logger
from satdump_tpu.models.metop import AVHRR_WAVENUMBERS
from satdump_tpu.ops.fec.deframer import correlate_bits
from satdump_tpu.pipeline.module import ProcessingModule, register_module
from satdump_tpu.products.image_product import ImageProduct
from satdump_tpu.products.product import DataSet

HRPT_SYNC = 0x0A116FD719D83C95
SYNC_BITS = 60
FRAME_WORDS = 11090
FRAME_BITS = FRAME_WORDS * 10
SYNC_WORDS = (0x0284, 0x016F, 0x035C, 0x019D, 0x020F, 0x0095)


def _sync_pattern() -> np.ndarray:
    return ((HRPT_SYNC >> np.arange(SYNC_BITS - 1, -1, -1)) & 1
            ).astype(np.uint8)


class NOAADeframer:
    """Hard-bit HRPT minor-frame deframer, streaming."""

    def __init__(self, threshold: int = 4):
        self.threshold = threshold
        self.pattern = _sync_pattern()
        self._tail = np.zeros(0, np.uint8)
        self.frames = 0

    def work(self, bits: np.ndarray) -> List[np.ndarray]:
        stream = np.concatenate([self._tail, np.asarray(bits, np.uint8)])
        if len(stream) < SYNC_BITS:
            self._tail = stream
            return []
        dist = correlate_bits(stream, self.pattern)
        hits = np.flatnonzero(dist <= self.threshold)
        out: List[np.ndarray] = []
        pos = 0
        for h in hits:
            if h < pos:
                continue
            if h + FRAME_BITS <= len(stream):
                fb = stream[h: h + FRAME_BITS]
                words = (fb.reshape(FRAME_WORDS, 10)
                         << np.arange(9, -1, -1)).sum(axis=1
                                                      ).astype(np.uint16)
                words[:6] = SYNC_WORDS   # nominal sync (ref enter_synced)
                out.append(words)
                pos = h + FRAME_BITS
            else:
                pos = max(pos, h)
                break
        keep = len(stream) - pos
        keep = min(keep, FRAME_BITS + SYNC_BITS)
        self._tail = stream[len(stream) - keep:]
        self.frames += len(out)
        return out


@register_module
class NOAAHRPTDecoderModule(ProcessingModule):
    """soft -> .frm of 11090 uint16 words per minor frame
    (ref module_noaa_hrpt_decoder.cpp)."""

    id = "noaa_hrpt_decoder"

    def __init__(self, input_file, output_file_hint, parameters):
        super().__init__(input_file, output_file_hint, parameters)
        self.threshold = int(self.param("deframer_thresold", 10))
        self.block = int(self.param("buffer_size", 0) or (1 << 22))

    def process(self):
        out_path = self.d_output_file_hint + ".frm"
        self.d_output_file = out_path
        deframer = NOAADeframer(self.threshold)
        soft = np.fromfile(self.d_input_file, np.int8)
        n = 0
        with open(out_path, "wb") as f:
            for off in range(0, len(soft), self.block):
                bits = (soft[off: off + self.block] > 0).astype(np.uint8)
                for words in deframer.work(bits):
                    f.write(words.astype("<u2").tobytes())
                    n += 1
        self.stats = {"frames": n}
        logger.info(f"NOAA HRPT: {n} minor frames")


class AVHRRReaderHRPT:
    """AVHRR lines from HRPT/GAC minor frames (avhrr_reader.cpp
    work_noaa/line2image)."""

    WIDTH = 2048

    def __init__(self, gac_mode: bool = False, year: int = 2021):
        self.pos = 1182 if gac_mode else 750
        self.width = 409 if gac_mode else 2048
        self.year = year
        self._lines: List[np.ndarray] = []
        self._ch3a: List[bool] = []
        self.timestamps: List[float] = []

    @property
    def lines(self) -> int:
        return len(self._lines)

    def work_noaa(self, words: np.ndarray) -> None:
        words = np.asarray(words, np.uint16)
        day_of_year = int(words[8]) >> 1
        ms = ((int(words[9]) & 0x7F) << 20) | (int(words[10]) << 10) \
            | int(words[11])
        base = calendar.timegm((self.year, 1, 1, 0, 0, 0))
        self.timestamps.append(base + (day_of_year - 1) * 86400.0
                               + ms / 1000.0)
        img = words[self.pos: self.pos + self.width * 5]
        if len(img) < self.width * 5:
            return
        self._lines.append(img.reshape(self.width, 5).astype(np.uint16))
        self._ch3a.append(bool(int(words[6]) & 1))

    def channels(self) -> List[np.ndarray]:
        n = len(self._lines)
        chans = [np.zeros((n, self.width), np.uint16) for _ in range(6)]
        if n == 0:
            return chans
        img = np.stack(self._lines) << 6
        ch3a = np.asarray(self._ch3a)
        for slot in range(5):
            out_a = slot + (1 if slot > 2 else 0)
            out_b = slot + (1 if slot > 1 else 0)
            if out_a == out_b:
                chans[out_a] = img[:, :, slot]
            else:
                chans[out_a][ch3a] = img[ch3a, :, slot]
                chans[out_b][~ch3a] = img[~ch3a, :, slot]
        return chans


@register_module
class NOAAInstrumentsDecoderModule(ProcessingModule):
    """HRPT minor frames -> AVHRR ImageProduct + DataSet
    (ref module_noaa_instruments.cpp, AVHRR arm)."""

    id = "noaa_instruments"

    def __init__(self, input_file, output_file_hint, parameters):
        super().__init__(input_file, output_file_hint, parameters)
        self.gac = bool(self.param("gac_mode", False))
        self.year = int(self.param("year_override", 2021))
        self.sat_name = str(self.param("satellite", "NOAA"))

    def process(self):
        reader = AVHRRReaderHRPT(self.gac, self.year)
        raw = np.fromfile(self.d_input_file, "<u2")
        nfr = len(raw) // FRAME_WORDS
        for i in range(nfr):
            reader.work_noaa(raw[i * FRAME_WORDS:(i + 1) * FRAME_WORDS])
        logger.info(f"NOAA instruments: AVHRR lines {reader.lines}")

        out_dir = Path(self.d_output_file_hint).parent
        ds = DataSet(self.sat_name, float(np.median(reader.timestamps))
                     if reader.timestamps else -1.0)
        if reader.lines:
            p = ImageProduct()
            p.instrument_name = "avhrr_3"
            names = ["1", "2", "3a", "3b", "4", "5"]
            for i, ch in enumerate(reader.channels()):
                p.add_channel(ch, names[i], bit_depth=16,
                              wavenumber=AVHRR_WAVENUMBERS[i])
            calib = self.param("avhrr_calib")
            if calib:
                p.set_calibration("noaa_avhrr3", dict(calib))
            p.save(str(out_dir / "AVHRR"))
            ds.products_list.append("AVHRR")
        self.d_output_file = ds.save(str(out_dir))
        self.stats = {"avhrr_lines": reader.lines}
