"""FengYun-3 instruments: VIRR (FY-3A/B/C AHRPT) + MERSI-2 groundwork.

Behavioral equivalent of plugins/fengyun3_support/fengyun3/:
* VIRR (instruments/virr/virr_reader.cpp): 208400-bit frames behind a
  60-bit sync on VCID 5; 10 pixel-interleaved 10-bit channels x 2048 px
  starting at byte 436; timestamp words at byte 26041 (6-bit packing).
* fy3_instruments module (module_fy3_instruments.cpp): CADU -> per-VCID
  deframers -> readers -> products.
"""

from __future__ import annotations

from pathlib import Path
from typing import List

import numpy as np

from satdump_tpu.ccsds import Demuxer, parse_vcdu
from satdump_tpu.core.log import logger
from satdump_tpu.ops.fec.codings_misc import SimpleDeframer
from satdump_tpu.pipeline.module import ProcessingModule, register_module
from satdump_tpu.products.image_product import ImageProduct
from satdump_tpu.products.product import DataSet
from satdump_tpu.utils.repack import repack_10bit, repack_12bit

VIRR_SYNC = 0b101000010001011011111101011100011001110110000011110010010101
VIRR_SYNC_BITS = 60
VIRR_FRAME_BITS = 208400


class VIRRReader:
    """virr_reader.cpp: 10 channels x 2048 px per frame, 10-bit
    pixel-interleaved at byte 436; day/ms timestamp at byte 26041."""

    def __init__(self, day_offset: int = 0):
        self.lines = 0
        self.day_offset = day_offset
        self._rows: List[np.ndarray] = []
        self.timestamps: List[float] = []

    def work(self, frame: np.ndarray) -> None:
        frame = np.asarray(frame, np.uint8)
        if len(frame) < 26049:
            return
        words = repack_10bit(frame[436: 436 + 25600])[:20480]
        img = words.reshape(2048, 10).T.astype(np.uint16) * 64
        self._rows.append(np.minimum(img, 65535).astype(np.uint16))
        self.lines += 1
        # timestamp: 6-bit-packed bytes at 26041 (virr_reader.cpp:47-60)
        t = np.zeros(8, np.uint16)
        p = frame.astype(np.uint16)
        for k, off in zip((0, 1, 2, 3, 4, 6, 7), range(7)):
            t[k] = ((p[26041 + off] & 0b111111) << 2
                    | p[26042 + off] >> 6) & 0xFF
        days = (int(t[1]) & 0b11) << 10 | int(t[2]) << 2 | int(t[3]) >> 6
        ms = (int(t[3]) & 0b11) << 24 | int(t[4]) << 16 \
            | int(t[6]) << 8 | int(t[7])
        self.timestamps.append((self.day_offset + days) * 86400.0
                               + ms / 1000.0 + 12 * 3600)

    def get_channel(self, ch: int) -> np.ndarray:
        if not self._rows:
            return np.zeros((0, 2048), np.uint16)
        return np.stack([r[ch] for r in self._rows])


class MERSIReader:
    """MERSI multispectral imager (instruments/mersi/mersi_reader.{h,cpp}):
    a raw bit stream with two sync patterns — a 48-bit head marker
    (0x55aa55aa55aa, calibration/timestamp frame) and a 28-bit scan marker
    — followed by variable-size frames (the 10-bit line marker decides
    250 m vs 1000 m scan size). The reference walks bit-by-bit; here sync
    positions are found with one correlation pass and frames are walked
    host-side at frame rate.

    Variant geometry via constructor args; MERSI-2 defaults."""

    HEAD_SYNC = 0x55AA55AA55AA
    HEAD_BITS = 48
    SCAN_SYNC = 0b0111111111111000000000000100
    SCAN_BITS = 28

    def __init__(self, ch_cnt_250=6, ch_cnt_1000=19, ch250_width=8192,
                 frame_head_size=1329256, frame_scan_250_size=98856,
                 frame_scan_1000_size=25128, imagery_offset_bytes=59,
                 imagery_offset_bits=6, ms_scale=1e3):
        self.c250 = ch_cnt_250
        self.c1000 = ch_cnt_1000
        self.w250 = ch250_width
        self.w1000 = ch250_width // 4
        self.head_size = frame_head_size
        self.scan250_size = frame_scan_250_size
        self.scan1000_size = frame_scan_1000_size
        self.img_off_bytes = imagery_offset_bytes
        self.img_off_bits = imagery_offset_bits
        self.ms_scale = ms_scale
        self.counter_250_end = ch_cnt_250 * 40
        self.counter_max = self.counter_250_end + ch_cnt_1000 * 10
        self.segments = -1
        self.timestamps: List[float] = []
        self.last_timestamp = -1.0
        self._blk250: List[np.ndarray] = []   # (c250, 40, w250) per segment
        self._blk1000: List[np.ndarray] = []

    @staticmethod
    def _sync_positions(bits: np.ndarray, sync: int, nbits: int
                        ) -> np.ndarray:
        pat = np.array([(sync >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                       np.int8)
        if len(bits) < nbits:
            return np.zeros(0, np.int64)
        x = bits.astype(np.int8) * 2 - 1
        p = pat * 2 - 1
        corr = np.correlate(x, p, "valid")
        return np.flatnonzero(corr == nbits)

    def _new_segment(self) -> None:
        self.segments += 1
        self._blk250.append(np.zeros((self.c250, 40, self.w250), np.uint16))
        self._blk1000.append(np.zeros((self.c1000, 10, self.w1000),
                                      np.uint16))
        self.timestamps.append(self.last_timestamp)

    def _process_head(self, fbytes: np.ndarray) -> None:
        f = fbytes.astype(np.uint16)
        if len(f) < 21:
            return
        t = np.zeros(8, np.uint16)
        t[0] = (f[12] & 0xF) << 4 | f[13] >> 4
        t[1] = (f[13] & 0xF) << 4 | f[11] >> 4
        t[2] = (f[11] & 0xF) << 4 | f[12] >> 4
        t[3] = (f[9] & 0xF) << 4 | f[10] >> 4
        t[4] = (f[10] & 0xF) << 4 | f[8] >> 4
        t[5] = (f[8] & 0xF) << 4 | f[9] >> 4
        days = int(t[0]) << 8 | int(t[1])
        ms = int(t[2]) << 24 | int(t[3]) << 16 | int(t[4]) << 8 | int(t[5])
        sub = (int(f[19]) & 0xF) << 8 | int(f[17])
        self.last_timestamp = ((10957 + days) * 86400.0 + ms / self.ms_scale
                               + sub / 3950.0 + 12 * 3600)

    def _process_scan(self, fbytes: np.ndarray) -> None:
        if len(fbytes) < 2:
            return
        marker = int(fbytes[0]) << 2 | int(fbytes[1]) >> 6
        if marker >= self.counter_max:
            return
        if marker == 0:
            self._new_segment()
        if self.segments < 0:
            self._new_segment()
        # imagery starts at (img_off_bytes bytes + img_off_bits bits)
        body = fbytes[self.img_off_bytes:]
        sh = self.img_off_bits
        shifted = ((body[:-1].astype(np.uint16) << sh)
                   | (body[1:].astype(np.uint16) >> (8 - sh))
                   ).astype(np.uint8)
        if marker < self.counter_250_end:
            ch, line = marker // 40, marker % 40
            need = self.w250 * 12 // 8
            words = repack_12bit(shifted[:need])[: self.w250]
            self._blk250[-1][ch, line, : len(words)] = \
                words.astype(np.uint16) << 4
        else:
            m = marker - self.counter_250_end
            ch, line = m // 10, m % 10
            need = self.w1000 * 12 // 8
            words = repack_12bit(shifted[:need])[: self.w1000]
            self._blk1000[-1][ch, line, : len(words)] = \
                words.astype(np.uint16) << 4

    def work(self, data: np.ndarray) -> None:
        """Process a raw byte stream in one pass (whole-pass oriented)."""
        bits = np.unpackbits(np.asarray(data, np.uint8))
        heads = self._sync_positions(bits, self.HEAD_SYNC, self.HEAD_BITS)
        scans = self._sync_positions(bits, self.SCAN_SYNC, self.SCAN_BITS)
        events = sorted([(p + self.HEAD_BITS, True) for p in heads]
                        + [(p + self.SCAN_BITS, False) for p in scans])
        for i, (start, is_head) in enumerate(events):
            limit = events[i + 1][0] - (self.HEAD_BITS if i + 1 < len(events)
                                        and events[i + 1][1]
                                        else self.SCAN_BITS) \
                if i + 1 < len(events) else len(bits)
            if is_head:
                size = self.head_size
            else:
                # marker (first 10 bits) decides the frame size
                if start + 10 > len(bits):
                    break
                mk = int(np.packbits(bits[start:start + 8])[0]) << 2 \
                    | int(np.packbits(bits[start + 8:start + 16])[0]) >> 6 \
                    if start + 16 <= len(bits) else 0
                size = self.scan250_size if mk < self.counter_250_end \
                    else self.scan1000_size
            end = min(start + size, max(limit, start))
            chunk = bits[start: end]
            if len(chunk) < size:
                chunk = np.concatenate(
                    [chunk, np.zeros(size - len(chunk), np.uint8)])
            fbytes = np.packbits(chunk)
            if is_head:
                self._process_head(fbytes)
            else:
                self._process_scan(fbytes)

    @property
    def lines(self) -> int:
        return (self.segments + 1) * 40 if self.segments >= 0 else 0

    def get_channel(self, ch: int) -> np.ndarray:
        if self.segments < 0:
            return np.zeros((0, self.w250), np.uint16)
        if ch < self.c250:
            return np.concatenate([b[ch] for b in self._blk250])
        return np.concatenate([b[ch - self.c250] for b in self._blk1000])


class MERSI2Reader(MERSIReader):
    pass


class MWHS2Reader:
    """MWHS-2 microwave humidity sounder, 15 channels x 98 px/scan
    (instruments/mwhs2/mwhs2_reader.cpp). Each scan arrives as four
    CCSDS packets on APID 16 distinguished by a 2-bit marker at payload
    byte 35 (bits 3:2); markers 0/1/2 carry four channels each and
    marker 3 the last three. Scans are keyed by the packet timestamp of
    the marker-0 packet (FY-3E uses 0.1 ms units)."""

    CHANNELS = 15
    WIDTH = 98

    def __init__(self, fy3e_mode: bool = False):
        self.fy3e_mode = fy3e_mode
        self.lines = 0
        self._scans: dict = {}
        self._last_time = 0.0
        self.timestamps: List[float] = []

    def work(self, pkt) -> None:
        pl = np.frombuffer(bytes(pkt.payload), np.uint8)
        if len(pl) < 1018:
            return
        from satdump_tpu.ccsds import parse_ccsds_time_full_raw
        scale = 10000 if self.fy3e_mode else 1000
        t = parse_ccsds_time_full_raw(
            pl, 10957 * 86400, scale,
            10000 if self.fy3e_mode else 1000000) + 12 * 3600
        marker = (int(pl[35]) >> 2) & 0b11
        if marker == 0 and t not in self._scans:
            self._scans[t] = np.zeros((self.CHANNELS, self.WIDTH), np.uint16)
            self.lines += 1
            self._last_time = t
        if marker >= 2:
            t = self._last_time
        row = self._scans.setdefault(
            t, np.zeros((self.CHANNELS, self.WIDTH), np.uint16))
        words = pl[50: 50 + 2 * 468].astype(np.uint16)
        words = (words[0::2] << 8) | words[1::2]          # BE u16
        ngrp = 3 if marker == 3 else 4
        for g in range(ngrp):
            row[marker * 4 + g] = words[106 * g: 106 * g + self.WIDTH]

    def get_channel(self, ch: int) -> np.ndarray:
        keys = sorted(self._scans)
        self.timestamps = list(keys)
        if not keys:
            return np.zeros((0, self.WIDTH), np.uint16)
        return np.stack([self._scans[k][ch] for k in keys])


class MWTS2Reader:
    """MWTS-2 microwave temperature sounder, 16 channels x 90 px/scan
    (instruments/mwts2/mwts2_reader.cpp). APID 7; a 3-bit marker in the
    top nibble of payload byte 0 sequences the scan: marker 1 opens a
    scan (calibration only), markers 2/3/4 each carry 30 earth pixels of
    all 16 channels, channel-interleaved as BE u16 words from byte 38."""

    CHANNELS = 16
    WIDTH = 90

    def __init__(self):
        self.lines = 0
        self._scans: dict = {}
        self._last_time = 0.0
        self.timestamps: List[float] = []

    def work(self, pkt) -> None:
        pl = np.frombuffer(bytes(pkt.payload), np.uint8)
        if len(pl) < 1018:
            return
        from satdump_tpu.ccsds import parse_ccsds_time_full_raw
        t = parse_ccsds_time_full_raw(pl[4:12], 10957 * 86400) + 12 * 3600
        marker = (int(pl[0]) >> 4) & 0b111
        if marker == 1 and t not in self._scans:
            self._scans[t] = np.zeros((self.CHANNELS, self.WIDTH), np.uint16)
            self.lines += 1
            self._last_time = t
        if marker >= 2:
            t = self._last_time
        if marker < 2 or marker > 4 or t not in self._scans:
            return
        row = self._scans[t]
        words = pl[38: 38 + 2 * 492].astype(np.uint16)
        words = (words[0::2] << 8) | words[1::2]
        block = words[: 30 * 16].reshape(30, 16)          # px-major
        row[:, 30 * (marker - 2): 30 * (marker - 1)] = block.T

    def get_channel(self, ch: int) -> np.ndarray:
        keys = sorted(self._scans)
        self.timestamps = list(keys)
        if not keys:
            return np.zeros((0, self.WIDTH), np.uint16)
        return np.stack([self._scans[k][ch] for k in keys])


def fengyun_diff_decode(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """FengYun QPSK differential decode (diff.cpp work2), vectorized:
    per symbol, (x^y) selects which rail-pair XOR lands in which output
    bit. Returns interleaved bits [b1, b0, b1, b0, ...]; the first symbol
    has no predecessor and is dropped."""
    x = np.asarray(x, np.uint8)
    y = np.asarray(y, np.uint8)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]
    xd = (x[1:] ^ x[:-1])
    yd = (y[1:] ^ y[:-1])
    cond = (x[1:] ^ y[1:]) == 1
    b1 = np.where(cond, yd, xd)
    b0 = np.where(cond, xd, yd)
    out = np.empty(2 * (n - 1), np.uint8)
    out[0::2], out[1::2] = b1, b0
    return out


@register_module
class FengyunAHRPTDecoderModule(ProcessingModule):
    """FY-3 AHRPT soft -> cadu (module_fengyun_ahrpt_decoder.cpp): the I
    and Q rails carry two INDEPENDENT k=7 r=1/2 streams, Viterbi-decoded
    separately, recombined by the FengYun differential decoder, then
    CCSDS deframe (1024 B) + derand + RS(223) x4. Branch order is
    ambiguous; both orders are tried and the one yielding frames wins."""

    id = "fengyun_ahrpt_decoder"

    def process(self):
        from satdump_tpu.ops.fec.deframer import CCSDSDeframer
        from satdump_tpu.ops.fec.randomization import derand_ccsds
        from satdump_tpu.ops.fec.reed_solomon import ReedSolomon
        from satdump_tpu.ops.fec.rotation import PHASE_0, PHASE_180
        from satdump_tpu.pipeline.modules.ccsds.viterbi_sync import \
            Viterbi12Sync

        out_path = self.d_output_file_hint + ".cadu"
        self.d_output_file = out_path
        soft = np.fromfile(self.d_input_file, np.int8)
        rails = [soft[0::2], soft[1::2]]
        bits = []
        bers = []
        for rail in rails:
            v = Viterbi12Sync(0.30, 10, phases=[PHASE_0, PHASE_180])
            bits.append(v.work(rail, last=True))
            bers.append(v.ber)
        rs = ReedSolomon(k=223)
        best = None
        for order in ((0, 1), (1, 0)):
            stream = fengyun_diff_decode(bits[order[0]], bits[order[1]])
            frames = CCSDSDeframer(1024 * 8).work(stream)
            if best is None or len(frames) > len(best):
                best = frames
        nframes = 0
        rs_avg = []
        with open(out_path, "wb") as f:
            if best:
                cadus = np.stack(best).astype(np.uint8)
                cadus[:, 4:] = derand_ccsds(cadus[:, 4:])
                corrected, errs = rs.decode_interleaved(
                    cadus[:, 4: 4 + 255 * 4], True, 4)
                cadus[:, 4: 4 + 255 * 4] = corrected
                rs_avg.append(errs.reshape(-1))
                f.write(cadus.tobytes())
                nframes = len(cadus)
        self.stats = {"frames": nframes,
                      "viterbi_ber": float(np.mean(bers)) if bers else 1.0,
                      "rs_avg": float(np.mean(np.concatenate(rs_avg)))
                      if rs_avg else 0.0}
        logger.info(f"FY-3 AHRPT: {nframes} CADUs")


@register_module
class FY3InstrumentsDecoderModule(ProcessingModule):
    """cadu -> FY-3 instrument products (module_fy3_instruments.cpp).
    VIRR (VCID 5, FY-3A/B/C), MERSI-2 (VCID 3, FY-3D), and the VCID-12
    CCSDS-compliant stream: MWHS-2 (APID 16) + MWTS-2 (APID 7)."""

    id = "fy3_instruments"

    def __init__(self, input_file, output_file_hint, parameters):
        super().__init__(input_file, output_file_hint, parameters)
        self.satellite = str(self.param("satellite", "fy3abc"))

    def process(self):
        virr_def = SimpleDeframer(VIRR_SYNC, VIRR_SYNC_BITS,
                                  VIRR_FRAME_BITS, 0)
        virr = VIRRReader()
        mersi = MERSI2Reader()
        mwhs2 = MWHS2Reader(fy3e_mode=self.satellite in ("fy3e", "fy3f"))
        mwts2 = MWTS2Reader()
        # VCID 12 is the CCSDS-compliant virtual channel on every FY-3
        # (module_fy3_instruments.cpp:119: Demuxer(882, true))
        dmx12 = Demuxer(882, True)
        mersi_zones: List[np.ndarray] = []
        data = np.fromfile(self.d_input_file, np.uint8)
        n = len(data) // 1024
        for i in range(n):
            cadu = data[i * 1024: (i + 1) * 1024]
            vcdu = parse_vcdu(bytes(cadu))
            if vcdu.vcid == 5:   # VIRR (FY-3A/B/C)
                for frm in virr_def.work(np.unpackbits(cadu[14: 14 + 882])):
                    virr.work(frm)
            elif vcdu.vcid == 3:  # MERSI-2 (FY-3D)
                mersi_zones.append(cadu[14: 14 + 882])
            elif vcdu.vcid == 12:  # CCSDS-compliant VC (all FY-3)
                for pkt in dmx12.work(bytes(cadu)):
                    if pkt.header.apid == 16:
                        mwhs2.work(pkt)
                    elif pkt.header.apid == 7:
                        mwts2.work(pkt)
        if mersi_zones:
            mersi.work(np.concatenate(mersi_zones))

        out_dir = Path(self.d_output_file_hint).parent
        for r in (mwhs2, mwts2):   # populate .timestamps
            if r.lines:
                r.get_channel(0)
        ts = (virr.timestamps or mersi.timestamps
              or mwhs2.timestamps or mwts2.timestamps)
        ds = DataSet("FengYun-3",
                     float(np.median([t for t in ts if t > 0]))
                     if any(t > 0 for t in ts) else -1)
        if virr.lines:
            p = ImageProduct()
            p.instrument_name = "virr"
            for c in range(10):
                p.add_channel(virr.get_channel(c), str(c + 1), bit_depth=16)
            p.contents["timestamps"] = virr.timestamps
            p.save(str(out_dir / "VIRR"))
            ds.products_list.append("VIRR")
        if mersi.lines:
            p = ImageProduct()
            p.instrument_name = "mersi2"
            for c in range(mersi.c250 + mersi.c1000):
                p.add_channel(mersi.get_channel(c), str(c + 1), bit_depth=16)
            p.contents["timestamps"] = mersi.timestamps
            p.save(str(out_dir / "MERSI-2"))
            ds.products_list.append("MERSI-2")
        if mwhs2.lines:
            p = ImageProduct()
            p.instrument_name = "mwhs2"
            for c in range(MWHS2Reader.CHANNELS):
                p.add_channel(mwhs2.get_channel(c), str(c + 1), bit_depth=16)
            p.contents["timestamps"] = mwhs2.timestamps
            p.save(str(out_dir / "MWHS-2"))
            ds.products_list.append("MWHS-2")
            logger.info(f"MWHS-2: {mwhs2.lines} scans")
        if mwts2.lines:
            p = ImageProduct()
            p.instrument_name = "mwts2"
            for c in range(MWTS2Reader.CHANNELS):
                p.add_channel(mwts2.get_channel(c), str(c + 1), bit_depth=16)
            p.contents["timestamps"] = mwts2.timestamps
            p.save(str(out_dir / "MWTS-2"))
            ds.products_list.append("MWTS-2")
            logger.info(f"MWTS-2: {mwts2.lines} scans")
        self.d_output_file = ds.save(str(out_dir))
        self.stats = {"virr_lines": virr.lines, "mersi_segments":
                      mersi.segments + 1, "mwhs2_lines": mwhs2.lines,
                      "mwts2_lines": mwts2.lines}
        logger.info(f"FY-3 instruments: {self.stats}")
