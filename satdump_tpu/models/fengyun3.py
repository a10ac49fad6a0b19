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

from satdump_tpu.ccsds import parse_vcdu
from satdump_tpu.core.log import logger
from satdump_tpu.ops.fec.codings_misc import SimpleDeframer
from satdump_tpu.pipeline.module import ProcessingModule, register_module
from satdump_tpu.products.image_product import ImageProduct
from satdump_tpu.products.product import DataSet
from satdump_tpu.utils.repack import repack_10bit

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


@register_module
class FY3InstrumentsDecoderModule(ProcessingModule):
    """cadu -> FY-3 instrument products (module_fy3_instruments.cpp).
    Currently decodes VIRR (VCID 5, FY-3A/B/C AHRPT)."""

    id = "fy3_instruments"

    def __init__(self, input_file, output_file_hint, parameters):
        super().__init__(input_file, output_file_hint, parameters)
        self.satellite = str(self.param("satellite", "fy3abc"))

    def process(self):
        virr_def = SimpleDeframer(VIRR_SYNC, VIRR_SYNC_BITS,
                                  VIRR_FRAME_BITS, 0)
        virr = VIRRReader()
        data = np.fromfile(self.d_input_file, np.uint8)
        n = len(data) // 1024
        for i in range(n):
            cadu = data[i * 1024: (i + 1) * 1024]
            vcdu = parse_vcdu(bytes(cadu))
            if vcdu.vcid == 5:   # VIRR
                for frm in virr_def.work(np.unpackbits(cadu[14: 14 + 882])):
                    virr.work(frm)

        out_dir = Path(self.d_output_file_hint).parent
        ds = DataSet("FengYun-3", float(np.median(virr.timestamps))
                     if virr.timestamps else -1)
        if virr.lines:
            p = ImageProduct()
            p.instrument_name = "virr"
            for c in range(10):
                p.add_channel(virr.get_channel(c), str(c + 1), bit_depth=16)
            p.contents["timestamps"] = virr.timestamps
            p.save(str(out_dir / "VIRR"))
            ds.products_list.append("VIRR")
        self.d_output_file = ds.save(str(out_dir))
        self.stats = {"virr_lines": virr.lines}
        logger.info(f"FY-3 instruments: {self.stats}")
