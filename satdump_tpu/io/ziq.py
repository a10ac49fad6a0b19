"""ZIQ compressed baseband format (ref src-core/common/ziq.{h,cpp} and
docs/pages/ZIQ.md).

Layout: b"ZIQ_" | u8 is_compressed | s8 bits_per_sample | u64le samplerate
| u64le annotation_len | annotation (JSON) | payload. Payload is interleaved
IQ as int8 (x127), int16 (x32767) or float32, zstd-framed when compressed
(the reference uses streaming ZSTD with checksums; standard frames decode
it either way).
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

SIGNATURE = b"ZIQ_"

try:
    import zstandard as _zstd
except Exception:           # pragma: no cover - zstandard is in the image
    _zstd = None


def is_ziq(path: str | Path) -> bool:
    with open(path, "rb") as f:
        return f.read(4) == SIGNATURE


def _scale(bits: int) -> float:
    return {8: 127.0, 16: 32767.0, 32: 1.0}[bits]


def write_ziq(path: str | Path, samples: np.ndarray, samplerate: float = 0,
              bits_per_sample: int = 8, compress: bool = True,
              annotation: Optional[dict] = None) -> None:
    samples = np.asarray(samples, np.complex64)
    inter = np.empty(2 * len(samples), np.float32)
    inter[0::2] = samples.real
    inter[1::2] = samples.imag
    s = _scale(bits_per_sample)
    if bits_per_sample == 8:
        data = np.clip(np.round(inter * s), -127, 127).astype(np.int8).tobytes()
    elif bits_per_sample == 16:
        data = np.clip(np.round(inter * s), -32767, 32767).astype(np.int16).tobytes()
    elif bits_per_sample == 32:
        data = inter.tobytes()
    else:
        raise ValueError(f"ziq bits_per_sample {bits_per_sample}")

    ann = json.dumps(annotation or {}).encode()
    with open(path, "wb") as f:
        f.write(SIGNATURE)
        f.write(struct.pack("<B", 1 if compress else 0))
        f.write(struct.pack("<b", bits_per_sample))
        f.write(struct.pack("<Q", int(samplerate)))
        f.write(struct.pack("<Q", len(ann)))
        f.write(ann)
        if compress:
            if _zstd is None:
                raise RuntimeError("zstandard module unavailable")
            f.write(_zstd.ZstdCompressor(level=1).compress(data))
        else:
            f.write(data)


def read_ziq(path: str | Path
             ) -> Tuple[np.ndarray, float, dict]:
    """-> (complex64 samples, samplerate, annotation dict)."""
    with open(path, "rb") as f:
        if f.read(4) != SIGNATURE:
            raise ValueError("not a ZIQ file")
        is_comp = struct.unpack("<B", f.read(1))[0]
        bits = struct.unpack("<b", f.read(1))[0]
        samplerate = struct.unpack("<Q", f.read(8))[0]
        ann_len = struct.unpack("<Q", f.read(8))[0]
        ann = f.read(ann_len)
        payload = f.read()
    if is_comp:
        if _zstd is None:
            raise RuntimeError("zstandard module unavailable")
        payload = _zstd.ZstdDecompressor().decompressobj().decompress(payload)
    if bits == 8:
        inter = np.frombuffer(payload, np.int8).astype(np.float32) / 127.0
    elif bits == 16:
        inter = np.frombuffer(payload, np.int16).astype(np.float32) / 32767.0
    elif bits == 32:
        inter = np.frombuffer(payload, np.float32)
    else:
        raise ValueError(f"ziq bits_per_sample {bits}")
    n = len(inter) // 2
    out = (inter[0: 2 * n: 2] + 1j * inter[1: 2 * n: 2]).astype(np.complex64)
    try:
        annotation = json.loads(ann.decode() or "{}")
    except json.JSONDecodeError:
        annotation = {}
    return out, float(samplerate), annotation
