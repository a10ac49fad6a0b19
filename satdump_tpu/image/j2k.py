"""JPEG 2000 codestream support via PIL/openjpeg.

Closes the reference's J2K surface (src-core/image/io.h:22-172 J2K entries,
image/j2k_utils.h decompress_j2k_openjp2) used by GOES GRB image payloads
and xRIT/HRIT segment decompression. 8- and 16-bit single-component
codestreams, lossless (5/3) by default for compression.
"""

from __future__ import annotations

import io as _io

import numpy as np

from satdump_tpu.core.exceptions import FormatError


def decompress_j2k(data: bytes) -> np.ndarray:
    """Decode a raw J2K/JP2 codestream -> (H, W) uint8/uint16 array.
    Mirrors image::decompress_j2k_openjp2 (j2k_utils.cpp)."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise FormatError("JPEG 2000 support needs PIL/openjpeg") from e
    im = Image.open(_io.BytesIO(bytes(data)))
    im.load()
    arr = np.asarray(im)
    if arr.dtype == np.int32:  # PIL mode "I"
        arr = np.clip(arr, 0, 65535).astype(np.uint16)
    return arr


def compress_j2k(img: np.ndarray, lossless: bool = True) -> bytes:
    """Encode (H, W) uint8/uint16 -> raw J2K codestream bytes."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise FormatError("JPEG 2000 support needs PIL/openjpeg") from e
    img = np.asarray(img)
    if img.ndim != 2:
        raise FormatError("compress_j2k: single-component images only")
    if img.dtype == np.uint16:
        im = Image.frombytes("I;16", (img.shape[1], img.shape[0]),
                             np.ascontiguousarray(img).tobytes())
    elif img.dtype == np.uint8:
        im = Image.fromarray(img)
    else:
        raise FormatError(f"compress_j2k: dtype {img.dtype}")
    buf = _io.BytesIO()
    im.save(buf, "JPEG2000", irreversible=not lossless)
    return buf.getvalue()
