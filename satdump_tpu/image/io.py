"""Image IO: unified load/save (ref: src-core/image/io.h:22-172).

The reference implements PNG/JPEG/J2K/TIFF/QOI/PBM natively; here PIL covers
PNG/JPEG/TIFF (8/16-bit grayscale + RGB/RGBA), which are the formats the
pipeline outputs use. GeoTIFF tagging comes with the projection layer.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from satdump_tpu.core.exceptions import FormatError


def save_img(img: np.ndarray, path: str | Path) -> None:
    """img: (H,W) or (H,W,C) uint8/uint16."""
    from PIL import Image
    img = np.asarray(img)
    if img.dtype not in (np.uint8, np.uint16):
        raise FormatError(f"save_img: dtype {img.dtype} unsupported (use uint8/uint16)")
    mode = None
    if img.dtype == np.uint16 and img.ndim == 2:
        mode = "I;16"
    Image.fromarray(img, mode=mode).save(str(path))


def load_img(path: str | Path) -> np.ndarray:
    from PIL import Image
    with Image.open(str(path)) as im:
        return np.asarray(im)
