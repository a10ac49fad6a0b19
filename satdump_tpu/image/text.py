"""Text overlays on raster images.

Reference: src-core/image/text.h (stb-truetype glyph rendering for map
labels and composite annotations). Here PIL's ImageDraw does the
rasterization (its bitmap font by default; a TTF path when given)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw, ImageFont


def draw_text(img: np.ndarray, text: str, xy: Tuple[int, int],
              color: Sequence[int], font_path: Optional[str] = None,
              size: int = 12) -> np.ndarray:
    """Draw `text` at pixel (x, y) in place-sematics (returns the array;
    uint8 H/W or H/W/C)."""
    arr = np.asarray(img)
    mode = "L" if arr.ndim == 2 else "RGB"
    pil = Image.fromarray(arr if arr.dtype == np.uint8
                          else (arr >> 8).astype(np.uint8), mode)
    draw = ImageDraw.Draw(pil)
    font = ImageFont.truetype(font_path, size) if font_path else \
        ImageFont.load_default()
    c = tuple(int(v) for v in color) if mode == "RGB" else int(color[0])
    draw.text(xy, text, fill=c, font=font)
    out = np.asarray(pil)
    if arr.dtype != np.uint8:
        out = out.astype(arr.dtype) << 8
    return out


def draw_city_labels(img: np.ndarray, latlon_to_xy, points: np.ndarray,
                     names: Sequence[str], color: Sequence[int],
                     max_labels: int = 50) -> np.ndarray:
    """Label projected points (the populated-places overlay the reference
    draws from its shapefile, common/map/map_drawer.cpp)."""
    x, y = latlon_to_xy(points[:, 0], points[:, 1])
    h, w = img.shape[0], img.shape[1]
    out = img
    n = 0
    for xi, yi, name in zip(np.asarray(x), np.asarray(y), names):
        if not (np.isfinite(xi) and np.isfinite(yi)):
            continue
        if 0 <= xi < w and 0 <= yi < h:
            out = draw_text(out, name, (int(xi), int(yi)), color)
            n += 1
            if n >= max_labels:
                break
    return out
