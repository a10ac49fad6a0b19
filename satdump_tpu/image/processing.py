"""Image processing ops (ref src-core/image/processing.h,
brightness_contrast.cpp, histogram_utils.cpp, image_lut.cpp, median blur in
image_utils.cpp) — batched jnp implementations; every op is whole-image
vectorized and jit-friendly (no per-pixel Python)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _as_float(img: np.ndarray) -> tuple[jnp.ndarray, float]:
    if img.dtype == np.uint8:
        return jnp.asarray(img, jnp.float32) / 255.0, 255.0
    if img.dtype == np.uint16:
        return jnp.asarray(img, jnp.float32) / 65535.0, 65535.0
    return jnp.asarray(img, jnp.float32), 1.0


def _from_float(x: jnp.ndarray, scale: float, dtype) -> np.ndarray:
    x = jnp.clip(x, 0.0, 1.0) * scale
    return np.asarray(jnp.round(x)).astype(dtype)


def brightness_contrast(img: np.ndarray, brightness: float, contrast: float
                        ) -> np.ndarray:
    """ref brightness_contrast.cpp (GIMP-style): both in [-1, 1]."""
    x, scale = _as_float(img)
    b = brightness / 2.0
    x = jnp.where(b < 0, x * (1.0 + b), x + (1.0 - x) * b)
    slant = jnp.tan((contrast + 1.0) * jnp.pi / 4.0)
    x = (x - 0.5) * slant + 0.5
    return _from_float(x, scale, img.dtype)


def equalize(img: np.ndarray, per_channel: bool = False) -> np.ndarray:
    """Histogram equalization matching the reference formula exactly
    (ref image/processing.cpp:176-216): ``scaling[i] = round(cum_hist[i] *
    (nlevels-1)/size)``, ONE joint histogram over all channels unless
    per_channel — computed with a 1024-bin histogram on device."""
    x, scale = _as_float(img)
    nbins = 1024

    def eq1(ch):
        hist = jnp.histogram(ch, bins=nbins, range=(0.0, 1.0))[0]
        cdf = jnp.cumsum(hist).astype(jnp.float32)
        # reference scaling: cum * (nlevels-1)/size, no cdf_min subtraction
        lut = jnp.round(cdf * ((nbins - 1) / ch.size)) / (nbins - 1)
        idx = jnp.clip((ch * (nbins - 1)).astype(jnp.int32), 0, nbins - 1)
        return lut[idx]

    if x.ndim == 3 and per_channel:
        y = jnp.stack([eq1(x[..., c]) for c in range(x.shape[-1])], axis=-1)
    elif x.ndim == 3:
        # joint histogram over the full RGB stack (reference per_channel=false)
        y = eq1(x.reshape(-1)).reshape(x.shape)
    else:
        y = eq1(x)
    return _from_float(y, scale, img.dtype)


def white_balance(img: np.ndarray, percentile: float = 0.05) -> np.ndarray:
    """Per-channel percentile stretch (ref image processing white_balance)."""
    x, scale = _as_float(img)
    axes = (0, 1)
    lo = jnp.percentile(x, percentile * 100, axis=axes, keepdims=True)
    hi = jnp.percentile(x, 100 - percentile * 100, axis=axes, keepdims=True)
    y = (x - lo) / jnp.maximum(hi - lo, 1e-6)
    return _from_float(y, scale, img.dtype)


def apply_lut(img: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Map a grayscale image through a (N,) or (N,3) LUT
    (ref image_lut.cpp)."""
    x, _ = _as_float(img)
    lut = jnp.asarray(lut)
    n = lut.shape[0]
    idx = jnp.clip((x * (n - 1)).astype(jnp.int32), 0, n - 1)
    y = lut[idx]
    return np.asarray(y).astype(lut.dtype)


def median_blur(img: np.ndarray, ksize: int = 3) -> np.ndarray:
    """Median filter (ref image median_blur): windowed sort on device."""
    assert ksize % 2 == 1
    x, scale = _as_float(img)
    pad = ksize // 2
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    xp = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    wins = []
    for dy in range(ksize):
        for dx in range(ksize):
            wins.append(xp[dy: dy + x.shape[0], dx: dx + x.shape[1]])
    stack = jnp.stack(wins, axis=0)
    y = jnp.median(stack, axis=0)
    if squeeze:
        y = y[..., 0]
    return _from_float(y, scale, img.dtype)


def despeckle(img: np.ndarray, threshold: float = 0.1) -> np.ndarray:
    """Replace pixels deviating from the local median by > threshold with the
    median (ref image despeckle)."""
    x, scale = _as_float(img)
    med_u = _as_float(median_blur(img, 3))[0]
    y = jnp.where(jnp.abs(x - med_u) > threshold, med_u, x)
    return _from_float(y, scale, img.dtype)


def linear_invert(img: np.ndarray) -> np.ndarray:
    x, scale = _as_float(img)
    return _from_float(1.0 - x, scale, img.dtype)


def normalize(img: np.ndarray) -> np.ndarray:
    x, scale = _as_float(img)
    lo, hi = jnp.min(x), jnp.max(x)
    return _from_float((x - lo) / jnp.maximum(hi - lo, 1e-9), scale, img.dtype)
