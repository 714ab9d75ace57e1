"""Image ops: separable Gaussian blur, resize, min-max normalize (jnp).

Replaces the reference's cv2 host-side mask processing
(scripts/audio2vid.py:133-153 blur_mask; src/dataset/image_processor.py
attn_transform_* resizes) with on-device ops.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _cv2_sigma(ksize: int) -> float:
    """cv2.GaussianBlur's automatic sigma for sigma=0."""
    return 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8


def gaussian_kernel(ksize: int, sigma: float = 0.0) -> jnp.ndarray:
    if sigma <= 0:
        sigma = _cv2_sigma(ksize)
    x = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2
    k = jnp.exp(-(x**2) / (2 * sigma**2))
    return k / jnp.sum(k)


def gaussian_blur(img: jnp.ndarray, ksize: int, sigma: float = 0.0) -> jnp.ndarray:
    """Separable Gaussian blur over the trailing two spatial dims of
    (..., H, W). Reflect padding matches cv2's default BORDER_REFLECT_101."""
    k = gaussian_kernel(ksize, sigma)
    pad = ksize // 2
    x = img.astype(jnp.float32)

    def conv1d(a, axis):
        a = jnp.moveaxis(a, axis, -1)
        shape = a.shape
        a = a.reshape(-1, shape[-1])
        a = jnp.pad(a, ((0, 0), (pad, pad)), mode="reflect")
        out = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(a)
        return jnp.moveaxis(out.reshape(shape), -1, axis)

    return conv1d(conv1d(x, -1), -2).astype(img.dtype)


def resize_bilinear(img: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of (..., H, W)."""
    out_shape = img.shape[:-2] + hw
    return jax.image.resize(img, out_shape, "bilinear")


def normalize_minmax(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Min-max normalize to [0, 1] (cv2.NORM_MINMAX semantics / 255).

    `axis` selects the reduction dims — the reference's blur_mask
    (scripts/audio2vid.py:150) normalizes each frame independently, so
    clip-shaped (T, H, W) inputs must pass axis=(-2, -1)."""
    lo = jnp.min(x, axis=axis, keepdims=axis is not None)
    hi = jnp.max(x, axis=axis, keepdims=axis is not None)
    return (x - lo) / jnp.maximum(hi - lo, 1e-8)


def mask_pyramid(mask64: jnp.ndarray, levels: int = 4) -> list:
    """(..., 64, 64) mask -> flattened pyramid [(..., 4096), (..., 1024),
    (..., 256), (..., 64)] matching the attn_transform_{64,32,16,8} stack."""
    out = []
    h = mask64.shape[-1]
    for l in range(levels):
        m = mask64 if l == 0 else resize_bilinear(mask64, (h >> l, h >> l))
        out.append(m.reshape(*m.shape[:-2], -1))
    return out
