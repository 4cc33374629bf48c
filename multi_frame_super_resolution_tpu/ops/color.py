"""Color-space and tonal ops.

TPU-native equivalents of the reference's cvtColor / convertTo /
GammasRGB paths (main.cpp:866-870, kernel.cu:380-422).
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """RGB (..., 3) -> grayscale (...), BT.601 weights as in cv::cvtColor
    (used by fft_image_registration, main.cpp:866-867)."""
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return img @ w


def srgb_gamma(img: jnp.ndarray) -> jnp.ndarray:
    """NaN-clean, clamp to [0,1] and sRGB-encode, matching GammasRGB
    (kernel.cu:392-422)."""
    img = jnp.nan_to_num(img, nan=0.0)
    img = jnp.clip(img, 0.0, 1.0)
    low = 12.92 * img
    high = 1.055 * jnp.power(jnp.maximum(img, 1e-8), 1.0 / 2.4) - 0.055
    return jnp.where(img <= 0.0031308, low, high)


def srgb_degamma(img: jnp.ndarray) -> jnp.ndarray:
    """Inverse sRGB encode."""
    img = jnp.clip(img, 0.0, 1.0)
    low = img / 12.92
    high = jnp.power((img + 0.055) / 1.055, 2.4)
    return jnp.where(img <= 0.04045, low, high)


def normalize_minmax(img: jnp.ndarray, lo: float = 0.0, hi: float = 1.0) -> jnp.ndarray:
    """Min-max normalize to [lo, hi] (cv::normalize NORM_MINMAX,
    polar_defog.cpp:114-115)."""
    mn = jnp.min(img)
    mx = jnp.max(img)
    return (img - mn) / jnp.maximum(mx - mn, 1e-15) * (hi - lo) + lo
