"""Morphological ops (erode = min filter, dilate = max filter).

TPU-native formulation: ``lax.reduce_window`` which XLA lowers to fused
VPU reductions — the equivalent of cv::cuda::createMorphologyFilter
MORPH_ERODE used by the GPU dark-channel prior (polar_defog.cpp:45-62,
main.cpp:1237-1254).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _reduce2d(img: jnp.ndarray, size: int, init, op) -> jnp.ndarray:
    window = (size, size) + (1,) * (img.ndim - 2)
    strides = (1,) * img.ndim
    return lax.reduce_window(img, init, op, window, strides, "SAME")


def erode(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Min filter over a size x size rectangle. SAME padding with +inf init
    means border minima are taken over the valid region only, matching
    OpenCV's default erode border handling."""
    return _reduce2d(img, size, jnp.asarray(jnp.inf, img.dtype), lax.min)


def dilate(img: jnp.ndarray, size: int) -> jnp.ndarray:
    return _reduce2d(img, size, jnp.asarray(-jnp.inf, img.dtype), lax.max)


def min_channels(img: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel min over channels (the split/min/min chain of dark_prior,
    polar_defog.cpp:55-57)."""
    return jnp.min(img, axis=-1)
