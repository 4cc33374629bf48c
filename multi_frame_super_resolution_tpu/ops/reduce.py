"""On-device selection/reduction ops.

The reference's airlight estimation downloads the dark channel to the CPU,
runs cv::sortIdx, and re-uploads (polar_defog.cpp:157,184-212) — the
dominant architectural wart called out in SURVEY.md §3.2. Here the top-k
selection runs on-device via ``jax.lax.top_k`` so the defog pipeline is a
single XLA program with zero host round trips.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def top_k_mask(values: jnp.ndarray, k: int) -> jnp.ndarray:
    """Boolean mask (same shape as ``values``) of the k largest entries."""
    flat = values.reshape(-1)
    kth = lax.top_k(flat, k)[0][-1]
    # threshold mask; may select >k on ties, matching the intent (top
    # fraction of brightest dark-channel pixels)
    return (values >= kth)


def masked_channel_sums(img: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-channel sums of img (H,W,C) over mask (H,W) — the on-device
    equivalent of sum_by_indices2 (polar_defog.cpp:32-43)."""
    return jnp.sum(img * mask[..., None], axis=(0, 1))


def top_k_channel_means(img: jnp.ndarray, scores: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mean of img (H,W,C) over the k pixels with the highest ``scores``
    (H,W). Exact-k selection via top_k indices + gather."""
    h, w = scores.shape
    flat_idx = lax.top_k(scores.reshape(-1), k)[1]
    flat_img = img.reshape(h * w, -1)
    return jnp.mean(flat_img[flat_idx], axis=0)
