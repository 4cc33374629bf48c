"""Merge robustness (certainty) model.

TPU-native equivalent of ComputeRobustnessMask (RobustnessModell.cu:28-158):
per pixel of the half-resolution RGB images, compare local 3x3 statistics
of the reference against the flow-shifted moving frame under the noise
model sigma_md = sqrt(alpha*mean + beta), gate on the local
motion-inconsistency metric M, and emit a soft per-channel certainty mask.

All window statistics are separable box filters; the shifted reads become
a single gather of pre-filtered images (the shift is constant across each
3x3 window, so filter-then-shift == shift-then-filter).

Note: the reference's local flow min/max loop overwrites instead of
accumulating (RobustnessModell.cu:66-71), so it effectively compares only
the last-visited neighbor with the center; we implement the evident intent
— a true 5x5 local min/max of the flow field.
"""

from __future__ import annotations

import jax.numpy as jnp

from multi_frame_super_resolution_tpu.config import RobustnessConfig
from multi_frame_super_resolution_tpu.ops.filters import box_filter
from multi_frame_super_resolution_tpu.ops.morphology import dilate, erode


def _gather_shifted(img: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, C) sampled at x + shift (per-pixel integer shift (H,W,2)),
    clamped borders."""
    h, w = img.shape[:2]
    ys = jnp.clip(
        jnp.arange(h)[:, None] + shift[..., 0].astype(jnp.int32), 0, h - 1
    )
    xs = jnp.clip(
        jnp.arange(w)[None, :] + shift[..., 1].astype(jnp.int32), 0, w - 1
    )
    return img[ys, xs]


def robustness_mask(
    ref: jnp.ndarray,
    moved: jnp.ndarray,
    flow: jnp.ndarray,
    cfg: RobustnessConfig = RobustnessConfig(),
    bounded: int = 0,
) -> jnp.ndarray:
    """Certainty mask for one alternate frame.

    ref, moved: (H, W, 3) half-resolution RGB; flow: (H, W, 2) in the SAME
    half-resolution pixel units (the caller halves full-res flows, as the
    kernel does with `shift * 0.5`). Returns (H, W, 4): RGB certainties in
    [0, 1] plus the motion-inconsistency metric M in the last channel.
    """
    mean_ref = box_filter(ref, 3, normalize=True)
    mean_sq_ref = box_filter(ref * ref, 3, normalize=True)
    std_ref = jnp.sqrt(jnp.maximum(mean_sq_ref - mean_ref * mean_ref, 0.0))

    if bounded > 0:
        # gatherless fast path for small (already tile-compensated) flows
        from multi_frame_super_resolution_tpu.ops.warp_fast import warp_bounded

        mean_moved = warp_bounded(
            box_filter(moved, 3, normalize=True), jnp.round(flow), bounded
        )
    else:
        shift = jnp.round(flow)
        mean_moved = _gather_shifted(box_filter(moved, 3, normalize=True), shift)

    # local 5x5 flow spread, scaled by the local mean distance
    # (RobustnessModell.cu:105-112)
    flow_max = jnp.stack([dilate(flow[..., 0], 5), dilate(flow[..., 1], 5)], -1)
    flow_min = jnp.stack([erode(flow[..., 0], 5), erode(flow[..., 1], 5)], -1)
    mean_dist = jnp.mean(jnp.abs(mean_ref - mean_moved), axis=-1)
    spread = (flow_max - flow_min) * (0.5 * mean_dist)[..., None]
    m = jnp.sqrt(jnp.sum(spread * spread, axis=-1))

    sigma_md = jnp.sqrt(cfg.alpha * mean_ref + cfg.beta)
    # two green samples averaged per Bayer quad -> /sqrt(2)
    # (RobustnessModell.cu:131)
    sigma_md = sigma_md * jnp.asarray([1.0, 1.0 / jnp.sqrt(2.0), 1.0])

    dist = jnp.abs(mean_ref - mean_moved)
    var_ref = std_ref * std_ref
    dist = dist * (var_ref / (var_ref + sigma_md * sigma_md))
    sigma = jnp.maximum(sigma_md, std_ref)

    s = jnp.where(m > cfg.threshold_m, 0.0, cfg.s)[..., None]
    mask = jnp.clip(
        s * jnp.exp(-(dist * dist) / (sigma * sigma)) - cfg.t, 0.0, 1.0
    )
    return jnp.concatenate([mask, m[..., None]], axis=-1)
