"""Coarse-to-fine tile-pyramid burst alignment.

The TPU equivalent of the reference's align stage (SURVEY.md §3.4):
Gaussian pyramid -> per-level tile SSD search with pre-shifts from the
coarser level (convertToTilesOverlapPreShift / normalizedCC / findMinimum)
-> shift-field upsampling (UpSampleShifts) -> dense flow field
(CreateFlowFieldFromTiles, opticalFlow.cu:47-93).

Everything is one jittable program per burst; frames are vmapped so the
whole burst aligns in a single XLA computation.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from multi_frame_super_resolution_tpu.config import AlignConfig
from multi_frame_super_resolution_tpu.ops.geometry import downsample2, resize
from multi_frame_super_resolution_tpu.registration.tiles import (
    extract_ref_tiles,
    extract_search_windows,
    find_min_shift,
    ssd_surface,
    tile_counts,
    upsample_shift_field,
)


def build_pyramid(img: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """[finest, ..., coarsest] 2x-decimated grayscale pyramid."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(downsample2(pyr[-1]))
    return pyr


def align_pair(
    ref: jnp.ndarray, alt: jnp.ndarray, cfg: AlignConfig = AlignConfig()
) -> jnp.ndarray:
    """Estimate the per-tile shift field (nty, ntx, 2) at the finest level
    such that alt(tile_pos + shift) ~= ref(tile_pos)."""
    ref_pyr = build_pyramid(ref, cfg.levels)
    alt_pyr = build_pyramid(alt, cfg.levels)

    total = None
    for level in range(cfg.levels - 1, -1, -1):
        r = ref_pyr[level]
        a = alt_pyr[level]
        nty, ntx = tile_counts(r.shape[0], r.shape[1], cfg.tile_size)
        if total is None:
            total = jnp.zeros((nty, ntx, 2), jnp.float32)
        else:
            # shifts double in pixel units when moving one level finer
            total = upsample_shift_field(total, nty, ntx, float(cfg.downsample))
        # the window extraction offsets tiles by the *rounded* predicted
        # shift (as convertToTilesOverlapPreShift does), so the residual
        # found by the search is relative to the rounded prediction
        rounded = jnp.round(total)
        ref_tiles = extract_ref_tiles(r, cfg.tile_size)
        if cfg.use_pallas:
            from multi_frame_super_resolution_tpu.pallas_ops.tile_gather import (
                tile_gather_pallas,
            )

            windows = tile_gather_pallas(
                a, rounded.astype(jnp.int32), cfg.tile_size, cfg.search_radius
            )
        else:
            windows = extract_search_windows(
                a, cfg.tile_size, cfg.search_radius, rounded
            )
        ssd = ssd_surface(ref_tiles, windows, cfg.search_radius)
        found = find_min_shift(ssd, cfg.search_radius, cfg.peak_threshold, cfg.subpixel)
        total = rounded + found
    return total


def align_burst(
    burst: jnp.ndarray, cfg: AlignConfig = AlignConfig(), ref_index: int = 0
) -> jnp.ndarray:
    """Align every frame of a grayscale burst (F, H, W) against the
    reference frame. Returns per-tile shifts (F, nty, ntx, 2); the
    reference frame's entry is zero."""
    ref = burst[ref_index]
    shifts = jax.vmap(lambda alt: align_pair(ref, alt, cfg))(burst)
    return shifts.at[ref_index].set(0.0)


def flow_from_tile_shifts(
    shifts: jnp.ndarray,
    tile_size: int,
    height: int,
    width: int,
    smooth: bool = True,
) -> jnp.ndarray:
    """Per-tile shift field -> dense per-pixel flow (H, W, 2), bilinearly
    interpolated like the texture read in CreateFlowFieldFromTiles
    (opticalFlow.cu:88-90) when ``smooth``, else piecewise constant."""
    method = "bilinear" if smooth else "nearest"
    return resize(shifts, height, width, method)
