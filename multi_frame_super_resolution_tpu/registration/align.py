"""Coarse-to-fine tile-pyramid burst alignment.

The TPU equivalent of the reference's align stage (SURVEY.md §3.4):
Gaussian pyramid -> per-level tile SSD search with pre-shifts from the
coarser level (convertToTilesOverlapPreShift / normalizedCC / findMinimum)
-> shift-field upsampling (UpSampleShifts) -> dense flow field
(CreateFlowFieldFromTiles, opticalFlow.cu:47-93).

The frame axis is processed stacked (one XLA computation per burst).
The former Pallas per-tile DMA window extraction is retired (Mosaic's
128-lane DMA slice granularity rejects (t + 2R)-wide tile slices; see
BENCH_NOTES.md "Pallas verdict (round 4)") — the production path is the
fused tile-warp + ssd_surface_image formulation below.
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
    """[finest, ..., coarsest] 2x-decimated grayscale pyramid. Accepts
    (H, W) or a stacked (F, H, W)."""
    stacked = img.ndim == 3
    down = jax.vmap(downsample2) if stacked else downsample2
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(down(pyr[-1]))
    return pyr


def align_frames(
    ref: jnp.ndarray, alts: jnp.ndarray, cfg: AlignConfig = AlignConfig()
) -> jnp.ndarray:
    """Estimate per-tile shift fields (F, nty, ntx, 2) at the finest level
    such that alt_f(tile_pos + shift_f) ~= ref(tile_pos).

    ref: (H, W); alts: (F, H, W).
    """
    f = alts.shape[0]
    ref_pyr = build_pyramid(ref, cfg.levels)
    alt_pyr = build_pyramid(alts, cfg.levels)

    total = None
    for level in range(cfg.levels - 1, -1, -1):
        radius = (
            cfg.fine_radius
            if (level == 0 and cfg.fine_radius is not None)
            else cfg.search_radius
        )
        r = ref_pyr[level]
        a = alt_pyr[level]
        nty, ntx = tile_counts(r.shape[0], r.shape[1], cfg.tile_size)
        if total is None:
            total = jnp.zeros((f, nty, ntx, 2), jnp.float32)
        else:
            # shifts double in pixel units when moving one level finer
            total = jax.vmap(
                lambda s: upsample_shift_field(s, nty, ntx, float(cfg.downsample))
            )(total)
        # the window extraction offsets tiles by the *rounded* predicted
        # shift (as convertToTilesOverlapPreShift does), so the residual
        # found by the search is relative to the rounded prediction
        rounded = jnp.round(total)
        ref_tiles = extract_ref_tiles(r, cfg.tile_size)
        if (
            cfg.fast_extract
            and not cfg.use_fft
            and 2 * radius <= cfg.tile_size
        ):
            # fully fused image-level path: tile-warp each frame by the
            # rounded prediction, then one multiply + tile-reduce for all
            # SSD surfaces (no windows materialized at all)
            from multi_frame_super_resolution_tpu.ops.warp_fast import (
                tile_warp_select,
            )
            from multi_frame_super_resolution_tpu.registration.tiles import (
                ssd_surface_image,
            )

            warped = jax.vmap(
                lambda img, pre: tile_warp_select(
                    img, pre.astype(jnp.int32), cfg.tile_size
                )
            )(a, rounded)
            ssd = jax.vmap(
                lambda wimg: ssd_surface_image(
                    r, wimg, cfg.tile_size, radius
                )
            )(warped)
            found = jax.vmap(
                lambda x: find_min_shift(
                    x, radius, cfg.peak_threshold, cfg.subpixel
                )
            )(ssd)
            total = rounded + found
            continue
        else:
            windows = jax.vmap(
                lambda img, pre: extract_search_windows(
                    img, cfg.tile_size, radius, pre
                )
            )(a, rounded)
        if cfg.use_fft:
            from multi_frame_super_resolution_tpu.registration.tiles import (
                ssd_surface_fft,
            )

            ssd_fn = ssd_surface_fft
        else:
            ssd_fn = ssd_surface
        ssd = jax.vmap(lambda w: ssd_fn(ref_tiles, w, radius))(windows)
        found = jax.vmap(
            lambda s: find_min_shift(
                s, radius, cfg.peak_threshold, cfg.subpixel
            )
        )(ssd)
        total = rounded + found
    return total


def align_pair(
    ref: jnp.ndarray, alt: jnp.ndarray, cfg: AlignConfig = AlignConfig()
) -> jnp.ndarray:
    """Single-pair alignment: (nty, ntx, 2)."""
    return align_frames(ref, alt[None], cfg)[0]


def align_burst(
    burst: jnp.ndarray, cfg: AlignConfig = AlignConfig(), ref_index: int = 0
) -> jnp.ndarray:
    """Align every frame of a grayscale burst (F, H, W) against the
    reference frame. Returns per-tile shifts (F, nty, ntx, 2); the
    reference frame's entry is zero (and is not wastefully searched)."""
    alts = jnp.concatenate([burst[:ref_index], burst[ref_index + 1 :]], axis=0)
    shifts = align_frames(burst[ref_index], alts, cfg)
    zero = jnp.zeros_like(shifts[:1])
    return jnp.concatenate(
        [shifts[:ref_index], zero, shifts[ref_index:]], axis=0
    )


def align_burst_consistent(
    burst: jnp.ndarray,
    cfg: AlignConfig = AlignConfig(),
    ref_index: int = 0,
    max_span: int = 2,
) -> jnp.ndarray:
    """Burst alignment with the global shift-consistency solve: measure
    pairwise shifts over a short-span pair graph, solve the per-tile
    least-squares chain with outlier rejection (ShiftMinimizer,
    registration/global_shift.py), and accumulate the optimal shifts to
    the reference frame. Returns (F, nty, ntx, 2)."""
    from multi_frame_super_resolution_tpu.registration.global_shift import (
        measurement_pairs,
        shifts_to_reference,
        solve_consistent_shifts,
    )

    f = burst.shape[0]
    pairs = measurement_pairs(f, max_span)
    measured = jnp.stack(
        [align_frames(burst[i], burst[j][None], cfg)[0] for (i, j) in pairs]
    )
    consecutive, _ = solve_consistent_shifts(measured, f, tuple(pairs))
    return shifts_to_reference(consecutive, ref_index)


def flow_from_tile_shifts(
    shifts: jnp.ndarray,
    tile_size: int,
    height: int,
    width: int,
    smooth: bool = True,
) -> jnp.ndarray:
    """Per-tile shift field -> dense per-pixel flow (H, W, 2), bilinearly
    interpolated like the texture read in CreateFlowFieldFromTiles
    (opticalFlow.cu:88-90) when ``smooth``, else piecewise constant.

    When the image is an exact tile multiple the interpolation is a
    fixed-coefficient polyphase upsample (ops.warp_fast.upsample_int:
    static shifts x constant weights, numerically identical to the
    gather-based resize) — the general remap lowers to a gather that
    cost 0.74 ms/burst on the fast RAW path at city size (round-4
    stage decomposition), ~40x the gatherless form."""
    nty, ntx = shifts.shape[0], shifts.shape[1]
    if smooth and height == nty * tile_size and width == ntx * tile_size:
        from multi_frame_super_resolution_tpu.ops.warp_fast import upsample_int

        return upsample_int(shifts, tile_size, "bilinear")
    method = "bilinear" if smooth else "nearest"
    return resize(shifts, height, width, method)
