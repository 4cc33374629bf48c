"""Cumulative early-return timing of the RAW handheld pipeline.

Builds pipeline prefixes (later stages dead-code-eliminated by XLA) and
times each with the amortized protocol; the deltas locate in-context
stage costs including fusion-boundary effects that standalone stage
timings miss. Usage: python tools/profile_upto.py [k] [reps] [stages...]
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np


def build_upto(cfg):
    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.models.fast_merge import (
        merge_burst_raw_planes,
        raw_to_planes,
    )
    from multi_frame_super_resolution_tpu.models.handheld import (
        _subsample_from_planes,
    )
    from multi_frame_super_resolution_tpu.models.merge import (
        apply_weighting,
        kernel_params,
        smoothed_structure_tensor,
    )
    from multi_frame_super_resolution_tpu.models.robustness import robustness_mask
    from multi_frame_super_resolution_tpu.ops.color import rgb_to_gray
    from multi_frame_super_resolution_tpu.ops.debayer import debayer
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        tile_shift_decompose,
        tile_warp_select,
        upsample_int,
    )
    from multi_frame_super_resolution_tpu.registration.align import align_burst
    from multi_frame_super_resolution_tpu.registration.lucas_kanade import lk_refine

    def upto(stage):
        def fn(raw_burst):
            f, h, w = raw_burst.shape
            t = cfg.align.tile_size
            hh, hw = h // 2, w // 2
            planes = raw_to_planes(raw_burst)
            half = _subsample_from_planes(planes, cfg.cfa_pattern)
            gray_half = rgb_to_gray(half)
            if stage == "subsample":
                return gray_half
            tile_shifts = align_burst(gray_half, cfg.align)
            int_half, res_tiles = tile_shift_decompose(tile_shifts)
            if stage == "align":
                return tile_shifts
            stack = planes.reshape(f * 4, hh, hw)
            ints_rep = jnp.repeat(int_half, 4, axis=0)
            warped = jax.vmap(
                lambda fr, i_: tile_warp_select(fr, i_, t, bound=16)
            )(stack, ints_rep).reshape(f, 2, 2, hh, hw)
            warped = warped.at[0].set(planes[0])
            if stage == "warp":
                return warped
            lift = lambda res: jnp.repeat(jnp.repeat(res, t, 0), t, 1)[:hh, :hw]  # noqa: E731
            res_half = jax.vmap(lift)(res_tiles)
            warped_half = _subsample_from_planes(warped, cfg.cfa_pattern)
            gray_wh = rgb_to_gray(warped_half)
            lk_cfg = dataclasses.replace(cfg.lk, bounded_warp=2)
            res_half = jax.vmap(
                lambda g, fl: lk_refine(gray_wh[0], g, fl, lk_cfg)
            )(gray_wh, res_half)
            res_half = res_half.at[0].set(0.0)
            res_half = jnp.clip(
                res_half, -0.5 * cfg.residual_bound, 0.5 * cfg.residual_bound
            )
            if stage == "lk":
                return res_half
            cert_half = jax.vmap(
                lambda mv, fl: robustness_mask(
                    warped_half[0], mv, fl, cfg.robustness, bounded=2
                )[..., :3]
            )(warped_half, res_half)
            cert_half = cert_half.at[0].set(1.0)
            if stage == "robust":
                return cert_half
            st = smoothed_structure_tensor(gray_half[0], cfg.st_window)
            omega_half = kernel_params(st, cfg.merge)
            mc_rb = dataclasses.replace(
                cfg.merge, k_min=max(cfg.merge.k_min, cfg.merge.k_min_rb)
            )
            omega_half_rb = kernel_params(st, mc_rb)
            num, den = merge_burst_raw_planes(
                warped, res_half * 2.0, cert_half, omega_half, omega_half_rb,
                cfg.cfa_pattern, cfg.scale, cfg.merge.radius,
                residual_bound=cfg.residual_bound, k_max=cfg.merge.k_max,
            )
            if stage == "merge":
                return num
            fallback = upsample_int(
                debayer(raw_burst[0], cfg.cfa_pattern), cfg.scale, "bicubic"
            )
            out = apply_weighting(num, den, fallback, cfg.merge.weight_threshold)
            return jnp.clip(out, 0.0, 1.0)

        return fn

    return upto


def main():
    import jax.numpy as jnp

    from profile_stages import amortized_ms

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    stages = sys.argv[3:] or [
        "subsample", "align", "warp", "lk", "robust", "merge", "full",
    ]

    burst = load_burst("city")
    raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in burst]))
    cfg = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )
    upto = build_upto(cfg)
    prev = 0.0
    for st in stages:
        ms = amortized_ms(upto(st), raw, k=k, reps=reps)
        print(f"upto {st:10s} {ms:7.3f} ms  (+{ms - prev:6.3f})")
        prev = ms


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/tools")
    main()
