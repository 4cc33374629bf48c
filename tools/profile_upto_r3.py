"""Cumulative early-return timing of the CURRENT RAW handheld fast path
(including the global similarity pre-alignment stage).

Builds pipeline prefixes (later stages dead-code-eliminated by XLA) and
times each with the amortized protocol (BENCH_NOTES.md); deltas between
consecutive prefixes locate in-context stage costs including fusion
effects that standalone stage timings miss.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_upto_r3.py [k] [reps]
"""

from __future__ import annotations

import dataclasses
import os
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
    from multi_frame_super_resolution_tpu.ops.color import rgb_to_gray, srgb_gamma
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        interleave_phases_planes,
        tile_shift_decompose,
        tile_warp_select,
        upsample_int_phases_planes,
    )
    from multi_frame_super_resolution_tpu.registration.align import align_burst
    from multi_frame_super_resolution_tpu.registration.lucas_kanade import lk_refine
    from multi_frame_super_resolution_tpu.registration.prealign import (
        estimate_burst_similarity,
        prealign_planes,
    )

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
            if stage == "estimate":
                st = estimate_burst_similarity(gray_half, cfg.prealign_cfg)
                return st.rotation + st.scale + st.translation.sum(-1)
            planes, prevalid = prealign_planes(
                planes, gray_half, cfg.prealign_cfg
            )
            half = _subsample_from_planes(planes, cfg.cfa_pattern)
            gray_half = rgb_to_gray(half)
            if stage == "prealign":
                return gray_half
            tile_shifts = align_burst(gray_half, cfg.align)
            int_half, res_tiles = tile_shift_decompose(tile_shifts)
            if stage == "align":
                return tile_shifts
            nst = 5
            stack = planes[1:].reshape(f - 1, 4, hh, hw)
            stack = jnp.concatenate([stack, prevalid[1:, None]], axis=1)
            stack = stack.reshape((f - 1) * nst, hh, hw)
            ints_rep = jnp.repeat(int_half[1:], nst, axis=0)
            warped_stack = jax.vmap(
                lambda fr, ints: tile_warp_select(fr, ints, t, bound=16)
            )(stack, ints_rep).reshape(f - 1, nst, hh, hw)
            warped_alts = warped_stack[:, :4].reshape(f - 1, 2, 2, hh, hw)
            valid_w = warped_stack[:, 4]
            warped = jnp.concatenate([planes[:1], warped_alts], axis=0)
            if stage == "warp":
                return warped
            lift = lambda res: jnp.repeat(jnp.repeat(res, t, 0), t, 1)[:hh, :hw]  # noqa: E731
            res_alts = jax.vmap(lift)(res_tiles[1:])
            warped_half = _subsample_from_planes(warped, cfg.cfa_pattern)
            gray_wh = rgb_to_gray(warped_half)
            if cfg.use_lk:
                lk_cfg = dataclasses.replace(cfg.lk, bounded_warp=2)
                res_alts = jax.vmap(
                    lambda g, fl: lk_refine(gray_wh[0], g, fl, lk_cfg)
                )(gray_wh[1:], res_alts)
            res_alts = jnp.clip(
                res_alts, -0.5 * cfg.residual_bound, 0.5 * cfg.residual_bound
            )
            res_half = jnp.concatenate(
                [jnp.zeros((1, hh, hw, 2), jnp.float32), res_alts], axis=0
            )
            if stage == "lk":
                return res_half
            cert_alts = jax.vmap(
                lambda mv, fl: robustness_mask(
                    warped_half[0], mv, fl, cfg.robustness, bounded=2
                )[..., :3]
            )(warped_half[1:], res_alts)
            cert_alts = cert_alts * valid_w[..., None]
            cert_half = jnp.concatenate(
                [jnp.ones((1, hh, hw, 3), jnp.float32), cert_alts], axis=0
            )
            if stage == "robust":
                return cert_half
            st = smoothed_structure_tensor(gray_half[0], cfg.st_window)
            omega_half = kernel_params(st, cfg.merge)
            mc_rb = dataclasses.replace(
                cfg.merge, k_min=max(cfg.merge.k_min, cfg.merge.k_min_rb)
            )
            omega_half_rb = kernel_params(st, mc_rb)
            if stage == "kparams":
                return omega_half + omega_half_rb
            num_p, den_p = merge_burst_raw_planes(
                warped, res_half * 2.0, cert_half, omega_half, omega_half_rb,
                cfg.cfa_pattern, cfg.scale, cfg.merge.radius,
                residual_bound=cfg.residual_bound, k_max=cfg.merge.k_max,
                phase_output=True,
            )
            if stage == "merge":
                return num_p
            fallback_p = upsample_int_phases_planes(half[0], 2 * cfg.scale, "bilinear")
            out_p = apply_weighting(
                num_p, den_p, fallback_p, cfg.merge.weight_threshold
            )
            if cfg.gamma:
                out_p = srgb_gamma(out_p)
            return jnp.clip(interleave_phases_planes(out_p), 0.0, 1.0)

        return fn

    return upto


def main():
    import jax.numpy as jnp

    from profile_stages import amortized_ms

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    stages = sys.argv[3:] or [
        "subsample", "estimate", "prealign", "align", "warp", "lk",
        "robust", "kparams", "merge", "full",
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
        print(f"upto {st:10s} {ms:7.3f} ms  (+{ms - prev:6.3f})", flush=True)
        prev = ms


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
