"""Cumulative early-return timing of the RGB handheld fast path
(half_align hybrid). Mirrors profile_upto_r3.py for the RGB pipeline.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_rgb_r3.py [k] [reps]
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np


def build_upto(cfg):
    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.models.fast_merge import merge_burst_fast
    from multi_frame_super_resolution_tpu.models.merge import (
        apply_weighting,
        kernel_params,
        smoothed_structure_tensor,
    )
    from multi_frame_super_resolution_tpu.models.robustness import robustness_mask
    from multi_frame_super_resolution_tpu.ops.color import rgb_to_gray
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2
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
        prealign_burst,
    )

    def upto(stage):
        def fn(burst):
            f, h, w = burst.shape[:3]
            t = cfg.align.tile_size
            gray = rgb_to_gray(burst)
            if stage == "gray":
                return gray
            if stage == "estimate":
                st = estimate_burst_similarity(gray, cfg.prealign_cfg)
                return st.rotation + st.scale + st.translation.sum(-1)
            burst, prevalid = prealign_burst(burst, gray, cfg.prealign_cfg)
            gray = rgb_to_gray(burst)
            burst = jnp.concatenate([burst, prevalid[..., None]], axis=-1)
            if stage == "prealign":
                return gray
            gray_est = jax.vmap(downsample2)(gray)
            warp_t = 2 * t
            tile_shifts = align_burst(gray_est, cfg.align) * 2.0
            int_shifts, res_tiles = tile_shift_decompose(tile_shifts)
            if stage == "align":
                return tile_shifts
            c = burst.shape[-1]
            stack = burst[1:].transpose(0, 3, 1, 2).reshape((f - 1) * c, h, w)
            ints_rep = jnp.repeat(int_shifts[1:], c, axis=0)
            warped_alts = (
                jax.vmap(lambda fr, ints: tile_warp_select(fr, ints, warp_t))(
                    stack, ints_rep
                )
                .reshape(f - 1, c, h, w)
                .transpose(0, 2, 3, 1)
            )
            warped = jnp.concatenate([burst[:1], warped_alts], axis=0)
            valid_w = warped[..., 3]
            warped = warped[..., :3]
            burst = burst[..., :3]
            if stage == "warp":
                return warped

            def lift(res):
                return jnp.repeat(
                    jnp.repeat(res, warp_t, axis=0), warp_t, axis=1
                )[:h, :w]

            res_flow = jax.vmap(lift)(res_tiles)
            lk_cfg = dataclasses.replace(
                cfg.lk, bounded_warp=max(int(cfg.residual_bound) + 1, 2)
            )
            gray_w = rgb_to_gray(warped)
            res_flow = jax.vmap(
                lambda g, fl: lk_refine(gray_w[0], g, fl, lk_cfg)
            )(gray_w, res_flow)
            res_flow = res_flow.at[0].set(0.0)
            res_flow = jnp.clip(
                res_flow, -cfg.residual_bound, cfg.residual_bound
            )
            if stage == "lk":
                return res_flow
            cert = jax.vmap(
                lambda mv, fl: robustness_mask(
                    warped[0], mv, fl, cfg.robustness, bounded=2
                )[..., :3]
            )(warped, res_flow)
            cert = cert * valid_w[..., None]
            cert = cert.at[0].set(1.0)
            if stage == "robust":
                return cert
            st = smoothed_structure_tensor(gray[0], cfg.st_window)
            omega_inv = kernel_params(st, cfg.merge)
            if stage == "kparams":
                return omega_inv
            num_p, den_p = merge_burst_fast(
                warped, res_flow, cert, omega_inv, cfg.scale,
                cfg.merge.radius, cfg.residual_bound,
                k_max=cfg.merge.k_max, phase_output=True,
            )
            if stage == "merge":
                return num_p
            fallback_p = upsample_int_phases_planes(burst[0], cfg.scale, "bicubic")
            out_p = apply_weighting(
                num_p, den_p, fallback_p, cfg.merge.weight_threshold
            )
            return jnp.clip(interleave_phases_planes(out_p), 0.0, 1.0)

        return fn

    return upto


def main():
    import jax.numpy as jnp

    from profile_stages import amortized_ms

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    stages = sys.argv[3:] or [
        "gray", "estimate", "prealign", "align", "warp", "lk",
        "robust", "kparams", "merge", "full",
    ]

    burst = jnp.asarray(load_burst("city"))
    cfg = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )
    upto = build_upto(cfg)
    prev = 0.0
    for st in stages:
        ms = amortized_ms(upto(st), burst, k=k, reps=reps)
        print(f"upto {st:10s} {ms:7.3f} ms  (+{ms - prev:6.3f})", flush=True)
        prev = ms


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
