"""Isolated micro-benchmarks of the RAW fast-pipeline stages on TPU.

Isolated timings lose XLA fusion context (variant differencing stays the
honest in-context instrument, tools/bench_variants_r3.py), but they give
absolute floors and expose pure data-movement hogs that fusion cannot
hide. Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/micro_r3.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from profile_stages import amortized_ms

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
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
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        interleave_phases_planes,
        tile_warp_select,
        upsample_int_phases_planes,
    )
    from multi_frame_super_resolution_tpu.registration.align import align_burst
    from multi_frame_super_resolution_tpu.registration.lucas_kanade import lk_refine
    from multi_frame_super_resolution_tpu.registration.prealign import (
        apply_planes_similarity,
        estimate_burst_similarity,
        prealign_planes,
    )

    burst = load_burst("city")
    raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in burst]))
    cfg = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )
    f, h, w = raw.shape
    hh, hw = h // 2, w // 2
    rng = np.random.default_rng(0)

    planes = raw_to_planes(raw)
    half = _subsample_from_planes(planes, cfg.cfa_pattern)
    gray_half = rgb_to_gray(half)
    res_half = jnp.asarray(
        rng.uniform(-0.5, 0.5, (f, hh, hw, 2)).astype(np.float32)
    )
    cert_half = jnp.asarray(rng.uniform(0.2, 1.0, (f, hh, hw, 3)).astype(np.float32))
    st_t = smoothed_structure_tensor(gray_half[0], cfg.st_window)
    omega = kernel_params(st_t, cfg.merge)
    mc_rb = dataclasses.replace(
        cfg.merge, k_min=max(cfg.merge.k_min, cfg.merge.k_min_rb)
    )
    omega_rb = kernel_params(st_t, mc_rb)
    ints = jnp.asarray(rng.integers(-3, 4, (f - 1, hh // 16 + 1, hw // 16, 2)).astype(np.int32))

    num_p = jnp.asarray(
        rng.uniform(0.0, 1.0, (4, 4, 3, hh, hw)).astype(np.float32)
    )
    den_p = jnp.asarray(rng.uniform(0.5, 2.0, (4, 4, 3, hh, hw)).astype(np.float32))

    t = cfg.align.tile_size

    cases = {
        "subsample+gray": lambda r: rgb_to_gray(
            _subsample_from_planes(raw_to_planes(r), cfg.cfa_pattern)
        ),
        "estimate": lambda g: estimate_burst_similarity(g, cfg.prealign_cfg),
        "prealign_planes(est+apply)": lambda r: prealign_planes(
            raw_to_planes(r), gray_half, cfg.prealign_cfg
        )[0],
        "align_burst": lambda g: align_burst(g, cfg.align),
        "tile_warp x20": lambda r: jax.vmap(
            lambda fr, s: tile_warp_select(fr, s, t, bound=16)
        )(
            jnp.concatenate(
                [
                    raw_to_planes(r)[1:].reshape((f - 1) * 4, hh, hw),
                    raw_to_planes(r)[1:, 0, 0],
                ],
                axis=0,
            ),
            jnp.repeat(ints, 5, axis=0),
        ),
        "lk x4": lambda g: jax.vmap(
            lambda gg, fl: lk_refine(
                g[0], gg, fl, dataclasses.replace(cfg.lk, bounded_warp=2)
            )
        )(g[1:], res_half[1:]),
        "robust x4": lambda hl: jax.vmap(
            lambda mv, fl: robustness_mask(hl[0], mv, fl, cfg.robustness, bounded=2)[
                ..., :3
            ]
        )(hl[1:], res_half[1:]),
        "kparams": lambda g: kernel_params(
            smoothed_structure_tensor(g[0], cfg.st_window), cfg.merge
        ),
        "merge_raw_planes": lambda p: merge_burst_raw_planes(
            p, res_half * 2.0, cert_half, omega, omega_rb, cfg.cfa_pattern,
            cfg.scale, cfg.merge.radius, residual_bound=cfg.residual_bound,
            k_max=cfg.merge.k_max, phase_output=True,
        )[0],
        "fallback_up4": lambda hl: upsample_int_phases_planes(
            hl[0], 2 * cfg.scale, "bilinear"
        ),
        "apply_weighting(phase)": lambda n: apply_weighting(
            n, den_p, upsample_int_phases_planes(half[0], 4, "bilinear"), 8.0
        ),
        "interleave": lambda n: interleave_phases_planes(n),
        "interleave+clip": lambda n: jnp.clip(interleave_phases_planes(n), 0.0, 1.0),
        "tail(fb+aw+clip+il)": lambda n: jnp.clip(
            interleave_phases_planes(
                apply_weighting(
                    n, den_p, upsample_int_phases_planes(half[0], 4, "bilinear"), 8.0
                )
            ),
            0.0,
            1.0,
        ),
    }
    args = {
        "subsample+gray": raw,
        "estimate": gray_half,
        "prealign_planes(est+apply)": raw,
        "align_burst": gray_half,
        "tile_warp x20": raw,
        "lk x4": gray_half,
        "robust x4": half,
        "kparams": gray_half,
        "merge_raw_planes": planes,
        "fallback_up4": half,
        "apply_weighting(phase)": num_p,
        "interleave": num_p,
        "interleave+clip": num_p,
        "tail(fb+aw+clip+il)": num_p,
    }

    names = sys.argv[1:] or list(cases)
    for name in names:
        ms = amortized_ms(cases[name], args[name], k=12, reps=3)
        print(f"{name:28s} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
