"""Measure alignment accuracy on the city burst: photometric PSNR of
each warped alternate vs the reference at half resolution, before/after
residual correction, plus certainty mass. If warps are accurate the
merge can't be blaming alignment."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models.fast_merge import raw_to_planes
    from multi_frame_super_resolution_tpu.models.handheld import (
        _subsample_from_planes,
    )
    from multi_frame_super_resolution_tpu.models.robustness import robustness_mask
    from multi_frame_super_resolution_tpu.ops.color import rgb_to_gray
    from multi_frame_super_resolution_tpu.ops.geometry import warp_backward
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        tile_shift_decompose,
        tile_warp_select,
    )
    from multi_frame_super_resolution_tpu.registration.align import align_burst
    from multi_frame_super_resolution_tpu.registration.lucas_kanade import lk_refine
    from multi_frame_super_resolution_tpu.utils import psnr

    import os
    ts = int(os.environ.get("TS", 16))
    sr = int(os.environ.get("SR", 4))
    lv = int(os.environ.get("LV", 2))
    cfg = HandheldConfig(
        align=AlignConfig(tile_size=ts, search_radius=sr, levels=lv), gamma=False
    )
    print(f"align config: tile_size={ts} search_radius={sr} levels={lv}")
    burst = load_burst("city")
    raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in burst]))
    f, h, w = raw.shape
    t = cfg.align.tile_size
    hh, hw = h // 2, w // 2

    planes = raw_to_planes(raw)
    half = _subsample_from_planes(planes, cfg.cfa_pattern)
    gray_half = rgb_to_gray(half)

    tile_shifts = jax.jit(lambda g: align_burst(g, cfg.align))(gray_half)
    int_half, res_tiles = tile_shift_decompose(tile_shifts)
    print("tile shift stats per frame (half-res units):")
    for k in range(f):
        ts = np.asarray(tile_shifts[k])
        print(f"  frame {k}: mean {ts.mean((0,1))}, min {ts.min((0,1))}, "
              f"max {ts.max((0,1))}")

    stack = planes[1:].reshape((f - 1) * 4, hh, hw)
    ints_rep = jnp.repeat(int_half[1:], 4, axis=0)
    warped_alts = jax.vmap(
        lambda fr, ints: tile_warp_select(fr, ints, t, bound=16)
    )(stack, ints_rep).reshape(f - 1, 2, 2, hh, hw)
    warped = jnp.concatenate([planes[:1], warped_alts], axis=0)
    warped_half = _subsample_from_planes(warped, cfg.cfa_pattern)
    gray_wh = rgb_to_gray(warped_half)

    def lift_half(res):
        return jnp.repeat(jnp.repeat(res, t, axis=0), t, axis=1)[:hh, :hw]

    res_alts0 = jax.vmap(lift_half)(res_tiles[1:])
    lk_cfg = dataclasses.replace(cfg.lk, bounded_warp=2)
    res_alts = jax.vmap(
        lambda g, fl: lk_refine(gray_wh[0], g, fl, lk_cfg)
    )(gray_wh[1:], res_alts0)
    res_clip = jnp.clip(res_alts, -0.5 * cfg.residual_bound, 0.5 * cfg.residual_bound)

    m = 8  # border crop
    print("\nwarped-alternate luma PSNR vs ref (half-res, interior):")
    for k in range(f - 1):
        base = float(psnr(gray_half[0][m:-m, m:-m], gray_half[k + 1][m:-m, m:-m]))
        after_int = float(psnr(gray_wh[0][m:-m, m:-m], gray_wh[k + 1][m:-m, m:-m]))
        w_res = warp_backward(gray_wh[k + 1], res_clip[k])
        after_res = float(psnr(gray_wh[0][m:-m, m:-m], w_res[m:-m, m:-m]))
        rr = np.asarray(res_alts[k])
        clipped_frac = float((np.abs(rr) >= 0.5 * cfg.residual_bound - 1e-6).mean())
        print(f"  frame {k+1}: unaligned {base:.2f} | int-warp {after_int:.2f} | "
              f"+residual warp {after_res:.2f} dB | residual |.| mean "
              f"{np.abs(rr).mean():.3f} max {np.abs(rr).max():.2f} "
              f"clipped {clipped_frac:.1%}")

    cert = jax.vmap(
        lambda mv, fl: robustness_mask(
            warped_half[0], mv, fl, cfg.robustness, bounded=2
        )[..., :3]
    )(warped_half[1:], res_clip)
    print("\ncertainty mass per alternate (mean over pixels/channels):")
    for k in range(f - 1):
        print(f"  frame {k+1}: {float(np.asarray(cert[k]).mean()):.3f}")


if __name__ == "__main__":
    main()
