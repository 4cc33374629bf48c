"""True-HR fidelity evaluation of the RAW pipeline (VERDICT r2 missing
item #4): synthesize a burst FROM a known HR ground truth (city frame 0),
run 2x SR, and report PSNR(SR, HR) per channel, plus fair baselines.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_fidelity.py [variant ...]
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools")


def make_hr_burst(hr, num_frames=5, seed=7, max_shift_hr=3.0, max_rot=0.01):
    """(HR rgb) -> mosaicked LR burst (F, H/2, W/2) + per-frame truths."""
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.data import mosaic_rggb
    from multi_frame_super_resolution_tpu.data.datasets import (
        _rotate_translate_crop,
    )
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2

    h, w = hr.shape[:2]
    rng = np.random.default_rng(seed)
    frames = []
    for f in range(num_frames):
        if f == 0:
            dy = dx = ang = 0.0
        else:
            dy, dx = rng.uniform(-max_shift_hr, max_shift_hr, 2)
            ang = rng.uniform(-max_rot, max_rot)
        warped = np.stack(
            [
                _rotate_translate_crop(hr[..., c], dy, dx, ang, h, w)
                for c in range(3)
            ],
            axis=-1,
        )
        lr = np.asarray(downsample2(jnp.asarray(warped)))
        frames.append(mosaic_rggb(lr))
    return np.stack(frames)


def main():
    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst
    from multi_frame_super_resolution_tpu.models import handheld_superres_raw
    from multi_frame_super_resolution_tpu.ops.debayer import debayer
    from multi_frame_super_resolution_tpu.ops.geometry import upscale
    from multi_frame_super_resolution_tpu.utils import psnr

    hr = load_burst("city")[0]
    raw = jnp.asarray(make_hr_burst(hr))
    hr_j = jnp.asarray(hr)
    m = 16

    def report(name, sr):
        sr = np.asarray(sr)
        vals = [
            float(
                psnr(
                    hr_j[m:-m, m:-m, c], jnp.asarray(sr[m:-m, m:-m, c])
                )
            )
            for c in range(3)
        ]
        tot = float(psnr(hr_j[m:-m, m:-m], jnp.asarray(sr[m:-m, m:-m])))
        print(
            f"{name:28s} {tot:6.2f} dB  (R {vals[0]:5.2f}  G {vals[1]:5.2f} "
            f" B {vals[2]:5.2f})",
            flush=True,
        )
        return tot

    # baseline: single-frame demosaic + bicubic 2x of frame 0
    base = jax.jit(
        lambda r: jnp.clip(
            upscale(debayer(r, ((0, 1), (1, 2))), 2, "bicubic"), 0, 1
        )
    )(raw[0])
    report("demosaic+bicubic frame0", base)

    cfg0 = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )
    mc = cfg0.merge
    variants = {
        "fast default": cfg0,
        "oracle": dataclasses.replace(cfg0, fast=False),
        "k_min_rb=0.5": dataclasses.replace(
            cfg0, merge=dataclasses.replace(mc, k_min_rb=0.5)
        ),
        "k_min_rb=0.25": dataclasses.replace(
            cfg0, merge=dataclasses.replace(mc, k_min_rb=0.25)
        ),
        "guided_rb": dataclasses.replace(
            cfg0, merge=dataclasses.replace(mc, guided_rb=True)
        ),
        "guided+rb0.5": dataclasses.replace(
            cfg0, merge=dataclasses.replace(mc, guided_rb=True, k_min_rb=0.5)
        ),
        "guided+rb0.25": dataclasses.replace(
            cfg0, merge=dataclasses.replace(mc, guided_rb=True, k_min_rb=0.25)
        ),
        "k_min=0.15": dataclasses.replace(
            cfg0, merge=dataclasses.replace(mc, k_min=0.15)
        ),
        "k_detail=0.15": dataclasses.replace(
            cfg0, merge=dataclasses.replace(mc, k_detail=0.15)
        ),
    }
    names = sys.argv[1:] or list(variants)
    for name in names:
        cfg = variants[name]
        sr = jax.jit(lambda b, c=cfg: handheld_superres_raw(b, c))(raw)
        report(name, sr)


if __name__ == "__main__":
    main()
