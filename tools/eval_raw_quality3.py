"""Isolate the RAW merge quality loss: single-frame (no-motion) merges,
oracle vs fast path, guided vs unguided, k sweeps.
Metric = psnr(ref_frame, downsample2(out)) as in tests/test_golden.py."""

from __future__ import annotations

import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models import (
        handheld_superres,
        handheld_superres_raw,
    )
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2
    from multi_frame_super_resolution_tpu.utils import psnr

    burst = load_burst("city")
    raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in burst]))
    ref = jnp.asarray(burst[0])

    def report(name, img):
        p = float(psnr(ref, img))
        per = [float(psnr(ref[..., c], img[..., c])) for c in range(3)]
        print(f"{name}: {p:.2f} dB (R {per[0]:.2f} / G {per[1]:.2f} / B {per[2]:.2f})")

    base = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )

    def run_raw(name, cfg, frames=None):
        r = raw if frames is None else raw[:frames]
        out = jax.jit(lambda b, c=cfg: handheld_superres_raw(b, c))(r)
        report(name, downsample2(out))

    mc = base.merge
    unguided = dataclasses.replace(base, merge=dataclasses.replace(mc, guided_rb=False))
    guided = dataclasses.replace(base, merge=dataclasses.replace(mc, guided_rb=True))

    # single-frame: no motion, no alternates — pure merge reconstruction
    run_raw("F=1 unguided", unguided, frames=1)
    run_raw("F=1 guided", guided, frames=1)
    run_raw("F=1 unguided k_min_rb=0.25", dataclasses.replace(
        base, merge=dataclasses.replace(mc, guided_rb=False, k_min_rb=0.25)),
        frames=1)
    run_raw("F=5 unguided", unguided)
    run_raw("F=5 guided", guided)
    run_raw("F=5 guided k_min_rb=0.25", dataclasses.replace(
        base, merge=dataclasses.replace(mc, guided_rb=True, k_min_rb=0.25)))
    run_raw("F=5 unguided k_min=0.1 k_min_rb=0.5 k_detail=0.1",
            dataclasses.replace(base, merge=dataclasses.replace(
                mc, guided_rb=False, k_min=0.1, k_min_rb=0.5, k_detail=0.1)))
    # oracle (gather) path
    run_raw("F=5 oracle path", dataclasses.replace(unguided, fast=False))

    # RGB path on the same metric for scale
    out = jax.jit(lambda b: handheld_superres(
        jnp.asarray(b), dataclasses.replace(base, gamma=False)))(
        jnp.asarray(burst))
    report("RGB-path F=5", downsample2(out))


if __name__ == "__main__":
    main()
