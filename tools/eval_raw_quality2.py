"""Diagnose the RAW golden-metric ceiling: single-frame baselines + a
config sweep. Metric = psnr(ref_frame, downsample2(out)) as in
tests/test_golden.py. Run: python tools/eval_raw_quality2.py"""

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
    from multi_frame_super_resolution_tpu.models import handheld_superres_raw
    from multi_frame_super_resolution_tpu.ops.debayer import debayer
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2
    from multi_frame_super_resolution_tpu.utils import psnr

    burst = load_burst("city")
    raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in burst]))
    ref = jnp.asarray(burst[0])

    def report(name, img):
        p = float(psnr(ref, img))
        per = [float(psnr(ref[..., c], img[..., c])) for c in range(3)]
        print(f"{name}: {p:.2f} dB (R {per[0]:.2f} / G {per[1]:.2f} / B {per[2]:.2f})")

    # single-frame baseline: demosaic of the reference RAW frame, no SR
    demo = jax.jit(lambda r: debayer(r, ((0, 1), (1, 2))))(raw[0])
    report("debayer(raw0) fullres", demo)

    base = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )

    def run(name, cfg):
        out = jax.jit(lambda b, c=cfg: handheld_superres_raw(b, c))(raw)
        report(name, downsample2(out))

    mc = base.merge
    variants = [
        ("base (unguided)", dataclasses.replace(
            base, merge=dataclasses.replace(mc, guided_rb=False))),
        ("k_min=0.15", dataclasses.replace(
            base, merge=dataclasses.replace(mc, guided_rb=False, k_min=0.15))),
        ("k_max=0.7", dataclasses.replace(
            base, merge=dataclasses.replace(mc, guided_rb=False, k_max=0.7))),
        ("k_detail=0.15", dataclasses.replace(
            base, merge=dataclasses.replace(mc, guided_rb=False, k_detail=0.15))),
        ("st_window=5", dataclasses.replace(
            base, st_window=5,
            merge=dataclasses.replace(mc, guided_rb=False))),
        ("lk_iters=3", dataclasses.replace(
            base, lk=dataclasses.replace(base.lk, iterations=3),
            merge=dataclasses.replace(mc, guided_rb=False))),
        ("consistency", dataclasses.replace(
            base, use_consistency=True,
            merge=dataclasses.replace(mc, guided_rb=False))),
        ("k_min_rb=0.7", dataclasses.replace(
            base, merge=dataclasses.replace(mc, guided_rb=False, k_min_rb=0.7))),
        ("k_min_rb=1.5", dataclasses.replace(
            base, merge=dataclasses.replace(mc, guided_rb=False, k_min_rb=1.5))),
    ]
    for name, cfg in variants:
        run(name, cfg)


if __name__ == "__main__":
    main()
