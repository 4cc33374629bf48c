"""RAW pipeline quality sweep on the city burst: guided R/B on/off,
k_min_rb values. Prints PSNR of downsample2(out) vs the reference frame
(the golden-test metric). Run: python tools/eval_raw_quality.py"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models import handheld_superres_raw
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2
    from multi_frame_super_resolution_tpu.utils import psnr

    burst = load_burst("city")
    raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in burst]))
    ref = jnp.asarray(burst[0])

    base = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )

    variants = [
        ("unguided k_min_rb=1.0", dataclasses.replace(
            base, merge=dataclasses.replace(base.merge, guided_rb=False))),
        ("guided   k_min_rb=1.0", dataclasses.replace(
            base, merge=dataclasses.replace(base.merge, guided_rb=True))),
        ("guided   k_min_rb=0.5", dataclasses.replace(
            base, merge=dataclasses.replace(base.merge, guided_rb=True,
                                            k_min_rb=0.5))),
        ("guided   k_min_rb=0.25", dataclasses.replace(
            base, merge=dataclasses.replace(base.merge, guided_rb=True,
                                            k_min_rb=0.25))),
    ]
    for name, cfg in variants:
        out = jax.jit(lambda b, c=cfg: handheld_superres_raw(b, c))(raw)
        p = float(psnr(ref, downsample2(out)))
        # also PSNR per channel for diagnosis
        d = downsample2(out)
        per = [
            float(psnr(ref[..., c], d[..., c])) for c in range(3)
        ]
        print(f"{name}: psnr={p:.2f} dB   (R {per[0]:.2f} / G {per[1]:.2f} / B {per[2]:.2f})")


if __name__ == "__main__":
    main()
