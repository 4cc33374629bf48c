"""Back-to-back variant benchmarking of the RAW fast pipeline on TPU.

Tunnel throughput drifts by ~±0.3 ms between sessions, so variants are
measured interleaved in ONE process and reported relative to the
baseline measured in the same session. Also reports the city
self-consistency PSNR per variant so speedups that cost quality are
visible immediately.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_variants_r3.py
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from profile_stages import amortized_ms

    from multi_frame_super_resolution_tpu.config import (
        AlignConfig,
        HandheldConfig,
        LKConfig,
    )
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models import handheld_superres_raw
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2
    from multi_frame_super_resolution_tpu.utils import psnr

    burst = load_burst("city")
    raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in burst]))

    base = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )
    variants = {
        "base": base,
        "fineR2": dataclasses.replace(
            base, align=dataclasses.replace(base.align, fine_radius=2)
        ),
        "fineR2+lk1it": dataclasses.replace(
            base,
            align=dataclasses.replace(base.align, fine_radius=2),
            lk=dataclasses.replace(base.lk, iterations=1),
        ),
        "nolk": dataclasses.replace(base, use_lk=False),
        "noprealign": dataclasses.replace(base, prealign=False),
        "bf16merge": dataclasses.replace(
            base, merge=dataclasses.replace(base.merge, bf16=True)
        ),
        "bf16lk": dataclasses.replace(
            base, lk=dataclasses.replace(base.lk, bf16=True)
        ),
        "bf16both": dataclasses.replace(
            base,
            merge=dataclasses.replace(base.merge, bf16=True),
            lk=dataclasses.replace(base.lk, bf16=True),
        ),
    }

    if len(sys.argv) > 1:  # filter: variant names on the command line
        variants = {k: v for k, v in variants.items() if k in sys.argv[1:]}

    ref = jnp.asarray(burst[0])
    results = {}
    for rep in range(2):
        for name, cfg in variants.items():
            fn = lambda b, c=cfg: handheld_superres_raw(b, c)  # noqa: E731
            ms = amortized_ms(fn, raw, k=8, reps=3)
            out = jax.jit(fn)(raw)
            p = float(psnr(ref, downsample2(out)))
            results.setdefault(name, []).append(ms)
            print(f"[rep {rep}] {name:14s} {ms:6.3f} ms  psnr {p:.2f} dB", flush=True)
    print("--- medians ---")
    for name, vals in results.items():
        print(f"{name:14s} {float(np.median(vals)):6.3f} ms")


if __name__ == "__main__":
    main()
