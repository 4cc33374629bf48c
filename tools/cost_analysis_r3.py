"""XLA cost analysis of the RAW fast pipeline: total FLOPs / HBM bytes
vs v5e speed-of-light, plus the largest line items, to locate the real
bound (compute vs bandwidth vs serialization).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/cost_analysis_r3.py
"""

from __future__ import annotations

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models import handheld_superres_raw

    burst = load_burst("city")
    raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in burst]))
    cfg = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )
    fn = jax.jit(lambda b: handheld_superres_raw(b, cfg))
    lowered = fn.lower(raw)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_ = ca.get("bytes accessed", float("nan"))
    print(f"total flops            : {flops/1e9:.3f} GFLOP")
    print(f"total bytes accessed   : {bytes_/1e6:.1f} MB")
    # v5e speed of light: ~197 TFLOPS bf16 MXU (f32 ~1/2..1/4), HBM 819 GB/s
    print(f"HBM-bound floor        : {bytes_/819e9*1e3:.3f} ms")
    print(f"MXU f32 floor (98 TF)  : {flops/98e12*1e3:.3f} ms")
    for k in sorted(ca):
        v = ca[k]
        if isinstance(v, (int, float)) and v and k not in ("flops", "bytes accessed"):
            print(f"  {k:40s} {v:.3e}")


if __name__ == "__main__":
    main()
