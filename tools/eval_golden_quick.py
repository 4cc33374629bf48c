"""Quick golden self-consistency measurement on the bundled bursts.

Prints psnr(ref frame, downsample2(SR)) for the RAW and RGB handheld
pipelines at the test_golden.py configs — run after algorithm changes to
recalibrate the golden floors. Usage:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/eval_golden_quick.py [raw|rgb|both] [norestore]
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    norestore = "norestore" in sys.argv[2:]
    for name, tile in [("city", 16), ("car", 8), ("iso", 16)]:
        burst = load_burst(name)
        cfg = HandheldConfig(
            align=AlignConfig(tile_size=tile, search_radius=4, levels=2),
            gamma=False,
        )
        if norestore:
            cfg = dataclasses.replace(cfg, final_restore=False)
        if which in ("raw", "both"):
            raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in burst]))
            out = jax.jit(lambda b, c=cfg: handheld_superres_raw(b, c))(raw)
            p = float(psnr(jnp.asarray(burst[0]), downsample2(out)))
            print(f"{name:5s} RAW  {p:6.2f} dB", flush=True)
        if which in ("rgb", "both"):
            bj = jnp.asarray(burst)
            out = jax.jit(lambda b, c=cfg: handheld_superres(b, c))(bj)
            p = float(psnr(bj[0], downsample2(out)))
            print(f"{name:5s} RGB  {p:6.2f} dB", flush=True)


if __name__ == "__main__":
    main()
