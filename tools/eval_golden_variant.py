"""Golden self-consistency (test_golden.py protocol) for an arbitrary
config-override variant, RAW and/or RGB pipelines.

Usage:
  python tools/run_cpu.py tools/eval_golden_variant.py [raw|rgb|both] \
      [key=val,key=val ...]
Each extra arg is one comma-joined override set (eval_fidelity syntax);
'base' is always printed first.
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def main():
    import jax
    import jax.numpy as jnp

    from eval_fidelity import parse_variant

    from multi_frame_super_resolution_tpu.config import (
        AlignConfig,
        HandheldConfig,
    )
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models import (
        handheld_superres,
        handheld_superres_raw,
    )
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2
    from multi_frame_super_resolution_tpu.utils import psnr

    which = sys.argv[1] if len(sys.argv) > 1 else "raw"
    specs = ["base"] + [a for a in sys.argv[2:]]

    for name, tile in [("city", 16), ("car", 8), ("iso", 16)]:
        burst = load_burst(name)
        base = dataclasses.replace(
            HandheldConfig(
                align=AlignConfig(tile_size=tile, search_radius=4, levels=2),
                gamma=False,
            ),
            final_restore=False,
        )
        raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in burst]))
        rgb = jnp.asarray(np.stack([np.asarray(f) for f in burst]))
        for spec in specs:
            toks = [] if spec == "base" else spec.split(",")
            vname, cfg, _ = parse_variant(toks, base)
            row = [f"{name:5s} {spec:40s}"]
            if which in ("raw", "both"):
                out = jax.jit(
                    lambda b, c=cfg: handheld_superres_raw(b, c)
                )(raw)
                row.append(
                    f"raw={float(psnr(jnp.asarray(burst[0]), downsample2(out))):.2f}"
                )
            if which in ("rgb", "both"):
                out = jax.jit(lambda b, c=cfg: handheld_superres(b, c))(rgb)
                row.append(
                    f"rgb={float(psnr(jnp.asarray(burst[0]), downsample2(out))):.2f}"
                )
            print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
