"""Quick golden-metric eval across datasets/paths (see tests/test_golden.py).
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_golden_quick.py"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models import handheld_superres, handheld_superres_raw
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2
    from multi_frame_super_resolution_tpu.utils import psnr

    import os
    sel = os.environ.get("MFSR_EVAL_SETS", "city,car,iso").split(",")
    for name, tile in [("city", 16), ("car", 8), ("iso", 16)]:
        if name not in sel:
            continue
        burst = load_burst(name)
        cfg = HandheldConfig(align=AlignConfig(tile_size=tile, search_radius=4, levels=2), gamma=False)
        raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in burst]))
        out = jax.jit(lambda b, c=cfg: handheld_superres_raw(b, c))(raw)
        p_raw = float(psnr(jnp.asarray(burst[0]), downsample2(out)))
        out = jax.jit(lambda b, c=cfg: handheld_superres(b, c))(jnp.asarray(burst))
        p_rgb = float(psnr(jnp.asarray(burst[0]), downsample2(out)))
        print(f"{name}: RAW {p_raw:.2f} dB  RGB {p_rgb:.2f} dB")

if __name__ == "__main__":
    main()
