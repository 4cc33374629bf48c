"""Handheld burst-SR CLI — the flagship pipeline over the bundled bursts.

    mfsr-handheld [inputName] [scale] [--raw]

Runs the end-to-end align + robustness + kernel-regression merge at the
given scale on a named burst (city | car | iso), reports seconds / FPS /
MP/s with the warmup-then-measure protocol, and writes
``{input}_handheld_sr.png``. ``--raw`` mosaics the burst first and runs
the Bayer RAW pipeline (demosaic-free merge).
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    use_raw = "--raw" in argv
    argv = [a for a in argv if a != "--raw"]
    input_name = argv[0] if argv else "city"
    scale = int(argv[1]) if len(argv) > 1 else 2

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multi_frame_super_resolution_tpu.config import HandheldConfig
    from multi_frame_super_resolution_tpu.data import imwrite, load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models import (
        handheld_superres,
        handheld_superres_raw,
    )
    from multi_frame_super_resolution_tpu.utils.timing import measure

    burst_np = load_burst(input_name)
    cfg = HandheldConfig(scale=scale)

    if use_raw:
        raw = np.stack([mosaic_rggb(f) for f in burst_np])
        data = jnp.asarray(raw)
        fn = jax.jit(lambda b: handheld_superres_raw(b, cfg))
    else:
        data = jnp.asarray(burst_np)
        fn = jax.jit(lambda b: handheld_superres(b, cfg))

    import os

    out_px = burst_np.shape[1] * scale * burst_np.shape[2] * scale
    result = measure(
        lambda: fn(data),
        warmup=max(int(os.environ.get("MFSR_BENCH_WARMUP", "2")), 1),
        iters=max(int(os.environ.get("MFSR_BENCH_ITERS", "10")), 1),
        name=f"handheld-{input_name}{'-raw' if use_raw else ''}",
        pixels_per_iter=float(out_px),
    )
    print(result)

    out = np.asarray(fn(data))
    imwrite(f"{input_name}_handheld_sr.png", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
