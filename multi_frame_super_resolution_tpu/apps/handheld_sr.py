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
    from multi_frame_super_resolution_tpu.utils.timing import (
        measure,
        measure_amortized,
    )

    burst_np = load_burst(input_name)
    cfg = HandheldConfig(scale=scale)

    if use_raw:
        raw = np.stack([mosaic_rggb(f) for f in burst_np])
        data = jnp.asarray(raw)
        fn = jax.jit(lambda b: handheld_superres_raw(b, cfg))
        raw_fn = lambda b: handheld_superres_raw(b, cfg)  # noqa: E731
    else:
        data = jnp.asarray(burst_np)
        fn = jax.jit(lambda b: handheld_superres(b, cfg))
        raw_fn = lambda b: handheld_superres(b, cfg)  # noqa: E731

    import os

    out_px = burst_np.shape[1] * scale * burst_np.shape[2] * scale
    # per-dispatch protocol: perturbed inputs + value-readback fence
    # (on a tunneled backend this includes the ~30 ms RPC floor)
    result = measure(
        fn,
        args=(data,),
        warmup=max(int(os.environ.get("MFSR_BENCH_WARMUP", "2")), 1),
        iters=max(int(os.environ.get("MFSR_BENCH_ITERS", "10")), 1),
        name=f"handheld-{input_name}{'-raw' if use_raw else ''}",
        pixels_per_iter=float(out_px),
    )
    # in-graph amortized marginal latency: the dispatch-floor-free number
    # (the one comparable to BENCH_r*.json); skipped via env for smoke runs
    if os.environ.get("MFSR_BENCH_AMORTIZED", "1") != "0":
        result.amortized_sec = measure_amortized(
            raw_fn,
            (data,),
            k=max(int(os.environ.get("MFSR_BENCH_K", "8")), 2),
            reps=max(int(os.environ.get("MFSR_BENCH_REPS", "2")), 1),
        )
    print(result)

    out = np.asarray(fn(data))
    imwrite(f"{input_name}_handheld_sr.png", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
