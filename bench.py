"""Headline benchmark: end-to-end 5-frame align+fuse 2x super-resolution
throughput on one chip (BASELINE.json metric: MP/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 500 (the driver-supplied north-star 500 MP/s/chip).
Protocol mirrors the reference harnesses: warmup then timed loop with
device fencing (multi_frame_sr.cpp:187-206).
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.models import handheld_superres
    from multi_frame_super_resolution_tpu.utils.timing import measure

    # city-burst geometry (5 x 256 x 512 x 3); use the real burst when the
    # reference data is mounted, synthetic otherwise
    try:
        from multi_frame_super_resolution_tpu.data import load_burst

        burst_np = load_burst("city")
    except Exception:
        from multi_frame_super_resolution_tpu.data import synthetic_burst

        g, _ = synthetic_burst(
            np.random.default_rng(0), num_frames=5, height=256, width=512, max_shift=3.0
        )
        burst_np = np.stack([g] * 3, axis=-1)

    from multi_frame_super_resolution_tpu.parallel.runner import (
        default_mesh,
        make_batched_pipeline,
    )

    # batch bursts to fill the chip (sharded on 'data' when multi-chip)
    mesh = default_mesh()
    per_device = int(os.environ.get("MFSR_BENCH_BATCH", "4"))
    batch = per_device * (len(jax.devices()) if mesh else 1)
    bursts = jnp.asarray(np.stack([burst_np] * batch))

    cfg = HandheldConfig(align=AlignConfig(tile_size=16, search_radius=4, levels=3))
    fn = make_batched_pipeline(lambda b: handheld_superres(b, cfg), mesh)
    if mesh:
        bursts = jax.device_put(
            bursts, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
        )

    out_h = burst_np.shape[1] * cfg.scale
    out_w = burst_np.shape[2] * cfg.scale
    pixels_per_iter = float(batch * out_h * out_w)

    result = measure(
        lambda: fn(bursts),
        warmup=3,
        iters=int(os.environ.get("MFSR_BENCH_ITERS", "10")),
        name="handheld-sr-2x",
        pixels_per_iter=pixels_per_iter,
    )

    n_chips = max(len(jax.devices()), 1)
    value = result.mp_per_s / n_chips
    print(
        json.dumps(
            {
                "metric": "handheld_burst_sr_2x_throughput",
                "value": round(value, 2),
                "unit": "MP/s/chip (output megapixels)",
                "vs_baseline": round(value / 500.0, 4),
                "p50_burst_latency_ms": round(result.p50 * 1000.0 / batch, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
