"""Weak-scaling check of burst-batch data parallelism (SURVEY §2.6).

On a virtual CPU mesh every "device" shares one host's physical cores,
so bursts/s/device can never be flat — naive weak scaling measures core
contention, not SPMD overhead. The fair virtual-mesh check runs the SAME
total work (batch = 8 bursts) two ways on the same silicon:

  * vmap over batch on ONE device (no partitioning), and
  * the same vmap sharded batch-first over 8 devices (the production
    data-parallel program, XLA-partitioned SPMD).

The ratio isolates what data parallelism adds: partitioning,
per-device dispatch, and the output gather. ~1.0x means the partitioned
program does no redundant work and hides no collectives — on real
multi-chip hardware (own cores per chip) that is the whole story, since
burst SR is embarrassingly parallel across bursts.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=/root/repo python tools/bench_dp_scaling.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models import handheld_superres_raw
    from multi_frame_super_resolution_tpu.parallel.mesh import make_mesh
    from multi_frame_super_resolution_tpu.parallel.runner import (
        make_batched_pipeline,
    )

    devices = jax.devices()
    assert len(devices) >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )

    burst = load_burst("city")
    raw = np.stack([mosaic_rggb(f) for f in burst]).astype(np.float32)
    cfg = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )
    fn = lambda b: handheld_superres_raw(b, cfg)  # noqa: E731

    nb = 8
    batch = jnp.asarray(
        np.stack([raw * (1.0 - 1e-3 * i) for i in range(nb)])
    )

    def timed(batched):
        jax.block_until_ready(batched(batch))
        times = []
        for rep in range(3):
            b2 = batch * (1.0 - 1e-4 * (rep + 1))
            jax.block_until_ready(b2)
            t0 = time.perf_counter()
            jax.block_until_ready(batched(b2))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    single = timed(make_batched_pipeline(fn, mesh=None, mode="vmap"))
    mesh = make_mesh(("data",), (nb,), devices=devices[:nb])
    sharded = timed(make_batched_pipeline(fn, mesh=mesh, mode="vmap"))
    print(f"batch={nb} on 1 device (vmap):      {single * 1e3:8.1f} ms")
    print(f"batch={nb} sharded over {nb} devices: {sharded * 1e3:8.1f} ms")
    print(
        f"data-parallel partitioning overhead: {sharded / single:.2f}x "
        "(1.0x = partitioned program adds no redundant work)"
    )


if __name__ == "__main__":
    main()
