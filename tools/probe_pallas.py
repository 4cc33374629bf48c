"""Probe the environment's Mosaic (Pallas TPU) compile service.

The round-1 finding (BENCH_NOTES.md) was that every Pallas kernel is
rejected by this environment's remote compile service; this probe re-runs
the check each round so the Pallas paths can be flipped on the moment the
service works. Run: python tools/probe_pallas.py
"""

from __future__ import annotations

import sys
import traceback


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    failures = 0

    # 1. trivial VMEM kernel
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k(i_ref, o_ref):
            o_ref[:] = i_ref[:] * 2.0

        x = jnp.asarray(rng.random((128, 256)), jnp.float32)
        y = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2.0, rtol=1e-6)
        print("PASS trivial vmem kernel")
    except Exception:
        failures += 1
        print("FAIL trivial vmem kernel:")
        traceback.print_exc(limit=2)

    # 2. tile-warp DMA kernel
    try:
        from multi_frame_super_resolution_tpu.pallas_ops import tile_warp_pallas

        img = jnp.asarray(rng.random((64, 128)), jnp.float32)
        shifts = jnp.asarray(rng.integers(-5, 6, (4, 8, 2)), jnp.int32)
        out = tile_warp_pallas(img, shifts, 16)
        jax.block_until_ready(out)
        print("PASS tile_warp_pallas")
    except Exception:
        failures += 1
        print("FAIL tile_warp_pallas:")
        traceback.print_exc(limit=2)

    # 2b. tile-gather window-extraction DMA kernel (AlignConfig's former
    # pallas extraction path — same 16-px lane slicing as tile_warp)
    try:
        from multi_frame_super_resolution_tpu.pallas_ops.tile_gather import (
            tile_gather_pallas,
        )

        img = jnp.asarray(rng.random((64, 128)), jnp.float32)
        pre = jnp.asarray(rng.integers(-3, 4, (4, 8, 2)), jnp.int32)
        out = tile_gather_pallas(img, pre, 16, 4)
        jax.block_until_ready(out)
        print("PASS tile_gather_pallas")
    except Exception:
        failures += 1
        print("FAIL tile_gather_pallas:")
        traceback.print_exc(limit=2)

    # 3. merge kernel
    try:
        from multi_frame_super_resolution_tpu.pallas_ops.merge import (
            merge_fast_pallas,
        )

        f, h, w = 3, 64, 128
        num, den = merge_fast_pallas(
            jnp.asarray(rng.random((f, h, w, 3)), jnp.float32),
            jnp.asarray(rng.random((f, h, w, 2)) - 0.5, jnp.float32),
            jnp.asarray(rng.random((f, h, w, 3)), jnp.float32),
            jnp.asarray(0.5 + rng.random((h, w, 3)), jnp.float32),
            scale=2,
        )
        jax.block_until_ready((num, den))
        print("PASS merge_fast_pallas")
    except Exception:
        failures += 1
        print("FAIL merge_fast_pallas:")
        traceback.print_exc(limit=2)

    print(f"{4 - failures}/4 kernels compiled+ran")
    return 0


if __name__ == "__main__":
    sys.exit(main())
