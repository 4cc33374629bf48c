"""BTV-L1 base-cost breakdown (iters=0 costs 54 ms vs 7 ms of flow —
find the rest).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_btv2.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools")


def main():
    import jax
    import jax.numpy as jnp

    from profile_stages import amortized_ms

    from multi_frame_super_resolution_tpu.config import BTVConfig, FlowConfig
    from multi_frame_super_resolution_tpu.data import load_burst
    from multi_frame_super_resolution_tpu.models.btvl1 import (
        _btvl1_window,
        _blur,
        _block_mean_adjoint,
    )
    from multi_frame_super_resolution_tpu.ops.color import rgb_to_gray
    from multi_frame_super_resolution_tpu.ops.geometry import upscale
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        decompose_flow,
        tile_warp_select,
        upsample_int,
        warp_bounded,
    )
    from multi_frame_super_resolution_tpu.registration.optical_flow import (
        create_optical_flow,
    )

    burst = jnp.asarray(load_burst("city"))  # (5, 256, 512, 3)
    cfg = BTVConfig(scale=2, iterations=0, optical_flow="pyrlk")
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 24

    frames = burst[:3]

    ms = amortized_ms(lambda b: _btvl1_window(b, cfg), frames, k=k, reps=2)
    print(f"window iters=0 total: {ms:.2f} ms", flush=True)

    # flows injected -> skips estimation
    fl = jnp.zeros((3, 256, 512, 2), jnp.float32)
    ms = amortized_ms(
        lambda b: _btvl1_window(b, cfg, flows=fl), frames, k=k, reps=2
    )
    print(f"window iters=0, flows injected: {ms:.2f} ms", flush=True)

    flow_fn = create_optical_flow(FlowConfig(method="pyrlk"))
    gray = rgb_to_gray(frames)
    ms = amortized_ms(
        lambda g: jax.vmap(lambda x: flow_fn(g[1], x))(g[jnp.array([0, 2])]),
        gray, k=k, reps=2,
    )
    print(f"pyrlk 2 pairs: {ms:.2f} ms", flush=True)

    ms = amortized_ms(lambda b: rgb_to_gray(b), frames, k=k, reps=2)
    print(f"rgb_to_gray x3: {ms:.2f} ms", flush=True)

    ms = amortized_ms(lambda b: upscale(b[1], 2, "bicubic"), frames, k=k, reps=2)
    print(f"x0 upscale bicubic (256,512,3)->2x: {ms:.2f} ms", flush=True)

    fl1 = jnp.zeros((2, 256, 512, 2), jnp.float32)
    ms = amortized_ms(
        lambda f: jax.vmap(lambda x: upsample_int(x, 2, "bilinear") * 2.0)(f),
        fl1, k=k, reps=2,
    )
    print(f"hr flow lift x2: {ms:.2f} ms", flush=True)

    ms = amortized_ms(
        lambda f: jax.vmap(lambda x: decompose_flow(x, 32)[0])(f),
        jnp.zeros((4, 512, 1024, 2), jnp.float32), k=k, reps=2,
    )
    print(f"decompose_flow x4 at HR: {ms:.2f} ms", flush=True)

    # one iteration's pieces at HR channel-minor
    hr = jnp.asarray(np.random.default_rng(0).random((512, 1024, 3)), jnp.float32)
    ti = jnp.zeros((16, 32, 2), jnp.int32)
    res = jnp.zeros((512, 1024, 2), jnp.float32)
    ms = amortized_ms(lambda x: tile_warp_select(x, ti, 32), hr, k=k, reps=2)
    print(f"tile_warp_select HR (512,1024,3): {ms:.2f} ms", flush=True)
    ms = amortized_ms(lambda x: warp_bounded(x, res, 3), hr, k=k, reps=2)
    print(f"warp_bounded rb=3 HR (512,1024,3): {ms:.2f} ms", flush=True)
    ms = amortized_ms(lambda x: _blur(x, cfg), hr, k=k, reps=2)
    print(f"_blur HR (512,1024,3): {ms:.2f} ms", flush=True)
    lr = hr[::2, ::2]
    ms = amortized_ms(
        lambda x: _blur(_block_mean_adjoint(x, 2), cfg), lr, k=k, reps=2
    )
    print(f"adjoint+blur HR: {ms:.2f} ms", flush=True)

    # channel-leading variants
    hrp = jnp.moveaxis(hr, -1, 0)
    ms = amortized_ms(
        lambda x: jax.vmap(lambda p: tile_warp_select(p, ti, 32))(x), hrp, k=k, reps=2
    )
    print(f"tile_warp_select HR planes (3,512,1024): {ms:.2f} ms", flush=True)
    ms = amortized_ms(
        lambda x: jax.vmap(lambda p: warp_bounded(p, res, 3))(x), hrp, k=k, reps=2
    )
    print(f"warp_bounded HR planes: {ms:.2f} ms", flush=True)
    ms = amortized_ms(
        lambda x: jax.vmap(lambda p: _blur(p, cfg))(x), hrp, k=k, reps=2
    )
    print(f"_blur HR planes: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
