"""BTV-L1 component profiling at the reference benchmark config
(city / pyrlk / iterations=10, scale 2).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_btv.py
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from profile_stages import amortized_ms

    from multi_frame_super_resolution_tpu.config import BTVConfig, FlowConfig
    from multi_frame_super_resolution_tpu.data import load_burst
    from multi_frame_super_resolution_tpu.models import btvl1_superres
    from multi_frame_super_resolution_tpu.models.btvl1 import (
        _btv_gradient,
        _btvl1_window,
        _blur_decimate,
    )
    from multi_frame_super_resolution_tpu.registration.optical_flow import (
        create_optical_flow,
    )

    burst = jnp.asarray(load_burst("city"))  # (5, 256, 512, 3)
    cfg = BTVConfig(scale=2, iterations=10, optical_flow="pyrlk")
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 24

    ms = amortized_ms(
        lambda b: btvl1_superres(b, 0, cfg), burst, k=k, reps=2
    )
    print(f"btvl1_superres one frame (iters=10): {ms:.2f} ms", flush=True)

    for iters in (0, 2):
        c = dataclasses.replace(cfg, iterations=iters)
        ms_i = amortized_ms(
            lambda b, cc=c: btvl1_superres(b, 0, cc), burst, k=k, reps=2
        )
        print(f"  iters={iters}: {ms_i:.2f} ms", flush=True)

    # flow estimation alone (2 pairs)
    flow_fn = create_optical_flow(FlowConfig(method="pyrlk"))
    gray = burst.mean(-1)
    ms_f = amortized_ms(
        lambda g: jax.vmap(lambda x: flow_fn(g[0], x))(g[1:3]), gray, k=k, reps=2
    )
    print(f"pyrlk flow x2 pairs: {ms_f:.2f} ms", flush=True)

    # btv gradient alone at HR
    hr = jnp.asarray(
        np.random.default_rng(0).random((512, 1024, 3)), jnp.float32
    )
    ms_g = amortized_ms(lambda x: _btv_gradient(x, cfg), hr, k=k, reps=2)
    print(f"btv_gradient at HR: {ms_g:.2f} ms", flush=True)

    ms_bd = amortized_ms(
        lambda x: _blur_decimate(x, cfg, 2), hr, k=k, reps=2
    )
    print(f"blur_decimate at HR: {ms_bd:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
