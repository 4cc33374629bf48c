"""Dense optical flow backend factory.

The createOptFlow selector surface of the reference
(multi_frame_sr.cpp:61-87): farneback | tvl1 | brox | pyrlk, each a
jittable (ref, moved) -> flow (H, W, 2) function with the framework
convention moved(x + flow(x)) ~= ref(x).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from multi_frame_super_resolution_tpu.config import FlowConfig
from multi_frame_super_resolution_tpu.registration.farneback import farneback_flow
from multi_frame_super_resolution_tpu.registration.brox import brox_flow
from multi_frame_super_resolution_tpu.registration.lucas_kanade import pyrlk_flow
from multi_frame_super_resolution_tpu.registration.tvl1 import tvl1_flow

FlowFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]

_BACKENDS = {
    "pyrlk": pyrlk_flow,
    "farneback": farneback_flow,
    "tvl1": tvl1_flow,
    "brox": brox_flow,
}


def create_optical_flow(cfg: FlowConfig = FlowConfig()) -> FlowFn:
    if cfg.method not in _BACKENDS:
        raise ValueError(
            f"unknown optical flow {cfg.method!r}; expected one of {sorted(_BACKENDS)}"
        )
    backend = _BACKENDS[cfg.method]
    return lambda ref, moved: backend(ref, moved, cfg)


def available_backends():
    return sorted(_BACKENDS)
