import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_frame_super_resolution_tpu.config import FlowConfig
from multi_frame_super_resolution_tpu.data import synthetic_burst
from multi_frame_super_resolution_tpu.ops.geometry import translate, warp_backward
from multi_frame_super_resolution_tpu.registration import (
    available_backends,
    create_optical_flow,
)


def test_available_backends_match_reference_surface():
    # the createOptFlow selector surface (multi_frame_sr.cpp:61-87)
    assert available_backends() == ["brox", "farneback", "pyrlk", "tvl1"]


def test_unknown_backend_raises():
    with pytest.raises(ValueError, match="unknown optical flow"):
        create_optical_flow(FlowConfig(method="nope"))


@pytest.mark.parametrize("method", ["pyrlk", "farneback", "tvl1", "brox"])
def test_flow_recovers_translation(method, rng):
    burst, _ = synthetic_burst(rng, num_frames=1, height=96, width=96, max_shift=0.0)
    img = jnp.asarray(burst[0])
    true = (2.0, -1.5)
    moved = translate(img, -true[0], -true[1])  # moved(x + true) = img(x)
    flow_fn = create_optical_flow(FlowConfig(method=method, pyramid_levels=3))
    flow = np.asarray(jax.jit(flow_fn)(img, moved))
    est = flow[24:-24, 24:-24].mean(axis=(0, 1))
    np.testing.assert_allclose(est, true, atol=0.5, err_msg=f"{method}: {est}")


def test_brox_gradient_constancy_survives_brightness_offset(rng):
    """The gradient-constancy term (Brox et al. 2004) must keep the flow
    estimate accurate under an additive illumination change that violates
    brightness constancy — the property that distinguishes the real Brox
    solver from a TV-L1 stand-in (multi_frame_sr.cpp:79-80)."""
    burst, _ = synthetic_burst(rng, num_frames=1, height=96, width=96, max_shift=0.0)
    img = jnp.asarray(burst[0])
    true = (1.5, -2.0)
    moved = jnp.clip(translate(img, -true[0], -true[1]) + 0.15, 0.0, 1.0)
    flow_fn = create_optical_flow(FlowConfig(method="brox", pyramid_levels=3))
    flow = np.asarray(jax.jit(flow_fn)(img, moved))
    est = flow[24:-24, 24:-24].mean(axis=(0, 1))
    np.testing.assert_allclose(est, true, atol=0.5, err_msg=f"{est}")


@pytest.mark.parametrize("method", ["farneback", "tvl1"])
def test_flow_reduces_warp_error(method, rng):
    """Warping by the estimated flow must reduce the photometric error."""
    burst, _ = synthetic_burst(rng, num_frames=2, height=96, width=96, max_shift=2.5)
    ref = jnp.asarray(burst[0])
    moved = jnp.asarray(burst[1])
    flow_fn = create_optical_flow(FlowConfig(method=method, pyramid_levels=3))
    flow = jax.jit(flow_fn)(ref, moved)
    warped = warp_backward(moved, flow)
    before = float(jnp.abs(moved - ref)[8:-8, 8:-8].mean())
    after = float(jnp.abs(warped - ref)[8:-8, 8:-8].mean())
    assert after < 0.5 * before, (method, before, after)
