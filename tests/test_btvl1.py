import jax
import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.config import BTVConfig, FlowConfig
from multi_frame_super_resolution_tpu.data import synthetic_burst
from multi_frame_super_resolution_tpu.models import btvl1_superres, btvl1_video
from multi_frame_super_resolution_tpu.models.btvl1 import _btv_gradient
from multi_frame_super_resolution_tpu.ops.geometry import downsample2, upscale
from multi_frame_super_resolution_tpu.utils import psnr


def test_btv_gradient_zero_on_constant():
    x = jnp.full((16, 16), 0.5)
    g = np.asarray(_btv_gradient(x, BTVConfig()))
    np.testing.assert_allclose(g, 0.0, atol=1e-6)


def test_btv_gradient_opposes_noise(rng):
    """BTV subgradient should point toward smoothing: a descent step must
    reduce total variation of a noisy image."""
    x = jnp.asarray(rng.random((24, 24)).astype(np.float32))
    g = _btv_gradient(x, BTVConfig())
    x2 = x - 0.01 * g

    def tv(img):
        return float(
            jnp.abs(jnp.diff(img, axis=0)).sum() + jnp.abs(jnp.diff(img, axis=1)).sum()
        )

    assert tv(np.asarray(x2)) < tv(np.asarray(x))


def _sharp_scene(rng, h=128, w=128):
    """HR scene with pixel-level detail so 2x decimation actually aliases
    (SR has something to recover)."""
    hr = rng.standard_normal((h, w)).astype(np.float32)
    k = np.array([0.25, 0.5, 0.25], np.float32)
    hr = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, hr)
    hr = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, hr)
    return (hr - hr.min()) / (hr.max() - hr.min())


def test_btvl1_improves_on_bicubic(rng):
    """With known motion, BTV-L1 over aliased shifted LR frames must beat
    single-frame bicubic upscaling by a wide margin."""
    hr = jnp.asarray(_sharp_scene(rng))
    from multi_frame_super_resolution_tpu.ops.geometry import translate

    shifts = [(0, 0), (1.0, 0.6), (-0.8, 1.2), (0.5, -1.1)]
    frames = []
    for dy, dx in shifts:
        shifted = translate(hr, dy, dx)
        frames.append(np.asarray(shifted).reshape(64, 2, 64, 2).mean(axis=(1, 3)))
    burst = jnp.asarray(np.stack(frames))
    # frame_k(x + d) ~= frame_0(x) with d = -(shift_k)/2 in LR units
    flows_all = np.stack(
        [np.full((64, 64, 2), [-dy / 2, -dx / 2], np.float32) for dy, dx in shifts]
    )
    window_flows = jnp.asarray(flows_all[[3, 0, 1]])  # window [-1,0,1] of t=0

    cfg = BTVConfig(scale=2, iterations=100, temporal_radius=1, lam=0.01, blur_sigma=0.1)
    out = jax.jit(lambda b, f: btvl1_superres(b, 0, cfg, flows=f))(burst, window_flows)
    bicubic = upscale(burst[0], 2, "bicubic")
    p_btv = float(psnr(hr[8:-8, 8:-8], out[8:-8, 8:-8]))
    p_bic = float(psnr(hr[8:-8, 8:-8], bicubic[8:-8, 8:-8]))
    assert p_btv > p_bic + 3.0, (p_btv, p_bic)


def test_btvl1_estimated_flow_not_worse(rng):
    """End-to-end with pyrlk-estimated flows stays in the bicubic
    ballpark (flow error bounds the gain on tiny images)."""
    hr = jnp.asarray(_sharp_scene(rng))
    from multi_frame_super_resolution_tpu.ops.geometry import translate

    frames = []
    for dy, dx in [(0, 0), (1.0, 0.6), (-0.8, 1.2), (0.5, -1.1)]:
        shifted = translate(hr, dy, dx)
        frames.append(np.asarray(shifted).reshape(64, 2, 64, 2).mean(axis=(1, 3)))
    burst = jnp.asarray(np.stack(frames))
    cfg = BTVConfig(scale=2, iterations=40, temporal_radius=1, lam=0.01,
                    blur_sigma=0.1, optical_flow="pyrlk")
    out = jax.jit(lambda b: btvl1_superres(b, 0, cfg))(burst)
    bicubic = upscale(burst[0], 2, "bicubic")
    p_btv = float(psnr(hr[8:-8, 8:-8], out[8:-8, 8:-8]))
    p_bic = float(psnr(hr[8:-8, 8:-8], bicubic[8:-8, 8:-8]))
    assert p_btv > p_bic - 1.0, (p_btv, p_bic)


def test_btvl1_rgb_shapes(rng):
    burst, _ = synthetic_burst(rng, num_frames=3, height=32, width=32, max_shift=1.0)
    rgb = jnp.asarray(np.stack([burst] * 3, axis=-1))
    cfg = BTVConfig(scale=2, iterations=3)
    out = jax.jit(lambda b: btvl1_superres(b, 1, cfg))(rgb)
    assert out.shape == (64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_btvl1_video_all_frames(rng):
    burst, _ = synthetic_burst(rng, num_frames=3, height=24, width=24, max_shift=1.0)
    cfg = BTVConfig(scale=2, iterations=2)
    out = btvl1_video(jnp.asarray(burst), cfg)
    assert out.shape == (3, 48, 48)


def test_blur_decimate_matches_composition(rng):
    """_blur_decimate (fused strided D*H) must equal
    _block_mean(_blur(x)) exactly (same taps, same clamped borders)."""
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import BTVConfig
    from multi_frame_super_resolution_tpu.models.btvl1 import (
        _blur,
        _blur_decimate,
        _block_mean,
    )

    cfg = BTVConfig(scale=2)
    for shape in [(64, 96), (64, 96, 3)]:
        x = jnp.asarray(rng.random(shape), jnp.float32)
        ref = _block_mean(_blur(x, cfg), 2)
        got = _blur_decimate(x, cfg, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_adjoint_blur_up_matches_composition(rng):
    """_adjoint_blur_up (polyphase H B^T) must equal
    _blur(_block_mean_adjoint(r)) exactly — including borders: the LR
    edge-replicate commutes with the block repeat."""
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import BTVConfig
    from multi_frame_super_resolution_tpu.models.btvl1 import (
        _adjoint_blur_up,
        _blur,
        _block_mean_adjoint,
    )

    for s in (2, 3):
        cfg = BTVConfig(scale=s)
        for shape in [(17, 23), (16, 24, 3)]:
            r = jnp.asarray(rng.random(shape), jnp.float32)
            ref = _blur(_block_mean_adjoint(r, s), cfg)
            got = _adjoint_blur_up(r, cfg, s)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
