import jax
import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.config import (
    AlignConfig,
    HandheldConfig,
    MergeConfig,
    RobustnessConfig,
)
from multi_frame_super_resolution_tpu.data import mosaic_rggb, synthetic_burst
from multi_frame_super_resolution_tpu.models import (
    apply_weighting,
    handheld_superres,
    handheld_superres_raw,
    kernel_params,
    merge_burst_rgb,
    robustness_mask,
)
from multi_frame_super_resolution_tpu.utils import psnr


def _cfg(levels=2):
    return HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=levels),
        # synthetic bursts are translation-only: the global similarity
        # pre-alignment stage is covered by tests/test_registration.py
        # and skipped here to keep CPU compile time down
        prealign=False,
    )


# ---------------- kernel params ----------------

def test_kernel_params_isotropic_on_flat():
    """Flat gradients -> isotropic kernel: inv_xx == inv_yy, inv_xy == 0."""
    st = jnp.zeros((4, 4, 3))
    out = np.asarray(kernel_params(st))
    np.testing.assert_allclose(out[..., 0], out[..., 1], rtol=1e-4)
    np.testing.assert_allclose(out[..., 2], 0.0, atol=1e-4)
    assert np.isfinite(out).all()


def test_kernel_params_anisotropic_on_edge():
    """Strong x-gradient -> kernel stretched along the edge (y), i.e. the
    inverse covariance penalizes x displacements more: inv_xx > inv_yy."""
    st = jnp.asarray(np.tile([1.0, 1e-4, 0.0], (4, 4, 1)).astype(np.float32))
    out = np.asarray(kernel_params(st))
    assert (out[..., 0] > out[..., 1]).all()
    assert np.isfinite(out).all()


# ---------------- robustness ----------------

def test_robustness_identical_frames_high(rng):
    img = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    flow = jnp.zeros((32, 32, 2))
    mask = np.asarray(robustness_mask(img, img, flow))
    assert mask.shape == (32, 32, 4)
    assert mask[..., :3].min() > 0.8  # identical -> near max certainty
    np.testing.assert_allclose(mask[..., 3], 0.0, atol=1e-6)  # no motion


def test_robustness_mismatched_content_low(rng):
    a = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    b = jnp.clip(a + 0.4, 0.0, 1.0)  # strong local-mean mismatch
    flow = jnp.zeros((32, 32, 2))
    mask = np.asarray(robustness_mask(a, b, flow))
    assert mask[..., :3].mean() < 0.3


def test_robustness_motion_gate(rng):
    img = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    other = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    # wild flow spread trips the M gate wherever content differs
    flow = jnp.asarray(rng.normal(0, 5, (32, 32, 2)).astype(np.float32))
    cfg = RobustnessConfig(threshold_m=0.01)
    m_wild = np.asarray(robustness_mask(img, other, flow, cfg))
    m_zero = np.asarray(robustness_mask(img, other, jnp.zeros((32, 32, 2)), cfg))
    assert m_wild[..., :3].mean() <= m_zero[..., :3].mean() + 1e-6


# ---------------- merge ----------------

def test_merge_identity_burst_reconstructs(rng):
    """Merging F identical frames with zero flow must reproduce the frame."""
    img = rng.random((16, 16, 3)).astype(np.float32)
    burst = jnp.asarray(np.stack([img] * 3))
    flows = jnp.zeros((3, 16, 16, 2))
    cert = jnp.ones((3, 16, 16, 3))
    # near-delta kernel: neighbor taps get weight exp(-12.5) ~ 4e-6
    omega = jnp.tile(jnp.asarray([25.0, 25.0, 0.0]), (16, 16, 1))
    num, den = merge_burst_rgb(burst, flows, cert, omega, scale=1)
    out = np.asarray(num / den)
    np.testing.assert_allclose(out[2:-2, 2:-2], img[2:-2, 2:-2], atol=1e-3)


def test_apply_weighting_fallback():
    num = jnp.zeros((4, 4, 3))
    den = jnp.zeros((4, 4, 3))
    fallback = jnp.full((4, 4, 3), 0.7)
    out = np.asarray(apply_weighting(num, den, fallback, threshold=0.01))
    np.testing.assert_allclose(out, 0.7, atol=1e-6)


def test_apply_weighting_normalizes():
    num = jnp.full((2, 2, 3), 6.0)
    den = jnp.full((2, 2, 3), 3.0)
    fallback = jnp.zeros((2, 2, 3))
    out = np.asarray(apply_weighting(num, den, fallback, threshold=0.5))
    np.testing.assert_allclose(out, 2.0)


# ---------------- end-to-end ----------------

def test_handheld_superres_shapes_and_quality(rng):
    burst, _ = synthetic_burst(rng, num_frames=4, height=64, width=64, max_shift=2.0)
    rgb = np.stack([burst] * 3, axis=-1)
    cfg = _cfg()
    out = jax.jit(lambda b: handheld_superres(b, cfg), static_argnums=())(
        jnp.asarray(rgb)
    )
    assert out.shape == (128, 128, 3)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0
    # downsampling the SR output should approximate the reference frame
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2

    down = np.asarray(downsample2(jnp.asarray(out)))
    p = float(psnr(jnp.asarray(rgb[0]), jnp.asarray(down)))
    assert p > 25.0, f"PSNR vs ref frame too low: {p}"


def test_handheld_superres_better_than_single_frame(rng):
    """Multi-frame merge of noisy shifted frames must beat the single
    (noisy) reference upscale — the raison d'etre of burst SR."""
    clean, _ = synthetic_burst(rng, num_frames=1, height=64, width=64, max_shift=0.0)
    clean = np.stack([clean[0]] * 3, axis=-1)
    burst, _ = synthetic_burst(rng, num_frames=6, height=64, width=64, max_shift=2.0)
    noisy = np.stack([burst] * 3, axis=-1) + rng.normal(0, 0.05, (6, 64, 64, 3)).astype(np.float32)
    # frame 0 of this burst == clean scene + noise (same rng base differs);
    # instead compare: merged output vs noisy ref upscale, against the
    # noise-free frame-0 content
    target = np.stack([burst[0]] * 3, axis=-1)
    cfg = _cfg()
    out = np.asarray(handheld_superres(jnp.asarray(noisy), cfg))
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2, upscale

    merged_down = np.asarray(downsample2(jnp.asarray(out)))
    single = noisy[0]
    p_merged = float(psnr(jnp.asarray(target), jnp.asarray(merged_down)))
    p_single = float(psnr(jnp.asarray(target), jnp.asarray(single)))
    assert p_merged > p_single + 1.0, (p_merged, p_single)


def test_handheld_superres_raw(rng):
    burst, _ = synthetic_burst(rng, num_frames=4, height=64, width=64, max_shift=2.0)
    rgb = np.stack([burst] * 3, axis=-1)
    raw = np.stack([mosaic_rggb(f) for f in rgb])
    cfg = HandheldConfig(
        align=AlignConfig(tile_size=8, search_radius=4, levels=2), gamma=False,
        prealign=False,
    )
    out = jax.jit(lambda b: handheld_superres_raw(b, cfg))(jnp.asarray(raw))
    assert out.shape == (128, 128, 3)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2

    down = np.asarray(downsample2(jnp.asarray(out)))
    p = float(psnr(jnp.asarray(rgb[0]), jnp.asarray(down)))
    assert p > 22.0, f"RAW pipeline PSNR too low: {p}"


def _color_base(rng, h, w, pad):
    """Three INDEPENDENT texture channels so chroma errors (CFA crosstalk,
    color fringing of the merge) can't hide behind replicated luma."""
    bases = []
    for _ in range(3):
        b, _ = synthetic_burst(
            rng, num_frames=1, height=h + 2 * pad, width=w + 2 * pad,
            max_shift=0.0,
        )
        bases.append(b[0])
    return np.stack(bases, axis=-1)


def test_handheld_raw_true_color(rng):
    """True-color burst through the RAW path: per-channel PSNR floors
    catch chroma crosstalk that grayscale-replicated tests miss
    (deBayer + CFA merge, DeBayerKernels.cu:289-468)."""
    h = w = 64
    base = _color_base(rng, h, w, pad=11)
    burst, _ = synthetic_burst(
        rng, num_frames=4, height=h, width=w, max_shift=2.0, base=base
    )
    raw = np.stack([mosaic_rggb(f) for f in burst])
    cfg = HandheldConfig(
        align=AlignConfig(tile_size=8, search_radius=4, levels=2), gamma=False,
        prealign=False,
    )
    out = jax.jit(lambda b: handheld_superres_raw(b, cfg))(jnp.asarray(raw))
    assert out.shape == (2 * h, 2 * w, 3)
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2

    down = np.asarray(downsample2(out))
    for c in range(3):
        p = float(psnr(jnp.asarray(burst[0][..., c]), jnp.asarray(down[..., c])))
        assert p > 20.0, f"channel {c}: {p}"


def test_handheld_rgb_true_color(rng):
    h = w = 64
    base = _color_base(rng, h, w, pad=11)
    burst, _ = synthetic_burst(
        rng, num_frames=3, height=h, width=w, max_shift=2.0, base=base
    )
    cfg = HandheldConfig(
        align=AlignConfig(tile_size=8, search_radius=4, levels=2), gamma=False,
        prealign=False,
    )
    out = jax.jit(lambda b: handheld_superres(b, cfg))(jnp.asarray(burst))
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2

    down = np.asarray(downsample2(out))
    for c in range(3):
        p = float(psnr(jnp.asarray(burst[0][..., c]), jnp.asarray(down[..., c])))
        assert p > 24.0, f"channel {c}: {p}"
