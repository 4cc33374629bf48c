import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.ops import (
    dilate,
    erode,
    masked_channel_sums,
    min_channels,
    normalize_minmax,
    rgb_to_gray,
    srgb_degamma,
    srgb_gamma,
    top_k_channel_means,
    top_k_mask,
)
from multi_frame_super_resolution_tpu.ops.derivatives import (
    derivative5_x,
    derivative5_y,
    structure_tensor,
)
from multi_frame_super_resolution_tpu.utils import psnr


def test_erode_is_min_filter(rng):
    img = rng.random((12, 12)).astype(np.float32)
    out = np.asarray(erode(jnp.asarray(img), 3))
    padded = np.pad(img, 1, constant_values=np.inf)
    expect = np.stack(
        [
            padded[dy : dy + 12, dx : dx + 12]
            for dy in range(3)
            for dx in range(3)
        ]
    ).min(axis=0)
    np.testing.assert_allclose(out, expect)


def test_dilate_inverse_of_erode_on_negation(rng):
    img = rng.random((10, 10)).astype(np.float32)
    a = np.asarray(dilate(jnp.asarray(img), 5))
    b = -np.asarray(erode(jnp.asarray(-img), 5))
    np.testing.assert_allclose(a, b)


def test_min_channels(rng):
    img = rng.random((8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(min_channels(jnp.asarray(img))), img.min(-1))


def test_srgb_gamma_roundtrip(rng):
    x = rng.random((16, 16)).astype(np.float32)
    back = np.asarray(srgb_degamma(srgb_gamma(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_srgb_gamma_handles_nan():
    x = jnp.asarray([[np.nan, 0.5], [2.0, -1.0]])
    out = np.asarray(srgb_gamma(x))
    assert np.isfinite(out).all()
    assert out[0, 0] == 0.0
    assert abs(out[1, 0] - 1.0) < 1e-6  # clamped to 1 then gamma(1)=1
    assert out[1, 1] == 0.0


def test_rgb_to_gray_weights():
    img = jnp.asarray([[[1.0, 0.0, 0.0]]])
    assert abs(float(rgb_to_gray(img)[0, 0]) - 0.299) < 1e-6


def test_normalize_minmax(rng):
    x = rng.random((8, 8)).astype(np.float32) * 3 + 2
    out = np.asarray(normalize_minmax(jnp.asarray(x)))
    assert abs(out.min()) < 1e-6 and abs(out.max() - 1) < 1e-6


def test_top_k_selection(rng):
    scores = rng.random((16, 16)).astype(np.float32)
    img = rng.random((16, 16, 3)).astype(np.float32)
    k = 13
    mask = np.asarray(top_k_mask(jnp.asarray(scores), k))
    assert mask.sum() >= k  # ties may add more
    flat = scores.reshape(-1)
    topk_idx = np.argsort(flat)[-k:]
    assert mask.reshape(-1)[topk_idx].all()

    means = np.asarray(top_k_channel_means(jnp.asarray(img), jnp.asarray(scores), k))
    expect = img.reshape(-1, 3)[topk_idx].mean(0)
    np.testing.assert_allclose(means, expect, rtol=1e-5)

    sums = np.asarray(masked_channel_sums(jnp.asarray(img), jnp.asarray(mask)))
    expect_sums = img.reshape(-1, 3)[mask.reshape(-1)].sum(0)
    np.testing.assert_allclose(sums, expect_sums, rtol=1e-4)


def test_derivative5_linear_ramp():
    """Standard 5-point derivative is exact on linear ramps (interior)."""
    ys = np.arange(16, dtype=np.float32)
    img = np.broadcast_to(ys[None, :] * 0.5, (16, 16)).copy()
    dx = np.asarray(derivative5_x(jnp.asarray(img)))
    np.testing.assert_allclose(dx[:, 2:-2], 0.5, atol=1e-5)
    dy = np.asarray(derivative5_y(jnp.asarray(img)))
    np.testing.assert_allclose(dy[2:-2, :], 0.0, atol=1e-5)


def test_structure_tensor():
    dx = jnp.asarray([[1.0, 2.0]])
    dy = jnp.asarray([[3.0, 4.0]])
    st = np.asarray(structure_tensor(dx, dy))
    np.testing.assert_allclose(st[0, 0], [1.0, 9.0, 3.0])
    np.testing.assert_allclose(st[0, 1], [4.0, 16.0, 8.0])


def test_psnr_identity(rng):
    x = jnp.asarray(rng.random((8, 8)).astype(np.float32))
    assert float(psnr(x, x)) > 100
    y = x + 0.1
    assert 19 < float(psnr(x, y)) < 21


def test_upsample_int_phases_matches_interleaved(rng):
    """Phase-domain upsample + interleave must equal upsample_int exactly
    (the phase layout carries the whole finalize stage of the handheld
    pipelines)."""
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        interleave_phases,
        upsample_int,
        upsample_int_phases,
    )

    for shape in [(16, 24), (16, 24, 3)]:
        x = jnp.asarray(rng.random(shape).astype(np.float32))
        for s in (2, 4):
            for method in ("bilinear", "bicubic"):
                ref = np.asarray(upsample_int(x, s, method))
                got = np.asarray(
                    interleave_phases(upsample_int_phases(x, s, method))
                )
                np.testing.assert_allclose(got, ref, atol=1e-6)
