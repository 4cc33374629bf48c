import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.ops import (
    box_filter,
    conv2d,
    gaussian_blur,
    gaussian_kernel_1d,
    laplacian_sharpen,
    unsharp_mask,
)


def test_gaussian_kernel_normalized():
    k = gaussian_kernel_1d(1.5)
    assert abs(k.sum() - 1.0) < 1e-6
    assert k.shape[0] % 2 == 1
    assert np.argmax(k) == k.shape[0] // 2


def test_conv2d_matches_numpy(rng):
    img = rng.random((17, 23)).astype(np.float32)
    k = rng.random((3, 3)).astype(np.float32)
    out = np.asarray(conv2d(jnp.asarray(img), jnp.asarray(k)))
    # numpy oracle with edge padding (correlation)
    padded = np.pad(img, 1, mode="edge")
    expect = np.zeros_like(img)
    for dy in range(3):
        for dx in range(3):
            expect += k[dy, dx] * padded[dy : dy + 17, dx : dx + 23]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_box_filter_constant_image():
    img = jnp.ones((16, 16))
    out = box_filter(img, 5)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_gaussian_blur_preserves_mean(rng):
    img = rng.random((32, 32)).astype(np.float32)
    out = np.asarray(gaussian_blur(jnp.asarray(img), 1.0))
    assert abs(out.mean() - img.mean()) < 0.01


def test_laplacian_sharpen_matches_reference_formula(rng):
    """sharpenImg2 (multi_frame_sr.cpp:90-119): 5c - l - r - u - d,
    saturated, zero borders."""
    img = rng.random((12, 15)).astype(np.float32)
    out = np.asarray(laplacian_sharpen(jnp.asarray(img)))
    expect = np.zeros_like(img)
    for y in range(1, 11):
        for x in range(1, 14):
            v = (
                5 * img[y, x]
                - img[y, x - 1]
                - img[y, x + 1]
                - img[y - 1, x]
                - img[y + 1, x]
            )
            expect[y, x] = min(max(v, 0.0), 1.0)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)
    assert np.all(out[0] == 0) and np.all(out[-1] == 0)
    assert np.all(out[:, 0] == 0) and np.all(out[:, -1] == 0)


def test_unsharp_sharpens_edge():
    img = np.zeros((16, 16), np.float32)
    img[:, 8:] = 0.5
    out = np.asarray(unsharp_mask(jnp.asarray(img), sigma=1.0, amount=1.0))
    # overshoot on the bright side of the edge
    assert out[:, 9:11].max() > 0.5


def test_multichannel_filters(rng):
    img = rng.random((16, 16, 3)).astype(np.float32)
    assert gaussian_blur(jnp.asarray(img), 1.0).shape == img.shape
    assert laplacian_sharpen(jnp.asarray(img)).shape == img.shape
