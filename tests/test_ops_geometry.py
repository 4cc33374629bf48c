import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.ops import (
    downsample2,
    remap_bicubic,
    remap_bilinear,
    resize,
    rotate,
    translate,
    upsample_zero,
    warp_backward,
)


def _smooth(rng, h, w):
    x = rng.random((h, w)).astype(np.float32)
    k = np.array([0.25, 0.5, 0.25])
    for _ in range(3):
        x = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, x)
        x = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, x)
    return x


def test_remap_identity(rng):
    img = rng.random((16, 20)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(16.0), np.arange(20.0), indexing="ij")
    out = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(ys), jnp.asarray(xs)))
    np.testing.assert_allclose(out, img, atol=1e-6)
    out_c = np.asarray(remap_bicubic(jnp.asarray(img), jnp.asarray(ys), jnp.asarray(xs)))
    np.testing.assert_allclose(out_c[2:-2, 2:-2], img[2:-2, 2:-2], atol=1e-4)


def test_translate_integer_shift(rng):
    img = rng.random((16, 16)).astype(np.float32)
    out = np.asarray(translate(jnp.asarray(img), 2.0, 3.0))
    np.testing.assert_allclose(out[:13, :12], img[2:15, 3:15], atol=1e-6)


def test_translate_subpixel_half(rng):
    img = _smooth(rng, 32, 32)
    out = np.asarray(translate(jnp.asarray(img), 0.5, 0.0))
    expect = 0.5 * (img[:-1] + img[1:])
    np.testing.assert_allclose(out[:31], expect, atol=1e-5)


def test_warp_backward_matches_translate(rng):
    img = rng.random((16, 16)).astype(np.float32)
    flow = np.zeros((16, 16, 2), np.float32)
    flow[..., 0] = 1.5
    flow[..., 1] = -0.5
    a = np.asarray(warp_backward(jnp.asarray(img), jnp.asarray(flow)))
    b = np.asarray(translate(jnp.asarray(img), 1.5, -0.5))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_rotate_roundtrip(rng):
    img = _smooth(rng, 48, 48)
    fwd = rotate(jnp.asarray(img), 0.3, method="bilinear")
    back = np.asarray(rotate(fwd, -0.3, method="bilinear"))
    # interior should be close after roundtrip
    err = np.abs(back[12:36, 12:36] - img[12:36, 12:36]).mean()
    assert err < 0.03


def test_rotate_90_exact():
    img = np.arange(25, dtype=np.float32).reshape(5, 5)
    out = np.asarray(rotate(jnp.asarray(img), np.pi / 2, method="nearest"))
    # sampling grid src=(cy + sa*xr + ca*yr, cx + ca*xr - sa*yr) with a=90deg
    # -> src_y = cy + xr, src_x = cx - yr: counter-clockwise content rotation
    expect = np.rot90(img, k=1)
    np.testing.assert_allclose(out, expect)


def test_resize_downsample_consistency(rng):
    img = _smooth(rng, 32, 32)
    small = np.asarray(resize(jnp.asarray(img), 16, 16, "bilinear"))
    pooled = np.asarray(downsample2(jnp.asarray(img)))
    np.testing.assert_allclose(small, pooled, atol=1e-5)


def test_upsample_zero_adjoint(rng):
    """<Ux, y> == <x, D y> where D is strided decimation."""
    x = rng.random((8, 8)).astype(np.float32)
    y = rng.random((16, 16)).astype(np.float32)
    ux = np.asarray(upsample_zero(jnp.asarray(x), 2))
    lhs = (ux * y).sum()
    rhs = (x * y[::2, ::2]).sum()
    assert abs(lhs - rhs) < 1e-4


def test_resize_bicubic_upscale_smooth(rng):
    img = _smooth(rng, 16, 16)
    up = np.asarray(resize(jnp.asarray(img), 32, 32, "bicubic"))
    assert up.shape == (32, 32)
    # mean preserved approximately
    assert abs(up.mean() - img.mean()) < 0.01


def test_rotate_expand_bound_and_content():
    """expand=True grows the canvas to the rotated bounding box
    (nppiGetRotateBound semantics, boxFilterNPP.cpp:282-297)."""
    img = np.arange(15, dtype=np.float32).reshape(3, 5)
    out = np.asarray(
        rotate(jnp.asarray(img), np.pi / 2, method="nearest", expand=True)
    )
    # 90 deg: bounding box swaps H and W; content is the full rot90
    assert out.shape == (5, 3)
    np.testing.assert_allclose(out, np.rot90(img, k=1))
    # generic angle: ceil of the rotated rect extents
    a = 0.3
    out2 = np.asarray(
        rotate(jnp.asarray(img), a, method="bilinear", expand=True)
    )
    eh = int(np.ceil(3 * np.cos(a) + 5 * np.sin(a)))
    ew = int(np.ceil(5 * np.cos(a) + 3 * np.sin(a)))
    assert out2.shape == (eh, ew)
