import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.data import mosaic_rggb
from multi_frame_super_resolution_tpu.ops import (
    RGGB,
    cfa_channel_map,
    debayer,
    debayer_subsample,
)


def _smooth_rgb(rng, h, w):
    x = rng.random((h, w, 3)).astype(np.float32)
    k = np.array([0.25, 0.5, 0.25])
    for _ in range(4):
        for c in range(3):
            x[..., c] = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, x[..., c])
            x[..., c] = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, x[..., c])
    return x


def test_cfa_channel_map():
    m = cfa_channel_map(4, 4, RGGB)
    assert m[0, 0] == 0 and m[0, 1] == 1
    assert m[1, 0] == 1 and m[1, 1] == 2


def test_debayer_preserves_measured_sites(rng):
    rgb = _smooth_rgb(rng, 16, 16)
    raw = mosaic_rggb(rgb)
    out = np.asarray(debayer(jnp.asarray(raw)))
    ch = cfa_channel_map(16, 16, RGGB)
    for c in range(3):
        mask = ch == c
        np.testing.assert_allclose(out[..., c][mask], raw[mask], atol=1e-5)


def test_debayer_accurate_on_smooth_image(rng):
    rgb = _smooth_rgb(rng, 32, 32)
    raw = mosaic_rggb(rgb)
    out = np.asarray(debayer(jnp.asarray(raw)))
    err = np.abs(out[4:-4, 4:-4] - rgb[4:-4, 4:-4]).mean()
    assert err < 0.02


def test_debayer_constant_image_exact():
    rgb = np.full((16, 16, 3), 0.5, np.float32)
    raw = mosaic_rggb(rgb)
    out = np.asarray(debayer(jnp.asarray(raw)))
    np.testing.assert_allclose(out[2:-2, 2:-2], 0.5, atol=1e-5)


def test_debayer_subsample(rng):
    rgb = _smooth_rgb(rng, 16, 16)
    raw = mosaic_rggb(rgb)
    half = np.asarray(debayer_subsample(jnp.asarray(raw)))
    assert half.shape == (8, 8, 3)
    # red channel of quad (0,0): raw[0,0]
    assert abs(half[0, 0, 0] - raw[0, 0]) < 1e-6
    # green: average of raw[0,1], raw[1,0]
    assert abs(half[0, 0, 1] - 0.5 * (raw[0, 1] + raw[1, 0])) < 1e-6
    # blue: raw[1,1]
    assert abs(half[0, 0, 2] - raw[1, 1]) < 1e-6


def test_debayer_black_point_scale(rng):
    rgb = _smooth_rgb(rng, 16, 16) * 0.5 + 0.25
    raw = mosaic_rggb(rgb)
    # apply inverse: raw' = raw/2 + 0.1; black=0.1, scale=2 recovers
    raw2 = raw / 2.0 + 0.1
    out = np.asarray(
        debayer(jnp.asarray(raw2), black_point=(0.1, 0.1, 0.1), scale=(2.0, 2.0, 2.0))
    )
    expect = np.asarray(debayer(jnp.asarray(raw)))
    np.testing.assert_allclose(out, expect, atol=1e-5)
