import jax
import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.config import DarkChannelConfig, PolarDefogConfig
from multi_frame_super_resolution_tpu.models import (
    dark_channel,
    dark_channel_defog,
    polar_defog,
    stokes_synthesis,
)


def _hazy_scene(rng, h=48, w=64):
    """Synthesize a hazy image: J*t + A*(1-t) with known airlight."""
    j = rng.random((h, w, 3)).astype(np.float32) * 0.6
    a = np.array([0.9, 0.92, 0.95], np.float32)
    yy = np.linspace(0.3, 0.9, h, dtype=np.float32)[:, None, None]
    t = np.broadcast_to(1.0 - 0.6 * yy, (h, w, 1))
    hazy = j * t + a * (1.0 - t)
    return hazy.astype(np.float32), j, a, t


def test_dark_channel_matches_oracle(rng):
    img = rng.random((20, 24, 3)).astype(np.float32)
    out = np.asarray(dark_channel(jnp.asarray(img), 5))
    mins = img.min(-1)
    padded = np.pad(mins, 2, constant_values=np.inf)
    expect = np.stack(
        [padded[dy : dy + 20, dx : dx + 24] for dy in range(5) for dx in range(5)]
    ).min(0)
    np.testing.assert_allclose(out, expect)


def test_dark_channel_defog_reduces_haze(rng):
    hazy, j, a, t = _hazy_scene(rng)
    out = np.asarray(jax.jit(lambda x: dark_channel_defog(x, DarkChannelConfig()))(
        jnp.asarray(hazy)
    ))
    # dehazed should be darker than hazy (haze adds airlight) and closer
    # to the true radiance
    err_hazy = np.abs(hazy - j).mean()
    err_out = np.abs(out - j).mean()
    assert err_out < err_hazy


def test_stokes_synthesis_properties(rng):
    i0 = rng.random((16, 16)).astype(np.float32)
    i45 = rng.random((16, 16)).astype(np.float32)
    i90 = rng.random((16, 16)).astype(np.float32)
    iper, ipar = stokes_synthesis(jnp.asarray(i0), jnp.asarray(i45), jnp.asarray(i90))
    assert iper.shape == (16, 16, 3) and ipar.shape == (16, 16, 3)
    for x in (np.asarray(iper), np.asarray(ipar)):
        assert x.min() >= 0.0 and x.max() <= 1.0 + 1e-6
        # channels replicated
        np.testing.assert_allclose(x[..., 0], x[..., 1])


def test_polar_defog_matches_reference_math(rng):
    """Numpy oracle of the exact polar_defog.cpp + defog_cuda2 math."""
    h, w = 32, 40
    iper = (rng.random((h, w, 3)) * 0.5 + 0.4).astype(np.float32)
    ipar = (iper * rng.uniform(0.5, 0.9, (h, w, 3))).astype(np.float32)
    # radius 0: the dark channel has no window-min ties, so top-k selection
    # is unambiguous and the oracle picks the identical pixel set (the
    # erode path itself is covered by test_dark_channel_matches_oracle)
    cfg = PolarDefogConfig(radius=0, percent=0.01, beta=1.55)

    r, a, t = jax.jit(
        lambda x, y: polar_defog(x, y, cfg, return_intermediates=True)
    )(jnp.asarray(iper), jnp.asarray(ipar))

    # oracle
    dark = iper.min(-1)  # radius 0 -> dark channel is the channel min
    k = int(cfg.percent * h * w)
    idx = np.argsort(dark.reshape(-1))[::-1][:k]
    sum_per = iper.reshape(-1, 3)[idx].sum(0)
    sum_par = ipar.reshape(-1, 3)[idx].sum(0)
    p = cfg.beta * (sum_per - sum_par) / (sum_per + sum_par)
    ainfi = (sum_per + sum_par) / k
    a_o = (iper - ipar) / p
    t_o = np.clip(1.0 - a_o / ainfi, cfg.t_min, cfg.t_max)
    r_o = np.clip((iper + ipar - a_o) / t_o, cfg.r_min, cfg.r_max)

    np.testing.assert_allclose(np.asarray(a), a_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r), r_o, rtol=1e-4, atol=1e-4)


def test_polar_defog_from_stokes(rng):
    i0 = (rng.random((24, 24)) * 0.8 + 0.1).astype(np.float32)
    i90 = (rng.random((24, 24)) * 0.8 + 0.1).astype(np.float32)
    i45 = 0.5 * (i0 + i90) + rng.normal(0, 0.02, (24, 24)).astype(np.float32)
    iper, ipar = stokes_synthesis(jnp.asarray(i0), jnp.asarray(i45), jnp.asarray(i90))
    out = polar_defog(iper, ipar, PolarDefogConfig(radius=3))
    out = np.asarray(out)
    assert out.shape == (24, 24, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0.001 - 1e-6 and out.max() <= 0.999 + 1e-6
