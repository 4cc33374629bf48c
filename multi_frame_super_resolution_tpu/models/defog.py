"""Image defogging: dark-channel prior and polarization-difference.

TPU-native, single-XLA-program versions of the reference's three defog
generations (SURVEY.md §2.2/§3.2):

  * He-style dark-channel-prior dehazing (dark_channel_prior_defog,
    main.cpp:94-190)
  * GPU dark prior: channel-min + 25x25 erode (dark_prior,
    polar_defog.cpp:45-62)
  * polarization defog (polar_defog.cpp:64-303 + defog_cuda2,
    myKernels.cu:16-52), including the Stokes synthesis input path

The reference's airlight selection downloads the dark channel, sorts on
the CPU, and re-uploads (polar_defog.cpp:157-212) — here it is an
on-device ``lax.top_k``, removing all host round trips per frame.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from multi_frame_super_resolution_tpu.config import DarkChannelConfig, PolarDefogConfig
from multi_frame_super_resolution_tpu.ops.color import normalize_minmax
from multi_frame_super_resolution_tpu.ops.morphology import erode, min_channels


def dark_channel(img: jnp.ndarray, window: int) -> jnp.ndarray:
    """Dark channel: per-pixel channel min, then window min-filter — the
    split/min/min/erode chain of dark_prior (polar_defog.cpp:55-60)."""
    return erode(min_channels(img), window)


def _top_k_indices(scores: jnp.ndarray, k: int):
    return lax.top_k(scores.reshape(-1), k)[1]


def dark_channel_defog(
    img: jnp.ndarray, cfg: DarkChannelConfig = DarkChannelConfig()
) -> jnp.ndarray:
    """He et al. dark-channel-prior dehazing, faithful to
    dark_channel_prior_defog (main.cpp:94-190): airlight = per-channel MAX
    over the brightest top_percent dark-channel pixels; transmission from
    the dark channel of I/A; recovery J = (I-A)/max(t, t0) + A."""
    h, w = img.shape[:2]
    dark = dark_channel(img, cfg.window)
    k = max(int(cfg.top_percent * h * w), 1)
    idx = _top_k_indices(dark, k)
    flat = img.reshape(h * w, -1)
    airlight = jnp.max(flat[idx], axis=0)  # per-channel max over mask

    norm = img / jnp.maximum(airlight, 1e-6)
    dark_a = dark_channel(norm, cfg.window)
    t = 1.0 - cfg.omega * dark_a
    t = jnp.maximum(t, cfg.t0)[..., None]
    return (img - airlight) / t + airlight


def stokes_synthesis(
    i0: jnp.ndarray, i45: jnp.ndarray, i90: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Synthesize (Iper, Ipar) from 0/45/90-degree polarization frames
    (polar_defog.cpp:84-121): I135 = I0 + I90 - I45, Stokes S0/S1/S2,
    degree of polarization D, Iper/Ipar = (1 +- D) * S0/2, each min-max
    normalized and replicated to 3 channels."""
    i135 = i0 + i90 - i45
    s0 = i0 + i90
    s1 = i0 - i90
    s2 = i45 - i135
    d = jnp.sqrt(s1 * s1 + s2 * s2) / (s0 + 1e-15)
    iper = normalize_minmax((1.0 + d) * s0 / 2.0)
    ipar = normalize_minmax((1.0 - d) * s0 / 2.0)
    return (
        jnp.repeat(iper[..., None], 3, axis=-1),
        jnp.repeat(ipar[..., None], 3, axis=-1),
    )


def polar_defog(
    iper: jnp.ndarray,
    ipar: jnp.ndarray,
    cfg: PolarDefogConfig = PolarDefogConfig(),
    return_intermediates: bool = False,
):
    """Polarization-difference defogging of an (Iper, Ipar) pair, both
    (H, W, 3) in [0, 1].

    Exact reference math: dark prior of Iper (radius 12 -> 25x25 erode);
    airlight sums over the top `percent` dark pixels (polar_defog.cpp:
    177-219); P = beta*(SumPer-SumPar)/(SumPer+SumPar), Ainfi =
    (SumPer+SumPar)/k; then per pixel (defog_cuda2, myKernels.cu:28-48):
    A = (Iper-Ipar)/P, t = clip(1 - A/Ainfi), R = clip((Iper+Ipar-A)/t).
    """
    h, w = iper.shape[:2]
    dark = dark_channel(iper, 2 * cfg.radius + 1)
    k = max(int(cfg.percent * h * w), 1)
    idx = _top_k_indices(dark, k)

    per_flat = iper.reshape(h * w, 3)
    par_flat = ipar.reshape(h * w, 3)
    sum_per = jnp.sum(per_flat[idx], axis=0)
    sum_par = jnp.sum(par_flat[idx], axis=0)

    p = cfg.beta * (sum_per - sum_par) / (sum_per + sum_par)
    ainfi = (sum_per + sum_par) / k

    a = (iper - ipar) / p
    t = jnp.clip(1.0 - a / ainfi, cfg.t_min, cfg.t_max)
    r = jnp.clip((iper + ipar - a) / t, cfg.r_min, cfg.r_max)
    if return_intermediates:
        return r, a, t
    return r
