"""FFT log-polar rotation/scale/translation registration.

Completes the imreg_fmt-style pipeline the reference left unfinished
(fft_image_registration, main.cpp:861-1194: the log-polar phase
correlation is computed but the rotation/scale recovery and the final
translation stage discard their results at main.cpp:1158-1161). Pipeline:

  gray -> apodize (Hanning-edge window) -> FFT -> fftshift ->
  high-pass x magnitude -> log-polar remap -> phase-correlate the two
  log-polar magnitudes -> (rotation, scale) -> unrotate/unscale ->
  phase-correlate -> translation.

Log-polar geometry follows the reference exactly (main.cpp:875-932):
square maps of size max(rows, cols), log base exp(log(rows*1.1/2)/size),
angles spanning [0, -pi].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.config import RegistrationConfig
from multi_frame_super_resolution_tpu.ops.fourier import (
    apodization_window,
    cross_power_spectrum,
    high_pass_filter,
)
from multi_frame_super_resolution_tpu.ops.geometry import remap, rotate, upscale
from multi_frame_super_resolution_tpu.registration.phase_correlation import (
    phase_correlate,
)


def log_polar_params(rows: int, cols: int) -> Tuple[int, float]:
    """(map size, log base) as computed at main.cpp:878-881."""
    size = max(rows, cols)
    log_base = math.exp(math.log(rows * 1.1 / 2.0) / size)
    return size, log_base


def log_polar_maps(
    rows: int, cols: int, radius_step: int = 1
) -> Tuple[np.ndarray, np.ndarray]:
    """(ymap, xmap) of shape (size, ceil(size/radius_step)): row i is
    angle -i*pi/(size-1), column j is radius logBase^(j*radius_step),
    about the image center (main.cpp:883-932). ``radius_step`` > 1
    subsamples the radial (log-radius) axis — same spectral span,
    coarser log sampling; the caller rescales recovered column shifts
    by the step.

    Deviation from the reference maps: the radius is laid out in
    ISOTROPIC NORMALIZED frequency and converted to pixel coordinates
    per axis (x stretched by cols/rows). The reference samples the
    spectrum on pixel-coordinate circles, which are ellipses in true
    frequency for non-square images — an image-space rotation then does
    NOT shift the angle axis uniformly (measured on the 256x512 city
    frame: estimates came out at -theta/2). Its own registration driver
    discards the results (main.cpp:1158-1161), so the bug was latent."""
    size, log_base = log_polar_params(rows, cols)
    # radius in ROW-pixel units (reference scale), stretched to column
    # pixels on the x axis so (fy, fx) = scales/rows * (sin, cos) is an
    # isotropic frequency circle
    scales = np.power(
        log_base, np.arange(0, size, radius_step, dtype=np.float64)
    )
    angles = -np.arange(size, dtype=np.float64) * (np.pi / (size - 1))
    xmap = (scales[None, :] * (cols / rows)) * np.cos(angles)[:, None] + cols / 2.0
    ymap = scales[None, :] * np.sin(angles)[:, None] + rows / 2.0
    return ymap.astype(np.float32), xmap.astype(np.float32)


import functools


@functools.lru_cache(maxsize=16)
def _log_polar_matmul_weights(rows: int, cols: int, radius_step: int, method: str):
    """Cached separable weight matrices implementing the log-polar remap
    as two dense matmuls (see ops.geometry.static_sep_weights — the
    gather remap costs ~1 ms on TPU even at 128x64; the matmul form is
    MXU work)."""
    from multi_frame_super_resolution_tpu.ops.geometry import static_sep_weights

    ymap, xmap = log_polar_maps(rows, cols, radius_step)
    wy = static_sep_weights(ymap.reshape(-1), rows, method)
    wx = static_sep_weights(xmap.reshape(-1), cols, method)
    return wy, wx, ymap.shape


def to_log_polar(
    img: jnp.ndarray,
    method: str = "bicubic",
    radius_step: int = 1,
    matmul: bool = False,
) -> jnp.ndarray:
    rows, cols = img.shape[-2], img.shape[-1]
    if matmul:
        from multi_frame_super_resolution_tpu.ops.geometry import remap_static

        wy, wx, out_shape = _log_polar_matmul_weights(
            rows, cols, int(radius_step), method
        )
        return remap_static(img, wy, wx, out_shape)
    ymap, xmap = log_polar_maps(rows, cols, radius_step)
    return remap(img, jnp.asarray(ymap), jnp.asarray(xmap), method)


def _spectral_magnitude(img: jnp.ndarray, window: jnp.ndarray, hp: jnp.ndarray) -> jnp.ndarray:
    """Apodize, FFT, fftshift, high-pass-weighted magnitude — the fused
    equivalent of main.cpp:955-1090 (cv::cuda::multiply + copy_R2C + FFT +
    fftshift_2D + high_pass_filtering)."""
    f = jnp.fft.fftshift(jnp.fft.fft2(img * window))
    return hp * jnp.abs(f)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimilarityTransform:
    rotation: jnp.ndarray    # radians
    scale: jnp.ndarray       # isotropic
    translation: jnp.ndarray # (dy, dx)
    response: jnp.ndarray    # final phase-correlation peak


def register_rotation_scale(
    im0: jnp.ndarray, im1: jnp.ndarray, cfg: RegistrationConfig = RegistrationConfig()
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Recover (rotation, scale, response) such that im1 is im0 rotated by
    ``rotation`` (about the center) and scaled by ``scale``."""
    rows, cols = im0.shape
    size, log_base = log_polar_params(rows, cols)
    win = jnp.asarray(
        apodization_window(rows, cols, int(cfg.apodization_ratio * min(rows, cols)))
    )
    hp = jnp.asarray(high_pass_filter(rows, cols))
    m0 = _spectral_magnitude(im0, win, hp)
    m1 = _spectral_magnitude(im1, win, hp)
    step = max(int(cfg.lp_radius_step), 1)
    lp0 = to_log_polar(m0, cfg.logpolar_interp, step, cfg.lp_matmul)
    lp1 = to_log_polar(m1, cfg.logpolar_interp, step, cfg.lp_matmul)
    (shift, peak) = phase_correlate(
        lp0, lp1, cfg.eps, cfg.subpixel, refine=cfg.peak_upsample
    )
    # row shift <-> rotation (angle step pi/(size-1), negative direction);
    # col shift <-> log-radius (radius_step log-base steps) <-> scale
    rotation = shift[0] * (jnp.pi / (size - 1))
    scale = jnp.power(log_base, -shift[1] * step)
    return rotation, scale, peak


def register_translation(
    im0: jnp.ndarray, im1: jnp.ndarray, cfg: RegistrationConfig = RegistrationConfig()
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(dy, dx) such that im1(x) ~= im0(x + d) — apodized global phase
    correlation (fftreg_phaseCorrelate, main.cpp:768-859)."""
    rows, cols = im0.shape
    win = jnp.asarray(
        apodization_window(rows, cols, int(cfg.apodization_ratio * min(rows, cols)))
    )
    return phase_correlate(
        im0, im1, cfg.eps, cfg.subpixel, window=win, refine=cfg.peak_upsample
    )


def register_similarity(
    im0: jnp.ndarray, im1: jnp.ndarray, cfg: RegistrationConfig = RegistrationConfig()
) -> SimilarityTransform:
    """Full rotation+scale+translation registration: recover the rotation
    and scale from the log-polar stage, undo them on im1, then recover the
    residual translation — the stage the reference never finished."""
    rotation, scale, _ = register_rotation_scale(im0, im1, cfg)
    h, w = im1.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w)) - cy
    xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w)) - cx
    # inverse similarity (rotation about center by -rotation, scale 1/s)
    ca = jnp.cos(rotation)
    sa = jnp.sin(rotation)
    src_y = (sa * xs + ca * ys) * scale + cy
    src_x = (ca * xs - sa * ys) * scale + cx
    if cfg.fast_warp:
        from multi_frame_super_resolution_tpu.ops.warp_fast import (
            similarity_warp_fast,
        )

        unrotated = similarity_warp_fast(im1, src_y, src_x)
    else:
        unrotated = remap(im1, src_y, src_x, "bicubic")
    shift, peak = register_translation(im0, unrotated, cfg)
    return SimilarityTransform(rotation=rotation, scale=scale, translation=shift, response=peak)
