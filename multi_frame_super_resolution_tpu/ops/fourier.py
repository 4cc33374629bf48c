"""Fourier-domain ops: fftshift, apodization, high-pass, cross-power
spectrum, radial fourier filter.

TPU design notes: FFTs are ``jnp.fft`` (XLA-native); the reference's
separate CUDA kernels (copy_R2C, fftshift_2D, high_pass_filtering,
crossPowerSpectrum, abs_and_normby — myKernels.cu:105-246) fuse into one
XLA program here, so there are no intermediate HBM round trips. The
reference uses Z2Z double-precision FFTs (main.cpp:1006-1009); we default
to complex64 which holds PSNR within tolerance on the bundled bursts (see
tests/test_registration.py).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def fftshift2(x: jnp.ndarray) -> jnp.ndarray:
    """Quadrant-swap fftshift over the last two dims (fftshift_2D,
    myKernels.cu:123-165)."""
    return jnp.fft.fftshift(x, axes=(-2, -1))


def ifftshift2(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.fft.ifftshift(x, axes=(-2, -1))


def fftshift_signflip(x: jnp.ndarray) -> jnp.ndarray:
    """Sign-flip (-1)^(x+y) fftshift variant (kernel.cu:871-891): multiply
    the spatial image by (-1)^(i+j) so its FFT comes out centered."""
    h, w = x.shape[-2], x.shape[-1]
    iy = jnp.arange(h)[:, None]
    ix = jnp.arange(w)[None, :]
    sign = 1.0 - 2.0 * ((iy + ix) % 2).astype(x.dtype if x.dtype.kind == "f" else jnp.float32)
    return x * sign


def apodization_window(rows: int, cols: int, radius: int) -> np.ndarray:
    """Hanning-edged 2-D apodization window as outer product a*b, the exact
    construction of getApodizationWindow (main.cpp:721-739): a Hann ramp of
    length 2*radius split across the leading/trailing edges, ones between.
    """
    size = 2 * radius
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(size) / (size - 1))
    a = np.ones(rows, np.float32)
    a[:radius] = hann[:radius]
    a[rows - radius :] = hann[radius:]
    b = np.ones(cols, np.float32)
    b[:radius] = hann[:radius]
    b[cols - radius :] = hann[radius:]
    return np.outer(a, b).astype(np.float32)


def high_pass_filter(rows: int, cols: int) -> np.ndarray:
    """CPU-constructed radial high-pass 1 - cos^2(sqrt(t1^2+t2^2)) over
    [-pi/2, pi/2]^2 (getHighPassFilter, main.cpp:741-760; fused GPU variant
    high_pass_filtering, myKernels.cu:167-201)."""
    t1 = (np.arange(rows) * (np.pi / (rows - 1)) - np.pi / 2.0) ** 2
    t2 = (np.arange(cols) * (np.pi / (cols - 1)) - np.pi / 2.0) ** 2
    r = np.sqrt(t1[:, None] + t2[None, :])
    return (1.0 - np.cos(r) ** 2).astype(np.float32)


def cross_power_spectrum(fa: jnp.ndarray, fb: jnp.ndarray, eps: float = 1e-15) -> jnp.ndarray:
    """Normalized cross-power spectrum fa * conj(fb) / |fa * conj(fb)|
    (crossPowerSpectrum, myKernels.cu:203-225)."""
    prod = fa * jnp.conj(fb)
    return prod / (jnp.abs(prod) + eps)


def conj_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """conj(a) * b — the FFT cross-correlation core
    (conjugateComplexMulKernel, kernel.cu:484-501)."""
    return jnp.conj(a) * b


def fourier_filter_mask(
    height: int,
    width: int,
    lp: float,
    hp: float,
    lps: float,
    hps: float,
    clear_axis: int = 0,
) -> np.ndarray:
    """Radial low/high-pass mask with Gaussian skirts for an R2C half
    spectrum of shape (height, width//2+1), the behavior of fourierFilter
    (kernel.cu:792-869). Frequencies normalized by image size; optionally
    zero the first ``clear_axis`` rows/cols near the axes."""
    half_w = width // 2 + 1
    mx = np.arange(half_w, dtype=np.float32) / width
    my = np.arange(height, dtype=np.float32)
    my = np.where(my > height * 0.5, (height - my) * -1.0, my) / height
    dist = np.sqrt(mx[None, :] ** 2 + my[:, None] ** 2)

    lp_eff = lp - lps
    hp_eff = hp + hps
    fil = np.zeros_like(dist)
    if lp_eff > 0:
        fil = np.where(dist <= lp_eff, 1.0, 0.0)
    else:
        fil = np.where(dist <= 1.0, 1.0, 0.0)
    if lps > 0:
        fil2 = np.where(dist < lp_eff, 1.0, 0.0)
        fil2 = (1.0 - fil2) * np.exp(-((dist - lp_eff) ** 2) / (2 * lps * lps))
        fil = np.where(fil2 > 0.001, fil2, fil)
    if lps > 0 and lp_eff == 0 and hp_eff == 0 and hps == 0:
        fil = np.exp(-((dist - lp_eff) ** 2) / (2 * lps * lps))
    if hp_eff > 0:
        fil2 = np.where(dist >= hp_eff, 1.0, 0.0)
        fil = fil * fil2
        if hps > 0:
            fil3 = np.where(dist < hp_eff, 1.0, 0.0)
            fil3 = (1.0 - fil2) * np.exp(-((dist - hp_eff) ** 2) / (2 * hps * hps))
            fil = np.where(fil3 > 0.001, fil3, fil)
    if clear_axis > 0:
        xs = np.arange(half_w)[None, :]
        fil = np.where(xs < clear_axis, 0.0, fil)
        fil = np.where(np.abs(my[:, None]) * height < clear_axis, 0.0, fil)
    return fil.astype(np.float32)


def fourier_filter(img: jnp.ndarray, lp: float, hp: float, lps: float, hps: float,
                   clear_axis: int = 0) -> jnp.ndarray:
    """Apply the radial fourier filter to a real image via rfft2."""
    h, w = img.shape[-2], img.shape[-1]
    mask = jnp.asarray(fourier_filter_mask(h, w, lp, hp, lps, hps, clear_axis))
    spec = jnp.fft.rfft2(img)
    return jnp.fft.irfft2(spec * mask, s=(h, w))
