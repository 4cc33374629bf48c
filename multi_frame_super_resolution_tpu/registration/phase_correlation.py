"""FFT phase correlation for global translation estimation.

One fused XLA program replacing the reference's kernel chain
copy_R2C -> cufftExecZ2Z -> crossPowerSpectrum -> inverse FFT ->
fftshift_2D -> abs_and_normby -> cuda::minMaxLoc
(fftreg_phaseCorrelate, main.cpp:768-859), and finishing the 5x5/3x3
subpixel refinement the reference started but never completed
(main.cpp:840-850) using the quadratic interpolator.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from multi_frame_super_resolution_tpu.ops.fourier import cross_power_spectrum
from multi_frame_super_resolution_tpu.registration.subpixel import (
    quadratic_subpixel_max,
)


def correlation_surface(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-15) -> jnp.ndarray:
    """fftshifted real phase-correlation response of two equal-shape 2-D
    images; the peak sits at center + (dy, dx) where b(x) ~= a(x + d)."""
    fa = jnp.fft.fft2(a)
    fb = jnp.fft.fft2(b)
    r = jnp.fft.ifft2(cross_power_spectrum(fa, fb, eps))
    return jnp.fft.fftshift(jnp.real(r), axes=(-2, -1))


def _peak_with_subpixel(resp: jnp.ndarray, subpixel: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2-D response -> (shift (2,), peak value). vmap for batches."""
    h, w = resp.shape
    flat_idx = jnp.argmax(resp.reshape(h * w))
    py = flat_idx // w
    px = flat_idx % w
    peak = resp.reshape(h * w)[flat_idx]

    shift = jnp.stack(
        [py.astype(jnp.float32) - h // 2, px.astype(jnp.float32) - w // 2]
    )
    if subpixel:
        cy = jnp.clip(py, 1, h - 2)
        cx = jnp.clip(px, 1, w - 2)
        offs = jnp.arange(-1, 2)
        patch = resp[cy + offs[:, None], cx + offs[None, :]]
        sub = quadratic_subpixel_max(patch)
        # only valid when the integer peak wasn't clamped at the border
        ok = (py >= 1) & (py <= h - 2) & (px >= 1) & (px <= w - 2)
        shift = shift + jnp.where(ok, sub, 0.0)
    return shift, peak


def phase_correlate(
    a: jnp.ndarray,
    b: jnp.ndarray,
    eps: float = 1e-15,
    subpixel: bool = True,
    window: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Estimate the translation (dy, dx) such that b(x) ~= a(x + d).

    Returns (shift (2,), peak response). Unbatched 2-D inputs; use vmap for
    batches of tiles.
    """
    if window is not None:
        a = a * window
        b = b * window
    resp = correlation_surface(a, b, eps)
    return _peak_with_subpixel(resp, subpixel)
