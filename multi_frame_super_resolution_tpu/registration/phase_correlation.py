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


def _dft_refine_peak(
    cps: jnp.ndarray, shift_int: jnp.ndarray, upsample: int, halfwidth: float = 1.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Local matrix-DFT peak refinement (Guizar-Sicairos et al.,
    "Efficient subpixel image registration algorithms", Opt. Lett. 2008):
    evaluate the inverse DFT of the normalized cross-power spectrum on a
    1/upsample-step grid within +-halfwidth px of the integer peak, as
    two small complex matmuls (MXU work, no gathers; the idiomatic TPU
    replacement for the 5x5 neighborhood refinement the reference left
    unfinished at main.cpp:840-850).

    cps: (H, W) normalized cross-power spectrum (pre-IFFT);
    shift_int: (2,) float integer-peak shift. Returns (shift, peak)."""
    h, w = cps.shape
    n = 2 * int(round(halfwidth * upsample)) + 1
    offs = (jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0) / upsample
    fy = jnp.fft.fftfreq(h).astype(jnp.float32)
    fx = jnp.fft.fftfreq(w).astype(jnp.float32)
    ys = shift_int[0] + offs
    xs = shift_int[1] + offs
    my = jnp.exp(2j * jnp.pi * ys[:, None] * fy[None, :])      # (n, H)
    mx = jnp.exp(2j * jnp.pi * fx[:, None] * xs[None, :])      # (W, n)
    r = jnp.real(my @ cps @ mx) / (h * w)                      # (n, n)
    idx = jnp.argmax(r.reshape(-1))
    return (
        jnp.stack([ys[idx // n], xs[idx % n]]),
        r.reshape(-1)[idx],
    )


def phase_correlate(
    a: jnp.ndarray,
    b: jnp.ndarray,
    eps: float = 1e-15,
    subpixel: bool = True,
    window: jnp.ndarray | None = None,
    refine: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Estimate the translation (dy, dx) such that b(x) ~= a(x + d).

    Returns (shift (2,), peak response). Unbatched 2-D inputs; use vmap for
    batches of tiles. ``refine`` > 0 replaces the 3x3 quadratic subpixel
    interpolation with local matrix-DFT upsampling at that factor
    (~1/refine px accuracy — used by the pre-alignment stage, where the
    rotation estimate rides on this peak's position).
    """
    if window is not None:
        a = a * window
        b = b * window
    fa = jnp.fft.fft2(a)
    fb = jnp.fft.fft2(b)
    cps = cross_power_spectrum(fa, fb, eps)
    resp = jnp.fft.fftshift(jnp.real(jnp.fft.ifft2(cps)), axes=(-2, -1))
    if refine <= 1:
        return _peak_with_subpixel(resp, subpixel)
    shift_int, _ = _peak_with_subpixel(resp, subpixel=False)
    return _dft_refine_peak(cps, shift_int, refine)
