"""Image quality metrics.

The reference verified correctness by eyeballing images and diffing text
dumps against offline oracles (SURVEY.md §4); this module formalizes that
into PSNR/MSE/SSIM so every pipeline can be scored against its NumPy oracle.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return jnp.mean((a - b) ** 2)


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB."""
    m = mse(a, b)
    return 10.0 * jnp.log10((max_val * max_val) / jnp.maximum(m, 1e-20))


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    max_val: float = 1.0,
    win: int = 7,
) -> jnp.ndarray:
    """Mean structural similarity over a uniform window.

    Grayscale 2-D inputs (HW) or HWC (averaged over channels).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if a.ndim == 3:
        return jnp.mean(
            jnp.stack([ssim(a[..., c], b[..., c], max_val, win) for c in range(a.shape[-1])])
        )
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    def box(x):
        # uniform filter via cumulative sums (valid region only)
        k = jnp.ones((win, win), jnp.float32) / (win * win)
        from jax import lax

        return lax.conv_general_dilated(
            x[None, None], k[None, None], (1, 1), "VALID",
            precision=lax.Precision.HIGHEST,
        )[0, 0]

    mu_a = box(a)
    mu_b = box(b)
    mu_aa = box(a * a)
    mu_bb = box(b * b)
    mu_ab = box(a * b)
    var_a = mu_aa - mu_a * mu_a
    var_b = mu_bb - mu_b * mu_b
    cov = mu_ab - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)
