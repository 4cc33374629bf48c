"""3x3 quadratic subpixel interpolation of a correlation/SSD extremum.

The least-squares quadratic-surface fit used by the reference's findMinimum
(kernel.cu:503-636): fixed 3x3 normal-equation stencils estimate the local
Hessian (A11, A22, A12) and gradient (b1, b2), the offset is the Newton
step clamped to +-1, with the same degenerate-Hessian fallbacks
(A11/A22 clamped to >=0; negative determinant drops the cross term).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Normal-equation stencils over a 3x3 patch (rows y=-1..1, cols x=-1..1):
# smoothed second derivatives and Sobel first derivatives.
_FA11 = np.array([[1, -2, 1], [2, -4, 2], [1, -2, 1]], np.float32) / 4.0
_FA22 = _FA11.T.copy()
_FA12 = np.array([[1, 0, -1], [0, 0, 0], [-1, 0, 1]], np.float32) / 4.0
_FB1 = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 8.0
_FB2 = _FB1.T.copy()


def quadratic_subpixel_min(patch: jnp.ndarray) -> jnp.ndarray:
    """Subpixel offset (dy, dx) of the minimum of a quadratic surface fit to
    ``patch`` (..., 3, 3) centered on the integer minimum. Offsets are in
    [-1, 1]; degenerate fits return 0 (per axis), exactly as findMinimum.
    """
    f32 = patch.astype(jnp.float32)

    def corr(stencil):
        return jnp.sum(f32 * jnp.asarray(stencil), axis=(-2, -1))

    a11 = jnp.maximum(corr(_FA11), 0.0)
    a22 = jnp.maximum(corr(_FA22), 0.0)
    a12 = corr(_FA12)
    b1 = corr(_FB1)
    b2 = corr(_FB2)

    det = a11 * a22 - a12 * a12
    neg = det < 0
    a12 = jnp.where(neg, 0.0, a12)
    det = jnp.where(neg, a11 * a22, det)

    safe_det = jnp.where(det == 0, 1.0, det)
    mu_x = jnp.where(det != 0, (a22 * b1 - a12 * b2) / safe_det, 0.0)
    mu_y = jnp.where(det != 0, (a11 * b2 - a12 * b1) / safe_det, 0.0)
    mu_x = jnp.where(jnp.abs(mu_x) > 1.0, 0.0, mu_x)
    mu_y = jnp.where(jnp.abs(mu_y) > 1.0, 0.0, mu_y)
    # integer location minus the Newton step => offset is -mu
    return jnp.stack([-mu_y, -mu_x], axis=-1)


def quadratic_subpixel_max(patch: jnp.ndarray) -> jnp.ndarray:
    """Subpixel offset of a maximum (phase-correlation peaks)."""
    return quadratic_subpixel_min(-patch)
