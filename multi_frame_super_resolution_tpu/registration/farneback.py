"""Farneback dense optical flow (polynomial expansion).

The 'farneback' backend of the createOptFlow surface
(multi_frame_sr.cpp:63-68). TPU-native formulation: the per-pixel
quadratic polynomial expansion is six separable Gaussian-basis
correlations (depthwise convs) multiplied by a precomputed (numpy,
trace-time) inverse Gram matrix; the displacement solve is a smoothed
closed-form 2x2 system — no per-pixel loops anywhere.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.config import FlowConfig
from multi_frame_super_resolution_tpu.ops.filters import conv2d, gaussian_kernel_1d, separable_filter
from multi_frame_super_resolution_tpu.ops.geometry import downsample2, identity_grid, remap_bilinear, resize


def _poly_inv_gram(n: int, sigma: float) -> np.ndarray:
    """Inverse Gram matrix of the basis {1, x, y, x^2, y^2, xy} under
    Gaussian applicability over a (2n+1)^2 window."""
    xs = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(xs**2) / (2 * sigma * sigma))
    g /= g.sum()
    w = np.outer(g, g)  # (y, x)
    yy, xx = np.meshgrid(xs, xs, indexing="ij")
    basis = np.stack(
        [np.ones_like(xx), xx, yy, xx * xx, yy * yy, xx * yy], axis=-1
    )  # (Y, X, 6)
    gram = np.einsum("yxi,yxj,yx->ij", basis, basis, w)
    return np.linalg.inv(gram).astype(np.float32)


def poly_expansion(
    img: jnp.ndarray, n: int = 5, sigma: float = 1.1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel quadratic fit f(p + d) ~ d^T A d + b^T d + c.

    Returns A (H, W, 2, 2) (x-first coordinates: A[0,0] = axx) and
    b (H, W, 2) = (bx, by).
    """
    xs = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(xs**2) / (2 * sigma * sigma))
    g /= g.sum()
    k0 = jnp.asarray(g.astype(np.float32))
    k1 = jnp.asarray((g * xs).astype(np.float32))
    k2 = jnp.asarray((g * xs * xs).astype(np.float32))

    # moments m_k = sum w * basis_k * f via separable correlations
    # (note: correlation kernels index the window offset directly)
    def sep(ky, kx):
        return separable_filter(img, ky, kx)

    m1 = sep(k0, k0)
    mx = sep(k0, k1)
    my = sep(k1, k0)
    mxx = sep(k0, k2)
    myy = sep(k2, k0)
    mxy = sep(k1, k1)
    moments = jnp.stack([m1, mx, my, mxx, myy, mxy], axis=-1)

    inv_gram = jnp.asarray(_poly_inv_gram(n, sigma))
    coeffs = moments @ inv_gram.T  # (H, W, 6): [c, bx, by, axx, ayy, axy]

    bx = coeffs[..., 1]
    by = coeffs[..., 2]
    axx = coeffs[..., 3]
    ayy = coeffs[..., 4]
    axy = 0.5 * coeffs[..., 5]
    a = jnp.stack(
        [jnp.stack([axx, axy], -1), jnp.stack([axy, ayy], -1)], axis=-2
    )  # (H, W, 2, 2)
    b = jnp.stack([bx, by], axis=-1)
    return a, b


def _solve_displacement(
    a1, b1, a2, b2, flow_xy, win_size: int
) -> jnp.ndarray:
    """One Farneback update: warp frame-2 coefficients by the current flow,
    average, and solve the smoothed 2x2 system. flow_xy is (H, W, 2) in
    (dx, dy) order."""
    h, w = b1.shape[:2]
    ys, xs = identity_grid(h, w)
    sy = ys + flow_xy[..., 1]
    sx = xs + flow_xy[..., 0]
    a2w = remap_bilinear(a2.reshape(h, w, 4), sy, sx).reshape(h, w, 2, 2)
    b2w = remap_bilinear(b2, sy, sx)

    a = 0.5 * (a1 + a2w)
    db = -0.5 * (b2w - b1) + jnp.einsum("hwij,hwj->hwi", a, flow_xy)

    # windowed normal equations
    g = jnp.asarray(gaussian_kernel_1d(win_size / 5.0, win_size))
    def smooth(x):
        return separable_filter(x, g, g)

    at_a = jnp.einsum("hwki,hwkj->hwij", a, a)
    at_b = jnp.einsum("hwki,hwk->hwi", a, db)
    m11 = smooth(at_a[..., 0, 0])
    m12 = smooth(at_a[..., 0, 1])
    m22 = smooth(at_a[..., 1, 1])
    v1 = smooth(at_b[..., 0])
    v2 = smooth(at_b[..., 1])

    # relative Tikhonov ridge: keeps low-texture pixels near zero motion
    # without hard-gating well-conditioned but small-magnitude systems
    ridge = 1e-3 * (m11 + m22) + 1e-20
    m11 = m11 + ridge
    m22 = m22 + ridge
    det = m11 * m22 - m12 * m12
    fx = (m22 * v1 - m12 * v2) / det
    fy = (m11 * v2 - m12 * v1) / det
    return jnp.nan_to_num(jnp.stack([fx, fy], axis=-1), nan=0.0)


def farneback_flow(
    ref: jnp.ndarray, moved: jnp.ndarray, cfg: FlowConfig = FlowConfig()
) -> jnp.ndarray:
    """Dense flow (H, W, 2) as (dy, dx) such that moved(x + flow) ~= ref(x),
    matching the framework-wide alignment convention."""
    ref_pyr = [ref]
    mov_pyr = [moved]
    for _ in range(cfg.pyramid_levels - 1):
        ref_pyr.append(downsample2(ref_pyr[-1]))
        mov_pyr.append(downsample2(mov_pyr[-1]))

    flow_xy = jnp.zeros(ref_pyr[-1].shape + (2,), jnp.float32)
    for level in range(cfg.pyramid_levels - 1, -1, -1):
        r = ref_pyr[level]
        m = mov_pyr[level]
        if level != cfg.pyramid_levels - 1:
            flow_xy = resize(flow_xy, r.shape[0], r.shape[1], "bilinear") * 2.0
        a1, b1 = poly_expansion(r, cfg.fb_poly_n, cfg.fb_poly_sigma)
        a2, b2 = poly_expansion(m, cfg.fb_poly_n, cfg.fb_poly_sigma)
        for _ in range(cfg.fb_iterations):
            flow_xy = _solve_displacement(a1, b1, a2, b2, flow_xy, cfg.fb_win_size)
    # (dx, dy) -> (dy, dx)
    return flow_xy[..., ::-1]
