"""Dual TV-L1 dense optical flow (Zach-Pock-Bischof primal-dual scheme).

The 'tvl1' backend of the createOptFlow surface (multi_frame_sr.cpp:72-77).
Fixed-trip
``lax.fori_loop``s keep the whole warping/primal-dual iteration inside one
XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multi_frame_super_resolution_tpu.config import FlowConfig
from multi_frame_super_resolution_tpu.ops.geometry import (
    downsample2,
    identity_grid,
    remap_bilinear,
    resize,
)


def _grad_forward(u: jnp.ndarray):
    """Forward differences with Neumann boundary (zero at the far edge)."""
    gx = jnp.concatenate([u[:, 1:] - u[:, :-1], jnp.zeros_like(u[:, :1])], axis=1)
    gy = jnp.concatenate([u[1:] - u[:-1], jnp.zeros_like(u[:1])], axis=0)
    return gx, gy


def _div_backward(px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Backward-difference divergence, the negative adjoint of
    _grad_forward."""
    dx = jnp.concatenate([px[:, :1], px[:, 1:] - px[:, :-1]], axis=1)
    dy = jnp.concatenate([py[:1], py[1:] - py[:-1]], axis=0)
    return dx + dy


def _tvl1_level(i0, i1, u, cfg: FlowConfig):
    """TV-L1 at one pyramid level. u is (H, W, 2) as (dy, dx) with the
    convention i1(x + u(x)) ~= i0(x)."""
    h, w = i0.shape
    ys, xs = identity_grid(h, w)
    lt = cfg.tv_lambda * cfg.tv_theta
    tau_theta = cfg.tv_tau / cfg.tv_theta

    def warp_pass(_, carry):
        u, p = carry
        u0 = u
        sy = ys + u0[..., 0]
        sx = xs + u0[..., 1]
        i1w = remap_bilinear(i1, sy, sx)
        # warped image gradients (central differences of the warped image)
        i1x = remap_bilinear(i1, sy, sx + 1.0) - remap_bilinear(i1, sy, sx - 1.0)
        i1y = remap_bilinear(i1, sy + 1.0, sx) - remap_bilinear(i1, sy - 1.0, sx)
        i1x = 0.5 * i1x
        i1y = 0.5 * i1y
        grad_sq = i1x * i1x + i1y * i1y + 1e-9
        # residual: rho(u) = i1w + <grad, u - u0> - i0
        c = i1w - i0 - (i1x * u0[..., 1] + i1y * u0[..., 0])

        def inner(_, carry):
            u, p = carry
            rho = c + i1x * u[..., 1] + i1y * u[..., 0]
            # soft-thresholding step (v)
            step = jnp.where(
                rho < -lt * grad_sq,
                lt,
                jnp.where(rho > lt * grad_sq, -lt, -rho / grad_sq),
            )
            v = u + step[..., None] * jnp.stack([i1y, i1x], axis=-1)
            # primal update from dual field p: (2, 2, H, W) as
            # (component dy/dx, direction x/y)
            div = jnp.stack(
                [_div_backward(p[0, 0], p[0, 1]), _div_backward(p[1, 0], p[1, 1])],
                axis=-1,
            )
            u = v + cfg.tv_theta * div
            # dual ascent + projection
            new_p = []
            for comp in range(2):
                gx, gy = _grad_forward(u[..., comp])
                px = p[comp, 0] + tau_theta * gx
                py = p[comp, 1] + tau_theta * gy
                norm = jnp.maximum(1.0, jnp.sqrt(px * px + py * py))
                new_p.append(jnp.stack([px / norm, py / norm]))
            p = jnp.stack(new_p)
            return u, p

        return jax.lax.fori_loop(0, cfg.tv_iterations, inner, (u, p))

    p0 = jnp.zeros((2, 2, h, w), jnp.float32)
    u, _ = jax.lax.fori_loop(0, cfg.tv_warps, warp_pass, (u, p0))
    # mild median-free sanity clamp
    return jnp.clip(u, -float(max(h, w)), float(max(h, w)))


def tvl1_flow(
    ref: jnp.ndarray, moved: jnp.ndarray, cfg: FlowConfig = FlowConfig()
) -> jnp.ndarray:
    """Dense flow (H, W, 2) as (dy, dx) with moved(x + flow) ~= ref(x)."""
    # the TV-L1 soft-threshold step scales with |grad I|; the classical
    # parameterization (tau/lambda/theta defaults) assumes 8-bit-range
    # intensities, so lift [0,1] inputs to [0,255]
    ref = ref * 255.0
    moved = moved * 255.0
    ref_pyr = [ref]
    mov_pyr = [moved]
    for _ in range(cfg.pyramid_levels - 1):
        ref_pyr.append(downsample2(ref_pyr[-1]))
        mov_pyr.append(downsample2(mov_pyr[-1]))

    u = jnp.zeros(ref_pyr[-1].shape + (2,), jnp.float32)
    for level in range(cfg.pyramid_levels - 1, -1, -1):
        r = ref_pyr[level]
        m = mov_pyr[level]
        if level != cfg.pyramid_levels - 1:
            u = resize(u, r.shape[0], r.shape[1], "bilinear") * 2.0
        u = _tvl1_level(r, m, u, cfg)
    return u
