"""Dense Lucas-Kanade optical-flow refinement.

TPU-native equivalent of lucasKanadeOptim (opticalFlow.cu:189-325): the
reference runs one CUDA thread per pixel looping over a (2h+1)^2 window;
here the window sums are separable box filters (VPU-fused convs) and the
2x2 solve is closed-form element-wise math, with the same
minimum-singular-value gate (minDet). The iterate-and-warp loop is a
``lax.fori_loop`` so the whole refinement stays inside one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multi_frame_super_resolution_tpu.config import FlowConfig, LKConfig
from multi_frame_super_resolution_tpu.ops.derivatives import derivatives_pair
from multi_frame_super_resolution_tpu.ops.filters import box_filter_planes
from multi_frame_super_resolution_tpu.ops.geometry import downsample2, resize, warp_backward


def lk_step(
    ref: jnp.ndarray,
    warped: jnp.ndarray,
    cfg: LKConfig,
    ref_derivs=None,
) -> jnp.ndarray:
    """One LK increment (H, W, 2) given the reference image and the
    current warped moving image. ``ref_derivs`` (dx, dy of ref) may be
    precomputed once outside the iteration loop."""
    if ref_derivs is None:
        ix, iy, it = derivatives_pair(ref, warped)  # it = ref - warped
    else:
        from multi_frame_super_resolution_tpu.ops.derivatives import derivatives

        rdx, rdy = ref_derivs
        wdx, wdy = derivatives(warped)
        ix = 0.5 * (rdx + wdx)
        iy = 0.5 * (rdy + wdy)
        it = ref - warped
    win = 2 * cfg.half_window + 1

    # one stacked box filter instead of five separate ones; products stay
    # on a LEADING axis so H/W keep the sublane/lane dims (a trailing
    # 5-wide axis would be padded to 128 lanes — see ops.filters notes)
    prods = jnp.stack([ix * ix, ix * iy, iy * iy, ix * it, iy * it], axis=0)
    sums = box_filter_planes(prods, win, normalize=False, mxu_bf16=cfg.bf16)
    sxx, sxy, syy, sxt, syt = (sums[i] for i in range(5))

    # eigenvalues of the symmetric PSD normal matrix = its singular values
    tr = sxx + syy
    disc = jnp.sqrt((sxx - syy) ** 2 + 4.0 * sxy * sxy)
    lam_min = 0.5 * (tr - disc)
    ok = lam_min > cfg.min_sigma

    det = sxx * syy - sxy * sxy
    safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    dx = (syy * sxt - sxy * syt) / safe_det
    dy = (sxx * syt - sxy * sxt) / safe_det
    valid = ok & (jnp.abs(det) > 1e-12)
    dx = jnp.where(valid, dx, 0.0)
    dy = jnp.where(valid, dy, 0.0)
    step = jnp.stack([dy, dx], axis=-1)
    return jnp.nan_to_num(step, nan=0.0)


def lk_refine(
    ref: jnp.ndarray,
    moved: jnp.ndarray,
    flow0: jnp.ndarray,
    cfg: LKConfig = LKConfig(),
) -> jnp.ndarray:
    """Iteratively refine a dense flow so that moved(x + flow(x)) ~= ref(x).

    ref, moved: (H, W) grayscale; flow0: (H, W, 2) initial flow (dy, dx).
    """

    if cfg.warp_tile > 0:
        # large flows, gatherlessly: per-tile integer shift (one-hot
        # select) + bounded residual, re-decomposed each iteration
        from multi_frame_super_resolution_tpu.ops.warp_fast import (
            decompose_flow,
            tile_warp_select,
            warp_bounded,
        )

        rb = max(cfg.bounded_warp, 2)

        def warp(img, fl):
            tile_int, res = decompose_flow(fl, cfg.warp_tile)
            shifted = tile_warp_select(img, tile_int, cfg.warp_tile)
            return warp_bounded(shifted, jnp.clip(res, -rb, rb), rb)

    elif cfg.bounded_warp > 0:
        from multi_frame_super_resolution_tpu.ops.warp_fast import warp_bounded

        warp = lambda img, fl: warp_bounded(img, fl, cfg.bounded_warp)
    else:
        warp = warp_backward

    from multi_frame_super_resolution_tpu.ops.derivatives import derivatives

    ref_derivs = derivatives(ref)  # constant across iterations

    def body(_, flow):
        warped = warp(moved, flow)
        return flow + lk_step(ref, warped, cfg, ref_derivs)

    if cfg.iterations <= 4:
        # unroll small static iteration counts: lets XLA fuse across
        # iterations and drops the loop-carry copies
        flow = flow0
        for i in range(cfg.iterations):
            flow = body(i, flow)
        return flow
    return jax.lax.fori_loop(0, cfg.iterations, body, flow0)


def pyrlk_flow(
    ref: jnp.ndarray, moved: jnp.ndarray, cfg: FlowConfig = FlowConfig()
) -> jnp.ndarray:
    """Standalone pyramidal LK dense optical flow — the `pyrlk` backend of
    the createOptFlow surface (multi_frame_sr.cpp:81-82)."""
    lk = LKConfig(
        half_window=cfg.lk_half_window, iterations=cfg.lk_iterations,
        warp_tile=16,
    )
    ref_pyr = [ref]
    mov_pyr = [moved]
    for _ in range(cfg.pyramid_levels - 1):
        ref_pyr.append(downsample2(ref_pyr[-1]))
        mov_pyr.append(downsample2(mov_pyr[-1]))

    flow = jnp.zeros(ref_pyr[-1].shape + (2,), jnp.float32)
    for level in range(cfg.pyramid_levels - 1, -1, -1):
        if level != cfg.pyramid_levels - 1:
            h, w = ref_pyr[level].shape
            flow = resize(flow, h, w, "bilinear") * 2.0
        flow = lk_refine(ref_pyr[level], mov_pyr[level], flow, lk)
    return flow
