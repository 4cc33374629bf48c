"""BTV-L1 multi-frame super-resolution.

The deliverable-app capability of the reference
(createSuperResolution_BTVL1_CUDA, multi_frame_sr.cpp:165-206): for each
output frame, take the temporal window [t-r, t+r], estimate dense optical
flow from each window frame to the target frame with a selectable backend,
and run `iterations` steps of L1 data-term subgradient descent with a
bilateral-total-variation prior (Farsiu et al.), at 2x scale.

TPU design: the degradation operator A = D H W and its adjoint are
warp + depthwise blur + strided (de)sampling; the frame sum is a
``lax.scan``; the iteration loop is ``lax.fori_loop``; the whole per-frame
solve jits to one XLA program. The reference's per-frame `nextFrame` host
loop becomes `btvl1_video`, a vmap over target indices.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.config import BTVConfig, FlowConfig
from multi_frame_super_resolution_tpu.ops.color import rgb_to_gray
from multi_frame_super_resolution_tpu.ops.filters import gaussian_kernel_1d, separable_filter
from multi_frame_super_resolution_tpu.ops.geometry import (
    resize,
    upscale,
    warp_backward,
)
from multi_frame_super_resolution_tpu.registration.optical_flow import (
    create_optical_flow,
)


def _blur(img: jnp.ndarray, cfg: BTVConfig) -> jnp.ndarray:
    sigma = cfg.blur_sigma if cfg.blur_sigma > 0 else cfg.scale * 0.5
    size = 2 * int(np.ceil(2 * sigma)) + 1
    k = jnp.asarray(gaussian_kernel_1d(sigma, size))
    return separable_filter(img, k, k)


def _block_mean(x: jnp.ndarray, s: int) -> jnp.ndarray:
    h, w = x.shape[0] // s, x.shape[1] // s
    if x.ndim == 2:
        return x[: h * s, : w * s].reshape(h, s, w, s).mean(axis=(1, 3))
    c = x.shape[2]
    return x[: h * s, : w * s].reshape(h, s, w, s, c).mean(axis=(1, 3))


def _block_mean_adjoint(r: jnp.ndarray, s: int) -> jnp.ndarray:
    """Exact adjoint of _block_mean: broadcast r/s^2 into each block."""
    rep = jnp.repeat(jnp.repeat(r, s, axis=0), s, axis=1)
    return rep / (s * s)


def _warp(x: jnp.ndarray, hr_flow: jnp.ndarray, cfg: BTVConfig) -> jnp.ndarray:
    """Backward warp; the fast path decomposes the flow into per-tile
    integer shifts + bounded residual so no per-pixel gather is emitted
    (ops/warp_fast.py)."""
    if not cfg.fast:
        return warp_backward(x, hr_flow)
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        decompose_flow,
        warp_decomposed,
    )

    tile_int, residual = decompose_flow(hr_flow, cfg.warp_tile)
    return warp_decomposed(x, tile_int, residual, cfg.warp_tile, cfg.warp_residual_bound)


def _degrade(x_hr: jnp.ndarray, hr_flow: jnp.ndarray, cfg: BTVConfig) -> jnp.ndarray:
    """A x = decimate(blur(warp(x))) onto frame-k's low-res grid. The
    decimation is a block mean, which keeps the HR/LR pixel grids
    center-aligned (matching the resize/downsample conventions of ops/)."""
    warped = _warp(x_hr, hr_flow, cfg)
    blurred = _blur(warped, cfg)
    return _block_mean(blurred, cfg.scale)


def _degrade_adjoint(r_lr: jnp.ndarray, hr_flow_inv: jnp.ndarray, cfg: BTVConfig) -> jnp.ndarray:
    """A^T r = warp_back(blur(decimation-adjoint(r))). The warp adjoint is
    approximated by warping with the negated flow (standard in BTVL1
    implementations)."""
    up = _block_mean_adjoint(r_lr, cfg.scale)
    blurred = _blur(up, cfg)
    return _warp(blurred, hr_flow_inv, cfg)


def _btv_gradient(x: jnp.ndarray, cfg: BTVConfig) -> jnp.ndarray:
    """Subgradient of the bilateral TV prior
    sum_{(l,m)!=0, |l|,|m|<=p} alpha^(|l|+|m|) |x - S_x^l S_y^m x|
    in adjoint-correct form: for each offset, sign(x - shifted) minus the
    back-shifted sign image."""
    p = cfg.btv_kernel_size // 2
    grad = jnp.zeros_like(x)
    pad = p

    def shift(img, dy, dx):
        padded = jnp.pad(
            img,
            ((pad, pad), (pad, pad)) + ((0, 0),) * (img.ndim - 2),
            mode="edge",
        )
        return padded[pad + dy : pad + dy + img.shape[0], pad + dx : pad + dx + img.shape[1]]

    for dy in range(-p, p + 1):
        for dx in range(-p, p + 1):
            if dy == 0 and dx == 0:
                continue
            weight = cfg.alpha ** (abs(dy) + abs(dx))
            s = jnp.sign(x - shift(x, dy, dx))
            grad = grad + weight * (s - shift(s, -dy, -dx))
    return grad


def btvl1_superres(
    burst: jnp.ndarray,
    target: int,
    cfg: BTVConfig = BTVConfig(),
    flow_cfg: Optional[FlowConfig] = None,
    flows: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Super-resolve frame ``target`` of a burst (F, H, W[, C]) using the
    temporal window [target-r, target+r] (wrapping, as the reference's
    cycled frame source does). Returns (scale*H, scale*W[, C]).

    ``flows`` (window, H, W, 2), when given, bypasses flow estimation —
    the analog of injecting a custom DenseOpticalFlowExt
    (superRes->setOpticalFlow, multi_frame_sr.cpp:179).
    """
    f = burst.shape[0]
    window = [ (target + d) % f for d in range(-cfg.temporal_radius, cfg.temporal_radius + 1) ]
    frames = jnp.stack([burst[i] for i in window])

    gray = rgb_to_gray(frames) if frames.ndim == 4 else frames
    ref_gray = gray[cfg.temporal_radius]

    if flows is None:
        if flow_cfg is None:
            flow_cfg = FlowConfig(method=cfg.optical_flow)
        flow_fn = create_optical_flow(flow_cfg)
        # flow_k: frame_k(x + flow_k(x)) ~= target(x), estimated at LR,
        # lifted to the HR grid
        flows = jax.vmap(lambda g: flow_fn(ref_gray, g))(gray)
    h, w = ref_gray.shape
    sh, sw = h * cfg.scale, w * cfg.scale
    hr_flows = jax.vmap(lambda fl: resize(fl, sh, sw, "bilinear") * cfg.scale)(flows)

    x0 = upscale(frames[cfg.temporal_radius], cfg.scale, "bicubic")

    def iteration(_, x):
        def frame_term(carry, data):
            frame, hr_flow = data
            # warp HR estimate into frame-k geometry: sample x at
            # ref-coords of each frame-k pixel = backward warp by -flow
            sim = _degrade(x, -hr_flow, cfg)
            resid = jnp.sign(sim - frame)
            back = _degrade_adjoint(resid, hr_flow, cfg)
            return carry + back, None

        data_grad, _ = jax.lax.scan(
            frame_term, jnp.zeros_like(x), (frames, hr_flows)
        )
        grad = data_grad + cfg.lam * _btv_gradient(x, cfg)
        # tau is the classical 8-bit-range step (OpenCV default 1.3); both
        # gradient terms are sign-valued, so rescale to [0,1] intensities
        return x - (cfg.tau / 255.0) * grad

    x = jax.lax.fori_loop(0, cfg.iterations, iteration, x0)
    return jnp.clip(x, 0.0, 1.0)


def btvl1_video(
    burst: jnp.ndarray,
    cfg: BTVConfig = BTVConfig(),
    flow_cfg: Optional[FlowConfig] = None,
) -> jnp.ndarray:
    """Super-resolve every frame of the burst (the reference app's
    `nextFrame` stream, multi_frame_sr.cpp:187-203). Returns
    (F, scale*H, scale*W[, C])."""
    f = burst.shape[0]
    outs = [btvl1_superres(burst, t, cfg, flow_cfg) for t in range(f)]
    return jnp.stack(outs)
