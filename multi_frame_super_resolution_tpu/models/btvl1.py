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


def _make_warp(hr_flow: jnp.ndarray, cfg: BTVConfig):
    """Build a warp closure for a fixed flow. The fast path decomposes the
    flow ONCE into per-tile integer shifts + bounded residual and warps
    with the gatherless one-hot select (ops/warp_fast.py); the flows are
    constant across the solver iterations, so the decomposition is hoisted
    out of the iteration loop entirely."""
    if not cfg.fast:
        return lambda x: warp_backward(x, hr_flow)
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        decompose_flow,
        tile_warp_select,
        warp_bounded,
    )

    tile_int, residual = decompose_flow(hr_flow, cfg.warp_tile)
    residual = jnp.clip(residual, -cfg.warp_residual_bound, cfg.warp_residual_bound)

    def warp(x):
        shifted = tile_warp_select(x, tile_int, cfg.warp_tile)
        return warp_bounded(shifted, residual, cfg.warp_residual_bound)

    return warp


def _degrade(x_hr: jnp.ndarray, warp, cfg: BTVConfig) -> jnp.ndarray:
    """A x = decimate(blur(warp(x))) onto frame-k's low-res grid. The
    decimation is a block mean, which keeps the HR/LR pixel grids
    center-aligned (matching the resize/downsample conventions of ops/)."""
    warped = warp(x_hr)
    blurred = _blur(warped, cfg)
    return _block_mean(blurred, cfg.scale)


def _degrade_adjoint(r_lr: jnp.ndarray, warp_inv, cfg: BTVConfig) -> jnp.ndarray:
    """A^T r = warp_back(blur(decimation-adjoint(r))). The warp adjoint is
    approximated by warping with the negated flow (standard in BTVL1
    implementations)."""
    up = _block_mean_adjoint(r_lr, cfg.scale)
    blurred = _blur(up, cfg)
    return warp_inv(blurred)


def _btv_gradient(x: jnp.ndarray, cfg: BTVConfig) -> jnp.ndarray:
    """Subgradient of the bilateral TV prior
    sum_{(l,m)!=0, |l|,|m|<=p} alpha^(|l|+|m|) |x - S_x^l S_y^m x|
    in adjoint-correct form: for each offset, sign(x - shifted) minus the
    back-shifted sign image."""
    p = cfg.btv_kernel_size // 2
    grad = jnp.zeros_like(x)
    h, w = x.shape[0], x.shape[1]
    trailing = ((0, 0),) * (x.ndim - 2)
    xp = jnp.pad(x, ((p, p), (p, p)) + trailing, mode="edge")

    def shift_x(dy, dx):
        return xp[p + dy : p + dy + h, p + dx : p + dx + w]

    for dy in range(-p, p + 1):
        for dx in range(-p, p + 1):
            if dy == 0 and dx == 0:
                continue
            weight = cfg.alpha ** (abs(dy) + abs(dx))
            s = jnp.sign(x - shift_x(dy, dx))
            sp = jnp.pad(s, ((p, p), (p, p)) + trailing, mode="edge")
            s_back = sp[p - dy : p - dy + h, p - dx : p - dx + w]
            grad = grad + weight * (s - s_back)
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
    from multi_frame_super_resolution_tpu.ops.warp_fast import upsample_int

    hr_flows = jax.vmap(lambda fl: upsample_int(fl, cfg.scale, "bilinear") * cfg.scale)(
        flows
    )

    x0 = upscale(frames[cfg.temporal_radius], cfg.scale, "bicubic")

    # flows are constant across iterations: build the (forward, inverse)
    # warp closures once per window frame, outside the solver loop
    n_window = frames.shape[0]
    warps = [
        (_make_warp(-hr_flows[k], cfg), _make_warp(hr_flows[k], cfg))
        for k in range(n_window)
    ]

    def iteration(_, x):
        data_grad = jnp.zeros_like(x)
        for k in range(n_window):
            fwd, inv = warps[k]
            # warp HR estimate into frame-k geometry: sample x at
            # ref-coords of each frame-k pixel = backward warp by -flow
            sim = _degrade(x, fwd, cfg)
            resid = jnp.sign(sim - frames[k])
            data_grad = data_grad + _degrade_adjoint(resid, inv, cfg)
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
