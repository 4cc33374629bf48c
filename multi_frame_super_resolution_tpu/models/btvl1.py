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


def _blur_taps(cfg: BTVConfig) -> np.ndarray:
    sigma = cfg.blur_sigma if cfg.blur_sigma > 0 else cfg.scale * 0.5
    size = 2 * int(np.ceil(2 * sigma)) + 1
    return gaussian_kernel_1d(sigma, size)


def _blur(img: jnp.ndarray, cfg: BTVConfig) -> jnp.ndarray:
    k = jnp.asarray(_blur_taps(cfg))
    return separable_filter(img, k, k)


def _blur_decimate(img: jnp.ndarray, cfg: BTVConfig, s: int) -> jnp.ndarray:
    """Fused H then D: blur + s-strided decimation computed ONLY at the
    kept samples (matches _block_mean(_blur(img)) composed with the same
    taps — here the decimation is the strided-mean so the box taps fold
    into the Gaussian). Strided shift-sum: every tap is a strided slice
    of the edge-padded image — 1/s^2 of the naive blur's work and no
    full-res intermediate.

    Equivalent (to fp tolerance) of _block_mean(_blur(img, cfg), s);
    the equality is pinned in tests/test_btvl1.py."""
    taps = _blur_taps(cfg)
    r = len(taps) // 2
    h, w = img.shape[0] // s * s, img.shape[1] // s * s
    img = img[:h, :w]
    # compose the Gaussian with the s-wide box of _block_mean
    box = np.ones(s, np.float64) / s
    k = np.convolve(np.asarray(taps, np.float64), box)
    r2 = r  # combined taps span [ -r, r + s - 1 ] around the block start
    pads = ((r2, r2 + s - 1), (r2, r2 + s - 1)) + ((0, 0),) * (img.ndim - 2)
    xp = jnp.pad(img, pads, mode="edge")

    def axis_pass(x, axis):
        out = None
        n = (h if axis == 0 else w) // s
        for t, kt in enumerate(k):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(t, t + (n - 1) * s + 1, s)
            term = x[tuple(sl)] * float(kt)
            out = term if out is None else out + term
        return out

    return axis_pass(axis_pass(xp, 0), 1)


def _adjoint_blur_up(r: jnp.ndarray, cfg: BTVConfig, s: int) -> jnp.ndarray:
    """Fused ``_blur(_block_mean_adjoint(r, s), cfg)`` — the adjoint-side
    H Bᵀ of the degradation operator — computed polyphase: per axis, each
    of the s output phases is a short conv of the LR residual with the
    phase's subsampled taps (out[s i + p] = Σ_t k[t] r[(s i + p + t - r)/s]
    with duplicate source indices merged), so no HR intermediate is ever
    materialized and the tap count per HR output drops from K to ~K/s.

    Exact including borders: edge-replicating the LR input commutes with
    the block repeat (the repeat's edge rows ARE the LR edge rows).
    Equality with the composed form is pinned in tests/test_btvl1.py."""
    taps = _blur_taps(cfg)
    # the adjoint's 1/s^2 splits as 1/s per separable axis pass
    k = np.asarray(taps, np.float64) / s
    r2 = len(k) // 2
    # per-phase (source-offset -> weight) tables
    phase_taps = []
    max_off = 0
    for p in range(s):
        d: dict = {}
        for t in range(len(k)):
            src = (p + t - r2) // s  # floor division (negative-safe)
            d[src] = d.get(src, 0.0) + float(k[t])
        phase_taps.append(sorted(d.items()))
        max_off = max(max_off, max(abs(o) for o, _ in d.items()))
    h, w = r.shape[0], r.shape[1]
    pad = max_off
    pads = ((pad, pad), (pad, pad)) + ((0, 0),) * (r.ndim - 2)
    xp = jnp.pad(r, pads, mode="edge")

    def axis_up(x, axis, length):
        phases = []
        for p in range(s):
            acc = None
            for off, wgt in phase_taps[p]:
                sl = [slice(None)] * x.ndim
                sl[axis] = slice(pad + off, pad + off + length)
                term = x[tuple(sl)] * wgt
                acc = term if acc is None else acc + term
            phases.append(acc)
        stacked = jnp.stack(phases, axis=axis + 1)
        shape = list(phases[0].shape)
        shape[axis] *= s
        return stacked.reshape(shape)

    out = axis_up(xp, 0, h)  # (s*h, w + 2 pad, ...)
    return axis_up(out, 1, w)


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


def _btv_gradient(x: jnp.ndarray, cfg: BTVConfig) -> jnp.ndarray:
    """Subgradient of the bilateral TV prior
    sum_{(l,m)!=0, |l|,|m|<=p} alpha^(|l|+|m|) |x - S_x^l S_y^m x|
    in adjoint-correct form: for each offset, sign(x - shifted) minus the
    back-shifted sign image."""
    p = cfg.btv_kernel_size // 2
    grad = None
    h, w = x.shape[0], x.shape[1]
    trailing = ((0, 0),) * (x.ndim - 2)
    xp = jnp.pad(x, ((p, p), (p, p)) + trailing, mode="edge")

    def shift_x(dy, dx):
        return xp[p + dy : p + dy + h, p + dx : p + dx + w]

    def shift_s(s, dy, dx):
        sp = jnp.pad(s, ((p, p), (p, p)) + trailing, mode="edge")
        return sp[p + dy : p + dy + h, p + dx : p + dx + w]

    # opposite offsets pair up: in the interior
    # S_{-d} sign(x - S_d x) = -sign(x - S_{-d} x), so each pair (d, -d)
    # contributes 2 w_d (s_d - S_{-d} s_d) — half the shifts/signs of the
    # naive double loop (boundary rows differ by the pad order only)
    for dy in range(0, p + 1):
        for dx in range(-p, p + 1):
            if dy == 0 and dx <= 0:
                continue
            weight = 2.0 * cfg.alpha ** (abs(dy) + abs(dx))
            s = jnp.sign(x - shift_x(dy, dx))
            term = weight * (s - shift_s(s, -dy, -dx))
            grad = term if grad is None else grad + term
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
    return _btvl1_window(frames, cfg, flow_cfg, flows)


def _btvl1_window(
    frames: jnp.ndarray,
    cfg: BTVConfig = BTVConfig(),
    flow_cfg: Optional[FlowConfig] = None,
    flows: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Solve one temporal window (W, H, W[, C]) whose center frame is the
    target — the vmappable core of btvl1_superres/btvl1_video."""
    gray = rgb_to_gray(frames) if frames.ndim == 4 else frames
    ref_gray = gray[cfg.temporal_radius]
    n_window = frames.shape[0]
    center = cfg.temporal_radius
    # when WE estimate the flows, the center frame IS the target: its
    # flow is identically zero, so its warp is the identity and it is
    # never estimated (a third of the per-iteration warp volume at
    # r=1). Caller-INJECTED flows (the custom-DenseOpticalFlowExt
    # analog, multi_frame_sr.cpp:179) are honored verbatim for every
    # window frame, center included.
    identity_center = flows is None
    alt_idx = (
        [i for i in range(n_window) if i != center]
        if identity_center
        else list(range(n_window))
    )

    if flows is None:
        if flow_cfg is None:
            flow_cfg = FlowConfig(method=cfg.optical_flow)
        flow_fn = create_optical_flow(flow_cfg)
        # flow_k: frame_k(x + flow_k(x)) ~= target(x), estimated at LR,
        # lifted to the HR grid
        alt_flows = jax.vmap(lambda g: flow_fn(ref_gray, g))(gray[alt_idx, ...])
    else:
        alt_flows = flows
    h, w = ref_gray.shape
    sh, sw = h * cfg.scale, w * cfg.scale
    from multi_frame_super_resolution_tpu.ops.warp_fast import upsample_int

    hr_flows = jax.vmap(lambda fl: upsample_int(fl, cfg.scale, "bilinear") * cfg.scale)(
        alt_flows
    )

    # integer-factor bicubic via static phase taps: numerically identical
    # to upscale(..) but gatherless — the gather resize measured 54 ms on
    # v5e at city HR, i.e. more than the entire 10-iteration solve
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        upsample_int as _up_int,
    )

    x0 = _up_int(frames[cfg.temporal_radius], cfg.scale, "bicubic")

    # flows are constant across iterations; all alternate frames run as
    # ONE batched computation per iteration (warp/blur/decimate vmapped
    # over the window axis) instead of a sequential per-frame loop
    n_alts = len(alt_idx)
    if cfg.fast:
        from multi_frame_super_resolution_tpu.ops.warp_fast import (
            decompose_flow,
            tile_warp_select,
            warp_bounded,
        )

        rb = cfg.warp_residual_bound

        def decomp(fl):
            ti, res = decompose_flow(fl, cfg.warp_tile)
            return ti, jnp.clip(res, -rb, rb)

        t_fwd, r_fwd = jax.vmap(lambda fl: decomp(-fl))(hr_flows)
        t_inv, r_inv = jax.vmap(decomp)(hr_flows)

        def warp_frames(xs, tints, res):
            return jax.vmap(
                lambda xx, ti, rr: warp_bounded(
                    tile_warp_select(xx, ti, cfg.warp_tile), rr, rb
                )
            )(xs, tints, res)

        warp_fwd = lambda xs: warp_frames(xs, t_fwd, r_fwd)
        warp_inv = lambda xs: warp_frames(xs, t_inv, r_inv)
    else:
        warp_fwd = jax.vmap(lambda xx, fl: warp_backward(xx, -fl), in_axes=(0, 0))
        warp_inv = jax.vmap(warp_backward, in_axes=(0, 0))
        warp_fwd = lambda xs, _w=warp_fwd: _w(xs, hr_flows)
        warp_inv = lambda xs, _w=warp_inv: _w(xs, hr_flows)

    frames_alt = frames[alt_idx, ...]
    frame_c = frames[center]

    def iteration(_, x):
        xs = jnp.broadcast_to(x, (n_alts,) + x.shape)
        # warp HR estimate into each alternate's geometry (backward warp
        # by -flow), then fused blur+decimate => simulated LR frames
        sims_alt = jax.vmap(lambda w: _blur_decimate(w, cfg, cfg.scale))(
            warp_fwd(xs)
        )
        resid_alt = jnp.sign(sims_alt - frames_alt)
        ups_alt = jax.vmap(
            lambda r: _adjoint_blur_up(r, cfg, cfg.scale)
        )(resid_alt)
        data_grad = warp_inv(ups_alt).sum(axis=0)
        if identity_center:
            sim_c = _blur_decimate(x, cfg, cfg.scale)
            resid_c = jnp.sign(sim_c - frame_c)
            data_grad = data_grad + _adjoint_blur_up(resid_c, cfg, cfg.scale)
        grad = data_grad + cfg.lam * _btv_gradient(x, cfg)
        # tau is the classical 8-bit-range step (OpenCV default 1.3); both
        # gradient terms are sign-valued, so rescale to [0,1] intensities
        return x - (cfg.tau / 255.0) * grad

    if cfg.iterations <= 4:
        x = x0
        for i in range(cfg.iterations):
            x = iteration(i, x)
    else:
        x = jax.lax.fori_loop(0, cfg.iterations, iteration, x0, unroll=2)
    return jnp.clip(x, 0.0, 1.0)


def btvl1_video(
    burst: jnp.ndarray,
    cfg: BTVConfig = BTVConfig(),
    flow_cfg: Optional[FlowConfig] = None,
) -> jnp.ndarray:
    """Super-resolve every frame of the burst (the reference app's
    `nextFrame` stream, multi_frame_sr.cpp:187-203). Returns
    (F, scale*H, scale*W[, C]).

    All per-target solves run as ONE vmapped computation (the windows
    differ only in which frames they gather), instead of the reference's
    sequential nextFrame host loop."""
    f = burst.shape[0]
    r = cfg.temporal_radius
    windows = jnp.stack(
        [
            jnp.stack([burst[(t + d) % f] for d in range(-r, r + 1)])
            for t in range(f)
        ]
    )  # (F, window, H, W[, C])
    return jax.vmap(lambda win: _btvl1_window(win, cfg, flow_cfg))(windows)
