"""Anisotropic kernel-regression merge (the handheld-SR fusion core).

TPU-native equivalents of:
  * ComputeKernelParam (kernel.cu:717-790) — structure-tensor
    eigendecomposition -> merge-kernel inverse covariance Omega^-1
  * accumulateImages / accumulateImagesSuperRes
    (DeBayerKernels.cu:289-468) — per-output-pixel 5x5 gather-accumulate of
    shifted RAW/RGB samples, weighted by exp(-1/2 d^T Omega^-1 d) x
    per-channel certainty
  * ApplyWeighting (kernel.cu:425-481) — weight-threshold fallback blend
    and normalization

Design notes (TPU): the 5x5 neighborhood loop is a static Python loop of
25 gathers per frame; frames are folded with ``lax.scan`` so peak memory
stays at a few output-sized arrays. Unlike the reference (whose weights
use only the integer tap offsets, DeBayerKernels.cu:335), the weight uses
the true subpixel displacement d = sample_pos - target_pos, which is what
the underlying method prescribes and reduces to the reference's behavior
for integer-aligned shifts.

FIRST-ORDER regression (``order=1``, round 4): the reference's merge is a
zeroth-order (Nadaraya-Watson) weighted average, whose estimate lands at
the samples' weighted CENTROID rather than the query pixel — at 5-frame
CFA sample density this injects gradient-proportional high-frequency
error that capped true-HR fidelity at ~26.8 dB even with PERFECT flows
(tools/eval_gt_flow.py, round-4 diagnostic; high-band error RMS 0.035 vs
low-band 0.022). order=1 fits value + gradient per output pixel (local
linear kernel regression, Takeda et al. IEEE TIP 2007) and evaluates at
the query point, removing centroid bias exactly to first order:
+0.6 dB true-HR fidelity at equal flows (27.3 vs 26.7 dB). The merges
then return 9 moment planes (sum w * {1, dy, dx, dy^2, dy dx, dx^2} and
sum w v * {1, dy, dx}) consumed by ``solve_order1``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from multi_frame_super_resolution_tpu.config import MergeConfig
from multi_frame_super_resolution_tpu.ops.debayer import CFA, cfa_channel_map
from multi_frame_super_resolution_tpu.ops.filters import box_filter
from multi_frame_super_resolution_tpu.ops.geometry import resize


def kernel_params(
    tensor: jnp.ndarray, cfg: MergeConfig = MergeConfig(), eps: float = 1e-12
) -> jnp.ndarray:
    """Structure tensor (..., 3) as (dx^2, dy^2, dxdy) -> Omega^-1 packed as
    (..., 3) = (inv_xx, inv_yy, inv_xy), the exact math of
    ComputeKernelParam (kernel.cu:736-789)."""
    a11 = tensor[..., 0]
    a22 = tensor[..., 1]
    a12 = tensor[..., 2]

    help_ = jnp.sqrt((a22 - a11) ** 2 + 4.0 * a12 * a12)
    c = 2.0 * a12
    s = a22 - a11 + help_
    norm = jnp.sqrt(c * c + s * s)
    safe = norm > 0
    c = jnp.where(safe, c / jnp.where(safe, norm, 1.0), 1.0)
    s = jnp.where(safe, s / jnp.where(safe, norm, 1.0), 0.0)

    lam1 = (a11 + a22 + help_) / 2.0
    lam2 = (a11 + a22 - help_) / 2.0

    a = 1.0 + jnp.sqrt((lam1 - lam2) ** 2 / jnp.maximum((lam1 + lam2) ** 2, eps))
    d = jnp.clip(1.0 - jnp.sqrt(jnp.maximum(lam1, 0.0)) / cfg.d_tr + cfg.d_th, 0.0, 1.0)

    k1h = cfg.k_detail * cfg.k_stretch * a
    k2h = cfg.k_detail / cfg.k_shrink * a
    k1 = ((1.0 - d) * k1h + d * cfg.k_detail * cfg.k_denoise) ** 2
    k2 = ((1.0 - d) * k2h + d * cfg.k_detail * cfg.k_denoise) ** 2
    # variance clamps (see MergeConfig.k_min/k_max): keep the kernel wide
    # enough that 3-8 frames cover the output grid, narrow enough not to
    # smear along edges
    k1 = jnp.clip(k1, cfg.k_min, cfg.k_max)
    k2 = jnp.clip(k2, cfg.k_min, cfg.k_max)

    x2, y2 = c, s
    x1, y1 = s, -c
    b11 = k1 * x1 * x1 + k2 * x2 * x2
    b12 = k1 * x1 * y1 + k2 * x2 * y2
    b22 = k1 * y1 * y1 + k2 * y2 * y2
    det = b11 * b22 - b12 * b12 + 1e-10
    return jnp.stack([b22 / det, b11 / det, -b12 / det], axis=-1)


def _gather2(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    return img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]


def _tap_weight(dy, dx, omega_inv):
    w = (
        dx * dx * omega_inv[..., 0]
        + dy * dy * omega_inv[..., 1]
        + 2.0 * dx * dy * omega_inv[..., 2]
    )
    w = jnp.exp(-0.5 * w)
    return jnp.nan_to_num(w, nan=0.0, posinf=0.0, neginf=0.0)


def merge_burst_rgb(
    burst: jnp.ndarray,
    flows: jnp.ndarray,
    certainty: jnp.ndarray,
    omega_inv: jnp.ndarray,
    scale: int,
    radius: int = 2,
    order: int = 0,
) -> Tuple[jnp.ndarray, ...]:
    """Kernel-regression merge of an RGB burst onto a scale-x output grid.

    burst: (F, H, W, 3); flows: (F, H, W, 2) in input pixel units with the
    alignment convention frame_f(x + flow_f(x)) ~= ref(x);
    certainty: (F, H, W, 3); omega_inv: (H, W, 3).
    order=0: returns (num, den), each (sH, sW, 3); out = num/den after
    apply_weighting. order=1: returns the 9 local-linear moment planes
    consumed by solve_order1.
    """
    f, h, w = burst.shape[:3]
    sh, sw = h * scale, w * scale

    # input-resolution positions of every output pixel
    py = (jnp.arange(sh, dtype=jnp.float32) + 0.5) / scale - 0.5
    px = (jnp.arange(sw, dtype=jnp.float32) + 0.5) / scale - 0.5
    py = jnp.broadcast_to(py[:, None], (sh, sw))
    px = jnp.broadcast_to(px[None, :], (sh, sw))

    omega_out = resize(omega_inv, sh, sw, "bilinear")
    n_acc = 9 if order == 1 else 2

    def accumulate_frame(carry, frame_data):
        frame, flow, cert = frame_data
        flow_out = resize(flow, sh, sw, "bilinear")
        qy = py + flow_out[..., 0]
        qx = px + flow_out[..., 1]
        ny = jnp.round(qy).astype(jnp.int32)
        nx = jnp.round(qx).astype(jnp.int32)
        acc = list(carry)
        for oy in range(-radius, radius + 1):
            for ox in range(-radius, radius + 1):
                ry = ny + oy
                rx = nx + ox
                # displacements in OUTPUT-grid units, as in
                # accumulateImagesSuperRes (its tap offsets are output
                # pixel steps, DeBayerKernels.cu:410-427)
                dy = (ry.astype(jnp.float32) - qy) * scale
                dx = (rx.astype(jnp.float32) - qx) * scale
                wgt = _tap_weight(dy, dx, omega_out)
                vals = _gather2(frame, ry, rx)
                cert_s = _gather2(cert, ry, rx)
                cw = wgt[..., None] * cert_s
                cwv = vals * cw
                if order == 0:
                    acc[0] = acc[0] + cwv
                    acc[1] = acc[1] + cw
                else:
                    dye = dy[..., None]
                    dxe = dx[..., None]
                    acc[0] = acc[0] + cw
                    acc[1] = acc[1] + cw * dye
                    acc[2] = acc[2] + cw * dxe
                    acc[3] = acc[3] + (cw * dye) * dye
                    acc[4] = acc[4] + (cw * dye) * dxe
                    acc[5] = acc[5] + (cw * dxe) * dxe
                    acc[6] = acc[6] + cwv
                    acc[7] = acc[7] + cwv * dye
                    acc[8] = acc[8] + cwv * dxe
        return tuple(acc), None

    acc0 = tuple(jnp.zeros((sh, sw, 3), jnp.float32) for _ in range(n_acc))
    acc, _ = jax.lax.scan(accumulate_frame, acc0, (burst, flows, certainty))
    if order == 0:
        return acc[0], acc[1]
    return acc


def merge_burst_raw(
    raw_burst: jnp.ndarray,
    flows: jnp.ndarray,
    certainty: jnp.ndarray,
    omega_inv: jnp.ndarray,
    cfa: CFA,
    scale: int,
    radius: int = 2,
    order: int = 0,
) -> Tuple[jnp.ndarray, ...]:
    """Kernel-regression merge of a Bayer RAW burst onto a scale-x grid —
    the accumulateImagesSuperRes equivalent (DeBayerKernels.cu:378-468).

    raw_burst: (F, H, W) already black/white normalized (scale_raw);
    flows: (F, H, W, 2) RAW pixel units; certainty: (F, H//2, W//2, 3)
    half-res RGB certainties; omega_inv: (H, W, 3) at RAW resolution.
    Each RAW sample contributes only to its own CFA channel.
    order=1: returns the 9 local-linear moment planes for solve_order1.
    """
    f, h, w = raw_burst.shape
    sh, sw = h * scale, w * scale

    py = (jnp.arange(sh, dtype=jnp.float32) + 0.5) / scale - 0.5
    px = (jnp.arange(sw, dtype=jnp.float32) + 0.5) / scale - 0.5
    py = jnp.broadcast_to(py[:, None], (sh, sw))
    px = jnp.broadcast_to(px[None, :], (sh, sw))

    omega_out = resize(omega_inv, sh, sw, "bilinear")
    chan = jnp.asarray(cfa_channel_map(h, w, cfa))
    eye3 = jnp.eye(3, dtype=jnp.float32)
    n_acc = 9 if order == 1 else 2

    def accumulate_frame(carry, frame_data):
        raw, flow, cert = frame_data
        flow_out = resize(flow, sh, sw, "bilinear")
        qy = py + flow_out[..., 0]
        qx = px + flow_out[..., 1]
        ny = jnp.round(qy).astype(jnp.int32)
        nx = jnp.round(qx).astype(jnp.int32)
        acc = list(carry)
        for oy in range(-radius, radius + 1):
            for ox in range(-radius, radius + 1):
                ry = jnp.clip(ny + oy, 0, h - 1)
                rx = jnp.clip(nx + ox, 0, w - 1)
                dy = (ry.astype(jnp.float32) - qy) * scale
                dx = (rx.astype(jnp.float32) - qx) * scale
                wgt = _tap_weight(dy, dx, omega_out)
                vals = raw[ry, rx]
                ch = chan[ry, rx]  # CFA channel of each sample
                cert_px = cert[ry // 2, rx // 2]  # (sh, sw, 3) half-res
                cert_s = jnp.take_along_axis(cert_px, ch[..., None], axis=-1)[..., 0]
                onehot = eye3[ch]  # (sh, sw, 3)
                cw = (wgt * cert_s)[..., None] * onehot
                cwv = vals[..., None] * cw
                if order == 0:
                    acc[0] = acc[0] + cwv
                    acc[1] = acc[1] + cw
                else:
                    dye = dy[..., None]
                    dxe = dx[..., None]
                    acc[0] = acc[0] + cw
                    acc[1] = acc[1] + cw * dye
                    acc[2] = acc[2] + cw * dxe
                    acc[3] = acc[3] + (cw * dye) * dye
                    acc[4] = acc[4] + (cw * dye) * dxe
                    acc[5] = acc[5] + (cw * dxe) * dxe
                    acc[6] = acc[6] + cwv
                    acc[7] = acc[7] + cwv * dye
                    acc[8] = acc[8] + cwv * dxe
        return tuple(acc), None

    acc0 = tuple(jnp.zeros((sh, sw, 3), jnp.float32) for _ in range(n_acc))
    acc, _ = jax.lax.scan(
        accumulate_frame, acc0, (raw_burst, flows, certainty)
    )
    if order == 0:
        return acc[0], acc[1]
    return acc


def solve_order1(
    moments: Tuple[jnp.ndarray, ...], ridge: float = 0.02
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Local-linear solve of the 9 moment planes -> (estimate, m00).

    Per pixel/channel solves the weighted normal equations
      [m00 m01 m02] [a ]   [b0]
      [m01 m11 m12] [gy] = [b1]
      [m02 m12 m22] [gx]   [b2]
    via the adjugate and returns the value estimate ``a`` (the gradient
    is discarded). ``ridge`` * m00 is added to the gradient diagonal —
    density-invariant Tikhonov regularization that shrinks toward the
    order-0 average when the sample spread is poor (calibrated on
    true-HR fidelity: 0.01-0.05 within 0.03 dB, tools/proto_order1.py).
    Falls back to the order-0 estimate b0/m00 where the system is
    near-singular. m00 (the plain weight sum) doubles as the coverage
    field for apply_weighting_order1."""
    m00, m01, m02, m11, m12, m22, b0, b1, b2 = moments
    m11 = m11 + ridge * m00
    m22 = m22 + ridge * m00
    c00 = m11 * m22 - m12 * m12
    c01 = m02 * m12 - m01 * m22
    c02 = m01 * m12 - m02 * m11
    det = m00 * c00 + m01 * c01 + m02 * c02
    a_num = c00 * b0 + c01 * b1 + c02 * b2
    order0 = jnp.where(m00 > 1e-8, b0 / jnp.maximum(m00, 1e-8), 0.0)
    good = jnp.abs(det) > 1e-6 * jnp.maximum(m00, 1e-8) ** 3
    est = jnp.where(good, a_num / jnp.where(good, det, 1.0), order0)
    return est, m00


def grad_image(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradient along the two LEADING spatial axes
    (oracle output layout (sH, sW, C)), edge-clamped, output-px units."""
    up = jnp.concatenate([img[:1], img[:-1]], axis=0)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    left = jnp.concatenate([img[:, :1], img[:, :-1]], axis=1)
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    return 0.5 * (down - up), 0.5 * (right - left)


def solve_plugin(
    moments: Tuple[jnp.ndarray, ...],
    grad_fn,
    iters: int = 2,
    precomputed_centroid: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First-order centroid-bias correction with a PLUGIN gradient.

    The order-0 (Nadaraya-Watson) estimate lands at the samples' weighted
    centroid rather than the query pixel: pilot = b0/m00 estimates the
    signal at query + c, c = (m01, m02)/m00 (the weighted mean
    displacement). To first order f(query) = pilot - grad f . c — the
    same bias the exact order-1 solve removes, but with the gradient
    taken from the PILOT image instead of jointly fitted, so only FOUR
    moment stacks (m00, m01, m02, b0) are accumulated: ~2x the order-0
    merge volume instead of 4.5x (the full 9-moment accumulate measured
    1.9 ms extra on v5e at city size — the fast path's budget is <0.5).
    Iterating re-evaluates the gradient on the corrected estimate
    (fixed-point of est = pilot - grad(est) . c; |c| < 1 px makes it a
    contraction). Accepts the full 9-stack tuple (uses slots 0, 1, 2, 6)
    or the compact 4-stack (m00, m01, m02, b0).

    grad_fn(img) -> (gy, gx) must return central differences in OUTPUT
    pixel units in the estimate's own layout (grad_image /
    fast_merge.grad_phases)."""
    m00, m01, m02 = moments[0], moments[1], moments[2]
    b0 = moments[6] if len(moments) == 9 else moments[3]
    ok = m00 > 1e-8
    inv = jnp.where(ok, 1.0 / jnp.maximum(m00, 1e-8), 0.0)
    pilot = b0 * inv
    if precomputed_centroid:
        # fast_merge's certless shared centroid (centroid_cert=False):
        # slots 1/2 already hold clipped (cy, cx) fields
        cy, cx = m01, m02
    else:
        # clamp the centroid to +-2 output px: where coverage is
        # marginal (m00 barely above the weight threshold) the ratio
        # can reach several pixels and the correction overshoots — the
        # exact solver has ridge + determinant guards, this is the
        # plugin equivalent (advisor finding r4; normal-coverage
        # centroids measure ~0.2 px)
        cy = jnp.clip(m01 * inv, -2.0, 2.0)
        cx = jnp.clip(m02 * inv, -2.0, 2.0)
    est = pilot
    for _ in range(max(iters, 0)):
        gy, gx = grad_fn(est)
        est = pilot - (gy * cy + gx * cx)
    return est, m00


def apply_weighting_order1(
    est: jnp.ndarray,
    m00: jnp.ndarray,
    fallback: jnp.ndarray,
    threshold: float,
) -> jnp.ndarray:
    """ApplyWeighting for the order-1 estimate (already normalized):
    below-threshold coverage blends toward the fallback with the same
    soft weight-proportional mix as apply_weighting (kernel.cu:425-481),
    out = (est * m00 + fallback) / (m00 + 1)."""
    low = m00 < threshold
    return jnp.where(low, (est * m00 + fallback) / (m00 + 1.0), est)


def apply_weighting(
    num: jnp.ndarray,
    den: jnp.ndarray,
    fallback: jnp.ndarray,
    threshold: float,
) -> jnp.ndarray:
    """Normalize the accumulators, blending in the fallback image where the
    accumulated weight is below threshold — exact ApplyWeighting behavior
    (kernel.cu:425-481)."""
    low = den < threshold
    num = jnp.where(low, num + fallback, num)
    den = jnp.where(low, den + 1.0, den)
    return jnp.where(den != 0, num / jnp.where(den != 0, den, 1.0), 0.0)


def smoothed_structure_tensor(gray: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """Derivatives -> per-pixel structure tensor, box-smoothed over a small
    window (gradient aggregation ahead of ComputeKernelParam)."""
    from multi_frame_super_resolution_tpu.ops.derivatives import (
        derivatives,
        structure_tensor,
    )

    dx, dy = derivatives(gray)
    st = structure_tensor(dx, dy)
    if window > 1:
        st = box_filter(st, window, normalize=True)
    return st
