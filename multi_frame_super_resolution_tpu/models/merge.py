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
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Kernel-regression merge of an RGB burst onto a scale-x output grid.

    burst: (F, H, W, 3); flows: (F, H, W, 2) in input pixel units with the
    alignment convention frame_f(x + flow_f(x)) ~= ref(x);
    certainty: (F, H, W, 3); omega_inv: (H, W, 3).
    Returns (num, den), each (sH, sW, 3); out = num/den after
    apply_weighting.
    """
    f, h, w = burst.shape[:3]
    sh, sw = h * scale, w * scale

    # input-resolution positions of every output pixel
    py = (jnp.arange(sh, dtype=jnp.float32) + 0.5) / scale - 0.5
    px = (jnp.arange(sw, dtype=jnp.float32) + 0.5) / scale - 0.5
    py = jnp.broadcast_to(py[:, None], (sh, sw))
    px = jnp.broadcast_to(px[None, :], (sh, sw))

    omega_out = resize(omega_inv, sh, sw, "bilinear")

    def accumulate_frame(carry, frame_data):
        num, den = carry
        frame, flow, cert = frame_data
        flow_out = resize(flow, sh, sw, "bilinear")
        qy = py + flow_out[..., 0]
        qx = px + flow_out[..., 1]
        ny = jnp.round(qy).astype(jnp.int32)
        nx = jnp.round(qx).astype(jnp.int32)
        for oy in range(-radius, radius + 1):
            for ox in range(-radius, radius + 1):
                ry = ny + oy
                rx = nx + ox
                # displacements in OUTPUT-grid units, as in
                # accumulateImagesSuperRes (its tap offsets are output
                # pixel steps, DeBayerKernels.cu:410-427)
                wgt = _tap_weight(
                    (ry.astype(jnp.float32) - qy) * scale,
                    (rx.astype(jnp.float32) - qx) * scale,
                    omega_out,
                )
                vals = _gather2(frame, ry, rx)
                cert_s = _gather2(cert, ry, rx)
                cw = wgt[..., None] * cert_s
                num = num + vals * cw
                den = den + cw
        return (num, den), None

    num0 = jnp.zeros((sh, sw, 3), jnp.float32)
    den0 = jnp.zeros((sh, sw, 3), jnp.float32)
    (num, den), _ = jax.lax.scan(accumulate_frame, (num0, den0), (burst, flows, certainty))
    return num, den


def merge_burst_raw(
    raw_burst: jnp.ndarray,
    flows: jnp.ndarray,
    certainty: jnp.ndarray,
    omega_inv: jnp.ndarray,
    cfa: CFA,
    scale: int,
    radius: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Kernel-regression merge of a Bayer RAW burst onto a scale-x grid —
    the accumulateImagesSuperRes equivalent (DeBayerKernels.cu:378-468).

    raw_burst: (F, H, W) already black/white normalized (scale_raw);
    flows: (F, H, W, 2) RAW pixel units; certainty: (F, H//2, W//2, 3)
    half-res RGB certainties; omega_inv: (H, W, 3) at RAW resolution.
    Each RAW sample contributes only to its own CFA channel.
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

    def accumulate_frame(carry, frame_data):
        num, den = carry
        raw, flow, cert = frame_data
        flow_out = resize(flow, sh, sw, "bilinear")
        qy = py + flow_out[..., 0]
        qx = px + flow_out[..., 1]
        ny = jnp.round(qy).astype(jnp.int32)
        nx = jnp.round(qx).astype(jnp.int32)
        for oy in range(-radius, radius + 1):
            for ox in range(-radius, radius + 1):
                ry = jnp.clip(ny + oy, 0, h - 1)
                rx = jnp.clip(nx + ox, 0, w - 1)
                wgt = _tap_weight(
                    (ry.astype(jnp.float32) - qy) * scale,
                    (rx.astype(jnp.float32) - qx) * scale,
                    omega_out,
                )
                vals = raw[ry, rx]
                ch = chan[ry, rx]  # CFA channel of each sample
                cert_px = cert[ry // 2, rx // 2]  # (sh, sw, 3) half-res
                cert_s = jnp.take_along_axis(cert_px, ch[..., None], axis=-1)[..., 0]
                onehot = eye3[ch]  # (sh, sw, 3)
                cw = (wgt * cert_s)[..., None] * onehot
                num = num + vals[..., None] * cw
                den = den + cw
        return (num, den), None

    num0 = jnp.zeros((sh, sw, 3), jnp.float32)
    den0 = jnp.zeros((sh, sw, 3), jnp.float32)
    (num, den), _ = jax.lax.scan(
        accumulate_frame, (num0, den0), (raw_burst, flows, certainty)
    )
    return num, den


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
