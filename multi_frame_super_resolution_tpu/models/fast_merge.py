"""Gatherless kernel-regression merge — the TPU fast path.

Reformulates the accumulate kernels (DeBayerKernels.cu:289-468) for the
VPU: frames are first warped into reference geometry by their per-tile
INTEGER shifts (one DMA/structured-gather per frame, see
ops.warp_fast / pallas_ops.tile_warp); what remains per output pixel is a
STATIC tap window around its nearest input sample, with the bounded
subpixel residual folded into the per-pixel Gaussian weights. Every tap
is a static shift x elementwise weight — no gathers anywhere, and XLA
fuses the whole tap loop into a handful of VPU passes.

Weight model matches models.merge (true-displacement weights
w = exp(-1/2 d^T Omega^-1 d) x certainty); parity with the gather-based
oracle is covered by tests/test_fast_path.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.ops.warp_fast import (
    _shift2d,
    upsample_nearest,
)


def _output_phase_offsets(s: int) -> np.ndarray:
    """phi(o % s) = (o + 0.5)/s - 0.5 - o//s: the constant fractional
    position of each output phase relative to its nearest input sample."""
    o = np.arange(s, dtype=np.float32)
    return (o + 0.5) / s - 0.5


def merge_burst_fast(
    warped: jnp.ndarray,
    residual: jnp.ndarray,
    certainty: jnp.ndarray,
    omega_inv: jnp.ndarray,
    scale: int,
    radius: int = 2,
    residual_bound: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge tile-warped frames onto the scale-x output grid.

    warped: (F, H, W, 3) frames already integer-tile-warped to reference
    geometry; residual: (F, H, W, 2) remaining subpixel flow (clamped to
    +-residual_bound); certainty: (F, H, W, 3); omega_inv: (H, W, 3).
    Returns (num, den) at (sH, sW, 3).
    """
    f, h, w = warped.shape[:3]
    s = scale
    sh, sw = h * s, w * s
    r_taps = radius + int(np.ceil(residual_bound))

    # PHASE-SEPARATED accumulation: every output pixel of phase (py, px)
    # shares its nearest input sample with its block, so all tap math runs
    # at INPUT resolution (s^2 phase accumulators) and the s-x output is
    # assembled once at the end — ~s^2 less memory traffic than computing
    # at output resolution.
    phi = _output_phase_offsets(s)  # (s,) fractional offsets, static

    oxx = omega_inv[..., 0]
    oyy = omega_inv[..., 1]
    oxy = omega_inv[..., 2]

    def accumulate_frame(carry, frame_data):
        num, den = carry  # (s, s, H, W, 3) phase accumulators
        img, res, cert = frame_data
        res_y = jnp.clip(res[..., 0], -residual_bound, residual_bound)
        res_x = jnp.clip(res[..., 1], -residual_bound, residual_bound)
        for ky in range(-r_taps, r_taps + 1):
            for kx in range(-r_taps, r_taps + 1):
                val = _shift2d(img, ky, kx)
                cert_k = _shift2d(cert, ky, kx)
                # displacement (output-grid units) per phase: the phase
                # part is a static scalar, so the quadratic form expands
                # around the shared per-pixel residual terms
                dy0 = (ky - res_y) * s
                dx0 = (kx - res_x) * s
                for py in range(s):
                    dy = dy0 - phi[py] * s
                    for px in range(s):
                        dx = dx0 - phi[px] * s
                        wgt = jnp.exp(
                            -0.5
                            * (dx * dx * oxx + dy * dy * oyy + 2.0 * dx * dy * oxy)
                        )
                        cw = wgt[..., None] * cert_k
                        num = num.at[py, px].add(val * cw)
                        den = den.at[py, px].add(cw)
        return (num, den), None

    num0 = jnp.zeros((s, s, h, w, 3), jnp.float32)
    den0 = jnp.zeros((s, s, h, w, 3), jnp.float32)
    (num, den), _ = jax.lax.scan(
        accumulate_frame, (num0, den0), (warped, residual, certainty)
    )

    # interleave phases: (s, s, H, W, 3) -> (sH, sW, 3)
    def interleave(acc):
        return acc.transpose(2, 0, 3, 1, 4).reshape(sh, sw, 3)

    return interleave(num), interleave(den)


def merge_burst_raw_fast(
    raw_warped: jnp.ndarray,
    residual: jnp.ndarray,
    certainty_raw: jnp.ndarray,
    omega_inv: jnp.ndarray,
    cfa,
    scale: int,
    radius: int = 2,
    residual_bound: float = 2.0,
    omega_inv_rb: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gatherless CFA-aware merge (accumulateImagesSuperRes equivalent).

    raw_warped: (F, H, W) Bayer frames already warped to reference
    geometry by EVEN integer shifts (so the CFA phase is preserved);
    residual: (F, H, W, 2) remaining flow in RAW pixels; certainty_raw:
    (F, H, W, 3) robustness upsampled to RAW resolution; omega_inv:
    (H, W, 3). Each tap contributes only to its sample's CFA channel via
    STATIC checkerboard masks — no gathers. ``omega_inv_rb``, when given,
    supplies wider kernels for the sparser R/B channels (see
    MergeConfig.k_min_rb).
    """
    from multi_frame_super_resolution_tpu.ops.debayer import cfa_channel_map

    f, h, w = raw_warped.shape
    s = scale
    sh, sw = h * s, w * s
    r_taps = radius + int(np.ceil(residual_bound))

    phi = _output_phase_offsets(s)
    chan = cfa_channel_map(h, w, cfa)  # (H, W) int
    eye3 = np.eye(3, dtype=np.float32)
    if omega_inv_rb is None:
        omega_inv_rb = omega_inv
    g_sel = jnp.asarray([0.0, 1.0, 0.0])
    rb_sel = jnp.asarray([1.0, 0.0, 1.0])

    def accumulate_frame(carry, frame_data):
        num, den = carry  # (s, s, H, W, 3)
        raw, res, cert = frame_data
        res_y = jnp.clip(res[..., 0], -residual_bound, residual_bound)
        res_x = jnp.clip(res[..., 1], -residual_bound, residual_bound)
        for ky in range(-r_taps, r_taps + 1):
            for kx in range(-r_taps, r_taps + 1):
                val = _shift2d(raw, ky, kx)
                cert_k = _shift2d(cert, ky, kx)
                # static CFA channel of the sampled site: the warp
                # preserved parity, so chan shifted by (ky, kx) with edge
                # clamp equals the sampled site's channel
                ch = np.roll(chan, (-ky, -kx), axis=(0, 1))
                # (edge rows differ from clamped-shift semantics only in
                # the R-pixel border; acceptable for the masked channels)
                onehot = jnp.asarray(eye3[ch])  # (H, W, 3) static
                contrib_c = cert_k * onehot
                dy0 = (ky - res_y) * s
                dx0 = (kx - res_x) * s
                for py in range(s):
                    dy = dy0 - phi[py] * s
                    for px in range(s):
                        dx = dx0 - phi[px] * s

                        def quad(om):
                            return jnp.exp(
                                -0.5
                                * (
                                    dx * dx * om[..., 0]
                                    + dy * dy * om[..., 1]
                                    + 2.0 * dx * dy * om[..., 2]
                                )
                            )

                        w3 = (
                            quad(omega_inv)[..., None] * g_sel
                            + quad(omega_inv_rb)[..., None] * rb_sel
                        )
                        cw = w3 * contrib_c
                        num = num.at[py, px].add(val[..., None] * cw)
                        den = den.at[py, px].add(cw)
        return (num, den), None

    num0 = jnp.zeros((s, s, h, w, 3), jnp.float32)
    den0 = jnp.zeros((s, s, h, w, 3), jnp.float32)
    (num, den), _ = jax.lax.scan(
        accumulate_frame, (num0, den0), (raw_warped, residual, certainty_raw)
    )

    def interleave(acc):
        return acc.transpose(2, 0, 3, 1, 4).reshape(sh, sw, 3)

    return interleave(num), interleave(den)
