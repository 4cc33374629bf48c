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

    # per-output-pixel fractional offset from its nearest input sample
    phi = jnp.asarray(_output_phase_offsets(s))
    phi_y = jnp.broadcast_to(phi[jnp.arange(sh) % s][:, None], (sh, sw))
    phi_x = jnp.broadcast_to(phi[jnp.arange(sw) % s][None, :], (sh, sw))

    omega_up = upsample_nearest(omega_inv, s)
    oxx = omega_up[..., 0]
    oyy = omega_up[..., 1]
    oxy = omega_up[..., 2]

    def accumulate_frame(carry, frame_data):
        num, den = carry
        img, res, cert = frame_data
        res_y = jnp.clip(res[..., 0], -residual_bound, residual_bound)
        res_x = jnp.clip(res[..., 1], -residual_bound, residual_bound)
        res_y_up = upsample_nearest(res_y, s)
        res_x_up = upsample_nearest(res_x, s)
        # q = p + res; displacement of tap k from q: d = k - phi - res
        base_dy = -(phi_y + res_y_up)
        base_dx = -(phi_x + res_x_up)
        for ky in range(-r_taps, r_taps + 1):
            # displacements in OUTPUT-grid units (matching models.merge and
            # the reference's output-pixel tap offsets)
            dy = (base_dy + ky) * s
            for kx in range(-r_taps, r_taps + 1):
                dx = (base_dx + kx) * s
                wgt = jnp.exp(
                    -0.5 * (dx * dx * oxx + dy * dy * oyy + 2.0 * dx * dy * oxy)
                )
                val = upsample_nearest(_shift2d(img, ky, kx), s)
                cert_k = upsample_nearest(_shift2d(cert, ky, kx), s)
                cw = wgt[..., None] * cert_k
                num = num + val * cw
                den = den + cw
        return (num, den), None

    num0 = jnp.zeros((sh, sw, 3), jnp.float32)
    den0 = jnp.zeros((sh, sw, 3), jnp.float32)
    (num, den), _ = jax.lax.scan(
        accumulate_frame, (num0, den0), (warped, residual, certainty)
    )
    return num, den
