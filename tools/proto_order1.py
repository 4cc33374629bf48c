"""Prototype: FIRST-ORDER (local linear) kernel-regression merge.

The round-4 GT-flow diagnostic (tools/eval_gt_flow.py) showed the
order-0 Nadaraya-Watson merge caps true-HR fidelity at ~26.8 dB even
with PERFECT flows and full certainty: at 5-frame CFA sample density
the weighted average lands at the samples' centroid, not the query
pixel, injecting gradient-proportional high-frequency error (measured:
high-band error RMS 0.035 vs low-band 0.022). Local linear regression
(Takeda et al., "Kernel Regression for Image Processing and
Reconstruction") fits value + gradient per output pixel and evaluates
at the query point — removing centroid bias exactly to first order.

Run: PYTHONPATH=/root/repo python tools/proto_order1.py [lam ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eval_fidelity import make_hr_burst  # noqa: E402
from eval_gt_flow import gt_backward_flow_raw  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.models.merge import (
        cfa_channel_map,
        kernel_params,
        smoothed_structure_tensor,
    )
    from multi_frame_super_resolution_tpu.ops.color import rgb_to_gray
    from multi_frame_super_resolution_tpu.ops.debayer import debayer_subsample
    from multi_frame_super_resolution_tpu.ops.geometry import resize, upscale
    from multi_frame_super_resolution_tpu.ops.debayer import debayer
    from multi_frame_super_resolution_tpu.utils import psnr
    from multi_frame_super_resolution_tpu.data import load_burst

    hr = np.asarray(load_burst("city")[0])
    hr_j = jnp.asarray(hr)
    hr_h, hr_w = hr.shape[:2]
    raw_np, truth = make_hr_burst(hr)
    raw = jnp.asarray(raw_np)
    f, h, w = raw.shape
    m = 16
    scale = 2
    radius = 2
    sh, sw = h * scale, w * scale
    cfa = ((0, 1), (1, 2))

    cfg = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )

    flows_gt = jnp.asarray(
        np.stack(
            [gt_backward_flow_raw(h, w, dy, dx, ang, hr_h, hr_w)
             for (dy, dx, ang) in truth]
        )
    )

    def P(name, img):
        print(f"{name:44s} "
              f"{float(psnr(hr_j[m:-m, m:-m], img[m:-m, m:-m])):6.2f} dB",
              flush=True)

    half = jax.vmap(lambda r: debayer_subsample(r, cfa))(raw)
    gray_half = rgb_to_gray(half)
    st = smoothed_structure_tensor(gray_half[0], cfg.st_window)
    omega_inv = resize(kernel_params(st, cfg.merge), h, w, "bilinear")

    chan = jnp.asarray(cfa_channel_map(h, w, cfa))
    eye3 = jnp.eye(3, dtype=jnp.float32)

    py = (jnp.arange(sh, dtype=jnp.float32) + 0.5) / scale - 0.5
    px = (jnp.arange(sw, dtype=jnp.float32) + 0.5) / scale - 0.5
    py = jnp.broadcast_to(py[:, None], (sh, sw))
    px = jnp.broadcast_to(px[None, :], (sh, sw))
    omega_out = resize(omega_inv, sh, sw, "bilinear")

    @jax.jit
    def merge_o1(raw_burst, flows, lam):
        # moment accumulators, per channel
        zeros = lambda: jnp.zeros((sh, sw, 3), jnp.float32)  # noqa: E731
        m00, m01, m02 = zeros(), zeros(), zeros()
        m11, m12, m22 = zeros(), zeros(), zeros()
        b0, b1, b2 = zeros(), zeros(), zeros()

        def accumulate(carry, frame):
            m00, m01, m02, m11, m12, m22, b0, b1, b2 = carry
            rawf, flow = frame
            flow_out = resize(flow, sh, sw, "bilinear")
            qy = py + flow_out[..., 0]
            qx = px + flow_out[..., 1]
            ny = jnp.round(qy).astype(jnp.int32)
            nx = jnp.round(qx).astype(jnp.int32)
            for oy in range(-radius, radius + 1):
                for ox in range(-radius, radius + 1):
                    ry = jnp.clip(ny + oy, 0, h - 1)
                    rx = jnp.clip(nx + ox, 0, w - 1)
                    dy = (ry.astype(jnp.float32) - qy) * scale
                    dx = (rx.astype(jnp.float32) - qx) * scale
                    wgt = jnp.exp(
                        -0.5 * (
                            dx * dx * omega_out[..., 0]
                            + dy * dy * omega_out[..., 1]
                            + 2.0 * dx * dy * omega_out[..., 2]
                        )
                    )
                    vals = rawf[ry, rx]
                    onehot = eye3[chan[ry, rx]]
                    cw = wgt[..., None] * onehot
                    m00 += cw
                    m01 += cw * dy[..., None]
                    m02 += cw * dx[..., None]
                    m11 += cw * (dy * dy)[..., None]
                    m12 += cw * (dy * dx)[..., None]
                    m22 += cw * (dx * dx)[..., None]
                    b0 += cw * vals[..., None]
                    b1 += cw * (vals * dy)[..., None]
                    b2 += cw * (vals * dx)[..., None]
            return (m00, m01, m02, m11, m12, m22, b0, b1, b2), None

        carry, _ = jax.lax.scan(
            accumulate, (m00, m01, m02, m11, m12, m22, b0, b1, b2),
            (raw_burst, flows),
        )
        m00, m01, m02, m11, m12, m22, b0, b1, b2 = carry
        # ridge on the gradient block, scaled by total weight so the
        # regularization strength is density-invariant
        m11 = m11 + lam * m00
        m22 = m22 + lam * m00
        # 3x3 symmetric solve via adjugate (estimate = a, first entry)
        c00 = m11 * m22 - m12 * m12
        c01 = m02 * m12 - m01 * m22
        c02 = m01 * m12 - m02 * m11
        det = m00 * c00 + m01 * c01 + m02 * c02
        a1 = c00 * b0 + c01 * b1 + c02 * b2
        order0 = jnp.where(m00 > 1e-8, b0 / jnp.maximum(m00, 1e-8), 0.0)
        good = (m00 > 1e-2) & (jnp.abs(det) > 1e-6 * jnp.maximum(m00, 1e-8) ** 3)
        out = jnp.where(good, a1 / jnp.where(good, det, 1.0), order0)
        fb = upscale(debayer(raw_burst[0], cfa), scale, "bicubic")
        out = jnp.where(m00 > 1e-2, out, fb)
        return jnp.clip(out, 0.0, 1.0)

    lams = [float(x) for x in (sys.argv[1:] or [0.05, 0.1, 0.2, 0.5, 1.0])]
    for lam in lams:
        P(f"order1 GT flows lam={lam}", merge_o1(raw, flows_gt, lam))

    # with ESTIMATED flows (oracle path estimation, prealign off)
    import dataclasses

    from multi_frame_super_resolution_tpu.models.handheld import _burst_flows

    cfg_np = dataclasses.replace(cfg, prealign=False, fast=False)

    @jax.jit
    def est_flows(raw_burst):
        halfb = jax.vmap(lambda r: debayer_subsample(r, cfa))(raw_burst)
        gh = rgb_to_gray(halfb)
        fl_half = _burst_flows(gh, cfg_np)
        return jax.vmap(lambda fl: resize(fl, h, w, "bilinear") * 2.0)(fl_half)

    fe = est_flows(raw)
    for lam in lams:
        P(f"order1 EST flows lam={lam}", merge_o1(raw, fe, lam))


if __name__ == "__main__":
    main()
