"""Ground-truth-flow diagnostics for the RAW pipeline's fidelity cap.

Separates alignment error from merge-formulation error on the true-HR
synthetic burst (tools/eval_fidelity.py setup): the burst is synthesized
with KNOWN per-frame similarity transforms, so the exact backward flow
on the raw grid is computable in closed form. Reports:

  1. PSNR of the oracle merge fed GT flows (merge ceiling given perfect
     alignment)
  2. PSNR with estimated flows (the pipeline, prealign off for direct
     comparability)
  3. flow error statistics |flow_est - flow_gt| (raw px, interior)

Usage: PYTHONPATH=/root/repo:... python tools/eval_gt_flow.py [k_min=..]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eval_fidelity import make_hr_burst, parse_variant  # noqa: E402


def gt_backward_flow_raw(h_raw, w_raw, dy, dx, ang, hr_h, hr_w):
    """Backward flow on the raw grid of the reference frame: ref raw
    position p samples the alternate at p + flow(p) (raw units).

    Synthesis (datasets._rotate_translate_crop): alt HR pixel y holds
    HR(M(y - c) + c + t) with M = [[ca, sa], [-sa, ca]]. Content HR(x)
    therefore sits in the alternate at y = M^-1 (x - c - t) + c; raw
    pixel q covers HR block [2q, 2q+1] with center x = 2q + 0.5.
    """
    ca, sa = np.cos(ang), np.sin(ang)
    cy, cx = (hr_h - 1) / 2.0, (hr_w - 1) / 2.0
    py, px = np.meshgrid(
        np.arange(h_raw, dtype=np.float64), np.arange(w_raw, dtype=np.float64),
        indexing="ij",
    )
    xy = 2.0 * py + 0.5 - cy - dy
    xx = 2.0 * px + 0.5 - cx - dx
    # M^-1 = [[ca, -sa], [sa, ca]] (M is orthonormal)
    yy = ca * xy - sa * xx + cy
    yx = sa * xy + ca * xx + cx
    qy = (yy - 0.5) / 2.0
    qx = (yx - 0.5) / 2.0
    return np.stack([qy - py, qx - px], axis=-1).astype(np.float32)


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst
    from multi_frame_super_resolution_tpu.models import handheld_superres_raw
    from multi_frame_super_resolution_tpu.models.merge import (
        apply_weighting,
        kernel_params,
        merge_burst_raw,
        smoothed_structure_tensor,
    )
    from multi_frame_super_resolution_tpu.ops.color import rgb_to_gray
    from multi_frame_super_resolution_tpu.ops.debayer import (
        debayer,
        debayer_subsample,
    )
    from multi_frame_super_resolution_tpu.ops.geometry import resize, upscale
    from multi_frame_super_resolution_tpu.utils import psnr

    hr = load_burst("city")[0]
    hr_j = jnp.asarray(hr)
    hr_h, hr_w = hr.shape[:2]
    raw_np, truth = make_hr_burst(hr)
    raw = jnp.asarray(raw_np)
    f, h, w = raw.shape
    m = 16

    def report(name, sr):
        tot = float(
            psnr(hr_j[m:-m, m:-m], jnp.asarray(np.asarray(sr)[m:-m, m:-m]))
        )
        print(f"{name:44s} {tot:6.2f} dB", flush=True)
        return tot

    base_cfg = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )
    name, cfg, _ = parse_variant(sys.argv[1:], base_cfg)

    flows_gt = jnp.asarray(
        np.stack(
            [gt_backward_flow_raw(h, w, dy, dx, ang, hr_h, hr_w)
             for (dy, dx, ang) in truth]
        )
    )

    cfa = ((0, 1), (1, 2))

    @jax.jit
    def merge_with_flows(raw_burst, flows_raw):
        half = jax.vmap(lambda r: debayer_subsample(r, cfa))(raw_burst)
        gray_half = rgb_to_gray(half)
        cert = jnp.ones((f, h // 2, w // 2, 3), jnp.float32)
        st = smoothed_structure_tensor(gray_half[0], cfg.st_window)
        omega_inv = resize(kernel_params(st, cfg.merge), h, w, "bilinear")
        num, den = merge_burst_raw(
            raw_burst, flows_raw, cert, omega_inv, cfa, cfg.scale,
            cfg.merge.radius,
        )
        fallback = upscale(debayer(raw_burst[0], cfa), cfg.scale, "bicubic")
        out = apply_weighting(num, den, fallback, cfg.merge.weight_threshold)
        return jnp.clip(out, 0.0, 1.0)

    report(f"GT-flow merge [{name}]", merge_with_flows(raw, flows_gt))

    # pipeline with estimated flows, prealign OFF for comparability
    cfg_np = dataclasses.replace(cfg, prealign=False, fast=False)
    report("oracle pipeline (no prealign)", jax.jit(
        lambda b: handheld_superres_raw(b, cfg_np)
    )(raw))
    cfg_pre = dataclasses.replace(cfg, fast=False)
    report("oracle pipeline (prealign)", jax.jit(
        lambda b: handheld_superres_raw(b, cfg_pre)
    )(raw))

    # estimated-flow error vs GT (replicates the oracle path internals,
    # prealign off)
    from multi_frame_super_resolution_tpu.models.handheld import _burst_flows

    @jax.jit
    def est_flows(raw_burst):
        half = jax.vmap(lambda r: debayer_subsample(r, cfa))(raw_burst)
        gray_half = rgb_to_gray(half)
        fl_half = _burst_flows(gray_half, cfg_np)
        return jax.vmap(lambda fl: resize(fl, h, w, "bilinear") * 2.0)(fl_half)

    fe = np.asarray(est_flows(raw)) - np.asarray(flows_gt)
    mm = 24
    fe_i = fe[1:, mm:-mm, mm:-mm]
    err = np.sqrt((fe_i ** 2).sum(-1))
    print(
        f"flow error (raw px, interior): mean {err.mean():.3f}  "
        f"p50 {np.percentile(err, 50):.3f}  p90 {np.percentile(err, 90):.3f}  "
        f"p99 {np.percentile(err, 99):.3f}"
    )


if __name__ == "__main__":
    main()
