"""Calibrate the noise-adaptive restore gate (round 5).

For each bundled burst (city/car/iso) and two synthetic true-HR bursts
(clean; +sigma=0.02 read noise) prints:
  * the registered temporal noise statistic (ops.restore.
    temporal_noise_stat on the RAW fast path's half-res luma)
  * the quality metric with final_restore off / ungated / gated
    (self-consistency PSNR for real bursts, true-HR PSNR for synthetic)

Run: python tools/calib_restore_gate.py   (CPU is fine)
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def main():
    import jax
    import jax.numpy as jnp

    from eval_fidelity import make_hr_burst

    from multi_frame_super_resolution_tpu.config import (
        AlignConfig,
        HandheldConfig,
    )
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models import handheld_superres_raw
    from multi_frame_super_resolution_tpu.ops.geometry import downsample2
    from multi_frame_super_resolution_tpu.utils import psnr

    def cfg_for(tile, **kw):
        return dataclasses.replace(
            HandheldConfig(
                align=AlignConfig(tile_size=tile, search_radius=4, levels=2),
                gamma=False,
            ),
            **kw,
        )

    # capture the PIPELINE-INTERNAL statistic (computed on the tile-warped
    # half-res luma) by wrapping _gated_restore with a debug print
    import multi_frame_super_resolution_tpu.models.handheld as hh

    orig_gated = hh._gated_restore

    def spying_gated(out, cfg, stat, restore_fn):
        if stat is not None:
            jax.debug.print("    [internal stat = {s:.5f}]", s=stat)
        return orig_gated(out, cfg, stat, restore_fn)

    hh._gated_restore = spying_gated

    cases = []
    for name, tile in (("city", 16), ("car", 8), ("iso", 16)):
        burst = np.asarray(load_burst(name))
        raw = np.stack([mosaic_rggb(f) for f in burst])
        cases.append((name, tile, raw, burst[0], "self"))
    hr = np.asarray(load_burst("city")[0], np.float32)
    frames, _ = make_hr_burst(hr)
    cases.append(("synth", 16, frames, hr, "hr"))
    rng = np.random.default_rng(3)
    noisy = np.clip(
        frames + rng.normal(0.0, 0.02, frames.shape), 0.0, 1.0
    ).astype(np.float32)
    cases.append(("synth+n02", 16, noisy, hr, "hr"))

    for name, tile, raw, target, mode in cases:
        raw_j = jnp.asarray(raw)
        row = [f"{name:10s}"]
        for lbl, kw in (
            ("off", dict(final_restore=False)),
            ("on", dict(restore_noise_gate=False)),
            ("gated", dict()),
        ):
            cfg = cfg_for(tile, **kw)
            out = jax.jit(
                lambda b, c=cfg: handheld_superres_raw(b, c)
            )(raw_j)
            if mode == "hr":
                p = float(psnr(jnp.asarray(target), out))
            else:
                p = float(psnr(jnp.asarray(target), downsample2(out)))
            row.append(f"{lbl}={p:.2f}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
