"""Stage-level TPU profiling for the handheld RAW pipeline.

Times each pipeline stage standalone with the amortized in-graph
repetition protocol from BENCH_NOTES.md (the remote backend caches
identical calls and block_until_ready can return early, so naive loops
lie). Run: python tools/profile_stages.py [batch ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def amortized_ms(fn, x, k=6, reps=3):
    """Median amortized ms of fn(x) via K-rep scan minus 1-rep scan."""
    import jax
    import jax.numpy as jnp

    def make(length):
        @jax.jit
        def rep(v):
            def body(c, _):
                out = fn(jax.tree.map(lambda a: a * (1.0 + c * 1e-5), v))
                return c + 1.0, jnp.sum(jax.tree.leaves(out)[0])

            _, outs = jax.lax.scan(body, 0.0, None, length=length)
            return jnp.sum(outs)

        return rep

    r1, rk = make(1), make(k)
    variants = [
        jax.tree.map(lambda a: a * (1.0 - 1e-4 * i), x) for i in range(2 * reps + 2)
    ]
    for v in variants:
        jax.block_until_ready(v)
    float(r1(variants[0]))
    float(rk(variants[1]))
    t1s, tks = [], []
    for i in range(reps):
        t0 = time.perf_counter()
        float(r1(variants[2 + 2 * i]))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(rk(variants[3 + 2 * i]))
        tks.append(time.perf_counter() - t0)
    return max(float(np.median(tks)) - float(np.median(t1s)), 1e-9) / (k - 1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models import handheld_superres_raw

    batches = [int(a) for a in sys.argv[1:]] or [1]

    burst = load_burst("city")
    raw = np.stack([mosaic_rggb(f) for f in burst])  # (5, 256, 512)
    cfg = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )

    f, h, w = raw.shape
    hh, hw = h // 2, w // 2
    rng = np.random.default_rng(0)

    from multi_frame_super_resolution_tpu.models.fast_merge import (
        merge_burst_raw_planes,
        raw_to_planes,
    )
    from multi_frame_super_resolution_tpu.models.merge import (
        kernel_params,
        smoothed_structure_tensor,
    )
    from multi_frame_super_resolution_tpu.models.robustness import robustness_mask
    from multi_frame_super_resolution_tpu.ops.color import rgb_to_gray
    from multi_frame_super_resolution_tpu.ops.debayer import debayer_subsample
    from multi_frame_super_resolution_tpu.ops.warp_fast import tile_warp_select
    from multi_frame_super_resolution_tpu.registration.align import align_burst
    from multi_frame_super_resolution_tpu.registration.lucas_kanade import lk_refine

    t = cfg.align.tile_size
    nty, ntx = hh // t, hw // t

    def stage_inputs():
        return dict(
            raw=jnp.asarray(raw),
            gray_half=jnp.asarray(rng.random((f, hh, hw)), jnp.float32),
            ints=jnp.asarray(
                rng.integers(-10, 10, size=(f, nty, ntx, 2)), jnp.int32
            ),
            res_half=jnp.asarray(
                rng.random((f, hh, hw, 2)) - 0.5, jnp.float32
            ),
            half=jnp.asarray(rng.random((f, hh, hw, 3)), jnp.float32),
            planes=jnp.asarray(rng.random((f, 2, 2, hh, hw)), jnp.float32),
            cert_half=jnp.asarray(rng.random((f, hh, hw, 3)), jnp.float32),
            omega_half=jnp.asarray(0.5 + rng.random((hh, hw, 3)), jnp.float32),
            rgb_full=jnp.asarray(rng.random((h, w, 3)), jnp.float32),
        )

    import dataclasses

    lk_cfg = dataclasses.replace(cfg.lk, bounded_warp=2)

    def stage_debayer(x):
        return jax.vmap(lambda r: debayer_subsample(r, cfg.cfa_pattern))(x["raw"])

    def stage_align(x):
        return align_burst(x["gray_half"], cfg.align)

    def stage_warp(x):
        stack = x["planes"].reshape(f * 4, hh, hw)
        ints_rep = jnp.repeat(x["ints"], 4, axis=0)
        return jax.vmap(
            lambda fr, ints: tile_warp_select(fr, ints, t, bound=16)
        )(stack, ints_rep)

    def stage_lk(x):
        g = x["gray_half"]
        return jax.vmap(lambda gg, fl: lk_refine(g[0], gg, fl, lk_cfg))(
            g, x["res_half"]
        )

    def stage_robust(x):
        hf = x["half"]
        return jax.vmap(
            lambda mv, fl: robustness_mask(hf[0], mv, fl, cfg.robustness, bounded=2)
        )(hf, x["res_half"])

    def stage_merge(x):
        return merge_burst_raw_planes(
            x["planes"], x["res_half"] * 2.0, x["cert_half"], x["omega_half"],
            x["omega_half"], cfg.cfa_pattern, cfg.scale, cfg.merge.radius,
            residual_bound=cfg.residual_bound, k_max=cfg.merge.k_max,
        )

    def stage_kparams(x):
        st = smoothed_structure_tensor(x["gray_half"][0], cfg.st_window)
        return kernel_params(st, cfg.merge)

    def stage_finalize(x):
        from multi_frame_super_resolution_tpu.models.merge import apply_weighting
        from multi_frame_super_resolution_tpu.ops.debayer import debayer
        from multi_frame_super_resolution_tpu.ops.warp_fast import upsample_int

        fallback = upsample_int(debayer(x["raw"][0], cfg.cfa_pattern), 2, "bicubic")
        num = jnp.repeat(jnp.repeat(x["rgb_full"], 2, 0), 2, 1)
        return apply_weighting(num, num + 0.5, fallback, 1e-2)

    def full(x):
        return handheld_superres_raw(x["raw"], cfg)

    def stage_prealign(x):
        from multi_frame_super_resolution_tpu.config import PREALIGN_FAST
        from multi_frame_super_resolution_tpu.models.fast_merge import (
            raw_to_planes,
        )
        from multi_frame_super_resolution_tpu.registration.prealign import (
            prealign_planes,
        )

        return prealign_planes(
            raw_to_planes(x["raw"]), x["gray_half"], PREALIGN_FAST
        )[0]

    stages = [
        ("full_pipeline", full),
        ("prealign_planes", stage_prealign),
        ("debayer_subsample", stage_debayer),
        ("align", stage_align),
        ("tile_warp_planes", stage_warp),
        ("lk_refine", stage_lk),
        ("robustness", stage_robust),
        ("merge_raw_planes", stage_merge),
        ("kernel_params", stage_kparams),
        ("finalize+fallback", stage_finalize),
    ]

    for b in batches:
        x1 = stage_inputs()
        if b == 1:
            xb = x1
            wrap = lambda fn: fn  # noqa: E731
        else:
            xb = jax.tree.map(
                lambda a: jnp.stack([a * (1.0 - 1e-3 * i) for i in range(b)]), x1
            )
            wrap = lambda fn: jax.vmap(fn)  # noqa: E731
        print(f"== batch {b} ==")
        for name, fn in stages:
            try:
                ms = amortized_ms(wrap(fn), xb)
                print(f"  {name:20s} {ms:8.3f} ms/batch  {ms / b:8.3f} ms/burst")
            except Exception as e:  # noqa: BLE001
                print(f"  {name:20s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
