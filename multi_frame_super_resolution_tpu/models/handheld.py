"""End-to-end handheld multi-frame super-resolution.

The flagship pipeline (BASELINE.json north star; reference dataflow at
SURVEY.md §3.4): align -> dense flow -> robustness -> anisotropic
kernel-regression merge -> normalize -> finish, as ONE jittable XLA
program with zero host round trips. Two variants:

  * ``handheld_superres`` — RGB burst in, RGB s-x out (the deliverable
    benchmark path over the bundled city/car/iso bursts)
  * ``handheld_superres_raw`` — Bayer RAW burst in (the latent RAW
    pipeline: deBayersSubSample3 half-res alignment + CFA-aware merge,
    DeBayerKernels.cu / kernel.cu / opticalFlow.cu / RobustnessModell.cu)

Batch across chips by vmapping either entry point and sharding the batch
axis on the data mesh (see parallel/).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multi_frame_super_resolution_tpu.config import HandheldConfig
from multi_frame_super_resolution_tpu.models.merge import (
    apply_weighting,
    apply_weighting_order1,
    kernel_params,
    grad_image,
    merge_burst_raw,
    merge_burst_rgb,
    smoothed_structure_tensor,
    solve_order1,
    solve_plugin,
)
from multi_frame_super_resolution_tpu.models.robustness import robustness_mask
from multi_frame_super_resolution_tpu.ops.color import rgb_to_gray, srgb_gamma
from multi_frame_super_resolution_tpu.ops.debayer import debayer, debayer_subsample
from multi_frame_super_resolution_tpu.ops.geometry import resize, upscale
from multi_frame_super_resolution_tpu.registration.align import (
    align_burst,
    align_burst_consistent,
    flow_from_tile_shifts,
)
from multi_frame_super_resolution_tpu.registration.lucas_kanade import lk_refine


def _gated_restore(out, cfg, stat, restore_fn):
    """Apply the restoration FIR scaled by the noise-adaptive gain
    (ops.restore.restore_gain) when cfg.restore_noise_gate, else at full
    strength. ``stat`` is the registered temporal noise statistic (or
    None to force full strength); restore is linear, so the gated form
    is an exact lerp out + g*(restore(out) - out), which restore_fn
    fuses into its own accumulation pass (gain kwarg) — an external
    lerp costs an extra full-stack read-modify-write (~0.05-0.1
    ms/burst at city size, round-5 k=24 differencing)."""
    if not cfg.restore_noise_gate or stat is None:
        return restore_fn(out)
    from multi_frame_super_resolution_tpu.ops.restore import restore_gain

    g = restore_gain(stat, cfg.restore_gate_lo, cfg.restore_gate_hi)
    return restore_fn(out, gain=g)


def _certless(cfg):
    """True when the fast RAW merge runs the certless shared centroid
    (MergeConfig.centroid_cert=False under the plugin solver) and
    therefore returns precomputed (cy, cx) in moment slots 1/2."""
    return (
        cfg.merge.solver == "plugin"
        and not cfg.merge.centroid_cert
        and not cfg.merge.exact_weights
    )


def _o1_solve(moments, cfg, grad_fn, precomputed_centroid=False):
    """MergeConfig.solver dispatch for the order-1 merge: the exact 3x3
    normal-equation solve, or the plugin-gradient centroid-bias
    correction (merge.solve_plugin) whose gradient comes from the pilot
    image in the caller's own layout (grad_image / grad_phases).
    ``precomputed_centroid``: the fast RAW merge's certless shared
    centroid already returns finalized (cy, cx) in slots 1/2."""
    if cfg.merge.solver == "plugin":
        return solve_plugin(
            moments, grad_fn, cfg.merge.plugin_iters,
            precomputed_centroid=precomputed_centroid,
        )
    return solve_order1(moments, cfg.merge.ridge)


def _scaled_merge_cfg(cfg):
    """Merge config with the kernel variance clamps rescaled to the
    output grid. k_min/k_max/k_min_rb are calibrated at scale 2 in
    OUTPUT px^2; a fixed output-unit clamp shrinks physically as scale
    grows, leaving coverage holes between the (scale-px-apart) samples.
    Scaling by (scale/2)^2 keeps the clamp's physical (input-pixel)
    footprint constant: at scale 4 this turns (0.25, 1.0) into
    (1.0, 4.0), measured +1.9 dB on the scale-4 true-HR burst
    (tests/test_fidelity.py); scale 2 is untouched."""
    m = (cfg.scale / 2.0) ** 2
    if m == 1.0:
        return cfg.merge
    import dataclasses

    return dataclasses.replace(
        cfg.merge,
        k_min=cfg.merge.k_min * m,
        k_max=cfg.merge.k_max * m,
        k_min_rb=cfg.merge.k_min_rb * m,
    )


def _burst_flows(
    gray: jnp.ndarray, cfg: HandheldConfig
) -> jnp.ndarray:
    """Tile-align a grayscale burst (F, H, W) against frame 0 and densify
    (+ optional LK refinement). Returns flows (F, H, W, 2)."""
    f, h, w = gray.shape
    tile_shifts = (
        align_burst_consistent(gray, cfg.align)
        if cfg.use_consistency
        else align_burst(gray, cfg.align)
    )
    flows = jax.vmap(
        lambda s: flow_from_tile_shifts(s, cfg.align.tile_size, h, w)
    )(tile_shifts)
    if cfg.use_lk:
        ref = gray[0]
        flows = jax.vmap(lambda g, fl: lk_refine(ref, g, fl, cfg.lk))(gray, flows)
        flows = flows.at[0].set(0.0)
    return flows


def _burst_certainty(
    rgb: jnp.ndarray, flows: jnp.ndarray, cfg: HandheldConfig
) -> jnp.ndarray:
    """Robustness certainties (F, H, W, 3); the reference frame gets full
    certainty."""
    ref = rgb[0]
    cert = jax.vmap(
        lambda mv, fl: robustness_mask(ref, mv, fl, cfg.robustness)[..., :3]
    )(rgb, flows)
    return cert.at[0].set(1.0)


def handheld_superres(
    burst: jnp.ndarray,
    cfg: HandheldConfig = HandheldConfig(),
    prealign_override=None,
) -> jnp.ndarray:
    """RGB burst (F, H, W, 3) -> merged (scale*H, scale*W, 3).

    Dispatches to the gatherless fast path (cfg.fast, the TPU production
    path) or the gather-based oracle implementation (kept for parity
    testing and arbitrary-flow research use).

    ``prealign_override``: optional (st, origin, global_hw) — a
    pre-estimated global SimilarityTransform stack (leading axis F-1)
    applied about the GLOBAL image center instead of estimating from this
    (possibly shard-local) burst. Used by the row-sharded pipelines so
    every shard applies the SAME global pre-alignment (the reference's
    baseShift/baseRotation is a global model, kernel.cu:264-318)."""
    if cfg.fast:
        return _handheld_fast(burst, cfg, prealign_override)
    gray = rgb_to_gray(burst)
    if cfg.prealign:
        from multi_frame_super_resolution_tpu.registration.prealign import (
            apply_burst_similarity,
            prealign_burst,
        )

        if prealign_override is not None:
            st, origin, global_hw = prealign_override
            burst, prevalid = apply_burst_similarity(
                burst, st, cfg.prealign_cfg, origin=origin, global_hw=global_hw
            )
        else:
            burst, prevalid = prealign_burst(burst, gray, cfg.prealign_cfg)
        gray = rgb_to_gray(burst)
    else:
        prevalid = None
    flows = _burst_flows(gray, cfg)
    cert = _burst_certainty(burst, flows, cfg)
    if prevalid is not None:
        # prevalid[0] is all ones, so frame 0 keeps _burst_certainty's
        # convention (certainty 1.0) without a second override
        cert = cert * prevalid[..., None]

    st = smoothed_structure_tensor(gray[0], cfg.st_window)
    omega_inv = kernel_params(st, _scaled_merge_cfg(cfg))

    fallback = upscale(burst[0], cfg.scale, "bicubic")
    rgb_order = (
        cfg.merge.order if cfg.merge.rgb_order is None else cfg.merge.rgb_order
    )
    # the oracle gathers a full (2r+1)^2 window around each nearest
    # sample with no prune_exp compensation — keep it at the reference's
    # 5x5 (DeBayerKernels.cu:378-427) even when the fast path's tap
    # radius is tuned below 2 (advisor finding r4: the radius=1 default
    # silently shrank the accumulateImagesSuperRes-parity window to 3x3)
    oracle_radius = max(cfg.merge.radius, 2)
    if rgb_order == 1:
        moments = merge_burst_rgb(
            burst, flows, cert, omega_inv, cfg.scale, oracle_radius,
            order=1,
        )
        est, m00 = _o1_solve(moments, cfg, grad_image)
        out = apply_weighting_order1(
            est, m00, fallback, cfg.merge.weight_threshold
        )
    else:
        num, den = merge_burst_rgb(
            burst, flows, cert, omega_inv, cfg.scale, oracle_radius
        )
        out = apply_weighting(num, den, fallback, cfg.merge.weight_threshold)
    if cfg.final_restore and cfg.scale == 2:
        from multi_frame_super_resolution_tpu.ops.geometry import downsample2
        from multi_frame_super_resolution_tpu.ops.restore import (
            restore_image,
            temporal_noise_stat,
        )

        # oracle path: frames are unwarped — register by rounded flow
        # inside the statistic; half-res luma matches the gate's
        # calibration scale (see HandheldConfig.restore_gate_lo)
        stat = temporal_noise_stat(
            jax.vmap(downsample2)(gray),
            jax.vmap(lambda fl: downsample2(fl) * 0.5)(flows),
        )
        out = _gated_restore(out, cfg, stat, restore_image)
    if cfg.gamma:
        out = srgb_gamma(out)
    return jnp.clip(out, 0.0, 1.0)


def _handheld_fast(
    burst: jnp.ndarray, cfg: HandheldConfig, prealign_override=None
) -> jnp.ndarray:
    """Gatherless pipeline: tile-align -> integer tile warp -> bounded
    residual (optional LK) -> robustness on warped frames -> static-tap
    kernel-regression merge (models/fast_merge.py)."""
    import dataclasses

    from multi_frame_super_resolution_tpu.models.fast_merge import (
        grad_phases,
        merge_burst_fast,
    )
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        tile_shift_decompose,
        tile_warp_select,
        upsample_int,
        upsample_nearest,
    )
    from multi_frame_super_resolution_tpu.registration.lucas_kanade import lk_refine

    from multi_frame_super_resolution_tpu.ops.geometry import downsample2

    f, h, w = burst.shape[:3]
    t = cfg.align.tile_size
    gray = rgb_to_gray(burst)
    # estimate motion on half-res luma (the reference's own alignment
    # resolution, deBayersSubSample3) and lift to full res; merge still
    # sees full-res samples
    half = cfg.half_align and h % 2 == 0 and w % 2 == 0

    if cfg.prealign:
        from multi_frame_super_resolution_tpu.registration.prealign import (
            apply_burst_similarity,
            prealign_burst,
        )

        if prealign_override is not None:
            st, origin, global_hw = prealign_override
            burst, prevalid = apply_burst_similarity(
                burst, st, cfg.prealign_cfg, origin=origin, global_hw=global_hw
            )
        else:
            burst, prevalid = prealign_burst(burst, gray, cfg.prealign_cfg)
        gray = rgb_to_gray(burst)
        # carry validity through the integer tile warp as a 4th channel
        burst = jnp.concatenate([burst, prevalid[..., None]], axis=-1)

    if half:
        gray_est = jax.vmap(downsample2)(gray)
        warp_t = 2 * t  # the half-res tile grid covers 2t full-res px
    else:
        gray_est = gray
        warp_t = t
    tile_shifts = (
        align_burst_consistent(gray_est, cfg.align)
        if cfg.use_consistency
        else align_burst(gray_est, cfg.align)
    )
    if half:
        tile_shifts = tile_shifts * 2.0  # half-res units -> full-res px
    int_shifts, res_tiles = tile_shift_decompose(tile_shifts)

    # integer tile warp into reference geometry via the one-hot select
    # warp (the Pallas per-tile DMA variant is retired — Mosaic's
    # 128-lane DMA slice granularity rejects 16-px tile slices; see
    # BENCH_NOTES.md "Pallas verdict (round 4)").
    # channel-LEADING plane stack: warping (H, W, C) directly puts C
    # on the 128-padded lane dim (see prealign.apply_burst_similarity)
    c = burst.shape[-1]
    stack = burst[1:].transpose(0, 3, 1, 2)  # (f-1, c, h, w)
    if cfg.warp_matmul:
        from multi_frame_super_resolution_tpu.ops.warp_fast import (
            tile_warp_matmul,
        )

        warped_alts = jax.vmap(
            lambda fr, ints: tile_warp_matmul(fr, ints, warp_t)
        )(stack, int_shifts[1:]).transpose(0, 2, 3, 1)
    else:
        stack2 = stack.reshape((f - 1) * c, h, w)
        ints_rep = jnp.repeat(int_shifts[1:], c, axis=0)
        warped_alts = (
            jax.vmap(lambda fr, ints: tile_warp_select(fr, ints, warp_t))(
                stack2, ints_rep
            )
            .reshape(f - 1, c, h, w)
            .transpose(0, 2, 3, 1)
        )
    warped = jnp.concatenate([burst[:1], warped_alts], axis=0)
    if cfg.prealign:
        valid_w = warped[..., 3]
        warped = warped[..., :3]
        burst = burst[..., :3]
    else:
        valid_w = None

    # residual subpixel flow = SMOOTH dense flow minus the block-constant
    # integer warp actually applied. The dense flow bilinearly
    # interpolates the tile shifts exactly as the oracle path's
    # flow_from_tile_shifts (the texture read of CreateFlowFieldFromTiles,
    # opticalFlow.cu:88-90); a block-repeated residual instead kept the
    # per-tile measurement noise and its block edges, measuring ~1 dB
    # worse true-HR fidelity on synthetic shift bursts (tools/
    # eval_fidelity.py).
    def lift(res):
        return jnp.repeat(jnp.repeat(res, warp_t, axis=0), warp_t, axis=1)[:h, :w]

    if cfg.smooth_residual:
        smooth_flow = jax.vmap(
            lambda s: flow_from_tile_shifts(s, warp_t, h, w)
        )(tile_shifts)
        res_flow = smooth_flow - jax.vmap(lift)(int_shifts.astype(jnp.float32))
    else:
        res_flow = jax.vmap(lift)(res_tiles)

    # half-res statistics (cfg.rgb_half_stats): LK and robustness run on
    # 2x-downsampled luma/RGB — the reference's own resolution for both
    # (deBayersSubSample3 feeds ComputeRobustnessMask and the LK chain) —
    # and the residual flow / certainty lift back to full res. The merge
    # still sees full-res samples.
    half_stats = cfg.rgb_half_stats and h % 2 == 0 and w % 2 == 0
    gray_w = rgb_to_gray(warped)
    if half_stats:
        warped_h = jax.vmap(downsample2)(warped)
        gray_wh = rgb_to_gray(warped_h)
    if cfg.use_lk:
        lk_cfg = dataclasses.replace(
            cfg.lk, bounded_warp=max(int(cfg.residual_bound) + 1, 2)
        )
        if half_stats:
            res_h = jax.vmap(downsample2)(res_flow) * 0.5
            res_h = jax.vmap(
                lambda g, fl: lk_refine(gray_wh[0], g, fl, lk_cfg)
            )(gray_wh, res_h)
            # gatherless 2x lift: resize() lowers to a per-pixel gather
            # (~9 cycles/element on TPU) and cost more than the half-res
            # LK saved — 18.8 vs 6.5 ms/burst, round-5 k=8 measurement
            res_flow = jax.vmap(
                lambda fl: upsample_int(fl, 2, "bilinear") * 2.0
            )(res_h)[:, :h, :w]
        else:
            res_flow = jax.vmap(
                lambda g, fl: lk_refine(gray_w[0], g, fl, lk_cfg)
            )(gray_w, res_flow)
        res_flow = res_flow.at[0].set(0.0)
    res_flow = jnp.clip(res_flow, -cfg.residual_bound, cfg.residual_bound)

    # robustness on the warped frames (flows are now bounded-small)
    if half_stats:
        cert_h = jax.vmap(
            lambda mv, fl: robustness_mask(
                warped_h[0], mv, fl, cfg.robustness, bounded=2
            )[..., :3]
        )(warped_h, jax.vmap(downsample2)(res_flow) * 0.5)
        cert = jax.vmap(lambda c: upsample_int(c, 2, "bilinear"))(cert_h)[
            :, :h, :w
        ]
    else:
        ref = warped[0]
        cert = jax.vmap(
            lambda mv, fl: robustness_mask(
                ref, mv, fl, cfg.robustness, bounded=2
            )[..., :3]
        )(warped, res_flow)
    if valid_w is not None:
        cert = cert * valid_w[..., None]
    cert = cert.at[0].set(1.0)

    st = smoothed_structure_tensor(gray[0], cfg.st_window)
    omega_inv = kernel_params(st, _scaled_merge_cfg(cfg))

    if cfg.merge.use_pallas:
        from multi_frame_super_resolution_tpu.pallas_ops.merge import (
            merge_fast_pallas,
        )

        if (
            cfg.merge.order if cfg.merge.rgb_order is None else cfg.merge.rgb_order
        ) == 1:
            # the Pallas merge implements only the order-0 num/den
            # accumulation — silently downgrading an order-1 request
            # would degrade quality with no warning (advisor finding r4)
            raise ValueError(
                "merge.use_pallas supports only the order-0 merge; set "
                "merge.rgb_order=0 (or order=0) alongside use_pallas"
            )
        num, den = merge_fast_pallas(
            warped, res_flow, cert, omega_inv, cfg.scale, cfg.merge.radius,
            cfg.residual_bound, k_max=_scaled_merge_cfg(cfg).k_max,
        )
        fallback = upsample_int(burst[0], cfg.scale, "bicubic")
        out = apply_weighting(num, den, fallback, cfg.merge.weight_threshold)
    else:
        # stay in the CHANNEL-LEADING PHASE domain through the pointwise
        # finalize and interleave ONCE — the interleave is a
        # lane-crossing transpose (~1.2 ms per array at city size), and
        # channel-minor phase math would pad the 3-wide channel axis to
        # 128 TPU lanes
        from multi_frame_super_resolution_tpu.ops.warp_fast import (
            interleave_phases_planes_mxu,
            upsample_int_phases_planes,
        )

        fallback_p = upsample_int_phases_planes(burst[0], cfg.scale, "bicubic")
        rgb_order = (
            cfg.merge.order
            if cfg.merge.rgb_order is None
            else cfg.merge.rgb_order
        )
        if rgb_order == 1:
            moments_p = merge_burst_fast(
                warped, res_flow, cert, omega_inv, cfg.scale,
                cfg.merge.radius, cfg.residual_bound, k_max=_scaled_merge_cfg(cfg).k_max,
                phase_output=True, order=1, prune_exp=cfg.merge.prune_exp,
                moment_slots=4 if cfg.merge.solver == "plugin" else 9,
            )
            est_p, m00_p = _o1_solve(moments_p, cfg, grad_phases)
            out_p = apply_weighting_order1(
                est_p, m00_p, fallback_p, cfg.merge.weight_threshold
            )
        else:
            num_p, den_p = merge_burst_fast(
                warped, res_flow, cert, omega_inv, cfg.scale,
                cfg.merge.radius, cfg.residual_bound, k_max=_scaled_merge_cfg(cfg).k_max,
                phase_output=True, bf16=cfg.merge.bf16,
                prune_exp=cfg.merge.prune_exp,
            )
            out_p = apply_weighting(
                num_p, den_p, fallback_p, cfg.merge.weight_threshold
            )
        if cfg.final_restore and cfg.scale == 2:
            from multi_frame_super_resolution_tpu.ops.restore import (
                restore_phases,
                temporal_noise_stat,
            )

            stat = temporal_noise_stat(
                jax.vmap(downsample2)(rgb_to_gray(warped)),
                residual=jax.vmap(downsample2)(res_flow[1:]) * 0.5,
            )
            out_p = _gated_restore(out_p, cfg, stat, restore_phases)
        out = interleave_phases_planes_mxu(out_p, precision="high")
    if cfg.gamma:
        out = srgb_gamma(out)
    return jnp.clip(out, 0.0, 1.0)


def _image_phases(img: jnp.ndarray, n: int) -> jnp.ndarray:
    """(n*hh, n*hw, C) image -> channel-leading phase planes
    (n, n, C, hh, hw): the inverse of interleave_phases_planes. Used to
    feed an externally supplied fallback image (e.g. the scale-4
    cascade's upsampled scale-2 result) into the phase-domain finalize."""
    h, w, c = img.shape
    hh, hw = h // n, w // n
    return img.reshape(hh, n, hw, n, c).transpose(1, 3, 4, 0, 2)


def handheld_superres_raw_cascade(
    raw_burst: jnp.ndarray,
    cfg: HandheldConfig,
) -> jnp.ndarray:
    """Scale-4 as a 2x-cascade: the scale-4 merge runs as usual, but its
    weight-threshold fallback is the bicubic 2x upsample of the SCALE-2
    pipeline output instead of demosaic+bicubic-4x. At 4x a 5-frame
    burst covers only ~1/3 of the 16 output phases (tests/
    test_fidelity.py scale-4 notes), so the fallback blend carries much
    of the image — upgrading it from single-frame demosaic quality to
    the full burst-merge quality lifts exactly the uncovered phases.
    The reference's accumulateImagesSuperRes is hardwired to its 2x
    grid (DeBayerKernels.cu:378-468); this is the capability extension
    the BASELINE '2x-4x upsample' line asks for.

    The scale-4 stage runs with weight_threshold raised to >= 1.0: with
    the (scale/2)^2 kernel-clamp rescale m00 rarely drops below the
    scale-2 threshold (the coverage gap shows as wide-kernel blur, not
    fallback), so the soft (est*m00 + fb)/(m00 + 1) blend must engage
    earlier to let the SR2 fallback carry the uncovered phases.
    Round-5 grid (city 5-frame true-HR, tools output in /tmp/scale4b):
    threshold 0.01 -> 21.85 dB (= non-cascade), 0.3 -> 21.94, 1.0 ->
    22.19, 3.0 -> 22.09; narrow-kernel variants all lose. Baseline
    demosaic+bicubic-4x is 21.81 — the cascade turns the 5-frame burst
    from baseline parity into +0.38 dB."""
    import dataclasses

    assert cfg.scale == 4, "cascade targets scale 4 (= 2x o 2x)"
    sr2 = handheld_superres_raw(
        raw_burst, dataclasses.replace(cfg, scale=2, gamma=False)
    )
    fb = upscale(sr2, 2, "bicubic")
    cfg4 = dataclasses.replace(
        cfg,
        merge=dataclasses.replace(
            cfg.merge,
            weight_threshold=max(cfg.merge.weight_threshold, 1.0),
        ),
    )
    return handheld_superres_raw(raw_burst, cfg4, fallback_hr=fb)


def handheld_superres_raw(
    raw_burst: jnp.ndarray,
    cfg: HandheldConfig = HandheldConfig(gamma=True),
    prealign_override=None,
    fallback_hr: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Bayer RAW burst (F, H, W), values normalized to [0, 1] -> merged
    RGB (scale*H, scale*W, 3).

    Alignment, LK, and robustness run at half resolution on the
    deBayersSubSample3 RGB images (as the reference pipeline does); the
    merge accumulates full-resolution RAW samples into their own CFA
    channels. cfg.fast uses the gatherless path (even-integer tile warps
    preserve the CFA phase; static checkerboard channel masks).

    ``prealign_override``: optional (st, origin, global_hw) in HALF-RES
    units — see handheld_superres.
    """
    if cfg.fast:
        return _handheld_raw_fast(
            raw_burst, cfg, prealign_override, fallback_hr=fallback_hr
        )
    f, h, w = raw_burst.shape
    half = jax.vmap(lambda r: debayer_subsample(r, cfg.cfa_pattern))(raw_burst)
    gray_half = rgb_to_gray(half)

    if cfg.prealign:
        from multi_frame_super_resolution_tpu.models.fast_merge import (
            planes_to_raw,
            raw_to_planes,
        )
        from multi_frame_super_resolution_tpu.registration.prealign import (
            apply_planes_similarity,
            prealign_planes,
        )

        if prealign_override is not None:
            st, origin, global_hw = prealign_override
            planes, prevalid = apply_planes_similarity(
                raw_to_planes(raw_burst), st, cfg.prealign_cfg,
                origin=origin, global_hw=global_hw,
            )
        else:
            planes, prevalid = prealign_planes(
                raw_to_planes(raw_burst), gray_half, cfg.prealign_cfg
            )
        raw_burst = planes_to_raw(planes)
        half = jax.vmap(lambda r: debayer_subsample(r, cfg.cfa_pattern))(raw_burst)
        gray_half = rgb_to_gray(half)
    else:
        prevalid = None

    flows_half = _burst_flows(gray_half, cfg)
    cert = _burst_certainty(half, flows_half, cfg)
    if prevalid is not None:
        # prevalid[0] is all ones; frame 0 stays at certainty 1.0
        cert = cert * prevalid[..., None]

    st = smoothed_structure_tensor(gray_half[0], cfg.st_window)
    # half-res-unit gradients -> RAW-res grid (values are unit-sensitive
    # only through the tuned k-constants)
    omega_inv = resize(kernel_params(st, _scaled_merge_cfg(cfg)), h, w, "bilinear")

    flows_raw = jax.vmap(lambda fl: resize(fl, h, w, "bilinear") * 2.0)(flows_half)

    if fallback_hr is not None:
        fallback = fallback_hr
    else:
        fallback = upscale(
            debayer(raw_burst[0], cfg.cfa_pattern), cfg.scale, "bicubic"
        )
    # keep the oracle's gather window at the reference's 5x5 — see the
    # oracle_radius note in handheld_superres (advisor finding r4)
    oracle_radius = max(cfg.merge.radius, 2)
    if cfg.merge.order == 1:
        moments = merge_burst_raw(
            raw_burst, flows_raw, cert, omega_inv, cfg.cfa_pattern,
            cfg.scale, oracle_radius, order=1,
        )
        est, m00 = _o1_solve(moments, cfg, grad_image)
        out = apply_weighting_order1(
            est, m00, fallback, cfg.merge.weight_threshold
        )
    else:
        num, den = merge_burst_raw(
            raw_burst, flows_raw, cert, omega_inv, cfg.cfa_pattern,
            cfg.scale, oracle_radius,
        )
        out = apply_weighting(num, den, fallback, cfg.merge.weight_threshold)
    if cfg.final_restore and cfg.scale == 2:
        from multi_frame_super_resolution_tpu.ops.restore import (
            restore_image,
            temporal_noise_stat,
        )

        stat = temporal_noise_stat(gray_half, flows_half)
        out = _gated_restore(out, cfg, stat, restore_image)
    if cfg.gamma:
        out = srgb_gamma(out)
    return jnp.clip(out, 0.0, 1.0)


def _subsample_from_planes(planes: jnp.ndarray, cfa) -> jnp.ndarray:
    """(F, 2, 2, hh, hw) CFA planes -> half-res RGB (F, hh, hw, 3) with
    same-channel sites averaged (deBayersSubSample3 semantics)."""
    import numpy as np

    pat = np.asarray(cfa)
    out = []
    for c in range(3):
        sel = pat == c
        n = max(int(sel.sum()), 1)
        acc = None
        for a in (0, 1):
            for b in (0, 1):
                if sel[a][b]:
                    p = planes[:, a, b] / n
                    acc = p if acc is None else acc + p
        out.append(acc if acc is not None else jnp.zeros_like(planes[:, 0, 0]))
    return jnp.stack(out, axis=-1)


def _handheld_raw_fast(
    raw_burst: jnp.ndarray, cfg: HandheldConfig, prealign_override=None,
    fallback_hr: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Gatherless RAW pipeline in the CFA-PLANE domain: half-res alignment
    -> integer PLANE warps (even RAW shifts preserve the CFA phase, so the
    four half-res planes warp independently by the half-res integer shift)
    -> bounded residual + LK at half res -> robustness on warped half-res
    frames -> plane-domain static-tap merge (merge_burst_raw_planes)."""
    import dataclasses

    from multi_frame_super_resolution_tpu.models.fast_merge import (
        grad_phases,
        merge_burst_raw_planes,
        raw_to_planes,
    )
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        tile_shift_decompose,
        tile_warp_select,
        upsample_int,
    )
    from multi_frame_super_resolution_tpu.registration.align import (
        align_burst,
        align_burst_consistent,
    )
    from multi_frame_super_resolution_tpu.registration.lucas_kanade import lk_refine

    f, h, w = raw_burst.shape
    assert h % 2 == 0 and w % 2 == 0, "RAW dims must be even (Bayer quads)"
    t = cfg.align.tile_size
    hh, hw = h // 2, w // 2

    planes = raw_to_planes(raw_burst)  # (F, 2, 2, hh, hw)
    half = _subsample_from_planes(planes, cfg.cfa_pattern)
    gray_half = rgb_to_gray(half)

    if cfg.prealign:
        from multi_frame_super_resolution_tpu.registration.prealign import (
            apply_planes_similarity,
            prealign_planes,
        )

        if prealign_override is not None:
            st, origin, global_hw = prealign_override
            planes, prevalid = apply_planes_similarity(
                planes, st, cfg.prealign_cfg, origin=origin, global_hw=global_hw
            )
        else:
            planes, prevalid = prealign_planes(planes, gray_half, cfg.prealign_cfg)
        half = _subsample_from_planes(planes, cfg.cfa_pattern)
        gray_half = rgb_to_gray(half)
    else:
        prevalid = None

    tile_shifts = (
        align_burst_consistent(gray_half, cfg.align)
        if cfg.use_consistency
        else align_burst(gray_half, cfg.align)
    )  # half-res units
    int_half, res_tiles = tile_shift_decompose(tile_shifts)

    # integer plane warp == even RAW-unit warp (CFA phase preserved);
    # planes fold into the frame axis so nothing small sits on the lane
    # dim. The reference frame needs no warp/LK/robustness (its shift is
    # zero, its certainty one) — only the F-1 alternates are processed.
    nst = 4 if prevalid is None else 5
    stack = planes[1:].reshape(f - 1, 4, hh, hw)
    if prevalid is not None:
        # carry the pre-alignment validity mask through the same integer
        # warp so invalid (out-of-source) regions stay registered with
        # the content they annotate
        stack = jnp.concatenate([stack, prevalid[1:, None]], axis=1)
    if cfg.warp_matmul:
        # banded MXU selector matmuls: selection matrices built once per
        # frame, shared by its nst planes (warp_fast.tile_warp_matmul)
        from multi_frame_super_resolution_tpu.ops.warp_fast import (
            tile_warp_matmul,
        )

        warped_stack = jax.vmap(
            lambda fr, ints: tile_warp_matmul(fr, ints, t, bound=16)
        )(stack, int_half[1:])
    else:
        stack2 = stack.reshape((f - 1) * nst, hh, hw)
        ints_rep = jnp.repeat(int_half[1:], nst, axis=0)
        warped_stack = jax.vmap(
            lambda fr, ints: tile_warp_select(fr, ints, t, bound=16)
        )(stack2, ints_rep).reshape(f - 1, nst, hh, hw)
    warped_alts = warped_stack[:, :4].reshape(f - 1, 2, 2, hh, hw)
    valid_w = None if prevalid is None else warped_stack[:, 4]
    warped = jnp.concatenate([planes[:1], warped_alts], axis=0)

    # residual at half res = SMOOTH dense flow (bilinear tile-shift
    # interpolation, as the oracle's flow_from_tile_shifts /
    # CreateFlowFieldFromTiles texture read) minus the block-constant
    # integer warp applied above — block-repeated residuals keep the
    # per-tile measurement noise and cost ~1 dB true-HR fidelity
    # (tools/eval_fidelity.py); optional LK refinement follows on the
    # warped half-res luma
    def lift_half(res):
        return jnp.repeat(jnp.repeat(res, t, axis=0), t, axis=1)[:hh, :hw]

    if cfg.smooth_residual:
        smooth_half = jax.vmap(
            lambda s: flow_from_tile_shifts(s, t, hh, hw)
        )(tile_shifts[1:])
        res_alts = smooth_half - jax.vmap(lift_half)(
            int_half[1:].astype(jnp.float32)
        )
    else:
        res_alts = jax.vmap(lift_half)(res_tiles[1:])
    warped_half = _subsample_from_planes(warped, cfg.cfa_pattern)
    gray_wh = rgb_to_gray(warped_half)
    if cfg.use_lk:
        lk_cfg = dataclasses.replace(cfg.lk, bounded_warp=2)
        res_alts = jax.vmap(
            lambda g, fl: lk_refine(gray_wh[0], g, fl, lk_cfg)
        )(gray_wh[1:], res_alts)
    # half-res residual clipped to +-residual_bound/2 so the RAW-unit
    # residual stays within +-residual_bound
    res_alts = jnp.clip(
        res_alts, -0.5 * cfg.residual_bound, 0.5 * cfg.residual_bound
    )
    res_half = jnp.concatenate(
        [jnp.zeros((1, hh, hw, 2), jnp.float32), res_alts], axis=0
    )

    # robustness on the warped half-res frames
    cert_alts = jax.vmap(
        lambda mv, fl: robustness_mask(
            warped_half[0], mv, fl, cfg.robustness, bounded=2
        )[..., :3]
    )(warped_half[1:], res_alts)
    if valid_w is not None:
        cert_alts = cert_alts * valid_w[..., None]
    cert_half = jnp.concatenate(
        [jnp.ones((1, hh, hw, 3), jnp.float32), cert_alts], axis=0
    )

    st = smoothed_structure_tensor(gray_half[0], cfg.st_window)
    omega_half = kernel_params(st, _scaled_merge_cfg(cfg))
    # wider kernels for the 2x-sparser R/B channels
    mc = _scaled_merge_cfg(cfg)
    mc_rb = dataclasses.replace(mc, k_min=max(mc.k_min, mc.k_min_rb))
    omega_half_rb = kernel_params(st, mc_rb)

    # fallback only shows through where den < weight_threshold (sparse,
    # border/extreme-motion pixels); the half-res RGB already computed for
    # alignment upsampled 2s-x is visually equivalent there and saves the
    # full-res demosaic (~1 ms in-context on v5e). All finalize math runs
    # in the CHANNEL-LEADING PHASE domain ((2s, 2s, 3, hh, hw) planes)
    # with ONE interleave at the end — interleaving num and den
    # separately cost a second lane-crossing transpose (~1.2 ms each at
    # city size), and channel-minor phase math would pad the 3-wide
    # channel axis to 128 TPU lanes.
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        interleave_phases_planes_mxu,
        upsample_int_phases_planes,
    )

    if fallback_hr is not None:
        fallback_p = _image_phases(fallback_hr, 2 * cfg.scale)
    else:
        fallback_p = upsample_int_phases_planes(
            half[0], 2 * cfg.scale, "bilinear"
        )
    if cfg.merge.guided_rb:
        from multi_frame_super_resolution_tpu.models.fast_merge import (
            green_guide_planes,
        )

        guide = green_guide_planes(warped, cfg.cfa_pattern)
        # channels 0/2 hold merged R-G / B-G; their fallback is the
        # fallback image's own color difference (channel axis = 2)
        fb_g = fallback_p[:, :, 1]
        fb = jnp.stack(
            [fallback_p[:, :, 0] - fb_g, fb_g, fallback_p[:, :, 2] - fb_g],
            axis=2,
        )
        if cfg.merge.order == 1:
            moments_p = merge_burst_raw_planes(
                warped, res_half * 2.0, cert_half, omega_half, omega_half_rb,
                cfg.cfa_pattern, cfg.scale, cfg.merge.radius,
                residual_bound=cfg.residual_bound, k_max=_scaled_merge_cfg(cfg).k_max,
                guide=guide, phase_output=True, order=1,
                prune_exp=cfg.merge.prune_exp,
                moment_slots=4 if cfg.merge.solver == "plugin" else 9,
                exact_weights=cfg.merge.exact_weights,
                centroid_prune=cfg.merge.centroid_prune,
                centroid_bf16=cfg.merge.centroid_bf16,
                centroid_block=cfg.merge.centroid_block,
                centroid_shared_res=cfg.merge.centroid_shared_res,
                centroid_cert=cfg.merge.centroid_cert,
            )
            est_p, m00_p = _o1_solve(
                moments_p, cfg, grad_phases,
                precomputed_centroid=_certless(cfg),
            )
            merged = apply_weighting_order1(
                est_p, m00_p, fb, cfg.merge.weight_threshold
            )
        else:
            num_p, den_p = merge_burst_raw_planes(
                warped, res_half * 2.0, cert_half, omega_half, omega_half_rb,
                cfg.cfa_pattern, cfg.scale, cfg.merge.radius,
                residual_bound=cfg.residual_bound, k_max=_scaled_merge_cfg(cfg).k_max,
                guide=guide, phase_output=True, bf16=cfg.merge.bf16,
                prune_exp=cfg.merge.prune_exp,
            )
            merged = apply_weighting(num_p, den_p, fb, cfg.merge.weight_threshold)
        g = merged[:, :, 1]
        out_p = jnp.stack(
            [g + merged[:, :, 0], g, g + merged[:, :, 2]], axis=2
        )
    elif cfg.merge.order == 1:
        moments_p = merge_burst_raw_planes(
            warped, res_half * 2.0, cert_half, omega_half, omega_half_rb,
            cfg.cfa_pattern, cfg.scale, cfg.merge.radius,
            residual_bound=cfg.residual_bound, k_max=_scaled_merge_cfg(cfg).k_max,
            phase_output=True, order=1, prune_exp=cfg.merge.prune_exp,
            moment_slots=4 if cfg.merge.solver == "plugin" else 9,
            exact_weights=cfg.merge.exact_weights,
            centroid_prune=cfg.merge.centroid_prune,
            centroid_bf16=cfg.merge.centroid_bf16,
            centroid_block=cfg.merge.centroid_block,
            centroid_shared_res=cfg.merge.centroid_shared_res,
            centroid_cert=cfg.merge.centroid_cert,
        )
        est_p, m00_p = _o1_solve(
            moments_p, cfg, grad_phases,
            precomputed_centroid=_certless(cfg),
        )
        out_p = apply_weighting_order1(
            est_p, m00_p, fallback_p, cfg.merge.weight_threshold
        )
    else:
        num_p, den_p = merge_burst_raw_planes(
            warped, res_half * 2.0, cert_half, omega_half, omega_half_rb,
            cfg.cfa_pattern, cfg.scale, cfg.merge.radius,
            residual_bound=cfg.residual_bound, k_max=_scaled_merge_cfg(cfg).k_max,
            phase_output=True, bf16=cfg.merge.bf16,
            prune_exp=cfg.merge.prune_exp,
        )
        out_p = apply_weighting(num_p, den_p, fallback_p, cfg.merge.weight_threshold)
    if cfg.final_restore and cfg.scale == 2:
        from multi_frame_super_resolution_tpu.ops.restore import (
            restore_phases,
            temporal_noise_stat,
        )

        stat = temporal_noise_stat(gray_wh, residual=res_half[1:])
        out_p = _gated_restore(out_p, cfg, stat, restore_phases)
    if cfg.gamma:
        out_p = srgb_gamma(out_p)
    # MXU scatter-matmul interleave: XLA's transpose+reshape lowering of
    # the final interleave relayouts through a channel-minor copy
    # (~587 us/burst at city size, round-3 device trace); precision
    # "high" reconstructs f32 products exactly enough for a 0/1
    # selector (max err ~8e-6).
    return jnp.clip(interleave_phases_planes_mxu(out_p, precision="high"), 0.0, 1.0)
